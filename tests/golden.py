"""Golden model: a deliberately slow, scalar numpy re-implementation of the
reference gr-FDC semantics, used as the test oracle for the JAX framework.

Each function mirrors the corresponding reference routine step by step
(explicit per-block loops, explicit fftshift buffers, stateful counters) so
that agreement with the batched JAX implementation is meaningful. File/line
citations point at the behavior being modeled.
"""

from __future__ import annotations

import numpy as np


def nextpow2(k):
    return 1 << int(np.ceil(np.log2(k)))


# ---------------------------------------------------------------------------
# windows (reference: lib/windows.h)
# ---------------------------------------------------------------------------


def golden_base_window(wintype, blocksize, passbw, stopbw, normalize=False):
    # reference: lib/windows.h:41-55
    if passbw >= 1.0:
        passbw, stopbw, wintype = 1.0, 1.0, 0
    elif stopbw >= 1.0:
        stopbw = 1.0
    lowsamps = int((1.0 - stopbw) * blocksize) // 2
    highsamps = int(passbw * blocksize)
    rampsamps = (blocksize - 2 * lowsamps - highsamps) // 2

    v = 1.0 if normalize else 1.0 / blocksize
    w = np.full(blocksize, v, float)
    if wintype == 1:  # HANN, lib/windows.h:108-124
        w[:lowsamps] = 0.0
        if lowsamps:
            w[-lowsamps:] = 0.0
        for i in range(rampsamps):
            phi = (i + 1) / (rampsamps + 1) * np.pi
            w[lowsamps + i] = v * (-np.cos(phi) / 2 + 0.5)
            w[blocksize - lowsamps - 1 - i] = w[lowsamps + i]
    elif wintype == 2:  # RAMP, lib/windows.h:92-106
        w[:lowsamps] = 0.0
        if lowsamps:
            w[-lowsamps:] = 0.0
        for i in range(rampsamps):
            w[lowsamps + i] = v * (i + 1) / (rampsamps + 1)
            w[blocksize - lowsamps - 1 - i] = w[lowsamps + i]
    else:  # RECTANGULAR, lib/windows.h:80-90
        edge = lowsamps + rampsamps // 2
        for i in range(edge):
            w[i] = 0.0
            w[blocksize - 1 - i] = 0.0
    return w


def golden_window_bank(wintype, blocksize, passbw, stopbw, relinvovl, step):
    # reference: lib/windows.h:57-78
    step = step % relinvovl
    w_d = golden_base_window(wintype, blocksize, passbw, stopbw)
    bank = []
    count = 0
    for _ in range(relinvovl):
        phi = 2.0 * np.pi * count / relinvovl
        bank.append((w_d * np.exp(1j * phi)).astype(np.complex64))
        count = (count + step) % relinvovl
    return np.stack(bank)


# ---------------------------------------------------------------------------
# overlap-save framing (reference: lib/overlap_save_impl.cc:62-81)
# ---------------------------------------------------------------------------


def golden_overlap_save(x, blocksize, ovllen, hist=None):
    """Returns (blocks [B, blocksize], final history)."""
    inplen = blocksize - ovllen
    if hist is None:
        hist = np.zeros(ovllen, complex)
    nblocks = len(x) // inplen
    blocks = []
    h = np.array(hist)
    for i in range(nblocks):
        seg = x[i * inplen : (i + 1) * inplen]
        blocks.append(np.concatenate([h, seg]))
        h = np.array(blocks[-1][-ovllen:])
    return np.stack(blocks), h


def golden_forward_fft(blocks):
    """fftshifted forward FFT scaled 1/N
    (reference: python/FrequencyDomainChannelizer.py:206,214-216)."""
    n = blocks.shape[-1]
    return np.fft.fftshift(np.fft.fft(blocks, axis=-1), axes=-1) / n


# ---------------------------------------------------------------------------
# throughput channel chain (reference: python/FrequencyDomainChannelizer.py:218-231)
# ---------------------------------------------------------------------------


def golden_opt_channelparams(blocksize, relinvovl, freq, bw):
    # reference: python/FrequencyDomainChannelizer.py:322-345
    passsamps = blocksize * bw
    blocklen = nextpow2(passsamps)
    if blocklen < 1.2 * passsamps:
        blocklen *= 2
    passband = float(passsamps) / float(blocklen) * 1.1
    stopband = 1.0
    if passband >= 1.0:
        passband = 1.0
    elif passband < 0.7:
        stopband = passband + 0.25
    freqsamps = int(round(freq * blocksize)) % blocksize
    freqsamps -= blocklen // 2
    if freqsamps < 0:
        freqsamps = (freqsamps + blocksize) % blocksize
    if freqsamps + blocklen > blocksize:
        freqsamps = blocksize - blocklen
    outputblocklen = int(blocklen) - int(blocklen) // relinvovl
    return int(freqsamps), int(blocklen), int(outputblocklen), passband, stopband


def golden_throughput_channel(
    spectra, blocksize, relinvovl, freq, bw, wintype=0
):
    """Per-block loop with a stateful phase counter, as the reference blocks do.

    spectra: [B, N] output of golden_forward_fft. Returns the channel's
    contiguous output stream (B * lout samples).
    """
    f, l, lout, pbw, sbw = golden_opt_channelparams(
        blocksize, relinvovl, freq, bw
    )
    bank = golden_window_bank(wintype, l, pbw, sbw, relinvovl, step=1)
    counter = 0
    shift = ((f % relinvovl) + relinvovl) % relinvovl
    out = []
    for b in range(spectra.shape[0]):
        cut = spectra[b, f : f + l]  # vector_cut_vxx
        z = cut * bank[counter]  # phase_shifting_windowing_vcc
        counter = (counter + shift) % relinvovl
        # inverse fft_vcc(shift=True): fftshift input, unnormalized IFFT
        zs = np.concatenate([z[l // 2 :], z[: l // 2]])
        y = np.fft.ifft(zs) * l
        y = y[l - lout :]  # vector_cut: drop l//relinvovl overlap samples
        out.append(y * l)  # multiply_const_cc(blocksize/dec) == l
    return np.concatenate(out)
