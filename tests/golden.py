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


# ---------------------------------------------------------------------------
# PowerActivationChannel (reference: lib/PowerActivationChannel_impl.cc)
# ---------------------------------------------------------------------------

FLT_MAX = np.float32(3.4028235e38)
FLT_MIN = np.float32(1.1754944e-38)


def golden_power_channel_geometry(N, R, cfreq, bw):
    # reference: lib/PowerActivationChannel_impl.cc:314-355
    bw = abs(bw)
    ew = nextpow2(int(np.ceil(bw * N)))
    ew = min(ew, N)
    mid = int(round(cfreq * N))
    es = mid - ew // 2
    if es < 0:
        es = 0
    ee = es + ew
    if ee > N:
        ee = N
        es = ee - ew
    ms = int(round((cfreq - bw / 2) * N))
    me = int(round((cfreq + bw / 2) * N))
    ms = max(ms, es)
    me = min(me, ee)
    return es, ee, ew, ms, me


def golden_sine_flank_window(ew, meas_width, phase_angle):
    # intended symmetric version (see fdc_tpu.ops.windows docstring re the
    # reference's lost right flank, lib/PowerActivationChannel_impl.cc:357-375)
    ramp = (ew - meas_width) // 3
    w = np.full(ew, np.exp(1j * phase_angle), complex)
    for i in range(ramp):
        v = np.sin(0.5 * np.pi * i / (ramp + 1))
        w[i] *= v
        w[ew - 1 - i] = w[i]
    return w


def golden_power_activation(spectra, N, R, cfreq, bw, thresh_db, maxblocks):
    """Sequential replay of PowerActivationChannel::work over [B, N] spectra.

    Returns a list of event dicts with keys finalized/part/rel_cfreq/rel_bw/
    blockstart/blockend/counter/data.
    """
    es, ee, ew, ms, me = golden_power_channel_geometry(N, R, cfreq, bw)
    thresh = 10.0 ** (thresh_db / 10.0)
    dphase = es % R
    ovl = ew // R
    outlen = ew - ovl
    wins = [
        golden_sine_flank_window(ew, me - ms, 2 * np.pi * i / R)
        for i in range(R)
    ]

    events = []
    state = dict(active=False, lastpower=float(FLT_MAX), phase=0, part=0,
                 count=0, finished=0, blocks=[])
    blockcount = 1
    hist = np.zeros(N, complex)

    def proc(X):
        x = X[es:ee] * wins[state["phase"]]
        xs = np.concatenate([x[ew // 2:], x[:ew // 2]])
        y = np.fft.ifft(xs) * ew
        state["blocks"].append(y[ovl:])
        state["count"] += 1
        state["phase"] = (state["phase"] + dphase) % R

    def emit(fin):
        data = (np.concatenate(state["blocks"]) if state["blocks"]
                else np.zeros(0, complex))
        state["blocks"] = []
        events.append(dict(
            finalized=fin,
            part=state["part"],
            counter=state["finished"],
            rel_cfreq=(es + ee) / 2.0 / N,
            rel_bw=ew / N,
            blockstart=blockcount - state["count"],
            blockend=blockcount,
            data=data,
        ))
        state["part"] += 1

    for X in spectra:
        pwr = float(np.sum(np.abs(X[ms:me]) ** 2))
        if pwr == 0.0:
            pwr = float(FLT_MIN)
        changed = ((not state["active"]) and pwr / state["lastpower"] >= thresh) or \
                  (state["active"] and state["lastpower"] / pwr >= thresh)
        if changed and not state["active"]:
            state.update(part=0, count=0, active=True, phase=0, blocks=[])
            proc(hist)
            proc(X)
        elif changed and state["active"]:
            proc(X)
            state["active"] = False
            emit(True)
            state["finished"] += 1
        elif state["active"]:
            proc(X)
            if maxblocks == 0 or (maxblocks > 0 and state["count"] % maxblocks == 0):
                emit(False)
        state["lastpower"] = pwr
        hist = X
        blockcount += 1
    return events


# ---------------------------------------------------------------------------
# SegmentDetection (reference: lib/SegmentDetection_impl.cc)
# ---------------------------------------------------------------------------


def golden_segment_geometry(N, seg_start, seg_stop, minchandist):
    # reference: lib/SegmentDetection_impl.cc:592-637 (with the intended
    # upper-edge clamp, see fdc_tpu.config.SegmentGeometry)
    minchandist %= 1.0
    seg_start %= 1.0
    seg_stop %= 1.0
    if seg_start > seg_stop:
        seg_start, seg_stop = seg_stop, seg_start
    decf = N * minchandist / 2.0
    dec = 1 if decf < 2.0 else int(decf)
    width = int((seg_stop - seg_start) * N)
    if width % dec:
        width += dec - width % dec
    if width > N:
        width = N - N % dec
    mid = int(0.5 * (seg_start + seg_stop) * N)
    start = 0 if mid < width // 2 else mid - width // 2
    stop = start + width
    if stop > N:
        stop = N
        start = stop - width
    return start, stop, width, dec


def golden_flank_window(w, puffer, phase_angle):
    # reference: lib/SegmentDetection_impl.cc:551-583
    p = int(puffer * w)
    win = np.full(w, np.exp(1j * phase_angle), complex)
    for k in range(p):
        fl = 0.5 - 0.5 * np.cos(np.pi * k / p)
        win[k] *= fl
        win[w - 1 - k] *= fl
    return win


def golden_segment_detection(
    spectra, N, R, seg_start, seg_stop, thresh_db, minchandist,
    puffer, maxblocks, delay,
):
    """Sequential replay of SegmentDetection::work over [B, N] spectra.

    Returns event dicts with keys finalized/part(None if omitted)/rel_cfreq/
    rel_bw/blockstart/blockend/vectorstart/vectorend/chan_id/data.
    """
    d_start, d_stop, d_width, dec = golden_segment_geometry(
        N, seg_start, seg_stop, minchandist
    )
    thresh = 10.0 ** (thresh_db / 10.0)
    ncells = d_width // dec

    events = []
    channels = []  # dicts
    counter = [0]
    blockcount = [0]

    def activate(ds, de):
        detw = de - ds
        ew = nextpow2(int(np.ceil(detw * (1.0 + 2.0 * puffer))))
        if ew > N:
            return False
        mid = ds + detw // 2
        es = mid - ew // 2
        ee = mid + ew // 2
        if es < 0:
            es = 0
            ee = ew
        if ee > N:
            ee = N
            es = N - ew
        c = dict(ID=counter[0], det_start=ds, det_stop=de, es=es, ee=ee,
                 ew=ew, ovl=ew // R, count=0, phase=0, dphase=es % R,
                 inactive=-1, part=0, data=[])
        counter[0] += 1
        channels.append(c)
        return True

    def proc(X, c):
        w = golden_flank_window(c["ew"], puffer, 2 * np.pi * c["phase"] / R)
        x = X[c["es"]:c["ee"]] * w
        xs = np.concatenate([x[c["ew"] // 2:], x[:c["ew"] // 2]])
        y = np.fft.ifft(xs) * c["ew"]
        c["data"].append(y[c["ovl"]:])
        c["count"] += 1
        c["phase"] = (c["phase"] + c["dphase"]) % R

    def emit(c, fin, ntx):
        chunk = c["data"][:ntx]
        c["data"] = c["data"][ntx:]
        data = np.concatenate(chunk) if chunk else np.zeros(0, complex)
        part = c["part"] if (not fin or c["part"] > 0) else None
        events.append(dict(
            finalized=fin, part=part, chan_id=c["ID"],
            rel_bw=c["ew"] / N,
            rel_cfreq=(c["es"] + c["ee"]) / 2.0 / N,
            blockstart=blockcount[0] - c["count"],
            blockend=blockcount[0],
            vectorstart=c["es"], vectorend=c["ee"],
            data=data,
        ))
        if not fin:
            c["part"] += 1

    hist = np.zeros(N, complex)
    for X in spectra:
        # measure_power (reference: lib/SegmentDetection_impl.cc:178-193)
        seg = np.abs(X[d_start:d_start + ncells * dec]) ** 2
        power = seg.reshape(ncells, dec).sum(axis=1)
        # get_active_channels
        ratio = power[1:] / power[:-1]
        riseedge = sorted(
            [(float(ratio[i]), i * dec + d_start)
             for i in range(ncells - 1) if ratio[i] > thresh],
            key=lambda p: -p[0],
        )
        falledge = [(i + 1) * dec + d_start
                    for i in range(ncells - 1) if ratio[i] < 1.0 / thresh]
        poss = []
        for _, s in riseedge:
            nxt = next((f for f in falledge if f > s), None)
            if nxt is None:
                continue
            if any(s < pe and nxt >= ps for ps, pe in poss):
                continue
            poss.append((s, nxt))
        # match_active_channels
        if not poss:
            for c in channels:
                c["inactive"] += 1
        else:
            for c in channels:
                matched = False
                remaining = []
                for (ps, pe) in poss:
                    if ps < c["det_stop"] and pe >= c["det_start"]:
                        matched = True
                    else:
                        remaining.append((ps, pe))
                poss = remaining
                if matched:
                    c["inactive"] = 0
                else:
                    c["inactive"] += 1
            for (ps, pe) in poss:
                activate(ps, pe)
        # process_active_channels (single thread order)
        for c in channels:
            if c["inactive"] < 0:
                proc(hist, c)
                proc(X, c)
                c["inactive"] = 0
            elif c["inactive"] > delay:
                emit(c, True, len(c["data"]))
                c["emitted"] = True
            else:
                proc(X, c)
        if maxblocks >= 0:
            for c in channels:
                if len(c["data"]) >= maxblocks:
                    ntx = len(c["data"]) if maxblocks == 0 else maxblocks
                    if ntx > 0:
                        emit(c, False, ntx)
        channels = [c for c in channels if c["inactive"] <= delay]
        hist = X
        blockcount[0] += 1
    return events


# ---------------------------------------------------------------------------
# activity_detection_channelizer_vcm
# (reference: lib/activity_detection_channelizer_vcm_impl.cc)
# ---------------------------------------------------------------------------


def golden_vcm_geometry(N, seg_start, seg_stop, minchandist):
    """Segment geometry with the vcm derivation rules (reference:
    lib/activity_detection_channelizer_vcm_impl.cc:230-279): rounding
    instead of truncation, while-loop width clamp, shared decimation."""
    dec_f = N * minchandist / 2.0
    dec = 1 if dec_f < 2.0 else int(dec_f)
    mid = int(abs(round((seg_stop + seg_start) * 0.5 * N)))
    width = int(abs(round((seg_stop - seg_start) * N)))
    if width % dec:
        width += dec - width % dec
    while width >= N:
        width = N - N % dec
    start = 0 if mid - width // 2 <= 0 else mid - width // 2
    stop = start + width
    if stop > N:
        stop = N
        start = N - width
    return start, stop, width, dec


def golden_activity_detection_vcm(
    spectra, N, R, segments, thresh_db, minchandist, puffer, maxblocks, delay,
):
    """Sequential replay of activity_detection_channelizer_vcm::work over
    [B, N] spectra for several segments at once. vcm deltas vs
    SegmentDetection, each cited:

    - cell power normalized by 1/decimation
      (lib/activity_detection_channelizer_vcm_impl.cc:630-650),
    - zero DENOMINATOR replaced by FLT_MIN before dividing, so 0/0 gives
      ratio 0 == a falling edge (:701-709),
    - blockcount starts at 1 (:188) and increments after each block (:568),
    - maxblocks partial emission INLINE per channel in the single unified
      extract walk, not a post-loop sweep (:305-321).

    Returns event dicts with the same keys as golden_segment_detection.
    """
    thresh = 10.0 ** (thresh_db / 10.0)
    inv = 1.0 / thresh

    segs = []
    for sid, (a, b) in enumerate(segments):
        start, stop, width, dec = golden_vcm_geometry(N, a, b, minchandist)
        segs.append(dict(ID=sid, start=start, stop=stop, width=width,
                         dec=dec, channels=[], counter=0))

    events = []
    blockcount = [1]  # reference: :188

    def activate(seg, ds, de):
        detw = de - ds
        ew = nextpow2(int(np.ceil(detw * (1.0 + 2.0 * puffer))))
        if ew > N:
            return False
        mid = ds + detw // 2
        es = mid - ew // 2
        ee = mid + ew // 2
        if es < 0:
            es = 0
            ee = ew
        if ee > N:
            ee = N
            es = N - ew
        c = dict(ID=seg["counter"], seg=seg["ID"], det_start=ds, det_stop=de,
                 es=es, ee=ee, ew=ew, ovl=ew // R, count=0, phase=0,
                 dphase=es % R, inactive=-1, part=0, data=[])
        seg["counter"] += 1
        seg["channels"].append(c)
        return True

    def proc(X, c):
        w = golden_flank_window(c["ew"], puffer, 2 * np.pi * c["phase"] / R)
        x = X[c["es"]:c["ee"]] * w
        xs = np.concatenate([x[c["ew"] // 2:], x[:c["ew"] // 2]])
        y = np.fft.ifft(xs) * c["ew"]
        c["data"].append(y[c["ovl"]:])
        c["count"] += 1
        c["phase"] = (c["phase"] + c["dphase"]) % R

    def emit(c, fin, ntx):
        chunk = c["data"][:ntx]
        c["data"] = c["data"][ntx:]
        data = np.concatenate(chunk) if chunk else np.zeros(0, complex)
        part = c["part"] if (not fin or c["part"] > 0) else None
        events.append(dict(
            finalized=fin, part=part, chan_id=c["ID"], seg_id=c["seg"],
            rel_bw=c["ew"] / N,
            rel_cfreq=(c["es"] + c["ee"]) / 2.0 / N,
            blockstart=blockcount[0] - c["count"],
            blockend=blockcount[0],
            vectorstart=c["es"], vectorend=c["ee"],
            data=data,
        ))
        if not fin:
            c["part"] += 1

    hist = np.zeros(N, complex)
    for X in spectra:
        # -- detect in every segment (single-thread order) ------------------
        for seg in segs:
            start, dec = seg["start"], seg["dec"]
            ncells = seg["width"] // dec
            p = np.abs(X[start:start + ncells * dec]).astype(np.float32) ** 2
            power = (p.reshape(ncells, dec).sum(axis=1)
                     * np.float32(1.0 / dec))  # vcm 1/dec normalization
            # FLT_MIN zero-denominator (reference: :701-709)
            prev = power[:-1].astype(np.float64)
            cur = power[1:].astype(np.float64)
            ratio = np.where(prev == 0.0, cur / float(FLT_MIN), cur / prev)
            riseedge = sorted(
                [(float(ratio[i]), i * dec + start)
                 for i in range(ncells - 1) if ratio[i] > thresh],
                key=lambda q: -q[0],
            )
            falledge = [(i + 1) * dec + start
                        for i in range(ncells - 1) if ratio[i] < inv]
            poss = []
            for _, s in riseedge:
                nxt = next((f for f in falledge if f > s), None)
                if nxt is None:
                    continue
                if any(s < pe and nxt >= ps for ps, pe in poss):
                    continue
                poss.append((s, nxt))
            if not poss:
                for c in seg["channels"]:
                    c["inactive"] += 1
            else:
                for c in seg["channels"]:
                    matched = False
                    remaining = []
                    for (ps, pe) in poss:
                        if ps < c["det_stop"] and pe >= c["det_start"]:
                            matched = True
                        else:
                            remaining.append((ps, pe))
                    poss = remaining
                    if matched:
                        c["inactive"] = 0
                    else:
                        c["inactive"] += 1
                for (ps, pe) in poss:
                    activate(seg, ps, pe)
        # -- extract: unified walk, inline partial emission (:305-321) ------
        for seg in segs:
            for c in seg["channels"]:
                if c["inactive"] < 0:
                    proc(hist, c)
                    proc(X, c)
                    c["inactive"] = 0
                elif c["inactive"] > delay:
                    emit(c, True, len(c["data"]))
                else:
                    proc(X, c)
                if maxblocks >= 0 and len(c["data"]) >= maxblocks:
                    ntx = len(c["data"]) if maxblocks == 0 else maxblocks
                    if ntx > 0:
                        emit(c, False, ntx)
            seg["channels"] = [
                c for c in seg["channels"] if c["inactive"] <= delay
            ]
        hist = X
        blockcount[0] += 1
    return events
