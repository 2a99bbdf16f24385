"""Channel extraction: bin-slice gather + phased-window multiply + subband IFFT.

This single fused path replaces four reference blocks in the throughput chain
(vector_cut -> phase_shifting_windowing_vcc -> inverse fft_vcc -> vector_cut;
reference: python/FrequencyDomainChannelizer.py:218-231) and the
``process_channel`` routine of the burst/detection paths
(reference: lib/PowerActivationChannel_impl.cc:260-284,
lib/SegmentDetection_impl.cc:399-429).

Channels of equal width are batched into one [C, B, l] tensor so the windowed
multiply and the IFFT run as single large VPU/FFT ops; the per-block window
phase index (overlap-save phase compensation) is computed with broadcast
integer arithmetic instead of the reference's per-block counters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fdc_tpu.ops.fft import subband_ifft, comb_subband_ifft

__all__ = ["gather_slices", "extract_bucket", "extract_dynamic"]


def gather_slices(spectrum: jax.Array, starts: jax.Array, width: int) -> jax.Array:
    """Cut [C] bin slices of static length ``width`` out of [B, N] spectra.

    Equivalent of C parallel vector_cut_vxx blocks
    (reference: lib/vector_cut_vxx_impl.cc:59-72). starts may be traced
    (dynamic channels) or constant (static channels).

    Returns [C, B, width].
    """
    b = spectrum.shape[0]

    def cut(s):
        return jax.lax.dynamic_slice(spectrum, (0, s), (b, width))

    return jax.vmap(cut)(starts.astype(jnp.int32))


def extract_bucket(
    spectrum: jax.Array,
    starts: jax.Array,
    windows: jax.Array,
    block_index0: jax.Array,
    relinvovl: int,
    gain: float = 1.0,
) -> jax.Array:
    """Extract a bucket of equal-width channels from a batch of spectra.

    Args:
      spectrum: [B, N] normalized fftshifted spectra.
      starts: [C] int32 slice start bins (also the per-block phase increment
        source: window index of channel c at global block t is
        (t * starts[c]) % relinvovl, the batched equivalent of the
        reference's counter
        (reference: lib/phase_shifting_windowing_vcc_impl.cc:80-83)).
      windows: [C, R, l] complex phased window banks.
      block_index0: scalar int — global index of the first block in the batch.
      relinvovl: R.
      gain: final scalar gain (the reference's trailing multiply_const,
        reference: python/FrequencyDomainChannelizer.py:231).

    Returns [C, B, l] full-rate subband blocks INCLUDING the leading l//R
    time-domain overlap samples (callers drop them; keeping the op
    shape-uniform lets power/throughput paths share it).
    """
    c, r, l = windows.shape
    b = spectrum.shape[0]
    slices = gather_slices(spectrum, starts, l)  # [C, B, l]

    t = block_index0 + jnp.arange(b, dtype=jnp.int32)  # [B]
    phase_idx = (t[None, :] * starts[:, None]) % relinvovl  # [C, B]
    w = jnp.take_along_axis(
        windows, phase_idx[:, :, None], axis=1
    )  # windows[c, phase_idx[c,b], :] -> [C, B, l]

    y = subband_ifft(slices * w)
    return y * jnp.asarray(gain, dtype=y.dtype)


def extract_dynamic(
    spectrum: jax.Array,
    starts: jax.Array,
    width_log2: jax.Array,
    phase_idx: jax.Array,
    windows_pad: jax.Array,
    w_max: int,
) -> jax.Array:
    """Extract variable-width channels (dynamic slot table) at one static shape.

    Args:
      spectrum: [B, N] normalized fftshifted spectra.
      starts: [S] int32 extraction start bins (traced values; clamped by the
        caller so start + width <= N).
      width_log2: [S] int32 log2 of each slot's extraction width.
      phase_idx: [S, B] int32 window phase state per slot per block
        (reference: lib/SegmentDetection_impl.cc:426 ``phase=(phase+phaseincrement)%relinvovl``).
      windows_pad: [S, R, w_max] complex — each slot's window bank zero-padded
        to w_max along the last axis.
      w_max: static maximum extraction width.

    Returns [S, B, w_max] where the leading 2**width_log2[s] samples of each
    row hold the slot's full-rate subband block (including the ovl prefix).
    """
    # Zero-pad the spectrum tail so a w_max-long gather starting anywhere in
    # [0, N) never clamps (slots narrower than w_max may start past N - w_max;
    # the zero window padding discards the garbage bins).
    spectrum = jnp.pad(spectrum, ((0, 0), (0, w_max)))
    slices = gather_slices(spectrum, starts, w_max)  # [S, B, w_max]
    w = jnp.take_along_axis(windows_pad, phase_idx[:, :, None], axis=1)
    z = slices * w  # [S, B, w_max]; bins past the true width are zero (window pad)
    return comb_subband_ifft(z, width_log2[:, None], w_max)
