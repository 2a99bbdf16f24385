"""Pallas TPU kernel: fused slice+window+IDFT extraction for static buckets.

The XLA bucket-extraction path materializes the gathered [C, B, l] slices
and their [C, B, 2l] planar form in HBM before the extraction matmul —
~4x more HBM traffic than the problem requires. This kernel keeps a
[Tb, N] spectrum tile resident in VMEM and contracts each channel's
STATIC lane slice against its folded window+IDFT matrix in place:

    out[c] = re_tile[:, s_c : s_c+l] @ Mt[c] + im_tile[:, s_c : s_c+l] @ Mb[c]

so HBM sees one spectrum read and one output write (measured 3.4x on the
flagship 64-channel bucket, 0.21 -> 0.06 ms marginal at B=512;
tools/pallas_extract_proto.py). Replaces the same 6-op chain as
extract_bucket (reference: python/FrequencyDomainChannelizer.py:218-231).

Constraints honored here (see CLAUDE.md "Environment hazards"):
- complex64 never crosses the Pallas boundary: inputs are the spectrum's
  real/imaginary planes, outputs interleaved float pairs.
- Lane slices use arbitrary STATIC offsets (Mosaic rotates lanes for
  non-128-aligned starts; dynamic lane offsets would not lower).
- Matmuls run at Precision.HIGHEST (f32 via bf16 passes) to keep the
  extraction SNR of the XLA matmul-DFT path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_extract_static",
    "fused_extract_shared",
    "fused_extract_vmem_bytes",
    "fused_shared_vmem_bytes",
]

# default spectrum-tile height; 513-row batches pad to 9 tiles of 64
_TB = 64
# stay well under the ~16 MB/core VMEM (double-buffered input tiles)
_VMEM_BUDGET = 10 * 2**20


def fused_extract_vmem_bytes(
    c: int, l: int, k2: int, n: int, tb: int = _TB
) -> int:
    """Approximate VMEM footprint of one grid step (inputs double-buffered)."""
    tiles = 2 * 2 * tb * n * 4          # re+im tiles, double-buffered
    mats = 2 * c * l * k2 * 4           # Mt + Mb constants
    out = c * tb * k2 * 4
    return tiles + mats + out


def fits_vmem(c: int, l: int, k2: int, n: int, tb: int = _TB) -> bool:
    return fused_extract_vmem_bytes(c, l, k2, n, tb) <= _VMEM_BUDGET


def _kernel(re_ref, im_ref, mt_ref, mb_ref, out_ref, *, starts, l):
    for c, s in enumerate(starts):
        yr = jax.lax.dot_general(
            re_ref[:, s:s + l], mt_ref[c],
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        yi = jax.lax.dot_general(
            im_ref[:, s:s + l], mb_ref[c],
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        out_ref[c] = yr + yi


_TB_SHARED = 32  # smaller tiles: the stacked scratch multiplies by C


def fused_shared_vmem_bytes(
    c: int, l: int, k2: int, n: int, tb: int = _TB_SHARED,
    n_masks: int = 0,
) -> int:
    """VMEM footprint of one fused_extract_shared grid step."""
    tiles = 2 * 2 * tb * n * 4          # re+im tiles, double-buffered
    mats = 2 * l * k2 * 4               # ONE shared [2l, 2k] matrix
    scratch = c * tb * 2 * l * 4        # stacked slices
    y = c * tb * k2 * 4                 # matmul result
    out = c * tb * k2 * 4
    meas = (n * n_masks + tb * n + tb * n_masks) * 4 if n_masks else 0
    return tiles + mats + scratch + y + out + meas


def _kernel_shared_measured(
    re_ref, im_ref, m_ref, pm_ref, out_ref, pw_ref, z_scr,
    *, starts, l, fold_phase_r
):
    """_kernel_shared + in-kernel |X|² power measures: the spectrum tile
    is already VMEM-resident, so the per-band/per-cell power sums (the
    separate sq pass + band_power/cell_power reduce kernels of the
    detection consumers) are one extra [TB, N] @ [N, Cm] matmul here
    (reference measures: lib/PowerActivationChannel_impl.cc:286-306,
    lib/SegmentDetection_impl.cc:178-193). HIGHEST precision keeps the
    f32 sums; accumulation order differs from the XLA reduce at ~1e-7
    rel — callers' detection thresholds are dB-scale, see
    fdc_tpu/models/channelizer.py."""
    sq = re_ref[:] * re_ref[:] + im_ref[:] * im_ref[:]  # [TB, N]
    pw_ref[:] = jax.lax.dot_general(
        sq, pm_ref[:],
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    _kernel_shared(
        re_ref, im_ref, m_ref, out_ref, z_scr,
        starts=starts, l=l, fold_phase_r=fold_phase_r,
    )


def _kernel_shared(
    re_ref, im_ref, m_ref, out_ref, z_scr, *, starts, l, fold_phase_r
):
    # Gather all channel slices into ONE scratch operand and run ONE
    # [C*TB, 2l] @ [2l, 2k] matmul: per-channel [TB, l] matmuls would be
    # a serial small-matmul chain (the anti-pattern that sank the fused
    # Pallas FFT — see PERFORMANCE.md), while the stacked form tiles the
    # MXU with thousands of rows. The copies are cheap VMEM moves.
    tb = re_ref.shape[0]
    k2 = out_ref.shape[2]
    r = fold_phase_r
    for c, s in enumerate(starts):
        z_scr[c * tb:(c + 1) * tb, :l] = re_ref[:, s:s + l]
        z_scr[c * tb:(c + 1) * tb, l:] = im_ref[:, s:s + l]
    y = jax.lax.dot_general(
        z_scr[:], m_ref[:],
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [C*TB, 2k]
    if r is not None:
        # quarter-turn phase compensation masks: interleaved pairs swap
        # via two lane rolls + parity select — Mosaic lowers static-shift
        # rolls, while strided VALUE slices would lower as unsupported
        # gathers. Patterns are regenerated from iotas with static-int
        # arithmetic (Pallas kernels cannot capture constant arrays).
        even = (
            jax.lax.broadcasted_iota(jnp.int32, (tb, k2), 1) % 2 == 0
        )
        row_mod_r = jax.lax.broadcasted_iota(jnp.int32, (tb, 1), 0) % r
    for c, s in enumerate(starts):
        yc = y[c * tb:(c + 1) * tb]
        if r is None or (s % r) == 0:
            out_ref[c] = yc
            continue
        # per-row quarter-turn phase, applied as SELECTS (exact: rotation
        # by j on an interleaved pair is (re, im) -> (-im, re), no trig
        # round-off). Row b's phase index is the static pattern
        # ((b % r) * s) % r, rescaled to quarter turns.
        z = jnp.where(
            even,
            # even col k <- -y[:, k+1] = -im (roll by k2-1 == -1, Mosaic
            # rolls must be non-negative)
            -pltpu.roll(yc, k2 - 1, 1),
            pltpu.roll(yc, 1, 1),   # odd col k  <-  y[:, k-1] =  re
        )
        qr = ((row_mod_r * int(s % r)) % r) * (4 // r)  # [TB, 1]
        out_ref[c] = jnp.where(
            qr == 0, yc,
            jnp.where(qr == 1, z, jnp.where(qr == 2, -yc, -z)),
        )


def fused_extract_shared(
    spectrum: jax.Array,
    starts,
    folded: np.ndarray,
    *,
    fold_phase_r: int | None = None,
    pairs: bool = True,
    tb: int = _TB_SHARED,
    power_masks: np.ndarray | None = None,
    interpret: bool = False,
):
    """Fused extraction for an equal-window bucket: ONE shared matrix.

    Equal-bandwidth buckets (the common case, e.g. the flagship's 64
    channels) share a single window, hence a single folded window+IDFT
    matrix — the per-channel [C, 2l, 2k] operand of
    :func:`fused_extract_static` is C-times redundant and busts the VMEM
    budget at C=64. This variant holds one [2l, 2k] matrix in VMEM, so
    large buckets stay on the fused path.

    Optionally folds the per-block overlap-save phase compensation in
    (``fold_phase_r`` = relinvovl R, in {1, 2, 4}, dividing the tile
    height): when the global index of spectrum row 0 is ≡ 0 (mod R),
    the phase index of row b is the STATIC pattern ((b % R) * start_c)
    % R, and every factor is a quarter turn, applied as an exact
    select/negate/swap on the interleaved pair columns — the separate
    apply_phase_pairs pass over the [C, B, k, 2] output disappears.

    With ``power_masks`` ([N, Cm] float32, typically 0/1 band/cell
    indicator columns), additionally returns the in-kernel power measures
    ``powers`` [B, Cm] = |spectrum|² @ power_masks (f32-exact matmul) and
    the call returns the tuple (out, powers) — the separate |X|² pass and
    band/cell reduce kernels of the detection consumers disappear.

    Args / returns otherwise as :func:`fused_extract_static`, with
    ``folded`` of shape [2l, 2k].
    """
    if isinstance(spectrum, tuple):
        re, im = spectrum
    else:
        re, im = jnp.real(spectrum), jnp.imag(spectrum)
    b, n = re.shape
    l2, k2 = folded.shape
    l = l2 // 2
    starts = [int(s) for s in starts]
    c_dim = len(starts)
    if fold_phase_r is not None:
        assert fold_phase_r in (1, 2, 4) and tb % fold_phase_r == 0, (
            fold_phase_r, tb,
        )
    b_pad = ((b + tb - 1) // tb) * tb
    re = jnp.pad(re, ((0, b_pad - b), (0, 0)))
    im = jnp.pad(im, ((0, b_pad - b), (0, 0)))
    m = jnp.asarray(folded)  # [2l, 2k]
    grid = b_pad // tb
    spec_tile = pl.BlockSpec((tb, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((l2, k2), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((c_dim, tb, k2), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    if power_masks is not None:
        cm = power_masks.shape[1]
        kernel = functools.partial(
            _kernel_shared_measured, starts=starts, l=l,
            fold_phase_r=fold_phase_r,
        )
        out, powers = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                spec_tile, spec_tile, mat_spec,
                pl.BlockSpec((n, cm), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                out_spec,
                pl.BlockSpec((tb, cm), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((c_dim, b_pad, k2), jnp.float32),
                jax.ShapeDtypeStruct((b_pad, cm), jnp.float32),
            ),
            scratch_shapes=[pltpu.VMEM((c_dim * tb, l2), jnp.float32)],
            interpret=interpret,
        )(re, im, m, jnp.asarray(power_masks, jnp.float32))
        powers = powers[:b]
    else:
        kernel = functools.partial(
            _kernel_shared, starts=starts, l=l, fold_phase_r=fold_phase_r
        )
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[spec_tile, spec_tile, mat_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((c_dim, b_pad, k2), jnp.float32),
            scratch_shapes=[pltpu.VMEM((c_dim * tb, l2), jnp.float32)],
            interpret=interpret,
        )(re, im, m)
    out = out[:, :b]
    if pairs:
        out = out.reshape(c_dim, b, -1, 2)
    else:
        kept = k2 // 2
        y = out.reshape(c_dim, b, kept, 2)
        out = jax.lax.complex(y[..., 0], y[..., 1])
    if power_masks is not None:
        return out, powers
    return out


def fused_extract_static(
    spectrum: jax.Array,
    starts,
    folded: np.ndarray,
    *,
    pairs: bool = True,
    tb: int = _TB,
    interpret: bool = False,
) -> jax.Array:
    """Extract C static channels from [B, N] spectra in one fused kernel.

    Args:
      spectrum: [B, N] complex64 spectra (normalized, fftshifted), or a
        (re, im) tuple of float32 planes (planar pipelines skip the
        complex materialization entirely).
      starts: length-C sequence of PYTHON ints (static slice starts).
      folded: [C, 2l, 2k] float32 window-folded rr-IDFT matrices, rows
        0..l the real-plane half, l..2l the imaginary-plane half (the
        same matrices extract_bucket folds; interleaved pairs columns).
      pairs: return [C, B, k, 2] float pairs (False: complex64).
      tb: spectrum-tile height (grid granularity).
      interpret: Pallas interpreter mode (CPU tests).

    Returns [C, B, k, 2] float32 (pairs) or [C, B, k] complex64.
    """
    if isinstance(spectrum, tuple):
        re, im = spectrum
    else:
        re, im = jnp.real(spectrum), jnp.imag(spectrum)
    b, n = re.shape
    c_dim, l2, k2 = folded.shape
    l = l2 // 2
    starts = [int(s) for s in starts]
    assert len(starts) == c_dim
    b_pad = ((b + tb - 1) // tb) * tb
    re = jnp.pad(re, ((0, b_pad - b), (0, 0)))
    im = jnp.pad(im, ((0, b_pad - b), (0, 0)))
    mt = jnp.asarray(folded[:, :l])
    mb = jnp.asarray(folded[:, l:])
    grid = b_pad // tb
    kernel = functools.partial(_kernel, starts=starts, l=l)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tb, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_dim, l, k2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_dim, l, k2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c_dim, tb, k2), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c_dim, b_pad, k2), jnp.float32),
        interpret=interpret,
    )(re, im, mt, mb)
    out = out[:, :b]
    if pairs:
        return out.reshape(c_dim, b, -1, 2)
    kept = k2 // 2
    y = out.reshape(c_dim, b, kept, 2)
    return jax.lax.complex(y[..., 0], y[..., 1])
