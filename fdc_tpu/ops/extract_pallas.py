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

__all__ = ["fused_extract_static", "fused_extract_vmem_bytes"]

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
