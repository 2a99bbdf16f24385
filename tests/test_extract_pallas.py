"""Fused Pallas static-bucket extraction == XLA fold path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdc_tpu.ops.extract import extract_bucket
from fdc_tpu.ops.extract_pallas import fused_extract_static
from fdc_tpu.ops.fft import _rr_idft_matrix


def fold(windows, l, keep_from, gain, pairs=True):
    m = _rr_idft_matrix(l, keep_from, True, float(gain), pairs=pairs)
    return (
        np.concatenate([windows, windows], axis=1)[:, :, None] * m[None]
    ).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize(
    "b,n,l,c,keep_from,gain",
    [
        (13, 512, 64, 5, 16, 64.0),   # odd B exercises tile padding
        (64, 1024, 128, 3, 32, 1.0),
        (7, 256, 32, 1, 0, 32.0),
    ],
)
def test_fused_matches_fold_path(seed, b, n, l, c, keep_from, gain):
    rng = np.random.default_rng(seed)
    spec = (
        rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    ).astype(np.complex64)
    starts = np.sort(rng.choice(n - l, size=c, replace=False)).astype(
        np.int32
    )
    wins = rng.random((c, l)).astype(np.float32) + 0.1

    ref = extract_bucket(
        jnp.asarray(spec), starts, wins, gain=gain, use_mxu=True,
        keep_from=keep_from, pairs=True,
    )  # CPU backend -> XLA fold path
    got = fused_extract_static(
        jnp.asarray(spec), starts, fold(wins, l, keep_from, gain),
        pairs=True, tb=8, interpret=True,
    )
    a, g = np.asarray(ref), np.asarray(got)
    assert g.shape == a.shape
    rel = np.sqrt(np.mean((a - g) ** 2) / np.mean(a**2))
    assert rel < 1e-6, rel


def test_fused_complex_output():
    rng = np.random.default_rng(3)
    b, n, l, c = 9, 256, 32, 2
    spec = (
        rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    ).astype(np.complex64)
    starts = np.asarray([10, 100], np.int32)
    wins = rng.random((c, l)).astype(np.float32) + 0.1
    ref = extract_bucket(
        jnp.asarray(spec), starts, wins, use_mxu=True, keep_from=8,
        pairs=True,
    )
    got = fused_extract_static(
        jnp.asarray(spec), starts, fold(wins, l, 8, 1.0), pairs=False,
        tb=8, interpret=True,
    )
    ref_c = np.asarray(ref)[..., 0] + 1j * np.asarray(ref)[..., 1]
    g = np.asarray(got)
    rel = np.sqrt(np.mean(np.abs(ref_c - g) ** 2) / np.mean(np.abs(ref_c) ** 2))
    assert rel < 1e-6, rel
