"""Fused Pallas static-bucket extraction == XLA fold path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdc_tpu.ops.extract import apply_phase_pairs, extract_bucket
from fdc_tpu.ops.extract_pallas import (
    fused_extract_shared,
    fused_extract_static,
)
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


@pytest.mark.parametrize("seed", [0, 2])
@pytest.mark.parametrize(
    "b,n,l,c,keep_from,gain",
    [
        (13, 512, 64, 5, 16, 64.0),
        (64, 1024, 128, 3, 32, 1.0),
    ],
)
def test_fused_shared_matches_fold_path(seed, b, n, l, c, keep_from, gain):
    """Equal-window bucket through the shared-matrix kernel (no phase)."""
    rng = np.random.default_rng(seed)
    spec = (
        rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    ).astype(np.complex64)
    starts = np.sort(rng.choice(n - l, size=c, replace=False)).astype(
        np.int32
    )
    win = (rng.random(l).astype(np.float32) + 0.1)
    wins = np.tile(win, (c, 1))

    ref = extract_bucket(
        jnp.asarray(spec), starts, wins, gain=gain, use_mxu=True,
        keep_from=keep_from, pairs=True,
    )
    m = _rr_idft_matrix(l, keep_from, True, float(gain), pairs=True)
    folded = (np.concatenate([win, win])[:, None] * m).astype(np.float32)
    got = fused_extract_shared(
        jnp.asarray(spec), starts, folded, pairs=True, tb=8, interpret=True,
    )
    a, g = np.asarray(ref), np.asarray(got)
    assert g.shape == a.shape
    rel = np.sqrt(np.mean((a - g) ** 2) / np.mean(a**2))
    assert rel < 1e-6, rel


@pytest.mark.parametrize("r", [1, 2, 4])
def test_fused_shared_phase_fold(r):
    """qpat quarter-turn folding == extract + apply_phase_pairs (t0=0)."""
    rng = np.random.default_rng(7)
    b, n, l, c, keep_from, tb = 21, 512, 64, 5, 16, 8
    spec = (
        rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    ).astype(np.complex64)
    starts = np.sort(rng.choice(n - l, size=c, replace=False)).astype(
        np.int32
    )
    win = rng.random(l).astype(np.float32) + 0.1
    wins = np.tile(win, (c, 1))

    y = extract_bucket(
        jnp.asarray(spec), starts, wins, gain=float(l), use_mxu=True,
        keep_from=keep_from, pairs=True,
    )
    phase_idx = (
        jnp.arange(b, dtype=jnp.int32)[None, :]
        * jnp.asarray(starts)[:, None]
    ) % r
    ref = np.asarray(apply_phase_pairs(y, phase_idx, r))

    m = _rr_idft_matrix(l, keep_from, True, float(l), pairs=True)
    folded = (np.concatenate([win, win])[:, None] * m).astype(np.float32)
    got = np.asarray(
        fused_extract_shared(
            jnp.asarray(spec), starts, folded, fold_phase_r=r, pairs=True,
            tb=tb, interpret=True,
        )
    )
    assert got.shape == ref.shape
    rel = np.sqrt(np.mean((ref - got) ** 2) / np.mean(ref**2))
    # the fold applies EXACT quarter turns; apply_phase_pairs carries the
    # ~1e-7 trig round-off of cos(pi/2) etc.
    assert rel < 2e-6, rel


@pytest.mark.parametrize("seed", range(6))
def test_fused_shared_phase_fold_fuzz(seed):
    """Fold algebra fuzz: random (B, tb, l, keep_from, C) with starts
    covering every residue class mod R, B deliberately not a multiple
    of the tile so the padded tail rows interact with the quarter-turn
    row-group pattern."""
    rng = np.random.default_rng(100 + seed)
    r = int(rng.choice([2, 4]))
    tb = int(rng.choice([4, 8]) * r)  # tile must be a multiple of R
    b = int(rng.integers(tb + 1, 4 * tb) | 1)  # odd -> ragged last tile
    l = int(rng.choice([32, 64]))
    n = 512
    keep_from = int(rng.choice([0, l // 4]))
    c = 2 * r  # two starts per residue class
    spec = (
        rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    ).astype(np.complex64)
    base = rng.choice((n - l) // r, size=c, replace=False) * r
    starts = np.sort(base + np.arange(c) % r).astype(np.int32)
    win = rng.random(l).astype(np.float32) + 0.1
    wins = np.tile(win, (c, 1))

    y = extract_bucket(
        jnp.asarray(spec), starts, wins, gain=float(l), use_mxu=True,
        keep_from=keep_from, pairs=True,
    )
    phase_idx = (
        jnp.arange(b, dtype=jnp.int32)[None, :]
        * jnp.asarray(starts)[:, None]
    ) % r
    ref = np.asarray(apply_phase_pairs(y, phase_idx, r))

    m = _rr_idft_matrix(l, keep_from, True, float(l), pairs=True)
    folded = (np.concatenate([win, win])[:, None] * m).astype(np.float32)
    got = np.asarray(
        fused_extract_shared(
            jnp.asarray(spec), starts, folded, fold_phase_r=r, pairs=True,
            tb=tb, interpret=True,
        )
    )
    assert got.shape == ref.shape
    rel = np.sqrt(np.mean((ref - got) ** 2) / np.mean(ref**2))
    assert rel < 2e-6, (rel, r, tb, b, l, keep_from)


def test_extract_bucket_phased_fallback_matches():
    """On CPU the phased wrapper falls back to extract + apply (bit-equal)."""
    from fdc_tpu.ops.extract import apply_phase_pairs, extract_bucket_phased

    rng = np.random.default_rng(11)
    b, n, l, c, keep_from, r = 12, 512, 64, 4, 16, 4
    spec = (
        rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    ).astype(np.complex64)
    starts = np.sort(rng.choice(n - l, size=c, replace=False)).astype(
        np.int32
    )
    wins = np.tile(rng.random(l).astype(np.float32) + 0.1, (c, 1))
    y = extract_bucket(
        jnp.asarray(spec), starts, wins, gain=float(l), use_mxu=True,
        keep_from=keep_from, pairs=True,
    )
    phase_idx = (
        jnp.arange(b, dtype=jnp.int32)[None, :]
        * jnp.asarray(starts)[:, None]
    ) % r
    ref = np.asarray(apply_phase_pairs(y, phase_idx, r))
    got = np.asarray(
        extract_bucket_phased(
            jnp.asarray(spec), starts, wins, r, gain=float(l),
            use_mxu=True, keep_from=keep_from,
        )
    )
    np.testing.assert_array_equal(ref, got)


def test_fold_phase_env_default_off(monkeypatch):
    """The in-kernel quarter-turn fold lost its hardware A/B (ablate19)
    and must stay OFF unless FDC_TPU_FOLD_PHASE=1 is set explicitly."""
    from fdc_tpu.ops.extract import _fold_phase_enabled

    monkeypatch.delenv("FDC_TPU_FOLD_PHASE", raising=False)
    assert _fold_phase_enabled() is False
    monkeypatch.setenv("FDC_TPU_FOLD_PHASE", "1")
    assert _fold_phase_enabled() is True
    monkeypatch.setenv("FDC_TPU_FOLD_PHASE", "0")
    assert _fold_phase_enabled() is False


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


def test_fused_kill_switch(monkeypatch):
    """FDC_TPU_FUSED gates the shared-matrix engagement decision — the
    bench's automatic fallback relies on it when a freshly-landed kernel
    fails to lower on the real chip."""
    import jax

    from fdc_tpu.ops.extract import _shared_fused_matrix

    l, n, c = 16, 64, 3
    wins = np.tile(np.hanning(l).astype(np.float32), (c, 1))
    starts = np.array([4, 20, 36], np.int32)
    spec = np.zeros((8, n), np.complex64)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    monkeypatch.setenv("FDC_TPU_FUSED", "all")
    assert _shared_fused_matrix(spec.shape[1], starts, wins, l, 0, 1.0) is not None
    for mode in ("static", "off", "OFF"):
        monkeypatch.setenv("FDC_TPU_FUSED", mode)
        assert _shared_fused_matrix(spec.shape[1], starts, wins, l, 0, 1.0) is None
    monkeypatch.delenv("FDC_TPU_FUSED")
    assert _shared_fused_matrix(spec.shape[1], starts, wins, l, 0, 1.0) is not None


@pytest.mark.parametrize("seed", [0, 3])
def test_fused_shared_measured_powers(seed):
    """fused_extract_shared(power_masks=...) returns the same extraction
    as the unmeasured kernel plus |X|^2 @ masks power measures matching
    the XLA band_power/cell_power reduces (tolerance: the in-kernel
    matmul's accumulation order differs at ~1e-7 rel)."""
    from fdc_tpu.ops.detect import band_power, cell_power

    b, n, l, c, keep_from, gain = 13, 512, 64, 5, 16, 64.0
    rng = np.random.default_rng(seed)
    spec = (
        rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    ).astype(np.complex64)
    starts = np.sort(rng.choice(n - l, size=c, replace=False)).astype(
        np.int32
    )
    win = rng.random(l).astype(np.float32) + 0.1
    m = _rr_idft_matrix(l, keep_from, True, float(gain), pairs=True)
    folded = (np.concatenate([win, win])[:, None] * m).astype(np.float32)

    # masks: 2 bands + 16 decimation cells of width 8, zero-padded
    masks = np.zeros((n, 128), np.float32)
    masks[40:90, 0] = 1.0
    masks[300:310, 1] = 1.0
    for cc in range(16):
        masks[100 + cc * 8: 100 + (cc + 1) * 8, 2 + cc] = 1.0

    ref_y = fused_extract_shared(
        jnp.asarray(spec), starts, folded, pairs=True, tb=8,
        interpret=True,
    )
    got_y, got_p = fused_extract_shared(
        jnp.asarray(spec), starts, folded, pairs=True, tb=8,
        power_masks=masks, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref_y), np.asarray(got_y))

    sq = jnp.abs(jnp.asarray(spec)) ** 2
    ref_bands = np.asarray(band_power(sq, jnp.asarray(masks[:, :2])))
    ref_cells = np.asarray(cell_power(sq, 100, 16, 8))
    got_p = np.asarray(got_p)
    assert got_p.shape == (b, 128)
    np.testing.assert_allclose(got_p[:, :2], ref_bands, rtol=1e-5)
    np.testing.assert_allclose(got_p[:, 2:18], ref_cells, rtol=1e-5)
    np.testing.assert_array_equal(got_p[:, 18:], 0.0)


def test_extract_bucket_measured_fallback():
    """On a backend where the fused kernel cannot engage (CPU), the
    measured entry returns (extract_bucket_phased values, None)."""
    from fdc_tpu.ops.extract import extract_bucket_measured, extract_bucket_phased

    b, n, l, c = 12, 256, 32, 3
    rng = np.random.default_rng(1)
    spec = (
        rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    ).astype(np.complex64)
    starts = np.array([10, 60, 150], np.int32)
    wins = np.tile(rng.random(l).astype(np.float32) + 0.1, (c, 1))
    masks = np.zeros((n, 128), np.float32)
    masks[20:40, 0] = 1.0

    y, p = extract_bucket_measured(
        jnp.asarray(spec), starts, wins, 4, masks, gain=float(l),
        use_mxu=True, keep_from=l - 24,
    )
    assert p is None
    ref = extract_bucket_phased(
        jnp.asarray(spec), starts, wins, 4, gain=float(l), use_mxu=True,
        keep_from=l - 24,
    )
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))
