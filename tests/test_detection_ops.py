"""Unit tests for detection primitives vs golden sequential logic."""

import numpy as np
import pytest

import jax.numpy as jnp

from fdc_tpu.ops.detect import (
    band_power,
    cell_power,
    ceil_log2,
    detect_candidates,
    match_candidates,
)

RNG = np.random.default_rng(3)


def golden_candidates(power, thresh):
    """Direct transcription of get_active_channels in cell units
    (reference: lib/SegmentDetection_impl.cc:195-244)."""
    nc = len(power)
    ratio = power[1:] / power[:-1]
    rise = sorted(
        [(float(ratio[i]), i) for i in range(nc - 1) if ratio[i] > thresh],
        key=lambda p: -p[0],
    )
    falls = [i for i in range(nc - 1) if ratio[i] < 1.0 / thresh]
    poss = []
    for _, s in rise:
        nxt = next((j + 1 for j in falls if j >= s), None)
        if nxt is None:
            continue
        if any(s < pe and nxt >= ps for ps, pe in poss):
            continue
        poss.append((s, nxt))
    return poss


def test_ceil_log2():
    v = jnp.asarray([1, 2, 3, 4, 5, 63, 64, 65, 1024, 4096], jnp.int32)
    out = np.asarray(ceil_log2(v, 13))
    ref = [0, 1, 2, 2, 3, 6, 6, 7, 10, 12]
    np.testing.assert_array_equal(out, ref)


def test_band_power_matches_direct_sum():
    b, n, c = 7, 256, 5
    sq = RNG.random((b, n)).astype(np.float32)
    masks = np.zeros((n, c), np.float32)
    bounds = [(10, 30), (40, 41), (100, 200), (0, 256), (250, 256)]
    for i, (a, z) in enumerate(bounds):
        masks[a:z, i] = 1.0
    out = np.asarray(band_power(jnp.asarray(sq), jnp.asarray(masks)))
    for i, (a, z) in enumerate(bounds):
        np.testing.assert_allclose(out[:, i], sq[:, a:z].sum(axis=1), rtol=1e-5)


def test_cell_power_matches_reshape_sum():
    b, n = 4, 512
    sq = RNG.random((b, n)).astype(np.float32)
    out = np.asarray(cell_power(jnp.asarray(sq), 37, 20, 11))
    ref = sq[:, 37 : 37 + 220].reshape(b, 20, 11).sum(-1)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


@pytest.mark.parametrize("trial", range(8))
def test_detect_candidates_matches_golden(trial):
    rng = np.random.default_rng(100 + trial)
    nc = 40
    # noise floor with a few strong plateaus -> clean rises/falls
    power = rng.random(nc).astype(np.float32) * 0.1 + 0.05
    for _ in range(rng.integers(0, 4)):
        a = rng.integers(0, nc - 3)
        w = rng.integers(1, 6)
        power[a : a + w] += rng.random() * 50 + 10
    thresh = 4.0

    ref = golden_candidates(power.astype(np.float64), thresh)

    k = 16
    cs, ce, cv = detect_candidates(jnp.asarray(power), thresh, k)
    ours = [
        (int(cs[i]), int(ce[i])) for i in range(k) if bool(cv[i])
    ]
    assert ours == ref, f"trial {trial}: {ours} != {ref}"


def golden_match(cands, slots):
    """Transcription of match_active_channels consume semantics
    (reference: lib/SegmentDetection_impl.cc:246-288). slots: list of
    (det_start, det_stop) in activation order."""
    poss = list(cands)
    refreshed = []
    for (ds, de) in slots:
        matched = False
        rem = []
        for (ps, pe) in poss:
            if ps < de and pe >= ds:
                matched = True
            else:
                rem.append((ps, pe))
        poss = rem
        refreshed.append(matched)
    return refreshed, poss


@pytest.mark.parametrize("trial", range(8))
def test_match_candidates_matches_golden(trial):
    rng = np.random.default_rng(200 + trial)
    s, k = 8, 6
    # random slot table in random activation order
    active = rng.random(s) < 0.7
    ds = rng.integers(0, 900, s)
    de = ds + rng.integers(10, 100, s)
    order = rng.permutation(s).astype(np.int32)

    n_c = rng.integers(0, k + 1)
    cs = rng.integers(0, 900, k)
    ce = cs + rng.integers(10, 120, k)
    cv = np.arange(k) < n_c

    refreshed, consumed = match_candidates(
        jnp.asarray(cs, jnp.int32),
        jnp.asarray(ce, jnp.int32),
        jnp.asarray(cv),
        jnp.asarray(active),
        jnp.asarray(ds, jnp.int32),
        jnp.asarray(de, jnp.int32),
        jnp.asarray(order),
    )
    refreshed = np.asarray(refreshed)
    consumed = np.asarray(consumed)

    # golden: slots visited in activation order
    order_idx = np.argsort(order)
    live = [i for i in order_idx if active[i]]
    cands = [(int(cs[i]), int(ce[i])) for i in range(k) if cv[i]]
    g_refreshed, g_left = golden_match(cands, [(ds[i], de[i]) for i in live])

    for pos, i in enumerate(live):
        assert bool(refreshed[i]) == g_refreshed[pos], (trial, i)
    for i in np.nonzero(~active)[0]:
        assert not refreshed[i]
    # consumed = all valid candidates minus the leftovers
    left_ours = [
        (int(cs[i]), int(ce[i]))
        for i in range(k)
        if cv[i] and not consumed[i]
    ]
    assert left_ours == g_left, (trial, left_ours, g_left)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_greedy_accept_batch_matches_per_block(seed):
    """The one-kernel batched greedy acceptance (Pallas, interpret mode)
    == the per-block reference loop, including overlap chains, ties,
    and invalid holes."""
    import jax
    import jax.numpy as jnp

    from fdc_tpu.ops.detect import detect_candidates, detect_candidates_batch

    rng = np.random.default_rng(seed)
    b, nc = 48, 34
    power = 10.0 ** rng.uniform(-6, 1, (b, nc)).astype(np.float32)
    thresh = 10 ** 0.6
    k = nc - 1  # exact mode

    s_ref, e_ref, v_ref = jax.vmap(
        lambda p: detect_candidates(p, thresh, k)
    )(jnp.asarray(power))
    s_b, e_b, v_b = detect_candidates_batch(
        jnp.asarray(power), thresh, k, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_b))
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_b))
    np.testing.assert_array_equal(np.asarray(e_ref), np.asarray(e_b))
