"""Timing-utility contracts (fdc_tpu.utils.profiling).

These run on the CPU mesh and check SEMANTICS (shapes, estimator
plumbing, LICM-proofing structure), not absolute timings.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fdc_tpu.utils.profiling import (
    checksum,
    time_scanned,
    time_scanned_paired,
    time_scanned_stats,
)


def _step_mul(c, x, t):
    nc = c * jnp.float32(1.0000001)
    return nc, x * nc


def test_time_scanned_stats_fields():
    st = time_scanned_stats(
        _step_mul, jnp.float32(1.0), jnp.ones((64,), jnp.float32),
        k=4, repeats=5,
    )
    for f in ("median", "q25", "q75", "min", "max", "n"):
        assert f in st
    assert st["n"] >= 5
    assert st["q25"] <= st["median"] <= st["q75"]
    assert st["median"] > 0


def test_time_scanned_paired_rounds_aligned():
    """Each spec gets one diff per round, index-aligned across specs,
    and the per-spec stats match their own rounds."""

    def step_b(c, x, t):
        nc = c + jnp.float32(1.0)
        return nc, jnp.sum(x) + nc

    stats = time_scanned_paired(
        [
            (_step_mul, jnp.float32(1.0), (jnp.ones((64,), jnp.float32),),
             4, 0),
            (step_b, jnp.float32(0.0), (jnp.ones((32,), jnp.float32),),
             8, 0),
        ],
        repeats=6,
    )
    assert len(stats) == 2
    a, b = stats
    assert a["n"] == b["n"] == 6
    assert len(a["rounds"]) == len(b["rounds"]) == 6
    for st in stats:
        assert sorted(st["rounds"])[st["n"] // 2] == st["median"]
        assert st["median"] > 0


def test_checksum_covers_all_leaves():
    tree = {"a": jnp.ones((3,)), "b": [jnp.full((2,), 2.0), jnp.zeros(())]}
    v = float(checksum(tree))
    assert v == 3.0 + 4.0 + 0.0


def test_time_scanned_matches_stats_median():
    x = jnp.ones((16,), jnp.float32)
    # not equal across calls (separate timings), but both positive and
    # same units; smoke the wrapper plumbing
    t1 = time_scanned(_step_mul, jnp.float32(1.0), x, k=4, repeats=5)
    assert t1 > 0
