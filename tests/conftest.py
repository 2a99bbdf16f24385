"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated on forced host-platform devices
(no TPU needed); numerics are identical to the TPU path modulo fp32 FFT
rounding, which tests bound with explicit tolerances.

Note: the environment pre-imports jax via sitecustomize, so platform
selection must go through jax.config (env vars are read too early).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


# ---------------------------------------------------------------------------
# slow lane (VERDICT r3 item 7): the default `pytest tests/ -q` run keeps
# every test FAMILY but trims fuzz-seed tails, soak, and multi-process
# tests into an opt-in lane so the default suite stays under ~6 minutes.
# Run the full set with `pytest tests/ --runslow` (or FDC_TPU_RUNSLOW=1).
# ---------------------------------------------------------------------------

import pytest

SLOW_MODULES = {"test_integration_soak", "test_multihost_twoprocess"}
SEED_KEEP = 2  # seed-parameterized fuzz families keep their first N seeds


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run the slow lane (fuzz-seed tails, soak, multihost)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: opt-in lane (fuzz tails, soak, multi-process)"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("FDC_TPU_RUNSLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow lane: pass --runslow (or FDC_TPU_RUNSLOW=1)"
    )
    # rank each fuzz family's seeds so the default lane keeps the first
    # SEED_KEEP of them regardless of the family's seed numbering
    fams = {}
    for item in items:
        cs = getattr(item, "callspec", None)
        if cs is not None and "seed" in cs.params:
            fams.setdefault(
                (item.module.__name__, item.originalname), set()
            ).add(cs.params["seed"])
    keep = {k: set(sorted(v)[:SEED_KEEP]) for k, v in fams.items()}
    for item in items:
        slow = item.module.__name__ in SLOW_MODULES or (
            "slow" in item.keywords
        )
        cs = getattr(item, "callspec", None)
        if not slow and cs is not None and "seed" in cs.params:
            fam = (item.module.__name__, item.originalname)
            slow = cs.params["seed"] not in keep[fam]
        if slow:
            item.add_marker(skip)
