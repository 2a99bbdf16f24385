"""Ablation 28: true in-step marginals of the detection-logic pieces.

The standalone stage timings (ablate25/26/27) do not add up — each
carries per-leaf checksum + launch overhead that the fused full step
does not pay. This driver measures each piece's HONEST marginal by
stubbing it inside the real ``_device_step`` (same trace, same consumers,
same output shapes) and differencing against the unmodified step:

  V0  full step (reference point)
  V1  extract_plan -> identity arange (plan marginal)
  V2  V1 + scans stubbed (powact scan_flags + lifecycle kernel return
      constants / pass state through) — scans marginal
  V3  V2 + candidate packing stubbed (constant packed rows) — packing
      marginal
  V4  V3 + measure columns unused (powers taken as constants; the
      extract_bucket_measured fusion stays, its power output is dropped)
      — residual measure/glue marginal

V0 - V4 + roofline should reproduce bench's full-roofline gap; the
deltas name where to aim.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate28_tpu.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import __graft_entry__ as ge
    import fdc_tpu.models.channelizer as chanmod
    from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
    from fdc_tpu.utils.cplx import c2f_host
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    B = 512
    cfg = ge._flagship(batch_blocks=B)

    rng = np.random.default_rng(0)
    n = B * cfg.inplen
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))

    results = {}

    def measure(tag, fdc):
        carry0 = fdc._jit_init()

        def step(c, xx, t):
            return fdc._device_step(c, xx, t * jnp.int32(B))

        dt = time_scanned(step, carry0, xf, k=48, repeats=15)
        results[tag] = round(dt * 1e3, 4)
        print(tag, results[tag], file=sys.stderr)

    # V0: unmodified
    measure("V0_full_ms", FrequencyDomainChannelizer(cfg))

    # V1: extract_plan -> identity (no compaction logic)
    fdc = FrequencyDomainChannelizer(cfg)
    for sd in fdc.segments:
        e = sd.extract_budget

        def plan_id(got, processed, _e=e):
            return (
                jnp.arange(_e, dtype=jnp.int32),
                jnp.int32(0),
            )

        sd.extract_plan = plan_id
    measure("V1_plan_stubbed_ms", fdc)

    # V2: V1 + scans stubbed (states pass through, flags constant)
    fdc = FrequencyDomainChannelizer(cfg)
    for sd in fdc.segments:
        e = sd.extract_budget

        def plan_id(got, processed, _e=e):
            return (
                jnp.arange(_e, dtype=jnp.int32),
                jnp.int32(0),
            )

        sd.extract_plan = plan_id

    def stub_multi(segments, powers, states, packed_list=None,
                   powact=None):
        outs = []
        for sd, st in zip(segments, states):
            s = sd.max_slots
            z = jnp.zeros((B, s), bool)
            zi = jnp.zeros((B, s), jnp.int32)
            outs.append((st, (z, z, z, zi)))
        if powact is not None:
            bank, pa_powers, pa_state = powact
            return outs, stub_flags(pa_powers, pa_state)
        return outs

    pa = fdc.power_bank

    def stub_flags(powers, state, _pa=pa):
        # keep a data dependency on `powers` so XLA cannot DCE the measure
        # columns out of the fused extraction matmul (the comparison is
        # opaque to the algebraic simplifier, unlike *0)
        z = powers.T > jnp.float32(jnp.inf)  # [C, B] all-False
        zi = z.astype(jnp.int32)
        return state, (z, z, ~z, zi)

    orig_multi = chanmod.scan_slots_multi
    chanmod.scan_slots_multi = stub_multi
    pa.scan_flags = stub_flags
    try:
        measure("V2_scans_stubbed_ms", fdc)

        # V3: V2 + packing stubbed (constant packed rows, k_pack wide —
        # packs are compacted/truncated since round 4)
        for sd in fdc.segments:
            def packed_stub(power, _k=sd.k_pack):
                return jnp.zeros((B, 7 * _k), jnp.int32), _k

            sd._packed_candidates = packed_stub
        measure("V3_packing_stubbed_ms", fdc)
    finally:
        chanmod.scan_slots_multi = orig_multi

    print(json.dumps(results))


if __name__ == "__main__":
    main()
