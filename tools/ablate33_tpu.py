"""Ablation 33: drift-cancelled in-step marginals (exact-mode flagship).

ablate28's sequential variant timing cannot resolve 5-15 us pieces any
more — inter-variant tunnel drift is ±10-20 us and the round-4 readings
came out non-monotonic. This driver interleaves the variants through
time_scanned_paired (one K/2K pair of each per round, like bench.py) and
reports median-of-per-round DIFFS against V0, which cancels round-scale
drift exactly.

Variants (cumulative stubs, all patched PER INSTANCE so the four step
functions coexist):
  V0  full exact-mode flagship step
  V1  extract_plan -> identity arange
  V2  V1 + scans stubbed (lifecycle kernel + powact: states pass
      through, constant flags) — via a per-instance _scan_detections
  V3  V2 + candidate packing stubbed (constant packed rows)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate33_tpu.py
"""

import json
import os
import sys
import types

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
    from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
    from fdc_tpu.utils.cplx import c2f_host
    from fdc_tpu.utils.profiling import time_scanned_paired

    print("devices:", jax.devices(), file=sys.stderr)

    B = 512
    cfg = ge._flagship(batch_blocks=B)
    rng = np.random.default_rng(0)
    n = B * cfg.inplen
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))

    def patch_plan(fdc):
        for sd in fdc.segments:
            e = sd.extract_budget

            def plan_id(got, processed, _e=e):
                return jnp.arange(_e, dtype=jnp.int32), jnp.int32(0)

            sd.extract_plan = plan_id

    def patch_scans(fdc):
        def scan_stub(self, carry_io, pa_powers, seg_packed):
            scans = {}
            if self.power_bank:
                c = self.power_bank.num_channels
                zf = jnp.zeros((c, B), bool)
                scans["powact"] = (zf, zf, zf, jnp.zeros((c, B), jnp.int32))
            segs = []
            for i, sd in enumerate(self.segments):
                st = carry_io[f"seg{i}"]
                zf = jnp.zeros((sd.max_slots, B), bool)
                so = {
                    "activated": zf, "processed": zf, "emit": zf,
                    "phase_used": jnp.zeros((sd.max_slots, B), jnp.int32),
                    "slot_meta": {
                        "ext_start": st["ext_start"],
                        "wlog2": st["wlog2"],
                        "order": st["order"],
                    },
                    "slot_ids": jnp.arange(
                        sd.extract_budget, dtype=jnp.int32
                    ),
                    # consume the packed rows (always 0, but opaque to
                    # the compiler) so V2 does NOT dead-code-eliminate
                    # the candidate packing — V3 then isolates it
                    "ext_overflow": jnp.sum(seg_packed[i]) % jnp.int32(1),
                }
                segs.append((st, so))
            scans["segs"] = segs
            return scans

        fdc._scan_detections = types.MethodType(scan_stub, fdc)

    def patch_pack(fdc):
        for sd in fdc.segments:
            def packed_stub(power, _k=sd.k_pack):
                return jnp.zeros((B, 7 * _k), jnp.int32), _k

            sd._packed_candidates = packed_stub

    import fdc_tpu.ops.lifecycle_pallas as lp

    variants = []
    for name, patches, stub_kernel in (
        ("V0", [], False),
        ("V1_plan", [patch_plan], False),
        # kernel-only stub: wrapper glue (state pack/unpack, nv/tier
        # inputs) KEPT — V0-V2k = kernel launch+execution,
        # V2k-V2 = wrapper glue + flags consumption
        ("V2k_kernel", [patch_plan], True),
        ("V2_scans", [patch_plan, patch_scans], False),
        ("V3_pack", [patch_plan, patch_scans, patch_pack], False),
    ):
        fdc = FrequencyDomainChannelizer(cfg)
        for p in patches:
            p(fdc)
        carry0 = fdc._jit_init()

        def step(c, xx, t, _f=fdc, _sk=stub_kernel):
            # trace-time side effect: selects the kernel stub for THIS
            # variant's trace only (the flag is read at trace time)
            lp._STUB_KERNEL = _sk
            return _f._device_step(c, xx, t * jnp.int32(B))

        variants.append((name, step, carry0))

    stats = time_scanned_paired(
        [(st, c0, (xf,), 48, 0) for _, st, c0 in variants], repeats=31
    )
    results = {}
    v0_rounds = stats[0]["rounds"]
    for (name, _, _), s in zip(variants, stats):
        results[f"{name}_ms"] = round(s["median"] * 1e3, 4)
        if name != "V0":
            diffs = sorted(
                a - b for a, b in zip(v0_rounds, s["rounds"])
            )
            results[f"{name}_marginal_ms"] = round(
                diffs[len(diffs) // 2] * 1e3, 4
            )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
