"""Ablation 31: where does exact-mode detection's batched pre-pack cost
go? (Follow-up to ablate30 — the kernel tiers shrank the scan cost, but
the full flagship step still shows exact ~+0.04 ms over K=8.)

Times jit(_packed_candidates) alone — detect_edges (ratio/pairing +
ordering), greedy acceptance, compaction, geometry, pack — at the
flagship segment (n_cells=33) and pod segment (n_cells=93) shapes for
bounded vs exact K, A/B-ing the greedy-acceptance form (static unroll
vs lax.scan, the `greedy_unroll` knob) and, in exact mode, the ordering
form (rank-permutation matmul vs lax.top_k).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate31_tpu.py
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

    import fdc_tpu.ops.detect as detect_mod
    from fdc_tpu.models.segment_detection import SegmentDetector
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    B = 512
    results = {}

    def seg(band, max_slots, mc):
        lo, hi = band
        return SegmentDetector(
            0, 4096, 4, lo, hi, 6.0, 0.005, 0.2,
            channel_deactivation_delay=0, max_slots=max_slots,
            max_candidates=mc, max_extract_width=512,
        )

    def pack_time(sd, pw, unroll):
        orig = detect_mod.detect_candidates

        def patched(p, thresh, k, zero_floor=False, greedy_unroll=None):
            return orig(p, thresh, k, zero_floor=zero_floor,
                        greedy_unroll=unroll)

        detect_mod.detect_candidates = patched
        # segment_detection imported the symbol directly
        import fdc_tpu.models.segment_detection as sdm
        sdm_orig = sdm.detect_candidates
        sdm.detect_candidates = patched
        try:
            powf = jax.device_put(jnp.asarray(pw))

            def step(carry, p, t):
                packed, _ = sd._packed_candidates(p)
                return carry, packed

            return time_scanned(
                step, jnp.float32(0.0), powf, k=512, repeats=15,
                perturb_arg=0,
            )
        finally:
            detect_mod.detect_candidates = orig
            sdm.detect_candidates = sdm_orig

    for label, band, slots, mcs in (
        ("S16", (0.91, 0.99), 16, (8, 0)),       # flagship segment
        ("S128", (0.55, 0.775), 128, (32, 0)),   # cfg5b quarter segment
    ):
        nc = seg(band, slots, 8).geometry.n_cells
        print(f"{label}: n_cells={nc}", file=sys.stderr)
        pw = (1e-6 * (1.0 + rng.random((B, nc)))).astype(np.float32)
        pw[:, 5] *= 1e3  # one dwelling carrier
        for mc in mcs:
            sd = seg(band, slots, mc)
            k = sd.k_detect
            name = "exact" if mc == 0 else f"k{mc}"
            for unroll in (0, 16, 64):
                if unroll and k > unroll and not (unroll == 16):
                    pass  # still measure: scan vs 16 vs 64 thresholds
                dt = pack_time(sd, pw, unroll)
                results[f"pack_{label}_{name}_u{unroll}_ms"] = round(
                    dt * 1e3, 4
                )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
