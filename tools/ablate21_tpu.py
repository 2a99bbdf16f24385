"""Ablation 21: per-segment lifecycle-scan marginal (the scaling model's
sharded-scan term) + the multi-segment config-5b step.

With segment scans owned by chan ranks (parallel/sharded.py), the
replicated detection logic L splits into l_scan per segment (divides by
n_chan) and L0 (stays replicated). This driver measures, on the real
chip:

  (a) scan_slots alone for 1 vs 4 cfg5b-shaped segments (128 slots,
      K=32 candidates, band/4 cells) -> l_scan marginal;
  (b) the full cfg5b (4-segment burst hunter) step and the cfg5
      (1-segment) step for context.

K sized so K*step >= 25 ms (PERFORMANCE.md); median of 15 K-vs-2K diffs.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate21_tpu.py
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

    from fdc_tpu.config import ChannelizerConfig
    from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    B = 512
    seg_kw = dict(
        blocksize=4096, relinvovl=4,
        act_det_threshold=6.0, minchandist=0.005,
        max_slots=128, max_candidates=32, max_extract_width=512,
        extract_budget=2, extract_width_split=64, extract_budget_narrow=8,
        freqmode="normalized", batch_blocks=B,
    )
    quarters = [(-0.45, -0.225), (-0.225, 0.0), (0.0, 0.225), (0.225, 0.45)]

    fdc4 = FrequencyDomainChannelizer(ChannelizerConfig(
        activity_detection_segments=quarters, **seg_kw))
    sds = fdc4.segments

    rng = np.random.default_rng(0)
    # adversarial-churn bound: noise floor + a strong cell toggling
    # RANDOMLY per block (Bernoulli 0.5 — retire/realloc every few
    # blocks, the worst case for any chunked fast path)
    nc = sds[0].geometry.n_cells
    pow_host = (1e-6 * (1.0 + rng.random((B, nc)))).astype(np.float32)
    pow_host[:, 5] *= np.where(rng.random(B) > 0.5, 1e3, 1.0)
    powf = jax.device_put(jnp.asarray(pow_host))
    # steady-dwell busy case: the carrier is PRESENT every block (a real
    # burst re-detects for its whole dwell) — candidates refresh the same
    # slot with no structural events, the refresh-only closed form's
    # target workload
    pow_dwell = (1e-6 * (1.0 + rng.random((B, nc)))).astype(np.float32)
    pow_dwell[:, 5] *= 1e3
    powf_dwell = jax.device_put(jnp.asarray(pow_dwell))

    def make_scan_step(k_segs):
        def step(carry, pw, t):
            new = []
            outs = []
            for i in range(k_segs):
                ns, flags = sds[i].scan_slots(pw, carry[i])
                new.append(ns)
                outs.append(flags)
            return tuple(new), outs

        return step

    results = {}
    for k_segs in (1, 4):
        carry0 = tuple(
            jax.jit(sds[i].init_state)() for i in range(k_segs)
        )
        dt = time_scanned(
            make_scan_step(k_segs), carry0, powf, k=96, repeats=15,
            perturb_arg=0,
        )
        results[f"scan_only_{k_segs}seg_ms"] = round(dt * 1e3, 4)
        dt = time_scanned(
            make_scan_step(k_segs), carry0, powf_dwell, k=96, repeats=15,
            perturb_arg=0,
        )
        results[f"scan_dwell_{k_segs}seg_ms"] = round(dt * 1e3, 4)
    results["l_scan_marginal_ms"] = round(
        (results["scan_only_4seg_ms"] - results["scan_only_1seg_ms"]) / 3,
        4,
    )

    # full steps: cfg5b (4 segments) vs cfg5 (1 segment)
    from fdc_tpu.utils.cplx import c2f_host

    def full_step_time(fdc):
        n = B * fdc.config.inplen
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
        xf = jax.device_put(jnp.asarray(c2f_host(x)))
        carry0 = fdc._jit_init()

        def step(c, xf_in, t):
            return fdc._device_step(c, xf_in, t * jnp.int32(B))

        return time_scanned(step, carry0, xf, k=32, repeats=15)

    dt4 = full_step_time(fdc4)
    results["cfg5b_4seg_step_ms"] = round(dt4 * 1e3, 4)
    results["cfg5b_msps"] = round(B * fdc4.config.inplen / dt4 / 1e6, 1)

    fdc1 = FrequencyDomainChannelizer(ChannelizerConfig(
        activity_detection_segments=[(-0.45, 0.45)],
        **{**seg_kw, "max_slots": 512, "extract_budget": 8,
           "extract_budget_narrow": 32}))
    dt1 = full_step_time(fdc1)
    results["cfg5_1seg_step_ms"] = round(dt1 * 1e3, 4)
    results["cfg5_msps"] = round(B * fdc1.config.inplen / dt1 / 1e6, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
