"""Ablation 25: pipeline stage times on the real chip (flagship shape).

The MPMD batch pipeline (parallel/pipeline.py) farms stage A (front-end +
flag-independent extraction) and stage C (detection-slot extraction) over
worker devices while stage B (scans + plans) runs ahead on the owner.
Only one chip is reachable here, so the pipeline's scaling claim rests on
an analytic model over MEASURED single-chip stage times:

    X(W) = min((W_x)/(A+C), 1/B)    batches/s, W_x = workers
    eff(W) = X · (A+B+C) / W

This driver measures A, B, C (and the plain fused step for reference) at
the flagship config (4096-pt FFT, 64 throughput channels, burst bank,
one detection segment, B=512), via LICM-proof scanned timing.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate25_tpu.py
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
    from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
    from fdc_tpu.parallel.pipeline import PipelineChannelizer
    from fdc_tpu.utils.cplx import c2f_host
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    B = 512
    cfg = ge._flagship(batch_blocks=B)
    pipe = PipelineChannelizer(cfg, devices=jax.devices()[:1])
    plain = FrequencyDomainChannelizer(cfg)

    rng = np.random.default_rng(0)
    n_ext = (B + 1) * cfg.inplen
    x_ext = (
        0.01 * (rng.standard_normal(n_ext) + 1j * rng.standard_normal(n_ext))
    )
    t = np.arange(n_ext)
    x_ext += 0.8 * np.exp(2j * np.pi * -0.2001953125 * t)  # tp carrier
    x_ext = x_ext.astype(np.complex64)
    xf_ext = jax.device_put(jnp.asarray(c2f_host(x_ext)))
    histf = jax.device_put(
        jnp.asarray(np.zeros((cfg.ovllen, 2), np.float32))
    )

    # one real pass to obtain representative intermediates (no resume
    # override: ov_flag=False leaves the recomputed reach-back row)
    ov_rowf = jnp.zeros((cfg.blocksize, 2), jnp.float32)
    ov_flag = jnp.bool_(False)
    out_s, pa_p, pa_e, seg_p, seg_k, spec_ext, _ = pipe._jit_front(
        histf, xf_ext, jnp.int32(0), ov_rowf, ov_flag
    )
    carry0 = pipe._jit_init()
    carry1, scans = pipe._jit_scan(carry0, pa_p, seg_k)
    states = [st for st, _ in scans["segs"]]
    plans = [
        {k: so[k] for k in ("slot_ids", "slot_ids_narrow") if k in so}
        for _, so in scans["segs"]
    ]

    results = {}

    def timed(step, carry, arg, k0):
        """time_scanned with K auto-sized to keep K*step >= 30 ms
        (round-4 timing rule (c): the stage-A FFT split and the tiered
        kernel pushed fixed-K windows under the dispatch-jitter floor —
        stage B at ~12 us x K=96 was a 1.2 ms window)."""
        dt = time_scanned(step, carry, arg, k=k0, repeats=7)
        if dt * k0 < 0.025:
            k = int(min(4096, max(k0, 0.030 / max(dt, 1e-7))))
            dt = time_scanned(step, carry, arg, k=k, repeats=15)
        return dt

    def stage_a(c, xf, t):
        outs = pipe._jit_front(histf, xf, jnp.int32(0), ov_rowf, ov_flag)
        # checksum-thread the big outputs so nothing is dead-code-eliminated
        return c, outs

    results["A_front_static_ms"] = round(
        timed(stage_a, jnp.zeros(()), xf_ext, 64) * 1e3, 4
    )

    def stage_b(c, pp, t):
        nc, sc = pipe._jit_scan(c, pp, seg_k)
        return nc, sc

    results["B_scan_plans_ms"] = round(
        timed(stage_b, carry0, pa_p, 96) * 1e3, 4
    )

    spec_f = jnp.concatenate(
        [jnp.real(spec_ext)[..., None], jnp.imag(spec_ext)[..., None]],
        axis=-1,
    )

    def stage_c(c, sf, t):
        sx = jax.lax.complex(sf[..., 0], sf[..., 1])
        return c, pipe._jit_slots(sx, states, plans)

    results["C_slot_extract_ms"] = round(
        timed(stage_c, jnp.zeros(()), spec_f, 64) * 1e3, 4
    )

    # plain fused step for reference
    n = B * cfg.inplen
    xf = jax.device_put(jnp.asarray(c2f_host(x_ext[:n])))
    pcarry = plain._jit_init()

    def step(c, xx, t):
        return plain._device_step(c, xx, t * jnp.int32(B))

    dt = timed(step, pcarry, xf, 64)
    results["plain_step_ms"] = round(dt * 1e3, 4)

    a, b, c = (
        results["A_front_static_ms"],
        results["B_scan_plans_ms"],
        results["C_slot_extract_ms"],
    )
    # Efficiency vs the PLAIN fused step (the honest baseline: the
    # decomposition itself costs A+B+C − plain of lost fusion /
    # re-materialized spectra). shared owner: the scan device also
    # extracts its 1/W share, so it is the bottleneck at
    # X·(B + (A+C)/W) = 1; dedicated owner: W-1 extraction devices, the
    # scan rate 1/B caps throughput.
    p = results["plain_step_ms"]
    results["decomposition_overhead_ms"] = round(a + b + c - p, 4)
    for w in (2, 4, 8, 16):
        results[f"eff_w{w}_shared"] = round(
            (w / (w * b + a + c)) * p / w, 3
        )
        x_rate = min((w - 1) / (a + c), 1.0 / b)
        results[f"eff_w{w}_dedicated"] = round(x_rate * p / w, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
