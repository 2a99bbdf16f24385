"""Ablation 32: round-4 scaling-model terms for cfg5 / cfg5b (VERDICT r3
item 2), measured on the real chip with the TIERED lifecycle kernel.

For each pod-scale config (cfg5: one 512-slot burst-hunter segment;
cfg5b: the same band as 4 segments x 128 slots) this measures:

  - plain fused step under noise and under a 16-dwelling-carrier busy
    band (the realistic busy case — dwell hits the refresh-only closed
    form since round 3/4),
  - the pipeline stage decomposition A (front + flag-independent
    extraction + measures + candidate packing), B (scans + plans), C
    (slot extraction) — B under noise, busy, and the adversarial
    Bernoulli-churn bound (structural events every few blocks),
  - single-segment-group scan time (cfg5b) = the multi-owner pipeline's
    per-owner B term.

The SPMD / pipeline / composed efficiency models over these terms live
in PERFORMANCE.md ("Round-4 scaling model").

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate32_tpu.py
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
    from fdc_tpu.parallel.pipeline import PipelineChannelizer
    from fdc_tpu.utils.cplx import c2f_host
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    B = 512
    results = {}

    def timed(step, carry, arg, k0, **kw):
        dt = time_scanned(step, carry, arg, k=k0, repeats=7, **kw)
        if dt * k0 < 0.025:
            k = int(min(4096, max(k0, 0.030 / max(dt, 1e-7))))
            dt = time_scanned(step, carry, arg, k=k, repeats=15, **kw)
        return dt

    seg_kw = dict(
        blocksize=4096, relinvovl=4,
        act_det_threshold=6.0, minchandist=0.005,
        max_slots=128, max_candidates=32, max_extract_width=512,
        extract_budget=2, extract_width_split=64, extract_budget_narrow=8,
        freqmode="normalized", batch_blocks=B,
    )
    quarters = [(-0.45, -0.225), (-0.225, 0.0), (0.0, 0.225),
                (0.225, 0.45)]
    configs = {
        "cfg5b": ChannelizerConfig(
            activity_detection_segments=quarters, **seg_kw
        ),
        "cfg5": ChannelizerConfig(
            activity_detection_segments=[(-0.45, 0.45)],
            **{**seg_kw, "max_slots": 512, "extract_budget": 8,
               "extract_budget_narrow": 32},
        ),
    }

    def make_inputs(cfg):
        n_ext = (B + 1) * cfg.inplen
        t = np.arange(n_ext)
        noise = (
            0.01 * (rng.standard_normal(n_ext)
                    + 1j * rng.standard_normal(n_ext))
        ).astype(np.complex64)
        busy = noise.copy()
        for i in range(16):  # dwelling carriers across the band
            f = -0.43 + 0.86 * (i + 0.5) / 16
            busy += (2.0 * np.exp(2j * np.pi * f * t)).astype(np.complex64)
        return noise, busy

    def churn_powers(sd):
        nc = sd.geometry.n_cells
        p = (1e-6 * (1.0 + rng.random((B, nc)))).astype(np.float32)
        p[:, 5] *= np.where(rng.random(B) > 0.5, 1e3, 1.0)
        return jnp.asarray(p)

    for name, cfg in configs.items():
        pipe = PipelineChannelizer(cfg, devices=jax.devices()[:1])
        plain = FrequencyDomainChannelizer(cfg)
        noise, busy = make_inputs(cfg)
        histf = jax.device_put(
            jnp.asarray(np.zeros((cfg.ovllen, 2), np.float32))
        )
        ov_rowf = jnp.zeros((cfg.blocksize, 2), jnp.float32)
        ov_flag = jnp.bool_(False)

        # plain step, noise + busy
        pcarry = plain._jit_init()
        nb_samp = B * cfg.inplen

        def step(c, xx, t):
            return plain._device_step(c, xx, t * jnp.int32(B))

        for wname, xw in (("noise", noise), ("busy", busy)):
            xf = jax.device_put(jnp.asarray(c2f_host(xw[:nb_samp])))
            dt = timed(step, pcarry, xf, 32)
            results[f"{name}_plain_{wname}_ms"] = round(dt * 1e3, 4)

        # pipeline stages
        seg_ks = {}
        for wname, xw in (("noise", noise), ("busy", busy)):
            xf_ext = jax.device_put(jnp.asarray(c2f_host(xw)))
            outs = pipe._jit_front(
                histf, xf_ext, jnp.int32(0), ov_rowf, ov_flag
            )
            (out_s, pa_p, pa_e, seg_p, seg_k, spec_ext, _) = outs
            seg_ks[wname] = (pa_p, seg_k, spec_ext)
            if wname == "busy":
                def stage_a(c, xf, t):
                    return c, pipe._jit_front(
                        histf, xf, jnp.int32(0), ov_rowf, ov_flag
                    )

                dt = timed(stage_a, jnp.zeros(()), xf_ext, 32)
                results[f"{name}_A_ms"] = round(dt * 1e3, 4)

        carry0 = pipe._jit_init()

        # stage B is carry-dependent everywhere that matters (the scans
        # thread the slot tables), so no input perturbation is needed —
        # and these configs have no power bank, so the packed rows are
        # the positional arg (int32; pa_powers is None)
        def stage_b(c, sk, t):
            nc_, sc = pipe._jit_scan(c, seg_ks_cur[0], sk)
            return nc_, sc

        for wname in ("noise", "busy"):
            seg_ks_cur = (seg_ks[wname][0],)
            seg_k = seg_ks[wname][1]
            dt = timed(stage_b, carry0, list(seg_k), 64, perturb_arg=None)
            results[f"{name}_B_{wname}_ms"] = round(dt * 1e3, 4)

        # adversarial churn bound for B: packed rows from churn powers
        churn_packed = [
            jax.jit(sd._packed_candidates)(churn_powers(sd))[0]
            for sd in plain.segments
        ]
        seg_ks_cur = (seg_ks["noise"][0],)
        dt = timed(stage_b, carry0, churn_packed, 64, perturb_arg=None)
        results[f"{name}_B_churn_ms"] = round(dt * 1e3, 4)

        # stage C on the busy tables/plans
        pa_p, seg_k, spec_ext = seg_ks["busy"]
        carry1, scans = pipe._jit_scan(carry0, pa_p, seg_k)
        states = [st for st, _ in scans["segs"]]
        plans = [
            {k: so[k] for k in ("slot_ids", "slot_ids_narrow") if k in so}
            for _, so in scans["segs"]
        ]
        spec_f = jnp.concatenate(
            [jnp.real(spec_ext)[..., None], jnp.imag(spec_ext)[..., None]],
            axis=-1,
        )

        def stage_c(c, sf, t):
            sx = jax.lax.complex(sf[..., 0], sf[..., 1])
            return c, pipe._jit_slots(sx, states, plans)

        dt = timed(stage_c, jnp.zeros(()), spec_f, 32)
        results[f"{name}_C_ms"] = round(dt * 1e3, 4)

        # cfg5b: one segment group's scan alone (multi-owner B term)
        if name == "cfg5b":
            sd0 = plain.segments[0]
            st0 = jax.jit(sd0.init_state)()
            cp = churn_powers(sd0)

            def one_scan(c, pw, t):
                return sd0.scan_slots(pw, c)

            dt = timed(one_scan, st0, cp, 64, perturb_arg=0)
            results["cfg5b_B_own_churn_ms"] = round(dt * 1e3, 4)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
