"""Ablation round 7: re-attribute the step after the MXU-transform pass.

Cumulative ladder over the CURRENT `_step_from_spec` composition (MXU
forward FFT + rr matmul-DFT extraction, budget-8 slot compaction):
each stage adds one component, marginals are adjacent differences.
Attributes the ~0.18 ms of the 0.86 ms step that the older per-component
ablations (pre-MXU restatements) no longer explain.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate7_tpu.py
"""

import json
import os
import sys
import time

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

    from __graft_entry__ import _flagship
    from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
    from fdc_tpu.ops.extract import extract_bucket
    from fdc_tpu.ops.fft import forward_spectrum
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f, c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    rng = np.random.default_rng(0)
    cfg = _flagship(batch_blocks=512)
    n = cfg.batch_blocks * cfg.inplen
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))

    fdc = FrequencyDomainChannelizer(cfg)
    carry0 = fdc._jit_init()
    sd0 = fdc.segments[0]

    results = {}

    def run(name, step, k):
        t_start = time.time()
        dt = time_scanned(step, carry0, xf, k=k, repeats=4)
        results[name] = round(dt * 1e3, 4)
        print(
            f"{name}: {results[name]} ms  (wall {time.time()-t_start:.0f}s)",
            file=sys.stderr,
        )

    def make_level(level):
        def step(carry, xf_in, t0):
            xx = f2c(xf_in)
            blocks, hist = frame_blocks(xx, carry["hist"], cfg.blocksize)
            spec = forward_spectrum(blocks, use_mxu=cfg.use_mxu_fft)
            nc = dict(carry)
            nc["hist"] = hist
            out = {"keep": jnp.sum(jnp.abs(spec))}
            if level < 2:
                return nc, out

            spec_ext = jnp.concatenate([carry["prev_spec"][None], spec])
            nc["prev_spec"] = spec[-1]
            fused_mats = {}
            fused_pa_ext = {}
            for w, (starts, wins, n_tp, tb, pb) in fdc._fused_widths.items():
                y = extract_bucket(
                    spec_ext, jnp.asarray(starts), jnp.asarray(wins),
                    use_mxu=cfg.use_mxu_fft, keep_from=w - pb.out_len,
                )
                fused_mats[w] = fdc.throughput.finish_bucket(
                    tb, y[:n_tp, 1:], t0
                )
                fused_pa_ext[w] = y[n_tp:]
            mats = []
            for bucket in fdc.throughput.buckets:
                if bucket.width in fdc._fused_widths:
                    mats.append(c2f(fused_mats[bucket.width]))
                    continue
                y = extract_bucket(
                    spec, jnp.asarray(bucket.starts),
                    jnp.asarray(bucket.windows), gain=float(bucket.width),
                    use_mxu=cfg.use_mxu_fft,
                    keep_from=bucket.width - bucket.out_len,
                )
                mats.append(c2f(fdc.throughput.finish_bucket(bucket, y, t0)))
            out["throughput_buckets"] = mats
            if level < 3:
                return nc, out

            sq = jnp.abs(spec) ** 2
            pa = fdc.power_bank
            powers = pa.measure(spec, sq)
            nc["powact"], (rise, fall, processed, phase_used) = (
                pa.scan_flags(powers, carry["powact"])
            )
            pa_ext = dict(fused_pa_ext)
            for bucket in pa.buckets:
                if bucket.width in pa_ext:
                    continue
                y = extract_bucket(
                    spec_ext, jnp.asarray(bucket.starts),
                    jnp.asarray(bucket.windows), use_mxu=cfg.use_mxu_fft,
                    keep_from=bucket.width - bucket.out_len,
                )
                pa_ext[bucket.width] = y
            out["powact"] = {
                "rise": rise, "fall": fall, "processed": processed,
                "phase_used": phase_used,
                "extract": {w: c2f(v) for w, v in pa_ext.items()},
            }
            if level < 4:
                return nc, out

            power = sd0.measure(spec, sq)
            seg_state, (got, processed_s, emit_now, phase_used_s) = (
                sd0.scan_slots(power, carry["seg0"])
            )
            nc["seg0"] = seg_state
            so = {
                "activated": got.T,
                "processed": processed_s.T,
                "emit": emit_now.T,
                "phase_used": phase_used_s.T,
                "slot_meta": {
                    "ext_start": seg_state["ext_start"],
                    "wlog2": seg_state["wlog2"],
                    "order": seg_state["order"],
                },
                "power": power,
            }
            out["seg0"] = so
            if level < 5:
                return nc, out

            slot_ids, overflow = sd0.extract_plan(got, processed_s)
            so["extract"] = c2f(
                sd0.extract_slots(spec_ext, seg_state, slot_ids)
            )
            so["slot_ids"] = slot_ids
            so["ext_overflow"] = overflow
            return nc, out

        return step

    run("L1_front", make_level(1), 64)
    run("L2_tp", make_level(2), 48)
    run("L3_powact", make_level(3), 48)
    run("L4_segdet", make_level(4), 32)
    run("L5_segext", make_level(5), 32)
    run("L6_full", fdc._device_step, 32)

    keys = ["L1_front", "L2_tp", "L3_powact", "L4_segdet", "L5_segext",
            "L6_full"]
    marg = {
        f"{keys[i]}-{keys[i-1]}": round(results[keys[i]] - results[keys[i-1]], 4)
        for i in range(1, len(keys))
    }
    print(json.dumps({"levels": results, "marginals": marg}))


if __name__ == "__main__":
    main()
