"""Ablation 7b: drill into the 0.24 ms powact marginal found by ablate7.

Sub-ladder between ablate7's L2 (front + throughput) and L3 (+ powact):
  a) + the shared |X|^2 pass
  b) + pa.measure (band-power matmul)
  c) + pa.scan_flags (Pallas hysteresis automaton)
  d) + pa extraction c2f wrap (== L3)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate7b_tpu.py
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
            if level < 1:
                return nc, out

            sq = jnp.abs(spec) ** 2
            out["keep_sq"] = jnp.sum(sq)
            if level < 2:
                return nc, out

            pa = fdc.power_bank
            powers = pa.measure(spec, sq)
            out["keep_pow"] = jnp.sum(powers)
            if level < 3:
                return nc, out

            nc["powact"], (rise, fall, processed, phase_used) = (
                pa.scan_flags(powers, carry["powact"])
            )
            out["powact_flags"] = {
                "rise": rise, "fall": fall, "processed": processed,
                "phase_used": phase_used,
            }
            if level < 4:
                return nc, out

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
            out["powact_ext"] = {w: c2f(v) for w, v in pa_ext.items()}
            return nc, out

        return step

    run("P0_tp", make_level(0), 48)
    run("P1_sq", make_level(1), 48)
    run("P2_measure", make_level(2), 48)
    run("P3_scan", make_level(3), 48)
    run("P4_ext", make_level(4), 48)

    keys = ["P0_tp", "P1_sq", "P2_measure", "P3_scan", "P4_ext"]
    marg = {
        f"{keys[i]}-{keys[i-1]}": round(results[keys[i]] - results[keys[i-1]], 4)
        for i in range(1, len(keys))
    }
    print(json.dumps({"levels": results, "marginals": marg}))


if __name__ == "__main__":
    main()
