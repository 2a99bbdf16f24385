"""Ablation 8: is the bench.py roofline still honest under the pairs layout?

The pipeline now emits extraction outputs in the float-pair layout straight
from the MXU matmul (no complexify/c2f pass). The bench.py roofline step
still requests complex outputs (consumed by the timing checksum, so it never
paid a c2f either). Measure both roofline forms and the full step in ONE
session so the ratio is drift-free:

  R_cplx : roofline exactly as bench.py builds it (complex outputs)
  R_pairs: same arithmetic with pairs=True end-to-end
  FULL   : the production device step

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate8_tpu.py
"""

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
    from fdc_tpu.ops.extract import extract_bucket, extract_dynamic
    from fdc_tpu.ops.fft import forward_spectrum
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    cfg = _flagship(batch_blocks=512)
    fdc = FrequencyDomainChannelizer(cfg)
    sd = fdc.segments[0]
    pa = fdc.power_bank
    tp = fdc.throughput

    rng = np.random.default_rng(0)
    n = cfg.batch_blocks * cfg.inplen
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))
    carry0 = fdc._jit_init()

    def seg_tables(n_rows, width, wlog2):
        starts = jnp.asarray(
            np.linspace(100, cfg.blocksize - width - 4, n_rows).astype(
                np.int32
            )
        )
        wins = jnp.asarray(
            np.tile(sd.window_table[wlog2, :width], (n_rows, 1))
        )
        return starts, wins

    seg_buckets = [(sd.extract_budget, sd.w_cap, sd.w_cap_log2)]
    if sd.extract_width_split:
        seg_buckets.append(
            (sd.extract_budget_narrow, sd.extract_width_split, sd.split_log2)
        )
    seg_tabs = [(seg_tables(nr, w, wl), w, wl) for nr, w, wl in seg_buckets]

    def make_roofline(pairs):
        def step(carry, xf_in, t0):
            xx = f2c(xf_in)
            blocks, hist = frame_blocks(xx, carry["hist"], cfg.blocksize)
            spec = forward_spectrum(blocks, use_mxu=cfg.use_mxu_fft)
            nc = dict(carry)
            nc["hist"] = hist
            spec_ext = jnp.concatenate([carry["prev_spec"][None], spec])
            nc["prev_spec"] = spec[-1]
            out = []
            for bucket in tp.buckets:
                y = extract_bucket(
                    spec, jnp.asarray(bucket.starts),
                    jnp.asarray(bucket.windows), gain=float(bucket.width),
                    use_mxu=cfg.use_mxu_fft,
                    keep_from=bucket.width - bucket.out_len, pairs=pairs,
                )
                out.append(tp.finish_bucket(bucket, y, t0, pairs=pairs))
            for bucket in pa.buckets:
                out.append(
                    extract_bucket(
                        spec_ext, jnp.asarray(bucket.starts),
                        jnp.asarray(bucket.windows), use_mxu=cfg.use_mxu_fft,
                        keep_from=bucket.width - bucket.out_len, pairs=pairs,
                    )
                )
            for (starts, wins), w, wl in seg_tabs:
                out.append(
                    extract_dynamic(
                        spec_ext, starts,
                        jnp.full((starts.shape[0],), wl, jnp.int32),
                        wins, w, use_mxu=cfg.use_mxu_fft, pairs=pairs,
                    )
                )
            return nc, out

        return step

    def step_full(carry, xf_in, t_idx):
        return fdc._device_step(
            carry, xf_in, t_idx * jnp.int32(cfg.batch_blocks)
        )

    results = {}
    for name, step, k in [
        ("R_cplx", make_roofline(False), 32),
        ("R_pairs", make_roofline(True), 32),
        ("FULL", step_full, 16),
    ]:
        t0 = time.time()
        dt = time_scanned(step, carry0, xf, k=k, repeats=5)
        results[name] = dt * 1e3
        print(
            f"{name}: {dt*1e3:.4f} ms  (wall {time.time()-t0:.0f}s)",
            file=sys.stderr,
        )

    print(
        {
            k: round(v, 4) for k, v in results.items()
        },
        "ratio_cplx", round(results["R_cplx"] / results["FULL"], 4),
        "ratio_pairs", round(results["R_pairs"] / results["FULL"], 4),
    )


if __name__ == "__main__":
    main()
