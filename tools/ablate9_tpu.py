"""Ablation 9: post-pairs attribution of the non-roofline 0.12 ms.

Cumulative ladder from the pairs roofline (ablate8: 0.626 ms) to the full
step (0.737 ms), adding the detection-side components the roofline by
definition excludes:

  V0 roofline(pairs)                      [= ablate8 R_pairs]
  V1 + shared |X|^2 pass + segment cell-power measure
  V2 + candidate detection (vmap ratios/pairing + geometry + packing)
  V3 + Pallas slot-lifecycle kernel + tombstone freeing (scan_slots)
  V4 + powact measure + hysteresis automaton
  V5 full production step

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate9_tpu.py
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
    from fdc_tpu.ops.detect import candidate_geometry, detect_candidates
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

    g = sd.geometry
    k = sd.max_candidates or (g.n_cells - 1)

    def make_step(level):
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
                    keep_from=bucket.width - bucket.out_len, pairs=True,
                )
                out.append(tp.finish_bucket(bucket, y, t0, pairs=True))
            for bucket in pa.buckets:
                out.append(
                    extract_bucket(
                        spec_ext, jnp.asarray(bucket.starts),
                        jnp.asarray(bucket.windows), use_mxu=cfg.use_mxu_fft,
                        keep_from=bucket.width - bucket.out_len, pairs=True,
                    )
                )
            for (starts, wins), w, wl in seg_tabs:
                out.append(
                    extract_dynamic(
                        spec_ext, starts,
                        jnp.full((starts.shape[0],), wl, jnp.int32),
                        wins, w, use_mxu=cfg.use_mxu_fft, pairs=True,
                    )
                )
            if level >= 1:
                sq = jnp.abs(spec) ** 2
                power = sd.measure(spec, sq)
                out.append(power)
            if level == 2:
                cand_s, cand_e, cand_v = jax.vmap(
                    lambda p: detect_candidates(
                        p, sd.thresh, k, zero_floor=sd.vcm
                    )
                )(power)
                cand_s = cand_s * g.decimation + g.start
                cand_e = cand_e * g.decimation + g.start
                wl2, es, too_big = candidate_geometry(
                    cand_s, cand_e, puffer=sd.flank_puffer, w_cap=sd.w_cap,
                    w_cap_log2=sd.w_cap_log2, n=sd.blocksize,
                )
                packed = jnp.concatenate(
                    [
                        cand_s, cand_e, cand_v.astype(jnp.int32),
                        wl2, es, es % sd.relinvovl,
                        too_big.astype(jnp.int32),
                    ],
                    axis=1,
                )
                out.append(packed)
            if level >= 3:
                seg_state, flags = sd.scan_slots(power, carry["seg0"])
                nc["seg0"] = seg_state
                out.append(flags)
            if level >= 4:
                powers = pa.measure(spec, sq)
                nc["powact"], pa_flags = pa.scan_flags(
                    powers, carry["powact"]
                )
                out.append(pa_flags)
            return nc, out

        return step

    def step_full(carry, xf_in, t_idx):
        return fdc._device_step(
            carry, xf_in, t_idx * jnp.int32(cfg.batch_blocks)
        )

    for name, step, kk in [
        ("V1_power", make_step(1), 32),
        ("V2_cand", make_step(2), 32),
        ("V3_lifecycle", make_step(3), 32),
        ("V4_powact", make_step(4), 32),
        ("V5_full", step_full, 16),
    ]:
        t0 = time.time()
        dt = time_scanned(step, carry0, xf, k=kk, repeats=5)
        print(
            f"{name}: {dt*1e3:.4f} ms  (wall {time.time()-t0:.0f}s)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
