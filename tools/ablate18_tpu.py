"""Ablation 18: corner the full-step vs roofline gap (the vs_baseline gap).

bench.py's honest ratio is full/roofline ~0.85; the extraction twins are
routed identically on both sides, so the gap is detection logic + glue.
Sandwich:

  F0 bench's step_roofline VERBATIM (denominator)
  F1 + detection logic    sq, pa.measure+scan_flags, sd.measure+scan_slots,
                          extract_plan (extraction rows stay F0's static
                          twins — only the decision logic is added)
  F2 full _device_step    (numerator)

F1-F0 = the fundamental numerator-only logic; F2-F1 = glue (out-dict
assembly, flag transposes, traced-geometry deltas) — the part we can kill.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate18_tpu.py
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

    # -- F0: bench.py's roofline, verbatim ---------------------------------
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

    def roofline_core(carry, xf_in, t0):
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
                spec, bucket.starts,
                bucket.windows, gain=float(bucket.width),
                use_mxu=cfg.use_mxu_fft,
                keep_from=bucket.width - bucket.out_len, pairs=True,
            )
            out.append(tp.finish_bucket(bucket, y, t0, pairs=True))
        for bucket in pa.buckets:
            out.append(
                extract_bucket(
                    spec_ext, bucket.starts,
                    bucket.windows, use_mxu=cfg.use_mxu_fft,
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
        return nc, spec, spec_ext, out

    def f0(carry, xf_in, t0):
        nc, spec, spec_ext, out = roofline_core(carry, xf_in, t0)
        return nc, out

    def f1(carry, xf_in, t0):
        nc, spec, spec_ext, out = roofline_core(carry, xf_in, t0)
        sq = jnp.abs(spec) ** 2
        powers = pa.measure(spec, sq)
        nc["powact"], paf = pa.scan_flags(powers, carry["powact"])
        power = sd.measure(spec, sq)
        seg_state, (got, processed, emit_now, phase_used) = sd.scan_slots(
            power, carry["seg0"]
        )
        nc["seg0"] = sd._free_tombstones(seg_state)
        slot_ids, overflow = sd.extract_plan(got, processed)
        return nc, out + [
            paf, got, processed, emit_now, phase_used, slot_ids, overflow,
            power,
        ]

    def f2(carry, xf_in, t0):
        return fdc._device_step(carry, xf_in, t0 * jnp.int32(cfg.batch_blocks))

    results = {}
    for name, step, k in [
        ("F0_roofline", f0, 96),
        ("F1_plus_logic", f1, 64),
        ("F2_full", f2, 64),
    ]:
        t0 = time.time()
        dt = time_scanned(step, carry0, xf, k=k, repeats=15)
        results[name] = dt
        print(
            f"{name}: {dt*1e3:.4f} ms  (wall {time.time()-t0:.0f}s)",
            file=sys.stderr,
        )
    keys = list(results)
    for prev, cur in zip(keys, keys[1:]):
        print(
            f"marginal {cur} - {prev}: "
            f"{(results[cur]-results[prev])*1e3:+.4f} ms",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
