"""Ablation 13: decompose the lifecycle-block marginal (ablate12 A3-A2).

Variants, each marginal over the previous (flagship, B=512, K=8, S=16):

  L0 = ablate12's A2 (front + tp/pa extract + powact)
  L1 + sd.measure (cell_power over the shared |X|^2)
  L2 + detect_candidates (vmapped greedy acceptance, K-step scan)
  L3 + candidate_geometry + [B, 7K] pack
  L4 + slot_lifecycle Pallas kernel (== ablate12 A3)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate13_tpu.py
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
    from fdc_tpu.ops.extract import extract_bucket
    from fdc_tpu.ops.fft import forward_spectrum
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.ops.lifecycle_pallas import slot_lifecycle
    from fdc_tpu.utils.cplx import c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    cfg = _flagship(batch_blocks=512)
    fdc = FrequencyDomainChannelizer(cfg)
    sd = fdc.segments[0]
    g = sd.geometry
    k = sd.max_candidates or (g.n_cells - 1)

    rng = np.random.default_rng(0)
    n = cfg.batch_blocks * cfg.inplen
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))
    carry0 = fdc._jit_init()

    def front(carry, xf_in):
        xx = f2c(xf_in)
        blocks, hist = frame_blocks(xx, carry["hist"], cfg.blocksize)
        spec = forward_spectrum(blocks, use_mxu=cfg.use_mxu_fft)
        nc = dict(carry)
        nc["hist"] = hist
        spec_ext = jnp.concatenate([carry["prev_spec"][None], spec])
        nc["prev_spec"] = spec[-1]
        return nc, spec, spec_ext

    def base(carry, xf_in, t0):
        nc, spec, spec_ext = front(carry, xf_in)
        fused_mats, fused_pa_ext = {}, {}
        for w, (starts, wins, n_tp, tb, pb) in fdc._fused_widths.items():
            y = extract_bucket(
                spec_ext, jnp.asarray(starts), wins,
                use_mxu=cfg.use_mxu_fft, keep_from=w - pb.out_len,
                pairs=True,
            )
            fused_mats[w] = fdc.throughput.finish_bucket(
                tb, y[:n_tp, 1:], t0, pairs=True
            )
            fused_pa_ext[w] = y[n_tp:]
        mats = []
        for bucket in fdc.throughput.buckets:
            if bucket.width in fdc._fused_widths:
                mats.append(fused_mats[bucket.width])
                continue
            y = extract_bucket(
                spec, jnp.asarray(bucket.starts), bucket.windows,
                gain=float(bucket.width), use_mxu=cfg.use_mxu_fft,
                keep_from=bucket.width - bucket.out_len, pairs=True,
            )
            mats.append(fdc.throughput.finish_bucket(bucket, y, t0, pairs=True))
        sq = jnp.abs(spec) ** 2
        pa = fdc.power_bank
        powers = pa.measure(spec, sq)
        nc["powact"], flags = pa.scan_flags(powers, carry["powact"])
        return nc, spec, spec_ext, sq, [mats, fused_pa_ext, flags]

    def l0(carry, xf_in, t0):
        nc, spec, spec_ext, sq, outs = base(carry, xf_in, t0)
        return nc, outs

    def l1(carry, xf_in, t0):
        nc, spec, spec_ext, sq, outs = base(carry, xf_in, t0)
        power = sd.measure(spec, sq)
        return nc, outs + [power]

    def cands(power):
        cs, ce, cv = jax.vmap(
            lambda p: detect_candidates(p, sd.thresh, k, zero_floor=sd.vcm)
        )(power)
        cs = cs * g.decimation + g.start
        ce = ce * g.decimation + g.start
        return cs, ce, cv

    def l2(carry, xf_in, t0):
        nc, spec, spec_ext, sq, outs = base(carry, xf_in, t0)
        power = sd.measure(spec, sq)
        cs, ce, cv = cands(power)
        return nc, outs + [power, cs, ce, cv]

    def packit(cs, ce, cv):
        wl2, es, too_big = candidate_geometry(
            cs, ce, puffer=sd.flank_puffer, w_cap=sd.w_cap,
            w_cap_log2=sd.w_cap_log2, n=cfg.blocksize,
        )
        return jnp.concatenate(
            [
                cs, ce, cv.astype(jnp.int32),
                wl2, es, es % sd.relinvovl, too_big.astype(jnp.int32),
            ],
            axis=1,
        )

    def l3(carry, xf_in, t0):
        nc, spec, spec_ext, sq, outs = base(carry, xf_in, t0)
        power = sd.measure(spec, sq)
        packed = packit(*cands(power))
        return nc, outs + [power, packed]

    def l4(carry, xf_in, t0):
        nc, spec, spec_ext, sq, outs = base(carry, xf_in, t0)
        power = sd.measure(spec, sq)
        packed = packit(*cands(power))
        new_state, flags = slot_lifecycle(
            packed, carry["seg0"],
            n_cand=k, r=sd.relinvovl, delay=sd.deactivation_delay,
        )
        nc["seg0"] = sd._free_tombstones(new_state)
        return nc, outs + [power, flags]

    results = {}
    for name, step, kk in [
        ("L0_base", l0, 64),
        ("L1_measure", l1, 64),
        ("L2_candidates", l2, 64),
        ("L3_geometry_pack", l3, 64),
        ("L4_kernel", l4, 64),
    ]:
        t0 = time.time()
        dt = time_scanned(step, carry0, xf, k=kk, repeats=15)
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
