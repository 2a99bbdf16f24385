"""Ablation 12: cumulative attribution of the current flagship step.

Rebuilds _step_from_spec in cumulative stages so each variant's marginal
over the previous one attributes that stage's cost in the CURRENT code
(post window-fold, assoc powact, budget-8 split extraction):

  A0 front            frame + forward FFT + spec_ext concat
  A1 +tp/pa extract   fused bucket extraction + finish_bucket
  A2 +powact          shared |X|^2 + measure + assoc scan_flags
  A3 +lifecycle       seg measure + scan_slots (Pallas slot kernel)
  A4 +seg extract     extract_plan(+split) + extract_slots
  A5 full             _device_step verbatim (adds out-dict glue)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate12_tpu.py
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
    from fdc_tpu.ops.extract import extract_bucket
    from fdc_tpu.ops.fft import forward_spectrum
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    cfg = _flagship(batch_blocks=512)
    fdc = FrequencyDomainChannelizer(cfg)

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

    def tp_pa_extract(spec, spec_ext, t0):
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
        return mats, fused_pa_ext

    def powact_part(carry, nc, spec, sq, fused_pa_ext):
        pa = fdc.power_bank
        powers = pa.measure(spec, sq)
        nc["powact"], flags = pa.scan_flags(powers, carry["powact"])
        return flags

    def a0(carry, xf_in, t0):
        nc, spec, spec_ext = front(carry, xf_in)
        return nc, [spec_ext]

    def a1(carry, xf_in, t0):
        nc, spec, spec_ext = front(carry, xf_in)
        mats, fused_pa_ext = tp_pa_extract(spec, spec_ext, t0)
        return nc, [mats, fused_pa_ext]

    def a2(carry, xf_in, t0):
        nc, spec, spec_ext = front(carry, xf_in)
        mats, fused_pa_ext = tp_pa_extract(spec, spec_ext, t0)
        sq = jnp.abs(spec) ** 2
        flags = powact_part(carry, nc, spec, sq, fused_pa_ext)
        return nc, [mats, fused_pa_ext, flags]

    def a3(carry, xf_in, t0):
        nc, spec, spec_ext = front(carry, xf_in)
        mats, fused_pa_ext = tp_pa_extract(spec, spec_ext, t0)
        sq = jnp.abs(spec) ** 2
        flags = powact_part(carry, nc, spec, sq, fused_pa_ext)
        sd = fdc.segments[0]
        power = sd.measure(spec, sq)
        seg_state, sflags = sd.scan_slots(power, carry["seg0"])
        nc["seg0"] = seg_state
        return nc, [mats, fused_pa_ext, flags, sflags, power]

    def a4(carry, xf_in, t0):
        nc, spec, spec_ext = front(carry, xf_in)
        mats, fused_pa_ext = tp_pa_extract(spec, spec_ext, t0)
        sq = jnp.abs(spec) ** 2
        flags = powact_part(carry, nc, spec, sq, fused_pa_ext)
        sd = fdc.segments[0]
        power = sd.measure(spec, sq)
        seg_state, (got, processed, emit_now, phase_used) = sd.scan_slots(
            power, carry["seg0"]
        )
        nc["seg0"] = seg_state
        outs = [mats, fused_pa_ext, flags, got, processed, emit_now, power]
        if sd.extract_width_split:
            ids_n, ids_w, overflow = sd.extract_plan_split(
                got, processed, seg_state["wlog2"]
            )
            outs.append(sd.extract_slots(spec_ext, seg_state, ids_w, pairs=True))
            outs.append(
                sd.extract_slots(
                    spec_ext, seg_state, ids_n,
                    width=sd.extract_width_split, pairs=True,
                )
            )
        else:
            slot_ids, overflow = sd.extract_plan(got, processed)
            outs.append(
                sd.extract_slots(spec_ext, seg_state, slot_ids, pairs=True)
            )
        outs.append(overflow)
        return nc, outs

    def a5(carry, xf_in, t0):
        return fdc._device_step(carry, xf_in, t0 * jnp.int32(cfg.batch_blocks))

    results = {}
    for name, step, k in [
        ("A0_front", a0, 96),
        ("A1_tp_pa_extract", a1, 64),
        ("A2_powact", a2, 64),
        ("A3_lifecycle", a3, 64),
        ("A4_seg_extract", a4, 64),
        ("A5_full", a5, 64),
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
