"""Ablation round 4: attribute the full-step composition overhead.

After the packed-state lifecycle kernel, the measured component marginals
(front 0.31 + tp 0.27 + powact 0.03 + cand 0.02 + lifecycle ~0.0 +
seg-extract 0.29) sum to ~0.92 ms but the full step measures ~1.20 ms.
Candidates for the missing ~0.3 ms: the c2f output-conversion passes, the
[B+1, N] spec_ext concatenate, the per-step `power` output, and the
checksum reduction load of the full output set.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate4_tpu.py
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
        results[name] = {
            "ms": round(dt * 1e3, 4),
            "msps": round(n / dt / 1e6, 1),
        }
        print(
            f"{name}: {results[name]['ms']} ms  {results[name]['msps']} MS/s"
            f"  (wall {time.time()-t_start:.0f}s)",
            file=sys.stderr,
        )

    # parameterized re-statement of _step_from_spec with composition toggles
    def make_step(
        conv=True,        # c2f the complex output leaves
        seg_extract=True, # run the detection-slot extraction
        power_out=True,   # include the [B, nc] power matrix in outputs
        tp=True,          # throughput buckets
    ):
        def step(carry, xf_in, t0):
            wrap = c2f if conv else (lambda v: v)
            x = f2c(xf_in)
            blocks, hist = frame_blocks(x, carry["hist"], cfg.blocksize)
            spec = forward_spectrum(blocks)
            new_carry = dict(carry)
            new_carry["hist"] = hist
            spec_ext = jnp.concatenate([carry["prev_spec"][None], spec])
            new_carry["prev_spec"] = spec[-1]
            out = {}
            fused_mats = {}
            fused_pa_ext = {}
            for w, (starts, wins, n_tp, tb, pb) in fdc._fused_widths.items():
                y = extract_bucket(
                    spec_ext, jnp.asarray(starts), jnp.asarray(wins),
                )
                fused_mats[w] = fdc.throughput.finish_bucket(
                    tb, y[:n_tp, 1:], t0
                )
                fused_pa_ext[w] = y[n_tp:, :, w - pb.out_len:]
            if fdc.throughput and tp:
                mats = []
                for bucket in fdc.throughput.buckets:
                    if bucket.width in fdc._fused_widths:
                        mats.append(wrap(fused_mats[bucket.width]))
                        continue
                    y = extract_bucket(
                        spec, jnp.asarray(bucket.starts),
                        jnp.asarray(bucket.windows),
                        gain=float(bucket.width),
                    )
                    mats.append(wrap(fdc.throughput.finish_bucket(
                        bucket, y, t0
                    )))
                out["throughput_buckets"] = mats
            sq = jnp.abs(spec) ** 2
            if fdc.power_bank:
                pa = fdc.power_bank
                powers = pa.measure(spec, sq)
                new_carry["powact"], (rise, fall, processed, phase_used) = (
                    pa.scan_flags(powers, carry["powact"])
                )
                pa_ext = dict(fused_pa_ext)
                for bucket in pa.buckets:
                    if bucket.width in pa_ext:
                        continue
                    y = extract_bucket(
                        spec_ext, jnp.asarray(bucket.starts),
                        jnp.asarray(bucket.windows),
                    )
                    pa_ext[bucket.width] = y[..., bucket.width - bucket.out_len:]
                out["powact"] = {
                    "rise": rise,
                    "fall": fall,
                    "processed": processed,
                    "phase_used": phase_used,
                    "extract": {w: wrap(v) for w, v in pa_ext.items()},
                }
            for i, sd in enumerate(fdc.segments):
                power = sd.measure(spec, sq)
                seg_state, (got, processed, emit_now, phase_used) = (
                    sd.scan_slots(power, carry[f"seg{i}"])
                )
                new_carry[f"seg{i}"] = seg_state
                so = {
                    "activated": got.T,
                    "processed": processed.T,
                    "emit": emit_now.T,
                    "phase_used": phase_used.T,
                    "slot_meta": {
                        "ext_start": seg_state["ext_start"],
                        "wlog2": seg_state["wlog2"],
                        "order": seg_state["order"],
                    },
                }
                if power_out:
                    so["power"] = power
                if seg_extract:
                    slot_ids, overflow = sd.extract_plan(got, processed)
                    so["extract"] = wrap(
                        sd.extract_slots(spec_ext, seg_state, slot_ids)
                    )
                    so["slot_ids"] = slot_ids
                    so["ext_overflow"] = overflow
                out[f"seg{i}"] = so
            return new_carry, out
        return step

    # --- detection-column drill-down (front + segment pieces only) ---
    sd0 = fdc.segments[0]

    def v_front(carry, xf_in, t0):
        x = f2c(xf_in)
        blocks, hist = frame_blocks(x, carry["hist"], cfg.blocksize)
        spec = forward_spectrum(blocks)
        nc = dict(carry)
        nc["hist"] = hist
        return nc, {"s": spec}

    def v_seg_measure(carry, xf_in, t0):
        x = f2c(xf_in)
        blocks, hist = frame_blocks(x, carry["hist"], cfg.blocksize)
        spec = forward_spectrum(blocks)
        nc = dict(carry)
        nc["hist"] = hist
        power = sd0.measure(spec, jnp.abs(spec) ** 2)
        return nc, {"p": power}

    def v_seg_cand(carry, xf_in, t0):
        # candidate preprocessing only: detect + geometry + pack + has_work
        # (everything scan_slots does BEFORE the Pallas kernel)
        import jax as _jax
        from fdc_tpu.ops.detect import candidate_geometry, detect_candidates

        x = f2c(xf_in)
        blocks, hist = frame_blocks(x, carry["hist"], cfg.blocksize)
        spec = forward_spectrum(blocks)
        nc = dict(carry)
        nc["hist"] = hist
        power = sd0.measure(spec, jnp.abs(spec) ** 2)
        g = sd0.geometry
        k = sd0.max_candidates or (g.n_cells - 1)
        cand_s, cand_e, cand_v = _jax.vmap(
            lambda p: detect_candidates(p, sd0.thresh, k, zero_floor=sd0.vcm)
        )(power)
        cand_s = cand_s * g.decimation + g.start
        cand_e = cand_e * g.decimation + g.start
        wl2, es, too_big = candidate_geometry(
            cand_s, cand_e, puffer=sd0.flank_puffer, w_cap=sd0.w_cap,
            w_cap_log2=sd0.w_cap_log2, n=cfg.blocksize,
        )
        packed = jnp.concatenate(
            [cand_s, cand_e, cand_v.astype(jnp.int32),
             wl2, es, es % cfg.relinvovl, too_big.astype(jnp.int32)],
            axis=1,
        )
        return nc, {"p": packed}

    def v_seg_scan(carry, xf_in, t0):
        x = f2c(xf_in)
        blocks, hist = frame_blocks(x, carry["hist"], cfg.blocksize)
        spec = forward_spectrum(blocks)
        nc = dict(carry)
        nc["hist"] = hist
        power = sd0.measure(spec, jnp.abs(spec) ** 2)
        nc["seg0"], flags = sd0.scan_slots(power, carry["seg0"])
        return nc, {"f": flags}

    run("front", v_front, 64)
    run("seg_measure", v_seg_measure, 48)
    run("seg_cand", v_seg_cand, 48)
    run("seg_scan", v_seg_scan, 48)
    run("full_now", fdc._device_step, 24)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
