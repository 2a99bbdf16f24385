"""Ablation 16: planar (never-complex) spectrum pipeline vs current.

R0 current _device_step (complex spec materialized between FFT and
consumers). R1 planar variant of the same flagship step: the four-step
front emits (re, im) f32 planes, the Pallas extraction consumes planes,
sq = re^2 + im^2, the dynamic slot extraction gathers per plane, and the
prev_spec carry stays planar — complex64 never exists on the spectrum
path. Measures what the complex materialization + plane splits cost.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate16_tpu.py
"""

import functools
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
    from fdc_tpu.ops.detect import band_power
    from fdc_tpu.ops.extract import gather_slices
    from fdc_tpu.ops.extract_pallas import fused_extract_static
    from fdc_tpu.ops.fft import (
        _four_step_matrices, _rr_idft_matrix, forward_spectrum,
    )
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    cfg = _flagship(batch_blocks=512)
    fdc = FrequencyDomainChannelizer(cfg)
    n = cfg.blocksize
    sd = fdc.segments[0]
    pa = fdc.power_bank
    tpb = fdc.throughput.buckets[0]
    pab = pa.buckets[0]

    def folded(bucket, gain):
        l = bucket.width
        keep_from = l - bucket.out_len
        m = _rr_idft_matrix(l, keep_from, True, float(gain), pairs=True)
        w = np.asarray(bucket.windows, np.float32)
        return (
            np.concatenate([w, w], axis=1)[:, :, None] * m[None]
        ).astype(np.float32)

    tp_fold = folded(tpb, float(tpb.width))
    pa_fold = folded(pab, 1.0)
    interp_mat = _rr_idft_matrix(sd.w_cap, 0, False, 1.0, True)

    def front_planar(xf_in, hist):
        """frame + four-step FFT emitting planes (no final complex)."""
        xx = f2c(xf_in)
        blocks, hist2 = frame_blocks(xx, hist, cfg.blocksize)
        m1, m2, w1, tr, ti, e2 = _four_step_matrices(n)
        lead = blocks.shape[:-1]
        z = blocks.reshape(lead + (m1, m2))
        dot = functools.partial(
            jnp.matmul, precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        )
        x_ri = jnp.concatenate([jnp.real(z), jnp.imag(z)], axis=-2)
        y_ri = dot(jnp.asarray(w1), x_ri)
        yr, yi = y_ri[..., :m1, :], y_ri[..., m1:, :]
        zr = yr * jnp.asarray(tr) - yi * jnp.asarray(ti)
        zi = yr * jnp.asarray(ti) + yi * jnp.asarray(tr)
        z_ri = jnp.concatenate([zr, zi], axis=-1)
        o_ri = dot(z_ri, jnp.asarray(e2))
        sr = jnp.swapaxes(o_ri[..., :m2], -1, -2).reshape(lead + (n,))
        si = jnp.swapaxes(o_ri[..., m2:], -1, -2).reshape(lead + (n,))
        return sr, si, hist2

    def extract_dynamic_planar(re_ext, im_ext, state, slot_ids):
        """extract_slots with per-plane gathers (no complex input)."""
        onehot_slot = (
            slot_ids[:, None]
            == jnp.arange(sd.max_slots, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)

        def take(v):
            return jnp.dot(
                onehot_slot, v.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)

        ext_start = take(state["ext_start"])
        wlog2 = take(state["wlog2"])
        valid = jnp.sum(onehot_slot, axis=1) > 0.0
        wlog2 = jnp.where(valid, wlog2, jnp.int32(-1))
        import math as _math
        n_tables = int(_math.log2(sd.w_cap)) + 1
        onehot = (
            wlog2[:, None] == jnp.arange(n_tables, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)
        windows_pad = jnp.dot(
            onehot, jnp.asarray(sd.window_table[:n_tables, :sd.w_cap]),
            preferred_element_type=jnp.float32,
        )
        w_max = sd.w_cap
        rp = jnp.pad(re_ext, ((0, 0), (0, w_max)))
        ip = jnp.pad(im_ext, ((0, 0), (0, w_max)))
        sr = gather_slices(rp, ext_start, w_max) * windows_pad[:, None, :]
        si = gather_slices(ip, ext_start, w_max) * windows_pad[:, None, :]
        zri = jnp.concatenate([sr, si], axis=-1)
        yri = jnp.matmul(
            zri, jnp.asarray(interp_mat),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        )
        return yri.reshape(*yri.shape[:-1], w_max, 2)

    t0c = jnp.int32(0)

    def r0(carry, xf_in, t0):
        return fdc._device_step(carry, xf_in, t0c)

    def r1(carry, xf_in, t0):
        sr, si, hist2 = front_planar(xf_in, carry["hist"])
        nc = dict(carry)
        nc["hist"] = hist2
        re_ext = jnp.concatenate([carry["prev_r"][None], sr])
        im_ext = jnp.concatenate([carry["prev_i"][None], si])
        nc["prev_r"] = sr[-1]
        nc["prev_i"] = si[-1]
        out = {}
        y = fused_extract_static(
            (re_ext, im_ext), tpb.starts, tp_fold, pairs=True
        )
        out["tp"] = fdc.throughput.finish_bucket(tpb, y[:, 1:], t0c,
                                                 pairs=True)
        sq = sr * sr + si * si
        powers = pa.measure(None, sq)
        nc["powact"], flags = pa.scan_flags(powers, carry["powact"])
        out["pa_flags"] = flags
        out["pa_ext"] = fused_extract_static(
            (re_ext, im_ext), pab.starts, pa_fold, pairs=True
        )
        power = sd.measure(None, sq)
        seg_state, (got, processed, emit_now, phase_used) = sd.scan_slots(
            power, carry["seg0"]
        )
        nc["seg0"] = seg_state
        slot_ids, overflow = sd.extract_plan(got, processed)
        out["seg"] = {
            "activated": got.T, "processed": processed.T,
            "emit": emit_now.T, "phase_used": phase_used.T,
            "power": power,
            "extract": extract_dynamic_planar(
                re_ext, im_ext, seg_state, slot_ids
            ),
            "slot_ids": slot_ids, "ext_overflow": overflow,
        }
        return nc, out

    rng = np.random.default_rng(0)
    ns = cfg.batch_blocks * cfg.inplen
    x = (rng.standard_normal(ns) + 1j * rng.standard_normal(ns)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))
    carry0 = fdc._jit_init()
    carry1 = {
        k: v for k, v in carry0.items() if k != "prev_spec"
    }
    carry1["prev_r"] = jnp.zeros((n,), jnp.float32)
    carry1["prev_i"] = jnp.zeros((n,), jnp.float32)

    # correctness spot check: planar tp matrix == current step's
    _, o0 = jax.jit(lambda c, z: r0(c, z, 0))(carry0, xf)
    _, o1 = jax.jit(lambda c, z: r1(c, z, 0))(carry1, xf)
    a = np.asarray(o0["throughput_buckets"][0])
    g = np.asarray(o1["tp"])
    rel = np.sqrt(np.mean((a - g) ** 2) / np.mean(a**2))
    print(f"planar tp vs current rel-RMS: {rel:.2e}", file=sys.stderr)
    a = np.asarray(o0["seg0"]["extract"])
    g = np.asarray(o1["seg"]["extract"])
    rel = np.sqrt(np.mean((a - g) ** 2) / (np.mean(a**2) + 1e-30))
    print(f"planar seg vs current rel-RMS: {rel:.2e}", file=sys.stderr)

    for name, step, c in [("R0_current", r0, carry0),
                          ("R1_planar", r1, carry1),
                          ("R0_current_b", r0, carry0),
                          ("R1_planar_b", r1, carry1)]:
        t0 = time.time()
        dt = time_scanned(step, c, xf, k=32, repeats=5)
        print(f"{name}: {dt*1e3:.4f} ms  (wall {time.time()-t0:.0f}s)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
