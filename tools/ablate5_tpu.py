"""Ablation round 5: subband inverse-transform variants on the MXU.

Round-2 finding: XLA lowers the w<=512 batched IFFTs to DFT-matrix
convolutions at precision HIGHEST anyway, so the VPU-FFT path is already
matmuls — just pessimal ones (12 real passes per complex transform, full
output width). Candidates measured here, as front-end + tp-extraction and
front-end + seg-extraction columns:

- fft:        current jnp.fft.ifft path (XLA custom call / conv lowering)
- rr_high:    ONE real-representation matmul  [zr zi] @ [[er, ei],[-ei, er]]
              at Precision.HIGH (bf16x3) — [*, 2l] x [2l, 2l], MXU-native
              128x128 tile at l=64.
- rr_high_trim: same, but the matrix only produces the KEPT output columns
              (drop the l/R overlap prefix) with the (-1)^m signs and the
              reference gain folded in.
- rr_default: plain bf16 single-pass (accuracy floor probe, not a
              production candidate).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate5_tpu.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


@functools.lru_cache(maxsize=None)
def _rr_dft_matrix(l, keep_from, signs, gain):
    """[2l, 2*kept] f32 real-representation unnormalized-IFFT matrix.

    y_ri = [zr zi] @ M gives [yr yi] for y[m] = gain * l * ifft(z)[m]
    (times (-1)^m when ``signs``), for m in [keep_from, l).
    """
    k = np.arange(l)[:, None].astype(np.float64)
    m = np.arange(keep_from, l)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * (k * m % l) / l
    e_re = np.cos(ang)
    e_im = np.sin(ang)
    if signs:
        s = np.where(np.arange(keep_from, l) % 2 == 0, 1.0, -1.0)[None, :]
        e_re = e_re * s
        e_im = e_im * s
    e_re = e_re * gain
    e_im = e_im * gain
    top = np.concatenate([e_re, e_im], axis=1)
    bot = np.concatenate([-e_im, e_re], axis=1)
    return np.concatenate([top, bot], axis=0).astype(np.float32)


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
    from fdc_tpu.ops.extract import gather_slices
    from fdc_tpu.ops.fft import forward_spectrum
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f_host, f2c
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
    tp = fdc.throughput
    sd = fdc.segments[0]
    carry0 = fdc._jit_init()

    bucket = tp.buckets[0]
    l = bucket.width
    tp_starts = jnp.asarray(bucket.starts)
    tp_wins = jnp.asarray(bucket.windows)
    keep_from = l - bucket.out_len

    w = sd.w_cap
    nrows = sd.extract_budget
    seg_starts = jnp.asarray(
        np.linspace(100, cfg.blocksize - w - 4, nrows).astype(np.int32)
    )
    seg_wins = jnp.asarray(
        np.tile(sd.window_table[sd.w_cap_log2, :w], (nrows, 1))
    )

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

    def front(carry, xf_in):
        xx = f2c(xf_in)
        blocks, hist = frame_blocks(xx, carry["hist"], cfg.blocksize)
        spec = forward_spectrum(blocks)
        nc = dict(carry)
        nc["hist"] = hist
        return nc, spec

    def rr_apply(z, mat, precision):
        zri = jnp.concatenate([jnp.real(z), jnp.imag(z)], axis=-1)
        yri = jnp.matmul(
            zri, mat, precision=precision,
            preferred_element_type=jnp.float32,
        )
        kept = mat.shape[1] // 2
        return jax.lax.complex(yri[..., :kept], yri[..., kept:])

    def v_front(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        return nc, {"s": spec}

    def make_tp(kind):
        def step(carry, xf_in, t0):
            nc, spec = front(carry, xf_in)
            slices = gather_slices(spec, tp_starts, l)
            z = slices * tp_wins[:, None, :].astype(slices.dtype)
            if kind == "fft":
                y = jnp.fft.ifft(z, axis=-1)
                signs = jnp.asarray(
                    np.where(np.arange(l) % 2 == 0, 1.0, -1.0), np.float32
                )
                y = y * (signs * (l * l)).astype(y.dtype)
                y = y[..., keep_from:]
            elif kind == "rr_high":
                mat = jnp.asarray(_rr_dft_matrix(l, 0, True, float(l)))
                y = rr_apply(z, mat, jax.lax.Precision.HIGH)[..., keep_from:]
            elif kind == "rr_high_trim":
                mat = jnp.asarray(
                    _rr_dft_matrix(l, keep_from, True, float(l))
                )
                y = rr_apply(z, mat, jax.lax.Precision.HIGH)
            elif kind == "rr_default":
                mat = jnp.asarray(
                    _rr_dft_matrix(l, keep_from, True, float(l))
                )
                y = rr_apply(z, mat, jax.lax.Precision.DEFAULT)
            else:
                raise ValueError(kind)
            return nc, {"y": y}
        return step

    def make_seg(kind):
        def step(carry, xf_in, t0):
            nc, spec = front(carry, xf_in)
            spec_ext = jnp.concatenate([carry["prev_spec"][None], spec])
            nc["prev_spec"] = spec[-1]
            spec_pad = jnp.pad(spec_ext, ((0, 0), (0, w)))
            slices = gather_slices(spec_pad, seg_starts, w)
            z = slices * seg_wins[:, None, :].astype(slices.dtype)
            if kind == "fft":
                y = jnp.fft.ifft(z, axis=-1) * jnp.asarray(w, z.dtype)
            elif kind == "rr_high":
                mat = jnp.asarray(_rr_dft_matrix(w, 0, False, float(w)))
                y = rr_apply(z, mat, jax.lax.Precision.HIGH)
            elif kind == "rr_default":
                mat = jnp.asarray(_rr_dft_matrix(w, 0, False, float(w)))
                y = rr_apply(z, mat, jax.lax.Precision.DEFAULT)
            else:
                raise ValueError(kind)
            return nc, {"y": y}
        return step

    run("front", v_front, 64)
    run("tp_fft", make_tp("fft"), 32)
    run("tp_rr_high", make_tp("rr_high"), 32)
    run("tp_rr_high_trim", make_tp("rr_high_trim"), 32)
    run("tp_rr_default", make_tp("rr_default"), 32)
    run("seg_fft", make_seg("fft"), 32)
    run("seg_rr_high", make_seg("rr_high"), 32)
    run("seg_rr_default", make_seg("rr_default"), 32)

    # numeric check of rr_high vs fft on one batch (on-device, jitted)
    import jax

    @jax.jit
    def check(xf_in, carry):
        _, spec = front(carry, xf_in)
        slices = gather_slices(spec, tp_starts, l)
        z = slices * tp_wins[:, None, :].astype(slices.dtype)
        signs = jnp.asarray(
            np.where(np.arange(l) % 2 == 0, 1.0, -1.0), np.float32
        )
        y_ref = (jnp.fft.ifft(z, axis=-1) * (signs * (l * l)).astype(
            z.dtype))[..., keep_from:]
        mat = jnp.asarray(_rr_dft_matrix(l, keep_from, True, float(l)))
        y_rr = rr_apply(z, mat, jax.lax.Precision.HIGH)
        err = jnp.abs(y_rr - y_ref)
        ref = jnp.abs(y_ref)
        return jnp.max(err), jnp.sqrt(
            jnp.mean(err**2) / jnp.mean(ref**2)
        )
    max_err, rel_rms = check(xf, carry0)
    results["rr_high_vs_fft"] = {
        "max_abs_err": float(max_err),
        "rel_rms": float(rel_rms),
    }
    print("numeric:", results["rr_high_vs_fft"], file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
