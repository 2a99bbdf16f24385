"""Ablation 11: throughput-extraction structure — can XLA skip the zri copy?

The tp bucket measures ~2x its raw HBM bound. Today's chain per bucket:
static slices -> window multiply -> planar re/im concat ([C, B, 2l] f32
materialized) -> one rr matmul. Variants (all marginal over the same
front-end, window folded into per-channel constant matrices where noted):

  X1 current extract_bucket (pairs)
  X2 window folded into [C, 2l, 2k] per-channel matrices; batched
     dot_general on the planar concat (drops the window pass)
  X3 two-matmul planar form: y = re_slices @ M_top + im_slices @ M_bot
     (no concat at all — tests dot-operand slice fusion)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate11_tpu.py
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
    from fdc_tpu.ops.extract import extract_bucket, gather_slices
    from fdc_tpu.ops.fft import _rr_idft_matrix, forward_spectrum
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    cfg = _flagship(batch_blocks=512)
    fdc = FrequencyDomainChannelizer(cfg)
    tp = fdc.throughput
    bucket = tp.buckets[0]
    l = bucket.width
    keep_from = bucket.width - bucket.out_len
    gain = float(bucket.width)
    starts = jnp.asarray(bucket.starts)
    wins_np = np.asarray(bucket.windows, np.float32)  # [C, l]

    # window folded into the per-channel rr matrix (values bit-identical:
    # (z*w) @ M == z @ (diag([w;w]) M))
    m_base = _rr_idft_matrix(l, keep_from, True, gain, pairs=True)  # [2l,2k]
    m_chan = (
        np.concatenate([wins_np, wins_np], axis=1)[:, :, None] * m_base[None]
    ).astype(np.float32)  # [C, 2l, 2k]

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
        return nc, spec

    def step0(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        return nc, [spec]

    def step1(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        y = extract_bucket(
            spec, starts, jnp.asarray(bucket.windows), gain=gain,
            use_mxu=True, keep_from=keep_from, pairs=True,
        )
        return nc, [y]

    mc = jnp.asarray(m_chan)

    def step2(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        slices = gather_slices(spec, starts, l)  # [C, B, l] c64
        zri = jnp.concatenate(
            [jnp.real(slices), jnp.imag(slices)], axis=-1
        )  # [C, B, 2l]
        y = jax.lax.dot_general(
            zri, mc, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        )  # [C, B, 2k]
        return nc, [y.reshape(y.shape[0], y.shape[1], -1, 2)]

    mt = jnp.asarray(m_chan[:, :l])
    mb = jnp.asarray(m_chan[:, l:])

    def slice_plane(plane):
        b = plane.shape[0]

        def cut(s):
            return jax.lax.dynamic_slice(plane, (0, s), (b, l))

        return jax.vmap(cut)(starts.astype(jnp.int32))

    def step3(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        re_s = slice_plane(jnp.real(spec))  # [C, B, l] f32
        im_s = slice_plane(jnp.imag(spec))
        dg = lambda a, m: jax.lax.dot_general(
            a, m, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        )
        y = dg(re_s, mt) + dg(im_s, mb)
        return nc, [y.reshape(y.shape[0], y.shape[1], -1, 2)]

    # correctness: X2/X3 == X1 (same math, bf16x3 rounding of folded
    # window vs windowed operand differs slightly -> allclose)
    _, y1 = jax.jit(lambda c, xx: step1(c, xx, 0))(carry0, xf)
    _, y2 = jax.jit(lambda c, xx: step2(c, xx, 0))(carry0, xf)
    _, y3 = jax.jit(lambda c, xx: step3(c, xx, 0))(carry0, xf)
    a1, a2, a3 = (np.asarray(v[0]) for v in (y1, y2, y3))
    for nm, a in (("X2", a2), ("X3", a3)):
        rel = np.sqrt(np.mean((a - a1) ** 2) / np.mean(a1**2))
        print(f"{nm} vs X1 rel-RMS: {rel:.2e}", file=sys.stderr)

    for name, step, k in [
        ("X0_front", step0, 64),
        ("X1_current", step1, 32),
        ("X2_fold", step2, 32),
        ("X3_planar2", step3, 32),
        ("X1_current_b", step1, 32),
    ]:
        t0 = time.time()
        dt = time_scanned(step, carry0, xf, k=k, repeats=5)
        print(
            f"{name}: {dt*1e3:.4f} ms  (wall {time.time()-t0:.0f}s)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
