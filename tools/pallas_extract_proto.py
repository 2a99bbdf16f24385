"""Prototype: Pallas fused slice+matmul extraction for static buckets.

The XLA path materializes [C, B, l] gathered slices and a [C, B, 2l]
planar concat before the extraction matmul (~113 MB of HBM round-trips
per tp bucket at flagship shapes, measured ~0.20 ms). This kernel keeps
a [Tb, N] spectrum tile in VMEM and contracts each channel's STATIC lane
slice against its folded window+IDFT matrix directly:

    out[c] = re_tile[:, s_c:s_c+l] @ Mt[c] + im_tile[:, s_c:s_c+l] @ Mb[c]

HBM traffic: spec read once + out write (~30 MB). Probes whether Mosaic
accepts arbitrary (non-128-aligned) static lane offsets, and times the
kernel against extract_bucket inside the same session.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/pallas_extract_proto.py
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from __graft_entry__ import _flagship
    from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
    from fdc_tpu.ops.extract import extract_bucket
    from fdc_tpu.ops.fft import _rr_idft_matrix, forward_spectrum
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    cfg = _flagship(batch_blocks=512)
    fdc = FrequencyDomainChannelizer(cfg)
    bucket = fdc.throughput.buckets[0]
    l = bucket.width
    keep_from = bucket.width - bucket.out_len
    gain = float(bucket.width)
    starts = [int(s) for s in np.asarray(bucket.starts)]
    wins_np = np.asarray(bucket.windows, np.float32)  # [C, l]
    c_dim = len(starts)

    m = _rr_idft_matrix(l, keep_from, True, gain, pairs=True)  # [2l, 2k]
    k2 = m.shape[1]
    wm = (
        np.concatenate([wins_np, wins_np], axis=1)[:, :, None] * m[None]
    ).astype(np.float32)  # [C, 2l, 2k]
    mt = jnp.asarray(wm[:, :l])   # [C, l, 2k]
    mb = jnp.asarray(wm[:, l:])   # [C, l, 2k]

    def kernel(re_ref, im_ref, mt_ref, mb_ref, out_ref):
        for c, s in enumerate(starts):
            yr = jax.lax.dot_general(
                re_ref[:, s:s + l], mt_ref[c],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            yi = jax.lax.dot_general(
                im_ref[:, s:s + l], mb_ref[c],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[c] = yr + yi

    def fused_extract(spec, tb=64):
        b, n = spec.shape
        b_pad = ((b + tb - 1) // tb) * tb
        re = jnp.pad(jnp.real(spec), ((0, b_pad - b), (0, 0)))
        im = jnp.pad(jnp.imag(spec), ((0, b_pad - b), (0, 0)))
        grid = b_pad // tb
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((tb, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c_dim, l, k2), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c_dim, l, k2), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((c_dim, tb, k2), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c_dim, b_pad, k2), jnp.float32),
        )(re, im, mt, mb)
        return out[:, :b].reshape(c_dim, b, -1, 2)

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

    def z0(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        return nc, [spec]

    def z1(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        y = extract_bucket(
            spec, jnp.asarray(bucket.starts), wins_np, gain=gain,
            use_mxu=True, keep_from=keep_from, pairs=True,
        )
        return nc, [y]

    def z2(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        return nc, [fused_extract(spec)]

    # correctness first (also surfaces Mosaic lowering errors)
    _, a = jax.jit(lambda c, xx: z1(c, xx, 0))(carry0, xf)
    _, b = jax.jit(lambda c, xx: z2(c, xx, 0))(carry0, xf)
    a0, b0 = np.asarray(a[0]), np.asarray(b[0])
    rel = np.sqrt(np.mean((a0 - b0) ** 2) / np.mean(a0**2))
    print(f"fused vs extract_bucket rel-RMS: {rel:.2e}", file=sys.stderr)

    for name, step, kk in [
        ("Z0_front", z0, 96),
        ("Z1_xla", z1, 64),
        ("Z2_pallas", z2, 64),
        ("Z1_xla_b", z1, 64),
        ("Z2_pallas_b", z2, 64),
    ]:
        t0 = time.time()
        dt = time_scanned(step, carry0, xf, k=kk, repeats=5)
        print(
            f"{name}: {dt*1e3:.4f} ms  (wall {time.time()-t0:.0f}s)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
