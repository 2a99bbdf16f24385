"""Prototype 2: fused four-step 4096-pt FFT with Mosaic-proven ops only.

Factorization n = 64a + b, k = 64c' + d':
    spec[64c' + d'] = sum_b F2[c', b] * ( tw[b, d'] * sum_a x[a, b] F1[a, d'] )
with the fftshift folded into F2's rows (c' -> c'+32 mod 64 permutation)
and the 1/N scale into F2. Per block:

  1. halves: VMEM scratch [64(a-perm), 64(b)] from the [32, 128] rows
     (a-permutation evens-then-odds folded into F1's rows)
  2. stage A: transposed-contraction dots (((0,),(0,))) -> S[b, d']
  3. twiddle elementwise
  4. stage B: plain dots F2 @ Z -> X[c', d']
  5. pack: scratch + strided ref reads -> out rows [32, 128] = (p, h*64+d')
     whose flat order is exactly k (out [B*32, 128] reshapes to [B, 4096])

Variants: Q0 XLA four-step (production), Q1 the kernel.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/pallas_fft_proto2.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_consts(n=4096, m=64):
    a = np.arange(m)[:, None].astype(np.float64)
    b = np.arange(m)[None, :].astype(np.float64)
    ang = -2.0 * np.pi * (a * b % m) / m
    f1r, f1i = np.cos(ang), np.sin(ang)  # F1[a, d']
    # a-permutation: scratch row p holds a = 2p (p<32) / 2(p-32)+1 (p>=32)
    perm = np.concatenate([np.arange(0, m, 2), np.arange(1, m, 2)])
    f1r_p = f1r[perm].astype(np.float32)
    f1i_p = f1i[perm].astype(np.float32)
    # twiddle tw[b, d'] = e^{-2pi i b d' / n}
    tang = -2.0 * np.pi * (
        np.arange(m)[:, None] * np.arange(m)[None, :] % n
    ).astype(np.float64) / n
    twr = np.cos(tang).astype(np.float32)
    twi = np.sin(tang).astype(np.float32)
    # F2[c', b] = e^{-2pi i b c'/m}, fftshift: row c' reads c'+m/2 mod m,
    # 1/n scale folded in
    rot = (np.arange(m) + m // 2) % m
    f2r = (np.cos(ang)[rot] / n).astype(np.float32)
    f2i = (np.sin(ang)[rot] / n).astype(np.float32)
    return f1r_p, f1i_p, twr, twi, f2r, f2i


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
    from fdc_tpu.ops.fft import forward_spectrum
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f, c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    n, m = 4096, 64
    consts_np = make_consts(n, m)
    consts = [jnp.asarray(v) for v in consts_np]
    TBLK = 16          # blocks per grid step
    RPB = n // 128     # 32 rows of 128 lanes per block

    hp = functools.partial(
        jax.lax.dot_general,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    dT = (((0,), (0,)), ((), ()))  # transposed contraction
    dN = (((1,), (0,)), ((), ()))  # plain

    def kernel(xr_ref, xi_ref, f1r, f1i, twr, twi, f2r, f2i,
               or_ref, oi_ref, sr, si):
        for blk in range(TBLK):
            rows = slice(blk * RPB, (blk + 1) * RPB)
            br = xr_ref[rows, :]
            bi = xi_ref[rows, :]
            # halves -> [64(a-perm), 64(b)] in scratch
            sr[0:RPB, :] = br[:, :m]
            sr[RPB:m, :] = br[:, m:]
            si[0:RPB, :] = bi[:, :m]
            si[RPB:m, :] = bi[:, m:]
            xbr = sr[:]
            xbi = si[:]
            # stage A: S[b, d'] = sum_a x[a, b] F1[a, d']
            ssr = hp(xbr, f1r[:], dT) - hp(xbi, f1i[:], dT)
            ssi = hp(xbr, f1i[:], dT) + hp(xbi, f1r[:], dT)
            # twiddle
            zr = ssr * twr[:] - ssi * twi[:]
            zi = ssr * twi[:] + ssi * twr[:]
            # stage B: X[c', d'] = sum_b F2[c', b] Z[b, d']
            xr2 = hp(f2r[:], zr, dN) - hp(f2i[:], zi, dN)
            xi2 = hp(f2r[:], zi, dN) + hp(f2i[:], zr, dN)
            # pack even/odd c' rows into lane halves via scratch
            sr[:] = xr2
            si[:] = xi2
            or_ref[rows, 0:m] = sr[0::2, :]
            or_ref[rows, m:128] = sr[1::2, :]
            oi_ref[rows, 0:m] = si[0::2, :]
            oi_ref[rows, m:128] = si[1::2, :]

    def spec_pallas(blocks):
        b = blocks.shape[0]
        bp = ((b + TBLK - 1) // TBLK) * TBLK
        xr = jnp.pad(jnp.real(blocks), ((0, bp - b), (0, 0)))
        xi = jnp.pad(jnp.imag(blocks), ((0, bp - b), (0, 0)))
        xr = xr.reshape(bp * RPB, 128)
        xi = xi.reshape(bp * RPB, 128)
        grid = bp // TBLK
        rows_pb = TBLK * RPB
        cspec = [
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(6)
        ]
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((rows_pb, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows_pb, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ] + cspec,
            out_specs=(
                pl.BlockSpec((rows_pb, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows_pb, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((bp * RPB, 128), jnp.float32),
                jax.ShapeDtypeStruct((bp * RPB, 128), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((m, m), jnp.float32),
                pltpu.VMEM((m, m), jnp.float32),
            ],
        )(xr, xi, *consts)
        spec_r = outs[0].reshape(bp, n)[:b]
        spec_i = outs[1].reshape(bp, n)[:b]
        return jax.lax.complex(spec_r, spec_i)

    cfg = _flagship(batch_blocks=512)
    rng = np.random.default_rng(0)
    ns = cfg.batch_blocks * cfg.inplen
    x = (rng.standard_normal(ns) + 1j * rng.standard_normal(ns)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))
    hist0 = np.zeros((cfg.ovllen,), np.complex64)

    def framed(xf_in):
        xx = f2c(xf_in)
        blocks, _ = frame_blocks(xx, jnp.asarray(hist0), cfg.blocksize)
        return blocks

    ref = jax.jit(lambda z: c2f(forward_spectrum(framed(z), use_mxu=True)))(xf)
    try:
        got = jax.jit(lambda z: c2f(spec_pallas(framed(z))))(xf)
        a, g = np.asarray(ref), np.asarray(got)
        rel = np.sqrt(np.mean((a - g) ** 2) / np.mean(a**2))
        print(f"Q1 rel-RMS vs XLA four-step: {rel:.2e}", file=sys.stderr)
    except Exception as e:
        print(f"Q1 FAILED: {type(e).__name__}: {str(e)[:400]}",
              file=sys.stderr)
        return

    def q0(carry, xf_in, t0):
        return carry, [forward_spectrum(framed(xf_in), use_mxu=True)]

    def q1(carry, xf_in, t0):
        return carry, [spec_pallas(framed(xf_in))]

    for name, step in [("Q0_xla", q0), ("Q1_pallas", q1),
                       ("Q0_xla_b", q0), ("Q1_pallas_b", q1)]:
        t0 = time.time()
        dt = time_scanned(step, {}, xf, k=96, repeats=5)
        print(f"{name}: {dt*1e3:.4f} ms  (wall {time.time()-t0:.0f}s)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
