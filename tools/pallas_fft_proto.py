"""Prototype: Pallas fused four-step 4096-pt forward FFT.

The MXU four-step front (ops/fft.py:forward_spectrum_mxu) round-trips
stage-1/twiddle/stage-2 intermediates through HBM. This kernel keeps a
[Tb, N] planar block tile in VMEM and runs both DFT stages + twiddle in
place. Variants probe the two Mosaic-risky ops:

  W0  XLA forward_spectrum_mxu (current production)
  W1  kernel emits X_mat [Tb, k1, k2]; fftshift/scale folded; the final
      swapaxes+flatten (spec[k]=X[k%64,k//64]) runs in XLA outside
  W2  kernel transposes in place (jnp.swapaxes on [64,64] tiles) and
      emits spec [Tb, 4096] directly

Both require the in-kernel lane->sublane reshape [Tb,4096]->[Tb,64,64].

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/pallas_fft_proto.py
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
    fr, fi = np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)
    # twiddle T[n2, k1] = e^{-2pi i k1 n2 / N}
    tang = -2.0 * np.pi * (
        np.arange(m)[:, None] * np.arange(m)[None, :] % n
    ).astype(np.float64) / n
    tr = np.cos(tang).astype(np.float32).T.copy()  # [n2, k1]
    ti = np.sin(tang).astype(np.float32).T.copy()
    tr = np.ascontiguousarray(np.cos(tang).T).astype(np.float32)
    ti = np.ascontiguousarray(np.sin(tang).T).astype(np.float32)
    # stage 2 (contract over n2): E[n2, k2] = e^{-2pi i n2 k2 / m} with
    # fftshift (-1)^{n2} row signs and 1/N scale
    s = np.where(np.arange(m) % 2 == 0, 1.0, -1.0)[:, None]
    er = (np.cos(ang) * s / n).astype(np.float32)  # [n2, k2]
    ei = (np.sin(ang) * s / n).astype(np.float32)
    return fr, fi, tr, ti, er, ei


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
    from fdc_tpu.utils.cplx import c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    n, m = 4096, 64
    fr, fi, tr, ti, er, ei = make_consts(n, m)
    consts = [jnp.asarray(v) for v in (fr, fi, tr, ti, er, ei)]
    TB = 64

    dot = functools.partial(
        jax.lax.dot_general,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    def kernel_w1(re_ref, im_ref, fr_, fi_, tr_, ti_, er_, ei_,
                  or_ref, oi_ref, *, tb):
        xr = re_ref[:].reshape(tb, m, m)  # [b, n2, n1]
        xi = im_ref[:].reshape(tb, m, m)
        dn = (((2,), (0,)), ((), ()))
        ar = dot(xr, fr_[:], dn) - dot(xi, fi_[:], dn)
        ai = dot(xr, fi_[:], dn) + dot(xi, fr_[:], dn)
        zr = ar * tr_[:][None] - ai * ti_[:][None]
        zi = ar * ti_[:][None] + ai * tr_[:][None]
        # contract n2 (dim 1) with E[n2, k2] -> output [b, k1, k2]
        dm = (((1,), (0,)), ((), ()))
        xr2 = dot(zr, er_[:], dm) - dot(zi, ei_[:], dm)
        xi2 = dot(zr, ei_[:], dm) + dot(zi, er_[:], dm)
        or_ref[:] = xr2  # [tb, k1, k2]
        oi_ref[:] = xi2

    def kernel_w2(re_ref, im_ref, fr_, fi_, tr_, ti_, er_, ei_,
                  or_ref, oi_ref, *, tb):
        xr = re_ref[:].reshape(tb, m, m)
        xi = im_ref[:].reshape(tb, m, m)
        dn = (((2,), (0,)), ((), ()))
        ar = dot(xr, fr_[:], dn) - dot(xi, fi_[:], dn)
        ai = dot(xr, fi_[:], dn) + dot(xi, fr_[:], dn)
        zr = ar * tr_[:][None] - ai * ti_[:][None]
        zi = ar * ti_[:][None] + ai * tr_[:][None]
        dm = (((1,), (0,)), ((), ()))
        xr2 = dot(zr, er_[:], dm)
        xr2 = xr2 - dot(zi, ei_[:], dm)
        xi2 = dot(zr, ei_[:], dm) + dot(zi, er_[:], dm)
        # spec[b, 64*k2 + k1] = X[b, k1, k2]: transpose then flatten
        or_ref[:] = jnp.swapaxes(xr2, 1, 2).reshape(tb, n)
        oi_ref[:] = jnp.swapaxes(xi2, 1, 2).reshape(tb, n)

    def run_pallas(blocks, kernel, out3d):
        b = blocks.shape[0]
        b_pad = ((b + TB - 1) // TB) * TB
        re = jnp.pad(jnp.real(blocks), ((0, b_pad - b), (0, 0)))
        im = jnp.pad(jnp.imag(blocks), ((0, b_pad - b), (0, 0)))
        grid = b_pad // TB
        cspec = [
            pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim,
                         memory_space=pltpu.VMEM)
            for c in consts
        ]
        oshape = (TB, m, m) if out3d else (TB, n)
        full = (b_pad, m, m) if out3d else (b_pad, n)
        omap = (lambda i: (i, 0, 0)) if out3d else (lambda i: (i, 0))
        outs = pl.pallas_call(
            functools.partial(kernel, tb=TB),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TB, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ] + cspec,
            out_specs=(
                pl.BlockSpec(oshape, omap, memory_space=pltpu.VMEM),
                pl.BlockSpec(oshape, omap, memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(full, jnp.float32),
                jax.ShapeDtypeStruct(full, jnp.float32),
            ),
        )(re, im, *consts)
        return outs, b

    def spec_w1(blocks):
        (xr, xi), b = run_pallas(blocks, kernel_w1, True)
        x = jax.lax.complex(xr, xi)[:b]  # [B, k1, k2]
        return jnp.swapaxes(x, 1, 2).reshape(b, n)

    def spec_w2(blocks):
        (xr, xi), b = run_pallas(blocks, kernel_w2, False)
        return jax.lax.complex(xr, xi)[:b]

    cfg = _flagship(batch_blocks=512)
    rng = np.random.default_rng(0)
    ns = cfg.batch_blocks * cfg.inplen
    x = (rng.standard_normal(ns) + 1j * rng.standard_normal(ns)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))
    hist0 = np.zeros((cfg.ovllen,), np.complex64)  # np: c64 can't cross eagerly

    def framed(xf_in):
        xx = f2c(xf_in)
        blocks, _ = frame_blocks(xx, hist0, cfg.blocksize)
        return blocks

    # correctness
    ref = jax.jit(lambda z: forward_spectrum(framed(z), use_mxu=True))(xf)
    for name, fn in [("W1", spec_w1), ("W2", spec_w2)]:
        try:
            got = jax.jit(lambda z, f=fn: f(framed(z)))(xf)
            a, g = np.asarray(ref), np.asarray(got)
            rel = np.sqrt(np.mean(np.abs(a - g) ** 2) / np.mean(np.abs(a) ** 2))
            print(f"{name} rel-RMS vs XLA four-step: {rel:.2e}",
                  file=sys.stderr)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr)

    def w0(carry, xf_in, t0):
        return carry, [forward_spectrum(framed(xf_in), use_mxu=True)]

    def w1(carry, xf_in, t0):
        return carry, [spec_w1(framed(xf_in))]

    def w2(carry, xf_in, t0):
        return carry, [spec_w2(framed(xf_in))]

    for name, step in [("W0_xla", w0), ("W1_pallas_xlat", w1),
                       ("W2_pallas_direct", w2), ("W0_xla_b", w0)]:
        try:
            t0 = time.time()
            dt = time_scanned(step, {}, xf, k=96, repeats=5)
            print(f"{name}: {dt*1e3:.4f} ms  (wall {time.time()-t0:.0f}s)",
                  file=sys.stderr)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
