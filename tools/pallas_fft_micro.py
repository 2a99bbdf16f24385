"""Isolate which op kills the Mosaic FFT kernel: reshape vs 3D dot.

M1 reshape-only: [tb,4096]->[tb,64,64]->[tb,4096] copy
M2 flat 2D dot: reshape [tb,4096]->[tb*64,64], X @ F, write back [tb,4096]
M3 3D batched dot: [tb,64,64] dot_general 2D constant (no batch dims)
M4 per-block loop of 2D dots with sublane slices

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/pallas_fft_micro.py
"""

import functools
import os
import sys

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

    print("devices:", jax.devices(), file=sys.stderr)

    n, m, tb = 4096, 64, 8
    f = np.eye(m, dtype=np.float32) * 2.0

    def m1(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(tb, m, m).reshape(tb, n) * 2.0

    def m2(x_ref, f_ref, o_ref):
        x2 = x_ref[:].reshape(tb * m, m)
        y = jnp.dot(x2, f_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = y.reshape(tb, n)

    def m2p(x_ref, f_ref, o_ref):
        x2 = x_ref[:].reshape(tb * m, m)
        y = jax.lax.dot_general(
            x2, f_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = y.reshape(tb, n)

    def m2f(x_ref, f_ref, o_ref):
        y = jax.lax.dot_general(
            x_ref[:], f_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = y

    def m3(x_ref, f_ref, o_ref):
        x3 = x_ref[:].reshape(tb, m, m)
        y = jax.lax.dot_general(
            x3, f_ref[:], (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = y.reshape(tb, n)

    def m5(x2_ref, f_ref, o_ref):
        y = jax.lax.dot_general(
            x2_ref[:], f_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [tb*m, m] direct from ref, no reshape
        o_ref[:] = y

    def m6(x_ref, f128_ref, o_ref):
        x2 = x_ref[:].reshape(tb * 32, 128)
        y = jax.lax.dot_general(
            x2, f128_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = y.reshape(tb, n)

    def m4(x_ref, f_ref, o_ref):
        x2 = x_ref[:].reshape(tb * m, m)
        for b in range(tb):
            y = jnp.dot(
                x2[b * m:(b + 1) * m], f_ref[:],
                preferred_element_type=jnp.float32,
            )
            o_ref[b, :] = y.reshape(1, n)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((tb, n)).astype(np.float32)
    xj = jnp.asarray(x)
    fj = jnp.asarray(f)
    fj2 = jnp.asarray(rng.standard_normal((m, m)).astype(np.float32))
    x2j = jnp.asarray(x.reshape(tb * m, m))
    f128j = jnp.asarray(np.eye(128, dtype=np.float32))
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    for name, kern, ins in [
        ("M1_reshape", m1, (xj,)),
        ("M2_flat2d", m2, (xj, fj)),
        ("M2p_flat2d_highest", m2p, (xj, fj)),
        ("M2f_square_dot", m2f, (fj2, fj2)),
        ("M3_dot3d", m3, (xj, fj)),
        ("M5_direct_tall", m5, (x2j, fj)),
        ("M6_reshape128", m6, (xj, f128j)),
        ("M4_loop2d", m4, (xj, fj)),
    ]:
        try:
            out = pl.pallas_call(
                kern,
                in_specs=[vm] * len(ins),
                out_specs=vm,
                out_shape=jax.ShapeDtypeStruct(
                    (m, m) if name == "M2f_square_dot"
                    else (tb * m, m) if name == "M5_direct_tall"
                    else (tb, n),
                    jnp.float32,
                ),
            )(*ins)
            got = np.asarray(out)
            print(f"{name}: compiled ok", file=sys.stderr)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
