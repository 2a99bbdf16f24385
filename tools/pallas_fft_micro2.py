"""Micro-probes for the fused-FFT kernel plan's risky Mosaic ops.

  P1 transposed contraction: dot_general(((0,),(0,))) on [64,64]x[64,64]
  P2 strided sublane select: x[0::2, :] / x[1::2, :] of [64, 64]
  P3 sublane concat of two lane-halves: [32,64]+[32,64] -> [64,64]
  P4 full per-block pipeline shape at tb=8: slice -> halves-concat ->
     dotT -> twiddle -> dot -> even/odd pack -> [32,128] store

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/pallas_fft_micro2.py
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

    m, tb = 64, 8
    hp = functools.partial(
        jax.lax.dot_general,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    def p1(x_ref, f_ref, o_ref):
        o_ref[:] = hp(x_ref[:], f_ref[:], (((0,), (0,)), ((), ())))

    def p2(x_ref, o_ref):
        o_ref[:32, :] = x_ref[0::2, :]
        o_ref[32:, :] = x_ref[1::2, :]

    def p3(x_ref, o_ref, scratch):
        scratch[0:32, :] = x_ref[:, :m]
        scratch[32:64, :] = x_ref[:, m:]
        o_ref[:] = scratch[:]

    def p4(x_ref, f_ref, g_ref, t_ref, o_ref, scratch):
        for b in range(tb):
            blk = x_ref[b * 32:(b + 1) * 32, :]  # [32, 128]
            scratch[0:32, :] = blk[:, :m]
            scratch[32:64, :] = blk[:, m:]
            s = hp(scratch[:], f_ref[:], (((0,), (0,)), ((), ())))  # [b,d']
            s = s * t_ref[:]
            xk = hp(g_ref[:], s, (((1,), (0,)), ((), ())))  # [c', d']
            o_ref[b * 32:(b + 1) * 32, 0:m] = xk[0::2, :]
            o_ref[b * 32:(b + 1) * 32, m:128] = xk[1::2, :]

    def p5(x_ref, o_ref):
        o_ref[:, 0:m] = x_ref[0::2, :]
        o_ref[:, m:128] = x_ref[1::2, :]

    def p6(x_ref, o_ref):
        o_ref[:, 0:m] = x_ref[0:32, :]
        o_ref[:, m:128] = x_ref[32:64, :]

    def p4c(x_ref, f_ref, o_ref, scratch):
        for b in range(tb):
            blk = x_ref[b * 32:(b + 1) * 32, :]
            scratch[0:32, :] = blk[:, :m]
            scratch[32:64, :] = blk[:, m:]
            s = hp(scratch[:], f_ref[:], (((0,), (0,)), ((), ())))
            o_ref[b * 32:(b + 1) * 32, 0:m] = s[0::2, :]
            o_ref[b * 32:(b + 1) * 32, m:128] = s[1::2, :]

    def p4d(x_ref, f_ref, g_ref, t_ref, o_ref, scratch):
        blk = x_ref[0:32, :]
        scratch[0:32, :] = blk[:, :m]
        scratch[32:64, :] = blk[:, m:]
        s = hp(scratch[:], f_ref[:], (((0,), (0,)), ((), ())))
        s = s * t_ref[:]
        xk = hp(g_ref[:], s, (((1,), (0,)), ((), ())))
        o_ref[0:32, 0:m] = xk[0::2, :]
        o_ref[0:32, m:128] = xk[1::2, :]

    rng = np.random.default_rng(0)
    x64 = rng.standard_normal((m, m)).astype(np.float32)
    x128 = rng.standard_normal((32, 128)).astype(np.float32)
    xtall = rng.standard_normal((tb * 32, 128)).astype(np.float32)
    f = rng.standard_normal((m, m)).astype(np.float32)
    g = rng.standard_normal((m, m)).astype(np.float32)
    t = rng.standard_normal((m, m)).astype(np.float32)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    def expect_p4():
        out = np.zeros((tb * 32, 128), np.float32)
        for b in range(tb):
            blk = xtall[b * 32:(b + 1) * 32]
            xb = np.concatenate([blk[:, :m], blk[:, m:]], axis=0)
            s = (xb.T @ f) * t
            xk = g @ s
            pack = np.concatenate([xk[0::2], xk[1::2]], axis=1)
            out[b * 32:(b + 1) * 32] = pack
        return out

    cases = [
        ("P1_dotT", p1, (x64, f), (m, m), x64.T @ f),
        ("P2_stride2", p2, (x64,), (m, m),
         np.concatenate([x64[0::2], x64[1::2]], axis=0)),
        ("P3_halves", p3, (x128,), (m, m),
         np.concatenate([x128[:, :m], x128[:, m:]], axis=0)),
        ("P4_block_pipeline", p4, (xtall, f, g, t), (tb * 32, 128),
         expect_p4()),
        ("P4c_loop_dotT", p4c, (xtall, f), (tb * 32, 128), None),
        ("P4d_oneblock_full", p4d, (xtall, f, g, t), (tb * 32, 128), None),
        ("P5_lane_store", p5, (x64,), (32, 128),
         np.concatenate([x64[0::2], x64[1::2]], axis=1)),
        ("P6_lane_store_plain", p6, (x64,), (32, 128),
         np.concatenate([x64[:32], x64[32:]], axis=1)),
    ]
    for name, kern, ins, oshape, want in cases:
        try:
            scr = (
                [pltpu.VMEM((m, m), jnp.float32)]
                if name.startswith(("P3", "P4")) else []
            )
            out = pl.pallas_call(
                kern,
                in_specs=[vm] * len(ins),
                out_specs=vm,
                out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
                scratch_shapes=scr,
            )(*[jnp.asarray(v) for v in ins])
            got = np.asarray(out)
            if want is None:
                print(f"{name}: compiled ok", file=sys.stderr)
            else:
                rel = float(
                    np.sqrt(
                        np.mean((got - want) ** 2)
                        / (np.mean(want**2) + 1e-30)
                    )
                )
                print(f"{name}: compiled, rel-RMS {rel:.2e}", file=sys.stderr)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
