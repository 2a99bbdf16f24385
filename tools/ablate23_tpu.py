"""Ablation 23: dynamic slot extraction — window-fold vs multiply-then-matmul.

The slot extraction (+0.29 ms marginal at budget 8, w_cap 512, B=512) was
the largest remaining extraction term (VERDICT r2 item 5). This driver
times, isolated on [B+1, N] spectra with traced starts:

  A  multiply-then-matmul (the round-2 route): slices ⊙ windows_pad ->
     interp_subband_ifft_mxu (concat + one [*, 2w] @ [2w, 2w] matmul)
  B  window-fold (the new route in extract_dynamic): slices ->
     [S, B, 2w] @ [S, 2w, 2w] batched dot with diag([w;w])·M operands

plus their numeric delta. The matmul FLOPs are identical — the candidate
win is the removed windowed-multiply pass and its HBM intermediate.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate23_tpu.py
"""

import json
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

    from fdc_tpu.ops.extract import extract_dynamic, gather_slices
    from fdc_tpu.ops.fft import interp_subband_ifft_mxu
    from fdc_tpu.utils.cplx import f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    B, N, E, W = 513, 4096, 8, 512
    rng = np.random.default_rng(0)
    specf = jax.device_put(jnp.asarray(
        rng.standard_normal((B, N, 2)).astype(np.float32)
    ))
    starts = jnp.asarray(rng.integers(0, N - W, E).astype(np.int32))
    wlog2 = jnp.asarray(rng.integers(5, 10, E).astype(np.int32))
    wins_host = np.zeros((E, W), np.float32)
    for i in range(E):
        wins_host[i, : 1 << int(wlog2[i])] = rng.random(
            1 << int(wlog2[i])
        ).astype(np.float32)
    wins = jnp.asarray(wins_host)

    def variant_a(carry, sf, t):
        spec = f2c(sf)
        spec = jnp.pad(spec, ((0, 0), (0, W)))
        slices = gather_slices(spec, starts + (t % 2), W)
        z = slices * wins[:, None, :].astype(slices.dtype)
        return carry, interp_subband_ifft_mxu(z, W, pairs=True)

    def variant_b(carry, sf, t):
        spec = f2c(sf)
        return carry, extract_dynamic(
            spec, starts + (t % 2), wlog2, wins, W, use_mxu=True,
            pairs=True,
        )

    results = {}
    c0 = jnp.zeros(())
    for name, fn in (("A_mul_then_matmul", variant_a),
                     ("B_window_fold", variant_b)):
        dt = time_scanned(fn, c0, specf, k=48, repeats=15)
        results[f"{name}_ms"] = round(dt * 1e3, 4)

    # numeric delta (same starts, one shot)
    _, ya = jax.jit(variant_a)(c0, specf, jnp.int32(0))
    _, yb = jax.jit(variant_b)(c0, specf, jnp.int32(0))
    a, b = np.asarray(ya), np.asarray(yb)
    rel = float(np.sqrt(np.mean((a - b) ** 2) / np.mean(a ** 2)))
    results["rel_rms_a_vs_b"] = rel

    print(json.dumps(results))


if __name__ == "__main__":
    main()
