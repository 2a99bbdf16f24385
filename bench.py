"""Benchmark: wideband complex Msamples/s/chip on the flagship workload.

Workload (BASELINE.json north-star metric): 4096-pt overlap-save FFT
front-end, 64 fixed channels, plus one power-activation channel and one
dynamic detection segment — the full device pipeline of
FrequencyDomainChannelizer, steady-state, device-resident carry.

Measurement methodology: the tunneled single-chip environment has large
per-call host<->device transfer costs, so the iteration loop runs INSIDE
jit (lax.scan over steps, carry threaded, outputs kept live via checksum
reduction — nothing large crosses the host boundary). Step time is the
K->2K difference, which cancels dispatch overhead.

``vs_baseline`` is measured against the roofline proxy: the same batch
through the forward FFT front-end alone (framing + 4096-pt FFT + fftshift +
scale) — the "≥95% of roofline FFT+windowing throughput" criterion.

Prints ONE JSON line.
"""

import argparse
import json
import time

import numpy as np


def _checksum(tree):
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    acc = 0.0
    for x in leaves:
        if x.dtype == bool:
            acc = acc + jnp.sum(x.astype(jnp.float32))
        elif jnp.issubdtype(x.dtype, jnp.integer):
            acc = acc + jnp.sum(x.astype(jnp.float32))
        else:
            acc = acc + jnp.sum(jnp.abs(x).astype(jnp.float32))
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8, help="K (timed as 2K-K)")
    ap.add_argument("--batch-blocks", type=int, default=512)
    args = ap.parse_args()

    import os

    import jax

    # persistent compilation cache: tunnel compiles take minutes; a warm
    # cache makes repeat bench runs near-instant
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _flagship
    from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
    from fdc_tpu.ops.fft import forward_spectrum
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f_host, f2c

    cfg = _flagship(batch_blocks=args.batch_blocks)
    fdc = FrequencyDomainChannelizer(cfg)

    rng = np.random.default_rng(0)
    n = cfg.batch_blocks * cfg.inplen
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))
    carry0 = fdc._jit_init()

    def make_runner(k):
        @jax.jit
        def run(carry, xf_in):
            def body(c, t0):
                c2, out = fdc._device_step(c, xf_in, t0)
                return c2, _checksum(out)

            t0s = jnp.arange(k, dtype=jnp.int32) * cfg.batch_blocks
            c_fin, sums = lax.scan(body, carry, t0s)
            return _checksum(c_fin) + jnp.sum(sums)

        return run

    def timed(fn, *a):
        r = fn(*a)
        jax.block_until_ready(r)  # includes compile
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            r = fn(*a)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        return best

    k = args.steps
    t_k = timed(make_runner(k), carry0, xf)
    t_2k = timed(make_runner(2 * k), carry0, xf)
    dt_full = max((t_2k - t_k) / k, 1e-9)

    # roofline proxy: overlap-save framing + forward FFT front-end only.
    # (History starts as zeros INSIDE jit — the axon tunnel cannot run eager
    # complex ops, see fdc_tpu/utils/cplx.py.)
    def make_fft_runner(k):
        @jax.jit
        def run(xf_in):
            xx = f2c(xf_in)
            hist = jnp.zeros((cfg.ovllen,), jnp.complex64)

            def body(h, _):
                blocks, h2 = frame_blocks(xx, h, cfg.blocksize)
                spec = forward_spectrum(blocks)
                return h2 + spec[-1, : cfg.ovllen] * 1e-30, jnp.sum(
                    jnp.abs(spec).astype(jnp.float32)
                )

            h_fin, sums = lax.scan(body, hist, None, length=k)
            return jnp.sum(jnp.abs(h_fin)) + jnp.sum(sums)

        return run

    # the FFT front-end is ~10x faster per batch than the full pipeline, so
    # scan proportionally more steps to stay above timing noise
    kf = 8 * k
    t_k = timed(make_fft_runner(kf), xf)
    t_2k = timed(make_fft_runner(2 * kf), xf)
    dt_fft = max((t_2k - t_k) / kf, 1e-9)

    samples = cfg.batch_blocks * cfg.inplen
    msps = samples / dt_full / 1e6
    msps_fft = samples / dt_fft / 1e6

    print(
        json.dumps(
            {
                "metric": "wideband_complex_Msamples_per_s_per_chip_4096fft_64ch",
                "value": round(msps, 3),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / msps_fft, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
