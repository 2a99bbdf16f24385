"""Ablation 19: shared-matrix fused extraction + folded phases (real TPU).

Variants over the flagship tp bucket (64 channels, w=64, equal windows):

  G0 front                  frame + FFT
  G1 + XLA path             extract_bucket (flat matmul) + finish_bucket
                            (the pre-change flagship routing: the bucket
                            FAILED the per-channel VMEM gate)
  G2 + fused shared         fused_extract_shared (no phase) + finish_bucket
  G3 + fused shared+phase   extract_bucket_phased (quarter turns folded)
                            + finish_bucket(prephased)

Also numerics: G2/G3 vs G1 rel-RMS.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate19_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-blocks", type=int, default=512)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=15)
    args = ap.parse_args()

    # The quarter-turn fold lost its on-hardware A/B (G3 +0.217 ms vs G2
    # +0.120 ms marginal, 2026-08-19) and is now env-gated off by default;
    # re-enable it here so G3 keeps measuring the folded kernel, not the
    # fallback (which would be G2 + apply_phase_pairs).
    os.environ["FDC_TPU_FOLD_PHASE"] = "1"

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
    from fdc_tpu.ops.extract import extract_bucket, extract_bucket_phased
    from fdc_tpu.ops.extract_pallas import fused_extract_shared
    from fdc_tpu.ops.fft import _rr_idft_matrix, forward_spectrum
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    cfg = _flagship(batch_blocks=args.batch_blocks)
    fdc = FrequencyDomainChannelizer(cfg)
    tp = fdc.throughput
    bucket = tp.buckets[0]
    l = bucket.width
    keep_from = l - bucket.out_len

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

    def g0(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        return nc, [spec]

    def xla_bucket(spec, t0):
        # force the pre-change routing: slices + flat matmul
        from fdc_tpu.ops.extract import gather_slices
        m = _rr_idft_matrix(l, keep_from, True, float(l), pairs=True)
        mc = (
            np.concatenate([bucket.windows[0], bucket.windows[0]])[:, None]
            * m
        ).astype(np.float32)
        slices = gather_slices(spec, jnp.asarray(bucket.starts), l)
        zri = jnp.concatenate([jnp.real(slices), jnp.imag(slices)], axis=-1)
        c, b, l2 = zri.shape
        y = jnp.dot(
            zri.reshape(c * b, l2), jnp.asarray(mc),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        ).reshape(c, b, -1)
        y = y.reshape(c, b, -1, 2)
        return tp.finish_bucket(bucket, y, t0, pairs=True)

    def g1(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        return nc, [xla_bucket(spec, t0)]

    def g2(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        y = extract_bucket(
            spec, bucket.starts, bucket.windows, gain=float(l),
            use_mxu=True, keep_from=keep_from, pairs=True,
        )  # routes to fused_extract_shared now
        return nc, [tp.finish_bucket(bucket, y, t0, pairs=True)]

    def g3(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        y = extract_bucket_phased(
            spec, bucket.starts, bucket.windows, cfg.relinvovl,
            gain=float(l), use_mxu=True, keep_from=keep_from,
        )
        return nc, [tp.finish_bucket(bucket, y, t0, pairs=True,
                                     prephased=True)]

    # -- numerics first ------------------------------------------------------
    @jax.jit
    def probe(carry, xf_in):
        nc, spec = front(carry, xf_in)
        a = xla_bucket(spec, jnp.int32(0))
        y2 = extract_bucket(
            spec, bucket.starts, bucket.windows, gain=float(l),
            use_mxu=True, keep_from=keep_from, pairs=True,
        )
        b = tp.finish_bucket(bucket, y2, jnp.int32(0), pairs=True)
        y3 = extract_bucket_phased(
            spec, bucket.starts, bucket.windows, cfg.relinvovl,
            gain=float(l), use_mxu=True, keep_from=keep_from,
        )
        c = tp.finish_bucket(bucket, y3, jnp.int32(0), pairs=True,
                             prephased=True)
        return a, b, c

    a, b, c = jax.block_until_ready(probe(carry0, xf))
    a, b, c = np.asarray(a), np.asarray(b), np.asarray(c)
    rel_b = np.sqrt(np.mean((a - b) ** 2) / np.mean(a**2))
    rel_c = np.sqrt(np.mean((a - c) ** 2) / np.mean(a**2))
    print(f"fused-shared vs XLA rel-RMS: {rel_b:.2e}", file=sys.stderr)
    print(f"phase-folded vs XLA rel-RMS: {rel_c:.2e}", file=sys.stderr)

    results = {}
    for name, step, k in [
        ("G0_front", g0, args.k + args.k // 2),
        ("G1_xla", g1, args.k),
        ("G2_fused_shared", g2, args.k),
        ("G3_phase_folded", g3, args.k),
    ]:
        t0 = time.time()
        dt = time_scanned(step, carry0, xf, k=k, repeats=args.repeats)
        results[name] = dt
        print(
            f"{name}: {dt*1e3:.4f} ms  (wall {time.time()-t0:.0f}s)",
            file=sys.stderr,
        )
    for name in ["G1_xla", "G2_fused_shared", "G3_phase_folded"]:
        print(
            f"marginal {name} - G0_front: "
            f"{(results[name]-results['G0_front'])*1e3:+.4f} ms",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
