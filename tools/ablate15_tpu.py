"""Ablation 15: flat vs batched matmul for the equal-window tp bucket.

Y0 front only; Y1 extract_bucket (flat single-matrix path, windows np);
Y2 forced per-channel batched dot_general (previous form). K sized so
K*step >= 25 ms.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate15_tpu.py
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
    bucket = fdc.throughput.buckets[0]
    l = bucket.width
    keep_from = bucket.width - bucket.out_len
    gain = float(bucket.width)
    starts = jnp.asarray(bucket.starts)
    wins_np = np.asarray(bucket.windows, np.float32)

    m_base = _rr_idft_matrix(l, keep_from, True, gain, pairs=True)
    m_chan = (
        np.concatenate([wins_np, wins_np], axis=1)[:, :, None] * m_base[None]
    ).astype(np.float32)
    mc_b = jnp.asarray(m_chan)

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

    def y0(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        return nc, [spec]

    def y1(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        y = extract_bucket(
            spec, starts, wins_np, gain=gain, use_mxu=True,
            keep_from=keep_from, pairs=True,
        )
        return nc, [y]

    def y2(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        slices = gather_slices(spec, starts, l)
        zri = jnp.concatenate([jnp.real(slices), jnp.imag(slices)], axis=-1)
        y = jax.lax.dot_general(
            zri, mc_b, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        )
        return nc, [y.reshape(y.shape[0], y.shape[1], -1, 2)]

    _, a = jax.jit(lambda c, xx: y1(c, xx, 0))(carry0, xf)
    _, b = jax.jit(lambda c, xx: y2(c, xx, 0))(carry0, xf)
    print(
        "flat == batched:",
        bool(jnp.array_equal(a[0], b[0].reshape(a[0].shape))),
        file=sys.stderr,
    )

    for name, step, k in [
        ("Y0_front", y0, 96),
        ("Y1_flat", y1, 64),
        ("Y2_batched", y2, 64),
        ("Y1_flat_b", y1, 64),
    ]:
        t0 = time.time()
        dt = time_scanned(step, carry0, xf, k=k, repeats=5)
        print(
            f"{name}: {dt*1e3:.4f} ms  (wall {time.time()-t0:.0f}s)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
