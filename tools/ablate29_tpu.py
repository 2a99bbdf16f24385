"""Ablation 29: is the [B+1, N] spec_ext concat a real HBM copy?

The plain step builds spec_ext = concat([prev_spec[None], FFT(B blocks)])
— a 16.8 MB materialization at B=512/N=4096 if XLA cannot alias the FFT
output into the concat buffer (~42 us of HBM traffic). The pipeline
front (parallel/pipeline.py) avoids it by host-extending the sample
buffer one block back and FFT'ing B+1 rows directly (one extra FFT row,
+0.2%). This driver A/Bs the two fronts with REAL extraction consumers
(first tp bucket on spec rows, burst bucket on spec_ext) so the concat
cannot fold into a checksum reduce:

  A_concat: frame B -> FFT B -> concat prev row -> consume
  B_ext:    frame B+1 (host-extended samples) -> FFT B+1 -> consume

B_ext - A_concat = (extra FFT row) - (concat copy). Negative = the
restructure wins.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate29_tpu.py
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

    import __graft_entry__ as ge
    from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
    from fdc_tpu.ops.extract import extract_bucket, extract_bucket_phased
    from fdc_tpu.ops.fft import forward_spectrum
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    B = 512
    cfg = ge._flagship(batch_blocks=B)
    fdc = FrequencyDomainChannelizer(cfg)
    tp_bucket = fdc.throughput.buckets[0]
    pa_bucket = fdc.power_bank.buckets[0]

    rng = np.random.default_rng(0)
    n = B * cfg.inplen
    n_ext = (B + 1) * cfg.inplen
    x_ext = (
        rng.standard_normal(n_ext) + 1j * rng.standard_normal(n_ext)
    ).astype(np.complex64)
    xf = jax.device_put(jnp.asarray(c2f_host(x_ext[-n:])))
    xf_ext = jax.device_put(jnp.asarray(c2f_host(x_ext)))

    def consume(spec, spec_ext, t0):
        y_tp = extract_bucket_phased(
            spec, tp_bucket.starts, tp_bucket.windows, cfg.relinvovl,
            gain=float(tp_bucket.width), use_mxu=cfg.use_mxu_fft,
            keep_from=tp_bucket.width - tp_bucket.out_len,
        )
        y_pa = extract_bucket(
            spec_ext, pa_bucket.starts, pa_bucket.windows,
            use_mxu=cfg.use_mxu_fft,
            keep_from=pa_bucket.width - pa_bucket.out_len, pairs=True,
        )
        return y_tp, y_pa

    def front_concat(carry, xx, t):
        x = f2c(xx)
        blocks, hist = frame_blocks(x, carry["hist"], cfg.blocksize)
        spec = forward_spectrum(blocks, use_mxu=cfg.use_mxu_fft)
        spec_ext = jnp.concatenate([carry["prev_spec"][None], spec])
        nc = {"hist": hist, "prev_spec": spec[-1]}
        return nc, consume(spec, spec_ext, t)

    def front_ext(carry, xx, t):
        x = f2c(xx)
        blocks, hist = frame_blocks(x, carry["hist"], cfg.blocksize)
        spec_ext = forward_spectrum(blocks, use_mxu=cfg.use_mxu_fft)
        nc = {"hist": hist}
        return nc, consume(spec_ext[1:], spec_ext, t)

    # complex64 constants must be CREATED inside jit (the tunnel cannot
    # transfer c64 host->device)
    @jax.jit
    def make_carries():
        return (
            {
                "hist": jnp.zeros((cfg.ovllen,), jnp.complex64),
                "prev_spec": jnp.zeros((cfg.blocksize,), jnp.complex64),
            },
            {"hist": jnp.zeros((cfg.ovllen,), jnp.complex64)},
        )

    carry_a, carry_b = make_carries()

    results = {}
    dt_a = time_scanned(front_concat, carry_a, xf, k=48, repeats=15)
    results["A_concat_ms"] = round(dt_a * 1e3, 4)
    print("A_concat_ms", results["A_concat_ms"], file=sys.stderr)
    dt_b = time_scanned(front_ext, carry_b, xf_ext, k=48, repeats=15)
    results["B_ext_ms"] = round(dt_b * 1e3, 4)
    print("B_ext_ms", results["B_ext_ms"], file=sys.stderr)
    results["delta_ms"] = round((dt_b - dt_a) * 1e3, 4)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
