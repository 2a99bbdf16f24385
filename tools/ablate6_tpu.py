"""Ablation round 6: forward-FFT front-end — XLA FFT vs four-step MXU matmul.

After the matmul-DFT subband transforms and the idle-fast-path lifecycle
kernel, the 4096-pt forward FFT front-end (~0.32 ms at B=512) is the
largest single line item of the step. `forward_spectrum_mxu` re-states it
as two 64x64-contraction real matmuls (twiddle in between, fftshift/scale
folded into the stage-2 matrix). This measures both front-end variants in
isolation (frame_blocks + spectrum + checksum).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate6_tpu.py
"""

import json
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
    from fdc_tpu.ops.fft import forward_spectrum, forward_spectrum_mxu
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f, c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    rng = np.random.default_rng(0)
    cfg = _flagship(batch_blocks=512)
    n = cfg.batch_blocks * cfg.inplen
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))
    hist0 = jnp.zeros((cfg.ovllen, 2), dtype=jnp.float32)

    results = {}

    def run(name, step, k):
        t_start = time.time()
        dt = time_scanned(step, hist0, xf, k=k, repeats=4)
        results[name] = {
            "ms": round(dt * 1e3, 4),
            "msps": round(n / dt / 1e6, 1),
        }
        print(
            f"{name}: {results[name]['ms']} ms  {results[name]['msps']} MS/s"
            f"  (wall {time.time()-t_start:.0f}s)",
            file=sys.stderr,
        )

    def make_front(mxu):
        def step(histf, xf_in, t0):
            x_in = f2c(xf_in)
            blocks, hist2 = frame_blocks(x_in, f2c(histf), cfg.blocksize)
            if mxu:
                spec = forward_spectrum_mxu(blocks)
            else:
                spec = forward_spectrum(blocks)
            return c2f(hist2), jnp.abs(spec)

        return step

    run("front_fft", make_front(False), k=96)
    run("front_mxu", make_front(True), k=96)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
