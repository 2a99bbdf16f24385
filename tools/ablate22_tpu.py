"""Ablation 22: chunked-Pallas powact automaton vs the associative scan.

The powact hysteresis automaton is ~0.03 ms of the 0.11 ms replicated
detection logic (ablate18). The assoc backend is log-depth but launches
~2 log2(B) tiny kernels; the new chunked Pallas kernel batch-precomputes
the ratio edges and walks ONE kernel whose serial length is n_chunks in
the edge-free steady state. A/B on the flagship step + scan-only.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate22_tpu.py
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

    from __graft_entry__ import _flagship
    from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
    from fdc_tpu.utils.cplx import c2f_host
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    B = 512
    results = {}

    # -- scan-only marginal: realistic flagship powers (noise band) ---------
    rng = np.random.default_rng(0)
    cfg = _flagship(batch_blocks=B)
    fdc = FrequencyDomainChannelizer(cfg)
    pa = fdc.power_bank
    # in-band noise power of the one configured channel: sum of ~dec
    # exponentials per block (hysteresis edges rare at 10 dB)
    nbins = pa.geometry[0].measure_stop - pa.geometry[0].measure_start
    pw_host = rng.gamma(nbins, 1.0, (B, 1)).astype(np.float32) * 1e-6
    powf = jax.device_put(jnp.asarray(pw_host))

    for backend in ("assoc", "pallas", "scan"):
        pa.lifecycle_backend = backend

        def step(c, pw, t):
            ns, flags = pa.scan_flags(pw, c)
            return ns, flags

        carry0 = jax.jit(pa.init_state)()
        dt = time_scanned(step, carry0, powf, k=192, repeats=15,
                          perturb_arg=0)
        results[f"scan_only_{backend}_ms"] = round(dt * 1e3, 4)

    # -- full flagship step A/B ---------------------------------------------
    n = B * cfg.inplen
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))

    for backend in ("assoc", "pallas"):
        fdc2 = FrequencyDomainChannelizer(cfg)
        fdc2.power_bank.lifecycle_backend = backend
        carry0 = fdc2._jit_init()

        def step(c, xf_in, t):
            return fdc2._device_step(c, xf_in, t * jnp.int32(B))

        dt = time_scanned(step, carry0, xf, k=48, repeats=15)
        results[f"full_step_{backend}_ms"] = round(dt * 1e3, 4)
        results[f"full_step_{backend}_msps"] = round(n / dt / 1e6, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
