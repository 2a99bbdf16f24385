"""Ablation 10: powact automaton backend A/B inside the FULL step.

Same session, same input: full production step with the powact hysteresis
automaton as (a) the Pallas serial kernel, (b) the batched
associative-scan formulation. Everything else identical.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate10_tpu.py
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
    from fdc_tpu.utils.cplx import c2f_host
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    cfg = _flagship(batch_blocks=512)
    fdc = FrequencyDomainChannelizer(cfg)

    rng = np.random.default_rng(0)
    n = cfg.batch_blocks * cfg.inplen
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))
    carry0 = fdc._jit_init()

    def step(carry, xf_in, t_idx):
        return fdc._device_step(
            carry, xf_in, t_idx * jnp.int32(cfg.batch_blocks)
        )

    for backend in ["pallas", "assoc", "pallas", "assoc"]:
        fdc.power_bank.lifecycle_backend = backend
        t0 = time.time()
        dt = time_scanned(step, carry0, xf, k=16, repeats=5)
        print(
            f"powact={backend}: {dt*1e3:.4f} ms  (wall {time.time()-t0:.0f}s)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
