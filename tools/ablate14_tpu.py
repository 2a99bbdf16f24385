"""Ablation 14: chunked idle fast path in the slot-lifecycle kernel.

Isolated kernel timing (flagship shapes: B=512, K=8, S=16) — the
state-carry dependence chains iterations, so no LICM perturbation is
needed. Inputs: fully idle (no candidates), and mixed (1 busy chunk).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate14_tpu.py
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
    from fdc_tpu.ops.lifecycle_pallas import slot_lifecycle
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    cfg = _flagship(batch_blocks=512)
    fdc = FrequencyDomainChannelizer(cfg)
    sd = fdc.segments[0]
    k = sd.max_candidates
    nb = 512

    idle = np.zeros((nb, 7 * k), np.int32)
    mixed = idle.copy()
    # one busy chunk: a valid candidate at blocks 100-103
    mixed[100:104, 0 * k] = 40      # cand_s (bin)
    mixed[100:104, 1 * k] = 80      # cand_e
    mixed[100:104, 2 * k] = 1       # valid
    mixed[100:104, 3 * k] = 7       # wlog2
    mixed[100:104, 4 * k] = 30      # ext_start
    mixed[100:104, 5 * k] = 2       # ext_start % r

    state0 = sd.init_state()

    for label, packed in [("idle", jnp.asarray(idle)),
                          ("mixed", jnp.asarray(mixed))]:
        for chunk in [1, 32, 64]:
            def step(carry, p, t):
                ns, flags = slot_lifecycle(
                    p, carry, n_cand=k, r=sd.relinvovl,
                    delay=sd.deactivation_delay, chunk=chunk,
                )
                return ns, flags

            t0 = time.time()
            dt = time_scanned(
                step, state0, packed, k=64, repeats=5, perturb_arg=None
            )
            print(
                f"{label} chunk={chunk}: {dt*1e3:.4f} ms "
                f"(wall {time.time()-t0:.0f}s)",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
