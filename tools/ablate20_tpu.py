"""Ablation 20: sharded 1x1 overhead vs the plain step, post phase-fold
retirement (both paths now route extract_bucket_phased through the
unphased shared kernel + apply_phase_pairs).

K=48 per the >=25 ms dispatch-jitter floor (PERFORMANCE.md); median of
15 K-vs-2K diffs via time_scanned.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate20_tpu.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    # pin the fold OFF: the docstring's claim (both paths route through
    # the unphased shared kernel + apply_phase_pairs) must hold even in a
    # shell that inherited FDC_TPU_FOLD_PHASE=1 from an ablate19 run
    os.environ["FDC_TPU_FOLD_PHASE"] = "0"

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
    from fdc_tpu.parallel.mesh import make_mesh
    from fdc_tpu.parallel.sharded import ShardedChannelizer
    from fdc_tpu.utils.cplx import c2f_host
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    rng = np.random.default_rng(0)
    cfg = _flagship(batch_blocks=512)
    n = cfg.batch_blocks * cfg.inplen
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))

    results = {}

    def run(name, step, carry0, k=48, repeats=15):
        t_start = time.time()
        dt = time_scanned(step, carry0, xf, k=k, repeats=repeats)
        results[name] = {
            "ms": round(dt * 1e3, 4),
            "msps": round(n / dt / 1e6, 1),
        }
        print(
            f"{name}: {results[name]['ms']} ms  {results[name]['msps']} MS/s"
            f"  (wall {time.time()-t_start:.0f}s)",
            file=sys.stderr,
        )

    fdc = FrequencyDomainChannelizer(cfg)
    run("plain", fdc._device_step, fdc._jit_init())

    sh = ShardedChannelizer(cfg, mesh=make_mesh(n_time=1, n_chan=1))
    run("sharded_1x1", sh._device_step, sh._jit_init())

    d = results["sharded_1x1"]["ms"] - results["plain"]["ms"]
    results["shard_overhead_ms"] = round(d, 4)
    results["shard_overhead_frac"] = round(d / results["plain"]["ms"], 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
