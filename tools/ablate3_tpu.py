"""Ablation round 3: rotated lifecycle kernel, tp-only MXU A/B, sharded 1x1.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate3_tpu.py
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
    from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
    from fdc_tpu.ops.extract import extract_bucket
    from fdc_tpu.ops.fft import forward_spectrum
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    rng = np.random.default_rng(0)
    cfg = _flagship(batch_blocks=512)
    n = cfg.batch_blocks * cfg.inplen
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))

    fdc = FrequencyDomainChannelizer(cfg)
    sd = fdc.segments[0]
    tp = fdc.throughput

    results = {}

    def run(name, step, carry0, k):
        t_start = time.time()
        dt = time_scanned(step, carry0, xf, k=k, repeats=4)
        results[name] = {
            "ms": round(dt * 1e3, 4),
            "msps": round(n / dt / 1e6, 1),
        }
        print(
            f"{name}: {results[name]['ms']} ms  {results[name]['msps']} MS/s"
            f"  (wall {time.time()-t_start:.0f}s)",
            file=sys.stderr,
        )

    def front(carry, xf_in):
        xx = f2c(xf_in)
        blocks, hist = frame_blocks(xx, carry["hist"], cfg.blocksize)
        spec = forward_spectrum(blocks)
        nc = dict(carry)
        nc["hist"] = hist
        return nc, spec

    # rotated lifecycle kernel cost (compare ablate2 seg_lifecycle 0.583)
    def v_lifecycle(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        power = sd.measure(spec)
        nc["seg0"], flags = sd.scan_slots(power, carry["seg0"])
        return nc, {"f": flags}

    carry0 = fdc._jit_init()
    run("seg_lifecycle_rot", v_lifecycle, carry0, 48)

    # tp-only MXU A/B (width-64 DFT matmuls vs VPU FFT)
    def make_tp(use_mxu):
        def v_tp(carry, xf_in, t0):
            nc, spec = front(carry, xf_in)
            out = []
            for bucket in tp.buckets:
                y = extract_bucket(
                    spec, jnp.asarray(bucket.starts),
                    jnp.asarray(bucket.windows), gain=float(bucket.width),
                    use_mxu=use_mxu,
                )
                out.append(tp.finish_bucket(bucket, y, t0))
            return nc, {"m": out}
        return v_tp

    run("tp_fft", make_tp(False), carry0, 64)
    run("tp_mxu", make_tp(True), carry0, 64)

    # full current step (rotated kernel + budget 8)
    run("full_now", fdc._device_step, carry0, 24)

    # sharded step at a 1x1 mesh: shard_map overhead vs the plain step
    from fdc_tpu.parallel.mesh import make_mesh
    from fdc_tpu.parallel.sharded import ShardedChannelizer

    sh = ShardedChannelizer(cfg, mesh=make_mesh(n_time=1, n_chan=1))
    run("sharded_1x1", sh._device_step, sh._jit_init(), 24)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
