"""Ablation 26: lifecycle/powact kernel chunk size under the bench workload.

The chunked idle fast paths make a sparse batch's serial chain
n_blocks/chunk iterations (+ chunk per busy chunk). chunk=32 was never
swept; the flagship bench workload (unit noise, spurious candidates
only) determines the real busy-chunk density. This driver times, on the
real chip, the flagship segment's scan (slot_lifecycle via
scan_slots-equivalent packing) and the powact automaton at
chunk in {16, 32, 64, 128}, on powers derived from the bench's actual
noise input through the real FFT front.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate26_tpu.py
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
    from fdc_tpu.ops.lifecycle_pallas import powact_flags, slot_lifecycle
    from fdc_tpu.ops.fft import forward_spectrum
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    B = 512
    cfg = ge._flagship(batch_blocks=B)
    fdc = FrequencyDomainChannelizer(cfg)
    sd = fdc.segments[0]
    pa = fdc.power_bank

    rng = np.random.default_rng(0)
    n = B * cfg.inplen
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    xf = jnp.asarray(c2f_host(x))

    @jax.jit
    def front(xx):
        blocks, _ = frame_blocks(
            f2c(xx), jnp.zeros((cfg.ovllen,), jnp.complex64), cfg.blocksize
        )
        spec = forward_spectrum(blocks, use_mxu=cfg.use_mxu_fft)
        return sd.measure(spec), pa.measure(spec)

    seg_pow, pa_pow = front(xf)
    seg_pow = jax.device_put(seg_pow)
    pa_pow = jax.device_put(pa_pow)
    k = sd.max_candidates or (sd.geometry.n_cells - 1)
    packed = jax.device_put(jax.jit(sd._packed_candidates)(seg_pow)[0])
    n_busy = int(
        np.asarray(
            jnp.any(packed[:, 2 * k:3 * k] != 0, axis=1).sum()
        )
    )
    print(f"blocks with spurious candidates: {n_busy}/{B}", file=sys.stderr)

    state0 = jax.jit(sd.init_state)()

    results = {"busy_blocks": n_busy}
    for chunk in (16, 32, 64, 128):
        def scan_step(c, pk, t, chunk=chunk):
            ns, fl = slot_lifecycle(
                pk, c, n_cand=k, r=sd.relinvovl,
                delay=sd.deactivation_delay, chunk=chunk,
            )
            return ns, fl

        dt = time_scanned(
            scan_step, state0, packed, k=96, repeats=15, perturb_arg=0
        )
        results[f"seg_scan_chunk{chunk}_ms"] = round(dt * 1e3, 4)

    pa_state0 = jax.jit(pa.init_state)()
    dvec = jnp.asarray(
        [g.delta_phase for g in pa.geometry], jnp.int32
    )
    for chunk in (16, 32, 64, 128):
        def pa_step(c, pw, t, chunk=chunk):
            ns, fl = powact_flags(
                pw, c, dvec, r=cfg.relinvovl, thresh=pa.thresh, chunk=chunk,
            )
            return ns, fl

        dt = time_scanned(
            pa_step, pa_state0, pa_pow, k=96, repeats=15, perturb_arg=0
        )
        results[f"powact_chunk{chunk}_ms"] = round(dt * 1e3, 4)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
