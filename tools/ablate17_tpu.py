"""Ablation 17: isolate the dynamic-slot extraction cost vs its static twin.

The bench roofline's seg rows (extract_dynamic at CONSTANT starts/windows)
measure ~0.05 ms while the pipeline's extract_plan+extract_slots marginal
(ablate12 A4-A3) measures ~0.23 ms for the same FLOPs. Decompose:

  E0 front                 frame + FFT + spec_ext
  E1 + static dynamic-ext  extract_dynamic, constant starts + windows
  E2 + traced geometry     extract_slots(ids=arange(E)) — one-hot slot
                           geometry from the carried state, no plan
  E3 + full plan           scan_slots + extract_plan + extract_slots
                           (== the pipeline's seg path minus powact/tp)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate17_tpu.py
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
    from fdc_tpu.ops.extract import extract_dynamic
    from fdc_tpu.ops.fft import forward_spectrum
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    cfg = _flagship(batch_blocks=512)
    fdc = FrequencyDomainChannelizer(cfg)
    sd = fdc.segments[0]

    rng = np.random.default_rng(0)
    n = cfg.batch_blocks * cfg.inplen
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))
    carry0 = fdc._jit_init()

    e = sd.extract_budget
    starts_np = np.linspace(
        100, cfg.blocksize - sd.w_cap - 4, e
    ).astype(np.int32)
    starts_c = jnp.asarray(starts_np)
    wins_c = jnp.asarray(
        np.tile(sd.window_table[sd.w_cap_log2, : sd.w_cap], (e, 1))
    )
    wl2_c = jnp.full((e,), sd.w_cap_log2, jnp.int32)

    def front(carry, xf_in):
        xx = f2c(xf_in)
        blocks, hist = frame_blocks(xx, carry["hist"], cfg.blocksize)
        spec = forward_spectrum(blocks, use_mxu=cfg.use_mxu_fft)
        nc = dict(carry)
        nc["hist"] = hist
        spec_ext = jnp.concatenate([carry["prev_spec"][None], spec])
        nc["prev_spec"] = spec[-1]
        return nc, spec, spec_ext

    def e0(carry, xf_in, t0):
        nc, spec, spec_ext = front(carry, xf_in)
        return nc, [spec_ext]

    def e1(carry, xf_in, t0):
        nc, spec, spec_ext = front(carry, xf_in)
        y = extract_dynamic(
            spec_ext, starts_c, wl2_c, wins_c, sd.w_cap,
            use_mxu=sd.use_mxu, pairs=True,
        )
        return nc, [y]

    def e2(carry, xf_in, t0):
        nc, spec, spec_ext = front(carry, xf_in)
        y = sd.extract_slots(
            spec_ext, carry["seg0"],
            jnp.arange(e, dtype=jnp.int32), pairs=True,
        )
        return nc, [y]

    def e3(carry, xf_in, t0):
        nc, spec, spec_ext = front(carry, xf_in)
        sq = jnp.abs(spec) ** 2
        power = sd.measure(spec, sq)
        seg_state, (got, processed, emit_now, phase_used) = sd.scan_slots(
            power, carry["seg0"]
        )
        nc["seg0"] = sd._free_tombstones(seg_state)
        slot_ids, overflow = sd.extract_plan(got, processed)
        y = sd.extract_slots(spec_ext, seg_state, slot_ids, pairs=True)
        return nc, [y, got, processed, emit_now, overflow]

    results = {}
    for name, step, k in [
        ("E0_front", e0, 96),
        ("E1_static_dyn", e1, 64),
        ("E2_traced_geom", e2, 64),
        ("E3_full_plan", e3, 64),
    ]:
        t0 = time.time()
        dt = time_scanned(step, carry0, xf, k=k, repeats=15)
        results[name] = dt
        print(
            f"{name}: {dt*1e3:.4f} ms  (wall {time.time()-t0:.0f}s)",
            file=sys.stderr,
        )
    keys = list(results)
    for prev, cur in zip(keys, keys[1:]):
        print(
            f"marginal {cur} - {prev}: "
            f"{(results[cur]-results[prev])*1e3:+.4f} ms",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
