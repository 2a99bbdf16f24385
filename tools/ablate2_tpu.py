"""Ablation round 2: detection-path split + budget/MXU A/B on the chip.

Follows tools/ablate_tpu.py's methodology (LICM-proof scan timing, per-
variant K sized above the tunnel's jitter).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate2_tpu.py
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
    from fdc_tpu.ops.detect import detect_candidates
    from fdc_tpu.ops.fft import forward_spectrum
    from fdc_tpu.ops.framing import frame_blocks
    from fdc_tpu.utils.cplx import c2f_host, f2c
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    rng = np.random.default_rng(0)
    cfg0 = _flagship(batch_blocks=512, extract_budget=0)
    n = cfg0.batch_blocks * cfg0.inplen
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    xf = jax.device_put(jnp.asarray(c2f_host(x)))

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

    def full_variant(name, k=24, **overrides):
        fdc = FrequencyDomainChannelizer(_flagship(batch_blocks=512,
                                                   **overrides))
        run(name, fdc._device_step, fdc._jit_init(), k)
        return fdc

    # -- budget / MXU A/B on the full step ----------------------------------
    fdc16 = full_variant("full_b16", extract_budget=0)
    full_variant("full_b8", extract_budget=8)
    full_variant("full_b8_mxu", extract_budget=8, use_mxu_fft=True)
    full_variant("full_b16_mxu", extract_budget=0, use_mxu_fft=True)

    # -- detection-path split ----------------------------------------------
    sd = fdc16.segments[0]
    cfg = fdc16.config

    def front(carry, xf_in):
        xx = f2c(xf_in)
        blocks, hist = frame_blocks(xx, carry["hist"], cfg.blocksize)
        spec = forward_spectrum(blocks)
        nc = dict(carry)
        nc["hist"] = hist
        return nc, spec

    def v_cand(carry, xf_in, t0):
        # vmapped candidate detection only (no lifecycle, no extraction)
        nc, spec = front(carry, xf_in)
        power = sd.measure(spec)
        g = sd.geometry
        k = sd.max_candidates or (g.n_cells - 1)
        cs, ce, cv = jax.vmap(
            lambda p: detect_candidates(p, sd.thresh, k)
        )(power)
        return nc, {"s": cs, "e": ce, "v": cv}

    def v_lifecycle(carry, xf_in, t0):
        # measure + full scan_slots (candidates + Pallas lifecycle)
        nc, spec = front(carry, xf_in)
        power = sd.measure(spec)
        nc["seg0"], flags = sd.scan_slots(power, carry["seg0"])
        return nc, {"f": flags}

    carry0 = fdc16._jit_init()
    run("seg_cand", v_cand, carry0, 48)
    run("seg_lifecycle", v_lifecycle, carry0, 48)

    # exact mode cost (K = n_cells-1 instead of 8)
    fdc_exact = FrequencyDomainChannelizer(
        _flagship(batch_blocks=512, max_candidates=0, extract_budget=0)
    )
    sd_x = fdc_exact.segments[0]

    def v_lifecycle_exact(carry, xf_in, t0):
        nc, spec = front(carry, xf_in)
        power = sd_x.measure(spec)
        nc["seg0"], flags = sd_x.scan_slots(power, carry["seg0"])
        return nc, {"f": flags}

    run("seg_lifecycle_exact", v_lifecycle_exact, fdc_exact._jit_init(), 32)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
