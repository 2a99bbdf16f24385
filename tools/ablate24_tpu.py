"""Ablation 24: fused multi-segment lifecycle kernel vs per-segment kernels.

Round-3 scaling gap (PERFORMANCE.md "Scaling model"): the cfg5b burst
hunter's four per-segment lifecycle scans cost ~0.72 ms of the 0.97 ms
step under BUSY powers — four back-to-back latency-bound Pallas kernels.
scan_slots_multi fuses all segments into ONE kernel invocation whose
per-block bodies are mutually independent (ILP on one serial chain).

This driver times, on the real chip, at cfg5b shapes (4 segments x 128
slots, K=32, band/4 cells, B=512, busy powers — a strong cell toggling
every other block, the scaling model's upper-bound workload):

  A  per-segment: 4 sequential sd.scan_slots calls (the round-2 route)
  B  fused:       one scan_slots_multi call
  plus the full cfg5b step on noise input (sparse bound) and on busy
  input (the step now calls scan_slots_multi internally, so its time IS
  the fused routing).

Measured 2026-08-19 across the three kernel variants (PERFORMANCE.md):
per-segment-branchy fused 0.77 (vs 0.82 A — pl.when regions are Mosaic
scheduling barriers), fully-branchless 0.62 busy but noise step 0.97 ->
1.36 (noise-candidate chunks walk all blocks full-body), shipped hybrid
(global idle gate + branchless bodies) 0.56 busy / 1.01 noise step.

K sized so K*step >= 25 ms (PERFORMANCE.md); median of 15 K-vs-2K diffs.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate24_tpu.py
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

    from fdc_tpu.config import ChannelizerConfig
    from fdc_tpu.models.channelizer import FrequencyDomainChannelizer
    from fdc_tpu.models.segment_detection import scan_slots_multi
    from fdc_tpu.utils.cplx import c2f_host
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)

    B = 512
    seg_kw = dict(
        blocksize=4096, relinvovl=4,
        act_det_threshold=6.0, minchandist=0.005,
        max_slots=128, max_candidates=32, max_extract_width=512,
        extract_budget=2, extract_width_split=64, extract_budget_narrow=8,
        freqmode="normalized", batch_blocks=B,
    )
    quarters = [(-0.45, -0.225), (-0.225, 0.0), (0.0, 0.225), (0.225, 0.45)]

    fdc4 = FrequencyDomainChannelizer(ChannelizerConfig(
        activity_detection_segments=quarters, **seg_kw))
    sds = fdc4.segments

    rng = np.random.default_rng(0)
    # busy powers: noise floor + a strong cell toggling every other block
    # (same workload as ablate21's l_scan measurement)
    nc = sds[0].geometry.n_cells
    pow_host = (1e-6 * (1.0 + rng.random((B, nc)))).astype(np.float32)
    pow_host[:, 5] *= np.where(rng.random(B) > 0.5, 1e3, 1.0)
    powf = jax.device_put(jnp.asarray(pow_host))

    def step_per_segment(carry, pw, t):
        new, outs = [], []
        for i in range(4):
            ns, flags = sds[i].scan_slots(pw, carry[i])
            new.append(ns)
            outs.append(flags)
        return tuple(new), outs

    def step_fused(carry, pw, t):
        res = scan_slots_multi(sds, (pw,) * 4, carry)
        return tuple(ns for ns, _ in res), [fl for _, fl in res]

    results = {}
    carry0 = tuple(jax.jit(sds[i].init_state)() for i in range(4))
    for name, fn in (("A_per_segment", step_per_segment),
                     ("B_fused", step_fused)):
        dt = time_scanned(fn, carry0, powf, k=96, repeats=15, perturb_arg=0)
        results[f"{name}_4seg_scan_ms"] = round(dt * 1e3, 4)

    # full cfg5b step (routes through scan_slots_multi since round 3):
    # noise input (spurious scattered candidates — the sparse bound) and
    # busy input (one strong carrier per segment toggling every other
    # block — the scaling model's upper-bound workload)
    n = B * fdc4.config.inplen
    fcarry0 = fdc4._jit_init()

    def step(c, xf_in, t):
        return fdc4._device_step(c, xf_in, t * jnp.int32(B))

    noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    ) * 0.01
    t_samp = np.arange(n)
    block_of = t_samp // fdc4.config.inplen
    gate = (block_of % 2 == 0).astype(np.float32)
    busy = noise.copy()
    for fc in (-0.3375, -0.1125, 0.1125, 0.3375):  # quarter centers
        busy += (2.0 * gate * np.exp(2j * np.pi * fc * t_samp)).astype(
            np.complex64
        )
    for name, x in (("noise", noise), ("busy", busy)):
        xf = jax.device_put(jnp.asarray(c2f_host(x)))
        dt4 = time_scanned(step, fcarry0, xf, k=32, repeats=15)
        results[f"cfg5b_4seg_step_{name}_ms"] = round(dt4 * 1e3, 4)
        results[f"cfg5b_msps_{name}"] = round(
            B * fdc4.config.inplen / dt4 / 1e6, 1
        )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
