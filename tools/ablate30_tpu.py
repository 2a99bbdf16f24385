"""Ablation 30: what does exact all-edges detection (max_candidates=0)
cost on the flagship and at pod shapes? (VERDICT r3 items 1 and 8.)

The packed-candidate kernel sizes its per-block work by K: the [B, 7K]
pack, the per-block [7K, 7K] transpose matmul, and the refresh-probe's
static K-loop. The old "+0.02 ms for exact mode" figure predates all of
those. Measures, on the real chip:

  (a) the full flagship step at max_candidates=8 (the round-3 bench
      mode) vs max_candidates=0 (exact, K = n_cells-1 = 31);
  (b) scan_slots alone at flagship segment shapes (S=16) for
      K in {8, exact} under dwell (refresh-only closed form) and
      Bernoulli-churn (walk-heavy) powers;
  (c) scan_slots alone at cfg5b shapes (S=128, K in {32, exact=127})
      under the same two workloads.

K sized so K*step >= 25 ms (PERFORMANCE.md); median of 15 K-vs-2K diffs.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate30_tpu.py
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
    from fdc_tpu.models.segment_detection import SegmentDetector
    from fdc_tpu.utils.cplx import c2f_host
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    B = 512
    results = {}

    def timed(step, carry, arg, k0, **kw):
        """time_scanned with K auto-sized to keep K*step >= 30 ms — the
        tiered kernel made dwell scans ~10x faster, which silently pushed
        fixed-K windows under the dispatch-jitter floor (a 0.0001 ms
        flagship reading in one run was exactly this failure)."""
        dt = time_scanned(step, carry, arg, k=k0, repeats=7, **kw)
        if dt * k0 < 0.025:
            k = int(min(4096, max(k0, 0.030 / max(dt, 1e-7))))
            dt = time_scanned(step, carry, arg, k=k, repeats=15, **kw)
        return dt

    # -- (a) full flagship step, bounded vs exact ---------------------------
    def full_step_time(fdc, k=48):
        n = B * fdc.config.inplen
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
        xf = jax.device_put(jnp.asarray(c2f_host(x)))
        carry0 = fdc._jit_init()

        def step(c, xf_in, t):
            return fdc._device_step(c, xf_in, t * jnp.int32(B))

        return timed(step, carry0, xf, k)

    for label, mc in (("k8", 8), ("exact", 0)):
        fdc = FrequencyDomainChannelizer(
            _flagship(batch_blocks=B, max_candidates=mc)
        )
        dt = full_step_time(fdc)
        results[f"flagship_{label}_step_ms"] = round(dt * 1e3, 4)
        results[f"flagship_{label}_msps"] = round(
            B * fdc.config.inplen / dt / 1e6, 1
        )
        del fdc

    # -- (b)/(c) scan-only K sweeps ------------------------------------------
    def scan_time(sd, pow_host, k_timing):
        powf = jax.device_put(jnp.asarray(pow_host))
        carry0 = jax.jit(sd.init_state)()

        def step(carry, pw, t):
            return sd.scan_slots(pw, carry)

        return timed(step, carry0, powf, k_timing, perturb_arg=0)

    def workloads(nc):
        # Bernoulli churn: strong cell toggling randomly per block (the
        # walk-heavy bound) / steady dwell: carrier present every block
        # (the refresh-only closed form's target)
        churn = (1e-6 * (1.0 + rng.random((B, nc)))).astype(np.float32)
        churn[:, 5] *= np.where(rng.random(B) > 0.5, 1e3, 1.0)
        dwell = (1e-6 * (1.0 + rng.random((B, nc)))).astype(np.float32)
        dwell[:, 5] *= 1e3
        return {"churn": churn, "dwell": dwell}

    # flagship segment: S=16, n_cells=32 -> exact K=31
    flag_seg = dict(
        segment_id=0, blocksize=4096, relinvovl=4,
        seg_start=0.41 + 0.5, seg_stop=0.49 + 0.5,  # abs freqs in [0,1)
        thresh_db=6.0, minchandist=0.005, window_flank_puffer=0.2,
        channel_deactivation_delay=0, max_slots=16,
        max_extract_width=512,
    )
    sd_probe = SegmentDetector(**flag_seg, max_candidates=8)
    nc_flag = sd_probe.geometry.n_cells
    print(f"flagship segment n_cells={nc_flag}", file=sys.stderr)
    for label, mc in (("k8", 8), ("exact", 0)):
        sd = SegmentDetector(**flag_seg, max_candidates=mc)
        for wname, pw in workloads(nc_flag).items():
            dt = scan_time(sd, pw, k_timing=192)
            results[f"scanS16_{label}_{wname}_ms"] = round(dt * 1e3, 4)

    # cfg5b-shaped segment: S=128, K=32 bounded / exact
    pod_seg = dict(
        segment_id=0, blocksize=4096, relinvovl=4,
        seg_start=0.05, seg_stop=0.275,
        thresh_db=6.0, minchandist=0.005, window_flank_puffer=0.2,
        channel_deactivation_delay=0, max_slots=128,
        max_extract_width=512,
    )
    sd_probe = SegmentDetector(**pod_seg, max_candidates=32)
    nc_pod = sd_probe.geometry.n_cells
    print(f"pod segment n_cells={nc_pod}", file=sys.stderr)
    for label, mc in (("k32", 32), ("exact", 0)):
        sd = SegmentDetector(**pod_seg, max_candidates=mc)
        for wname, pw in workloads(nc_pod).items():
            dt = scan_time(sd, pw, k_timing=64)
            results[f"scanS128_{label}_{wname}_ms"] = round(dt * 1e3, 4)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
