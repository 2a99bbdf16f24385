"""Ablation 35: cfg5 adversarial-churn scan terms with a 4-way segment
split (VERDICT r4 item 5's model leg).

Round 4's wall: cfg5's single 512-slot segment cannot multi-own — one
automaton, churn B = 0.234 ms caps eff(8) at ~0.43. The split transform
(config.segment_splits) turns it into 4 independent 128-slot parts with
overlap margins + cut reconciliation, so the pipeline's multi-owner
scans apply. This measures, under the same Bernoulli-churn bound as
ablate32 (toggling carrier per part core):

  - B_churn_split_all: single-owner stage B of the split config (all 4
    part scans fused in one kernel, INCLUDING the reconcile/suppress
    pre-pass) vs round-4's unsplit 0.234,
  - B_churn_split_own: ONE part's group scan alone (the multi-owner
    per-owner term, including its reconcile against neighbor views),
  - the reconcile pre-pass marginal (split scan with reconcile vs the
    same scan with the foreign views forced empty).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate35_tpu.py
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
    from fdc_tpu.parallel.pipeline import PipelineChannelizer
    from fdc_tpu.utils.profiling import time_scanned

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    B = 512
    results = {}

    def timed(step, carry, arg, k0, **kw):
        dt = time_scanned(step, carry, arg, k=k0, repeats=7, **kw)
        if dt * k0 < 0.025:
            k = int(min(4096, max(k0, 0.030 / max(dt, 1e-7))))
            dt = time_scanned(step, carry, arg, k=k, repeats=15, **kw)
        return dt

    base = dict(
        blocksize=4096, relinvovl=4,
        activity_detection_segments=[(-0.45, 0.45)],
        act_det_threshold=6.0, minchandist=0.005,
        max_candidates=32, max_extract_width=512,
        extract_width_split=64,
        freqmode="normalized", batch_blocks=512,
    )
    # split cfg5: 4 parts x 128 slots (vs one 512-slot segment); per-part
    # budgets match cfg5b's per-segment budgets
    cfg_s = ChannelizerConfig(
        **base, max_slots=128, extract_budget=2, extract_budget_narrow=8,
        segment_splits=[(0, 4, 2)],
    )
    plain = FrequencyDomainChannelizer(cfg_s)
    assert len(plain.segments) == 4

    def churn_powers(sd):
        """Bernoulli-toggling carrier in THIS part's core (structural
        events every few blocks — the adversarial bound)."""
        nc = sd.geometry.n_cells
        p = (1e-6 * (1.0 + rng.random((B, nc)))).astype(np.float32)
        lo, hi = sd.core_bins
        g = sd.geometry
        mid_cell = ((lo + hi) // 2 - g.start) // g.decimation
        p[:, mid_cell] *= np.where(rng.random(B) > 0.5, 1e3, 1.0)
        return jnp.asarray(p)

    churn_packed = [
        jax.jit(sd._packed_candidates)(churn_powers(sd))[0]
        for sd in plain.segments
    ]

    # -- single-owner split stage B (reconcile + 4-part fused scans) -------
    pipe = PipelineChannelizer(cfg_s, devices=jax.devices()[:1])
    carry0 = pipe._jit_init()

    def stage_b(c, sk, t):
        nc_, sc = pipe._jit_scan(c, None, sk)
        return nc_, sc

    dt = timed(stage_b, carry0, list(churn_packed), 64, perturb_arg=None)
    results["B_churn_split_all_ms"] = round(dt * 1e3, 4)

    # -- reconcile marginal: same scans, reconcile disabled ----------------
    neigh = dict(plain._split_neighbors)

    def scan_noreconcile(c, sk, t):
        carry = dict(c)
        plain._split_neighbors = {}
        try:
            scans = plain._scan_detections(carry, None, list(sk))
        finally:
            plain._split_neighbors = neigh
        return carry, scans

    # (trace-time toggle: the two step functions are separate jits)
    dt = timed(
        jax.jit(scan_noreconcile), carry0, list(churn_packed), 64,
        perturb_arg=None,
    )
    results["B_churn_split_noreconcile_ms"] = round(dt * 1e3, 4)
    results["reconcile_marginal_ms"] = round(
        results["B_churn_split_all_ms"]
        - results["B_churn_split_noreconcile_ms"], 4
    )

    # -- per-owner term: ONE part's group scan (with neighbor views) -------
    pipe4 = PipelineChannelizer(
        cfg_s, devices=[jax.devices()[0]] * 4, scan_owners=4,
    )
    assert pipe4._owner_groups and len(pipe4._owner_groups) == 4
    (odev, ids) = pipe4._owner_groups[1]  # a middle part (two neighbors)
    fn = pipe4._jit_scan_groups[1]
    i = ids[0]
    lo, hi = neigh[i]
    st_all = pipe4._jit_init()
    views = {
        j: tuple(
            st_all[f"seg{j}"][k]
            for k in ("det_start", "det_stop", "active", "tomb")
        )
        for j in neigh
    }
    foreign = {0: (views[lo] if lo is not None else None,
                   views[hi] if hi is not None else None)}

    def own_scan(c, sk, t):
        outs, _ = fn((c,), (sk,), None, None, foreign)
        return outs[0][0], outs[0][1]

    dt = timed(
        own_scan, st_all[f"seg{i}"], churn_packed[i], 64, perturb_arg=None
    )
    results["B_churn_split_own_ms"] = round(dt * 1e3, 4)

    # -- calibration: UNSPLIT cfg5 under the same 1x and 4x churn ---------
    cfg_u = ChannelizerConfig(
        **base, max_slots=512, extract_budget=8, extract_budget_narrow=32,
    )
    plain_u = FrequencyDomainChannelizer(cfg_u)
    sd_u = plain_u.segments[0]
    pipe_u = PipelineChannelizer(cfg_u, devices=jax.devices()[:1])
    carry_u = pipe_u._jit_init()

    def churn_u(n_spots):
        nc = sd_u.geometry.n_cells
        p = (1e-6 * (1.0 + rng.random((B, nc)))).astype(np.float32)
        for s in range(n_spots):
            cell = (nc * (2 * s + 1)) // (2 * n_spots)
            p[:, cell] *= np.where(rng.random(B) > 0.5, 1e3, 1.0)
        return jnp.asarray(p)

    def stage_b_u(c, sk, t):
        nc_, sc = pipe_u._jit_scan(c, None, sk)
        return nc_, sc

    for n_spots in (1, 4):
        pk = [jax.jit(sd_u._packed_candidates)(churn_u(n_spots))[0]]
        dt = timed(stage_b_u, carry_u, pk, 64, perturb_arg=None)
        results[f"B_churn_unsplit_{n_spots}car_ms"] = round(dt * 1e3, 4)

    # -- realistic busy: one part under 4 DWELLING carriers (refresh-only
    # closed forms apply — the multi-owner win case) ----------------------
    sd1 = plain.segments[1]

    def dwell_powers(sd):
        nc = sd.geometry.n_cells
        p = (1e-6 * (1.0 + rng.random((B, nc)))).astype(np.float32)
        for s in range(4):
            p[:, (nc * (2 * s + 1)) // 8] *= 1e3
        return jnp.asarray(p)

    pk1 = jax.jit(sd1._packed_candidates)(dwell_powers(sd1))[0]

    def own_scan_dwell(c, sk, t):
        outs, _ = fn((c,), (sk,), None, None, foreign)
        return outs[0][0], outs[0][1]

    dt = timed(
        own_scan_dwell, st_all[f"seg{ids[0]}"], pk1, 64, perturb_arg=None
    )
    results["B_dwell_split_own_ms"] = round(dt * 1e3, 4)

    # -- model: cfg5 split at 8 devices, 4 dedicated owners + 4 workers ---
    # (A, C, plain-busy from ablate32's cfg5 rows; quoted here for the
    # PERFORMANCE.md model — rerun ablate32 for fresh values)
    a_c = 0.726
    plain_busy = 0.803
    b_own = results["B_churn_split_own_ms"]
    x_rate = min(4 / a_c, 1.0 / max(b_own, 1e-6))
    results["model_eff8_dedicated4own"] = round(x_rate * plain_busy / 8, 3)
    # 2 owners x 2 parts each + 6 workers
    x_rate2 = min(6 / a_c, 1.0 / max(2 * b_own, 1e-6))
    results["model_eff8_dedicated2own"] = round(
        x_rate2 * plain_busy / 8, 3
    )
    # dwell (realistic busy), SHARED owners: all 8 devices extract, 4 of
    # them also own one part. Balancing extraction shares s (owners) / w
    # (workers) so device times equalize: w - s = B_own/(A+C),
    # 4s + 4w = 1; batch period = w*(A+C).
    b_dw = results["B_dwell_split_own_ms"]
    w_share = (1.0 + 4 * b_dw / a_c) / 8.0
    results["model_eff8_dwell_shared"] = round(
        plain_busy / (8 * w_share * a_c), 3
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
