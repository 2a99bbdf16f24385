"""Ablation 27: where does the scan+plans stage's time actually go?

ablate26 measured the two Pallas scan kernels at ~2 us under the bench
workload, yet ablate25's stage B (pipe_scan = scan_flags +
scan_slots_multi + extract_plan + flag transposes + dict assembly) reads
~24 us — and it was timed at k=96, a 2.3 ms window, BELOW the >=25 ms
dispatch-jitter floor this repo prescribes. This driver re-times the
stage at k=1024 (a ~25 ms window per repeat) and decomposes it
additively:

  S0  the two scan kernels only (powact scan_flags + sd.scan_slots,
      which includes _free_tombstones)
  S1  S0 + extract_plan (argsort-based compaction)
  S1b S0 + a sort-free extract_plan variant (prefix-sum ranks +
      one-hot-matmul inverse permutation)
  S2  the full _scan_detections (adds the four [B, S] flag transposes
      and the slot_meta/plan dict assembly)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate27_tpu.py
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
    pa_pow = jax.device_put(pa_pow)
    packed = jax.device_put(jax.jit(sd._packed_candidates)(seg_pow)[0])

    carry0 = {
        "powact": jax.jit(pa.init_state)(),
        "seg0": jax.jit(sd.init_state)(),
    }

    def plan_rank_free(got, processed):
        """Sort-free extract_plan: needy-first stable compaction via
        prefix-sum ranks + a one-hot inverse permutation (no argsort)."""
        s = sd.max_slots
        e = sd.extract_budget
        need = jnp.any(got | processed, axis=0)  # [S]
        n_need = jnp.sum(need.astype(jnp.int32))
        rank_needy = jnp.cumsum(need.astype(jnp.int32)) - 1
        rank_idle = n_need + jnp.cumsum((~need).astype(jnp.int32)) - 1
        pos = jnp.where(need, rank_needy, rank_idle)  # [S] target position
        # inverse permutation: ids[p] = s with pos[s] == p (one-hot matmul)
        onehot = (
            pos[None, :] == jnp.arange(s, dtype=jnp.int32)[:, None]
        ).astype(jnp.float32)  # [S, S]
        ids = jnp.dot(
            onehot, jnp.arange(s, dtype=jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        overflow = jnp.maximum(n_need - jnp.int32(e), 0)
        return ids[:e], overflow

    def make_step(level, plan_fn):
        def step(carry, pp, pk, t):
            carry = dict(carry)
            carry["powact"], pflags = pa.scan_flags(pp, carry["powact"])
            seg_state, (got, processed, emit_now, phase_used) = (
                sd.scan_slots(None, carry["seg0"], packed=pk)
            )
            carry["seg0"] = seg_state
            out = {"pflags": pflags, "got": got, "processed": processed,
                   "emit": emit_now, "pu": phase_used}
            if level >= 1:
                slot_ids, overflow = plan_fn(got, processed)
                out["slot_ids"] = slot_ids
                out["overflow"] = overflow
            if level >= 2:
                out["got"] = got.T
                out["processed"] = processed.T
                out["emit"] = emit_now.T
                out["pu"] = phase_used.T
                out["slot_meta"] = {
                    "ext_start": seg_state["ext_start"],
                    "wlog2": seg_state["wlog2"],
                    "order": seg_state["order"],
                }
            return carry, out

        return step

    results = {}
    cases = [
        ("S0_scans_only_ms", make_step(0, None)),
        ("S1_plus_plan_ms", make_step(1, sd.extract_plan)),
        ("S1b_plus_rankplan_ms", make_step(1, plan_rank_free)),
        ("S2_full_scan_stage_ms", make_step(2, sd.extract_plan)),
    ]
    for name, step in cases:
        dt = time_scanned(
            step, carry0, pa_pow, packed, k=1024, repeats=15, perturb_arg=0
        )
        results[name] = round(dt * 1e3, 4)
        print(name, results[name], file=sys.stderr)

    # cross-check the two plan variants agree on this workload
    c = dict(carry0)
    _, o_sort = jax.jit(make_step(1, sd.extract_plan))(
        c, pa_pow, packed, 0
    )
    _, o_rank = jax.jit(make_step(1, plan_rank_free))(
        c, pa_pow, packed, 0
    )
    results["plans_equal"] = bool(
        np.array_equal(np.asarray(o_sort["slot_ids"]),
                       np.asarray(o_rank["slot_ids"]))
        and int(o_sort["overflow"]) == int(o_rank["overflow"])
    )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
