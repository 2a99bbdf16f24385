"""Host-side emission-layer throughput: Python replay vs the C++ engine.

The device bench (bench.py) keeps outputs on device (checksum-reduced
in-jit); in deployment every step's flags + compacted extraction rows
cross to the host and are replayed into PDU events by an emitter
(fdc_tpu/runtime/emission.py — the functional analog of the reference's
emit_channel path, reference: lib/SegmentDetection_impl.cc:437-539).
This tool measures that host path ALONE at pod scale (BASELINE config-5
shape: 512 slots), so the emitter can be shown to keep up with the
device rate.

Pure numpy + the native engine — runs anywhere, no jax involved.

Run: PYTHONPATH=/root/repo python tools/bench_host_emission.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fdc_tpu.models.segment_detection import SegmentDetector
from fdc_tpu.runtime.emission import SegmentDetectionEmitter


def synth_step(rng, s, b, e, w_cap, n_live, step_idx):
    """One step's numpy outputs: n_live bursts, each fully contained in
    the step — activated at a staggered block, processed for ~half the
    batch, finalized with an emit flag (the layout SegmentDetector.step
    ships). Long enough to trigger maxblocks partial emissions too."""
    activated = np.zeros((s, b), bool)
    processed = np.zeros((s, b), bool)
    emit = np.zeros((s, b), bool)
    phase_used = rng.integers(0, 4, (s, b)).astype(np.int32)

    for sl in range(n_live):
        a = sl % max(1, b // 4)
        end = a + b // 2
        activated[sl, a] = True
        processed[sl, a + 1: end] = True
        emit[sl, end] = True

    ext_start = 100 + 8 * np.arange(s, dtype=np.int64)
    wlog2 = np.full(s, 6, np.int64)  # width 64 per slot
    order = np.arange(s, dtype=np.int64) + step_idx * s

    touched = activated.any(1) | processed.any(1) | emit.any(1)
    needy = np.flatnonzero(touched)
    ids = needy[:e].astype(np.int64)
    slot_ids = np.full(e, s, np.int64)  # sentinel = unused row
    slot_ids[: len(ids)] = ids
    extract = (
        rng.standard_normal((e, b + 1, w_cap)).astype(np.float32)
        + 1j * rng.standard_normal((e, b + 1, w_cap)).astype(np.float32)
    ).astype(np.complex64)

    return {
        "activated": activated,
        "processed": processed,
        "emit": emit,
        "phase_used": phase_used,
        "extract": extract,
        "slot_ids": slot_ids,
        "ext_overflow": np.int32(max(0, len(needy) - e)),
        "slot_meta": {
            "ext_start": ext_start,
            "wlog2": wlog2,
            "order": order,
        },
    }


def run(emitter_cls, det, steps, maxblocks, b, n_live=32):
    em = emitter_cls(det, maxblocks, None, True)
    rng = np.random.default_rng(0)
    # pre-generate the synthetic steps so the timed loop measures the
    # emitter alone, not the generator
    outs = [
        synth_step(rng, det.max_slots, b, det.extract_budget, 512,
                   n_live=n_live, step_idx=i)
        for i in range(steps)
    ]
    n_ev = 0
    t0 = time.perf_counter()
    for i, out in enumerate(outs):
        n_ev += len(em.process_step(out, out["slot_meta"], i * b))
    dt = time.perf_counter() - t0
    return dt / steps, n_ev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=512)
    ap.add_argument("--budget", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=512)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--maxblocks", type=int, default=128)
    args = ap.parse_args()

    det = SegmentDetector(
        0, 4096, 4, 0.1, 0.9, 10.0, 0.005, 0.2,
        max_slots=args.slots, max_candidates=8, max_extract_width=512,
        extract_budget=args.budget,
    )

    variants = [("python", SegmentDetectionEmitter)]
    try:
        from fdc_tpu.runtime import native
        from fdc_tpu.runtime.emission import NativeSegmentDetectionEmitter

        if native.available():
            variants.append(("native", NativeSegmentDetectionEmitter))
    except Exception as e:
        print(f"native engine unavailable: {e!r}", file=sys.stderr)

    # device-equivalent rate for context: blocks/step * inplen samples
    inplen = 4096 - 4096 // 4
    for name, cls in variants:
        dt, n_ev = run(cls, det, args.steps, args.maxblocks, b=args.blocks)
        print(
            f"{name:>7}: {dt * 1e3:8.2f} ms/step "
            f"({args.blocks / dt:9.0f} blocks/s, "
            f"{args.blocks * inplen / dt / 1e6:8.0f} MS/s-equivalent, "
            f"{n_ev} events total)"
        )


if __name__ == "__main__":
    main()
