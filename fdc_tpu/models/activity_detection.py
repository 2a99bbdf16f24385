"""Multi-segment activity-detection channelizer.

TPU-native rebuild of activity_detection_channelizer_vcm
(reference: lib/activity_detection_channelizer_vcm_impl.cc): several
detection segments sharing one FFT-block stream, one threshold, one
decimation factor and one window table. The reference fans segments out as
std::threads per block (reference:
lib/activity_detection_channelizer_vcm_impl.cc:293-304); here each segment
is an independent batched SegmentDetector sub-graph inside one jitted step —
XLA schedules them concurrently, and the parallel layer can shard them over
a mesh `chan` axis.

Detection math per segment is identical to SegmentDetection up to the
reference's cosmetic 1/decimation power normalization
(lib/activity_detection_channelizer_vcm_impl.cc:630-650), which cancels in
the edge ratios and is omitted; segment geometry uses the vcm rounding rules
(config.solve_segment_vcm).
"""

from __future__ import annotations

from typing import List

import jax

from fdc_tpu.config import solve_segment_vcm
from fdc_tpu.models.segment_detection import SegmentDetector

__all__ = ["ActivityDetectionChannelizer"]


class ActivityDetectionChannelizer:
    """Bank of detection segments with shared configuration.

    Mirrors the reference constructor parameter set
    (reference: include/FDC/activity_detection_channelizer_vcm.h make(...)):
    blocklen, segments [[start, stop] in FDC coords], thresh (dB), relinvovl,
    minchandist, channel_deactivation_delay, window_flank_puffer.
    """

    def __init__(
        self,
        blocklen: int,
        segments,  # [[start, stop]] in FDC [0,1) coordinates
        thresh_db: float,
        relinvovl: int,
        minchandist: float,
        channel_deactivation_delay: int = 1,
        window_flank_puffer: float = 0.2,
        max_slots: int = 32,
        max_candidates: int = 16,
        max_extract_width: int = 0,
    ):
        if blocklen < 2 or blocklen & (blocklen - 1):
            raise ValueError("Blocklen invalid (must be a power of 2 >= 2)")
        self.blocklen = blocklen
        self.segments: List[SegmentDetector] = []
        for i, (a, b) in enumerate(segments):
            geo = solve_segment_vcm(blocklen, float(a), float(b), minchandist)
            self.segments.append(
                SegmentDetector(
                    i,
                    blocklen,
                    relinvovl,
                    float(a),
                    float(b),
                    thresh_db,
                    minchandist,
                    window_flank_puffer,
                    channel_deactivation_delay,
                    max_slots,
                    max_candidates,
                    max_extract_width,
                    geometry=geo,
                )
            )

    def init_state(self):
        return [sd.init_state() for sd in self.segments]

    def step(self, spec_ext: jax.Array, states):
        """Run all segments over one [B+1, N] spectrum batch.

        Returns (new_states, outputs) as parallel lists — each entry the
        corresponding SegmentDetector's result.
        """
        new_states, outs = [], []
        for sd, st in zip(self.segments, states):
            ns, o = sd.step(spec_ext, st)
            new_states.append(ns)
            outs.append(o)
        return new_states, outs
