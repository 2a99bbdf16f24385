"""Device mesh construction for the channelizer.

The framework distributes over a 2-D logical mesh with axes

- ``"time"``  — consecutive runs of FFT blocks (the data/sequence-parallel
  axis; the overlap-save history handoff between neighboring time shards
  rides :func:`jax.lax.ppermute` over ICI),
- ``"chan"``  — channel groups: throughput/burst channel rows and dynamic
  detection slots (the model-parallel axis).

The reference has no distribution of any kind — its concurrency is one
std::thread per GNU Radio block plus optional per-segment / per-channel
threads (reference: lib/activity_detection_channelizer_vcm_impl.cc:293-304,
lib/SegmentDetection_impl.cc:367-397); both are subsumed by these two mesh
axes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "TIME_AXIS", "CHAN_AXIS"]

TIME_AXIS = "time"
CHAN_AXIS = "chan"


def make_mesh(
    n_time: Optional[int] = None,
    n_chan: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (time, chan) mesh over the given (default: all) devices.

    With only ``n_chan`` given, the time axis takes all remaining devices.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if n_chan < 1:
        raise ValueError(f"n_chan must be >= 1, got {n_chan}")
    if n_time is None:
        n_time = len(devices) // n_chan
    if n_time < 1:
        raise ValueError(f"n_time must be >= 1, got {n_time}")
    need = n_time * n_chan
    if need > len(devices):
        raise ValueError(
            f"mesh {n_time}x{n_chan} needs {need} devices, "
            f"have {len(devices)}"
        )
    grid = np.array(devices[:need], dtype=object).reshape(n_time, n_chan)
    return Mesh(grid, (TIME_AXIS, CHAN_AXIS))
