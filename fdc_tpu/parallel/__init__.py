"""Multi-device distribution: meshes, sharded steps, history exchange,
and the MPMD batch pipeline."""

from fdc_tpu.parallel.mesh import make_mesh, TIME_AXIS, CHAN_AXIS
from fdc_tpu.parallel.pipeline import PipelineChannelizer
from fdc_tpu.parallel.sharded import ShardedChannelizer

__all__ = [
    "make_mesh",
    "TIME_AXIS",
    "CHAN_AXIS",
    "PipelineChannelizer",
    "ShardedChannelizer",
]
