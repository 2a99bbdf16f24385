"""Multi-device distribution: meshes, sharded steps, history exchange."""

from fdc_tpu.parallel.mesh import make_mesh, TIME_AXIS, CHAN_AXIS
from fdc_tpu.parallel.sharded import ShardedChannelizer

__all__ = ["make_mesh", "TIME_AXIS", "CHAN_AXIS", "ShardedChannelizer"]
