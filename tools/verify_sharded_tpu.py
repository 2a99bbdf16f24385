"""Verify flow: the SHARDED step (shard_map + ppermute + pallas kernels +
native emission) end-to-end on the real TPU chip, 1x1 mesh.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_sharded_tpu.py
Measured 2026-08-17: throughput amp 1.001, burst + detection events emitted.
"""
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from fdc_tpu.config import ChannelizerConfig
from fdc_tpu.parallel.mesh import make_mesh
from fdc_tpu.parallel.sharded import ShardedChannelizer

cfg = ChannelizerConfig(
    blocksize=1024,
    relinvovl=4,
    throughput_channels=[(-0.2, 0.05), (0.3, 0.05)],
    activity_controlled_channels=[(0.1, 0.04)],
    activity_detection_segments=[(-0.45, -0.25)],
    freqmode="basebandfs",
    batch_blocks=8,
    max_slots=8,
    max_candidates=8,
)
fdc = ShardedChannelizer(cfg, mesh=make_mesh(n_time=1, n_chan=1))
n = 2 * fdc.batch_samples
t = np.arange(n)
rng = np.random.default_rng(0)
x = (np.exp(2j * np.pi * -0.2 * t)
     + 0.02 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
     ).astype(np.complex64)
m = np.zeros(n)
m[4 * cfg.inplen: 12 * cfg.inplen] = 1.0
x += (2.0 * m * np.exp(2j * np.pi * 0.1 * t)).astype(np.complex64)
x += (2.0 * m * np.exp(2j * np.pi * -0.35 * t)).astype(np.complex64)

res = fdc.process(x)
amp = float(np.abs(res.throughput[0][300:]).mean())
print(f"blocks={res.blocks_processed} events={len(res.events)} amp={amp:.3f}")
assert abs(amp - 1.0) < 0.07
assert any(e.finalized for e in res.events)
print("sharded-on-TPU OK")
