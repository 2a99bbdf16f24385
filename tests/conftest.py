"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated on forced host-platform devices
(no TPU needed); numerics are identical to the TPU path modulo fp32 FFT
rounding, which tests bound with explicit tolerances.

Note: the environment pre-imports jax via sitecustomize, so platform
selection must go through jax.config (env vars are read too early).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
