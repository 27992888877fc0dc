"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver environment boots every interpreter through an axon
sitecustomize that registers a tunneled-TPU PJRT plugin and force-sets
jax_platforms="axon,cpu" (overriding the JAX_PLATFORMS env var). Tests must
run on the virtual CPU mesh: per-op dispatch over the TPU tunnel is orders
of magnitude slower, and the tunneled TPU's float64 transcendentals are only
float32-accurate. So we re-override the config before any backend is used.

The 8 virtual CPU devices let the multi-device sharding tests (distributed
Schur solver) execute without TPU hardware, mirroring how the driver
dry-runs the multi-chip path.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
