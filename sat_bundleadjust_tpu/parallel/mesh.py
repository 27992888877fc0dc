"""Device mesh helpers.

The reference's only parallelism is single-node multiprocessing over
images/pairs (SURVEY.md section 2.3). The TPU-native scaling axis is a
jax.sharding.Mesh: observations (tie-point blocks) are sharded over the
"obs" axis and reduced with psum over ICI; the embarrassingly parallel
feature stages shard over the same axis by image/pair."""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


OBS_AXIS = "obs"

# process-wide default-mesh override: lets an orchestrator (the pipeline's
# `distributed` knob, the driver dry run) pin every mesh-capable stage to one
# explicit device set instead of whatever jax.devices() reports first
_MESH_OVERRIDE = None


def set_default_mesh(mesh):
    """Pin (or clear, with None) the mesh used by mesh-capable stages that
    were not handed one explicitly (feature_shard.default_mesh_or_none,
    dist_solver.run_distributed_ba)."""
    global _MESH_OVERRIDE
    _MESH_OVERRIDE = mesh


def get_default_mesh():
    return _MESH_OVERRIDE


def make_mesh(n_devices=None, devices=None):
    if devices is None and n_devices is None and _MESH_OVERRIDE is not None:
        return _MESH_OVERRIDE
    """1-D mesh over the available devices (axis name "obs")."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (OBS_AXIS,))


def replicated(mesh):
    return NamedSharding(mesh, P())


def sharded_leading(mesh):
    return NamedSharding(mesh, P(OBS_AXIS))


def global_put(x, sharding):
    """Place a host array onto the mesh under `sharding`, working in both
    single-controller and multi-process (jax.distributed) deployments.

    Single process: plain device_put. Multi-process: build the global jax.Array
    from a callback — the callback is only invoked for this process's
    addressable shards, so each host materializes (and transfers) exactly its
    local slice of the data. This is the TPU-native analog of the reference's
    per-worker npy-file exchange (ft_s2p.py:123-124): data stays host-local,
    the global array is the shared handle."""
    import jax.numpy as jnp

    x = jnp.asarray(x) if jax.process_count() == 1 else np.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def global_put_rows(local_rows, owned, n_shards, sharding):
    """Materialize a leading-dim-sharded global array from ONLY this
    process's rows (per-host assembly, SURVEY §5.8).

    local_rows: (len(owned), ...) host data for the shard rows listed in
    `owned` (global indices, in local_rows order); the global array is
    (n_shards, ...). Unlike global_put, no process ever holds the full
    array — host RSS scales with the owned share. Single-process runs
    (owned == all rows, in order) reduce to a plain sharded device_put."""
    import jax.numpy as jnp

    local_rows = np.asarray(local_rows)
    owned = np.asarray(owned)
    shape = (int(n_shards),) + local_rows.shape[1:]
    if jax.process_count() == 1 and len(owned) == n_shards and np.array_equal(
            owned, np.arange(n_shards)):
        return jax.device_put(jnp.asarray(local_rows), sharding)
    pos = {int(s): k for k, s in enumerate(owned)}

    def cb(idx):
        r = idx[0]
        r0 = 0 if r.start is None else r.start
        r1 = shape[0] if r.stop is None else r.stop
        rows = np.stack([local_rows[pos[s]] for s in range(r0, r1)])
        return rows[(slice(None),) + tuple(idx[1:])]

    return jax.make_array_from_callback(shape, sharding, cb)
