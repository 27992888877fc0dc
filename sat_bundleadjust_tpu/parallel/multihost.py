"""Multi-process (multi-host) deployment of the distributed solver.

The reference's parallel story ends at single-node multiprocessing with the
filesystem as transport (SURVEY.md section 5.8; ft_match.py:342-393,
ft_s2p.py:97-124). The TPU-native story is single-program multi-controller
JAX: every host runs the same script, `initialize()` wires it into the
global runtime (coordination service + ICI/DCN collectives), a
jax.sharding.Mesh spans ALL hosts' devices, and the solver of
parallel/dist_solver.py works unchanged — its shard_mapped while_loop
compiles to one SPMD program per host, camera reductions ride psum over
ICI within a slice and DCN across hosts.

Per-host data: parallel/mesh.global_put materializes only the calling
process's addressable shards, so each host loads/keeps only its slice of
the observation table (the analog of per-worker npy caches). Use
`local_shard_ids(mesh)` to decide which tracks/geotiffs a host should
even read from disk.

Tested with 2 CPU processes in tests/test_multihost.py (the driver's
virtual-device trick cannot simulate multiple *processes*, so the test
actually spawns them).
"""

import os

import jax
import numpy as np


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               local_device_ids=None):
    """Wire this process into a multi-controller JAX deployment.

    Thin wrapper over jax.distributed.initialize with env-var defaults
    (JAX's own auto-detection handles TPU pods; for manual/CPU bring-up set
    SATBA_COORDINATOR / SATBA_NUM_PROCESSES / SATBA_PROCESS_ID or pass
    explicitly). No-op when num_processes == 1 and nothing is configured."""
    coordinator_address = coordinator_address or os.environ.get("SATBA_COORDINATOR")
    if num_processes is None and "SATBA_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["SATBA_NUM_PROCESSES"])
    if process_id is None and "SATBA_PROCESS_ID" in os.environ:
        process_id = int(os.environ["SATBA_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single-process deployment
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def is_main_process():
    """True on the process that should own shared-filesystem outputs
    (adjusted RPCs, figures, logs). Every process computes the same results
    (SPMD), so gating writes on one process only avoids write races."""
    return jax.process_index() == 0


def barrier(name="satba"):
    """Block until every process reaches this point (no-op single-process).

    Used to sequence per-host file IO through a shared filesystem: e.g.
    all hosts finish writing their own feature npy caches before any host
    reads another host's files — the reference's Pool.join() analog
    (ft_s2p.py:119-124)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def partition_by_process(n_items, mesh=None):
    """Indices of the items (images / stereo pairs) THIS process should
    load and compute. Items are dealt round-robin over the mesh's device
    rows and owned through local_shard_ids, so item ownership follows the
    observation-shard layout (per-host IO, SURVEY.md section 5.8: host-side
    data loading stays per-host)."""
    if jax.process_count() == 1:
        return list(range(n_items))
    if mesh is None:
        from sat_bundleadjust_tpu.parallel.mesh import get_default_mesh, make_mesh

        mesh = get_default_mesh() or make_mesh()
    own_rows = set(local_shard_ids(mesh))
    n_rows = int(mesh.devices.size)
    return [i for i in range(n_items) if (i % n_rows) in own_rows]


def local_shard_ids(mesh):
    """Indices along the mesh's leading ("obs") axis whose devices belong to
    this process — i.e. which observation shards this host must load."""
    devs = mesh.devices.reshape(-1)
    pid = jax.process_index()
    return [i for i, d in enumerate(devs) if d.process_index == pid]


def shard_observations_local(pts_ind, cam_ind, pts2d, weights, n_pts, mesh,
                             n_cam=None):
    """Host-side shard planning for a multi-process run.

    Every process computes the same deterministic partition plan (the
    index arrays are small host metadata), but only this process's shard
    rows are MATERIALIZED (shard_observations owned_shards) — host RSS
    scales with the owned share; parallel/mesh.global_put_rows assembles
    the global sharded arrays. local_ids reports which shard rows those
    are, so callers can e.g. prefetch only the matching feature files."""
    from sat_bundleadjust_tpu.parallel.dist_solver import shard_observations

    n_shards = int(np.prod(mesh.devices.shape))
    local_ids = local_shard_ids(mesh)
    sharded = shard_observations(pts_ind, cam_ind, pts2d, weights, n_pts,
                                 n_shards, n_cam=n_cam,
                                 owned_shards=local_ids)
    return sharded, local_ids
