"""Worker script for the 2-process jax.distributed CPU test.

Run by tests/test_multihost.py as:
    python _multihost_worker.py <process_id> <num_processes> <coordinator>
Each process gets 2 virtual CPU devices (XLA_FLAGS set by the parent), so
the global mesh spans num_processes * 2 devices across process boundaries.
"""

import os
import sys

proc_id = int(sys.argv[1])
nproc = int(sys.argv[2])
coord = sys.argv[3]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon sitecustomize force-sets jax_platforms="axon,cpu"; this test is
# CPU-only multi-process
jax.config.update("jax_platforms", "cpu")

from sat_bundleadjust_tpu.parallel import multihost

multihost.initialize(coordinator_address=coord, num_processes=nproc, process_id=proc_id)

import numpy as np

from sat_bundleadjust_tpu.parallel.dist_solver import run_distributed_ba
from sat_bundleadjust_tpu.parallel.mesh import make_mesh
from sat_bundleadjust_tpu.utils.demo import make_scene_arrays, scene_to_baparams

assert jax.process_count() == nproc, jax.process_count()
n_global = len(jax.devices())
assert n_global == 2 * nproc, n_global

scene = make_scene_arrays(n_cam=4, n_pts=64, obs_per_pt=3, seed=0, noise_px=0.05)
p = scene_to_baparams(scene, noise_pts=0.5)

mesh = make_mesh()  # all global devices, both processes
ids = multihost.local_shard_ids(mesh)
assert len(ids) == 2, ids

_, (cam, pts), info = run_distributed_ba(p, {"max_iter": 10}, mesh=mesh)
assert np.isfinite(info["cost"]) and info["cost"] < info["cost0"], info
assert len(info["err_fin"]) == p.n_obs
print(
    "MULTIHOST_RESULT pid={} nglobal={} cost0={:.8g} cost={:.8g} iters={} err={:.6g}".format(
        proc_id, n_global, info["cost0"], info["cost"], info["iterations"],
        float(np.mean(info["err_fin"])),
    ),
    flush=True,
)
