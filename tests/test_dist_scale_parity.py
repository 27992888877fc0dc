"""Distributed-vs-single solver parity at >= 500-camera scale.

BASELINE config #5 is "1000+-view multi-host distributed-Schur BA"
(reference counterpart: the serial scipy TRF at ba_core.py:284-297, which
cannot run at this size). The full 1000-cam / 200k-track / 800k-obs
measurement lives in scripts/bench_dist_scale.py + BENCHMARKS.md; this
test pins the parity contract at 500 cameras so regressions in the
shard-planning / dual-layout / psum path are caught by the suite.
"""

import numpy as np
import pytest

from sat_bundleadjust_tpu.ba.solver import BASolver, run_ba_optimization
from sat_bundleadjust_tpu.parallel.dist_solver import run_distributed_ba
from sat_bundleadjust_tpu.parallel.mesh import make_mesh
from sat_bundleadjust_tpu.utils.demo import make_scene_arrays, scene_to_baparams


def test_distributed_parity_at_500_cameras():
    import jax.numpy as jnp

    scene = make_scene_arrays(n_cam=500, n_pts=20000, obs_per_pt=4,
                              rot_scale=2e-5, noise_px=0.1, seed=0)
    p = scene_to_baparams(scene, noise_pts=1.0)
    assert p.n_cam >= 500 and p.n_obs >= 80000

    # hard iteration budget so both solvers run the same number of steps
    ls = {"ftol": 1e-30, "xtol": 1e-30, "max_iter": 6}

    solver = BASolver(p, schur_mode="cg")
    _, (cam_s, pts_s), err0_s, err_s, it_s = run_ba_optimization(
        p, dict(ls), solver=solver)

    mesh = make_mesh()
    if mesh.devices.size != 8:
        pytest.skip(
            "parity contract is pinned on the 8-device virtual mesh "
            "(got {} devices)".format(mesh.devices.size))
    _, (cam_d, pts_d), info = run_distributed_ba(p, dict(ls), mesh=mesh)
    err_d = info["err_fin"]

    assert it_s == info["iterations"] == 6
    # both must have actually optimized (start ~83 px on this scene)
    assert float(np.mean(err_s)) < 0.5
    assert float(np.mean(err_d)) < 0.5

    delta = np.abs(np.asarray(err_d) - np.asarray(err_s))
    assert float(delta.mean()) <= 1e-2, float(delta.mean())
    assert abs(float(np.mean(err_d)) - float(np.mean(err_s))) <= 1e-3
