"""Distributed Schur solver on the virtual 8-device CPU mesh: must match
the single-device solver on the same synthetic problem."""

import jax
import numpy as np
import pytest

from synthetic import synthetic_scene

from sat_bundleadjust_tpu.ba.params import BAParams
from sat_bundleadjust_tpu.ba.solver import make_fns, run_ba_optimization, _reproj_err
from sat_bundleadjust_tpu.parallel.dist_solver import run_distributed_ba, shard_observations
from sat_bundleadjust_tpu.parallel.mesh import make_mesh

import jax.numpy as jnp


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_shard_observations_partitions_tracks():
    scene = synthetic_scene(n_cam=4, n_pts=50, rot_scale=1e-5, seed=0)
    p = BAParams(scene["C"], scene["pts3d"], scene["cameras"], "rpc",
                 scene["pairs_to_triangulate"], scene["camera_centers"], {"verbose": False})
    sh = shard_observations(p.pts_ind, p.cam_ind, p.pts2d, p.pts2d_w, p.n_pts, 4)
    # every track's observations live on exactly one shard
    for t in range(p.n_pts):
        shards_seen = set()
        for s in range(4):
            valid = sh["weights"][s] > 0
            if np.any(sh["pts_ind"][s][valid] == t):
                shards_seen.add(s)
        assert len(shards_seen) <= 1
    # padded entries have zero weight; total valid count preserved
    assert int((sh["weights"] > 0).sum()) == p.n_obs


def test_shard_local_renumbering():
    """track_global/local_of_global must be mutually inverse, pts_loc must
    renumber each shard's observations consistently, and the dual padded
    layouts must decode back to the shard's (camera, local point) pairs."""
    scene = synthetic_scene(n_cam=4, n_pts=50, rot_scale=1e-5, seed=0)
    p = BAParams(scene["C"], scene["pts3d"], scene["cameras"], "rpc",
                 scene["pairs_to_triangulate"], scene["camera_centers"], {"verbose": False})
    sh = shard_observations(p.pts_ind, p.cam_ind, p.pts2d, p.pts2d_w, p.n_pts, 4)
    L = sh["track_global"].shape[1]
    K_pad = sh["pts_ind"].shape[1]
    for s in range(4):
        tg = sh["track_global"][s]
        log = sh["local_of_global"][s]
        for l in range(L):
            if tg[l] < p.n_pts:
                assert log[tg[l]] == l
        valid = sh["weights"][s] > 0
        np.testing.assert_array_equal(
            sh["pts_loc"][s][valid], log[sh["pts_ind"][s][valid]]
        )
        # dual layouts decode to the same obs set
        assert "cam_ind_pt" in sh and "pts_ind_cam" in sh
        tp, cp = sh["pt_gather"][s], sh["cam_ind_pt"][s]
        real = tp < K_pad
        np.testing.assert_array_equal(cp[real], sh["cam_ind"][s][tp[real]])
        assert np.all(cp[~real] == 4)
        tc, pc = sh["cam_gather"][s], sh["pts_ind_cam"][s]
        real = tc < K_pad
        np.testing.assert_array_equal(pc[real], sh["pts_loc"][s][tc[real]])
        assert np.all(pc[~real] == L)


def test_distributed_matches_single_device():
    scene = synthetic_scene(n_cam=4, n_pts=100, rot_scale=1e-5, seed=9, noise_px=0.05)
    p1 = BAParams(scene["C"], scene["pts3d"], scene["cameras"], "rpc",
                  scene["pairs_to_triangulate"], scene["camera_centers"], {"verbose": False})
    _, (cam_s, pts_s), _, err_single, _ = run_ba_optimization(p1, {"max_iter": 25}, schur_mode="cg")

    p2 = BAParams(scene["C"], scene["pts3d"], scene["cameras"], "rpc",
                  scene["pairs_to_triangulate"], scene["camera_centers"], {"verbose": False})
    mesh = make_mesh()
    _, (cam_d, pts_d), info = run_distributed_ba(p2, {"max_iter": 25}, mesh=mesh)

    residual_fn, _ = make_fns(p2)
    r = residual_fn(jnp.asarray(cam_d), jnp.asarray(pts_d))
    err_dist = _reproj_err(r, p2.pts2d_w)
    assert np.mean(err_dist) < 0.25, np.mean(err_dist)
    assert abs(np.mean(err_dist) - np.mean(err_single)) < 0.05
