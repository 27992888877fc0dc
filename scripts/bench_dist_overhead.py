"""Distributed-solve overhead on the virtual 8-device CPU mesh.

Round-2 VERDICT weak #1: per-iteration cost of the distributed LM loop vs
the single-device solver at a FIXED problem. Virtual devices share the same
host cores, so absolute throughput is meaningless — but the marginal
iteration cost exposes psum/renumbering overhead and any accidental
replication, which is exactly what this measures. Also times the
(vectorized) shard planning at BASELINE config-#5 scale.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/bench_dist_overhead.py
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from sat_bundleadjust_tpu.ba.solver import BASolver
from sat_bundleadjust_tpu.parallel.dist_solver import run_distributed_ba, shard_observations
from sat_bundleadjust_tpu.parallel.mesh import make_mesh
from sat_bundleadjust_tpu.utils.demo import make_scene_arrays, scene_to_baparams


def time_solver(fn, iters_lo, iters_hi, repeats=5):
    """Marginal per-iteration cost: (t(hi) - t(lo)) / (hi - lo), min over
    repeats (both solvers run their whole LM loop in ONE dispatch, so the
    delta cancels dispatch/fetch overhead)."""
    # warmup both iteration counts (compile)
    fn(iters_lo)
    fn(iters_hi)
    lo, hi = [], []
    for _ in range(repeats):
        t0 = time.time(); n_lo = fn(iters_lo); lo.append(time.time() - t0)
        t0 = time.time(); n_hi = fn(iters_hi); hi.append(time.time() - t0)
    per_it = (min(hi) - min(lo)) / (n_hi - n_lo)
    return per_it, min(lo), min(hi), n_lo, n_hi


def main():
    n_cam, n_pts = 50, 4000
    scene = make_scene_arrays(n_cam=n_cam, n_pts=n_pts, obs_per_pt=4, seed=0, noise_px=0.3)
    ls = {"ftol": 1e-30, "xtol": 1e-30}

    # single-device
    p1 = scene_to_baparams(scene, noise_pts=2.0)
    solver = BASolver(p1, schur_mode="cg")

    def single(n_iter):
        _, _, _, _, info = solver.solve(dict(ls, max_iter=n_iter))
        return info["iterations"]

    s_it, s_lo, s_hi, n_lo, n_hi = time_solver(single, 2, 22)
    print("single-device: {:.4f} s/it  (t({})={:.3f}s t({})={:.3f}s)".format(
        s_it, n_lo, s_lo, n_hi, s_hi))

    # 8-shard mesh
    mesh = make_mesh()
    print("mesh devices:", mesh.devices.size)
    p2 = scene_to_baparams(scene, noise_pts=2.0)

    from sat_bundleadjust_tpu.ba.solver import _obs_residual_fn, init_optimization_config
    from sat_bundleadjust_tpu.ops import lm as lm_ops
    from sat_bundleadjust_tpu.parallel.dist_solver import DistributedLM
    import jax.numpy as jnp

    t0 = time.time()
    sharded = shard_observations(p2.pts_ind, p2.cam_ind, p2.pts2d, p2.pts2d_w,
                                 p2.n_pts, mesh.devices.size)
    t_plan = time.time() - t0
    print("shard planning ({} obs, {} tracks): {:.3f}s".format(p2.n_obs, p2.n_pts, t_plan))

    cfgs = {}

    def dist(n_iter):
        if n_iter not in cfgs:
            lsd = init_optimization_config(dict(ls, max_iter=n_iter))
            cfg = lm_ops.LMConfig(
                loss=lsd["loss"], f_scale=float(lsd["f_scale"]), max_iter=n_iter,
                ftol=float(lsd["ftol"]), xtol=float(lsd["xtol"]), schur_mode="cg",
            )
            obs_fn = _obs_residual_fn(p2.cam_model, p2.n_params)
            cfgs[n_iter] = DistributedLM(
                obs_fn, p2.rpcs, p2.cam_params[:, p2.n_params:], sharded,
                p2.n_cam, p2.n_pts, p2.cam_opt_mask, p2.pts_opt_mask, cfg,
                mesh=mesh, n_params=p2.n_params,
            )
        solver = cfgs[n_iter]
        _, _, info = solver.solve(jnp.asarray(p2.opt_block()), jnp.asarray(p2.pts3d))
        return info["iterations"]

    d_it, d_lo, d_hi, n_lo, n_hi = time_solver(dist, 2, 22)
    print("8-shard mesh:  {:.4f} s/it  (t({})={:.3f}s t({})={:.3f}s)".format(
        d_it, n_lo, d_lo, n_hi, d_hi))
    print("overhead ratio (mesh / single, same host cores): {:.2f}x".format(d_it / s_it))

    # planning at BASELINE config-#5 scale
    rng = np.random.RandomState(0)
    n_pts_big, n_cam_big = 1_000_000, 500
    obs_per = rng.randint(2, 8, n_pts_big)
    pts_ind = np.repeat(np.arange(n_pts_big), obs_per).astype(np.int32)
    cam_ind = rng.randint(0, n_cam_big, len(pts_ind)).astype(np.int32)
    pts2d = rng.randn(len(pts_ind), 2)
    w = np.ones(len(pts_ind))
    ts = []
    for _ in range(3):
        t0 = time.time()
        sh = shard_observations(pts_ind, cam_ind, pts2d, w, n_pts_big, 8, n_cam=n_cam_big)
        ts.append(time.time() - t0)
    loads = (sh["weights"] > 0).sum(axis=1)
    print("planning 1M tracks / {} obs: min {:.2f}s  imbalance {:.5f}".format(
        len(pts_ind), min(ts), loads.max() / loads.mean()))


if __name__ == "__main__":
    main()
