"""Distributed Schur solver at BASELINE config-#5 scale (round-4 item #1).

1000 cameras / 200k tracks / 800k observations — the problem size the
distributed path exists for — on the virtual 8-device CPU mesh. Virtual
devices share the host cores, so absolute wall is not chip throughput;
what this measures and records for BENCHMARKS.md:

  * shard planning wall (vectorized LPT, dual-layout table build)
  * marginal per-LM-iteration wall: distributed vs single-device on the
    SAME problem and backend (replication/psum overhead shows up here)
  * solution parity: mean/max |reprojection delta| distributed vs
    single-device after the same iteration budget (target <= 1e-2 px)
  * peak host RSS

Run: python scripts/bench_dist_scale.py            (forces CPU mesh)
Size overrides: SATBA_BENCH_CAMS / SATBA_BENCH_PTS / SATBA_BENCH_OBS.
"""

import os
import resource
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
from sat_bundleadjust_tpu.parallel.dist_solver import (
    make_distributed_solver,
    shard_observations,
)
from sat_bundleadjust_tpu.parallel.mesh import make_mesh
from sat_bundleadjust_tpu.utils.demo import make_scene_arrays, scene_to_baparams


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def marginal(fn, lo, hi, repeats=3):
    fn(lo)
    fn(hi)
    t_lo, t_hi = [], []
    for _ in range(repeats):
        t0 = time.time(); n_lo = fn(lo); t_lo.append(time.time() - t0)
        t0 = time.time(); n_hi = fn(hi); t_hi.append(time.time() - t0)
    return (min(t_hi) - min(t_lo)) / (n_hi - n_lo), min(t_lo), min(t_hi), n_lo, n_hi


def main():
    n_cam = int(os.environ.get("SATBA_BENCH_CAMS", 1000))
    n_pts = int(os.environ.get("SATBA_BENCH_PTS", 200000))
    obs_per_pt = int(os.environ.get("SATBA_BENCH_OBS", 4))
    budget = int(os.environ.get("SATBA_BENCH_ITERS", 12))
    print("platform={} devices={} cams={} pts={} obs={}".format(
        jax.default_backend(), len(jax.devices()), n_cam, n_pts,
        n_pts * obs_per_pt), flush=True)

    t0 = time.time()
    scene = make_scene_arrays(n_cam=n_cam, n_pts=n_pts, obs_per_pt=obs_per_pt,
                              rot_scale=2e-5, noise_px=0.1, seed=0)
    p1 = scene_to_baparams(scene, noise_pts=1.0)
    print("scene + BAParams build: {:.1f} s (rss {:.2f} GB)".format(
        time.time() - t0, rss_gb()), flush=True)

    # hard budgets so both solvers run exactly `budget` iterations
    ls = {"ftol": 1e-30, "xtol": 1e-30, "max_iter": budget}

    # ---- shard planning wall (the host-side cost the mesh path adds) ----
    t0 = time.time()
    sharded = shard_observations(
        p1.pts_ind, p1.cam_ind, p1.pts2d, p1.pts2d_w, p1.n_pts, 8
    )
    t_plan = time.time() - t0
    valid = sharded["weights"] > 0
    loads = valid.sum(axis=1)
    print("shard planning (8 shards): {:.2f} s; obs/shard min {} max {} "
          "(imbalance {:.5f}); dual layouts: {}".format(
              t_plan, int(loads.min()), int(loads.max()),
              float(loads.max() / max(loads.mean(), 1)),
              "cam_ind_pt" in sharded), flush=True)

    # ---- single-device reference ----
    t0 = time.time()
    solver1 = BASolver(p1, schur_mode="cg")
    cam0 = p1.opt_block().copy()
    pts0 = p1.pts3d.copy()

    def single(n_iter):
        _, (_, _), err0, err1, it = _run(solver1, dict(ls, max_iter=n_iter))
        return it

    def _run(s, params):
        from sat_bundleadjust_tpu.ba.solver import run_ba_optimization

        return run_ba_optimization(s.p, params, solver=s)

    s_it, s_lo, s_hi, n_lo, n_hi = marginal(single, 2, budget)
    print("single-device: {:.3f} s/it (t({})={:.1f}s t({})={:.1f}s) rss {:.2f} GB".format(
        s_it, n_lo, s_lo, n_hi, s_hi, rss_gb()), flush=True)
    _, (cam_s, pts_s), err0_s, err_s, it_s = _run(solver1, ls)
    print("single-device solve: reproj {:.4f} -> {:.6f} px in {} it".format(
        float(np.mean(err0_s)), float(np.mean(err_s)), it_s), flush=True)

    # ---- distributed (8 virtual shards) ----
    mesh = make_mesh()
    t0 = time.time()
    dsolver = make_distributed_solver(p1, ls, mesh=mesh)
    print("distributed solver build (shard + put + trace): {:.1f} s rss {:.2f} GB".format(
        time.time() - t0, rss_gb()), flush=True)

    import jax.numpy as jnp

    cam0_j = jnp.asarray(cam0)
    pts0_j = jnp.asarray(pts0)

    def dist(n_iter):
        cfg = dsolver.cfg._replace(max_iter=n_iter, ftol=1e-30, xtol=1e-30)
        _, _, info = dsolver.solve(cam0_j, pts0_j, cfg=cfg)
        return info["iterations"]

    d_it, d_lo, d_hi, n_lo, n_hi = marginal(dist, 2, budget)
    print("distributed:   {:.3f} s/it (t({})={:.1f}s t({})={:.1f}s) rss {:.2f} GB".format(
        d_it, n_lo, d_lo, n_hi, d_hi, rss_gb()), flush=True)

    cfg = dsolver.cfg._replace(max_iter=budget, ftol=1e-30, xtol=1e-30)
    cam_d, pts_d, info_d = dsolver.solve(cam0_j, pts0_j, cfg=cfg)
    err_d = info_d["err_fin"]
    print("distributed solve: reproj {:.4f} -> {:.6f} px in {} it".format(
        float(np.mean(info_d["err0"])), float(np.mean(err_d)),
        info_d["iterations"]), flush=True)

    # ---- parity ----
    d_err = np.abs(np.asarray(err_d) - np.asarray(err_s))
    print("parity: mean|reproj delta| {:.2e} px, max {:.2e} px; "
          "mean-reproj diff {:.2e} px".format(
              float(d_err.mean()), float(d_err.max()),
              abs(float(np.mean(err_d)) - float(np.mean(err_s)))), flush=True)
    dc = np.abs(np.asarray(cam_d) - np.asarray(cam_s))
    print("parity: max|dcam delta| {:.2e} (cam scale {:.2e})".format(
        float(dc.max()), float(np.abs(np.asarray(cam_s)).max())), flush=True)
    print("peak rss {:.2f} GB".format(rss_gb()), flush=True)


if __name__ == "__main__":
    main()
