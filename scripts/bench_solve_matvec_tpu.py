"""Round-5: full 1000-cam solve quality + wall per CG matvec implementation,
on the real TPU.

Round 4 recorded the fused kernel's solve at 0.46 px (vs the 0.098 px
optimum) BEFORE the per-chunk-partials + XLA-tree-reduction rework
(commit e850b3a) landed; the round-5 CPU twins (scripts/bench_matvec5.py)
show the point-major summation order alone converges fine. This script
measures what the CURRENT kernel does at the scale that bit.

Usage: python scripts/bench_solve_matvec_tpu.py [variant ...]
       (default: aos pallas)
Size:  SATBA_BENCH_CAMS / SATBA_BENCH_PTS / SATBA_BENCH_OBS
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sat_bundleadjust_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sat_bundleadjust_tpu.ba.solver import BASolver
    from sat_bundleadjust_tpu.ops import lm as lm_ops
    from sat_bundleadjust_tpu.utils.demo import make_scene_arrays, scene_to_baparams

    n_cam = int(os.environ.get("SATBA_BENCH_CAMS", 1000))
    n_pts = int(os.environ.get("SATBA_BENCH_PTS", 200000))
    obs_per_pt = int(os.environ.get("SATBA_BENCH_OBS", 4))
    variants = sys.argv[1:] or ["aos", "pallas"]
    print("platform={} cams={} pts={} obs={}".format(
        jax.default_backend(), n_cam, n_pts, n_pts * obs_per_pt), flush=True)

    scene = make_scene_arrays(n_cam=n_cam, n_pts=n_pts, obs_per_pt=obs_per_pt,
                              rot_scale=2e-5, noise_px=0.1, seed=0)
    p = scene_to_baparams(scene, noise_pts=1.0)
    solver = BASolver(p, schur_mode="cg")
    cam0 = jnp.asarray(p.opt_block())
    pts0 = jnp.asarray(p.pts3d)

    for mv in variants:
        cfg = lm_ops.LMConfig(
            schur_mode="cg", matvec=mv, max_iter=40,
            cg_coarse_k=lm_ops.default_coarse_k(p.n_cam),
        )
        run = solver._get_run(cfg)
        # warm compile with a 2-iteration budget (same program, dynamic cap)
        t0 = time.time()
        lm_ops.solve(solver.residual_fn, solver.jac_fn, cam0, pts0,
                     solver.prob, cfg._replace(max_iter=2), run=run)
        print("{:8s} warmup(2 it): {:.1f}s".format(mv, time.time() - t0),
              flush=True)
        walls = []
        for _ in range(3):
            t0 = time.time()
            cam, pts, info = lm_ops.solve(
                solver.residual_fn, solver.jac_fn, cam0, pts0, solver.prob,
                cfg, run=run)
            walls.append(time.time() - t0)
        walls.sort()
        print("{:8s} wall min/med {:6.2f}/{:6.2f}s  {:3d} it  "
              "mean reproj {:.6f} px  (median {:.6f})".format(
                  mv, walls[0], walls[1], info["iterations"],
                  float(np.mean(info["err_fin"])),
                  float(np.median(info["err_fin"]))), flush=True)


if __name__ == "__main__":
    main()
