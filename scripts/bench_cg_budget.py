"""Sweep the truncated-CG step budget at a fixed BA problem.

The two-level preconditioner changed where the budget/quality tradeoff
sits: steps are more accurate per CG iteration, so a smaller budget may
buy the same LM convergence — or a larger one may cut LM iterations
further. One compiled program per budget; reports full-solve wall and LM
iteration count.

Usage:
    SATBA_BENCH_CAMS=1000 SATBA_BENCH_PTS=200000 \
        python scripts/bench_cg_budget.py 30 45 60 90
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sat_bundleadjust_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    import jax.numpy as jnp
    import numpy as np

    from sat_bundleadjust_tpu.ops import lm as lm_ops
    from sat_bundleadjust_tpu.ba.solver import BASolver
    from sat_bundleadjust_tpu.utils.demo import make_scene_arrays, scene_to_baparams

    budgets = [int(a) for a in sys.argv[1:]] or [30, 45, 60, 90]
    n_cam = int(os.environ.get("SATBA_BENCH_CAMS", 1000))
    n_pts = int(os.environ.get("SATBA_BENCH_PTS", 200000))
    obs_per_pt = int(os.environ.get("SATBA_BENCH_OBS", 4))

    scene = make_scene_arrays(n_cam=n_cam, n_pts=n_pts, obs_per_pt=obs_per_pt,
                              rot_scale=2e-5, noise_px=0.1, seed=0)
    p = scene_to_baparams(scene, noise_pts=1.0)
    solver = BASolver(p, schur_mode="cg")

    coarse = os.environ.get("SATBA_CG_COARSE", "1") != "0"
    for budget in budgets:
        cfg = lm_ops.LMConfig(schur_mode="cg", cg_iters=budget,
                              ftol=1e-4, max_iter=30, cg_coarse=coarse)
        run = lm_ops.build_solve(solver.residual_fn, solver.jac_fn,
                                 p.n_cam, p.n_pts, solver.prob, cfg)
        cam0 = jnp.asarray(p.opt_block())
        pts0 = jnp.asarray(p.pts3d)
        # warm (compile)
        lm_ops.solve(solver.residual_fn, solver.jac_fn, cam0, pts0,
                     solver.prob, cfg, run=run)
        samples = []
        for _ in range(3):
            t0 = time.time()
            _, _, info = lm_ops.solve(solver.residual_fn, solver.jac_fn,
                                      cam0, pts0, solver.prob, cfg, run=run)
            # capture the per-sample err alongside its wall, so the
            # reported error belongs to the reported (median) sample
            samples.append((time.time() - t0, info["iterations"],
                            float(np.median(np.asarray(info["err_fin"])))))
        samples.sort()
        wall, its, err = samples[len(samples) // 2]
        print("cg_iters {:4d} (coarse={}): solve {:6.2f} s  ({:2d} LM its, "
              "{:5.3f} s/it, median reproj {:.4f} px)  [min {:.2f} / max {:.2f}]".format(
                  budget, int(coarse), wall, int(its), wall / max(int(its), 1), err,
                  samples[0][0], samples[-1][0]), flush=True)


if __name__ == "__main__":
    main()
