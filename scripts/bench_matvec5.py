"""Round-5 probe: camera-side accumulation schemes vs solve quality.

Round 4 localized the fused-kernel solve degradation (0.46 px vs the
0.098 px optimum at 1000 cams) to the point-major camera-side reduction's
f32 rounding under Schur cancellation — reproduced exactly by the
pure-jnp twin. This probe runs the FULL 1000-cam solve per accumulation
scheme (CPU backend; the twin needs no TPU):

  aos        — slot-major XLA matvec (shipped default; the 0.098 px ref)
  twin_pm    — point-major f32 segment_sum (expect the 0.46 px repro)
  twin_f64   — f64 camera-side accumulation (wide-accumulator ground truth)
  twin_slice — the kernel fix candidate: per-chunk fixed-point slicing
               (exact f32 in-chunk sums) + f64 cross-chunk combine

Usage: python scripts/bench_matvec5.py [variant ...]   (default: all four)
Size:  SATBA_BENCH_CAMS / SATBA_BENCH_PTS / SATBA_BENCH_OBS
"""

import os
import sys
import time

# direct assignment, not setdefault: the deployment's sitecustomize
# pre-sets JAX_PLATFORMS for the accelerator plugin
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sat_bundleadjust_tpu.ba.solver import BASolver
    from sat_bundleadjust_tpu.ops import lm as lm_ops
    from sat_bundleadjust_tpu.utils.demo import make_scene_arrays, scene_to_baparams

    n_cam = int(os.environ.get("SATBA_BENCH_CAMS", 1000))
    n_pts = int(os.environ.get("SATBA_BENCH_PTS", 200000))
    obs_per_pt = int(os.environ.get("SATBA_BENCH_OBS", 4))
    variants = sys.argv[1:] or ["aos", "twin_pm", "twin_f64", "twin_slice"]
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
        t0 = time.time()
        cam, pts, info = lm_ops.solve(
            solver.residual_fn, solver.jac_fn, cam0, pts0, solver.prob, cfg,
            run=solver._get_run(cfg),
        )
        wall = time.time() - t0
        print("{:11s} {:6.1f}s  {:3d} it  mean reproj {:.6f} px  (median {:.6f})".format(
            mv, wall, info["iterations"], float(np.mean(info["err_fin"])),
            float(np.median(info["err_fin"]))), flush=True)


if __name__ == "__main__":
    main()
