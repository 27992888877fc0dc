"""Component-wise profiling of the LM/Schur solve.

Times each solver component with scalar-fetch synchronization (on the axon
platform jax.block_until_ready returns before the device finishes; forcing
a host fetch of a scalar derived from the result is the only reliable
sync), then the full in-loop solve, so schedule overhead = in-loop cost
minus the component sum. Optionally captures a jax.profiler device trace
(SATBA_PROFILE_DIR=/path).

Usage:
    SATBA_BENCH_CAMS=1000 SATBA_BENCH_PTS=200000 python scripts/profile_solve.py
    SATBA_PROFILE_DIR=/tmp/trace python scripts/profile_solve.py   # + trace
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sat_bundleadjust_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def sync(x):
    """Reliable device sync: host fetch of a scalar reduction."""
    import jax.numpy as jnp

    leaves = [l for l in __import__("jax").tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    return float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves))


def timed(label, fn, repeats=5):
    fn()  # warm (compile)
    samples = []
    for _ in range(repeats):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    samples.sort()
    med = samples[len(samples) // 2]
    print("  {:42s} {:8.1f} ms  (min {:.1f} / max {:.1f})".format(
        label, med * 1e3, samples[0] * 1e3, samples[-1] * 1e3), flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp

    from sat_bundleadjust_tpu.ba.solver import BASolver, init_optimization_config
    from sat_bundleadjust_tpu.ops import lm as lm_ops
    from sat_bundleadjust_tpu.utils.demo import make_scene_arrays, scene_to_baparams
    from sat_bundleadjust_tpu.utils.profiling import device_trace

    n_cam = int(os.environ.get("SATBA_BENCH_CAMS", 50))
    n_pts = int(os.environ.get("SATBA_BENCH_PTS", 20000))
    obs_per_pt = int(os.environ.get("SATBA_BENCH_OBS", 4))
    print("platform={} cams={} pts={} obs={}".format(
        jax.default_backend(), n_cam, n_pts, n_pts * obs_per_pt), flush=True)

    scene = make_scene_arrays(n_cam=n_cam, n_pts=n_pts, obs_per_pt=obs_per_pt,
                              rot_scale=2e-5, noise_px=0.1, seed=0)
    p = scene_to_baparams(scene, noise_pts=1.0)
    solver = BASolver(p)
    solver.solve({"max_iter": 2})  # compile the in-loop program

    prob = solver.prob
    residual_fn, jac_fn = solver.residual_fn, solver.jac_fn
    cfg = lm_ops.LMConfig(schur_mode=solver.mode)
    if not cfg.cg_iters:
        cfg = cfg._replace(cg_iters=max(15, min(60, n_cam // 2)))
    cam0 = jnp.asarray(p.opt_block())
    pts0 = jnp.asarray(p.pts3d)

    r0, J_cam, J_pt = jac_fn(cam0, pts0)
    lam = jnp.asarray(1e-4)

    normal = jax.jit(lambda r, Jc, Jp: lm_ops._normal_blocks(
        r, Jc, Jp, prob, n_cam, n_pts, cfg))
    step = jax.jit(lambda r, Jc, Jp, l: lm_ops.lm_step(
        r, Jc, Jp, l, prob, n_cam, n_pts, cfg))

    print("component timings (median of 5, scalar-fetch synced):", flush=True)
    t_res = timed("residual", lambda: sync(residual_fn(cam0, pts0)))
    t_jac = timed("jacobian (+ residual chain)", lambda: sync(jac_fn(cam0, pts0)))
    t_nrm = timed("normal blocks (U, V, W, g)", lambda: sync(normal(r0, J_cam, J_pt)))
    t_stp = timed("full LM step (normal + CG + backsub)", lambda: sync(step(r0, J_cam, J_pt, lam)))

    # full in-loop solve for the schedule-overhead comparison
    def full():
        _, _, _, _, info = solver.solve({"max_iter": 30})
        return info

    full()
    t0 = time.time()
    info = full()
    t_full = time.time() - t0
    iters = int(info["iterations"])
    per_it = t_full / max(iters, 1)
    print("full solve: {:.2f} s / {} iters = {:.1f} ms/iter".format(
        t_full, iters, per_it * 1e3), flush=True)
    print("component sum (res+jac+step): {:.1f} ms/iter -> schedule/fetch overhead {:.1f} ms/iter".format(
        (t_res + t_jac + t_stp) * 1e3, (per_it - t_res - t_jac - t_stp) * 1e3), flush=True)

    if os.environ.get("SATBA_PROFILE_DIR"):
        with device_trace("lm_solve_{}cam".format(n_cam)):
            full()
        print("trace written under", os.environ["SATBA_PROFILE_DIR"], flush=True)


if __name__ == "__main__":
    main()
