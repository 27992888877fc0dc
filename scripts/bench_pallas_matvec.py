"""Fused Pallas Schur matvec vs the shipped aos matvec, on the real TPU.

Usage: python scripts/bench_pallas_matvec.py
Size:  SATBA_BENCH_CAMS / SATBA_BENCH_PTS / SATBA_BENCH_OBS / SATBA_BENCH_CG
       SATBA_BENCH_BLOCK (points per kernel chunk, default 512)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sat_bundleadjust_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def sync(x):
    import jax.numpy as jnp
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "dtype")]
    return float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves))


def timed(label, fn, repeats=15):
    fn()
    samples = []
    for _ in range(repeats):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    samples.sort()
    med = samples[len(samples) // 2]
    print("  {:40s} {:9.3f} ms  (min {:.3f})".format(label, med * 1e3,
                                                     samples[0] * 1e3), flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp

    from sat_bundleadjust_tpu.ba.solver import BASolver
    from sat_bundleadjust_tpu.ops import lm as lm_ops
    from sat_bundleadjust_tpu.ops import pallas_matvec as pmv
    from sat_bundleadjust_tpu.ops import smallmat as sm
    from sat_bundleadjust_tpu.utils.demo import make_scene_arrays, scene_to_baparams

    n_cam = int(os.environ.get("SATBA_BENCH_CAMS", 1000))
    n_pts = int(os.environ.get("SATBA_BENCH_PTS", 200000))
    obs_per_pt = int(os.environ.get("SATBA_BENCH_OBS", 4))
    R = int(os.environ.get("SATBA_BENCH_CG", 54))
    block = int(os.environ.get("SATBA_BENCH_BLOCK", 512))
    print("platform={} cams={} pts={} obs={} block={}".format(
        jax.default_backend(), n_cam, n_pts, n_pts * obs_per_pt, block), flush=True)

    scene = make_scene_arrays(n_cam=n_cam, n_pts=n_pts, obs_per_pt=obs_per_pt,
                              rot_scale=2e-5, noise_px=0.1, seed=0)
    p = scene_to_baparams(scene, noise_pts=1.0)
    solver = BASolver(p)
    prob = solver.prob
    P, K, N, M = p.n_params, p.n_obs, p.n_pts, p.n_cam

    cam0 = jnp.asarray(p.opt_block())
    pts0 = jnp.asarray(p.pts3d)
    r, J_cam, J_pt = solver.jac_fn(cam0, pts0)
    cfg = lm_ops.LMConfig(schur_mode="cg")
    _, g_cam, g_pt, U, V, W = lm_ops._normal_blocks(r, J_cam, J_pt, prob, M, N, cfg)
    U_d = lm_ops._damp(U, 1e-4).astype(jnp.float32)
    Vinv = lm_ops._inv3x3(lm_ops._damp(V, 1e-4)).astype(jnp.float32)
    W = W.astype(jnp.float32)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(M, P)), jnp.float32)

    W_pad = jnp.concatenate([W, jnp.zeros((1, P, 3), W.dtype)])
    W_pt = jax.device_put(W_pad[prob.pt_gather])
    W_cm = jax.device_put(W_pad[prob.cam_gather])

    def mv_aos(x):
        ux = sm.mv(U_d, x)
        xg = jnp.concatenate([x, jnp.zeros((1, P), x.dtype)])[prob.cam_ind_pt]
        wtx = jnp.sum(sm.mtv(W_pt, xg), axis=1)
        z = sm.mv(Vinv, wtx)
        zg = jnp.concatenate([z, jnp.zeros((1, 3), z.dtype)])[prob.pts_ind_cam]
        wz = jnp.sum(sm.mv(W_cm, zg), axis=1)
        return ux - wz

    Wh, c, meta = pmv.build_wh_operands(W, Vinv, prob, M, block_pts=block)
    Wh = jax.device_put(Wh)
    c = jax.device_put(c)

    def mv_pallas(x):
        return sm.mv(U_d, x) - pmv.schur_wz(x, Wh, c, meta)

    def chain(f, x_init, n=R):
        @jax.jit
        def run(x):
            def body(i, x):
                y = f(x)
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return jax.lax.fori_loop(0, n, body, x)

        return run

    outs, times = {}, {}
    for name, f in (("aos", mv_aos), ("pallas", mv_pallas)):
        run = chain(f, x0)
        outs[name] = np.asarray(jax.device_get(run(x0)))
        t = timed("{} ({}x chain)".format(name, R), lambda run=run: sync(run(x0)))
        times[name] = t / R
    err = float(np.max(np.abs(outs["pallas"] - outs["aos"]))
                / max(np.max(np.abs(outs["aos"])), 1e-30))
    print("pallas vs aos chain rel-err: {:.2e}".format(err), flush=True)
    print("per-matvec:", {k: "{:.3f} ms".format(v * 1e3) for k, v in times.items()},
          flush=True)


if __name__ == "__main__":
    main()
