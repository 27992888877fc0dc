"""Focused follow-up to bench_matvec3: the z-side-only one-hot candidate.

bench_matvec3 on the real chip: one-hot BOTH sides in pure XLA loses
(materialized intermediates), bf16 W breaks CG at 1000-cam conditioning,
and gathers are per-ROW bound. The x-gather (1.65 ms, tiny table) is
near XLA's row rate; the z-gather (2.77 ms, 200k-row table) is the
outlier. Variants:

  aos   — shipped reference
  fold  — clamp/mask indices + V^-1/2 folded into W (f32 everywhere;
          kills the Vinv stage and one gather's source table)
  mixz  — fold + the CAMERA-side crossing replaced by a 3-term-split
          bf16 one-hot matmul (f32-exact); x-gather stays a plain gather

Plus 60-step PCG curves for each (block-Jacobi, REAL Schur RHS) to pin
CG-safety at 1000-cam conditioning.

Usage: python scripts/bench_matvec4.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sat_bundleadjust_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def sync(x):
    import jax
    import jax.numpy as jnp

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
    print("  {:40s} {:9.3f} ms  (min {:.3f})".format(label, med * 1e3, samples[0] * 1e3),
          flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp

    from sat_bundleadjust_tpu.ba.solver import BASolver
    from sat_bundleadjust_tpu.ops import lm as lm_ops
    from sat_bundleadjust_tpu.ops import smallmat as sm
    from sat_bundleadjust_tpu.utils.demo import make_scene_arrays, scene_to_baparams

    n_cam = int(os.environ.get("SATBA_BENCH_CAMS", 1000))
    n_pts = int(os.environ.get("SATBA_BENCH_PTS", 200000))
    obs_per_pt = int(os.environ.get("SATBA_BENCH_OBS", 4))
    R = int(os.environ.get("SATBA_BENCH_CG", 54))
    print("platform={} cams={} pts={} obs={}".format(
        jax.default_backend(), n_cam, n_pts, n_pts * obs_per_pt), flush=True)

    scene = make_scene_arrays(n_cam=n_cam, n_pts=n_pts, obs_per_pt=obs_per_pt,
                              rot_scale=2e-5, noise_px=0.1, seed=0)
    p = scene_to_baparams(scene, noise_pts=1.0)
    solver = BASolver(p)
    prob = solver.prob
    P, K, N, M = p.n_params, p.n_obs, p.n_pts, p.n_cam
    Tp = prob.pt_gather.shape[1]

    cam0 = jnp.asarray(p.opt_block())
    pts0 = jnp.asarray(p.pts3d)
    r, J_cam, J_pt = solver.jac_fn(cam0, pts0)
    cfg = lm_ops.LMConfig(schur_mode="cg")
    _, g_cam, g_pt, U, V, W = lm_ops._normal_blocks(r, J_cam, J_pt, prob, M, N, cfg)
    U_d = lm_ops._damp(U, 1e-4).astype(jnp.float32)
    Vinv = lm_ops._inv3x3(lm_ops._damp(V, 1e-4)).astype(jnp.float32)
    W = W.astype(jnp.float32)
    b_real = lm_ops._schur_rhs(g_cam, g_pt, W, Vinv, prob, M).astype(jnp.float32)
    b_real = b_real / jnp.max(jnp.abs(b_real))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(M, P)), jnp.float32)

    W_pad = jnp.concatenate([W, jnp.zeros((1, P, 3), W.dtype)])
    W_pt = jax.device_put(W_pad[prob.pt_gather])
    W_cm = jax.device_put(W_pad[prob.cam_gather])

    # folded layouts
    Lc = jnp.linalg.cholesky(
        0.5 * (Vinv + jnp.swapaxes(Vinv, -1, -2))
        + 1e-20 * jnp.eye(3, dtype=Vinv.dtype))
    Wh_pt = sm.mm(W_pt, Lc[:, None]).astype(jnp.float32)   # (N, Tp, P, 3)
    Lc_pad = jnp.concatenate([Lc, jnp.zeros((1, 3, 3), Lc.dtype)])
    Wh_cm = sm.mm(W_cm, Lc_pad[prob.pts_ind_cam]).astype(jnp.float32)
    Wh_flat = Wh_pt.reshape(N * Tp, P, 3)

    ci_clamp = jnp.minimum(prob.cam_ind_pt, M - 1)
    ci_mask = (prob.cam_ind_pt < M).astype(jnp.float32)[..., None]
    pi_clamp = jnp.minimum(prob.pts_ind_cam, N - 1)

    def chain(f, x_init, n=R):
        @jax.jit
        def run(x):
            def body(i, x):
                y = f(x)
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return jax.lax.fori_loop(0, n, body, x)

        return run

    def mv_aos(x):
        ux = sm.mv(U_d, x)
        xg = jnp.concatenate([x, jnp.zeros((1, P), x.dtype)])[prob.cam_ind_pt]
        wtx = jnp.sum(sm.mtv(W_pt, xg), axis=1)
        z = sm.mv(Vinv, wtx)
        zg = jnp.concatenate([z, jnp.zeros((1, 3), z.dtype)])[prob.pts_ind_cam]
        wz = jnp.sum(sm.mv(W_cm, zg), axis=1)
        return ux - wz

    def mv_fold(x):
        ux = sm.mv(U_d, x)
        xg = x[ci_clamp] * ci_mask
        what = jnp.sum(sm.mtv(Wh_pt, xg), axis=1)  # (N, 3)
        whg = what[pi_clamp]
        wz = jnp.sum(sm.mv(Wh_cm, whg), axis=1)
        return ux - wz

    # ---- mixz: camera-side crossing by 3-split one-hot matmul ----
    LO = 64
    H = -(-(M + 1) // LO)
    Mpad = H * LO
    SP = 3  # split terms
    c_flat = jnp.asarray(np.asarray(prob.cam_ind_pt).reshape(-1))
    lo = (c_flat % LO).astype(jnp.int32)
    hi = (c_flat // LO).astype(jnp.int32)
    oh_lo = (lo[:, None] == jnp.arange(LO, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16)
    mask_hi16 = (hi[:, None] == jnp.arange(H, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16)
    Kf = int(c_flat.shape[0])

    def splitn(v, n):
        terms, rem = [], v
        for _ in range(n):
            t = rem.astype(jnp.bfloat16)
            terms.append(t)
            rem = rem - t.astype(v.dtype)
        return terms

    def mv_mixz(x):
        ux = sm.mv(U_d, x)
        xg = x[ci_clamp] * ci_mask            # plain gather, tiny table
        what = jnp.sum(sm.mtv(Wh_pt, xg), axis=1)  # (N, 3)
        y = sm.mv(Wh_flat, jnp.repeat(what, Tp, axis=0))  # (K', P)
        ys = jnp.stack(splitn(y, SP), axis=1)  # (K', SP, P) bf16
        Y2 = (ys[:, :, None, :] * mask_hi16[:, None, :, None]).reshape(
            Kf, SP * H * P)
        wzmat = jnp.einsum("kl,kq->lq", oh_lo, Y2,
                           preferred_element_type=jnp.float32)
        wz = wzmat.reshape(LO, SP, H, P).sum(axis=1).transpose(1, 0, 2).reshape(
            Mpad, P)[:M]
        return ux - wz

    variants = {"aos": mv_aos, "fold": mv_fold, "mixz": mv_mixz}
    outs, times = {}, {}
    print("--- matvec variants ({}x chains) ---".format(R), flush=True)
    for name, f in variants.items():
        run = chain(f, x0)
        outs[name] = np.asarray(jax.device_get(run(x0)))
        t = timed(name, lambda run=run: sync(run(x0)))
        times[name] = t / R
    ref = outs["aos"]
    for name, o in outs.items():
        err = float(np.max(np.abs(o - ref)) / max(np.max(np.abs(ref)), 1e-30))
        print("  {:6s} rel-err vs aos: {:.2e}".format(name, err), flush=True)
    print("per-matvec:", {k: "{:.3f} ms".format(v * 1e3) for k, v in times.items()},
          flush=True)

    # ---- PCG curves on the REAL RHS ----
    print("--- 60-step PCG |r|/|b| (block-Jacobi, real Schur RHS) ---", flush=True)
    Vinv_cm = jnp.concatenate([Vinv, jnp.zeros((1, 3, 3), Vinv.dtype)])[
        prob.pts_ind_cam]
    Yc = sm.mm(W_cm, Vinv_cm)
    S_diag = U_d - jnp.sum(sm.mbt(Yc, W_cm), axis=1)
    prec = jnp.linalg.inv((S_diag + jnp.eye(P, dtype=jnp.float32) * 1e-12
                           ).astype(jnp.float32))

    def pcg_curve(matvec):
        @jax.jit
        def run(b):
            x = jnp.zeros_like(b)
            r = b
            z = sm.mv(prec, r)
            pv = z
            rz = jnp.sum(r * z)

            def body(i, state):
                x, r, pv, rz, hist = state
                Ap = matvec(pv)
                denom = jnp.sum(pv * Ap)
                alpha = rz / jnp.where(jnp.abs(denom) < 1e-30, 1.0, denom)
                x = x + alpha * pv
                r = r - alpha * Ap
                z = sm.mv(prec, r)
                rz_new = jnp.sum(r * z)
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1.0, rz)
                pv = z + beta * pv
                hist = hist.at[i + 1].set(jnp.sqrt(jnp.sum(r * r)))
                return x, r, pv, rz_new, hist

            hist0 = jnp.zeros(61).at[0].set(jnp.sqrt(jnp.sum(b * b)))
            _, _, _, _, hist = jax.lax.fori_loop(0, 60, body,
                                                 (x, r, pv, rz, hist0))
            return hist

        return np.asarray(jax.device_get(run(b_real)))

    for name, f in variants.items():
        h = pcg_curve(f)
        rel = h / h[0]
        print("  {:6s} @ [10,20,30,40,50,60]: ".format(name)
              + " ".join("{:.2e}".format(rel[i]) for i in (10, 20, 30, 40, 50, 60)),
              flush=True)


if __name__ == "__main__":
    main()
