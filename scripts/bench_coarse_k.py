"""How many CG steps does a G-cluster coarse level save?

The round-3 two-level preconditioner (block-Jacobi + ONE global coarse
vector per parameter) took the 1000-cam solve from 11.1 to 7.4 s, but CG
still runs against its 60-step budget. This measures PCG steps to the
solver's forcing tolerance (|r| <= 1e-2 |b|) on the REAL damped Schur
system with the coarse level generalized to G contiguous camera clusters
(Z = cluster indicator (x) I_P, E = Z^T S Z of size (G*P, G*P)):

    G = 0 (block-Jacobi only), 1 (shipped), 4, 16, 64

Preconditioner quality is hardware-independent: run on CPU.

Usage: JAX_PLATFORMS=cpu python scripts/bench_coarse_k.py
Size:  SATBA_BENCH_CAMS / SATBA_BENCH_PTS / SATBA_BENCH_OBS; SATBA_BENCH_LAM
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from sat_bundleadjust_tpu.ba.solver import BASolver
    from sat_bundleadjust_tpu.ops import lm as lm_ops
    from sat_bundleadjust_tpu.ops import smallmat as sm
    from sat_bundleadjust_tpu.utils.demo import make_scene_arrays, scene_to_baparams

    n_cam = int(os.environ.get("SATBA_BENCH_CAMS", 300))
    n_pts = int(os.environ.get("SATBA_BENCH_PTS", 30000))
    obs_per_pt = int(os.environ.get("SATBA_BENCH_OBS", 4))
    lam = float(os.environ.get("SATBA_BENCH_LAM", 1e-4))
    print("platform={} cams={} pts={} obs={} lam={}".format(
        jax.default_backend(), n_cam, n_pts, n_pts * obs_per_pt, lam), flush=True)

    scene = make_scene_arrays(n_cam=n_cam, n_pts=n_pts, obs_per_pt=obs_per_pt,
                              rot_scale=2e-5, noise_px=0.1, seed=0)
    p = scene_to_baparams(scene, noise_pts=1.0)
    solver = BASolver(p)
    prob = solver.prob
    P, K, N, M = p.n_params, p.n_obs, p.n_pts, p.n_cam
    Tp = prob.pt_gather.shape[1]

    cam0 = jnp.asarray(p.opt_block())
    pts0 = jnp.asarray(p.pts3d)
    warm = int(os.environ.get("SATBA_BENCH_WARM", 0))
    if warm:
        # advance the REAL solver: late-LM systems (small residuals, small
        # lam) are the ones where CG exhausts its budget (round-3 trace)
        from sat_bundleadjust_tpu.ba.solver import run_ba_optimization

        _, (cam_w, pts_w), _, _, it_w = run_ba_optimization(
            p, {"ftol": 1e-30, "xtol": 1e-30, "max_iter": warm}, solver=solver)
        cam0 = jnp.asarray(cam_w)
        pts0 = jnp.asarray(pts_w)
        # the LM loop divides lam by lambda_down per accepted step from 1e-3
        cfg0 = lm_ops.LMConfig()
        lam = max(1e-3 / (cfg0.lambda_down ** it_w), 1e-10)
        print("warm state after {} LM iters; lam -> {:.1e}".format(it_w, lam),
              flush=True)
    r, J_cam, J_pt = solver.jac_fn(cam0, pts0)
    cfg = lm_ops.LMConfig(schur_mode="cg")
    _, g_cam, g_pt, U, V, W = lm_ops._normal_blocks(r, J_cam, J_pt, prob, M, N, cfg)
    U_d = lm_ops._damp(U, lam).astype(jnp.float32)
    Vinv = lm_ops._inv3x3(lm_ops._damp(V, lam)).astype(jnp.float32)
    W = W.astype(jnp.float32)
    b = lm_ops._schur_rhs(g_cam, g_pt, W, Vinv, prob, M).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(b)))
    b = b / scale
    U_d = U_d / scale
    W = W / float(np.sqrt(scale))

    W_pad = jnp.concatenate([W, jnp.zeros((1, P, 3), W.dtype)])
    W_pt = W_pad[prob.pt_gather]
    W_cm = W_pad[prob.cam_gather]

    def matvec(x):
        ux = sm.mv(U_d, x)
        xg = jnp.concatenate([x, jnp.zeros((1, P), x.dtype)])[prob.cam_ind_pt]
        wtx = jnp.sum(sm.mtv(W_pt, xg), axis=1)
        z = sm.mv(Vinv, wtx)
        zg = jnp.concatenate([z, jnp.zeros((1, 3), z.dtype)])[prob.pts_ind_cam]
        wz = jnp.sum(sm.mv(W_cm, zg), axis=1)
        return ux - wz

    # block-Jacobi from the true Schur diagonal
    Vinv_cm = jnp.concatenate([Vinv, jnp.zeros((1, 3, 3), Vinv.dtype)])[
        prob.pts_ind_cam]
    Yc = sm.mm(W_cm, Vinv_cm)
    S_diag = U_d - jnp.sum(sm.mbt(Yc, W_cm), axis=1)
    prec_bj = jnp.linalg.inv((S_diag + jnp.eye(P, dtype=jnp.float32) * 1e-12).astype(jnp.float32))

    def coarse_apply(G):
        """Z = contiguous cluster indicator (x) I_P; returns v -> Z Einv Z^T v."""
        groups = np.minimum(np.arange(M) * G // M, G - 1)  # (M,)
        Zg = jnp.asarray(
            (groups[:, None] == np.arange(G)[None, :]).astype(np.float32))  # (M, G)
        slot_g = jnp.concatenate([Zg, jnp.zeros((1, G), jnp.float32)])[
            prob.cam_ind_pt]  # (N, Tp, G)
        # Wsum_g[n] = sum_t W_pt[n,t] * Zg[cam, g] -> (N, G, P, 3)
        Wsum = jnp.einsum("ntpj,ntg->ngpj", W_pt, slot_g)
        E_top = jnp.einsum("mg,mpq,mh->gphq", Zg, U_d, Zg)
        E_bot = jnp.einsum("ngpi,nij,nhqj->gphq", Wsum, Vinv, Wsum)
        E = (E_top - E_bot).reshape(G * P, G * P)
        Einv = jnp.linalg.inv(E + jnp.eye(G * P, dtype=jnp.float32) * 1e-12)

        def apply(v):  # (M, P)
            vc = (Zg.T @ v).reshape(-1)  # (G*P,)
            out = (Einv @ vc).reshape(G, P)
            return Zg @ out  # (M, P)

        return apply

    def pcg_steps(prec_fns, tol=1e-2, max_it=400):
        def apply_prec(r_):
            out = sm.mv(prec_bj, r_)
            for f in prec_fns:
                out = out + f(r_)
            return out

        @jax.jit
        def run(b):
            x = jnp.zeros_like(b)
            r = b
            z = apply_prec(r)
            pv = z
            rz = jnp.sum(r * z)
            rr0 = jnp.sum(b * b)

            def cond(st):
                _, r, _, _, it = st
                return (jnp.sum(r * r) > tol * tol * rr0) & (it < max_it)

            def body(st):
                x, r, pv, rz, it = st
                Ap = matvec(pv)
                denom = jnp.sum(pv * Ap)
                alpha = rz / jnp.where(jnp.abs(denom) < 1e-30, 1.0, denom)
                x = x + alpha * pv
                r = r - alpha * Ap
                z = apply_prec(r)
                rz_new = jnp.sum(r * z)
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1.0, rz)
                return x, r, z + beta * pv, rz_new, it + 1

            x, r, _, _, it = jax.lax.while_loop(cond, body, (x, r, pv, rz, 0))
            return it, jnp.sqrt(jnp.sum(r * r) / rr0)

        it, rel = jax.device_get(run(b))
        return int(it), float(rel)

    print("--- PCG steps to |r| <= 1e-2 |b| (cap 400) ---", flush=True)
    it, rel = pcg_steps([])
    print("  G=0  (block-Jacobi only): {:4d} steps (|r|/|b| {:.1e})".format(it, rel),
          flush=True)
    for G in (1, 4, 16, 64):
        if G > M:
            continue
        it, rel = pcg_steps([coarse_apply(G)])
        print("  G={:<3d} (+coarse cluster):  {:4d} steps (|r|/|b| {:.1e})".format(
            G, it, rel), flush=True)


if __name__ == "__main__":
    main()
