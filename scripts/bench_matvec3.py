"""Round-4 CG matvec rework candidates, measured on the real chip.

bench_matvec2.py showed the two index gathers ARE the matvec (x-gather
1.65 ms + z-gather 2.77 ms of a 4.3 ms fused step; every dense reduce is
~0.5 ms), and that TPU gathers move ~1 element/cycle regardless of table
size. The fix candidates here avoid gathers entirely:

  aos      — the shipped dual-layout matvec (reference)
  cheap    — aos + clamp/mask indices (no concat copy) + bf16 W + V^-1/2
             folded into W (kills the Vinv stage; symmetric bf16 rounding)
  zpad8    — aos with the z table padded to 8 f32 columns: distinguishes
             per-ROW from per-ELEMENT gather cost (if rows, free; if
             elements, 2.7x slower)
  onehot2  — NO gathers: pt-major layout only. Both cross-layout moves
             (x into obs order, obs contributions into camera order) are
             two-level one-hot matmuls over the camera axis: with
             c = 64*hi + lo, a (K',64) one-hot of lo rides the MXU against
             a (64, H*P) re-tiled x table, and a (K',H) hi mask selects;
             the camera-side reduction is the transposed same trick.
             W appears only in its aligned pt-major layout (bf16, folded).

Also runs a 60-step PCG (block-Jacobi) on the REAL Schur system with the
aos-f32 and onehot2-bf16 matvecs and prints both residual curves: the
one-hot path rounds x to bf16 every step (a mildly non-fixed operator),
and this check shows whether CG convergence degrades.

Usage: python scripts/bench_matvec3.py
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
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(M, P)), jnp.float32)

    W_pad = jnp.concatenate([W, jnp.zeros((1, P, 3), W.dtype)])
    W_pt = jax.device_put(W_pad[prob.pt_gather])   # (N, Tp, P, 3)
    W_cm = jax.device_put(W_pad[prob.cam_gather])  # (M, Tc, P, 3)

    def chain(f, x_init, n=R):
        @jax.jit
        def run(x):
            def body(i, x):
                y = f(x)
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return jax.lax.fori_loop(0, n, body, x)

        return run

    # ---- aos reference ----
    def mv_aos(x):
        ux = sm.mv(U_d, x)
        xg = jnp.concatenate([x, jnp.zeros((1, P), x.dtype)])[prob.cam_ind_pt]
        wtx = jnp.sum(sm.mtv(W_pt, xg), axis=1)
        z = sm.mv(Vinv, wtx)
        zg = jnp.concatenate([z, jnp.zeros((1, 3), z.dtype)])[prob.pts_ind_cam]
        wz = jnp.sum(sm.mv(W_cm, zg), axis=1)
        return ux - wz

    # ---- folded W-hat = W L with L = chol(Vinv), both layouts ----
    Lc = jnp.linalg.cholesky(
        0.5 * (Vinv + jnp.swapaxes(Vinv, -1, -2))
        + 1e-20 * jnp.eye(3, dtype=Vinv.dtype)
    )  # (N, 3, 3)
    Wh_pt = sm.mm(W_pt, Lc[:, None])              # (N, Tp, P, 3)
    Lc_pad = jnp.concatenate([Lc, jnp.zeros((1, 3, 3), Lc.dtype)])
    Wh_cm = sm.mm(W_cm, Lc_pad[prob.pts_ind_cam])  # (M, Tc, P, 3)
    Wh_pt16 = Wh_pt.astype(jnp.bfloat16)
    Wh_cm16 = Wh_cm.astype(jnp.bfloat16)

    ci_clamp = jnp.minimum(prob.cam_ind_pt, M - 1)
    ci_mask = (prob.cam_ind_pt < M).astype(jnp.float32)[..., None]
    pi_clamp = jnp.minimum(prob.pts_ind_cam, N - 1)

    # ---- cheap: clamp/mask + bf16 W + folded; Krylov vector stays f32
    # (rounding x per step makes the operator non-fixed and CG diverges —
    # measured; only the FIXED operand W is rounded) ----
    def mv_cheap(x):
        ux = sm.mv(U_d, x)
        xg = x[ci_clamp] * ci_mask
        what = jnp.sum(sm.mtv(Wh_pt16.astype(jnp.float32), xg), axis=1)  # (N, 3)
        whg = what[pi_clamp]  # sentinel rows hit Wh_cm=0
        wz = jnp.sum(sm.mv(Wh_cm16.astype(jnp.float32), whg), axis=1)
        return ux - wz

    # ---- zpad8: gather-cost model probe ----
    def mv_zpad8(x):
        ux = sm.mv(U_d, x)
        xg = jnp.concatenate([x, jnp.zeros((1, P), x.dtype)])[prob.cam_ind_pt]
        wtx = jnp.sum(sm.mtv(W_pt, xg), axis=1)
        z = sm.mv(Vinv, wtx)
        z8 = jnp.concatenate(
            [z, jnp.zeros((N, 5), z.dtype)], axis=1)
        zg = jnp.concatenate([z8, jnp.zeros((1, 8), z.dtype)])[prob.pts_ind_cam]
        wz = jnp.sum(sm.mv(W_cm, zg[..., :3]), axis=1)
        return ux - wz

    # ---- onehot2: two-level one-hot MXU, pt-major only ----
    LO = 64
    H = -(-(M + 1) // LO)
    Mpad = H * LO
    c_flat = jnp.asarray(np.asarray(prob.cam_ind_pt).reshape(-1))  # (K',), sentinel M
    lo = (c_flat % LO).astype(jnp.int32)
    hi = (c_flat // LO).astype(jnp.int32)
    oh_lo = (lo[:, None] == jnp.arange(LO, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    mask_hi = (hi[:, None] == jnp.arange(H, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    Kf = int(c_flat.shape[0])
    print("onehot2: K'={} LO={} H={} (oh_lo {:.0f} MB bf16)".format(
        Kf, LO, H, Kf * LO * 2 / 1e6), flush=True)
    Wh_flat16 = Wh_pt16.reshape(Kf, P, 3)

    def splitn(v, n):
        """n-term bf16 split: v ~ sum of n bf16 terms, each fetched EXACTLY
        by a one-hot dot (single product). n=2 leaves ~2^-18 relative noise
        (CG-amplified by the system's conditioning); n=3 is f32-exact
        (~2^-27), putting the gather-by-matmul at CG's own roundoff."""
        terms = []
        rem = v
        for _ in range(n):
            t = rem.astype(jnp.bfloat16)
            terms.append(t)
            rem = rem - t.astype(v.dtype)
        return terms

    def make_onehot(n_split):
        def mv(x):
            ux = sm.mv(U_d, x)
            xpad = jnp.zeros((Mpad, P), x.dtype).at[:M].set(x)
            xmat = xpad.reshape(H, LO, P).transpose(1, 0, 2).reshape(LO, H * P)
            xs = jnp.concatenate(splitn(xmat, n_split), axis=1)
            xcand = jax.lax.dot(oh_lo, xs,
                                preferred_element_type=jnp.bfloat16)
            xg_s = xcand.reshape(Kf, n_split, H, P).astype(jnp.float32)
            xg = jnp.sum(xg_s.sum(axis=1) * mask_hi[:, :, None].astype(
                jnp.float32), axis=1)  # (K', P)
            what = jnp.sum(
                sm.mtv(Wh_pt16.astype(jnp.float32), xg.reshape(N, Tp, P)), axis=1
            )
            y = sm.mv(Wh_flat16.astype(jnp.float32),
                      jnp.repeat(what, Tp, axis=0))  # (K', P)
            ys = jnp.stack(splitn(y, n_split), axis=1)  # (K', n, P)
            Y2 = (ys[:, :, None, :] * mask_hi[:, None, :, None]).reshape(
                Kf, n_split * H * P)
            wzmat = jnp.einsum("kl,kq->lq", oh_lo, Y2,
                               preferred_element_type=jnp.float32)
            wz_s = wzmat.reshape(LO, n_split, H, P)
            wz = wz_s.sum(axis=1).transpose(1, 0, 2).reshape(Mpad, P)[:M]
            return ux - wz

        return mv

    oh_lo32 = oh_lo.astype(jnp.float32)

    def mv_onehot_f32(x):
        ux = sm.mv(U_d, x)
        xpad = jnp.zeros((Mpad, P), x.dtype).at[:M].set(x)
        xmat = xpad.reshape(H, LO, P).transpose(1, 0, 2).reshape(LO, H * P)
        xcand = jax.lax.dot(oh_lo32, xmat,
                            preferred_element_type=jnp.float32)
        xg = jnp.sum(xcand.reshape(Kf, H, P) * mask_hi[:, :, None].astype(
            jnp.float32), axis=1)
        what = jnp.sum(
            sm.mtv(Wh_pt16.astype(jnp.float32), xg.reshape(N, Tp, P)), axis=1)
        y = sm.mv(Wh_flat16.astype(jnp.float32), jnp.repeat(what, Tp, axis=0))
        Y2 = (y[:, None, :] * mask_hi[:, :, None].astype(jnp.float32)).reshape(
            Kf, H * P)
        wzmat = jnp.einsum("kl,kq->lq", oh_lo32, Y2,
                           preferred_element_type=jnp.float32)
        wz = wzmat.reshape(LO, H, P).transpose(1, 0, 2).reshape(Mpad, P)[:M]
        return ux - wz

    variants = {"aos": mv_aos, "cheap": mv_cheap, "zpad8": mv_zpad8,
                "onehot2": make_onehot(2), "onehot3": make_onehot(3),
                "onehot_f32": mv_onehot_f32}
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
        print("  {:8s} rel-err vs aos: {:.2e}".format(name, err), flush=True)
    print("per-matvec:", {k: "{:.3f} ms".format(v * 1e3) for k, v in times.items()},
          flush=True)

    # ---- CG convergence: does the bf16/rounded operator stall PCG? ----
    print("--- 60-step PCG residual curves (block-Jacobi prec) ---", flush=True)
    Vinv_cm = jnp.concatenate([Vinv, jnp.zeros((1, 3, 3), Vinv.dtype)])[
        prob.pts_ind_cam]
    Yc = sm.mm(W_cm, Vinv_cm)
    S_diag = U_d - jnp.sum(sm.mbt(Yc, W_cm), axis=1)
    prec = jnp.linalg.inv((S_diag + jnp.eye(P) * 1e-12).astype(jnp.float32))
    b = jnp.asarray(rng.normal(size=(M, P)), jnp.float32)

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
            x, r, _, _, hist = jax.lax.fori_loop(0, 60, body, (x, r, pv, rz, hist0))
            return hist

        return np.asarray(jax.device_get(run(b)))

    for name in ("aos", "cheap", "onehot2", "onehot3", "onehot_f32"):
        h = pcg_curve(variants[name])
        rel = h / h[0]
        print("  {:8s} |r|/|b| @ [10,20,30,40,50,60]: ".format(name)
              + " ".join("{:.2e}".format(rel[i]) for i in (10, 20, 30, 40, 50, 60)),
              flush=True)


if __name__ == "__main__":
    main()
