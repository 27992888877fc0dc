"""Microbenchmark of the Schur-complement CG matvec at BA-problem scale.

The round-3 device trace (BENCHMARKS.md) attributed ~3.5 ms of each 3.8 ms
CG step at 1000 cams / 800k obs to the two dual-layout reduction fusions
(1.18 + 1.05 ms) plus ~1.3 ms of K-sized gather copies/pads. 29 MB of W
bytes per fusion at >1 ms is ~25 GB/s — far off the HBM roof, because the
operands are AoS (..., P, 3): the tiny trailing dims land in the lane /
sublane axes of the (8, 128) VPU tiles, wasting >90% of every memory
transaction and vector op.

This bench times matvec VARIANTS on the same operands so the layout
question is settled by measurement:

  aos   — the shipped dual-layout matvec (ops/lm.py, round 3)
  soa   — same algorithm, operands transposed once per LM step to
          component-major SoA: W_pt (P, 3, Tp, N), W_cm (P, 3, Tc, M),
          index tables transposed likewise, so every multiply-add and
          reduction runs over a full-lane batch-minor axis and every
          gather output is batch-minor
  cm    — camera-major-only W (LMProblem.cm_slot_pt design note): x-side
          needs NO gather (x is constant along a camera row); the track
          regroup gathers 3-vectors from the flattened camera-major wtx

Usage:
    SATBA_BENCH_CAMS=1000 SATBA_BENCH_PTS=200000 python scripts/bench_matvec.py
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


def timed(label, fn, repeats=20):
    fn()  # compile
    samples = []
    for _ in range(repeats):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    samples.sort()
    med = samples[len(samples) // 2]
    print("  {:34s} {:9.3f} ms  (min {:.3f} / max {:.3f})".format(
        label, med * 1e3, samples[0] * 1e3, samples[-1] * 1e3), flush=True)
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
    n_cg = int(os.environ.get("SATBA_BENCH_CG", 54))  # steps per timed dispatch
    print("platform={} cams={} pts={} obs={} cg_chain={}".format(
        jax.default_backend(), n_cam, n_pts, n_pts * obs_per_pt, n_cg), flush=True)

    scene = make_scene_arrays(n_cam=n_cam, n_pts=n_pts, obs_per_pt=obs_per_pt,
                              rot_scale=2e-5, noise_px=0.1, seed=0)
    p = scene_to_baparams(scene, noise_pts=1.0)
    solver = BASolver(p)
    prob = solver.prob
    P = p.n_params
    K = p.n_obs
    N, M = p.n_pts, p.n_cam
    Tp = prob.pt_gather.shape[1]
    Tc = prob.cam_gather.shape[1]
    print("P={} K={} Tp={} Tc={} pad_pt={:.2f} pad_cm={:.2f}".format(
        P, K, Tp, Tc, N * Tp / K, M * Tc / K), flush=True)

    # realistic W, Vinv, U from the problem's own Jacobians at x0
    cam0 = jnp.asarray(p.opt_block())
    pts0 = jnp.asarray(p.pts3d)
    r, J_cam, J_pt = solver.jac_fn(cam0, pts0)
    cfg = lm_ops.LMConfig(schur_mode="cg")
    _, g_cam, g_pt, U, V, W = lm_ops._normal_blocks(
        r, J_cam, J_pt, prob, M, N, cfg)
    lam = 1e-4
    U_d = lm_ops._damp(U, lam).astype(jnp.float32)
    V_d = lm_ops._damp(V, lam)
    Vinv = lm_ops._inv3x3(V_d).astype(jnp.float32)
    W = W.astype(jnp.float32)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(M, P)), jnp.float32)

    # ---- variant "aos": the shipped dual-layout matvec ----
    def make_aos():
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

        return (W_pt, W_cm), matvec

    # ---- variant "soa": component-major layouts ----
    # host-side transposed index tables (built once per problem)
    cam_ind_pt_T = jnp.asarray(np.asarray(prob.cam_ind_pt).T)  # (Tp, N)
    pts_ind_cam_T = jnp.asarray(np.asarray(prob.pts_ind_cam).T)  # (Tc, M)

    def make_soa():
        W_pad = jnp.concatenate([W, jnp.zeros((1, P, 3), W.dtype)])
        # (P, 3, Tp, N) and (P, 3, Tc, M): batch axis minor -> full lanes
        W_pt = W_pad[prob.pt_gather].transpose(2, 3, 1, 0)
        W_cm = W_pad[prob.cam_gather].transpose(2, 3, 1, 0)
        Vinv_s = Vinv.transpose(1, 2, 0)  # (3, 3, N)

        def matvec(x):
            ux = sm.mv(U_d, x)
            xt = jnp.concatenate([x, jnp.zeros((1, P), x.dtype)]).T  # (P, M+1)
            xc = xt[:, cam_ind_pt_T]  # (P, Tp, N)
            # wtx[j] = sum_{p,t} W_pt[p,j,t,:] * xc[p,t,:]
            wtx = jnp.stack([
                sum(W_pt[pp, j] * xc[pp] for pp in range(P)).sum(axis=0)
                for j in range(3)
            ])  # (3, N)
            z = jnp.stack([
                sum(Vinv_s[j, jj] * wtx[jj] for jj in range(3)) for j in range(3)
            ])  # (3, N)
            zt = jnp.concatenate([z, jnp.zeros((3, 1), z.dtype)], axis=1)
            zg = zt[:, pts_ind_cam_T]  # (3, Tc, M)
            wz = jnp.stack([
                sum(W_cm[pp, j] * zg[j] for j in range(3)).sum(axis=0)
                for pp in range(P)
            ])  # (P, M)
            return ux - wz.T

        return (W_pt, W_cm), matvec

    # ---- variant "cm": camera-major W only + flat track regroup ----
    # host-built cm_slot_pt: flattened camera-major slot of each track-major
    # slot (sentinel M*Tc); composition of the two padded layouts
    cam_g = np.asarray(prob.cam_gather)  # (M, Tc) obs ids, sentinel K
    slot_of_obs = np.full(K + 1, M * Tc, np.int64)
    mm_, tt_ = np.nonzero(cam_g < K)
    slot_of_obs[cam_g[mm_, tt_]] = mm_ * Tc + tt_
    pt_g = np.asarray(prob.pt_gather)  # (N, Tp) obs ids, sentinel K
    cm_slot_pt = jnp.asarray(slot_of_obs[np.minimum(pt_g, K)] * (pt_g < K)
                             + (M * Tc) * (pt_g >= K))  # (N, Tp)

    def make_cm():
        W_pad = jnp.concatenate([W, jnp.zeros((1, P, 3), W.dtype)])
        W_cm = W_pad[prob.cam_gather]  # (M, Tc, P, 3)

        def matvec(x):
            ux = sm.mv(U_d, x)
            wtx_cm = sm.mtv(W_cm, x[:, None, :])  # (M, Tc, 3), no gather
            flat = jnp.concatenate(
                [wtx_cm.reshape(M * Tc, 3), jnp.zeros((1, 3), x.dtype)])
            wtx = flat[cm_slot_pt].sum(axis=1)  # (N, 3)
            z = sm.mv(Vinv, wtx)
            zg = jnp.concatenate([z, jnp.zeros((1, 3), z.dtype)])[prob.pts_ind_cam]
            wz = jnp.sum(sm.mv(W_cm, zg), axis=1)
            return ux - wz

        return (W_cm,), matvec

    # ---- chain n_cg matvecs in one compiled dispatch (like the CG loop) ----
    variants = {"aos": make_aos, "soa": make_soa, "cm": make_cm}
    results = {}
    outs = {}
    for name, make in variants.items():
        ops, matvec = make()

        @jax.jit
        def chain(x, ops=ops, matvec=matvec):
            def body(i, x):
                y = matvec(x)
                # renormalize so the chain doesn't over/underflow
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return jax.lax.fori_loop(0, n_cg, body, x)

        outs[name] = np.asarray(jax.device_get(chain(x0)))
        t = timed("{} ({} matvecs)".format(name, n_cg), lambda: sync(chain(x0)))
        results[name] = t / n_cg

    ref = outs["aos"]
    for name, o in outs.items():
        err = float(np.max(np.abs(o - ref)) / max(np.max(np.abs(ref)), 1e-30))
        print("  {:6s} rel-err vs aos: {:.2e}".format(name, err), flush=True)

    print("per-matvec:", {k: "{:.3f} ms".format(v * 1e3) for k, v in results.items()},
          flush=True)


if __name__ == "__main__":
    main()
