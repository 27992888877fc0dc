"""Decompose the CG matvec cost + measure dense-Schur alternatives.

bench_matvec.py falsified the layout hypotheses (SoA and cm-major are
SLOWER than the shipped AoS dual-layout on the real TPU). This bench
answers two follow-ups:

1. WHERE do the 4.3 ms/matvec go? Each stage of the aos matvec is timed
   in isolation (chained on its own output so XLA cannot fuse across the
   measured boundary).
2. Would a DENSE reduced camera system win at 1000 cams? S is only
   (MP, MP) = 3000x3000 = 36 MB: a dense matvec is ~50 us at HBM roof,
   and a Cholesky factorization + solve replaces the whole CG loop with
   an EXACT step. The unknown is assembly cost (segment-sum over 3.2M
   intra-track pairs into 1M camera-pair segments) — measured here.

Usage: python scripts/bench_matvec2.py   (runs on the default backend)
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


def timed(label, fn, repeats=10, divisor=1):
    fn()
    samples = []
    for _ in range(repeats):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    samples.sort()
    med = samples[len(samples) // 2] / divisor
    print("  {:44s} {:9.3f} ms".format(label, med * 1e3), flush=True)
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
    Tc = prob.cam_gather.shape[1]

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
        """n repetitions of f, renormalized, one compiled dispatch."""

        @jax.jit
        def run(x):
            def body(i, x):
                y = f(x)
                return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return jax.lax.fori_loop(0, n, body, x)

        return lambda: sync(run(x_init))

    print("--- aos matvec stage decomposition ({}x chains) ---".format(R), flush=True)

    # stage 1: x-gather (small table M+1) -> (N, Tp, P); chain via re-reduce
    def s1(x):
        xg = jnp.concatenate([x, jnp.zeros((1, P), x.dtype)])[prob.cam_ind_pt]
        return x * (1.0 + 1e-12 * xg[0, 0, 0])  # carry keeps x's type

    timed("x-gather (M+1 table -> N,Tp,P)", chain(s1, x0), divisor=R)

    # stage 2: track reduce mtv(W_pt, xg) given PRE-GATHERED xg
    xg0 = jnp.concatenate([x0, jnp.zeros((1, P), x0.dtype)])[prob.cam_ind_pt]

    def s2(xg):
        wtx = jnp.sum(sm.mtv(W_pt, xg), axis=1)  # (N, 3)
        return xg * (1.0 + 1e-12 * wtx[0, 0])  # carry shape (N,Tp,P)

    timed("track reduce sum(mtv(W_pt,xg))", chain(s2, xg0), divisor=R)

    # stage 3: Vinv apply
    wtx0 = jnp.sum(sm.mtv(W_pt, xg0), axis=1)

    def s3(wtx):
        return sm.mv(Vinv, wtx)

    timed("Vinv apply (N,3)", chain(s3, wtx0), divisor=R)

    # stage 4: z-gather (N+1 table -> M,Tc,3)
    z0 = sm.mv(Vinv, wtx0)

    def s4(z):
        zg = jnp.concatenate([z, jnp.zeros((1, 3), z.dtype)])[prob.pts_ind_cam]
        return z * (1.0 + 1e-12 * zg[0, 0, 0])  # carry keeps z's type

    timed("z-gather (N+1 table -> M,Tc,3)", chain(s4, z0), divisor=R)

    # stage 5: camera reduce sum(mv(W_cm, zg))
    zg0 = jnp.concatenate([z0, jnp.zeros((1, 3), z0.dtype)])[prob.pts_ind_cam]

    def s5(zg):
        wz = jnp.sum(sm.mv(W_cm, zg), axis=1)  # (M, P)
        return zg * (1.0 + 1e-12 * wz[0, 0])

    timed("cam reduce sum(mv(W_cm,zg))", chain(s5, zg0), divisor=R)

    # full aos matvec reference + clamp/mask variant (no concat copies)
    def mv_aos(x):
        ux = sm.mv(U_d, x)
        xg = jnp.concatenate([x, jnp.zeros((1, P), x.dtype)])[prob.cam_ind_pt]
        wtx = jnp.sum(sm.mtv(W_pt, xg), axis=1)
        z = sm.mv(Vinv, wtx)
        zg = jnp.concatenate([z, jnp.zeros((1, 3), z.dtype)])[prob.pts_ind_cam]
        wz = jnp.sum(sm.mv(W_cm, zg), axis=1)
        return ux - wz

    timed("FULL aos matvec", chain(mv_aos, x0), divisor=R)

    ci_clamp = jnp.minimum(prob.cam_ind_pt, M - 1)
    ci_mask = (prob.cam_ind_pt < M).astype(jnp.float32)[..., None]
    pi_clamp = jnp.minimum(prob.pts_ind_cam, N - 1)
    pi_mask = (prob.pts_ind_cam < N).astype(jnp.float32)[..., None]

    def mv_mask(x):
        ux = sm.mv(U_d, x)
        xg = x[ci_clamp] * ci_mask
        wtx = jnp.sum(sm.mtv(W_pt, xg), axis=1)
        z = sm.mv(Vinv, wtx)
        zg = z[pi_clamp] * pi_mask
        wz = jnp.sum(sm.mv(W_cm, zg), axis=1)
        return ux - wz

    timed("aos matvec, clamp+mask (no concat)", chain(mv_mask, x0), divisor=R)

    # bf16 W variant (halves W bytes; CG solves the consistently-rounded
    # system, LM absorbs the step perturbation)
    W_pt16 = W_pt.astype(jnp.bfloat16)
    W_cm16 = W_cm.astype(jnp.bfloat16)

    def mv_bf16(x):
        ux = sm.mv(U_d, x)
        xg = (jnp.concatenate([x, jnp.zeros((1, P), x.dtype)])[prob.cam_ind_pt]
              ).astype(jnp.bfloat16)
        wtx = jnp.sum(sm.mtv(W_pt16, xg).astype(jnp.float32), axis=1)
        z = sm.mv(Vinv, wtx)
        zg = (jnp.concatenate([z, jnp.zeros((1, 3), z.dtype)])[prob.pts_ind_cam]
              ).astype(jnp.bfloat16)
        wz = jnp.sum(sm.mv(W_cm16, zg).astype(jnp.float32), axis=1)
        return ux - wz

    timed("aos matvec, bf16 W", chain(mv_bf16, x0), divisor=R)

    print("--- dense reduced system alternative ---", flush=True)

    # dense S matvec at (MP, MP): what CG costs per step IF S is assembled
    S_rand = jnp.asarray(rng.normal(size=(M * P, M * P)), jnp.float32)
    x_flat = x0.reshape(-1)

    def mv_dense(xf):
        return S_rand @ xf

    timed("dense S matvec (MP x MP)", chain(mv_dense, x_flat), divisor=R)

    # Cholesky + solve (replaces ALL CG steps with an exact step)
    @jax.jit
    def chol_solve(S, b):
        L = jnp.linalg.cholesky(S + jnp.eye(M * P) * 1e3)  # keep it SPD
        return jax.scipy.linalg.cho_solve((L, True), b)

    timed("cholesky+solve (MP x MP)", lambda: sync(chol_solve(S_rand, x_flat)))

    # assembly: pair-based contrib + segment_sum (the existing dense path)
    pair_k1 = jnp.asarray(prob.pair_k1)
    pair_k2 = jnp.asarray(prob.pair_k2)
    pair_seg = jnp.asarray(
        np.asarray(prob.cam_ind)[np.asarray(prob.pair_k1)].astype(np.int64) * M
        + np.asarray(prob.cam_ind)[np.asarray(prob.pair_k2)]
    )
    print("  Q (intra-track pairs) = {}".format(int(pair_k1.shape[0])), flush=True)

    @jax.jit
    def assemble_segsum(W, Vinv):
        Y = sm.mm(W, Vinv[prob.pts_ind])
        contrib = sm.mbt(Y[pair_k1], W[pair_k2])  # (Q, P, P)
        S_off = jax.ops.segment_sum(contrib, pair_seg, num_segments=M * M)
        return S_off.reshape(M, M, P, P)

    try:
        timed("assembly: pair contrib + segment_sum", lambda: sync(assemble_segsum(W, Vinv)))
    except Exception as e:
        print("  assembly segment_sum FAILED: {}".format(str(e)[:200]), flush=True)

    # assembly via sorted segments hint
    order = np.argsort(np.asarray(pair_seg), kind="stable")
    pk1_s = jnp.asarray(np.asarray(pair_k1)[order])
    pk2_s = jnp.asarray(np.asarray(pair_k2)[order])
    seg_s = jnp.asarray(np.asarray(pair_seg)[order])

    @jax.jit
    def assemble_sorted(W, Vinv):
        Y = sm.mm(W, Vinv[prob.pts_ind])
        contrib = sm.mbt(Y[pk1_s], W[pk2_s])
        S_off = jax.ops.segment_sum(
            contrib, seg_s, num_segments=M * M, indices_are_sorted=True
        )
        return S_off.reshape(M, M, P, P)

    try:
        timed("assembly: sorted segment_sum", lambda: sync(assemble_sorted(W, Vinv)))
    except Exception as e:
        print("  assembly sorted FAILED: {}".format(str(e)[:200]), flush=True)

    # assembly via host-built off-diagonal gather table (scatter-free):
    # diagonal handled by the existing S_diag path
    seg_np = np.asarray(pair_seg)
    k1_np = np.asarray(pair_k1)
    off_mask = (seg_np // M) != (seg_np % M)
    seg_off = seg_np[off_mask]
    Q_off = int(off_mask.sum())
    counts = np.bincount(seg_off, minlength=M * M)
    T2 = max(int(counts.max()), 1)
    print("  off-diag pairs {} | max multiplicity T2 = {} | table {:.0f} MB".format(
        Q_off, T2, M * M * T2 * 4 / 1e6), flush=True)
    if M * M * T2 * 4 <= 2e9:
        # (M*M, T2) gather table over the off-diagonal contrib rows
        table = np.full((M * M, T2), Q_off, np.int64)
        ord2 = np.argsort(seg_off, kind="stable")
        starts = np.concatenate([[0], np.cumsum(np.bincount(seg_off, minlength=M * M))])[:-1]
        col = np.arange(Q_off) - starts[seg_off[ord2]]
        table[seg_off[ord2], col] = ord2
        table = jnp.asarray(table.reshape(M, M, T2))
        pk1_off = jnp.asarray(k1_np[off_mask])
        pk2_off = jnp.asarray(np.asarray(pair_k2)[off_mask])

        @jax.jit
        def assemble_table(W, Vinv):
            Y = sm.mm(W, Vinv[prob.pts_ind])
            contrib = sm.mbt(Y[pk1_off], W[pk2_off])  # (Q_off, P, P)
            pad = jnp.zeros((1, P, P), contrib.dtype)
            return jnp.concatenate([contrib, pad])[table].sum(axis=2)

        try:
            timed("assembly: off-diag gather table", lambda: sync(assemble_table(W, Vinv)))
        except Exception as e:
            print("  assembly table FAILED: {}".format(str(e)[:200]), flush=True)


if __name__ == "__main__":
    main()
