"""Levenberg-Marquardt with Schur-complement elimination of tie points.

This is the TPU-native replacement of the reference's solver, which calls
scipy.optimize.least_squares(method="trf", jac_sparsity=A) with *finite
difference* Jacobians (reference: bundle_adjust/ba_core.py:244-332, sparsity
pattern built at ba_core.py:186-219). Design changes, deliberate:

* analytic/AD block Jacobians (2x P per camera, 2x3 per point) instead of
  finite differencing — exact and one fused batched computation;
* explicit LM with Marquardt diagonal scaling (the analog of scipy's
  x_scale='jac') instead of TRF;
* the camera-reduced normal system is formed by eliminating each 3x3
  tie-point block (classic Schur trick: MegBA, PBA and other GPU BA systems
  use the same structure) with two interchangeable backends:
    - "dense": assemble the (P*M, P*M) reduced camera matrix with segment
      sums over intra-track observation pairs and solve by Cholesky. Right
      for M up to a few hundred cameras — it is a single MXU-friendly solve.
    - "cg": matrix-free preconditioned conjugate gradient on the Schur
      complement; every matvec is two gathers + two segment-sums, which is
      exactly the form that shards over a device mesh with a single psum
      (see sat_bundleadjust_tpu/parallel/dist_solver.py).

All structural index sets (observation tables, intra-track pair lists) are
precomputed host-side; device code has static shapes and no data-dependent
control flow.
"""

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sat_bundleadjust_tpu.ops.robust import loss_cost, loss_scale
from sat_bundleadjust_tpu.ops import smallmat as sm


class LMProblem(NamedTuple):
    """Static problem structure for one BA solve (all arrays device-ready)."""

    pts_ind: jnp.ndarray  # (K,) int
    cam_ind: jnp.ndarray  # (K,) int
    pts2d: jnp.ndarray  # (K, 2)
    weights: jnp.ndarray  # (K,)
    cam_opt_mask: jnp.ndarray  # (M,) 1.0 where camera is optimized
    pts_opt_mask: jnp.ndarray  # (N,) 1.0 where point is optimized
    pair_k1: jnp.ndarray  # (Q,) obs-pair lists for dense Schur assembly
    pair_k2: jnp.ndarray  # (Q,)
    # optional scatter-free segment-sum tables (build_gather_segments):
    # padded (segment, slot) -> obs index, sentinel K for empty slots.
    # TPU lowers scatter-adds (segment_sum) to serialized updates; a padded
    # gather + dense reduce runs at memory bandwidth instead. None -> fall
    # back to jax.ops.segment_sum (e.g. inside shard_map where the index
    # arrays are traced values).
    pt_gather: jnp.ndarray = None  # (N, Tp) int32 or None
    cam_gather: jnp.ndarray = None  # (M, Tc) int32 or None
    # (N, M) int32 obs lookup (sentinel K): a track observes each camera at
    # most once, so the Schur off-diagonal assembles as ONE (MP, 3N) x
    # (3N, MP) matmul on the MXU instead of per-pair segment sums. Built
    # only when N*M is small enough to afford the table (build_problem).
    obs_at: jnp.ndarray = None
    # dual padded observation layouts for the CG matvec (build_problem):
    # cam_ind_pt (N, Tp) = camera index of each track-major slot (sentinel
    # M) and pts_ind_cam (M, Tc) = point index of each camera-major slot
    # (sentinel N). With W materialized in BOTH layouts once per LM step,
    # each CG matvec becomes two dense axis-reductions + two row gathers —
    # profiled 3x cheaper than segment-sum/gather-table reductions at
    # 1000 cams / 800k obs, where the matvec dominated the whole solve.
    cam_ind_pt: jnp.ndarray = None
    pts_ind_cam: jnp.ndarray = None
    # (N, Tp) int32: flattened camera-major slot (m * Tc + t, sentinel
    # M * Tc) of each track-major observation slot. Enables the CM-MAJOR
    # matvec (round 4): W is materialized in the camera-major layout ONLY,
    # W^T x needs NO gather at all (x is constant along each camera row),
    # and the track-side regroup gathers 3-vectors instead of P-vectors.
    # Per CG step this removes the (N, Tp, P) x-gather and halves the W
    # bytes read — the round-3 device trace attributed ~35% of the
    # 1000-camera CG step to exactly these K-sized gather copies/pads.
    cm_slot_pt: jnp.ndarray = None


class LMConfig(NamedTuple):
    loss: str = "linear"
    f_scale: float = 1.0
    max_iter: int = 100
    ftol: float = 1e-4
    xtol: float = 1e-10
    lambda0: float = 1e-3
    lambda_up: float = 5.0
    lambda_down: float = 3.0
    schur_mode: str = "dense"  # "dense" | "cg"
    # truncated inexact Newton: with the Schur-diagonal block-Jacobi
    # preconditioner a modest CG budget per LM step suffices for a descent
    # direction (LM damping absorbs the step error; same practice as
    # Ceres/PBA's ITERATIVE_SCHUR). The useful budget grows with the
    # camera count — measured: cap 15 is wall-optimal at 50 cameras (no
    # extra LM iterations) but triples the LM iteration count at 120,
    # where cap 60 wins. 0 = resolve to clip(n_cam // 2, 15, 60) at
    # build_solve time.
    cg_iters: int = 0
    # forcing term: CG also stops at ||r|| <= cg_rtol * ||b||
    cg_rtol: float = 1e-1
    # two-level preconditioner: add a coarse correction on the
    # "same-correction-for-every-camera" subspace to the block-Jacobi
    # preconditioner. The coarse modes (a global camera shift compensated
    # by the points) are the Schur complement's smallest eigenvalues and
    # per-camera Jacobi cannot damp them — at 1000 cameras CG stalls
    # against its step budget without this.
    cg_coarse: bool = True
    # number of contiguous camera clusters in the coarse level. 1 = the
    # round-3 global subspace (and the default: at the 1000-cam solve,
    # G>1 leaves the wall unchanged — CG is budget-capped either way —
    # and only adds per-LM-step coarse build cost, despite cutting PCG
    # step counts 139 -> 46 in isolated 300-cam mid-LM probes,
    # scripts/bench_coarse_k.py). Cameras cluster by index, which follows
    # acquisition-date order in real scenes. E is inverted through a
    # ridge-regularized Cholesky with a non-finite guard: at late-LM
    # damping, f32 cancellation in E = Z^T S Z can make it indefinite,
    # and an indefinite additive term DIVERGES the whole CG (measured at
    # 64 clusters) — the guard drops the coarse level for that step.
    cg_coarse_k: int = 1
    # CG matvec implementation: "auto" (default) resolves to the fused
    # one-hot Pallas kernel ("pallas", ops/pallas_matvec) on TPU when the
    # track-major slot width allows, and to the dual-layout XLA matvec
    # ("aos") elsewhere. Since the round-5 wide-accumulator rework the
    # kernel reaches the same optimum as the XLA matvec (0.098 px at
    # 1000 cams) at ~1.8x lower per-iteration wall on the v5e.
    # "twin_pm" / "twin_f64" / "twin_slice" are pure-jnp numerical twins
    # for CPU tests (pallas_matvec.schur_wz_twin).
    matvec: str = "auto"
    # COMMON_K (reference: ba_params.py:167-171): number of TRAILING
    # per-camera parameters tied to one shared value across all
    # optimizable cameras. Solved by projected CG (null-space method): the
    # orthogonal projector P averaging the tied block turns the Schur CG
    # into CG on P S P, whose subspace solution equals the tied-parameter
    # normal equations E^T S E y = E^T b. 0 = no tying.
    tie_tail: int = 0


def default_coarse_k(n_cam):
    """Default cluster count for the coarse CG level: G=1 (the global
    cluster). Multi-cluster coarse levels are opt-in via SATBA_CG_COARSE_K
    or LMConfig.cg_coarse_k — see the measurement note below."""
    env = os.environ.get("SATBA_CG_COARSE_K")
    if env is not None:
        return max(1, int(env))
    # measured at the 1000-cam solve (round 4): G>1 does not reduce the
    # wall (CG is budget-capped either way) and adds per-LM-step coarse
    # build cost — the G=64 step-count wins from the 300-cam mid-LM PCG
    # probes do not transfer. Default stays the global cluster.
    return 1


def build_intra_track_pairs(pts_ind, n_pts):
    """All ordered observation pairs (k1, k2) belonging to the same track.

    These index the subtraction term of the Schur complement:
        S[c(k1), c(k2)] -= Y_k1 @ W_k2^T
    Host-side precompute; Q = sum over tracks of (track length)^2."""
    pts_ind = np.asarray(pts_ind)
    order = np.argsort(pts_ind, kind="stable")
    sorted_pts = pts_ind[order]
    starts = np.searchsorted(sorted_pts, np.arange(n_pts), side="left")
    ends = np.searchsorted(sorted_pts, np.arange(n_pts), side="right")
    k1, k2 = [], []
    for s, e in zip(starts, ends):
        idx = order[s:e]
        if idx.size == 0:
            continue
        g1, g2 = np.meshgrid(idx, idx, indexing="ij")
        k1.append(g1.reshape(-1))
        k2.append(g2.reshape(-1))
    if not k1:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    return np.concatenate(k1).astype(np.int32), np.concatenate(k2).astype(np.int32)


def build_gather_segments(ind, n_segments):
    """Host-side (n_segments, T) padded index table turning segment_sum
    into gather + dense reduce; T = max segment size, pad value = len(ind)
    (a sentinel row of zeros is appended to the operand at use time)."""
    ind = np.asarray(ind)
    K = len(ind)
    counts = np.bincount(ind, minlength=n_segments)
    T = max(int(counts.max()) if K else 1, 1)
    order = np.argsort(ind, kind="stable")
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    table = np.full((n_segments, T), K, dtype=np.int32)
    col = np.arange(K) - starts[ind[order]]
    table[ind[order], col] = order
    return table


def gather_table_values(table, values, n_valid, fill):
    """Dual-layout index construction: map each REAL slot of a padded
    gather table (entries < n_valid) to values[slot], sentinel slots to
    `fill`. Used for LMProblem.cam_ind_pt / pts_ind_cam by both the
    single-chip builder (ba/solver.build_problem) and the per-shard
    distributed one (parallel/dist_solver.shard_observations)."""
    table = np.asarray(table)
    values = np.asarray(values, np.int32)
    if len(values) == 0 or n_valid <= 0:
        return np.full(table.shape, fill, np.int32)
    return np.where(
        table < n_valid, values[np.minimum(table, n_valid - 1)], np.int32(fill)
    ).astype(np.int32)


def _seg_sum(x, ind, n_segments, table):
    """segment_sum(x, ind) via the padded gather table when available."""
    if table is None:
        return jax.ops.segment_sum(x, ind, num_segments=n_segments)
    pad = jnp.zeros((1,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, pad], axis=0)[table].sum(axis=1)


def _seg_sum_pt(x, prob: LMProblem, n_pts):
    return _seg_sum(x, prob.pts_ind, n_pts, prob.pt_gather)


def _seg_sum_cam(x, prob: LMProblem, n_cam):
    return _seg_sum(x, prob.cam_ind, n_cam, prob.cam_gather)


def _inv3x3(V):
    """Batched closed-form 3x3 inverse (V assumed SPD after damping)."""
    a, b, c = V[..., 0, 0], V[..., 0, 1], V[..., 0, 2]
    d, e, f = V[..., 1, 0], V[..., 1, 1], V[..., 1, 2]
    g, h, i = V[..., 2, 0], V[..., 2, 1], V[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    inv = jnp.stack(
        [
            jnp.stack([A, B, C], axis=-1),
            jnp.stack([D, E, F], axis=-1),
            jnp.stack([G, H, I], axis=-1),
        ],
        axis=-2,
    )
    return inv / det[..., None, None]


def _normal_blocks(r, J_cam, J_pt, prob: LMProblem, n_cam, n_pts, cfg: LMConfig,
                   loss=None, f_scale=None):
    """Build gradient and normal-equation blocks from per-obs residuals.

    r: (K, 2); J_cam: (K, 2, P); J_pt: (K, 2, 3). The normal equations are
    built in the Jacobian's dtype (f32 by default — see ops/jacobians.py);
    the residual is cast down here, which only loses digits the normal
    equations cannot represent anyway.

    loss/f_scale override cfg's static values with traced operands (integer
    loss id / scalar) so one compiled program serves every robust loss."""
    dt = J_cam.dtype
    if loss is None:
        loss = cfg.loss
    if f_scale is None:
        f_scale = cfg.f_scale
    # robust IRLS scaling (computed on the full-precision residual)
    s = loss_scale(loss, r, f_scale).astype(dt)  # (K, 2)
    r = r.astype(dt) * s
    J_cam = J_cam * s[..., None]
    J_pt = J_pt * s[..., None]

    # mask frozen cameras / points (their Jacobian blocks vanish)
    J_cam = J_cam * prob.cam_opt_mask.astype(dt)[prob.cam_ind][:, None, None]
    J_pt = J_pt * prob.pts_opt_mask.astype(dt)[prob.pts_ind][:, None, None]

    g_cam = _seg_sum_cam(sm.mtv(J_cam, r), prob, n_cam)
    g_pt = _seg_sum_pt(sm.mtv(J_pt, r), prob, n_pts)
    U = _seg_sum_cam(sm.mtm(J_cam, J_cam), prob, n_cam)
    V = _seg_sum_pt(sm.mtm(J_pt, J_pt), prob, n_pts)
    W = sm.mtm(J_cam, J_pt)  # (K, P, 3)
    return r, g_cam, g_pt, U, V, W


def _damp(M_blocks, lam, floor=1e-12):
    """Marquardt multiplicative damping of block diagonals."""
    dt = M_blocks.dtype
    diag = jnp.diagonal(M_blocks, axis1=-2, axis2=-1)
    add = jnp.asarray(lam, dt) * jnp.maximum(diag, jnp.asarray(floor, dt)) + jnp.asarray(floor, dt)
    return M_blocks + jnp.eye(M_blocks.shape[-1], dtype=dt) * add[..., None, :]


def _schur_rhs(g_cam, g_pt, W, Vinv, prob, n_cam):
    """b = -g_cam + W V^-1 g_pt (reduced right-hand side)."""
    Yg = sm.mv(W, sm.mv(Vinv, g_pt)[prob.pts_ind])
    return -g_cam + _seg_sum_cam(Yg, prob, n_cam)


def _dense_schur_solve(U_d, W, Vinv, b, prob: LMProblem, n_cam, cam_opt_mask):
    """Assemble the dense reduced camera system and Cholesky-solve it."""
    P = U_d.shape[-1]
    Y = sm.mm(W, Vinv[prob.pts_ind])  # (K, P, 3)
    contrib = sm.mbt(Y[prob.pair_k1], W[prob.pair_k2])  # (Q, P, P)
    pair_seg = prob.cam_ind[prob.pair_k1] * n_cam + prob.cam_ind[prob.pair_k2]
    S_off = jax.ops.segment_sum(contrib, pair_seg, num_segments=n_cam * n_cam)
    S = -S_off.reshape(n_cam, n_cam, P, P)
    S = S + jnp.zeros_like(S).at[jnp.arange(n_cam), jnp.arange(n_cam)].set(U_d)
    S = S.transpose(0, 2, 1, 3).reshape(n_cam * P, n_cam * P)

    # frozen cameras: identity rows/cols so the system stays SPD
    m = jnp.repeat(cam_opt_mask, P)
    S = S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
    b = b.reshape(-1) * m

    L = jnp.linalg.cholesky(S)
    dc = jax.scipy.linalg.cho_solve((L, True), b)
    return dc.reshape(n_cam, P)


def build_obs_at(pts_ind, cam_ind, n_pts, n_cam):
    """Host-side (N, M) obs-index lookup (sentinel K where a track does not
    observe a camera) for the MXU dense Schur assembly."""
    pts_ind = np.asarray(pts_ind)
    cam_ind = np.asarray(cam_ind)
    K = len(pts_ind)
    # a correspondence matrix has one observation per (track, camera); if a
    # degenerate input violates that, the table would silently drop
    # observations — return None so the caller falls back to the pair path
    flat = pts_ind.astype(np.int64) * n_cam + cam_ind
    if len(np.unique(flat)) != K:
        return None
    table = np.full((n_pts, n_cam), K, dtype=np.int32)
    table[pts_ind, cam_ind] = np.arange(K, dtype=np.int32)
    return table


def _dense_mxu_schur_solve(U_d, W, Vinv, b, prob: LMProblem, n_cam, cam_opt_mask):
    """Dense reduced camera system via one MXU matmul.

    S[c1 p, c2 q] = U_d on the block diagonal minus
    sum_n sum_t A[n,c1,p,t] * B[n,c2,q,t] with A = Y scattered over the
    (track, camera) grid and B = W likewise; the scatter is a gather from
    the host-built obs_at table (each track sees a camera at most once)."""
    P = U_d.shape[-1]
    dt = U_d.dtype
    Y = sm.mm(W, Vinv[prob.pts_ind])  # (K, P, 3)
    pad = jnp.zeros((1, P, 3), dt)
    A = jnp.concatenate([Y, pad])[prob.obs_at]  # (N, M, P, 3)
    B = jnp.concatenate([W, pad])[prob.obs_at]  # (N, M, P, 3)
    n_pts = prob.obs_at.shape[0]
    Am = A.transpose(1, 2, 0, 3).reshape(n_cam * P, n_pts * 3)
    Bm = B.transpose(1, 2, 0, 3).reshape(n_cam * P, n_pts * 3)
    S = -jnp.matmul(Am, Bm.T, preferred_element_type=dt)  # (MP, MP)
    S = S.reshape(n_cam, P, n_cam, P)
    S = S.at[jnp.arange(n_cam), :, jnp.arange(n_cam), :].add(U_d)
    S = S.reshape(n_cam * P, n_cam * P)

    m = jnp.repeat(cam_opt_mask, P)
    S = S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
    b = b.reshape(-1) * m

    L = jnp.linalg.cholesky(S)
    dc = jax.scipy.linalg.cho_solve((L, True), b)
    return dc.reshape(n_cam, P)


def _cg_schur_solve(U_d, W, Vinv, b, prob: LMProblem, n_cam, cam_opt_mask, cg_iters,
                    psum_axis=None, cg_rtol=1e-2, tie_tail=0, x0=None,
                    coarse=True, coarse_k=1, matvec_impl="auto"):
    """Matrix-free CG on the Schur complement, in float32.

    matvec(x) = U x - W V^-1 W^T x via gathers + segment sums. When
    psum_axis is set (inside shard_map over observations), partial results
    are all-reduced over the mesh axis, giving the distributed solver.

    The inner solve runs in f32 (inexact-Newton: LM only needs a descent
    direction, and its damping absorbs step inaccuracy; f64 arithmetic is
    emulated ~10x slower on TPU). The outer normal-equation blocks and LM
    state stay f64. Early exit when the residual norm drops 1e-6x."""
    out_dtype = b.dtype
    scale = jnp.maximum(jnp.max(jnp.abs(b)), 1e-30)
    U_d = (U_d / scale).astype(jnp.float32)
    W = (W / jnp.sqrt(scale)).astype(jnp.float32)
    Vinv = (Vinv * 1.0).astype(jnp.float32)
    b = (b / scale).astype(jnp.float32)
    # note: W V^-1 W^T scales as W^2, i.e. 1/scale -- consistent with U/scale
    P = U_d.shape[-1]
    n_pts = Vinv.shape[0]
    m = cam_opt_mask.astype(jnp.float32)[:, None]

    dual_layout = prob.cam_ind_pt is not None and prob.pts_ind_cam is not None
    if dual_layout:
        # materialize What = W L (L = chol(V^-1), folded ONCE per LM step)
        # in both padded layouts (zero rows in empty slots), so every
        # matvec is dense reductions + row gathers instead of gather-table
        # segment sums — and the per-step Vinv stage disappears:
        # W V^-1 W^T = (W L)(W L)^T. Indices are clamped+masked instead of
        # concat-padded (saves the per-step table copy; round-4 measured).
        # Under psum_axis (distributed shards) the point side is
        # shard-LOCAL (renumbered tracks, dist_solver.shard_observations)
        # and the partial camera-space result is all-reduced, exactly like
        # the layout-free path.
        Lc = sm.chol3x3(0.5 * (Vinv + jnp.swapaxes(Vinv, -1, -2)))
        W_pad = jnp.concatenate([W, jnp.zeros((1, P, 3), W.dtype)])
        W_pt = sm.mm(W_pad[prob.pt_gather], Lc[:, None])  # (N, Tp, P, 3)
        Lc_pad = jnp.concatenate([Lc, jnp.zeros((1, 3, 3), Lc.dtype)])
        W_cm = sm.mm(W_pad[prob.cam_gather],
                     Lc_pad[prob.pts_ind_cam])  # (M, Tc, P, 3)
        ci_clamp = jnp.minimum(prob.cam_ind_pt, n_cam - 1)
        ci_mask = (prob.cam_ind_pt < n_cam).astype(U_d.dtype)[..., None]
        pi_clamp = jnp.minimum(prob.pts_ind_cam, n_pts - 1)

        from sat_bundleadjust_tpu.ops import pallas_matvec as pmv

        # "auto" resolves to the fused Pallas kernel on TPU (round 5: the
        # wide-accumulator camera-side reduction + exact truncating x
        # splits + full-f32 operand fold reach the same 0.098 px optimum
        # as the XLA matvec at the 1000-cam scale, at 1.8x lower
        # per-iteration wall — 5.5 vs 7.8 s solves on the v5e); other
        # backends keep the XLA dual-layout matvec (the kernel needs
        # Mosaic — interpret mode is for tests).
        pallas_ok = prob.pt_gather.shape[1] <= pmv.MAX_TP
        if matvec_impl == "auto":
            matvec_impl = (
                "pallas"
                if pallas_ok and jax.default_backend() == "tpu"
                else "aos"
            )
        if matvec_impl == "pallas" and not pallas_ok:
            import warnings

            warnings.warn(
                "matvec='pallas' requested but the track-major slot width "
                "Tp={} exceeds pallas_matvec.MAX_TP={}; falling back to the "
                "XLA dual-layout matvec".format(
                    prob.pt_gather.shape[1], pmv.MAX_TP),
                stacklevel=2,
            )
        use_pallas = matvec_impl == "pallas" and pallas_ok
        use_twin = matvec_impl.startswith("twin")
        if use_twin:
            # pure-jnp twins of the fused kernel with selectable camera-side
            # accumulation (pm / f64 / slice) — CPU-testable pins of the
            # kernel's numerics (see pallas_matvec.schur_wz_twin)
            accum = matvec_impl.split("_", 1)[1] if "_" in matvec_impl else "slice"
            Wh_soa, c_soa, pmeta = pmv.build_wh_operands(
                W.astype(jnp.float32), Vinv.astype(jnp.float32), prob, n_cam)

            def matvec(x):  # x: (M, P)
                ux = sm.mv(U_d, x)
                wz = pmv.schur_wz_twin(x.astype(jnp.float32), Wh_soa, c_soa,
                                       pmeta, accum=accum).astype(x.dtype)
                out = ux - wz
                if psum_axis is not None:
                    out = jax.lax.psum(out, psum_axis)
                return out * m + x * (1.0 - m)

        elif use_pallas:
            # the fused Pallas kernel: both camera-axis crossings as
            # in-VMEM one-hot MXU dots instead of the per-row-bound XLA
            # gathers (4.4 of the 4.3 ms step at 1000 cams)
            Wh_soa, c_soa, pmeta = pmv.build_wh_operands(
                W.astype(jnp.float32), Vinv.astype(jnp.float32), prob, n_cam)
            interp = os.environ.get("SATBA_PALLAS_INTERPRET", "0") == "1"

            def matvec(x):  # x: (M, P)
                ux = sm.mv(U_d, x)
                wz = pmv.schur_wz(x.astype(jnp.float32), Wh_soa, c_soa,
                                  pmeta, interpret=interp).astype(x.dtype)
                out = ux - wz
                if psum_axis is not None:
                    out = jax.lax.psum(out, psum_axis)
                return out * m + x * (1.0 - m)

        else:

            def matvec(x):  # x: (M, P)
                ux = sm.mv(U_d, x)
                xg = x[ci_clamp] * ci_mask
                what = jnp.sum(sm.mtv(W_pt, xg), axis=1)  # (N, 3) dense reduce
                whg = what[pi_clamp]  # sentinel slots have W_cm = 0
                wz = jnp.sum(sm.mv(W_cm, whg), axis=1)  # (M, P) dense reduce
                out = ux - wz
                if psum_axis is not None:
                    out = jax.lax.psum(out, psum_axis)
                return out * m + x * (1.0 - m)

    else:

        def matvec(x):  # x: (M, P)
            ux = sm.mv(U_d, x)
            wtx = _seg_sum_pt(sm.mtv(W, x[prob.cam_ind]), prob, n_pts)
            z = sm.mv(Vinv, wtx)
            wz = _seg_sum_cam(sm.mv(W, z[prob.pts_ind]), prob, n_cam)
            out = ux - wz
            if psum_axis is not None:
                out = jax.lax.psum(out, psum_axis)
            return out * m + x * (1.0 - m)

    # Block-Jacobi preconditioner built from the TRUE Schur diagonal:
    # S_cc = U_cc - sum_{k in obs(c)} Y_k W_k^T (a track observes a camera
    # at most once, so only the k1 == k2 pair survives on the diagonal).
    # Preconditioning with S's diagonal instead of U alone cuts CG
    # iteration counts ~3x at small damping, where U is a poor proxy for S.
    # Inverted in f32: TPU XLA has no f64 LU, and preconditioner accuracy
    # is uncritical.
    if dual_layout:
        # folded layout: S_cc = U_cc - sum_t What What^T directly
        S_diag = U_d - jnp.sum(sm.mbt(W_cm, W_cm), axis=1)
    else:
        Y = sm.mm(W, Vinv[prob.pts_ind])  # (K, P, 3)
        S_diag = U_d - _seg_sum_cam(sm.mbt(Y, W), prob, n_cam)
    if psum_axis is not None:
        S_diag = jax.lax.psum(S_diag, psum_axis)
    prec = jnp.linalg.inv(
        (S_diag + jnp.eye(P) * 1e-12).astype(jnp.float32)
    ).astype(U_d.dtype)

    # Two-level preconditioner: coarse correction on the subspace
    # Z = I_P (x) 1_M ("the same correction applied to every optimizable
    # camera"). The Schur complement's smallest eigenvalues are these
    # global gauge-like modes (a common camera shift compensated by the
    # points); per-camera block-Jacobi cannot see them, and the round-3
    # device trace showed CG stalling against its step budget at 1000
    # cameras. E = Z^T S Z has the closed form
    #     E = sum_c U_c - sum_pt Wsum_pt Vinv_pt Wsum_pt^T,
    # Wsum_pt = sum of the point's W blocks over optimizable cameras:
    # O(K) to build once per LM step, and each application is one sum over
    # cameras plus a PxP matvec. Applied ADDITIVELY to block-Jacobi (both
    # SPD, so the sum stays a valid CG preconditioner).
    if coarse:
        G = max(1, int(coarse_k))
        E, Zg = coarse_schur_E(U_d, W, Vinv, prob, m, n_pts,
                               W_pt=W_pt if dual_layout else None,
                               n_clusters=G, return_Z=True)
        if psum_axis is not None:
            E = jax.lax.psum(E, psum_axis)
        # SPD-guarded inverse WITHOUT eigh (TPU eigh on small matrices
        # costs tens of ms per LM step — measured +1.4 s on the 1000-cam
        # solve): ridge-regularized Cholesky inverse, and if E is still
        # not SPD (f32 cancellation in E_top - E_bot at late-LM damping;
        # an indefinite additive term DIVERGES CG — measured,
        # scripts/bench_coarse_k.py warm=6, G=64) the non-finite result
        # is detected and the coarse level is dropped for this step.
        GP = G * P
        E_f = E.reshape(GP, GP).astype(jnp.float32)
        ridge = jnp.trace(E_f) / GP * 1e-6 + 1e-30
        Lch = jnp.linalg.cholesky(E_f + ridge * jnp.eye(GP, dtype=jnp.float32))
        Einv = jax.scipy.linalg.cho_solve(
            (Lch, True), jnp.eye(GP, dtype=jnp.float32))
        Einv = jnp.where(jnp.all(jnp.isfinite(Einv)), Einv,
                         jnp.zeros_like(Einv)).astype(U_d.dtype)

    if tie_tail:
        # COMMON_K projector: average the trailing tie_tail parameters over
        # the optimizable cameras and broadcast back (frozen cameras keep
        # their masked-out zeros). Applied to b, every matvec result and
        # every preconditioner application, this runs CG on P S P — the
        # null-space method for the shared-K parameterization.
        t = tie_tail
        msum = jnp.maximum(jnp.sum(m), 1.0)

        def proj(x):
            shared = jnp.sum(x[:, P - t :] * m, axis=0) / msum
            tied = jnp.broadcast_to(shared[None, :], (x.shape[0], t))
            tail = tied * m + x[:, P - t :] * (1.0 - m)
            return jnp.concatenate([x[:, : P - t], tail], axis=1)

    else:
        def proj(x):
            return x

    def apply_prec(v):
        pv = proj(v)
        out = sm.mv(prec, pv)
        if coarse:
            # full-f32 matmuls (default MXU precision is bf16-pass)
            hi = jax.lax.Precision.HIGHEST
            vc = jnp.matmul(Zg.T, pv, precision=hi).reshape(-1)  # Z^T v
            out = out + jnp.matmul(
                Zg, jnp.matmul(Einv, vc, precision=hi).reshape(G, P),
                precision=hi)
        return proj(out * m + v * (1.0 - m))

    b = proj(b * m)
    # the forcing criterion is relative to ||b|| (the x=0 residual), not the
    # starting residual — with a warm start the latter would make CG chase a
    # needlessly tighter absolute target
    rr0 = jnp.sum(b * b)
    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        # warm start from the previous LM iteration's step: the damped Schur
        # system changes only through lam and the (slowly varying) Jacobian,
        # so the previous solution is usually a few CG steps from the new
        # one. Guarded: if the previous step is a worse start than zero
        # (e.g. after a large lam jump on rejection), fall back to cold.
        x0 = proj(x0.astype(b.dtype) * m)
        r_w = b - proj(matvec(x0))
        use_warm = jnp.sum(r_w * r_w) < rr0
        x = jnp.where(use_warm, x0, jnp.zeros_like(b))
        r = jnp.where(use_warm, r_w, b)
    z = apply_prec(r)
    p = z
    rz = jnp.sum(r * z)

    def cond(state):
        _, r_c, _, _, it = state
        return (jnp.sum(r_c * r_c) > (cg_rtol * cg_rtol) * rr0) & (it < cg_iters)

    def body(state):
        x, r, p, rz, it = state
        Ap = proj(matvec(p))
        denom = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-30, 1.0, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_prec(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1.0, rz)
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    x, _, _, _, _ = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.asarray(0)))
    return x.astype(out_dtype)


def coarse_schur_E(U_d, W, Vinv, prob: LMProblem, m, n_pts, W_pt=None,
                   n_clusters=1, return_Z=False):
    """Galerkin coarse operator E = Z^T S Z of the two-level CG
    preconditioner, Z = Zg (x) I_P with Zg the (M, G) indicator of G
    contiguous camera clusters masked by m (frozen cameras excluded).
    G=1 recovers the round-3 global subspace ("the same correction applied
    to every optimizable camera") and returns a (P, P) operator.

    Closed form per cluster pair: E[g,h] = delta_gh sum_{c in g} m_c U_c
    - sum_n Wsum_{n,g} Vinv_n Wsum_{n,h}^T with Wsum_{n,g} = sum of track
    n's W blocks over cluster g's optimizable cameras (m^2 = m).
    W_pt: optional track-major padded W layout (dual-layout matvec path);
    otherwise the per-observation W with a segment sum over tracks."""
    P = U_d.shape[-1]
    M = U_d.shape[0]
    G = max(1, int(n_clusters))
    m = m.reshape(-1, 1)
    groups = jnp.minimum(jnp.arange(M) * G // M, G - 1)
    Zg = (groups[:, None] == jnp.arange(G)[None, :]).astype(U_d.dtype) * m
    # Precision note (round-5 measured): XLA-TPU contracts f32 einsums on
    # the MXU at DEFAULT (bf16-pass) precision. For the coarse operator E
    # that is an acceptable trade — forcing precision=HIGHEST on the two
    # N-sized contractions below cut the 1000-cam LM iteration count
    # 28 -> 20 but added ~0.17 s of per-LM-step E-build cost, a net LOSS
    # (7.25 vs 5.47 s solves). A preconditioner may be sloppy; only the
    # CG OPERATOR itself must be exact (pallas_matvec / the smallmat W
    # fold). The tiny G*P-sized apply matmuls run at HIGHEST for free.
    if W_pt is not None:
        # W_pt is the FOLDED What = W L layout: E_bot = Whsum Whsum^T
        Zg_pad = jnp.concatenate([Zg, jnp.zeros((1, G), Zg.dtype)])
        slot_g = Zg_pad[prob.cam_ind_pt]  # (N, Tp, G)
        Wsum = jnp.einsum("ntpj,ntg->ngpj", W_pt, slot_g)  # (N, G, P, 3)
        E_bot = jnp.einsum("ngpi,nhqi->gphq", Wsum, Wsum)
    else:
        zk = Zg[prob.cam_ind]  # (K, G)
        Wsum = jax.ops.segment_sum(
            W[:, None] * zk[..., None, None], prob.pts_ind, num_segments=n_pts
        )
        E_bot = jnp.einsum("ngpi,nij,nhqj->gphq", Wsum, Vinv, Wsum)
    E_top = jnp.einsum("mg,mpq,mh->gphq", Zg, U_d, Zg)
    E = E_top - E_bot
    if G == 1:
        E = E.reshape(P, P)
    if return_Z:
        return E, Zg
    return E


def lm_step(r, J_cam, J_pt, lam, prob: LMProblem, n_cam, n_pts, cfg: LMConfig,
            psum_axis=None, loss=None, f_scale=None, x0_cam=None):
    """One damped Schur-complement solve. Returns (dcam (M,P), dpt (N,3)).

    loss/f_scale: optional traced overrides of cfg.loss/cfg.f_scale (see
    _normal_blocks). x0_cam: optional CG warm start for the camera step
    (the previous LM iteration's dcam); ignored by the dense solver."""
    r, g_cam, g_pt, U, V, W = _normal_blocks(
        r, J_cam, J_pt, prob, n_cam, n_pts, cfg, loss=loss, f_scale=f_scale
    )
    if psum_axis is not None:
        g_cam = jax.lax.psum(g_cam, psum_axis)
        # U is also psum'd inside the CG matvec path via U_for_prec; for the
        # matvec itself each shard applies its partial U then psums the result,
        # so keep the local U here.
    dt = U.dtype
    U_d = _damp(U, lam)
    V_d = _damp(V, lam)
    # frozen points: make V identity so dp = -Vinv g_pt = 0 (g_pt masked to 0)
    eye = jnp.eye(3, dtype=dt)
    pmask = prob.pts_opt_mask.astype(dt)
    V_d = V_d * pmask[:, None, None] + eye * (1.0 - pmask)[:, None, None]
    Vinv = _inv3x3(V_d)

    b = _schur_rhs(g_cam, g_pt, W, Vinv, prob, n_cam)
    if psum_axis is not None:
        # the W V^-1 g_pt part of b is local per shard; the -g_cam part was
        # already psum'd, so correct the double count
        b = jax.lax.psum(b + g_cam, psum_axis) - g_cam

    cmask = prob.cam_opt_mask.astype(dt)
    if cfg.schur_mode == "dense" and psum_axis is None and not cfg.tie_tail:
        if prob.obs_at is not None:
            dcam = _dense_mxu_schur_solve(U_d, W, Vinv, b, prob, n_cam, cmask)
        else:
            dcam = _dense_schur_solve(U_d, W, Vinv, b, prob, n_cam, cmask)
    else:
        dcam = _cg_schur_solve(
            U_d, W, Vinv, b, prob, n_cam, cmask,
            cfg.cg_iters or max(15, min(60, n_cam // 2)), psum_axis,
            cg_rtol=cfg.cg_rtol, tie_tail=cfg.tie_tail, x0=x0_cam,
            coarse=cfg.cg_coarse, coarse_k=cfg.cg_coarse_k,
            matvec_impl=cfg.matvec,
        )

    # back-substitute tie points: dp = -V^-1 (g_pt + W^T dcam)
    wtdc = _seg_sum_pt(sm.mtv(W, dcam[prob.cam_ind]), prob, n_pts)
    dpt = -sm.mv(Vinv, g_pt + wtdc)
    dpt = dpt * pmask[:, None]
    dcam = dcam * cmask[:, None]
    # at very small damping the f32 factorization/CG can go indefinite and
    # emit non-finite steps; sanitize to a zero step so the LM driver treats
    # it as a plain rejected iteration (raises lam) instead of evaluating
    # the residual at NaN parameters
    finite = jnp.isfinite(jnp.sum(dcam)) & jnp.isfinite(jnp.sum(dpt))
    dcam = jnp.where(finite, dcam, jnp.zeros_like(dcam))
    dpt = jnp.where(finite, dpt, jnp.zeros_like(dpt))
    return dcam, dpt


def build_solve(residual_fn, jac_fn, n_cam, n_pts, prob: LMProblem, cfg: LMConfig):
    """Build the jitted LM driver: one compiled program for the WHOLE
    damped-iteration loop (lax.while_loop), so a solve is a single dispatch
    to the device — important both for XLA scheduling and for
    remote/tunneled devices where every dispatch pays round-trip latency.

    Returns run(cam, pts, max_iter, loss_id, f_scale) -> (cam, pts,
    scalars, errs) with scalars = [lam, cost, n_iter, cost0] and errs =
    stacked (2, K) initial/final reprojection errors (packed so the host
    fetch is two transfers, not six tunnel round trips).

    The robust loss enters as a TRACED integer id + scalar f_scale
    (ops/robust.loss_id), not a compile key: the pipeline's soft-L1 round,
    outlier probe and L2 round share ONE compiled program per problem
    shape. Keep the returned callable around to reuse its compilation."""

    if not cfg.cg_iters:
        cfg = cfg._replace(cg_iters=max(15, min(60, n_cam // 2)))

    n_obs = int(prob.pts2d.shape[0])

    # Operand plumbing: when the fns expose their 3-arg form + consts
    # pytree (ba/solver.make_fns), the observation tables, RPC
    # coefficients AND the LMProblem arrays all enter the traced program
    # as ARGUMENTS. Closure arrays would be embedded in the executable as
    # constants — at 500k observations that made the cached executable
    # 157 MB, and shipping it to the tunneled device cost ~90 s per fresh
    # process even on a persistent-cache hit (round-5 probe); as
    # arguments the executable is small and the operands move once at
    # device_put time.
    raw_res = getattr(residual_fn, "raw", None)
    raw_jac = getattr(jac_fn, "raw", None)
    consts = getattr(residual_fn, "consts", None)
    operand_mode = raw_res is not None and raw_jac is not None and consts is not None

    def _run_body(res_f, jac_f, prob, cam, pts, max_iter, lid, f_scale):
        def cost_of(r):
            return loss_cost(lid, r, f_scale)

        residual_fn, jac_fn = res_f, jac_f
        r0 = residual_fn(cam, pts)
        cost0 = cost_of(r0)
        # absolute floor: cost is in squared (weighted) pixels; 1e-14 px^2
        # per observation is far below any physical noise, so reaching it
        # means "exactly solved" (prevents dozens of pointless iterations
        # on synthetic noise-free problems)
        cost_floor = jnp.maximum(1e-15 * jnp.maximum(cost0, 1.0), 1e-14 * n_obs)

        def body(state):
            cam, pts, lam, cost, n_iter, done, dcam_prev = state
            r, J_cam, J_pt = jac_fn(cam, pts)
            dcam, dpt = lm_step(
                r, J_cam, J_pt, lam, prob, n_cam, n_pts, cfg,
                loss=lid, f_scale=f_scale, x0_cam=dcam_prev,
            )
            cam_new = cam + dcam
            pts_new = pts + dpt
            new_cost = cost_of(residual_fn(cam_new, pts_new))
            improved = new_cost < cost
            rel_drop = (cost - new_cost) / jnp.maximum(cost, 1e-30)
            # xtol: scipy-TRF-style step-size criterion (the reference runs
            # least_squares(method="trf", xtol=1e-10), ba_core.py:284-297).
            # Catches the f32-Jacobian tail on noise-free problems, where
            # cost keeps shrinking geometrically (rel_drop stays > ftol)
            # while the iterates have long stopped moving meaningfully.
            step_norm = jnp.sqrt(jnp.sum(dcam * dcam) + jnp.sum(dpt * dpt))
            x_norm = jnp.sqrt(jnp.sum(cam * cam) + jnp.sum(pts * pts))
            small_step = step_norm < cfg.xtol * (x_norm + cfg.xtol)
            cam = jnp.where(improved, cam_new, cam)
            pts = jnp.where(improved, pts_new, pts)
            lam = jnp.where(improved, lam / cfg.lambda_down, lam * cfg.lambda_up)
            cost = jnp.where(improved, new_cost, cost)
            done = (
                done
                | (improved & (rel_drop < cfg.ftol))
                | (improved & small_step)
                | (lam > 1e12)
                | (cost <= cost_floor)
            )
            # carry the step as the next iteration's CG warm start (even when
            # rejected: CG falls back to cold if it's a worse start than 0)
            return cam, pts, lam, cost, n_iter + 1, done, dcam.astype(cam.dtype)

        def cond(state):
            n_iter, done = state[4], state[5]
            return (~done) & (n_iter < max_iter)

        state0 = (
            cam, pts, jnp.asarray(cfg.lambda0, cam.dtype), cost0,
            jnp.asarray(0), jnp.asarray(False), jnp.zeros_like(cam),
        )
        cam, pts, lam, cost, n_iter, _, _ = jax.lax.while_loop(cond, body, state0)
        # also return per-observation unweighted reprojection errors:
        # computing them in separate dispatches costs a tunnel round trip
        # each, and (K,) f32 norms transfer 8x less than (K, 2) f64
        # residuals (reference: ba_core.compute_reprojection_error)
        r_fin = residual_fn(cam, pts)
        w = prob.weights[:, None]
        err0 = jnp.linalg.norm((r0 / w), axis=1).astype(jnp.float32)
        err_fin = jnp.linalg.norm((r_fin / w), axis=1).astype(jnp.float32)
        # pack scalars / same-shape arrays: each host fetch of a separate
        # device value pays a full tunnel round trip (~28 ms measured), so
        # return ONE scalar vector and ONE stacked error array
        scalars = jnp.stack(
            [lam, cost, n_iter.astype(cam.dtype), cost0]
        )
        errs = jnp.stack([err0, err_fin])
        return cam, pts, scalars, errs

    if operand_mode:
        @partial(jax.jit, static_argnums=())
        def run_inner(cam, pts, max_iter, lid, f_scale, prob_t, consts_t):
            return _run_body(
                lambda c, p: raw_res(c, p, consts_t),
                lambda c, p: raw_jac(c, p, consts_t),
                prob_t, cam, pts, max_iter, lid, f_scale,
            )

        def run(cam, pts, max_iter, lid, f_scale):
            return run_inner(cam, pts, max_iter, lid, f_scale, prob, consts)

    else:
        @jax.jit
        def run(cam, pts, max_iter, lid, f_scale):
            return _run_body(residual_fn, jac_fn, prob, cam, pts, max_iter,
                             lid, f_scale)

    return run


def solve(residual_fn, jac_fn, cam0, pts0, prob: LMProblem, cfg: LMConfig, run=None):
    """Full LM solve. Pass a prebuilt `run` (from build_solve) to reuse its
    compilation across solves."""
    if run is None:
        run = build_solve(residual_fn, jac_fn, cam0.shape[0], pts0.shape[0], prob, cfg)
    # max_iter, the robust-loss id and f_scale are dynamic operands so
    # solves with different iteration caps AND different losses share one
    # compiled program (compilation is expensive on remote devices)
    from sat_bundleadjust_tpu.ops.robust import loss_id

    cam, pts, scalars, errs = run(
        jnp.asarray(cam0), jnp.asarray(pts0), jnp.asarray(cfg.max_iter),
        jnp.asarray(loss_id(cfg.loss), jnp.int32),
        jnp.asarray(cfg.f_scale, jnp.float32),
    )
    # two host transfers total (scalars vector + stacked errors) instead of
    # one ~28 ms tunnel round trip per scalar
    lam, cost, n_iter, cost0 = np.asarray(scalars)
    errs = np.asarray(errs)
    info = {
        "cost0": float(cost0),
        "cost": float(cost),
        "err0": errs[0],
        "err_fin": errs[1],
        "iterations": int(n_iter),
        "lambda": float(lam),
    }
    return cam, pts, info
