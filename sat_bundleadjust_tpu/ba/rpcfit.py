"""Fitting a fresh RPC model to a corrected projection function.

Covers the reference's bundle_adjust/ba_rpcfit.py: regularized iterative
weighted least squares over a 10x10x10 grid of 2d-3d correspondences, with
an image-margin doubling loop until the fitted model covers the full image.

TPU-first notes: the normal-equation assembly for both the row and col
rational models is a batched 39x39 solve — `fit_rpcs_batched` vmaps the
whole IRLS over all cameras at once, turning the reference's per-camera
host loop (ba_pipeline.py:399-415) into a single device launch. The
coverage check (convex hull vs image rectangle) stays host-side geometry.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sat_bundleadjust_tpu.models import ellipsoid
from sat_bundleadjust_tpu.models.cameras import (
    apply_projection_matrix,
    generate_point_mesh,
)
from sat_bundleadjust_tpu.models.rpc import RPCModel, poly20_basis, rpc_projection_np
from sat_bundleadjust_tpu.utils.polygons import Polygon, convex_hull_polygon


def _np_apply_rpc_projection(rpc, pts3d):
    """Host-side ECEF -> pixel projection (numpy twin of
    cameras.apply_rpc_projection)."""
    pts3d = np.asarray(pts3d)
    lat, lon, alt = ellipsoid.ecef_to_latlon_np(pts3d[..., 0], pts3d[..., 1], pts3d[..., 2])
    col, row = rpc_projection_np(rpc, lon, lat, alt)
    return np.stack((col, row), axis=-1)


def _np_adjust_pts3d(pts3d, rt_vec):
    """Host-side correction mapping X' = R(X - T - C) + C (numpy twin of
    ops.project.adjust_pts3d)."""
    rt_vec = np.asarray(rt_vec)
    pts = np.asarray(pts3d) - rt_vec[..., 3:6] - rt_vec[..., 6:9]
    a, b, c = rt_vec[..., 0], rt_vec[..., 1], rt_vec[..., 2]
    cx, sx = np.cos(a), np.sin(a)
    cy, sy = np.cos(b), np.sin(b)
    cz, sz = np.cos(c), np.sin(c)
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    y, z = cx * y - sx * z, sx * y + cx * z
    x, z = cy * x + sy * z, -sy * x + cy * z
    x, y = cz * x - sz * y, sz * x + cz * y
    return np.stack([x, y, z], axis=-1) + rt_vec[..., 6:9]

MAX_IRLS_ITERS = 20
IRLS_TOL = 1e-2
REG_H = 1e-3


def scaling_params(v):
    """min/max scale+offset (reference: ba_rpcfit.py:156-164)."""
    v = np.asarray(v)
    scale = (v.max() - v.min()) / 2.0
    offset = v.min() + scale
    return scale, offset


def initialize_rpc(target, input_locs) -> RPCModel:
    """Empty RPC with scales/offsets from data ranges
    (reference: ba_rpcfit.py:167-198)."""
    zeros = np.zeros(20)
    row_scale, row_offset = scaling_params(target[:, 1])
    col_scale, col_offset = scaling_params(target[:, 0])
    lat_scale, lat_offset = scaling_params(input_locs[:, 1])
    lon_scale, lon_offset = scaling_params(input_locs[:, 0])
    alt_scale, alt_offset = scaling_params(input_locs[:, 2])
    return RPCModel(
        line_num=zeros.copy(), line_den=zeros.copy(),
        samp_num=zeros.copy(), samp_den=zeros.copy(),
        row_offset=row_offset, col_offset=col_offset,
        lat_offset=lat_offset, lon_offset=lon_offset, alt_offset=alt_offset,
        row_scale=max(row_scale, 1e-9), col_scale=max(col_scale, 1e-9),
        lat_scale=max(lat_scale, 1e-12), lon_scale=max(lon_scale, 1e-12),
        alt_scale=max(alt_scale, 1e-9),
    )


def _irls_coeffs(target_norm, locs_norm):
    """Jitted IRLS core: returns 80 coefficients (row_num, row_den,
    col_num, col_den) from normalized correspondences.

    Reference: ba_rpcfit.weighted_lsq (ba_rpcfit.py:88-153): direct
    regularized LSQ then <=20 reweighted iterations with 1/den^2 weights.
    The convergence test there uses the de-normalized RMSE; here the
    normalized RMSE with a proportionally scaled tolerance gives the same
    fixed point and keeps the whole loop jittable."""
    C = target_norm[:, 0:1]
    R = target_norm[:, 1:2]
    lon, lat, alt = locs_norm[:, 0], locs_norm[:, 1], locs_norm[:, 2]
    basis = poly20_basis(lat, lon, alt)  # (N, 20), column 0 == 1
    pv = basis[:, 1:]  # (N, 19)
    MC = jnp.concatenate([jnp.ones_like(C), pv, -C * pv], axis=1)  # (N, 39)
    MR = jnp.concatenate([jnp.ones_like(R), pv, -R * pv], axis=1)
    reg = (REG_H ** 2) * jnp.eye(39)

    def solve(M, t, W=None):
        if W is None:
            A = M.T @ M
            b = M.T @ t
        else:
            MW = M * W[:, None]
            A = MW.T @ M + reg
            b = MW.T @ t
        # Cholesky instead of jnp.linalg.solve: A is SPD (normal equations
        # of the normalized poly basis), and the TPU compiler implements
        # LuDecomposition only for f32/c64 — a scale e2e run caught the
        # f64 LU failing to compile (round 3); the blocked Cholesky +
        # triangular-solve expansions are dtype-generic. The unweighted
        # first solve's A = M^T M can be near-singular (cond ~ cond(M)^2),
        # where LU still limps through but the factorization needs a
        # jitter: 1e-10 x mean diagonal is ~4 orders below the IRLS
        # regularizer REG_H^2 = 1e-6, so the fixed point is unchanged
        import jax.scipy.linalg as jsl

        jitter = 1e-10 * (jnp.trace(A) / A.shape[0]) * jnp.eye(A.shape[0], dtype=A.dtype)
        L = jnp.linalg.cholesky(A + jitter)
        y = jsl.solve_triangular(L, b, lower=True)
        return jsl.solve_triangular(L.T, y, lower=False)[:, 0]

    def coeffs_from(J):
        # J: (39,) -> (num(20), den(20)) with den[0] = 1
        num = J[:20]
        den = jnp.concatenate([jnp.ones(1), J[20:]])
        return num, den

    JR = solve(MR, R)
    JC = solve(MC, C)

    def rmse(JR, JC):
        rn, rd = coeffs_from(JR)
        cn, cd = coeffs_from(JC)
        row_pred = (basis @ rn) / (basis @ rd)
        col_pred = (basis @ cn) / (basis @ cd)
        return jnp.sqrt(0.5 * (jnp.mean((col_pred - C[:, 0]) ** 2) + jnp.mean((row_pred - R[:, 0]) ** 2)))

    def body(state):
        JR, JC, err_prev, it, _ = state
        _, rd = coeffs_from(JR)
        _, cd = coeffs_from(JC)
        WR = 1.0 / (basis @ rd) ** 2
        WC = 1.0 / (basis @ cd) ** 2
        JR_new = solve(MR, R, WR)
        JC_new = solve(MC, C, WC)
        err = rmse(JR_new, JC_new)
        return JR_new, JC_new, err, it + 1, jnp.abs(err_prev - err)

    def cond(state):
        _, _, _, it, delta = state
        return (it < MAX_IRLS_ITERS) & (delta >= IRLS_TOL * 1e-3)

    err0 = rmse(JR, JC)
    JR, JC, _, _, _ = jax.lax.while_loop(cond, body, (JR, JC, err0, jnp.asarray(0), err0 + 1.0))
    rn, rd = coeffs_from(JR)
    cn, cd = coeffs_from(JC)
    return jnp.concatenate([rn, rd, cn, cd])


@jax.jit
def _refit_batch_program(rpc_leaves, Rt_vecs, gt, cols, rows, alts):
    """One device launch for the whole refit round, vmapped over cameras:
    grid localization through the original RPCs -> corrected-projection
    targets -> per-camera normalization -> IRLS -> fitted coefficients,
    fit errors and grid predictions (for the host-side hull coverage test).

    Replaces the reference's per-camera host loop (ba_pipeline.py:399-415)
    with a single batched program.

    Args: rpc_leaves: RPCModel pytree with leading dim M; Rt_vecs (M, 9);
    gt (3,) global transform; cols/rows/alts (M, N) grids.
    Returns coeffs (M, 80), scales (M, 10), pred (M, N, 2), err (M, N)."""
    from sat_bundleadjust_tpu.models.rpc import rpc_localization, rpc_projection
    from sat_bundleadjust_tpu.ops.project import adjust_pts3d

    def one(rpc, rt, cols, rows, alts):
        lon, lat = rpc_localization(rpc, cols, rows, alts)
        x, y, z = ellipsoid.latlon_to_ecef(lat, lon, alts)
        pts = jnp.stack([x, y, z], axis=-1) + gt
        padj = adjust_pts3d(pts, rt)
        lat2, lon2, alt2 = ellipsoid.ecef_to_latlon(padj[..., 0], padj[..., 1], padj[..., 2])
        c2, r2 = rpc_projection(rpc, lon2, lat2, alt2)
        target = jnp.stack([c2, r2], axis=-1)

        def sc(v, eps):
            s = (jnp.max(v) - jnp.min(v)) / 2.0
            return jnp.maximum(s, eps), jnp.min(v) + s

        cs, co = sc(target[:, 0], 1e-9)
        rs, ro = sc(target[:, 1], 1e-9)
        los, loo = sc(lon, 1e-12)
        las, lao = sc(lat, 1e-12)
        als, alo = sc(alts, 1e-9)
        t_norm = jnp.stack([(target[:, 0] - co) / cs, (target[:, 1] - ro) / rs], axis=1)
        nlon, nlat, nalt = (lon - loo) / los, (lat - lao) / las, (alts - alo) / als
        l_norm = jnp.stack([nlon, nlat, nalt], axis=1)
        coeffs = _irls_coeffs(t_norm, l_norm)

        # fitted-model prediction on the grid: fit error (check_errors) and
        # the reprojected hull for the coverage test in one pass
        basis = poly20_basis(nlat, nlon, nalt)
        row_pred = (basis @ coeffs[0:20]) / (basis @ coeffs[20:40]) * rs + ro
        col_pred = (basis @ coeffs[40:60]) / (basis @ coeffs[60:80]) * cs + co
        pred = jnp.stack([col_pred, row_pred], axis=-1)
        err = jnp.linalg.norm(pred - target, axis=-1)
        scales = jnp.stack([co, cs, ro, rs, loo, los, lao, las, alo, als])
        return coeffs, scales, pred, err

    return jax.vmap(one)(rpc_leaves, Rt_vecs, cols, rows, alts)


def fit_rpcs_batched(Rt_vecs, global_transform, original_rpcs, crop_offsets,
                     pts3d_ba_list, n_samples=10):
    """Fit fresh RPCs for ALL cameras in one device launch per margin round.

    The margin-doubling coverage loop (reference: ba_rpcfit.py:315-345)
    runs per camera on the host, but every round's heavy work — grid
    localization, corrected projection, 39x39 IRLS — is one batched
    program over all cameras (_refit_batch_program). Cameras whose fitted
    model already covers the image keep their result; the others re-enter
    the next round with doubled margins (same grid shape, so the compiled
    program is reused).

    Returns a list of (rpc_calib, err, margin) per camera, identical in
    semantics to fit_Rt_corrected_rpc."""
    from sat_bundleadjust_tpu.models.rpc import stack_rpcs
    from sat_bundleadjust_tpu.utils.hostdev import small_compute

    M = len(original_rpcs)
    if M == 0:
        return []
    gt = np.zeros(3) if global_transform is None else np.asarray(global_transform)
    n3 = n_samples ** 3

    alt_off, alt_sc = np.zeros(M), np.zeros(M)
    for m, (rpc, pts3d_ba) in enumerate(zip(original_rpcs, pts3d_ba_list)):
        alt_off[m] = float(np.asarray(rpc.alt_offset))
        alt_sc[m] = float(np.asarray(rpc.alt_scale))
        pts_alt = np.asarray(pts3d_ba) - (np.asarray(global_transform) if global_transform is not None else 0.0)
        if len(pts_alt):
            _, _, alts_ba = ellipsoid.ecef_to_latlon_np(pts_alt[:, 0], pts_alt[:, 1], pts_alt[:, 2])
            deviation = abs(alt_off[m] - float(np.median(np.asarray(alts_ba))))
            if deviation > 5:
                print(
                    "warning: median altitude of bundle adjustment points is "
                    "{:.2f} meters deviated from the original rpc alt_offset".format(deviation)
                )

    boundaries = []
    for off in crop_offsets:
        x0, y0, w, h = off["col0"], off["row0"], off["width"], off["height"]
        boundaries.append(Polygon(
            np.array([[x0, y0], [x0, y0 + h], [x0 + w, y0 + h], [x0 + w, y0]])
        ))

    rpcs_b = stack_rpcs([r.to_numpy() for r in original_rpcs])
    rpc_leaves = jax.tree.map(jnp.asarray, rpcs_b)
    Rt = jnp.asarray(np.asarray(Rt_vecs, float).reshape(M, 9))

    margins = np.full(M, 10, dtype=np.int64)
    done = np.zeros(M, bool)
    results = [None] * M
    # the batched IRLS solves f64 39x39 systems: TPU XLA has no f64 LU, and
    # the whole round is ~M*1000 points, so pin the program to the host CPU
    with small_compute():
        while not done.all():
            cols = np.empty((M, n3))
            rows = np.empty((M, n3))
            alts = np.empty((M, n3))
            for m in range(M):
                off = crop_offsets[m]
                x0, y0, w, h = off["col0"], off["row0"], off["width"], off["height"]
                mg = margins[m]
                c, r, a = generate_point_mesh(
                    [x0 - mg, x0 + w + mg, n_samples],
                    [y0 - mg, y0 + h + mg, n_samples],
                    [alt_off[m] - alt_sc[m], alt_off[m] + alt_sc[m], n_samples],
                )
                cols[m], rows[m], alts[m] = c, r, a
            coeffs, scales, pred, err = jax.device_get(_refit_batch_program(
                rpc_leaves, Rt, jnp.asarray(gt), jnp.asarray(cols),
                jnp.asarray(rows), jnp.asarray(alts),
            ))
            for m in range(M):
                if done[m]:
                    continue
                covered = check_correspondences_are_good(pred[m], boundaries[m])
                if covered or margins[m] > 1000:
                    co, cs, ro, rs, loo, los, lao, las, alo, als = scales[m]
                    rpc_calib = RPCModel(
                        line_num=coeffs[m, 0:20], line_den=coeffs[m, 20:40],
                        samp_num=coeffs[m, 40:60], samp_den=coeffs[m, 60:80],
                        row_offset=ro, col_offset=co,
                        lat_offset=lao, lon_offset=loo, alt_offset=alo,
                        row_scale=rs, col_scale=cs,
                        lat_scale=las, lon_scale=los, alt_scale=als,
                    )
                    results[m] = (rpc_calib, err[m], int(margins[m]))
                    done[m] = True
                else:
                    margins[m] *= 2
    return results


def _irls_coeffs_np(target_norm, locs_norm):
    """Numpy twin of _irls_coeffs: the 39x39 normal equations are trivial
    host work, and some deployments expose no CPU jax backend (so every
    jitted call would remote-compile). Same fixed point."""
    from sat_bundleadjust_tpu.models.rpc import _np_basis

    C = target_norm[:, 0:1]
    R = target_norm[:, 1:2]
    lon, lat, alt = locs_norm[:, 0], locs_norm[:, 1], locs_norm[:, 2]
    basis = _np_basis(lat, lon, alt)
    pv = basis[:, 1:]
    MC = np.concatenate([np.ones_like(C), pv, -C * pv], axis=1)
    MR = np.concatenate([np.ones_like(R), pv, -R * pv], axis=1)
    reg = (REG_H ** 2) * np.eye(39)

    def solve(M, t, W=None):
        if W is None:
            A = M.T @ M
            b = M.T @ t
        else:
            MW = M * W[:, None]
            A = MW.T @ M + reg
            b = MW.T @ t
        return np.linalg.solve(A, b)[:, 0]

    def coeffs_from(J):
        return J[:20], np.concatenate([[1.0], J[20:]])

    def rmse(JR, JC):
        rn, rd = coeffs_from(JR)
        cn, cd = coeffs_from(JC)
        row_pred = (basis @ rn) / (basis @ rd)
        col_pred = (basis @ cn) / (basis @ cd)
        return np.sqrt(0.5 * (np.mean((col_pred - C[:, 0]) ** 2) + np.mean((row_pred - R[:, 0]) ** 2)))

    JR = solve(MR, R)
    JC = solve(MC, C)
    err = rmse(JR, JC)
    for _ in range(MAX_IRLS_ITERS):
        _, rd = coeffs_from(JR)
        _, cd = coeffs_from(JC)
        WR = 1.0 / (basis @ rd) ** 2
        WC = 1.0 / (basis @ cd) ** 2
        JR = solve(MR, R, WR)
        JC = solve(MC, C, WC)
        err_prev, err = err, rmse(JR, JC)
        if abs(err_prev - err) < IRLS_TOL * 1e-3:
            break
    rn, rd = coeffs_from(JR)
    cn, cd = coeffs_from(JC)
    return np.concatenate([rn, rd, cn, cd])


def weighted_lsq(target, input_locs) -> RPCModel:
    """Fit an RPC from Nx2 pixel targets and Nx3 (lon, lat, alt) inputs
    (reference: ba_rpcfit.weighted_lsq, ba_rpcfit.py:88-153). Host-side
    numpy path; the jitted/vmappable twin (_irls_coeffs) serves batched
    device fitting."""
    target = np.asarray(target)
    input_locs = np.asarray(input_locs)
    rpc = initialize_rpc(target, input_locs)
    t_norm = np.stack(
        [
            (target[:, 0] - rpc.col_offset) / rpc.col_scale,
            (target[:, 1] - rpc.row_offset) / rpc.row_scale,
        ],
        axis=1,
    )
    l_norm = np.stack(
        [
            (input_locs[:, 0] - rpc.lon_offset) / rpc.lon_scale,
            (input_locs[:, 1] - rpc.lat_offset) / rpc.lat_scale,
            (input_locs[:, 2] - rpc.alt_offset) / rpc.alt_scale,
        ],
        axis=1,
    )
    x = _irls_coeffs_np(t_norm, l_norm)
    return rpc._replace(
        line_num=x[0:20], line_den=x[20:40], samp_num=x[40:60], samp_den=x[60:80]
    )


def check_errors(rpc_calib: RPCModel, input_locs, target):
    """Reprojection error of the calibrated RPC on the fit grid
    (reference: ba_rpcfit.py:359-370)."""
    col, row = rpc_calib.projection(input_locs[:, 0], input_locs[:, 1], input_locs[:, 2])
    pred = np.stack([col, row], axis=1)
    return np.linalg.norm(pred - np.asarray(target), axis=1)


def check_correspondences_are_good(target, image_boundary: Polygon):
    """Full-image coverage test: hull of reprojected grid must cover the
    image rectangle (reference: ba_rpcfit.py:348-356)."""
    hull = convex_hull_polygon(np.asarray(target))
    if hull.coords.shape[0] < 3 or image_boundary.area == 0:
        return False
    inter = image_boundary.intersection(hull)
    return bool(abs(inter.area / image_boundary.area - 1.0) < 1e-9)


def _fit_loop(project_grid_fn, original_rpc: RPCModel, crop_offset, pts3d_ba,
              alt_offset=None, alt_scale=None, n_samples=10):
    """Common margin-doubling fit loop (reference: ba_rpcfit.py:237-267 and
    :315-345). project_grid_fn maps (pts3d (N,3) ECEF) -> (N,2) pixels with
    the corrected model."""
    pts3d_ba = np.asarray(pts3d_ba)
    if alt_offset is None:
        alt_offset = float(np.asarray(original_rpc.alt_offset))
    if alt_scale is None:
        alt_scale = float(np.asarray(original_rpc.alt_scale))
    _, _, alts_ba = ellipsoid.ecef_to_latlon_np(pts3d_ba[:, 0], pts3d_ba[:, 1], pts3d_ba[:, 2])
    deviation = abs(alt_offset - float(np.median(np.asarray(alts_ba))))
    if deviation > 5:
        print(
            "warning: median altitude of bundle adjustment points is "
            "{:.2f} meters deviated from the original rpc alt_offset".format(deviation)
        )
    min_alt, max_alt = -alt_scale + alt_offset, alt_scale + alt_offset

    x0, y0 = crop_offset["col0"], crop_offset["row0"]
    w, h = crop_offset["width"], crop_offset["height"]
    image_boundary = Polygon(
        np.array([[x0, y0], [x0, y0 + h], [x0 + w, y0 + h], [x0 + w, y0]])
    )

    margin = 10
    while True:
        cols, lins, alts = generate_point_mesh(
            [x0 - margin, x0 + w + margin, n_samples],
            [y0 - margin, y0 + h + margin, n_samples],
            [min_alt, max_alt, n_samples],
        )
        lons, lats = original_rpc.localization(cols, lins, alts)
        x, y, z = ellipsoid.latlon_to_ecef_np(lats, lons, alts)
        pts3d = np.stack([x, y, z], axis=1)

        target = np.asarray(project_grid_fn(pts3d))
        input_locs = np.stack([lons, lats, alts], axis=1)

        rpc_calib = weighted_lsq(target, input_locs)
        rmse_err = check_errors(rpc_calib, input_locs, target)

        reproj = _np_apply_rpc_projection(rpc_calib, pts3d)
        covered = check_correspondences_are_good(reproj, image_boundary)
        if margin > 1000 or covered:
            return rpc_calib, rmse_err, margin
        margin *= 2


def fit_Rt_corrected_rpc(Rt_vec, global_transform, original_rpc: RPCModel, crop_offset,
                         pts3d_ba, n_samples=10):
    """Fit a fresh RPC to the corrected mapping x = P(R(X - T - C) + C)
    (reference: ba_rpcfit.fit_Rt_corrected_rpc, ba_rpcfit.py:270-345)."""
    Rt_vec = np.asarray(Rt_vec).reshape(1, 9)
    pts3d_ba = np.asarray(pts3d_ba)
    pts3d_adj_for_alt = pts3d_ba - global_transform if global_transform is not None else pts3d_ba

    def project_grid(pts3d):
        p = pts3d + global_transform if global_transform is not None else pts3d
        p_adj = _np_adjust_pts3d(p, Rt_vec)
        return _np_apply_rpc_projection(original_rpc, p_adj)

    return _fit_loop(project_grid, original_rpc, crop_offset, pts3d_adj_for_alt, n_samples=n_samples)


def fit_rpc_from_projection_matrix(P, global_transform, original_rpc: RPCModel, crop_offset,
                                   pts3d_ba, n_samples=10):
    """Fit a fresh RPC copying a 3x4 projection matrix
    (reference: ba_rpcfit.fit_rpc_from_projection_matrix, ba_rpcfit.py:201-267)."""
    pts3d_ba = np.asarray(pts3d_ba)
    pts3d_adj_for_alt = pts3d_ba - global_transform if global_transform is not None else pts3d_ba
    _, _, alts = ellipsoid.ecef_to_latlon_np(
        pts3d_adj_for_alt[:, 0], pts3d_adj_for_alt[:, 1], pts3d_adj_for_alt[:, 2]
    )
    alt_offset = float(np.median(np.asarray(alts)))
    alt_scale = max(8000.0, float(np.asarray(original_rpc.alt_scale)))

    x0, y0 = crop_offset["col0"], crop_offset["row0"]

    def project_grid(pts3d):
        p = pts3d + global_transform if global_transform is not None else pts3d
        return np.asarray(apply_projection_matrix(P, p)) + np.array([x0, y0])

    return _fit_loop(
        project_grid, original_rpc, crop_offset, pts3d_adj_for_alt,
        alt_offset=alt_offset, alt_scale=alt_scale, n_samples=n_samples,
    )
