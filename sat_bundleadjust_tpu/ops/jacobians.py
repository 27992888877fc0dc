"""Analytic block Jacobians of the RPC reprojection residual.

The reference differentiates nothing: scipy finite-differences the full
residual vector with sparsity grouping (~9+ extra residual evaluations per
Jacobian, ba_core.py:284-297). jax.jacfwd over the per-observation chain
(12 input tangents) already beats that; this module goes further and
evaluates the closed-form chain rule, costing ~2-3 residual evaluations:

  r = w * (proj(R(theta) (X - T - C) + C) - obs)

  dY/dtheta_k = (dR/dtheta_k) (X - T - C)        [rotation factor products]
  dY/dX = R,  dY/dT = -R,  dY/dC = I - R
  d(geodetic)/dY = [d(ecef)/d(geodetic)]^-1      [inverse function theorem,
                                                  exact closed form]
  d(col,row)/d(lon,lat,alt): quotient rule over the 20-term cubic basis
                             derivative tables (models/rpc.py)

All terms are (K, ...) batched; used by ba/solver.make_fns for
cam_model="rpc" (affine/perspective keep the AD path — they are cheap)."""

import jax
import jax.numpy as jnp

from sat_bundleadjust_tpu.ops import smallmat as sm

from sat_bundleadjust_tpu.models.rpc import (
    poly20_basis,
    poly20_basis_dx,
    poly20_basis_dy,
    poly20_basis_dz,
)
from sat_bundleadjust_tpu.ops.fastgeo import anchors_from_rpcs, normalized_geodetic

_A = 6378137.0
_E2 = 1.0 - (1.0 - 1.0 / 298.257223563) ** 2
_DEG = jnp.pi / 180.0


def _rotation_and_derivs(euler):
    """R = Rz Ry Rx and dR/d(roll, pitch, yaw), batched: euler (K, 3) ->
    R (K, 3, 3), dR (K, 3, 3, 3)."""
    a, b, c = euler[..., 0], euler[..., 1], euler[..., 2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    z = jnp.zeros_like(a)
    o = jnp.ones_like(a)

    def mat(rows):
        return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

    Rx = mat([[o, z, z], [z, ca, -sa], [z, sa, ca]])
    Ry = mat([[cb, z, sb], [z, o, z], [-sb, z, cb]])
    Rz = mat([[cc, -sc, z], [sc, cc, z], [z, z, o]])
    dRx = mat([[z, z, z], [z, -sa, -ca], [z, ca, -sa]])
    dRy = mat([[-sb, z, cb], [z, z, z], [-cb, z, -sb]])
    dRz = mat([[-sc, -cc, z], [cc, -sc, z], [z, z, z]])

    RzRy = sm.mm(Rz, Ry)
    R = sm.mm(RzRy, Rx)
    dR = jnp.stack(
        [sm.mm(RzRy, dRx), sm.mm(Rz, sm.mm(dRy, Rx)), sm.mm(dRz, sm.mm(Ry, Rx))],
        axis=-3,
    )
    return R, dR


def _decef_dgeodetic(sp, cp, sl, cl, alt):
    """J_f = d(x, y, z)/d(lat, lon, alt) in degrees, batched -> (K, 3, 3).

    Takes the algebraic sin/cos of lat (sp, cp) and lon (sl, cl) directly —
    no transcendentals."""
    w = jnp.sqrt(1.0 - _E2 * sp * sp)
    n = _A / w
    dn = _A * _E2 * sp * cp / (w ** 3)

    dx_dphi = (dn * cp - (n + alt) * sp) * cl
    dy_dphi = (dn * cp - (n + alt) * sp) * sl
    dz_dphi = dn * (1 - _E2) * sp + (n * (1 - _E2) + alt) * cp
    dx_dlam = -(n + alt) * cp * sl
    dy_dlam = (n + alt) * cp * cl
    dz_dlam = jnp.zeros_like(sp)
    dx_dh = cp * cl
    dy_dh = cp * sl
    dz_dh = sp

    J = jnp.stack(
        [
            jnp.stack([dx_dphi * _DEG, dx_dlam * _DEG, dx_dh], axis=-1),
            jnp.stack([dy_dphi * _DEG, dy_dlam * _DEG, dy_dh], axis=-1),
            jnp.stack([dz_dphi * _DEG, dz_dlam * _DEG, dz_dh], axis=-1),
        ],
        axis=-2,
    )
    return J


def _dproj_dgeo(rpc_k, nlat, nlon, nalt):
    """(col, row) and d(col, row)/d(lat, lon, alt) from NORMALIZED
    geodetic coordinates, batched.

    rpc_k: RPCModel pytree with per-observation leaves (leading dim K)."""
    b = poly20_basis(nlat, nlon, nalt)
    b_dlat = poly20_basis_dx(nlat, nlon, nalt)
    b_dlon = poly20_basis_dy(nlat, nlon, nalt)
    b_dalt = poly20_basis_dz(nlat, nlon, nalt)

    def rational(num, den, scale, offset):
        p = jnp.sum(b * num, axis=-1)
        q = jnp.sum(b * den, axis=-1)
        v = p / q
        out = v * scale + offset

        def deriv(basis_d):
            pd = jnp.sum(basis_d * num, axis=-1)
            qd = jnp.sum(basis_d * den, axis=-1)
            return (pd - v * qd) / q * scale

        return out, deriv(b_dlat), deriv(b_dlon), deriv(b_dalt)

    col, c_dlat, c_dlon, c_dalt = rational(
        rpc_k.samp_num, rpc_k.samp_den, rpc_k.col_scale, rpc_k.col_offset
    )
    row, r_dlat, r_dlon, r_dalt = rational(
        rpc_k.line_num, rpc_k.line_den, rpc_k.row_scale, rpc_k.row_offset
    )
    # chain the geodetic normalization scales
    J = jnp.stack(
        [
            jnp.stack([c_dlat / rpc_k.lat_scale, c_dlon / rpc_k.lon_scale, c_dalt / rpc_k.alt_scale], axis=-1),
            jnp.stack([r_dlat / rpc_k.lat_scale, r_dlon / rpc_k.lon_scale, r_dalt / rpc_k.alt_scale], axis=-1),
        ],
        axis=-2,
    )  # (K, 2, 3) in (lat, lon, alt) order
    return jnp.stack([col, row], axis=-1), J


def residuals_rpc(pts3d, rpcs, cam_params, pts_ind, cam_ind, pts2d, weights,
                  anchors):
    """Batched forward residuals via the transcendental-free chain (matches
    the Jacobian path of residuals_and_jacobians_rpc bit-for-bit)."""
    X = pts3d[pts_ind]
    P = cam_params[cam_ind]
    rpc_k = jax.tree.map(lambda leaf: leaf[cam_ind], rpcs)
    anch_k = {k: v[cam_ind] for k, v in anchors.items()}
    theta, T, C = P[:, 0:3], P[:, 3:6], P[:, 6:9]
    R, _ = _rotation_and_derivs(theta)
    Y = sm.mv(R, X - T - C) + C
    nlat, nlon, nalt, _, _ = normalized_geodetic(Y, rpc_k, anch_k)
    b = poly20_basis(nlat, nlon, nalt)
    col = jnp.sum(b * rpc_k.samp_num, axis=-1) / jnp.sum(b * rpc_k.samp_den, axis=-1)
    row = jnp.sum(b * rpc_k.line_num, axis=-1) / jnp.sum(b * rpc_k.line_den, axis=-1)
    proj = jnp.stack(
        [col * rpc_k.col_scale + rpc_k.col_offset, row * rpc_k.row_scale + rpc_k.row_offset],
        axis=-1,
    )
    return weights[:, None] * (proj - pts2d)


def residuals_and_jacobians_rpc(pts3d, rpcs, cam_params, pts_ind, cam_ind, pts2d,
                                weights, n_params, anchors, jac_dtype=jnp.float32):
    """Batched residuals + analytic Jacobian blocks for the rpc model.

    Returns (r (K, 2), J_cam (K, 2, n_params), J_pt (K, 2, 3)). The
    camera block is ordered [theta(3), T(3), C(3)][:n_params], matching
    ba/params.py's parameter layout. `anchors` is
    fastgeo.anchors_from_rpcs(rpcs) (host-precomputed trig constants).

    Precision split: the residual r is evaluated in the input precision
    (f64) — it suffers catastrophic cancellation (proj - obs). The Jacobian
    is assembled in `jac_dtype` (default f32): all its factors are smooth
    products/ratios of quantities that are either small (normalized
    coordinates, rotation angles) or explicitly differenced in f64 first
    (Xc), so f32 gives ~7 significant digits — far more than a descent
    direction needs, at a fraction of the TPU f64-emulation cost. Pass
    jac_dtype=jnp.float64 for a full-precision Jacobian."""
    X = pts3d[pts_ind]  # (K, 3)
    P = cam_params[cam_ind]  # (K, 9)
    rpc_k = jax.tree.map(lambda leaf: leaf[cam_ind], rpcs)
    anch_k = {k: v[cam_ind] for k, v in anchors.items()}

    theta, T, C = P[:, 0:3], P[:, 3:6], P[:, 6:9]
    R, dR = _rotation_and_derivs(theta)
    Xc = X - T - C  # f64 difference (inputs are ~6.4e6 m)
    Y = sm.mv(R, Xc) + C

    nlat, nlon, nalt, sin_lat, cos_lat = normalized_geodetic(Y, rpc_k, anch_k)

    # ---- residual: full precision forward evaluation
    b64 = poly20_basis(nlat, nlon, nalt)
    col = jnp.sum(b64 * rpc_k.samp_num, axis=-1) / jnp.sum(b64 * rpc_k.samp_den, axis=-1)
    row = jnp.sum(b64 * rpc_k.line_num, axis=-1) / jnp.sum(b64 * rpc_k.line_den, axis=-1)
    proj = jnp.stack(
        [col * rpc_k.col_scale + rpc_k.col_offset, row * rpc_k.row_scale + rpc_k.row_offset],
        axis=-1,
    )
    w2 = weights[:, None]
    r = w2 * (proj - pts2d)

    # ---- Jacobian: assembled in jac_dtype
    f = lambda a: a.astype(jac_dtype)
    rpc_j = jax.tree.map(f, rpc_k)
    J_geo = _dproj_dgeo_jac(rpc_j, f(nlat), f(nlon), f(nalt))  # (K, 2, 3)

    # d(geodetic)/dY = J_f^{-1} (inverse function theorem); closed-form 3x3
    # inverse — TPU XLA implements LuDecomposition only for f32. sin/cos of
    # lon are algebraic ratios of the ECEF coordinates.
    from sat_bundleadjust_tpu.ops.lm import _inv3x3

    p_xy = jnp.sqrt(Y[:, 0] ** 2 + Y[:, 1] ** 2)
    sin_lon = f(Y[:, 1] / p_xy)
    cos_lon = f(Y[:, 0] / p_xy)
    alt = f(nalt * rpc_k.alt_scale + rpc_k.alt_offset)
    J_f = _decef_dgeodetic(f(sin_lat), f(cos_lat), sin_lon, cos_lon, alt)
    J_inv = _inv3x3(J_f)  # (K, 3, 3): d(lat,lon,alt)/decef
    J_proj_Y = sm.mm(J_geo, J_inv)  # (K, 2, 3)

    Rj = f(R)
    wj = f(w2)[..., None]

    # point block: dY/dX = R
    J_pt = sm.mm(J_proj_Y, Rj) * wj

    blocks = []
    if n_params > 0:  # theta
        # dY/dtheta_t = dR[t] @ Xc -> (K, 3 [i], 3 [t])
        dY_dtheta = jnp.stack([f(sm.mv(dR[:, t], Xc)) for t in range(3)], axis=-1)
        blocks.append(sm.mm(J_proj_Y, dY_dtheta))
    if n_params > 3:  # T: dY/dT = -R
        blocks.append(sm.mm(J_proj_Y, -Rj))
    if n_params > 6:  # C: dY/dC = I - R
        blocks.append(sm.mm(J_proj_Y, jnp.eye(3, dtype=jac_dtype) - Rj))
    if blocks:
        J_cam = jnp.concatenate(blocks, axis=-1)[:, :, :n_params] * wj
    else:
        J_cam = jnp.zeros(r.shape + (0,), dtype=jac_dtype)
    return r, J_cam, J_pt


def _dproj_dgeo_jac(rpc_k, nlat, nlon, nalt):
    """d(col, row)/d(lat, lon, alt) only (no forward value), in the dtype of
    its inputs — the Jacobian-assembly half of _dproj_dgeo."""
    b = poly20_basis(nlat, nlon, nalt)
    b_dlat = poly20_basis_dx(nlat, nlon, nalt)
    b_dlon = poly20_basis_dy(nlat, nlon, nalt)
    b_dalt = poly20_basis_dz(nlat, nlon, nalt)

    def rational_derivs(num, den, scale):
        p = jnp.sum(b * num, axis=-1)
        q = jnp.sum(b * den, axis=-1)
        v = p / q

        def deriv(basis_d):
            pd = jnp.sum(basis_d * num, axis=-1)
            qd = jnp.sum(basis_d * den, axis=-1)
            return (pd - v * qd) / q * scale

        return deriv(b_dlat), deriv(b_dlon), deriv(b_dalt)

    c_dlat, c_dlon, c_dalt = rational_derivs(rpc_k.samp_num, rpc_k.samp_den, rpc_k.col_scale)
    r_dlat, r_dlon, r_dalt = rational_derivs(rpc_k.line_num, rpc_k.line_den, rpc_k.row_scale)
    return jnp.stack(
        [
            jnp.stack([c_dlat / rpc_k.lat_scale, c_dlon / rpc_k.lon_scale, c_dalt / rpc_k.alt_scale], axis=-1),
            jnp.stack([r_dlat / rpc_k.lat_scale, r_dlon / rpc_k.lon_scale, r_dalt / rpc_k.alt_scale], axis=-1),
        ],
        axis=-2,
    )
