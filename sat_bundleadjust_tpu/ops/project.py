"""Batched reprojection of tie points through corrected camera models.

This is the innermost computation of the bundle adjustment residual
(reference: bundle_adjust/ba_core.py:59-183). The reference evaluates the
RPC model with a Python loop over cameras (ba_core.py:151-153); here every
observation is processed in one fused batched computation: camera parameters
and RPC coefficients are gathered per-observation, so the whole residual is
a single XLA program with no data-dependent control flow.

Camera parameter layouts (identical to ba_params.load_cam_params_from_camera,
reference: bundle_adjust/ba_params.py:19-44):

* rpc:         [euler_xyz (3), T (3), C (3)]          -> 9 values
* affine:      [euler_xyz (3), T (2), fx, fy, skew]   -> 8 values
* perspective: [euler_xyz (3), T (3), fx, fy, skew, cx, cy] -> 11 values
"""

import jax
import jax.numpy as jnp

from sat_bundleadjust_tpu.models import ellipsoid
from sat_bundleadjust_tpu.models.rotations import rotate_euler
from sat_bundleadjust_tpu.models.rpc import RPCModel, rpc_projection

CAM_PARAMS_SIZE = {"rpc": 9, "affine": 8, "perspective": 11}


def adjust_pts3d(pts3d, rt_vec):
    """Correction mapping X' = R(X - T - C) + C (reference: ba_core.py:110-130).

    pts3d: (..., 3); rt_vec: (..., 9) = [euler(3), T(3), C(3)]."""
    adj = pts3d - rt_vec[..., 3:6] - rt_vec[..., 6:9]
    adj = rotate_euler(adj, rt_vec[..., :3])
    return adj + rt_vec[..., 6:9]


def project_rpc(pts3d, rpcs: RPCModel, cam_params, pts_ind, cam_ind):
    """Project tie points through corrective-rotation + original RPC.

    Args:
      pts3d: (N, 3) ECEF tie points
      rpcs: batched RPCModel with leading dim M
      cam_params: (M, 9)
      pts_ind, cam_ind: (K,) observation index tables
    Returns:
      (K, 2) projected (col, row)

    Reference: ba_core.py:133-154 (but with the per-camera loop replaced by
    a per-observation gather of the RPC coefficient pytree)."""
    X = pts3d[pts_ind]
    P = cam_params[cam_ind]
    Xadj = adjust_pts3d(X, P)
    lat, lon, alt = ellipsoid.ecef_to_latlon(Xadj[..., 0], Xadj[..., 1], Xadj[..., 2])
    rpc_k = jax.tree.map(lambda leaf: leaf[cam_ind], rpcs)
    col, row = rpc_projection(rpc_k, lon, lat, alt)
    return jnp.stack([col, row], axis=-1)


def project_affine(pts3d, cam_params, pts_ind, cam_ind):
    """Affine projection (reference: ba_core.py:59-81)."""
    P = cam_params[cam_ind]
    pts = rotate_euler(pts3d[pts_ind], P[..., :3])
    xy = pts[..., :2] + P[..., 3:5]
    fx, fy, skew = P[..., 5], P[..., 6], P[..., 7]
    u = fx * xy[..., 0] + skew * xy[..., 1]
    v = fy * xy[..., 1]
    return jnp.stack([u, v], axis=-1)


def project_perspective(pts3d, cam_params, pts_ind, cam_ind):
    """Perspective projection (reference: ba_core.py:84-107)."""
    P = cam_params[cam_ind]
    pts = rotate_euler(pts3d[pts_ind], P[..., :3]) + P[..., 3:6]
    fx, fy, skew = P[..., 6], P[..., 7], P[..., 8]
    cx, cy = P[..., 9], P[..., 10]
    u = fx * pts[..., 0] + skew * pts[..., 1] + cx * pts[..., 2]
    v = fy * pts[..., 1] + cy * pts[..., 2]
    return jnp.stack([u / pts[..., 2], v / pts[..., 2]], axis=-1)


def project(cam_model, pts3d, cam_params, pts_ind, cam_ind, rpcs=None):
    if cam_model == "rpc":
        return project_rpc(pts3d, rpcs, cam_params, pts_ind, cam_ind)
    if cam_model == "affine":
        return project_affine(pts3d, cam_params, pts_ind, cam_ind)
    if cam_model == "perspective":
        return project_perspective(pts3d, cam_params, pts_ind, cam_ind)
    raise ValueError(cam_model)


def residuals(cam_model, pts3d, cam_params, pts_ind, cam_ind, pts2d, weights, rpcs=None):
    """Weighted reprojection residuals (K, 2).

    Reference: ba_core.fun (ba_core.py:157-183); residual = w * (proj - obs)."""
    proj = project(cam_model, pts3d, cam_params, pts_ind, cam_ind, rpcs=rpcs)
    return weights[:, None] * (proj - pts2d)


def reprojection_error(cam_model, pts3d, cam_params, pts_ind, cam_ind, pts2d, rpcs=None):
    """Unweighted per-observation L2 reprojection error (K,).

    Reference: ba_core.compute_reprojection_error (ba_core.py:335-349)."""
    proj = project(cam_model, pts3d, cam_params, pts_ind, cam_ind, rpcs=rpcs)
    return jnp.linalg.norm(proj - pts2d, axis=-1)
