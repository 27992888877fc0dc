"""Stereo-pair RPC geometry helpers.

Covers the remaining surface of the reference's s2p compatibility layer:
bundle_adjust/s2p/rpc_utils.py (corresponding points, iterative height,
bounding boxes, GCP grids, GSD) and bundle_adjust/s2p/estimation.py
(rectifying similarities, affine homography estimation). All batched jnp
where there is compute, numpy where it is host-side estimation."""

import numpy as np
import jax.numpy as jnp

from sat_bundleadjust_tpu.models import ellipsoid
from sat_bundleadjust_tpu.models.cameras import generate_point_mesh
from sat_bundleadjust_tpu.models.rpc import RPCModel


def altitude_range_coarse(rpc: RPCModel, scale_factor=1.0):
    """Coarse altitude validity range (reference: s2p/rpc_utils.py:130-143)."""
    m = float(np.asarray(rpc.alt_offset)) - scale_factor * float(np.asarray(rpc.alt_scale))
    M = float(np.asarray(rpc.alt_offset)) + scale_factor * float(np.asarray(rpc.alt_scale))
    return m, M


def geodesic_bounding_box(rpc: RPCModel, x, y, w, h):
    """Lon/lat extrema of an image ROI (reference: s2p/rpc_utils.py:96-127)."""
    m, M = altitude_range_coarse(rpc)
    cols = jnp.array([x, x, x, x, x + w, x + w, x + w, x + w], dtype=jnp.float64)
    rows = jnp.array([y, y, y + h, y + h, y, y, y + h, y + h], dtype=jnp.float64)
    alts = jnp.array([m, M, m, M, m, M, m, M], dtype=jnp.float64)
    lons, lats = rpc.localization(cols, rows, alts)
    lons, lats = np.asarray(lons), np.asarray(lats)
    return lons.min(), lons.max(), lats.min(), lats.max()


def find_corresponding_point(rpc_a: RPCModel, rpc_b: RPCModel, x, y, z):
    """Pixel (x, y) of image a at altitude z -> pixel of image b
    (reference: s2p/rpc_utils.py:18-37 and eval_rpc_pair, c/rpc.c:455-462)."""
    lon, lat = rpc_a.localization(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))
    xp, yp = rpc_b.projection(lon, lat, jnp.asarray(z))
    return xp, yp, z


def compute_height(rpc1: RPCModel, rpc2: RPCModel, x1, y1, x2, y2):
    """Altitude of matched pixel pairs (reference: s2p/rpc_utils.py:40-93,
    the Python twin of c/rpc.c rpc_height) via the batched triangulation
    kernel. Returns (height, error)."""
    from sat_bundleadjust_tpu.ops.triangulate import rpc_triangulation

    pts_a = jnp.stack([jnp.atleast_1d(jnp.asarray(x1)), jnp.atleast_1d(jnp.asarray(y1))], axis=-1)
    pts_b = jnp.stack([jnp.atleast_1d(jnp.asarray(x2)), jnp.atleast_1d(jnp.asarray(y2))], axis=-1)
    pts3d, err = rpc_triangulation(rpc1, rpc2, pts_a, pts_b)
    _, _, alt = ellipsoid.ecef_to_latlon_arr(pts3d)
    return np.asarray(alt), np.asarray(err)


def ground_control_points(rpc: RPCModel, x, y, w, h, m, M, n):
    """n^3 GCP grid over an ROI and altitude range
    (reference: s2p/rpc_utils.py:199-223)."""
    col_range = [x + (1.0 / (2 * n)) * w, x + ((2 * n - 1.0) / (2 * n)) * w, n]
    row_range = [y + (1.0 / (2 * n)) * h, y + ((2 * n - 1.0) / (2 * n)) * h, n]
    cols, rows, alts = generate_point_mesh(col_range, row_range, [m, M, n])
    lons, lats = rpc.localization(jnp.asarray(cols), jnp.asarray(rows), jnp.asarray(alts))
    return np.asarray(lons), np.asarray(lats), alts


def matches_from_rpc(rpc1: RPCModel, rpc2: RPCModel, x, y, w, h, n):
    """Virtual matches between two RPC views (reference:
    s2p/rpc_utils.py:226-246)."""
    m, M = altitude_range_coarse(rpc1)
    lons, lats, alts = ground_control_points(rpc1, x, y, w, h, m, M, n)
    x1, y1 = rpc1.projection(jnp.asarray(lons), jnp.asarray(lats), jnp.asarray(alts))
    x2, y2 = rpc2.projection(jnp.asarray(lons), jnp.asarray(lats), jnp.asarray(alts))
    return np.vstack([np.asarray(x1), np.asarray(y1), np.asarray(x2), np.asarray(y2)]).T


def gsd_from_rpc(rpc: RPCModel, z=0.0):
    """Ground sampling distance in meters/pixel
    (reference: s2p/rpc_utils.py:249-266)."""
    c = float(np.asarray(rpc.col_offset))
    r = float(np.asarray(rpc.row_offset))
    lon0, lat0 = rpc.localization(jnp.float64(c), jnp.float64(r), jnp.float64(z))
    lon1, lat1 = rpc.localization(jnp.float64(c + 1), jnp.float64(r), jnp.float64(z))
    a = ellipsoid.latlon_to_ecef_arr(jnp.asarray(lat0), jnp.asarray(lon0), jnp.float64(z))
    b = ellipsoid.latlon_to_ecef_arr(jnp.asarray(lat1), jnp.asarray(lon1), jnp.float64(z))
    return float(jnp.linalg.norm(a - b))


# ----------------------------------------------------------------------
# estimation extras (reference: s2p/estimation.py)
# ----------------------------------------------------------------------


def fundamental_matrix_cameras(P1, P2):
    """F from two projection matrices (reference: s2p/estimation.py:9-48)."""
    P1 = np.asarray(P1)
    P2 = np.asarray(P2)
    X0 = P1[[1, 2], :]
    X1 = P1[[2, 0], :]
    X2 = P1[[0, 1], :]
    Y0 = P2[[1, 2], :]
    Y1 = P2[[2, 0], :]
    Y2 = P2[[0, 1], :]
    F = np.zeros((3, 3))
    for i, Y in enumerate((Y0, Y1, Y2)):
        for j, X in enumerate((X0, X1, X2)):
            F[i, j] = np.linalg.det(np.vstack([X, Y]))
    return F


def rectifying_similarities_from_affine_fundamental_matrix(F, debug=False):
    """Rectifying similarities S1, S2 from an affine F
    (reference: s2p/estimation.py:51-111; used by the native matcher's
    epipolar gating, sift4ctypes.cpp:23-48)."""
    a = F[0, 2]
    b = F[1, 2]
    c = F[2, 0]
    d = F[2, 1]
    e = F[2, 2]

    r = np.hypot(c, d)
    s = np.hypot(a, b)
    R1 = (1.0 / r) * np.array([[d, -c], [c, d]])
    R2 = (1.0 / s) * np.array([[-b, a], [-a, -b]])
    z = np.sqrt(r / s)
    t = 0.5 * e / np.sqrt(r * s)

    S1 = np.zeros((3, 3))
    S1[0:2, 0:2] = z * R1
    S1[1, 2] = t
    S1[2, 2] = 1.0
    S2 = np.zeros((3, 3))
    S2[0:2, 0:2] = (1.0 / z) * R2
    S2[1, 2] = -t
    S2[2, 2] = 1.0
    return S1, S2


def affine_transformation(x, xx):
    """Least-squares affine homography x -> xx
    (reference: s2p/estimation.py:157-205)."""
    x = np.asarray(x)
    xx = np.asarray(xx)
    n = x.shape[0]
    A = np.zeros((2 * n, 6))
    b = np.zeros(2 * n)
    A[0::2, 0:2] = x
    A[0::2, 2] = 1.0
    A[1::2, 3:5] = x
    A[1::2, 5] = 1.0
    b[0::2] = xx[:, 0]
    b[1::2] = xx[:, 1]
    sol, *_ = np.linalg.lstsq(A, b, rcond=None)
    T = np.eye(3)
    T[0, :] = sol[0:3]
    T[1, :] = sol[3:6]
    return T


def translation(x, xx):
    """Mean-translation homography (reference: s2p/estimation.py:208-227)."""
    t = np.mean(np.asarray(xx) - np.asarray(x), axis=0)
    T = np.eye(3)
    T[0, 2] = t[0]
    T[1, 2] = t[1]
    return T
