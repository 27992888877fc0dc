"""Transcendental-free ECEF -> normalized-RPC-coordinate evaluation.

The BA residual needs geodetic angles only as the RPC's *normalized*
coordinates nlat = (lat - lat_offset)/lat_scale (likewise lon), i.e. as
small differences from per-camera constants. That removes every
transcendental from the inner loop:

  * lat = atan2(zz, pp): its sin/cos (for N and alt) are the algebraic
    ratios zz/h, pp/h — no angle needed;
  * the angle DIFFERENCE from the camera anchor phi0 is
    atan((zz c0 - pp s0) / (pp c0 + zz s0)) with the anchor's sin/cos
    precomputed host-side; the argument is bounded by the RPC's validity
    scale (<= a few degrees), so a 3-term odd Taylor series evaluates atan
    to < 1e-12 rad;
  * same for lon around lambda0; the Bowring intermediate angle th only
    ever appears through sin^3/cos^3 — again algebraic.

On TPU this matters doubly: f64 transcendentals are slow *and* only
f32-accurate (measured ~3e-8 abs on this stack), while the algebraic path
is mul/add/sqrt only — fast under f64 emulation and fully accurate. The
reference-parity formula (models/ellipsoid.ecef_to_latlon, the one-pass
Bowring form of geo_utils.py:236-255) remains the file-facing
implementation; this module is its solver-side evaluation."""

import jax.numpy as jnp
import numpy as np

_A = 6378137.0
_E = 8.1819190842622e-2
_ESQ = _E * _E
_B = np.sqrt(_A * _A * (1.0 - _ESQ))
_EP2 = (_A * _A - _B * _B) / (_B * _B)
_DEG_PER_RAD = 180.0 / np.pi


def _atan_small(u):
    """atan(u) for |u| <= ~0.1: odd Taylor to u^7 (error < 1e-8 at 0.1,
    < 1e-12 inside RPC validity scales)."""
    u2 = u * u
    return u * (1.0 - u2 * (1.0 / 3.0 - u2 * (1.0 / 5.0 - u2 * (1.0 / 7.0))))


def anchors_from_rpcs(rpcs):
    """Per-camera anchor trig, host-side: returns dict of arrays (M,)
    with sin/cos of lat_offset and lon_offset (radians)."""
    lat0 = np.asarray(rpcs.lat_offset, dtype=np.float64) / _DEG_PER_RAD
    lon0 = np.asarray(rpcs.lon_offset, dtype=np.float64) / _DEG_PER_RAD
    return {
        "sin_lat0": np.sin(lat0),
        "cos_lat0": np.cos(lat0),
        "sin_lon0": np.sin(lon0),
        "cos_lon0": np.cos(lon0),
    }


def normalized_geodetic(Y, rpc_k, anchors_k):
    """ECEF points -> (nlat, nlon, nalt) normalized RPC coordinates.

    Y: (K, 3); rpc_k: RPCModel pytree with per-obs leaves; anchors_k: dict
    of per-obs anchor trig (gathered from anchors_from_rpcs).

    Evaluates the exact same Bowring one-pass model as
    models/ellipsoid.ecef_to_latlon, but angle-difference-wise with no
    transcendentals."""
    x, y, z = Y[..., 0], Y[..., 1], Y[..., 2]
    p = jnp.sqrt(x * x + y * y)

    # intermediate angle th = atan2(a z, b p): only sin/cos needed
    ta = _A * z
    tb = _B * p
    th_h = jnp.sqrt(ta * ta + tb * tb)
    sin_th = ta / th_h
    cos_th = tb / th_h

    # Bowring latitude arguments
    zz = z + _EP2 * _B * sin_th ** 3
    pp = p - _ESQ * _A * cos_th ** 3
    lat_h = jnp.sqrt(zz * zz + pp * pp)
    sin_lat = zz / lat_h
    cos_lat = pp / lat_h

    # altitude from algebraic sin/cos
    n = _A / jnp.sqrt(1.0 - _ESQ * sin_lat * sin_lat)
    alt = p / cos_lat - n

    # angle differences from the per-camera anchors via small-angle atan
    s0, c0 = anchors_k["sin_lat0"], anchors_k["cos_lat0"]
    u_lat = (zz * c0 - pp * s0) / (pp * c0 + zz * s0)
    dlat_rad = _atan_small(u_lat)
    sl0, cl0 = anchors_k["sin_lon0"], anchors_k["cos_lon0"]
    u_lon = (y * cl0 - x * sl0) / (x * cl0 + y * sl0)
    dlon_rad = _atan_small(u_lon)

    nlat = dlat_rad * (_DEG_PER_RAD / rpc_k.lat_scale)
    nlon = dlon_rad * (_DEG_PER_RAD / rpc_k.lon_scale)
    nalt = (alt - rpc_k.alt_offset) / rpc_k.alt_scale
    # anchors are the rpc offsets themselves, so no offset subtraction on
    # the angle terms (lat_offset cancels exactly)
    return nlat, nlon, nalt, sin_lat, cos_lat
