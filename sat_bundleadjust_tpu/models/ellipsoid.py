"""WGS84 ellipsoid conversions, batched and differentiable in JAX.

Internalizes the reference's custom ECEF<->geodetic conversions
(bundle_adjust/geo_utils.py:218-282). The forward direction is the closed
form; the inverse uses the same single-pass Bowring-style approximation as
the reference (NOT an iterative solve) so that the projection chain is
numerically identical to the reference's. Being pure jnp, both directions
are usable under jit/vmap/jacfwd, which replaces the reference's use of the
`ad` package for autodiff (geo_utils.py:258-282, cam_utils.py:146-174).
"""

import jax.numpy as jnp

# WGS84 constants (identical to geo_utils.py:224-227, :240-246)
_A = 6378137.0
_FINV = 298.257223563
_F = 1.0 / _FINV
_E2 = 1.0 - (1.0 - _F) * (1.0 - _F)
_E = 8.1819190842622e-2  # eccentricity used by the reference inverse


def latlon_to_ecef(lat, lon, alt):
    """Geodetic (deg, deg, m) -> ECEF (m). Reference: geo_utils.py:218-233."""
    rad_lat = lat * (jnp.pi / 180.0)
    rad_lon = lon * (jnp.pi / 180.0)
    sin_lat = jnp.sin(rad_lat)
    v = _A / jnp.sqrt(1.0 - _E2 * sin_lat * sin_lat)
    x = (v + alt) * jnp.cos(rad_lat) * jnp.cos(rad_lon)
    y = (v + alt) * jnp.cos(rad_lat) * jnp.sin(rad_lon)
    z = (v * (1.0 - _E2) + alt) * sin_lat
    return x, y, z


def ecef_to_latlon(x, y, z):
    """ECEF (m) -> geodetic (deg, deg, m), single-pass Bowring approximation.

    Reference: geo_utils.py:236-255. The ~1e-9 deg residual error of this
    non-iterative form is part of the reference's camera model, so we keep
    it bit-compatible rather than "improving" it.
    """
    asq = _A ** 2
    esq = _E ** 2
    b = jnp.sqrt(asq * (1.0 - esq))
    bsq = b ** 2
    ep = jnp.sqrt((asq - bsq) / bsq)
    p = jnp.sqrt(x ** 2 + y ** 2)
    th = jnp.arctan2(_A * z, b * p)
    lon = jnp.arctan2(y, x)
    lat = jnp.arctan2(z + (ep ** 2) * b * (jnp.sin(th) ** 3), p - esq * _A * (jnp.cos(th) ** 3))
    n = _A / jnp.sqrt(1.0 - esq * (jnp.sin(lat) ** 2))
    alt = p / jnp.cos(lat) - n
    return lat * (180.0 / jnp.pi), lon * (180.0 / jnp.pi), alt


def ecef_to_latlon_arr(pts3d):
    """(..., 3) ECEF -> (lat, lon, alt) tuple of (...,) arrays."""
    return ecef_to_latlon(pts3d[..., 0], pts3d[..., 1], pts3d[..., 2])


# ----------------------------------------------------------------------
# numpy twins (host-side evaluation; identical formulas)
# ----------------------------------------------------------------------


def latlon_to_ecef_np(lat, lon, alt):
    import numpy as np

    rad_lat = np.asarray(lat, dtype=np.float64) * (np.pi / 180.0)
    rad_lon = np.asarray(lon, dtype=np.float64) * (np.pi / 180.0)
    alt = np.asarray(alt, dtype=np.float64)
    sin_lat = np.sin(rad_lat)
    v = _A / np.sqrt(1.0 - _E2 * sin_lat * sin_lat)
    x = (v + alt) * np.cos(rad_lat) * np.cos(rad_lon)
    y = (v + alt) * np.cos(rad_lat) * np.sin(rad_lon)
    z = (v * (1.0 - _E2) + alt) * sin_lat
    return x, y, z


def ecef_to_latlon_np(x, y, z):
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    asq = _A ** 2
    esq = _E ** 2
    b = np.sqrt(asq * (1.0 - esq))
    ep = np.sqrt((asq - b ** 2) / (b ** 2))
    p = np.sqrt(x ** 2 + y ** 2)
    th = np.arctan2(_A * z, b * p)
    lon = np.arctan2(y, x)
    lat = np.arctan2(z + (ep ** 2) * b * (np.sin(th) ** 3), p - esq * _A * (np.cos(th) ** 3))
    n = _A / np.sqrt(1.0 - esq * (np.sin(lat) ** 2))
    alt = p / np.cos(lat) - n
    return lat * (180.0 / np.pi), lon * (180.0 / np.pi), alt


def latlon_to_ecef_arr(lat, lon, alt):
    """-> (..., 3) ECEF array."""
    x, y, z = latlon_to_ecef(lat, lon, alt)
    return jnp.stack([x, y, z], axis=-1)
