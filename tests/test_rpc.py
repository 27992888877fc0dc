"""Geometry-core oracles: RPC projection/localization round trips and parity
with the reference's bundled SkySat RPC files.

The reference has no unit tests for this layer (its only oracle is the
end-to-end golden file comparison, tests/test_ba.py); these tests implement
the projection round-trip oracle recommended in SURVEY.md section 7 step 1.
"""

import glob
import os

import numpy as np
import jax.numpy as jnp
import pytest

from sat_bundleadjust_tpu.models import ellipsoid
from sat_bundleadjust_tpu.models.rpc import (
    RPCModel,
    rpc_from_rpc_file,
    rpc_from_dict,
    rpc_to_dict,
    stack_rpcs,
    write_rpc_file,
)

REF_RPC_DIR = "/root/reference/tests/data/images"
RPC_FILES = sorted(glob.glob(os.path.join(REF_RPC_DIR, "*.rpc")))


def _load_rpcs():
    assert RPC_FILES, "reference RPC fixtures not found"
    return [rpc_from_rpc_file(f) for f in RPC_FILES]


def test_rpc_file_roundtrip(tmp_path):
    for f in RPC_FILES:
        rpc = rpc_from_rpc_file(f)
        out = tmp_path / os.path.basename(f)
        write_rpc_file(rpc, str(out))
        rpc2 = rpc_from_rpc_file(str(out))
        for a, b in zip(rpc, rpc2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_projection_localization_roundtrip():
    """localization(projection(lon, lat, alt)) == (lon, lat) to < 1e-9 deg.

    The lon/lat samples are obtained by localizing in-image pixels, so they
    lie inside the RPC's valid footprint (the rational model has poles far
    outside it)."""
    for rpc in _load_rpcs():
        rng = np.random.RandomState(0)
        cols = float(rpc.col_offset) + 0.9 * float(rpc.col_scale) * rng.uniform(-1, 1, 100)
        rows = float(rpc.row_offset) + 0.9 * float(rpc.row_scale) * rng.uniform(-1, 1, 100)
        alts = float(rpc.alt_offset) + 0.5 * float(rpc.alt_scale) * rng.uniform(-1, 1, 100)
        lons, lats = rpc.localization(jnp.array(cols), jnp.array(rows), jnp.array(alts))
        lons, lats = np.asarray(lons), np.asarray(lats)
        col, row = rpc.projection(jnp.array(lons), jnp.array(lats), jnp.array(alts))
        lon_back, lat_back = rpc.localization(col, row, jnp.array(alts))
        np.testing.assert_allclose(np.asarray(lon_back), lons, atol=1e-9)
        np.testing.assert_allclose(np.asarray(lat_back), lats, atol=1e-9)


def test_localization_projection_roundtrip():
    """projection(localization(col, row, alt)) == (col, row) to < 1e-6 px."""
    for rpc in _load_rpcs():
        rng = np.random.RandomState(1)
        cols = float(rpc.col_offset) + 0.9 * float(rpc.col_scale) * rng.uniform(-1, 1, 100)
        rows = float(rpc.row_offset) + 0.9 * float(rpc.row_scale) * rng.uniform(-1, 1, 100)
        alts = float(rpc.alt_offset) + 0.5 * float(rpc.alt_scale) * rng.uniform(-1, 1, 100)
        lon, lat = rpc.localization(jnp.array(cols), jnp.array(rows), jnp.array(alts))
        col_back, row_back = rpc.projection(lon, lat, jnp.array(alts))
        np.testing.assert_allclose(np.asarray(col_back), cols, atol=1e-6)
        np.testing.assert_allclose(np.asarray(row_back), rows, atol=1e-6)


def test_batched_rpc_matches_single():
    rpcs = _load_rpcs()
    batched = stack_rpcs(rpcs)
    lon = np.array([float(r.lon_offset) for r in rpcs])
    lat = np.array([float(r.lat_offset) for r in rpcs])
    alt = np.array([float(r.alt_offset) for r in rpcs])
    col_b, row_b = batched.projection(jnp.array(lon), jnp.array(lat), jnp.array(alt))
    for i, r in enumerate(rpcs):
        c, w = r.projection(lon[i], lat[i], alt[i])
        assert abs(float(c) - float(col_b[i])) < 1e-9
        assert abs(float(w) - float(row_b[i])) < 1e-9


def test_ecef_roundtrip():
    rng = np.random.RandomState(2)
    lats = rng.uniform(-80, 80, 200)
    lons = rng.uniform(-180, 180, 200)
    alts = rng.uniform(-100, 9000, 200)
    x, y, z = ellipsoid.latlon_to_ecef(jnp.array(lats), jnp.array(lons), jnp.array(alts))
    lat2, lon2, alt2 = ellipsoid.ecef_to_latlon(x, y, z)
    # the reference's inverse is a one-pass approximation: ~1e-7 deg / ~1e-2 m
    np.testing.assert_allclose(np.asarray(lat2), lats, atol=5e-6)
    np.testing.assert_allclose(np.asarray(lon2), lons, atol=1e-9)
    np.testing.assert_allclose(np.asarray(alt2), alts, atol=2e-2)


def test_ecef_matches_reference_numerics():
    """Bit-level parity with geo_utils.latlon_to_ecef_custom /
    ecef_to_latlon_custom (reference: geo_utils.py:218-255)."""

    def ref_latlon_to_ecef(lat, lon, alt):
        rad_lat = lat * (np.pi / 180.0)
        rad_lon = lon * (np.pi / 180.0)
        a = 6378137.0
        f = 1 / 298.257223563
        e2 = 1 - (1 - f) * (1 - f)
        v = a / np.sqrt(1 - e2 * np.sin(rad_lat) ** 2)
        return (
            (v + alt) * np.cos(rad_lat) * np.cos(rad_lon),
            (v + alt) * np.cos(rad_lat) * np.sin(rad_lon),
            (v * (1 - e2) + alt) * np.sin(rad_lat),
        )

    def ref_ecef_to_latlon(x, y, z):
        a = 6378137.0
        e = 8.1819190842622e-2
        asq, esq = a ** 2, e ** 2
        b = np.sqrt(asq * (1 - esq))
        ep = np.sqrt((asq - b ** 2) / b ** 2)
        p = np.sqrt(x ** 2 + y ** 2)
        th = np.arctan2(a * z, b * p)
        lon = np.arctan2(y, x)
        lat = np.arctan2(z + ep ** 2 * b * np.sin(th) ** 3, p - esq * a * np.cos(th) ** 3)
        n = a / np.sqrt(1 - esq * np.sin(lat) ** 2)
        alt = p / np.cos(lat) - n
        return lat * 180 / np.pi, lon * 180 / np.pi, alt

    rng = np.random.RandomState(3)
    lats = rng.uniform(-60, 60, 50)
    lons = rng.uniform(-180, 180, 50)
    alts = rng.uniform(0, 4000, 50)
    ours = ellipsoid.latlon_to_ecef(jnp.array(lats), jnp.array(lons), jnp.array(alts))
    ref = ref_latlon_to_ecef(lats, lons, alts)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o), r, rtol=1e-14)
    ours_inv = ellipsoid.ecef_to_latlon(*[jnp.array(np.asarray(v)) for v in ref])
    ref_inv = ref_ecef_to_latlon(*ref)
    for o, r in zip(ours_inv, ref_inv):
        np.testing.assert_allclose(np.asarray(o), r, rtol=1e-12)


def test_poly_ordering_matches_reference():
    """The 20-term basis must follow the convention of ba_rpcfit.poly_vect
    (reference: bundle_adjust/ba_rpcfit.py:17-44)."""
    from sat_bundleadjust_tpu.models.rpc import poly20_basis

    x, y, z = 0.3, -0.7, 0.2  # x=lat, y=lon, z=alt (normalized)
    expected = [
        1, y, x, z, y * x, y * z, x * z, y * y, x * x, z * z,
        x * y * z, y ** 3, y * x * x, y * z * z, y * y * x,
        x ** 3, x * z * z, y * y * z, x * x * z, z ** 3,
    ]
    got = np.asarray(poly20_basis(jnp.float64(x), jnp.float64(y), jnp.float64(z)))
    np.testing.assert_allclose(got, expected, rtol=1e-15)


def test_poly_basis_derivatives():
    from sat_bundleadjust_tpu.models.rpc import (
        poly20_basis,
        poly20_basis_dx,
        poly20_basis_dy,
    )
    import jax

    x, y, z = jnp.float64(0.21), jnp.float64(-0.43), jnp.float64(0.11)
    jx = jax.jacfwd(lambda v: poly20_basis(v, y, z))(x)
    jy = jax.jacfwd(lambda v: poly20_basis(x, v, z))(y)
    np.testing.assert_allclose(np.asarray(jx), np.asarray(poly20_basis_dx(x, y, z)), atol=1e-14)
    np.testing.assert_allclose(np.asarray(jy), np.asarray(poly20_basis_dy(x, y, z)), atol=1e-14)
