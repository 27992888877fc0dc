"""Stereo-geometry helper oracles (models/stereo.py) + ba/utils.py."""

import numpy as np
import jax.numpy as jnp

from synthetic import load_ref_rpcs

from sat_bundleadjust_tpu.models import stereo
from sat_bundleadjust_tpu.models import ellipsoid


def test_matches_from_rpc_are_consistent():
    r0, r1 = load_ref_rpcs()
    m = stereo.matches_from_rpc(r0, r1, 0, 0, 3000, 1300, 5)
    assert m.shape == (125, 4)
    # the virtual matches must triangulate back to consistent ground points
    h, err = stereo.compute_height(r0, r1, m[:, 0], m[:, 1], m[:, 2], m[:, 3])
    assert np.max(err) < 0.05


def test_compute_height_recovers_altitude():
    r0, r1 = load_ref_rpcs()
    lon, lat, alt = float(r0.lon_offset), float(r0.lat_offset), 123.0
    x1, y1 = r0.projection(jnp.float64(lon), jnp.float64(lat), jnp.float64(alt))
    x2, y2 = r1.projection(jnp.float64(lon), jnp.float64(lat), jnp.float64(alt))
    h, err = stereo.compute_height(r0, r1, float(x1), float(y1), float(x2), float(y2))
    assert abs(h[0] - alt) < 0.5, h


def test_find_corresponding_point():
    r0, r1 = load_ref_rpcs()
    lon, lat, z = float(r0.lon_offset), float(r0.lat_offset), 50.0
    x, y = r0.projection(jnp.float64(lon), jnp.float64(lat), jnp.float64(z))
    xp, yp, _ = stereo.find_corresponding_point(r0, r1, float(x), float(y), z)
    x2, y2 = r1.projection(jnp.float64(lon), jnp.float64(lat), jnp.float64(z))
    assert abs(float(xp) - float(x2)) < 1e-6
    assert abs(float(yp) - float(y2)) < 1e-6


def test_gsd_plausible_for_skysat():
    r0 = load_ref_rpcs()[0]
    gsd = stereo.gsd_from_rpc(r0, z=30.0)
    assert 0.3 < gsd < 5.0, gsd  # SkySat is sub-meter to few-meter class


def test_geodesic_bounding_box_contains_center():
    r0 = load_ref_rpcs()[0]
    lon_min, lon_max, lat_min, lat_max = stereo.geodesic_bounding_box(r0, 0, 0, 3000, 1300)
    assert lon_min < float(r0.lon_offset) < lon_max
    assert lat_min < float(r0.lat_offset) < lat_max


def test_rectifying_similarities():
    """S1/S2 must map epipolar-correspondent points to equal ordinates."""
    r0, r1 = load_ref_rpcs()
    m = stereo.matches_from_rpc(r0, r1, 0, 0, 3000, 1300, 5)
    from sat_bundleadjust_tpu.tracks.matching import affine_fundamental_matrix

    F = affine_fundamental_matrix(m)
    S1, S2 = stereo.rectifying_similarities_from_affine_fundamental_matrix(F)
    h1 = np.hstack([m[:, :2], np.ones((len(m), 1))]) @ S1.T
    h2 = np.hstack([m[:, 2:], np.ones((len(m), 1))]) @ S2.T
    dy = h1[:, 1] / h1[:, 2] - h2[:, 1] / h2[:, 2]
    assert np.median(np.abs(dy)) < 1.0, np.median(np.abs(dy))


def test_affine_transformation_and_translation():
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 100, (30, 2))
    A_true = np.array([[1.1, 0.2, 3.0], [-0.1, 0.9, -2.0], [0, 0, 1]])
    xx = (np.hstack([x, np.ones((30, 1))]) @ A_true.T)[:, :2]
    A = stereo.affine_transformation(x, xx)
    np.testing.assert_allclose(A, A_true, atol=1e-9)
    T = stereo.translation(x, x + [5.0, -3.0])
    assert T[0, 2] == 5.0 and T[1, 2] == -3.0


def test_fundamental_matrix_cameras():
    rng = np.random.RandomState(1)
    P1 = rng.randn(3, 4)
    P2 = rng.randn(3, 4)
    F = stereo.fundamental_matrix_cameras(P1, P2)
    # epipolar constraint: x2^T F x1 = 0 for projections of the same point
    X = np.hstack([rng.randn(20, 3) * 10, np.ones((20, 1))])
    x1 = (P1 @ X.T).T
    x2 = (P2 @ X.T).T
    vals = np.abs(np.einsum("ni,ij,nj->n", x2, F, x1))
    assert np.max(vals / (np.abs(x1[:, 2] * x2[:, 2]) + 1e-9)) < 1e-8


def test_polygon_contains_points_vectorized_parity():
    """Vectorized ray-crossing must match the scalar winding test, incl. a
    non-convex polygon, and run fast enough for per-pixel masks."""
    import time

    from sat_bundleadjust_tpu.utils.polygons import Polygon, _point_in_polygon

    rng = np.random.RandomState(0)
    star = np.array([[0, 0], [4, 1], [8, 0], [5, 4], [8, 8], [4, 6], [0, 8], [2, 4]], float)
    poly = Polygon(star)
    pts = rng.uniform(-1, 9, (2000, 2))
    got = poly.contains_points(pts)
    want = np.array([_point_in_polygon(p, poly.coords) for p in pts])
    assert np.array_equal(got, want)

    # 4M points (a 2000x2000 mask) against an 8-gon stays around a
    # second even on the shared 4-core CI box; footprint quads are ~2x
    # faster (the production mask path rasterizes with cv2.fillPoly)
    big = rng.uniform(-1, 9, (4_000_000, 2))
    t0 = time.time()
    poly.contains_points(big)
    assert time.time() - t0 < 2.5


def test_polygon_is_valid_vectorized():
    from sat_bundleadjust_tpu.utils.polygons import Polygon

    square = Polygon(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float))
    bowtie = Polygon(np.array([[0, 0], [1, 1], [1, 0], [0, 1]], float))
    assert square.is_valid
    assert not bowtie.is_valid


def test_outlier_reference_rounding_mode():
    """reference_rounding=True reproduces np.round(thr, 2) comparison
    (reference ba_outliers.py:136); default compares the exact threshold."""
    from sat_bundleadjust_tpu.ba.outliers import compute_obs_to_remove

    class P:
        pass

    p = P()
    p.n_cam = 1
    n = 100
    p.cam_ind = np.zeros(n, int)
    p.pts_ind = np.arange(n)
    p.C = np.full((2, n), 1.0)
    err = np.full(n, 0.004)  # excellent solution, sub-0.005 px everywhere
    # exact comparison with predef_thr 0.004999: keeps everything
    _, thr, n_rm = compute_obs_to_remove(err, p, predef_thr=0.004999)
    assert n_rm == 0
    # reference mode rounds 0.004999 -> 0.0 and deletes every observation
    _, thr, n_rm = compute_obs_to_remove(err, p, predef_thr=0.004999,
                                         reference_rounding=True)
    assert n_rm == n
