"""Parity oracles against the REFERENCE'S OWN native kernels.

These tests build the reference tree out-of-tree (scripts/refnative.py)
and feed the C/C++ kernels and this framework's JAX kernels *identical
inputs*:

  - triangulation: c/rpc.c:480 (rpc_height) + c/disp_to_h.c:40 vs
    ops/triangulate.rpc_triangulation
  - 2-NN matching: 3rdparty/sift/simd/sift4ctypes.cpp:125-195 vs
    ops/match.match_descriptors_2nn
  - SIFT detection: LibSift (statistical repeatability only — exact
    keypoint parity is not a goal; see tests/test_sift_match.py header)

Skipped cleanly when /root/reference is absent or the native build
fails (e.g. no libtiff on the host).
"""

import glob

import numpy as np
import pytest

import sys, os  # noqa: E401

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

refnative = pytest.importorskip("refnative")


@pytest.fixture(scope="module")
def ref_libs():
    try:
        return refnative.ensure_built()
    except Exception as e:  # build toolchain/deps missing
        pytest.skip(f"reference native build unavailable: {e}")


@pytest.fixture(scope="module")
def skysat_rpcs():
    files = sorted(glob.glob("/root/reference/tests/data/images/*.rpc"))
    if len(files) < 2:
        pytest.skip("bundled SkySat RPC fixtures not found")
    from sat_bundleadjust_tpu.models.rpc import rpc_from_rpc_file

    return rpc_from_rpc_file(files[0]), rpc_from_rpc_file(files[1])


def test_triangulation_matches_reference_c_kernel(ref_libs, skysat_rpcs):
    """Same (pair, matches) into rpc_height+eval_rpc and into the JAX
    secant-altitude kernel must give the same lon/lat/alt."""
    from sat_bundleadjust_tpu.models import ellipsoid
    from sat_bundleadjust_tpu.ops.triangulate import rpc_triangulation

    r1, r2 = skysat_rpcs
    rng = np.random.RandomState(3)
    n = 512
    lon = np.float64(r1.lon_offset) + 0.02 * (rng.rand(n) - 0.5)
    lat = np.float64(r1.lat_offset) + 0.02 * (rng.rand(n) - 0.5)
    alt = np.float64(r1.alt_offset) + 120.0 * (rng.rand(n) - 0.5)
    c1, w1 = r1.projection(lon, lat, alt)
    c2, w2 = r2.projection(lon, lat, alt)
    p1 = np.stack([c1, w1], 1)
    p2 = np.stack([c2, w2], 1)

    lla_ref, err_ref = refnative.ref_triangulate(
        r1, r2, p1.astype(np.float32), p2.astype(np.float32))
    pts3d, err = rpc_triangulation(r1, r2, p1, p2)
    pts3d = np.asarray(pts3d)
    lat_o, lon_o, alt_o = ellipsoid.ecef_to_latlon(
        pts3d[:, 0], pts3d[:, 1], pts3d[:, 2])

    # The C kernel consumes float32 pixel coords (s2p/triangulation.py:
    # 96-99), the JAX kernel full f64 ones: the f32 input quantization
    # (~1e-3 px at SkySat coords) dominates the comparison.
    assert np.abs(np.asarray(lon_o) - lla_ref[:, 0]).max() < 2e-6
    assert np.abs(np.asarray(lat_o) - lla_ref[:, 1]).max() < 2e-6
    assert np.abs(np.asarray(alt_o) - lla_ref[:, 2]).max() < 0.35
    # both converge on this clean synthetic input
    assert float(np.median(err_ref)) < 0.05
    assert float(np.median(np.asarray(err))) < 0.05


@pytest.mark.parametrize("method", ["relative", "absolute"])
def test_matcher_matches_reference_bruteforce(ref_libs, method):
    """Identical descriptor sets through sift4ctypes matching() and
    match_descriptors_2nn must accept the same (i -> j) pairs."""
    from sat_bundleadjust_tpu.ops.match import match_descriptors_2nn

    rng = np.random.RandomState(7)
    n1, n2, planted = 700, 650, 300
    d1 = 60.0 * rng.rand(n1, 128).astype(np.float32)
    d2 = 60.0 * rng.rand(n2, 128).astype(np.float32)
    perm = rng.permutation(n2)[:planted]
    d2[perm] = d1[:planted] + 2.0 * rng.randn(planted, 128).astype(np.float32)

    # reference rows: (pos_y, pos_x, scale, theta, desc)
    k1 = np.zeros((n1, 132), dtype=np.float32)
    k2 = np.zeros((n2, 132), dtype=np.float32)
    k1[:, 0] = np.arange(n1)          # pos_y encodes the index
    k2[:, 0] = np.arange(n2)
    k1[:, 4:] = d1
    k2[:, 4:] = d2

    kw = dict(sift_thresh=0.6, relative=True)
    if method == "absolute":
        kw = dict(sift_thresh=90.0, relative=False)
    m_ref = refnative.ref_match(k1, k2, **kw)
    ref_pairs = {(int(a), int(b)) for a, b in zip(m_ref[:, 0], m_ref[:, 2])}

    pts = np.zeros((max(n1, n2), 2), dtype=np.float32)
    nn_idx, accepted, _ = match_descriptors_2nn(
        d1, d2, pts[:n1], pts[:n2],
        np.ones(n1, bool), np.ones(n2, bool),
        rel_thr=0.6, abs_thr=90.0, method=method,
    )
    ours = {(i, int(j)) for i, (j, ok) in enumerate(zip(np.asarray(nn_idx), np.asarray(accepted))) if ok}

    assert len(ref_pairs) > 100  # planted matches must actually pass
    assert ours == ref_pairs


def test_sift_repeatability_vs_reference(ref_libs):
    """Statistical oracle: on the same textured frame, most reference
    SIMD-SIFT keypoints must have one of ours within 2 px (and the
    counts must be the same order of magnitude)."""
    from scipy.ndimage import gaussian_filter

    from sat_bundleadjust_tpu.ops.sift import detect_sift

    rng = np.random.RandomState(0)
    h, w = 300, 400
    im = gaussian_filter(rng.randn(h, w), 3.0)
    im += 0.3 * gaussian_filter(rng.randn(h, w), 12.0)
    im = (im - im.min()) / (im.max() - im.min())
    im = (255.0 * im).astype(np.float32)

    # LibSift packs (getY, getX, sigma, theta) but its "y" axis is the
    # image WIDTH axis (verified empirically: col 0 spans [0, w)), so the
    # layout already matches ours: (col, row, scale, theta, desc).
    k_ref = refnative.ref_sift(im)
    ours = detect_sift(im)
    assert k_ref.shape[0] > 50
    assert ours.shape[0] > 0.5 * k_ref.shape[0]
    assert ours.shape[0] < 3.0 * k_ref.shape[0]

    ref_xy = k_ref[:, :2]
    our_xy = ours[:, :2]
    d = np.sqrt(((ref_xy[:, None, :] - our_xy[None, :, :]) ** 2).sum(-1))
    nearest = d.min(axis=1)
    frac = float((nearest < 2.0).mean())
    assert frac > 0.85, f"only {frac:.2f} of reference keypoints reproduced"
