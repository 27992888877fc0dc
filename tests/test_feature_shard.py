"""Feature stages sharded over the virtual 8-device mesh: the mesh path
must produce exactly the results of the single-device per-pair path."""

import numpy as np
import pytest

import jax

from sat_bundleadjust_tpu.parallel.feature_shard import (
    default_mesh_or_none,
    detect_batches_mesh,
    match_pairs_mesh,
)
from sat_bundleadjust_tpu.parallel.mesh import make_mesh
from sat_bundleadjust_tpu.tracks.matching import match_stereo_pairs
from sat_bundleadjust_tpu.utils.config import init_feature_tracks_config
from sat_bundleadjust_tpu.utils.geo import geojson_polygon


def _synthetic_match_problem(n_img=4, n_kp=300, seed=0):
    """Images over overlapping footprints with planted correspondences:
    every image shares a common bank of descriptors (plus noise), keypoints
    laid out on overlapping UTM patches."""
    rng = np.random.RandomState(seed)
    bank = rng.randn(n_kp, 128) * 20 + 100
    base_cols = rng.uniform(0, 400, n_kp)
    base_rows = rng.uniform(0, 300, n_kp)
    features, utm_coords, footprints = [], [], []
    for i in range(n_img):
        desc = bank + rng.randn(n_kp, 128) * 0.5
        # geometrically consistent views: shared ground layout + per-image
        # shift + small pixel noise (so RANSAC-F keeps the true matches)
        cols = base_cols + 5.0 * i + rng.randn(n_kp) * 0.1
        rows = base_rows - 3.0 * i + rng.randn(n_kp) * 0.1
        scale = rng.uniform(1, 4, n_kp)
        theta = rng.uniform(0, 6.28, n_kp)
        feats = np.hstack([cols[:, None], rows[:, None], scale[:, None],
                           theta[:, None], desc])
        # NaN-pad a few rows (the fixed-capacity layout)
        feats = np.vstack([feats, np.full((16, 132), np.nan)])
        features.append(feats)
        east = 500000 + base_cols * 2
        north = 4000000 + base_rows * 2
        utm = np.vstack([np.stack([east, north], axis=1), np.full((16, 2), np.nan)])
        utm_coords.append(utm)
        e0, e1 = float(east.min()), float(east.max())
        n0, n1 = float(north.min()), float(north.max())
        footprints.append({"geojson": geojson_polygon(
            np.array([[e0, n0], [e1, n0], [e1, n1], [e0, n1]]))})
    pairs = [(i, j) for i in range(n_img) for j in range(i + 1, n_img)]
    return features, utm_coords, footprints, pairs


def test_default_mesh_sees_virtual_devices():
    mesh = default_mesh_or_none()
    assert mesh is not None and mesh.devices.size == 8


def test_match_stereo_pairs_mesh_equals_single_device(monkeypatch, tmp_path):
    features, utm_coords, footprints, pairs = _synthetic_match_problem()
    cfg = init_feature_tracks_config({"FT_sift_matching": "bruteforce"})
    cfg["FT_save"] = False  # no cache files: both runs must actually match

    # single-device (per-pair) reference result: force the mesh off
    import sat_bundleadjust_tpu.tracks.matching as matching_mod
    import sat_bundleadjust_tpu.parallel.feature_shard as fs

    monkeypatch.setattr(fs, "default_mesh_or_none", lambda: None)
    ref = match_stereo_pairs(pairs, features, footprints, utm_coords, dict(cfg))
    monkeypatch.undo()

    out = match_stereo_pairs(pairs, features, footprints, utm_coords, dict(cfg),
                             mesh=make_mesh())
    assert ref.shape == out.shape
    assert np.array_equal(np.sort(ref, axis=0), np.sort(out, axis=0))
    assert out.shape[0] > 100  # planted correspondences found


def test_match_pairs_mesh_epipolar_gating():
    features, utm_coords, footprints, pairs = _synthetic_match_problem(n_img=2)
    cfg = init_feature_tracks_config({"FT_sift_matching": "epipolar_based"})
    fi, fj = features[0], features[1]
    # an affine F whose epipolar residual is huge everywhere kills all
    # matches; with use_F off (F=None) matches survive
    F_kill = np.array([[0, 0, 0], [0, 0, 1], [0, -1, 1e9]], float)
    res = match_pairs_mesh([(fi, fj), (fi, fj)], [F_kill, None], cfg,
                           mesh=make_mesh())
    (nn_k, acc_k), (nn_o, acc_o) = res
    assert acc_k.sum() == 0
    assert acc_o.sum() > 100


def test_detect_batches_mesh_equals_plain():
    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(3)
    imgs = [gaussian_filter(rng.rand(96, 128), 1.5).astype(np.float32) * 255
            for _ in range(5)]
    cfg = init_feature_tracks_config({})
    plain = detect_batches_mesh(imgs, cfg, mesh=None, max_kp=500)
    sharded = detect_batches_mesh(imgs, cfg, mesh=make_mesh(), max_kp=500)
    assert len(plain) == len(sharded) == 5
    for a, b in zip(plain, sharded):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-4)
