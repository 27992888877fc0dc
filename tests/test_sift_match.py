"""Oracles for the JAX SIFT detector and the MXU matching kernels.

Detection correctness is tested by *repeatability and matchability* on
synthetic textured images (exact keypoint parity with other SIFT
implementations is neither expected nor required — what the pipeline needs
is correct correspondences, like the reference's own soft golden test,
tests/test_ba.py:58-63)."""

import numpy as np
import pytest

from sat_bundleadjust_tpu.ops.match import match_pair
from sat_bundleadjust_tpu.ops.ransac import ransac_fundamental
from sat_bundleadjust_tpu.ops.sift import detect_sift


def make_texture(h=240, w=320, seed=0, octaves=3):
    """Smooth multi-scale random texture with features at several scales."""
    rng = np.random.RandomState(seed)
    from scipy.ndimage import gaussian_filter

    im = np.zeros((h, w))
    for o in range(octaves):
        im += gaussian_filter(rng.randn(h, w), sigma=2.0 ** (o + 1)) * (2.0 ** o)
    im -= im.min()
    im /= im.max()
    return (im * 255).astype(np.float32)


def test_sift_detects_keypoints():
    im = make_texture()
    feats = detect_sift(im)
    assert feats.shape[1] == 132
    assert feats.shape[0] > 30, feats.shape
    # positions inside the image
    assert np.all(feats[:, 0] >= 0) and np.all(feats[:, 0] < im.shape[1])
    assert np.all(feats[:, 1] >= 0) and np.all(feats[:, 1] < im.shape[0])
    # descriptors quantized to 0..255
    assert feats[:, 4:].max() <= 255.0
    assert feats[:, 4:].min() >= 0.0


def test_sift_shift_repeatability():
    """Keypoints of a translated image must match back with the known shift."""
    im = make_texture(seed=1)
    shift = 7
    im2 = np.roll(im, shift, axis=1)
    f1 = detect_sift(im)
    f2 = detect_sift(im2)
    matches, n_ratio, n_ransac = match_pair(f1, f2, rel_thr=0.7, ransac_thr=None)
    assert matches is not None and matches.shape[0] >= 20, (None if matches is None else matches.shape)
    dx = f2[matches[:, 1], 0] - f1[matches[:, 0], 0]
    dy = f2[matches[:, 1], 1] - f1[matches[:, 0], 1]
    # majority of matches must agree with the true shift to subpixel level
    good = (np.abs(dx - shift) < 1.0) & (np.abs(dy) < 1.0)
    assert np.mean(good) > 0.8, np.mean(good)


def test_adaptive_detection_identical_to_monolithic(monkeypatch):
    """The content-adaptive two-phase detector (pyramid+extrema program,
    count fetch, bucketed descriptor program) must produce exactly the
    same keypoints as the single monolithic program: buckets are always
    >= the valid count, so compaction never drops a keypoint."""
    im = make_texture(seed=2)
    monkeypatch.setenv("SATBA_SIFT_ADAPTIVE", "0")
    f_mono = detect_sift(im)
    monkeypatch.setenv("SATBA_SIFT_ADAPTIVE", "1")
    f_ad = detect_sift(im)
    assert f_mono.shape == f_ad.shape
    a = f_mono[np.lexsort(f_mono[:, :3].T)]
    b = f_ad[np.lexsort(f_ad[:, :3].T)]
    assert np.array_equal(a, b)
    # the capped-fetch path too
    f_cap_m = detect_sift(im, max_kp=200)
    monkeypatch.setenv("SATBA_SIFT_ADAPTIVE", "0")
    f_cap_a = detect_sift(im, max_kp=200)
    assert f_cap_m.shape == f_cap_a.shape == (200, 132)
    a = f_cap_m[np.lexsort(f_cap_m[:, :3].T)]
    b = f_cap_a[np.lexsort(f_cap_a[:, :3].T)]
    assert np.array_equal(a, b)


def test_match_pair_against_opencv_sift():
    """Our matcher must recover correspondences between cv2-SIFT keypoint
    sets as well (backend interop)."""
    import cv2

    im = make_texture(seed=2)
    im2 = np.roll(im, 5, axis=0)
    sift = cv2.SIFT_create()

    def cv_feats(img):
        kp, des = sift.detectAndCompute(img.astype(np.uint8), None)
        return np.array([[k.pt[0], k.pt[1], k.size, k.angle, *d] for k, d in zip(kp, des)])

    f1, f2 = cv_feats(im), cv_feats(im2)
    if f1.shape[0] < 10 or f2.shape[0] < 10:
        pytest.skip("not enough cv2 keypoints on synthetic texture")
    matches, _, _ = match_pair(f1, f2, rel_thr=0.75, ransac_thr=None)
    assert matches is not None and matches.shape[0] >= 10
    dy = f2[matches[:, 1], 1] - f1[matches[:, 0], 1]
    assert np.median(np.abs(dy - 5)) < 1.0


def test_ransac_fundamental_rejects_outliers():
    rng = np.random.RandomState(3)
    n = 200
    # synthetic rigid scene: pts2 = pts1 + parallax along x + noise
    pts1 = rng.uniform(0, 500, (n, 2))
    depth = rng.uniform(1, 2, n)
    pts2 = pts1 + np.stack([20.0 / depth, np.zeros(n)], axis=1)
    pts2 += 0.05 * rng.randn(n, 2)
    # inject outliers
    out_idx = rng.choice(n, 40, replace=False)
    pts2[out_idx] += rng.uniform(-60, 60, (40, 2))
    F, inliers = ransac_fundamental(pts1, pts2, thr=0.3)
    assert F is not None
    inlier_set = set(np.where(inliers)[0])
    # most true inliers kept, most injected outliers rejected
    true_out = set(out_idx.tolist())
    assert len(inlier_set & true_out) < 10
    assert len(inlier_set) > 100


def test_ransac_numpy_fallback_matches_jax():
    from sat_bundleadjust_tpu.ops import ransac as R

    rng = np.random.RandomState(7)
    n = 150
    pts1 = rng.uniform(0, 400, (n, 2))
    pts2 = pts1 + np.stack([15.0 / rng.uniform(1, 2, n), np.zeros(n)], axis=1)
    pts2 += 0.05 * rng.randn(n, 2)
    out = rng.choice(n, 25, replace=False)
    pts2[out] += rng.uniform(-50, 50, (25, 2))
    valid = np.ones(n, bool)
    F_np, inl_np = R._ransac_numpy(pts1, pts2, valid, 0.3, 0, 512, True)
    F_jx, inl_jx = R.ransac_fundamental(pts1, pts2, thr=0.3)
    assert F_np is not None and F_jx is not None
    # both reject the bulk of injected outliers
    assert np.sum(inl_np[out]) < 8
    assert np.sum(inl_jx[out]) < 8
    assert inl_np.sum() > 90 and inl_jx.sum() > 90


def test_init_F_pairs_batched_matches_per_pair():
    """The one-call batched F initialization must reproduce the per-pair
    init_F_pair_to_match (round 3: the per-pair loop cost minutes at
    hundreds of pairs)."""
    import numpy as np

    from sat_bundleadjust_tpu.models.cameras import SatelliteImage
    from sat_bundleadjust_tpu.tracks.matching import (
        init_F_pair_to_match, init_F_pairs_batched,
    )
    from sat_bundleadjust_tpu.utils.demo import make_synthetic_rpc

    ims = []
    h, w = 300, 400
    for k in range(3):
        rpc = make_synthetic_rpc(
            view_dx=200.0 * np.cos(2.1 * k), view_dy=200.0 * np.sin(2.1 * k),
            img_halfsize=(w / 2.0, h / 2.0),
        )
        im = SatelliteImage("im{}.tif".format(k), rpc)
        im.offset = {"col0": 0, "row0": 0, "height": h, "width": w}
        ims.append(im)
    pairs = [(0, 1), (0, 2), (1, 2)]
    batched = init_F_pairs_batched(pairs, ims)
    for (i, j), Fb in zip(pairs, batched):
        Fs = init_F_pair_to_match(h, w, ims[i].rpc, ims[j].rpc)
        # F is scale-invariant: compare normalized
        Fb_n = Fb / np.linalg.norm(Fb)
        Fs_n = Fs / np.linalg.norm(Fs)
        if np.sum(Fb_n * Fs_n) < 0:
            Fs_n = -Fs_n
        np.testing.assert_allclose(Fb_n, Fs_n, atol=1e-9)
