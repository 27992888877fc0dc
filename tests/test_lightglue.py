"""Optional LightGlue backend: format conversion, plumbing via a stub
matcher, clean degradation when the package is absent.

Reference behavior being covered: ft_match.py:466-558 (LightGlue is an
optional external dependency there too; ft_utils.py:291-295)."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sat_bundleadjust_tpu.tracks import lightglue as lg


def _features(n, seed=0, w=400, h=300):
    rng = np.random.RandomState(seed)
    f = np.zeros((n, 132))
    f[:, 0] = rng.uniform(0, w, n)
    f[:, 1] = rng.uniform(0, h, n)
    f[:, 2] = rng.uniform(1, 4, n)
    f[:, 3] = rng.uniform(0, 360, n)
    f[:, 4:] = rng.uniform(0, 255, (n, 128))
    return f


def test_sift_to_lightglue_format():
    f = _features(17)
    feats = lg.sift_to_lightglue_format(f, image_size=(400, 300))
    assert feats["keypoints"].shape == (1, 17, 2)
    assert feats["scales"].shape == (1, 17)
    assert feats["oris"].shape == (1, 17)
    assert feats["descriptors"].shape == (1, 17, 128)
    # orientations are radians
    assert float(feats["oris"].abs().max()) <= 2 * np.pi + 1e-6
    # rootsift: each descriptor's squared L2 norm == its L1/L1 == 1
    norms = (feats["descriptors"] ** 2).sum(-1)
    assert torch.allclose(norms, torch.ones_like(norms), atol=1e-5)
    # NaN-padded rows are dropped
    f_pad = np.vstack([f, np.full((3, 132), np.nan)])
    feats2 = lg.sift_to_lightglue_format(f_pad)
    assert feats2["keypoints"].shape == (1, 17, 2)


def test_rootsift_off():
    f = _features(5)
    feats = lg.sift_to_lightglue_format(f, rootsift=False)
    assert float(feats["descriptors"].max()) > 1.5  # raw 0..255 range


class _StubMatcher:
    """Minimal LightGlue stand-in: nearest-neighbor on rootsift descriptors."""

    def eval(self):
        return self

    def to(self, device):
        return self

    def __call__(self, data):
        d0 = data["image0"]["descriptors"][0]
        d1 = data["image1"]["descriptors"][0]
        dist = torch.cdist(d0, d1)
        j = dist.argmin(dim=1)
        i = torch.arange(d0.shape[0])
        return {
            "matches": torch.stack([i, j], dim=1)[None],
            "scores": torch.ones(d0.shape[0])[None],
        }


@pytest.fixture
def stub_lightglue(monkeypatch):
    mod = types.ModuleType("lightglue")
    mod.LightGlue = lambda features: _StubMatcher()
    monkeypatch.setitem(sys.modules, "lightglue", mod)
    lg._MATCHER_CACHE.clear()
    yield mod
    lg._MATCHER_CACHE.clear()


def test_lightglue_matching_with_stub(stub_lightglue):
    # two identical feature sets under a shuffle: NN matching must recover
    # the permutation, and our RANSAC filter must keep the (consistent)
    # identity-geometry matches
    fi = _features(60, seed=1)
    perm = np.random.RandomState(2).permutation(60)
    fj = fi[perm]
    matches, n_raw, n_final = lg.lightglue_matching(fi, fj, ransac_thr=1.0)
    assert n_raw == 60
    assert n_final > 40
    assert np.all(perm[matches[:, 1]] == matches[:, 0])


def test_lightglue_matching_max_matches(stub_lightglue):
    fi = _features(50, seed=3)
    matches, n_raw, n_final = lg.lightglue_matching(
        fi, fi, ransac_thr=1.0, max_matches=10
    )
    assert n_final == 10
    assert matches.shape == (10, 2)


def test_missing_package_raises_importerror(monkeypatch):
    monkeypatch.setitem(sys.modules, "lightglue", None)
    with pytest.raises(ImportError, match="LightGlue"):
        lg.lightglue_matching(_features(10), _features(10))


def test_backend_dispatch(stub_lightglue):
    """match_kp_within_utm_polygon routes FT_sift_matching='lightglue'."""
    from sat_bundleadjust_tpu.tracks.matching import match_kp_within_utm_polygon
    from sat_bundleadjust_tpu.utils.polygons import Polygon

    fi = _features(40, seed=4)
    utm = np.zeros((40, 2))
    utm[:, 0] = np.linspace(0, 100, 40)
    utm[:, 1] = np.linspace(0, 100, 40)
    poly = Polygon(np.array([[-1, -1], [101, -1], [101, 101], [-1, 101]], float))
    cfg = {"FT_sift_matching": "lightglue", "FT_ransac": 1.0}
    matches, n = match_kp_within_utm_polygon(fi, fi, utm, utm, poly, cfg)
    assert matches is not None and matches.shape[0] > 20
    # identity matching: each kp maps to itself
    assert np.all(matches[:, 0] == matches[:, 1])
