"""Optional LightGlue matching backend (torch).

TPU-native counterpart of the reference's optional LightGlue path
(reference: bundle_adjust/feature_tracks/ft_match.py:466-558). The
reference treats LightGlue as an external optional dependency (the user
clones github.com/cvg/LightGlue; ft_utils.py:291-295 documents the
install); this module does the same: everything degrades to a clean
ImportError with install instructions when the package is absent.

Differences from the reference, deliberate:
  * rootsift normalization is implemented here (L1-normalize + sqrt)
    instead of importing lightglue.sift.sift_to_rootsift, so the feature
    conversion works and is testable without the package;
  * the geometric filter is our own device RANSAC
    (ops/ransac.ransac_fundamental) instead of cv2.findFundamentalMat;
  * the matcher object is cached per (feature type, device) — the
    reference re-instantiates LightGlue (and re-loads its weights) for
    every pair, which dominates small-pair wall time.
"""

import numpy as np

_MATCHER_CACHE = {}


def lightglue_available():
    """True when both torch and the lightglue package can be imported."""
    try:
        import lightglue  # noqa: F401
        import torch  # noqa: F401
    except ImportError:
        return False
    return True


def _rootsift(desc):
    """RootSIFT: L1-normalize each descriptor, then take the square root
    (lightglue's default SIFT normalization; reference invokes
    lightglue.sift.sift_to_rootsift, ft_match.py:488-489)."""
    import torch

    l1 = desc.abs().sum(dim=-1, keepdim=True).clamp(min=1e-12)
    return torch.sqrt(desc / l1)


def sift_to_lightglue_format(sift_features, image_size=None, device="cpu",
                             rootsift=True):
    """(N, 132) feature rows [col, row, scale, orientation_deg, 128-desc]
    -> the dict of batched torch tensors LightGlue consumes
    (reference: ft_match.py:466-490). NaN-padded rows are dropped."""
    import torch

    sift_features = np.asarray(sift_features)
    assert sift_features.shape[1] == 132
    sift_features = sift_features[~np.isnan(sift_features[:, 0])]
    feats = {
        "keypoints": sift_features[:, :2],
        "scales": sift_features[:, 2],
        "oris": np.deg2rad(sift_features[:, 3]),
        "descriptors": sift_features[:, 4:],
    }
    if image_size is not None:
        feats["image_size"] = np.asarray(image_size)
    feats = {
        k: torch.tensor(v[np.newaxis, ...], dtype=torch.float32, device=device)
        for k, v in feats.items()
    }
    if rootsift:
        feats["descriptors"] = _rootsift(feats["descriptors"])
    return feats


def _get_matcher(device):
    """One LightGlue instance per device, weights loaded once."""
    key = ("sift", str(device))
    if key not in _MATCHER_CACHE:
        from lightglue import LightGlue

        _MATCHER_CACHE[key] = LightGlue(features="sift").eval().to(device)
    return _MATCHER_CACHE[key]


def lightglue_matching(features_i, features_j, ransac_thr=0.3, max_matches=300,
                       device=None):
    """Match two (N, 132) feature arrays with LightGlue + RANSAC filter.

    Returns (matches_ij (M, 2) or None, n_matches, n_matches_final),
    mirroring the reference contract (ft_match.py:492-558): raw matcher
    output count, then the geometrically filtered count, keeping at most
    `max_matches` by descending matcher confidence."""
    if not lightglue_available():
        raise ImportError(
            "FT_sift_matching='lightglue' requires torch and the LightGlue "
            "package (pip install git+https://github.com/cvg/LightGlue)"
        )
    import torch

    if device is None:
        device = torch.device("cuda" if torch.cuda.is_available() else "cpu")

    feats0 = sift_to_lightglue_format(features_i, device=device)
    feats1 = sift_to_lightglue_format(features_j, device=device)
    matcher = _get_matcher(device)
    with torch.no_grad():
        out = matcher({"image0": feats0, "image1": feats1})

    matches = out["matches"]
    scores = out["scores"]
    # outputs may come batched ([1, M, 2]) or flat depending on version
    if isinstance(matches, (list, tuple)):
        matches = matches[0]
        scores = scores[0]
    elif matches.dim() == 3:
        matches = matches[0]
        scores = scores[0]
    matches_ij = matches.detach().cpu().numpy().reshape(-1, 2)
    scores_ij = scores.detach().cpu().numpy().reshape(-1)
    n_matches = matches_ij.shape[0]
    if n_matches == 0:
        return None, 0, 0

    # geometric filtering with our RANSAC (reference uses
    # ft_opencv.geometric_filtering = cv2.findFundamentalMat RANSAC)
    if ransac_thr is not None and n_matches >= 8:
        from sat_bundleadjust_tpu.ops.ransac import ransac_fundamental

        pts_i = np.asarray(features_i)[matches_ij[:, 0], :2]
        pts_j = np.asarray(features_j)[matches_ij[:, 1], :2]
        _, inliers = ransac_fundamental(pts_i, pts_j, thr=ransac_thr)
        if inliers is None or inliers.sum() == 0:
            return None, n_matches, 0
        matches_ij = matches_ij[inliers]
        scores_ij = scores_ij[inliers]

    n_final = matches_ij.shape[0]
    if max_matches is not None and n_final > max_matches:
        order = np.argsort(-scores_ij)[:max_matches]
        matches_ij = matches_ij[order]
        n_final = max_matches
    return matches_ij.astype(np.int64), n_matches, n_final
