"""Track construction, pair selection, ranking and native union-find."""

import numpy as np

from sat_bundleadjust_tpu.tracks.build import (
    _load_native,
    build_connectivity_matrix,
    check_correspondence_matrix,
    check_pairs,
    feature_tracks_from_pairwise_matches,
    union_find,
)
from sat_bundleadjust_tpu.tracks.ranking import order_tracks, select_best_tracks
from sat_bundleadjust_tpu.tracks.pairs import compute_pairs_to_match
from sat_bundleadjust_tpu.utils.geo import geojson_polygon


def test_union_find_native_available():
    assert _load_native() is not None, "native libtrackbuild.so should be built"


def test_union_find_components():
    # components: {0,1,2}, {3,4}, {5}
    roots = union_find(6, np.array([0, 1, 3]), np.array([1, 2, 4]))
    assert roots[0] == roots[1] == roots[2]
    assert roots[3] == roots[4]
    assert roots[5] not in (roots[0], roots[3])


def test_union_find_python_fallback_matches_native():
    rng = np.random.RandomState(0)
    n = 500
    ea = rng.randint(0, n, 800).astype(np.int64)
    eb = rng.randint(0, n, 800).astype(np.int64)
    native = union_find(n, ea, eb)
    import sat_bundleadjust_tpu.tracks.build as B

    saved = B._NATIVE_LIB, B._NATIVE_TRIED
    B._NATIVE_LIB, B._NATIVE_TRIED = None, True
    try:
        py = union_find(n, ea, eb)
    finally:
        B._NATIVE_LIB, B._NATIVE_TRIED = saved
    # same partitions (root labels may differ)
    for arr in (native, py):
        pass
    lab_n = {r: i for i, r in enumerate(dict.fromkeys(native.tolist()))}
    lab_p = {r: i for i, r in enumerate(dict.fromkeys(py.tolist()))}
    assert [lab_n[r] for r in native.tolist()] == [lab_p[r] for r in py.tolist()]


def test_feature_tracks_from_matches():
    """3 cameras, 2 multi-view tracks + 1 two-view track."""
    feats = [np.zeros((10, 132)) for _ in range(3)]
    for c in range(3):
        feats[c][:, 0] = np.arange(10) + 100 * c  # col encodes (cam, kp)
        feats[c][:, 1] = np.arange(10) * 2
    # track A: kp0@0 - kp1@1 - kp2@2 ; track B: kp5@0 - kp5@1; track C: kp7@1 - kp8@2
    matches = np.array(
        [
            [0, 1, 0, 1],
            [1, 2, 1, 2],
            [5, 5, 0, 1],
            [7, 8, 1, 2],
        ]
    )
    pairs = [(0, 1), (1, 2), (0, 2)]
    C, C_v2 = feature_tracks_from_pairwise_matches(feats, matches, pairs)
    assert C.shape == (6, 3)
    track_lens = np.sum(~np.isnan(C[::2]), axis=0)
    assert sorted(track_lens.tolist()) == [2, 2, 3]
    # the 3-view track must carry consistent coordinates
    t3 = int(np.argmax(track_lens))
    assert C[0, t3] == 0.0 and C[2, t3] == 101.0 and C[4, t3] == 202.0


def test_compute_pairs_to_match_overlap_and_baseline():
    sq = lambda dx: geojson_polygon(
        np.array([[dx, 0], [dx + 1, 0], [dx + 1, 1], [dx, 1]], dtype=float)
    )
    footprints = [{"geojson": sq(0.0)}, {"geojson": sq(0.2)}, {"geojson": sq(5.0)}]
    centers = [np.array([0, 0, 0.0]), np.array([200000.0, 0, 0]), np.array([0, 0, 0])]
    init_pairs = [(0, 1), (0, 2), (1, 2)]
    pairs_to_match, pairs_to_tri = compute_pairs_to_match(
        init_pairs, footprints, centers, verbose=False
    )
    assert (0, 1) in pairs_to_match          # overlapping
    assert (0, 2) not in pairs_to_match      # disjoint footprints
    assert (0, 1) in pairs_to_tri            # baseline 200 km / 500 km > 1/4


def test_connectivity_and_checks():
    C = np.full((6, 5), np.nan)
    # cams 0,1 share 4 tracks; cam 2 sees only 1
    for t in range(4):
        C[0, t] = C[1, t] = C[2, t] = C[3, t] = 1.0
    C[4, 4] = C[5, 4] = 1.0
    C[0, 4] = C[1, 4] = 1.0
    A = build_connectivity_matrix(C, min_matches=0)
    assert A[0, 1] == 4
    assert A[0, 2] == 1
    fatal, _, disconnected = check_correspondence_matrix(C, min_obs_cam=2)
    assert not fatal
    assert disconnected == [2]


def test_select_best_tracks_reduces_count():
    rng = np.random.RandomState(0)
    n_cam, n_tracks = 5, 200
    C = np.full((2 * n_cam, n_tracks), np.nan)
    for t in range(n_tracks):
        cams = rng.choice(n_cam, rng.randint(2, n_cam + 1), replace=False)
        for c in cams:
            C[2 * c, t] = rng.uniform(0, 100)
            C[2 * c + 1, t] = rng.uniform(0, 100)
    C_scale = np.where(~np.isnan(C[::2]), rng.uniform(1, 4, (n_cam, n_tracks)), np.nan)
    C_reproj = np.where(~np.isnan(C[::2]), rng.uniform(0, 1, (n_cam, n_tracks)), np.nan)
    S = select_best_tracks(C, C_scale, C_reproj, K=2)
    assert 0 < len(S) < n_tracks
    # selected tracks must keep all cameras connected
    sub = C[:, S]
    obs_per_cam = np.sum(~np.isnan(sub[::2]), axis=1)
    assert np.all(obs_per_cam > 0)


def test_select_best_tracks_sensor_aware():
    """SkySat d1/d2/d3 split selection (reference: ft_ranking.py:292-316):
    the union contains per-sensor selections plus the global one."""
    from types import SimpleNamespace

    from sat_bundleadjust_tpu.tracks.ranking import select_best_tracks_sensor_aware

    rng = np.random.RandomState(1)
    n_cam, n_tracks = 6, 150
    C = np.full((2 * n_cam, n_tracks), np.nan)
    for t in range(n_tracks):
        cams = rng.choice(n_cam, rng.randint(2, n_cam + 1), replace=False)
        for c in cams:
            C[2 * c, t] = rng.uniform(0, 100)
            C[2 * c + 1, t] = rng.uniform(0, 100)
    C_scale = np.where(~np.isnan(C[::2]), rng.uniform(1, 4, (n_cam, n_tracks)), np.nan)
    C_reproj = np.where(~np.isnan(C[::2]), rng.uniform(0, 1, (n_cam, n_tracks)), np.nan)
    # cameras 0-2 from sensor d1, 3-5 from d2 (SkySat-style ids)
    images = [
        SimpleNamespace(geotiff_path="20200413_ssc4{}_{:04d}.tif".format(
            "d1_" if i < 3 else "d2_", i))
        for i in range(n_cam)
    ]
    S_aware = select_best_tracks_sensor_aware(images, C, C_scale, C_reproj, K=2)
    S_global = select_best_tracks(C, C_scale, C_reproj, K=2)
    assert 0 < len(S_aware) < n_tracks
    # the union is a superset of the global selection
    assert set(S_global).issubset(set(S_aware))
    # and includes tracks chosen for each sensor subset
    assert len(S_aware) >= len(S_global)


def test_ft_n_proc_opencv_fanout(tmp_path):
    """FT_n_proc consumes the opencv detection path: a thread-pool fan-out
    must produce byte-identical features to the serial run (reference
    counterpart: the multiprocessing.Pool of ft_s2p.py:97-124)."""
    from PIL import Image

    from sat_bundleadjust_tpu.tracks.detection import detect_features_image_sequence

    rng = np.random.RandomState(3)
    paths = []
    for i in range(3):
        from scipy.ndimage import gaussian_filter

        im = gaussian_filter(rng.randn(120, 150), 2.0)
        im = ((im - im.min()) / (im.max() - im.min() + 1e-9) * 255).astype(np.uint8)
        p = tmp_path / "im{}.tif".format(i)
        Image.fromarray(im).save(str(p))
        paths.append(str(p))

    cfg = {"FT_sift_detection": "opencv", "FT_kp_max": 500,
           "FT_reset": True, "FT_save": False}
    serial = detect_features_image_sequence(paths, tracks_config=dict(cfg, FT_n_proc=1))
    fanned = detect_features_image_sequence(paths, tracks_config=dict(cfg, FT_n_proc=3))
    assert len(serial) == len(fanned) == 3
    for a, b in zip(serial, fanned):
        np.testing.assert_array_equal(a, b)
        assert np.sum(~np.isnan(a[:, 0])) > 0  # something was detected
