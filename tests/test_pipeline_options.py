"""Pipeline options that the other end-to-end tests leave unexercised:
reference-camera fixing + weighting (reference: ba_pipeline.py:482-552),
K-best track selection (ba_pipeline.py:429-463 + ft_ranking), the
max_init_reproj_error pre-filter (ba_pipeline.py:569-604), and the
outlier-threshold reference-parity rounding mode (ba_outliers.py:136)."""

import glob
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def option_scene(tmp_path_factory):
    import sat_bundleadjust_tpu  # noqa: F401  (enables float64)
    from PIL import Image

    from sat_bundleadjust_tpu.models.cameras import SatelliteImage
    from sat_bundleadjust_tpu.models.rpc import write_rpc_file
    from sat_bundleadjust_tpu.utils.demo import make_synthetic_rpc

    from test_e2e import render_image, world_texture

    root = tmp_path_factory.mktemp("opt_scene")
    img_dir = root / "images"
    img_dir.mkdir()
    tex = world_texture()
    h, w = 140, 180
    rng = np.random.RandomState(3)
    images = []
    for i in range(4):
        rpc = make_synthetic_rpc(
            view_dx=240.0 * np.cos(2 * np.pi * i / 4),
            view_dy=240.0 * np.sin(2 * np.pi * i / 4),
            img_halfsize=(w / 2, h / 2),
        )
        bias = rng.uniform(-3, 3, 2)
        biased = rpc._replace(
            col_offset=rpc.col_offset + bias[0], row_offset=rpc.row_offset + bias[1]
        )
        im = render_image(rpc, tex, h, w)
        name = "20200413_1514{:02d}_synth_cam{}".format(20 + i, i)
        Image.fromarray(im).save(str(img_dir / (name + ".tif")))
        write_rpc_file(biased, str(img_dir / (name + ".rpc")))
        images.append(SatelliteImage(str(img_dir / (name + ".tif")), biased))
    return {"root": str(root), "images": images}


def test_pipeline_with_all_optional_steps(option_scene):
    """One full run() with fix_ref_cam + ref_cam_weight + FT_K selection +
    max_init_reproj_error pre-filter + rounded outlier thresholds."""
    from sat_bundleadjust_tpu.pipeline import BundleAdjustmentPipeline

    out_dir = os.path.join(option_scene["root"], "out_options")
    images = [  # fresh SatelliteImage objects (the pipeline mutates them)
        type(im)(im.geotiff_path, im.rpc) for im in option_scene["images"]
    ]
    ba = BundleAdjustmentPipeline(
        {"in_dir": out_dir, "out_dir": out_dir, "images": images},
        tracks_config={
            "FT_kp_max": 800,
            "FT_sift_detection": "tpu",
            "FT_sift_matching": "bruteforce",
            "FT_K": 40,
        },
        extra_ba_config={
            "fix_ref_cam": True,
            "ref_cam_weight": 4.0,
            "clean_outliers": True,
            "outlier_thr_rounding": True,
            "max_init_reproj_error": 20.0,
            "save_figures": False,
        },
    )
    ba.run()

    # the reference camera was frozen: one adjusted camera, K-selected tracks
    assert ba.n_adj == 1
    assert ba.C.shape[1] <= 40

    # BA must reduce the bias-induced inconsistency
    assert np.mean(np.asarray(ba.ba_e)) < 0.5 * np.mean(np.asarray(ba.init_e))

    # all four adjusted RPCs written
    adj = sorted(glob.glob(os.path.join(out_dir, "rpcs_adj", "*.rpc_adj")))
    assert len(adj) == 4

    # the frozen reference camera's correction is the identity: its
    # adjusted RPC projects like its original one (refit noise only)
    from sat_bundleadjust_tpu.models.rpc import rpc_from_rpc_file

    ref_im = ba.images[0]  # post-permutation reference
    ref_id = os.path.splitext(os.path.basename(ref_im.geotiff_path))[0]
    adj_path = os.path.join(out_dir, "rpcs_adj", ref_id + ".rpc_adj")
    assert os.path.exists(adj_path)
    rpc_adj = rpc_from_rpc_file(adj_path)
    rpc0 = ref_im.rpc
    rng = np.random.RandomState(0)
    lon = rpc0.lon_offset + (rng.rand(100) - 0.5) * rpc0.lon_scale
    lat = rpc0.lat_offset + (rng.rand(100) - 0.5) * rpc0.lat_scale
    alt = np.full(100, float(rpc0.alt_offset))
    c0, r0 = rpc0.projection(lon, lat, alt)
    c1, r1 = rpc_adj.projection(lon, lat, alt)
    d = np.hypot(np.asarray(c1) - np.asarray(c0), np.asarray(r1) - np.asarray(r0))
    assert np.max(d) < 0.05, np.max(d)


def test_outlier_rounding_parity_mode():
    """outlier_thr_rounding=True must reproduce the reference's
    np.round(thr, 2) comparison; both modes remove a plausible obs set."""
    from sat_bundleadjust_tpu.ba import outliers as ba_outliers
    from sat_bundleadjust_tpu.ba.params import BAParams

    from synthetic import synthetic_scene

    scene = synthetic_scene(
        n_cam=4, n_pts=120, rot_scale=1e-5, seed=21,
        outlier_frac=0.1, outlier_px=30.0,
    )
    from sat_bundleadjust_tpu.ba.solver import run_ba_optimization

    def one(rounding):
        p = BAParams(
            scene["C"], scene["pts3d"], scene["cameras"], "rpc",
            scene["pairs_to_triangulate"], scene["camera_centers"],
            {"verbose": False},
        )
        _, _, _, ba_e, _ = run_ba_optimization(
            p, {"loss": "soft_l1", "f_scale": 1.0, "max_iter": 30}
        )
        return ba_outliers.rm_outliers(
            ba_e, p, verbose=False, reference_rounding=rounding
        )

    p_exact = one(False)
    p_round = one(True)
    # both prune observations; counts may differ by the rounding (<=2px
    # threshold granularity) but stay in the same ballpark
    assert p_exact.pts2d.shape[0] < scene["C"].shape[1] * 4
    assert p_round.pts2d.shape[0] < scene["C"].shape[1] * 4
    rel = abs(p_exact.pts2d.shape[0] - p_round.pts2d.shape[0])
    assert rel <= 0.1 * p_exact.pts2d.shape[0] + 10


def test_aoi_masked_detection(option_scene):
    """aoi_geojson + FT_kp_aoi: detection restricted to the AOI polygon
    (reference: ft_pipeline.py:59-71 mask precompute +
    loader.get_binary_mask_from_aoi_lonlat_within_image)."""
    import json as _json

    from sat_bundleadjust_tpu.timeseries import Scene

    lon0, lat0, s = -72.71, 11.02, 0.02
    aoi = {
        "type": "Polygon",
        "coordinates": [[
            [lon0 - s, lat0 - s], [lon0 + s, lat0 - s],
            [lon0 + s, lat0 + s], [lon0 - s, lat0 + s],
            [lon0 - s, lat0 - s],
        ]],
    }
    root = option_scene["root"]
    aoi_path = os.path.join(root, "aoi.json")
    with open(aoi_path, "w") as f:
        _json.dump(aoi, f)
    out_dir = os.path.join(root, "out_aoi")
    cfg = {
        "geotiff_dir": os.path.join(root, "images"),
        "rpc_dir": os.path.join(root, "images"),
        "rpc_src": "txt",
        "cam_model": "rpc",
        "output_dir": out_dir,
        "ba_method": "ba_bruteforce",
        "aoi_geojson": aoi_path,
        "FT_kp_aoi": True,
        "FT_kp_max": 1500,
        "FT_sift_detection": "tpu",
        "FT_sift_matching": "bruteforce",
        "save_figures": False,
    }
    scene = Scene(cfg)
    scene.run_bundle_adjustment_for_RPC_refinement()
    adj = glob.glob(os.path.join(out_dir, "ba_bruteforce", "rpcs_adj", "*.rpc_adj"))
    assert len(adj) == 4
    masks = glob.glob(os.path.join(out_dir, "ba_bruteforce", "matches", "masks", "*.npy"))
    assert len(masks) == 4
    # masks actually restrict: each has both masked and unmasked pixels
    for m in masks:
        arr = np.load(m)
        assert arr.any()


def test_in_memory_handoff_matches_npy_exchange(option_scene):
    """FT_save=False (round 4): detection's in-memory features feed the
    matcher directly — same tracks as the npy-exchange path, and no
    features/ or pairwise_matches/ caches on disk."""
    from sat_bundleadjust_tpu.tracks.pipeline import FeatureTracksPipeline

    def run_tracks(out_name, ft_save):
        out_dir = os.path.join(option_scene["root"], out_name)
        images = [
            type(im)(im.geotiff_path, im.rpc) for im in option_scene["images"]
        ]
        for im in images:
            im.set_footprint()
            im.set_camera_center()
        ft = FeatureTracksPipeline(
            out_dir, out_dir,
            {"images": images, "n_adj": 0, "aoi": None},
            tracks_config={
                "FT_kp_max": 800,
                "FT_sift_detection": "tpu",
                "FT_sift_matching": "bruteforce",
                "FT_save": ft_save,
            },
        )
        bundle, _ = ft.build_feature_tracks()
        return out_dir, bundle

    dir_npy, b_npy = run_tracks("out_handoff_npy", True)
    dir_mem, b_mem = run_tracks("out_handoff_mem", False)

    assert os.path.isdir(os.path.join(dir_npy, "features"))
    assert not os.path.exists(os.path.join(dir_mem, "features"))
    assert not os.path.exists(os.path.join(dir_mem, "pairwise_matches"))
    # in-memory features, not paths
    assert not isinstance(b_mem["features"][0], str)

    assert np.array_equal(b_npy["pairwise_matches"], b_mem["pairwise_matches"])
    assert np.array_equal(b_npy["C"], b_mem["C"], equal_nan=True)
    assert np.array_equal(b_npy["C_v2"], b_mem["C_v2"], equal_nan=True)
