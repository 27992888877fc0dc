"""Predefined-matches round trip: a matches dir produced by the pipeline is
converted to the portable bundle and re-consumed with predefined_matches
(skipping detection/matching entirely), yielding an equivalent BA problem.

Reference: loader.save_predefined_matches (loader.py:409-424) +
ft_utils.load_tracks_from_predefined_matches (ft_utils.py:355-488)."""

import os

import numpy as np

from sat_bundleadjust_tpu.utils.io import save_predefined_matches


def test_predefined_matches_roundtrip(tmp_path):
    import sat_bundleadjust_tpu  # noqa: F401
    from PIL import Image

    from sat_bundleadjust_tpu.models.cameras import SatelliteImage
    from sat_bundleadjust_tpu.models.rpc import write_rpc_file
    from sat_bundleadjust_tpu.pipeline import BundleAdjustmentPipeline
    from sat_bundleadjust_tpu.utils.demo import make_synthetic_rpc

    from test_e2e import render_image, world_texture

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    tex = world_texture()
    h, w = 140, 180
    images = []
    for i in range(2):
        rpc = make_synthetic_rpc(
            view_dx=220.0 * (1 if i == 0 else -1), view_dy=90.0 * i,
            img_halfsize=(w / 2, h / 2),
        )
        im = render_image(rpc, tex, h, w)
        name = "20200413_15150{}_synth_cam{}".format(i, i)
        Image.fromarray(im).save(str(img_dir / (name + ".tif")))
        write_rpc_file(rpc, str(img_dir / (name + ".rpc")))
        images.append(SatelliteImage(str(img_dir / (name + ".tif")), rpc))

    cfg = {"FT_kp_max": 600, "FT_sift_detection": "tpu", "FT_sift_matching": "bruteforce"}

    # direct run (detection + matching); matches dir persisted by FT_save
    out1 = str(tmp_path / "out1")
    ba1 = BundleAdjustmentPipeline(
        {"in_dir": out1, "out_dir": out1, "images": images},
        tracks_config=cfg, extra_ba_config={"save_figures": False},
    )
    ba1.compute_feature_tracks()
    n_tracks_direct = ba1.C.shape[1]
    assert n_tracks_direct > 20

    # convert to the portable bundle, consume it with predefined_matches
    save_predefined_matches(os.path.join(out1, "matches"), out1)
    images2 = [SatelliteImage(im.geotiff_path, im.rpc) for im in images]
    out2 = str(tmp_path / "out2")
    ba2 = BundleAdjustmentPipeline(
        {"in_dir": out1, "out_dir": out2, "images": images2},
        tracks_config=cfg,
        extra_ba_config={"predefined_matches": True, "save_figures": False},
    )
    ba2.compute_feature_tracks()
    n_tracks_predef = ba2.C.shape[1]
    # identical matches -> (near-)identical track structure
    assert abs(n_tracks_predef - n_tracks_direct) <= max(2, 0.1 * n_tracks_direct)
