"""Scene/timeseries driver: date grouping, sequential and global BA modes.

Uses a tiny 2-date rendered scene (2 images per date) to exercise the
sequential path (previously adjusted dates frozen via n_adj, rpcs_adj
reuse) and the global path (predefined pairs restricted to neighboring
dates) end to end."""

import glob
import json
import os

import numpy as np
import pytest

from sat_bundleadjust_tpu.timeseries import Scene, group_files_by_date, load_pairs_from_same_date_and_next_dates
from sat_bundleadjust_tpu.models.rpc import write_rpc_file
from sat_bundleadjust_tpu.utils.demo import make_synthetic_rpc

from test_e2e import TERRAIN_ALT, render_image, world_texture


def test_group_files_by_date():
    import datetime

    dts = [
        datetime.datetime(2020, 4, 13, 15, 14, 0),
        datetime.datetime(2020, 4, 13, 15, 20, 0),   # same acquisition (<30 min)
        datetime.datetime(2020, 4, 20, 10, 0, 0),    # new date
    ]
    timeline = group_files_by_date(dts, ["a.tif", "b.tif", "c.tif"])
    assert len(timeline) == 2
    assert timeline[0]["n_images"] == 2
    assert timeline[1]["n_images"] == 1


def test_load_pairs_from_same_date_and_next_dates():
    timeline = [{"n_images": 2}, {"n_images": 2}, {"n_images": 1}]
    pairs = load_pairs_from_same_date_and_next_dates(timeline, [0, 1, 2], next_dates=1)
    # intra-date: (0,1), (2,3); cross-date: 0-1 x 2-3 (4 pairs), 2-3 x 4 (2 pairs)
    assert (0, 1) in pairs and (2, 3) in pairs
    assert (0, 2) in pairs and (1, 3) in pairs
    assert (2, 4) in pairs and (3, 4) in pairs
    assert (0, 4) not in pairs  # two dates apart


@pytest.fixture(scope="module")
def two_date_scene(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("ts_scene")
    img_dir = root / "images"
    img_dir.mkdir()
    tex = world_texture()
    h, w = 150, 200
    rng = np.random.RandomState(5)
    for d, datecode in enumerate(["20200413_151400", "20200420_151400"]):
        for i in range(2):
            idx = 2 * d + i
            rpc = make_synthetic_rpc(
                view_dx=230.0 * np.cos(np.pi * idx / 2 + 0.3),
                view_dy=230.0 * np.sin(np.pi * idx / 2 + 0.3),
                img_halfsize=(w / 2, h / 2),
            )
            bias = np.zeros(2) if idx == 0 else rng.uniform(-3, 3, 2)
            biased = rpc._replace(
                col_offset=rpc.col_offset + bias[0], row_offset=rpc.row_offset + bias[1]
            )
            im = render_image(rpc, tex, h, w)
            name = "{}_synth_cam{}".format(datecode[:-2] + "{:02d}".format(i), idx)
            Image.fromarray(im).save(str(img_dir / (name + ".tif")))
            write_rpc_file(biased, str(img_dir / (name + ".rpc")))
    return str(root)


def _base_cfg(root, method):
    return {
        "geotiff_dir": os.path.join(root, "images"),
        "rpc_dir": os.path.join(root, "images"),
        "rpc_src": "txt",
        "cam_model": "rpc",
        "output_dir": os.path.join(root, "out_" + method),
        "ba_method": method,
        "FT_kp_max": 1500,
        "FT_sift_detection": "tpu",
        "FT_sift_matching": "bruteforce",
        "save_figures": False,
    }


def test_sequential_mode(two_date_scene):
    cfg = _base_cfg(two_date_scene, "ba_sequential")
    cfg["n_dates"] = 1
    scene = Scene(cfg)
    assert len(scene.timeline) == 2
    scene.run_bundle_adjustment_for_RPC_refinement()
    adj = glob.glob(os.path.join(cfg["output_dir"], "ba_sequential", "rpcs_adj", "*.rpc_adj"))
    assert len(adj) == 4
    # the second date must have been adjusted against the first (frozen) one
    assert scene.timeline[0]["adjusted"]
    # and the pipeline for date 2 saw previously adjusted cameras
    assert scene.ba_pipeline.n_adj > 0


def test_global_mode(two_date_scene):
    cfg = _base_cfg(two_date_scene, "ba_global")
    cfg["n_dates"] = 1
    scene = Scene(cfg)
    scene.run_bundle_adjustment_for_RPC_refinement()
    adj = glob.glob(os.path.join(cfg["output_dir"], "ba_global", "rpcs_adj", "*.rpc_adj"))
    assert len(adj) == 4
    assert float(np.mean(scene.ba_pipeline.ba_e)) < 0.5


def test_scene_forwards_pipeline_extras(two_date_scene):
    """Scene-level pipeline extras (max_init_reproj_error,
    outlier_thr_rounding, dem_path) reach the pipeline. The reference only
    reads max_init_reproj_error when the pipeline is constructed directly
    (ba_pipeline.py:94); this framework exposes all three in the scene
    JSON so they are usable from the CLI."""
    cfg = _base_cfg(two_date_scene, "ba_bruteforce")
    cfg["output_dir"] = cfg["output_dir"] + "_extras"
    cfg["max_init_reproj_error"] = 25.0
    cfg["outlier_thr_rounding"] = True
    scene = Scene(cfg)
    scene.run_bundle_adjustment_for_RPC_refinement()
    assert scene.ba_pipeline.max_init_reproj_error == 25.0
    assert scene.ba_pipeline.outlier_thr_rounding is True
    adj = glob.glob(os.path.join(cfg["output_dir"], "ba_bruteforce", "rpcs_adj", "*.rpc_adj"))
    assert len(adj) == 4


def test_scene_timeline_indices_and_label(two_date_scene):
    """timeline_indices restricts the adjusted dates; geotiff_label filters
    the loaded frames (reference: ba_timeseries.py load_scene + selected
    timeline handling)."""
    cfg = _base_cfg(two_date_scene, "ba_bruteforce")
    cfg["output_dir"] = cfg["output_dir"] + "_tl"
    cfg["timeline_indices"] = [0]
    scene = Scene(cfg)
    assert len(scene.timeline) == 2
    scene.run_bundle_adjustment_for_RPC_refinement()
    adj = glob.glob(os.path.join(cfg["output_dir"], "ba_bruteforce", "rpcs_adj", "*.rpc_adj"))
    assert len(adj) == 2  # only date 0's two frames

    cfg2 = _base_cfg(two_date_scene, "ba_bruteforce")
    cfg2["output_dir"] = cfg2["output_dir"] + "_label"
    cfg2["geotiff_label"] = "cam3"
    scene2 = Scene(cfg2)
    assert len(scene2.timeline) == 1
    assert sum(len(t["fnames"]) for t in scene2.timeline) == 1
