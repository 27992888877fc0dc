"""End-to-end demo on a self-generated scene.

Renders four synthetic satellite views of a shared ground texture, biases
three of the four camera models (the miscalibration bundle adjustment must
correct), writes a scene directory + JSON config with the reference's
layout, and runs the full pipeline through the CLI entry point:

    python examples/synthetic_demo.py [workdir]

Expected output: four adjusted models under
<workdir>/outdir/ba_bruteforce/rpcs_adj/*.rpc_adj, a bundle_adjust.log,
figures, and a printed before/after reprojection-error summary where the
error drops from a few pixels to ~zero.

Runs on whatever backend JAX selects; set JAX_PLATFORMS=cpu to force the
host (a first TPU run pays remote-compilation time).
"""

import json
import os
import sys

import numpy as np


def build_scene_dir(root, n_cam=4, h=300, w=400, seed=7):
    from PIL import Image

    from sat_bundleadjust_tpu.models.rpc import write_rpc_file
    from sat_bundleadjust_tpu.utils.demo import render_synthetic_images

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, rpcs = render_synthetic_images(n_cam=n_cam, h=h, w=w, seed=0)
    rng = np.random.RandomState(seed)
    for i, (im, rpc) in enumerate(zip(images, rpcs)):
        # per-camera image-space bias; camera 0 keeps the truth so the
        # adjusted scene stays anchored
        bias = np.zeros(2) if i == 0 else rng.uniform(-4, 4, 2)
        biased = rpc._replace(
            col_offset=rpc.col_offset + bias[0], row_offset=rpc.row_offset + bias[1]
        )
        name = "20200413_1514{:02d}_demo_cam{}".format(10 + i, i)
        Image.fromarray((im * 255).astype(np.uint8)).save(
            os.path.join(img_dir, name + ".tif")
        )
        write_rpc_file(biased, os.path.join(img_dir, name + ".rpc"))
    return img_dir


def main():
    root = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else "demo_scene")
    os.makedirs(root, exist_ok=True)
    img_dir = build_scene_dir(root)
    cfg = {
        "geotiff_dir": img_dir,
        "rpc_dir": img_dir,
        "rpc_src": "txt",
        "cam_model": "rpc",
        "output_dir": os.path.join(root, "outdir"),
        "ba_method": "ba_bruteforce",
        "FT_kp_max": 3000,
        "FT_sift_detection": "tpu",
        "FT_sift_matching": "epipolar_based",
        "clean_outliers": True,
        "save_figures": True,
    }
    cfg_path = os.path.join(root, "config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=2)

    from sat_bundleadjust_tpu import main as run_pipeline

    scene = run_pipeline(cfg_path)
    print(
        "demo done: mean reprojection {:.3f} px -> {:.3f} px; adjusted RPCs in {}".format(
            float(np.mean(scene.ba_pipeline.init_e)),
            float(np.mean(scene.ba_pipeline.ba_e)),
            os.path.join(cfg["output_dir"], "ba_bruteforce", "rpcs_adj"),
        )
    )


if __name__ == "__main__":
    main()
