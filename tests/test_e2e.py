"""End-to-end pipeline integration test on a fully synthetic scene.

The reference's integration test (tests/test_ba.py) needs bundled geotiffs
that are absent from the snapshot, so this test *renders* its own scene:
a shared ground texture viewed through synthetic RPC cameras with known
injected biases. The pipeline (SIFT -> matching -> tracks -> triangulation
-> soft-L1 BA -> outliers -> L2 BA -> RPC refit -> .rpc_adj files) must
reduce the inter-image inconsistency caused by the injected biases."""

import glob
import json
import os

import numpy as np
import pytest
import jax.numpy as jnp

from sat_bundleadjust_tpu.models.rpc import rpc_from_rpc_file, write_rpc_file
from sat_bundleadjust_tpu.utils.demo import make_synthetic_rpc

TERRAIN_ALT = 50.0


def world_texture():
    """Smooth random texture indexed by (lon, lat)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(0)
    n = 1024
    tex = np.zeros((n, n))
    for o in range(4):
        tex += gaussian_filter(rng.randn(n, n), sigma=2.0 ** (o + 1)) * (2.0 ** o)
    tex -= tex.min()
    tex /= tex.max()
    return tex


def render_image(rpc, tex, h, w, lon0=-72.71, lat0=11.02, span=0.035):
    """Pixel value = texture at the localized ground position."""
    cols, rows = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    alts = np.full(cols.size, TERRAIN_ALT)
    lons, lats = rpc.localization(
        jnp.asarray(cols.ravel()), jnp.asarray(rows.ravel()), jnp.asarray(alts)
    )
    lons, lats = np.asarray(lons), np.asarray(lats)
    n = tex.shape[0]
    u = (lons - (lon0 - span)) / (2 * span) * (n - 1)
    v = (lats - (lat0 - span)) / (2 * span) * (n - 1)
    u = np.clip(u, 0, n - 1.001)
    v = np.clip(v, 0, n - 1.001)
    u0, v0 = np.floor(u).astype(int), np.floor(v).astype(int)
    fu, fv = u - u0, v - v0
    vals = (
        (1 - fv) * ((1 - fu) * tex[v0, u0] + fu * tex[v0, u0 + 1])
        + fv * ((1 - fu) * tex[v0 + 1, u0] + fu * tex[v0 + 1, u0 + 1])
    )
    return (vals.reshape(h, w) * 255).astype(np.uint8)


@pytest.fixture(scope="module")
def synthetic_scene_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("e2e_scene")
    img_dir = root / "images"
    img_dir.mkdir()
    tex = world_texture()
    h, w = 300, 400
    rng = np.random.RandomState(7)

    n_cam = 4
    true_rpcs, biased_rpcs = [], []
    for i in range(n_cam):
        rpc = make_synthetic_rpc(
            view_dx=250.0 * np.cos(2 * np.pi * i / n_cam),
            view_dy=250.0 * np.sin(2 * np.pi * i / n_cam),
            img_halfsize=(w / 2, h / 2),
        )
        true_rpcs.append(rpc)
        # inject a per-camera image-space bias (what BA must correct);
        # camera 0 keeps the truth so the solution stays anchored
        bias = np.zeros(2) if i == 0 else rng.uniform(-4, 4, 2)
        biased = rpc._replace(
            col_offset=rpc.col_offset + bias[0], row_offset=rpc.row_offset + bias[1]
        )
        biased_rpcs.append(biased)

        im = render_image(rpc, tex, h, w)
        name = "2020041{}_1514{:02d}_synth_cam{}".format(3, 10 + i, i)
        Image.fromarray(im).save(str(img_dir / (name + ".tif")))
        write_rpc_file(biased, str(img_dir / (name + ".rpc")))

    return {
        "root": str(root),
        "img_dir": str(img_dir),
        "true_rpcs": true_rpcs,
        "biased_rpcs": biased_rpcs,
        "size": (h, w),
    }


def test_full_pipeline(synthetic_scene_dir):
    import sat_bundleadjust_tpu

    out_dir = os.path.join(synthetic_scene_dir["root"], "outdir")
    cfg = {
        "geotiff_dir": synthetic_scene_dir["img_dir"],
        "rpc_dir": synthetic_scene_dir["img_dir"],
        "rpc_src": "txt",
        "cam_model": "rpc",
        "output_dir": out_dir,
        "ba_method": "ba_bruteforce",
        "FT_kp_max": 3000,
        "FT_sift_detection": "tpu",
        "FT_sift_matching": "bruteforce",
        "clean_outliers": True,
        "save_figures": False,
    }
    cfg_path = os.path.join(synthetic_scene_dir["root"], "config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    scene = sat_bundleadjust_tpu.main(cfg_path)

    # adjusted RPC files exist for every camera
    adj = sorted(glob.glob(os.path.join(out_dir, "ba_bruteforce", "rpcs_adj", "*.rpc_adj")))
    assert len(adj) == 4

    # BA must reduce the reprojection error caused by the injected biases
    ba_e = float(np.mean(scene.ba_pipeline.ba_e))
    init_e = float(np.mean(scene.ba_pipeline.init_e))
    assert init_e > 1.0, init_e
    assert ba_e < 0.5 * init_e, (init_e, ba_e)
    assert ba_e < 1.0, ba_e

    # the adjusted RPCs must be more mutually consistent than the biased
    # inputs: reproject a ground grid through all cameras and compare the
    # pairwise disagreement of image positions mapped back to the ground
    true_rpcs = synthetic_scene_dir["true_rpcs"]
    adj_rpcs = [rpc_from_rpc_file(f) for f in adj]
    h, w = synthetic_scene_dir["size"]
    gl = np.linspace(-0.01, 0.01, 5)
    lons = -72.71 + gl
    lats = 11.02 + gl
    LO, LA = np.meshgrid(lons, lats)
    alts = np.full(LO.size, TERRAIN_ALT)

    def consistency(rpcs):
        # project through the true camera 0 and localize back through each
        # candidate rpc: a consistent set maps to the same ground point
        errs = []
        c0, r0 = true_rpcs[0].projection(jnp.asarray(LO.ravel()), jnp.asarray(LA.ravel()), jnp.asarray(alts))
        for cam_idx in range(4):
            ci, ri = rpcs[cam_idx].projection(jnp.asarray(LO.ravel()), jnp.asarray(LA.ravel()), jnp.asarray(alts))
            ct, rt = true_rpcs[cam_idx].projection(jnp.asarray(LO.ravel()), jnp.asarray(LA.ravel()), jnp.asarray(alts))
            errs.append(np.hypot(np.asarray(ci) - np.asarray(ct), np.asarray(ri) - np.asarray(rt)))
        return np.mean(errs)

    err_biased = consistency(synthetic_scene_dir["biased_rpcs"])
    err_adj = consistency(adj_rpcs)
    print("consistency vs truth: biased {:.3f} px -> adjusted {:.3f} px".format(err_biased, err_adj))
    # R-only corrective rotations approximate the injected image-space
    # biases; expect a solid (but not total) consistency improvement
    assert err_adj < 0.7 * err_biased, (err_biased, err_adj)


@pytest.mark.parametrize("cam_model", ["affine", "perspective"])
def test_full_pipeline_matrix_models(synthetic_scene_dir, cam_model):
    """Full pipeline with the matrix camera models (reference:
    ba_pipeline.py:207-217 approximation branch + the P_adj outputs and
    the fit_rpc_from_projection_matrix refit, ba_pipeline.py:379-416)."""
    import sat_bundleadjust_tpu

    out_dir = os.path.join(synthetic_scene_dir["root"], "outdir_" + cam_model)
    cfg = {
        "geotiff_dir": synthetic_scene_dir["img_dir"],
        "rpc_dir": synthetic_scene_dir["img_dir"],
        "rpc_src": "txt",
        "cam_model": cam_model,
        "output_dir": out_dir,
        "ba_method": "ba_bruteforce",
        "FT_kp_max": 3000,
        "FT_sift_detection": "tpu",
        "FT_sift_matching": "bruteforce",
        "clean_outliers": True,
        "save_figures": False,
    }
    cfg_path = os.path.join(synthetic_scene_dir["root"], "config_" + cam_model + ".json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    scene = sat_bundleadjust_tpu.main(cfg_path)

    # adjusted projection matrices AND refitted RPCs for every camera
    adj_P = sorted(glob.glob(os.path.join(out_dir, "ba_bruteforce", "P_adj", "*.json")))
    adj_rpc = sorted(glob.glob(os.path.join(out_dir, "ba_bruteforce", "rpcs_adj", "*.rpc_adj")))
    assert len(adj_P) == 4 and len(adj_rpc) == 4

    ba_e = float(np.mean(scene.ba_pipeline.ba_e))
    init_e = float(np.mean(scene.ba_pipeline.init_e))
    # the matrix approximations of biased RPCs carry the inconsistency;
    # BA must reduce it substantially
    assert ba_e < 0.6 * init_e, (init_e, ba_e)
    # refitted RPCs re-read and project finitely over the footprint
    r = rpc_from_rpc_file(adj_rpc[0])
    c, rr = r.projection(jnp.asarray([-72.71]), jnp.asarray([11.02]), jnp.asarray([50.0]))
    assert np.isfinite(float(c[0])) and np.isfinite(float(rr[0]))
