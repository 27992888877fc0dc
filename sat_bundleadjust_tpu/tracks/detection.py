"""Keypoint detection backends.

The reference offers two detectors: the IPOL SIMD SIFT via ctypes
("s2p", feature_tracks/ft_s2p.py) and OpenCV SIFT ("opencv",
feature_tracks/ft_opencv.py). Here:

* "tpu": the JAX/Pallas scale-space SIFT of sat_bundleadjust_tpu.ops.sift
  (the TPU-native replacement of the SIMD C++ detector; same IPOL anatomy
  parameters: thresh_dog 0.0133, 8 octaves, 3 scales per octave —
  ft_s2p.py:42-44)
* "opencv": cv2 SIFT on percentile-equalized uint8 (reference behavior)

Both produce the common keypoint layout: (N, 132) float rows
(col, row, scale, orientation, 128-dim descriptor), NaN-padded to
FT_kp_max with scale-descending priority (ft_s2p.py:75-79)."""

import os

import numpy as np

from sat_bundleadjust_tpu.utils import io as loader
from sat_bundleadjust_tpu.utils.io import flush_print, get_id


def _top_k_by_scale(features, max_kp):
    """Sort by descending scale and NaN-pad to max_kp
    (reference: ft_s2p.py:74-82)."""
    if features.shape[0] > 0:
        features = features[np.argsort(-features[:, 2], kind="stable")]
    if max_kp is None:
        return features
    out = np.full((max_kp, 132), np.nan)
    n = min(features.shape[0], max_kp)
    out[:n] = features[:n]
    return out


def _apply_mask(features, mask):
    pts = features[:, :2].astype(np.int64)
    h, w = mask.shape
    pts[:, 0] = np.clip(pts[:, 0], 0, w - 1)
    pts[:, 1] = np.clip(pts[:, 1], 0, h - 1)
    inside = mask[pts[:, 1], pts[:, 0]] > 0
    return features[inside]


def detect_opencv(image, mask=None):
    """cv2 SIFT on an equalized image (reference: ft_opencv.py:17-74)."""
    import cv2

    sift = cv2.SIFT_create()
    kp, des = sift.detectAndCompute(
        image.astype(np.uint8), None if mask is None else mask.astype(np.uint8)
    )
    if not kp:
        return np.zeros((0, 132))
    return np.array([[k.pt[0], k.pt[1], k.size, k.angle, *d] for k, d in zip(kp, des)])


def detect_tpu(image, mask=None, thresh_dog=0.0133, n_octaves=8, n_scales=3, max_kp=None):
    """JAX scale-space SIFT (see ops/sift.py)."""
    from sat_bundleadjust_tpu.ops.sift import detect_sift

    feats = detect_sift(
        np.asarray(image, dtype=np.float32),
        thresh_dog=thresh_dog,
        n_octaves=n_octaves,
        n_scales=n_scales,
        max_kp=max_kp,
    )
    if mask is not None and feats.shape[0] > 0:
        feats = _apply_mask(feats, mask)
    return feats


def detect_features_image_sequence(geotiff_paths, mask_paths=None, offsets=None,
                                   tracks_config=None, image_indices=None, thread_idx=None):
    """Detect keypoints over an image sequence with npy caching
    (reference: ft_s2p.detect_features_image_sequence, ft_s2p.py:18-94)."""
    from sat_bundleadjust_tpu.utils.config import init_feature_tracks_config

    import jax

    config = init_feature_tracks_config(tracks_config)
    max_kp = None if tracks_config is None else config["FT_kp_max"]
    backend = config["FT_sift_detection"]

    # multi-process deployments: each host reads + detects ONLY its own
    # images (per-host geotiff IO, SURVEY.md section 5.8) and exchanges the
    # results through the shared features/ npy cache — the TPU-native analog
    # of the reference's per-worker npy exchange (ft_s2p.py:123-124)
    multiproc = jax.process_count() > 1
    if multiproc:
        from sat_bundleadjust_tpu.parallel import multihost
        from sat_bundleadjust_tpu.parallel.mesh import make_mesh

        if not (config["FT_save"] and "out_dir" in config):
            raise ValueError(
                "multi-process feature detection needs FT_save + out_dir "
                "(shared-filesystem npy exchange)"
            )
        owned = set(multihost.partition_by_process(len(geotiff_paths)))
        local_devs = jax.local_devices()
        local_mesh = make_mesh(devices=local_devs) if len(local_devs) > 1 else False
    else:
        owned = None
        local_mesh = None

    # first pass: resolve caches and mark the images that need detection
    n = len(geotiff_paths)
    resolved = [None] * n
    pending = []  # (i, geotiff_path, offset, mask) still to load + detect
    remote = []  # uncached images another process owns (multi-process only)
    for i, geotiff_path in enumerate(geotiff_paths):
        if not config["FT_reset"] and "in_dir" in config:
            npy_in = os.path.join(config["in_dir"], "features/{}.npy".format(get_id(geotiff_path)))
            if os.path.exists(npy_in):
                resolved[i] = np.load(npy_in)
                continue
        if owned is not None and i not in owned:
            remote.append(i)
            continue
        offset_i = None if offsets is None else offsets[i]
        mask = None if mask_paths is None else np.load(mask_paths[i])
        pending.append((i, geotiff_path, offset_i, mask))

    if backend == "opencv":
        # FT_n_proc fan-out (the CPU path's parallel axis; the reference
        # chunks images over a multiprocessing.Pool, ft_s2p.py:97-124).
        # Threads instead of processes: cv2 SIFT releases the GIL and
        # rasterio reads are IO-bound, so a thread pool gets the same
        # near-linear speedup without fork/pickle overhead. The TPU backend
        # ignores FT_n_proc — its parallel axis is the device mesh.
        def load_and_detect(item):
            i, path, offset_i, mask = item
            image = loader.load_image(path, offset=offset_i, equalize=True)
            return i, _top_k_by_scale(detect_opencv(image, mask), max_kp)

        n_proc = int(config.get("FT_n_proc", 1) or 1)
        if n_proc > 1 and len(pending) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=n_proc) as pool:
                results = list(pool.map(load_and_detect, pending))
        else:
            results = [load_and_detect(item) for item in pending]
        for i, feats in results:
            resolved[i] = feats
        to_detect = [(i, None, None) for i, *_ in pending]
    else:  # "tpu" (also accepts the reference's "s2p" name)
        to_detect = [
            (
                i,
                loader.load_image(path, offset=offset_i, equalize=False),
                mask,
            )
            for i, path, offset_i, mask in pending
        ]
        from sat_bundleadjust_tpu.parallel.feature_shard import detect_batches_mesh

        # batch same-shape images through one vmapped octave program set
        # (8 dispatches per shape group instead of 8 per image); with more
        # than one device the batch axis is sharded over the mesh
        # (parallel/feature_shard.py — the reference's Pool fan-out axis,
        # ft_s2p.py:97-124)
        by_shape = {}
        for i, image, mask in to_detect:
            by_shape.setdefault(np.asarray(image).shape, []).append((i, image, mask))
        for group in by_shape.values():
            feats_list = detect_batches_mesh(
                [np.asarray(im, dtype=np.float32) for _, im, _ in group],
                config, max_kp=max_kp,
                mesh=local_mesh,
            )
            for (i, _, mask), feats in zip(group, feats_list):
                if mask is not None and feats.shape[0] > 0:
                    feats = _apply_mask(feats, mask)
                resolved[i] = _top_k_by_scale(feats, max_kp)

    if multiproc:
        # publish this host's work to the shared cache (detected images are
        # owned exclusively — no write races; cache-relocated entries are
        # published by the main process only), then pick up the other hosts'
        from sat_bundleadjust_tpu.parallel import multihost

        detected = {i for i, _, _ in to_detect}
        for i in range(n):
            if resolved[i] is None or i in remote:
                continue
            if i not in detected and not multihost.is_main_process():
                continue
            npy_out = os.path.join(
                config["out_dir"], "features/{}.npy".format(get_id(geotiff_paths[i]))
            )
            if not os.path.exists(npy_out):
                os.makedirs(os.path.dirname(npy_out), exist_ok=True)
                np.save(npy_out, resolved[i])
        multihost.barrier("feature_detection")
        for i in remote:
            npy_out = os.path.join(
                config["out_dir"], "features/{}.npy".format(get_id(geotiff_paths[i]))
            )
            resolved[i] = np.load(npy_out)

    features = []
    for i, geotiff_path in enumerate(geotiff_paths):
        features_i = resolved[i]
        n_kp = int(np.sum(~np.isnan(features_i[:, 0])))
        flush_print("{} keypoints in image {}".format(n_kp, i))

        if config["FT_save"] and "out_dir" in config and not multiproc:
            npy_out = os.path.join(config["out_dir"], "features/{}.npy".format(get_id(geotiff_path)))
            os.makedirs(os.path.dirname(npy_out), exist_ok=True)
            np.save(npy_out, features_i)
        features.append(features_i)
    return features
