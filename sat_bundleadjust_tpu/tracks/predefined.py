"""Predefined-matches loading: skip detection/matching entirely using a
portable keypoints+matches+filenames bundle.

Covers the reference's ft_utils.load_tracks_from_predefined_matches
(feature_tracks/ft_utils.py:355-488)."""

import os
import timeit

import numpy as np

from sat_bundleadjust_tpu.tracks import build as ft_build
from sat_bundleadjust_tpu.tracks.pairs import compute_pairs_to_match
from sat_bundleadjust_tpu.utils import geo as geo_utils
from sat_bundleadjust_tpu.utils import io as loader


def load_tracks_from_predefined_matches(input_dir, output_dir, local_data, tracks_config):
    """Same contract as FeatureTracksPipeline.build_feature_tracks."""
    start = timeit.default_timer()

    local_data["fnames"] = [im.geotiff_path for im in local_data["images"]]
    utm_poly = lambda im: {
        "geojson": geo_utils.utm_geojson_from_lonlat_geojson(im.lonlat_geojson),
        "z": im.alt,
    }
    local_data["footprints"] = [utm_poly(im) for im in local_data["images"]]
    local_data["optical_centers"] = [im.center for im in local_data["images"]]

    print("Loading predefined matches from {}".format(input_dir))
    src_im_paths = loader.load_list_of_paths(input_dir + "/filenames.txt")
    src_im_bn = [os.path.basename(p) for p in src_im_paths]
    target_im_bn = [os.path.basename(p) for p in local_data["fnames"]]

    target_im_indices = []
    for t_bn in target_im_bn:
        if t_bn not in src_im_bn:
            print("ERROR ! Input image {} is not listed in predefined_matches_dir".format(t_bn))
        else:
            target_im_indices.append(src_im_bn.index(t_bn))
    target_im_indices = np.array(target_im_indices)

    # load predefined features (keypoints are (col, row, scale) triplets,
    # padded to the common Nx132 layout)
    feature_paths = []
    features_dir = os.path.join(output_dir, "features")
    os.makedirs(features_dir, exist_ok=True)
    for idx in target_im_indices:
        file_id = loader.get_id(src_im_paths[idx])
        path_to_npy = "{}/keypoints/{}.npy".format(input_dir, file_id)
        kp_coords = np.load(path_to_npy)
        current = np.hstack([kp_coords[:, :3], np.ones((kp_coords.shape[0], 129))])
        out_npy = features_dir + "/" + file_id + ".npy"
        np.save(out_npy, current)
        feature_paths.append(out_npy)

    # pairs
    n_adj = local_data["n_adj"]
    n_new = len(local_data["fnames"]) - n_adj
    if len(tracks_config["FT_predefined_pairs"]) == 0:
        init_pairs = []
        for i in range(n_adj):
            for j in range(n_adj, n_adj + n_new):
                init_pairs.append((i, j))
        for i in range(n_adj, n_adj + n_new):
            for j in range(i + 1, n_adj + n_new):
                init_pairs.append((i, j))
    else:
        init_pairs = tracks_config["FT_predefined_pairs"]
    pairs_to_match, pairs_to_triangulate = compute_pairs_to_match(
        init_pairs, local_data["footprints"], local_data["optical_centers"]
    )

    # load predefined matches, remap image indices, normalize pair order
    matches = np.load(input_dir + "/matches.npy")
    total_cams = len(src_im_paths)
    in_use = np.zeros(total_cams, dtype=bool)
    in_use[target_im_indices] = True
    keep = in_use[matches[:, 2]] & in_use[matches[:, 3]]
    matches = matches[keep, :]

    src_to_target = np.full(total_cams, np.nan)
    src_to_target[target_im_indices] = np.arange(len(target_im_indices))
    for col in (2, 3):
        matches[:, col] = src_to_target[matches[:, col]]
    wrong = matches[:, 2] > matches[:, 3]
    tmp = matches.copy()
    matches[wrong, 2], matches[wrong, 3] = tmp[wrong, 3], tmp[wrong, 2]
    matches[wrong, 0], matches[wrong, 1] = tmp[wrong, 1], tmp[wrong, 0]
    print("Using {} predefined stereo matches !".format(matches.shape[0]))

    C, C_v2 = ft_build.feature_tracks_from_pairwise_matches(
        feature_paths, matches.astype(np.int64), pairs_to_triangulate
    )
    where_fix_pts = np.sum(~np.isnan(C[::2, :])[n_adj:], axis=0) == 0
    n_pts_fix = int(np.sum(where_fix_pts))
    if n_pts_fix > 0:
        C = np.hstack([C[:, where_fix_pts], C[:, ~where_fix_pts]])
        C_v2 = np.hstack([C_v2[:, where_fix_pts], C_v2[:, ~where_fix_pts]])
    print("Found {} tracks in total".format(C.shape[1]))

    feature_tracks = {
        "C": C,
        "C_v2": C_v2,
        "features": feature_paths,
        "pairwise_matches": matches,
        "pairs_to_triangulate": pairs_to_triangulate,
        "pairs_to_match": pairs_to_match,
        "n_pts_fix": n_pts_fix,
    }
    if tracks_config["FT_save"]:
        loader.save_list_of_paths(output_dir + "/filenames.txt", local_data["fnames"])
        np.save(output_dir + "/matches.npy", matches)
        loader.save_list_of_pairs(output_dir + "/pairs_matching.npy", pairs_to_match)
        loader.save_list_of_pairs(output_dir + "/pairs_triangulation.npy", pairs_to_triangulate)

    stop = timeit.default_timer()
    print("\nFeature tracks computed in {}\n".format(loader.get_time_in_hours_mins_secs(stop - start)))
    return feature_tracks, stop - start
