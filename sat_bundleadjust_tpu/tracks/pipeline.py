"""FeatureTracksPipeline: detection -> pair selection -> matching -> tracks.

Covers the reference's feature_tracks/ft_pipeline.py:27-261 with the same
stage structure and npy caching layout (features/, features_utm/,
pairwise_matches/), driving the TPU kernels of ops/sift.py and
ops/match.py instead of the ctypes SIMD SIFT."""

import os
import timeit

import numpy as np

from sat_bundleadjust_tpu.tracks import build as ft_build
from sat_bundleadjust_tpu.tracks import detection as ft_detection
from sat_bundleadjust_tpu.tracks import matching as ft_matching
from sat_bundleadjust_tpu.tracks.pairs import compute_pairs_to_match
from sat_bundleadjust_tpu.utils import geo as geo_utils
from sat_bundleadjust_tpu.utils import io as loader
from sat_bundleadjust_tpu.utils.config import init_feature_tracks_config
from sat_bundleadjust_tpu.utils.io import flush_print


class FeatureTracksPipeline:
    def __init__(self, input_dir, output_dir, local_data, tracks_config=None):
        """Args identical to the reference (ft_pipeline.py:28-71):
        local_data holds "images" (SatelliteImage list), "n_adj", "aoi"."""
        self.input_dir = input_dir
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.images = local_data["images"]
        self.n_adj = local_data["n_adj"]
        self.aoi = local_data.get("aoi")
        self.config = init_feature_tracks_config(tracks_config)
        self.config["in_dir"] = self.input_dir
        self.config["out_dir"] = self.output_dir

        # AOI keypoint masks (reference: ft_pipeline.py:59-71)
        if self.config["FT_kp_aoi"] and self.aoi is not None:
            from sat_bundleadjust_tpu.parallel import multihost

            self.mask_paths = []
            masks_dir = os.path.join(self.output_dir, "masks")
            os.makedirs(masks_dir, exist_ok=True)
            # multi-process: masks are consumed only by the detection stage,
            # whose image ownership uses the same round-robin deal — each
            # host writes (and later reads) only its own images' masks
            owned = set(multihost.partition_by_process(len(self.images)))
            for k, im in enumerate(self.images):
                mask_path = os.path.join(masks_dir, loader.get_id(im.geotiff_path) + ".npy")
                if k in owned:
                    y0, x0 = int(im.offset["row0"]), int(im.offset["col0"])
                    h, w = int(im.offset["height"]), int(im.offset["width"])
                    mask = loader.get_binary_mask_from_aoi_lonlat_within_image(
                        h, w, im.rpc, self.aoi, alt=im.alt or 0.0
                    )
                    np.save(mask_path, mask[y0 : y0 + h, x0 : x0 + w])
                self.mask_paths.append(mask_path)
        else:
            self.mask_paths = None

    # ------------------------------------------------------------------

    def run_feature_detection(self):
        """Reference: ft_pipeline.py:73-105.

        Single-process with FT_save=False: detection's in-memory results
        feed the matcher DIRECTLY (the reference's stages can only talk
        through the features/ npy exchange, ft_s2p.py:123-124; here the
        npy cache is an optional persistence layer, not the transport)."""
        import jax

        image_paths = [im.geotiff_path for im in self.images]
        offsets = [im.offset for im in self.images]
        masks = self.mask_paths if self.config["FT_kp_aoi"] else None
        # multi-process still exchanges through the shared npy cache
        handoff = jax.process_count() == 1 and not self.config["FT_save"]
        cfg = dict(self.config)
        cfg["FT_save"] = not handoff
        feats_mem = ft_detection.detect_features_image_sequence(
            image_paths, masks, offsets, cfg)

        if handoff:
            self.features = list(feats_mem)
            self.features_utm = [
                ft_matching.keypoints_to_utm_coords(
                    f, im.rpc, im.offset, im.alt or 0.0)
                for f, im in zip(feats_mem, self.images)
            ]
            return

        self.features = [
            "{}/features/{}.npy".format(self.output_dir, loader.get_id(p)) for p in image_paths
        ]
        self.features_utm = [
            "{}/features_utm/{}.npy".format(self.output_dir, loader.get_id(p)) for p in image_paths
        ]
        # multi-process: UTM coords follow detection's image ownership
        # (same round-robin deal), synced before any host reads cross-host
        from sat_bundleadjust_tpu.parallel import multihost

        owned = set(multihost.partition_by_process(len(self.images)))
        for k, (npy, npy_utm, im) in enumerate(zip(self.features, self.features_utm, self.images)):
            if k not in owned:
                continue
            if not self.config["FT_reset"] and os.path.exists(npy_utm):
                continue
            feats = np.load(npy, mmap_mode="r")
            utm = ft_matching.keypoints_to_utm_coords(feats, im.rpc, im.offset, im.alt or 0.0)
            os.makedirs(os.path.dirname(npy_utm), exist_ok=True)
            np.save(npy_utm, utm)
        multihost.barrier("features_utm")

    def get_stereo_pairs_to_match(self):
        """Reference: ft_pipeline.py:107-132."""
        self.n_new = len(self.images) - self.n_adj
        if len(self.config["FT_predefined_pairs"]) == 0:
            init_pairs = [
                (i, j)
                for i in range(self.n_adj + self.n_new)
                for j in range(i + 1, self.n_adj + self.n_new)
            ]
        else:
            init_pairs = self.config["FT_predefined_pairs"]

        utm_poly = lambda im: {
            "geojson": geo_utils.utm_geojson_from_lonlat_geojson(im.lonlat_geojson),
            "z": im.alt,
        }
        self.footprints = [utm_poly(im) for im in self.images]
        self.optical_centers = [im.center for im in self.images]
        args = [init_pairs, self.footprints, self.optical_centers]
        if self.config["FT_filter_pairs"]:
            self.pairs_to_match, self.pairs_to_triangulate = compute_pairs_to_match(*args)
        else:
            self.pairs_to_match, self.pairs_to_triangulate = compute_pairs_to_match(
                *args, min_overlap=0, min_baseline=0
            )
        print("{} pairs to match".format(len(self.pairs_to_match)))

    def run_feature_matching(self):
        """Reference: ft_pipeline.py:134-163."""
        if self.config["FT_sift_matching"] == "epipolar_based":
            # one vmapped device call for every pair's virtual-match grid
            # (the per-pair loop costs ~0.3-0.5 s dispatch overhead each —
            # minutes at hundreds of pairs; see init_F_pairs_batched)
            t_f = timeit.default_timer()
            F = ft_matching.init_F_pairs_batched(self.pairs_to_match, self.images)
            if ft_matching._TIMING_ON:
                flush_print("[match timing] epipolar F init: {:.1f}s".format(
                    timeit.default_timer() - t_f))
        else:
            F = None
        self.pairwise_matches = ft_matching.match_stereo_pairs(
            self.pairs_to_match, self.features, self.footprints, self.features_utm,
            self.config, F
        )
        print("Found {} new pairwise matches".format(self.pairwise_matches.shape[0]))

    def get_feature_tracks(self):
        """Assemble the track bundle from the pairwise matches (same output
        keys as the reference contract, ft_pipeline.py:166-195)."""
        C = C_v2 = None
        n_pts_fix = 0
        if len(self.pairwise_matches):
            C, C_v2 = ft_build.feature_tracks_from_pairwise_matches(
                self.features, self.pairwise_matches, self.pairs_to_triangulate
            )
            # the parameterization expects FIXED tracks (those never seen by
            # a camera under adjustment) as a leading block of C: permute
            # columns by "is the track observed by any new camera", stable so
            # relative order inside each block is preserved
            seen_by_new = np.isfinite(C[2 * self.n_adj :: 2]).any(axis=0)
            n_pts_fix = int(np.size(seen_by_new) - np.count_nonzero(seen_by_new))
            if n_pts_fix:
                perm = np.argsort(seen_by_new, kind="stable")
                C, C_v2 = C[:, perm], C_v2[:, perm]
        flush_print(
            "Found {} tracks in total".format(0 if C is None else C.shape[1])
        )
        return {
            "C": C,
            "C_v2": C_v2,
            "features": self.features,
            "pairwise_matches": self.pairwise_matches,
            "pairs_to_triangulate": self.pairs_to_triangulate,
            "pairs_to_match": self.pairs_to_match,
            "n_pts_fix": n_pts_fix,
        }

    def _save_portable_artifacts(self):
        """Persist the portable bundle consumed by
        loader.save_predefined_matches: filenames manifest, flat matches
        table, pair lists (reference writes these in the predefined loader,
        ft_utils.py:479-483)."""
        out = self.output_dir
        loader.save_list_of_paths(
            os.path.join(out, "filenames.txt"),
            [im.geotiff_path for im in self.images],
        )
        np.save(os.path.join(out, "matches.npy"), self.pairwise_matches)
        loader.save_list_of_pairs(
            os.path.join(out, "pairs_matching.npy"), self.pairs_to_match
        )
        loader.save_list_of_pairs(
            os.path.join(out, "pairs_triangulation.npy"), self.pairs_to_triangulate
        )

    def build_feature_tracks(self):
        """Run every stage of the tracking pipeline and return
        (feature_tracks dict, total wall seconds) — the reference's
        entry-point contract (ft_pipeline.py:197-261)."""
        from sat_bundleadjust_tpu.parallel.multihost import is_main_process

        print("Building feature tracks\n")
        print("Parameters:")
        loader.display_dict(self.config)

        clock = timeit.default_timer
        t_start = clock()

        def timed(label, fn):
            flush_print("\n[tracks] {}...".format(label))
            t0 = clock()
            out = fn()
            flush_print("[tracks] {}: {:.2f} s".format(label, clock() - t0))
            return out

        if self.n_adj == len(self.images):
            # nothing new to detect, but the cached npy paths still need
            # wiring up for the matching stage
            flush_print("\n[tracks] detection: all images already adjusted, using cached features")
            self.run_feature_detection()
        else:
            timed("feature detection", self.run_feature_detection)

        timed("pair selection", self.get_stereo_pairs_to_match)

        if len(self.pairs_to_match) > 0:
            timed("matching", self.run_feature_matching)
        else:
            self.pairwise_matches = np.zeros((0, 4), dtype=np.int64)
            flush_print("\n[tracks] matching: nothing to do (no pairs)")

        feature_tracks = timed("track construction", self.get_feature_tracks)
        if self.config.get("FT_save") and is_main_process():
            timed("portable artifacts", self._save_portable_artifacts)

        total = clock() - t_start
        flush_print(
            "\nFeature tracks computed in {}\n".format(
                loader.get_time_in_hours_mins_secs(total)
            )
        )
        return feature_tracks, total
