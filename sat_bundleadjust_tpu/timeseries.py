"""Scene / time-series driver: loads geotiffs + RPCs, groups images into
acquisition dates and dispatches one of three BA modes
(sequential / global / bruteforce).

Covers the reference's bundle_adjust/ba_timeseries.py:28-551."""

import glob
import json
import os
import shutil
import sys
import timeit

import numpy as np

from sat_bundleadjust_tpu.models.cameras import SatelliteImage
from sat_bundleadjust_tpu.models.rpc import rpc_from_json_file, rpc_from_rpc_file
from sat_bundleadjust_tpu.pipeline import BundleAdjustmentPipeline
from sat_bundleadjust_tpu.utils import io as loader
from sat_bundleadjust_tpu.utils.config import init_feature_tracks_config
from sat_bundleadjust_tpu.utils.io import flush_print


class Error(Exception):
    pass


def get_acquisition_date(geotiff_path):
    """TIFFTAG_DATETIME, else a YYYYMMDD_HHMMSS filename prefix
    (reference: ba_timeseries.py:28-44)."""
    import datetime

    from sat_bundleadjust_tpu.utils import tiffmeta

    if os.path.exists(geotiff_path):
        dt = tiffmeta.datetime_from_tiff(geotiff_path)
        if dt is not None:
            return dt
    date_string = os.path.basename(geotiff_path)[:15]
    return datetime.datetime.strptime(date_string, "%Y%m%d_%H%M%S")


def group_files_by_date(datetimes, image_fnames, margin_mins=30.0):
    """Cluster images into acquisition groups by anchored time windows.

    Scanning in time order, an image joins the open group while it lies
    strictly within `margin_mins` of the group's FIRST image (the anchor);
    the first image at or past the margin opens a new group. This produces
    the same timeline as the reference's nearest-seen-date rule
    (ba_timeseries.py:47-101): on time-sorted input every existing anchor
    precedes the current image, so the nearest anchor is always the latest
    one and "join the nearest if < 30 min away" collapses to a window
    anchored at each group's first acquisition. The window boundaries are
    found with searchsorted on the offset vector instead of a per-image
    scan over all previous anchors."""
    order = np.argsort(datetimes, kind="stable")
    if len(order) == 0:
        return []
    # seconds since the earliest acquisition — timedelta arithmetic, so no
    # timezone/DST assumptions leak in via datetime.timestamp()
    t0 = datetimes[order[0]]
    offsets = np.array([(datetimes[i] - t0).total_seconds() for i in order])

    timeline = []
    start, n = 0, len(order)
    while start < n:
        end = int(np.searchsorted(offsets, offsets[start] + margin_mins * 60.0,
                                  side="left"))
        members = order[start:end]
        anchor = datetimes[members[0]]
        timeline.append(
            {
                "datetime": anchor,
                "id": anchor.strftime("%Y%m%d_%H%M%S"),
                "fnames": [image_fnames[i] for i in members],
                "n_images": len(members),
                "adjusted": False,
                "image_weights": [],
            }
        )
        start = end
    return timeline


class Scene:
    def __init__(self, scene_config):
        """Config keys identical to the reference (ba_timeseries.py:109-184):
        geotiff_dir, rpc_dir, rpc_src in {txt, json, geotiff}, output_dir,
        ba_method in {ba_bruteforce, ba_global, ba_sequential},
        timeline_indices, geotiff_label, n_dates, cam_model,
        correction_params, predefined_matches, fix_ref_cam, ref_cam_weight,
        clean_outliers, reset, remove_FT_files, aoi_geojson + FT_* keys."""
        t0 = timeit.default_timer()
        args = loader.load_dict_from_json(scene_config) if isinstance(scene_config, str) else dict(scene_config)

        self.geotiff_dir = args["geotiff_dir"]
        self.rpc_dir = args["rpc_dir"]
        self.rpc_src = args["rpc_src"]
        self.dst_dir = args["output_dir"]

        self.ba_method = args.get("ba_method", "ba_bruteforce")
        self.selected_timeline_indices = args.get("timeline_indices", None)
        self.geotiff_label = args.get("geotiff_label", None)
        self.n_dates = int(args.get("n_dates", 1))

        self.cam_model = args.get("cam_model", "rpc")
        self.correction_params = args.get("correction_params", ["R"])
        self.predefined_matches = args.get("predefined_matches", False)
        self.fix_ref_cam = args.get("fix_ref_cam", False)
        self.ref_cam_weight = float(args.get("ref_cam_weight", 1))
        self.clean_outliers = args.get("clean_outliers", True)
        self.reset = args.get("reset", True)
        self.remove_FT_files = args.get("remove_FT_files", False)
        self.save_figures = args.get("save_figures", True)
        # pipeline-level extras this framework exposes at the scene/CLI level
        # (the reference reads max_init_reproj_error only when the pipeline
        # is constructed directly, ba_pipeline.py:94; dem_path and
        # outlier_thr_rounding are additions of this framework)
        self.extra_ba_config = {
            k: args[k]
            for k in (
                "max_init_reproj_error",
                "outlier_thr_rounding",
                "dem_path",
                "distributed",  # mesh execution knob (docs/CONFIG.md)
            )
            if k in args
        }

        if not os.path.isdir(self.geotiff_dir):
            raise Error('geotiff_dir "{}" does not exist'.format(self.geotiff_dir))
        if not os.path.isdir(self.rpc_dir):
            raise Error('rpc_dir "{}" does not exist'.format(self.rpc_dir))
        for v in self.correction_params:
            if v not in ["R", "T", "K", "COMMON_K"]:
                raise Error("{} is not a valid camera parameter to optimize".format(v))

        os.makedirs(self.dst_dir, exist_ok=True)
        self.init_ba_input_data()

        self.tracks_config = init_feature_tracks_config()
        for k in list(self.tracks_config.keys()):
            if k in args:
                self.tracks_config[k] = args[k]
        # legacy key tolerated silently by the reference (tests use FT_max_kp)
        if "FT_max_kp" in args and "FT_kp_max" not in args:
            self.tracks_config["FT_kp_max"] = args["FT_max_kp"]

        self.aoi_lonlat = None
        self.timeline = self.load_scene()
        if "aoi_geojson" in args:
            self.aoi_lonlat = loader.load_geojson(args["aoi_geojson"])
            print("AOI geojson loaded from {}".format(args["aoi_geojson"]))
            loader.save_geojson("{}/AOI_init.json".format(self.dst_dir), self.aoi_lonlat)

        start_date = self.timeline[0]["datetime"].date()
        end_date = self.timeline[-1]["datetime"].date()
        print("Number of acquisition dates: {} (from {} to {})".format(len(self.timeline), start_date, end_date))
        print("Number of images: {}".format(int(np.sum([d["n_images"] for d in self.timeline]))))
        print("Scene loaded in {:.2f} seconds".format(timeit.default_timer() - t0))

    # ------------------------------------------------------------------

    def load_scene(self):
        """Reference: ba_timeseries.py:186-224. Also accepts scenes where
        only .rpc files exist (no rasters), as in the bundled test data."""
        all_fnames, all_rpcs, all_datetimes = [], [], []

        geotiff_paths = sorted(glob.glob(os.path.join(self.geotiff_dir, "**/*.tif"), recursive=True))
        if not geotiff_paths and self.rpc_src == "txt":
            # raster-less scene: derive virtual image entries from RPC files
            geotiff_paths = [
                p[: -len(".rpc")] + ".tif"
                for p in sorted(glob.glob(os.path.join(self.rpc_dir, "*.rpc")))
            ]
        if self.geotiff_label is not None:
            geotiff_paths = [fn for fn in geotiff_paths if self.geotiff_label in fn]

        for tif_fname in geotiff_paths:
            f_id = loader.get_id(tif_fname)
            if self.rpc_src == "geotiff":
                rpc = loader.rpc_from_geotiff(tif_fname)
            elif self.rpc_src == "json":
                rpc = rpc_from_json_file(os.path.join(self.rpc_dir, f_id + ".json"))
            elif self.rpc_src == "txt":
                rpc = rpc_from_rpc_file(os.path.join(self.rpc_dir, f_id + ".rpc"))
            else:
                raise ValueError("Unknown rpc_src value: {}".format(self.rpc_src))
            all_fnames.append(tif_fname)
            all_rpcs.append(rpc)
            all_datetimes.append(get_acquisition_date(tif_fname))

        init_rpcs_dir = os.path.join(self.dst_dir, "rpcs_init")
        rpc_fnames = ["{}/{}.rpc".format(init_rpcs_dir, loader.get_id(fn)) for fn in all_fnames]
        from sat_bundleadjust_tpu.parallel import multihost

        if multihost.is_main_process():
            loader.save_rpcs(rpc_fnames, all_rpcs)
        multihost.barrier("rpcs_init")

        return group_files_by_date(all_datetimes, all_fnames)

    def get_timeline_attributes(self, timeline_indices, attributes):
        """Reference: ba_timeseries.py:226-268 (compact version)."""
        for idx in timeline_indices:
            row = ["{}".format(self.timeline[idx][a]) for a in attributes]
            print("  {} | {}".format(idx, " | ".join(row)))

    # ------------------------------------------------------------------

    def init_ba_input_data(self):
        self.n_adj = 0
        self.images_adj = []
        self.images_new = []

    def check_adjusted_dates(self, input_dir, t_idx):
        """Reference: ba_timeseries.py:270-292."""
        found = False
        dir_adj = os.path.join(input_dir, "rpcs_adj")
        if os.path.isdir(dir_adj):
            adj_fnames = []
            for adj_id in [loader.get_id(p) for p in glob.glob(dir_adj + "/*.rpc_adj")]:
                hits = glob.glob(os.path.join(self.geotiff_dir, "**/" + adj_id + ".tif"), recursive=True)
                if not hits:
                    # raster-less scenes: reconstruct the virtual path
                    candidate = os.path.join(self.geotiff_dir, adj_id + ".tif")
                    hits = [candidate]
                adj_fnames.extend(hits)
            print("Found {} previously adjusted images in {}\n".format(len(adj_fnames), self.dst_dir))
            datetimes_adj = [get_acquisition_date(p) for p in adj_fnames]
            timeline_adj = group_files_by_date(datetimes_adj, adj_fnames)
            for d in timeline_adj:
                for idx in range(len(self.timeline)):
                    if self.timeline[idx]["id"] == d["id"] and idx < t_idx:
                        self.timeline[idx]["adjusted"] = True
                        found = True
        if not found:
            print("No previously adjusted data was found in {}\n".format(self.dst_dir))
        return found

    def load_data_from_dates(self, timeline_indices, input_dir, adjusted=False):
        """Reference: ba_timeseries.py:294-317."""
        im_fnames = []
        for t_idx in timeline_indices:
            im_fnames.extend(self.timeline[t_idx]["fnames"])
        flush_print("{} {} images for bundle adjustment !".format(len(im_fnames), "adjusted" if adjusted else "new"))

        images = []
        if im_fnames:
            rpc_dir = os.path.join(input_dir, "rpcs_adj") if adjusted else os.path.join(self.dst_dir, "rpcs_init")
            extension = "rpc_adj" if adjusted else "rpc"
            rpcs = loader.load_rpcs_from_dir(im_fnames, rpc_dir, extension=extension, verbose=True)
            for fn, rpc in zip(im_fnames, rpcs):
                images.append(SatelliteImage(fn, rpc))
        if adjusted:
            self.n_adj += len(im_fnames)
            self.images_adj.extend(images)
        else:
            self.images_new.extend(images)

    def load_prev_adjusted_dates(self, t_idx, input_dir, previous_dates=1):
        """Reference: ba_timeseries.py:319-331."""
        found = self.check_adjusted_dates(input_dir, t_idx)
        if found:
            prev = [i for i, d in enumerate(self.timeline) if d["adjusted"]]
            closest = sorted(prev, key=lambda x: abs(x - t_idx))[:previous_dates]
            self.load_data_from_dates(closest, input_dir, adjusted=True)

    def set_ba_input_data(self, t_indices, input_dir, output_dir, previous_dates):
        """Reference: ba_timeseries.py:338-353."""
        print("\nSetting bundle adjustment input data...\n")
        self.init_ba_input_data()
        if previous_dates > 0:
            self.load_prev_adjusted_dates(min(t_indices), input_dir, previous_dates=previous_dates)
        self.load_data_from_dates(t_indices, input_dir)
        self.ba_data = {
            "in_dir": input_dir,
            "out_dir": output_dir,
            "images": self.images_adj + self.images_new,
        }

    # ------------------------------------------------------------------

    def bundle_adjust(self):
        """Reference: ba_timeseries.py:355-382."""
        t0 = timeit.default_timer()
        extra = {
            "cam_model": self.cam_model,
            "n_adj": self.n_adj,
            "correction_params": self.correction_params,
            "predefined_matches": self.predefined_matches,
            "fix_ref_cam": self.fix_ref_cam,
            "ref_cam_weight": self.ref_cam_weight,
            "clean_outliers": self.clean_outliers,
            "save_figures": self.save_figures,
        }
        extra.update(self.extra_ba_config)
        if self.aoi_lonlat is not None:
            extra["aoi"] = self.aoi_lonlat
        self.ba_pipeline = BundleAdjustmentPipeline(self.ba_data, self.tracks_config, extra)
        self.ba_pipeline.run()

        n_tracks = self.ba_pipeline.ba_params.pts3d_ba.shape[0]
        elapsed = timeit.default_timer() - t0
        ba_e = float(np.mean(self.ba_pipeline.ba_e))
        init_e = float(np.mean(self.ba_pipeline.init_e))
        return elapsed, self.ba_pipeline.feature_tracks_running_time, n_tracks, ba_e, init_e

    def rm_tmp_files_after_ba(self):
        from sat_bundleadjust_tpu.parallel import multihost

        if multihost.is_main_process():
            shutil.rmtree("{}/{}/matches".format(self.dst_dir, self.ba_method), ignore_errors=True)
        multihost.barrier("rm_tmp_files")

    def reset_ba_params(self):
        """Reference: ba_timeseries.py:387-392."""
        from sat_bundleadjust_tpu.parallel import multihost

        ba_dir = "{}/{}".format(self.dst_dir, self.ba_method)
        if multihost.is_main_process() and os.path.exists(ba_dir):
            shutil.rmtree(ba_dir)
        multihost.barrier("reset_ba_params")
        for t in self.timeline:
            t["adjusted"] = False

    def run_sequential_bundle_adjustment(self):
        """Reference: ba_timeseries.py:394-437."""
        ba_dir = os.path.join(self.dst_dir, self.ba_method)
        os.makedirs(ba_dir, exist_ok=True)
        self.tracks_config["FT_predefined_pairs"] = []

        stats = {"time": [], "time_FT": [], "tracks": [], "init_e": [], "ba_e": [], "iters": []}
        fix_ref_cam_initial = self.fix_ref_cam
        for idx, t_idx in enumerate(self.selected_timeline_indices):
            self.set_ba_input_data([t_idx], ba_dir, ba_dir, self.n_dates)
            self.fix_ref_cam = fix_ref_cam_initial and (idx == 0 or self.n_dates == 0)
            running_time, time_FT, n_tracks, ba_e, _ = self.bundle_adjust()
            from sat_bundleadjust_tpu.parallel import multihost

            if multihost.is_main_process():
                pts_out = "{}/pts3d_adj/{}_pts3d_adj.ply".format(ba_dir, self.timeline[t_idx]["id"])
                os.makedirs(os.path.dirname(pts_out), exist_ok=True)
                shutil.copyfile(ba_dir + "/pts3d_adj.ply", pts_out)

            init_e, _ = self.compute_reprojection_error_before_and_after_bundle_adjust()
            for k, v in zip(
                ["time", "time_FT", "tracks", "init_e", "ba_e", "iters"],
                [running_time, time_FT, n_tracks, init_e, ba_e, self.ba_pipeline.ba_iters],
            ):
                stats[k].append(v)
            flush_print(
                "({}/{}) {} adjusted in {:.2f} seconds, {} ({:.3f}, {:.3f})".format(
                    idx + 1, len(self.selected_timeline_indices), self.timeline[t_idx]["datetime"],
                    running_time, n_tracks, init_e, ba_e,
                )
            )
        self.fix_ref_cam = fix_ref_cam_initial
        if self.remove_FT_files:
            self.rm_tmp_files_after_ba()
        flush_print(
            "All dates adjusted in {:.2f} seconds, mean reproj: ({:.3f}, {:.3f})".format(
                sum(stats["time"]), float(np.mean(stats["init_e"])), float(np.mean(stats["ba_e"]))
            )
        )
        flush_print("Average BA iterations per date: {}".format(int(np.ceil(np.mean(stats["iters"])))))

    def run_global_bundle_adjustment(self):
        """Reference: ba_timeseries.py:439-459."""
        ba_dir = os.path.join(self.dst_dir, self.ba_method)
        os.makedirs(ba_dir, exist_ok=True)
        self.tracks_config["FT_predefined_pairs"] = load_pairs_from_same_date_and_next_dates(
            self.timeline, self.selected_timeline_indices, self.n_dates
        )
        self.set_ba_input_data(self.selected_timeline_indices, ba_dir, ba_dir, 0)
        running_time, time_FT, n_tracks, ba_e, init_e = self.bundle_adjust()
        if self.remove_FT_files:
            self.rm_tmp_files_after_ba()
        flush_print(
            "All dates adjusted in {:.2f} seconds, {} ({:.3f}, {:.3f})".format(
                running_time, n_tracks, init_e, ba_e
            )
        )
        flush_print("Total BA iterations: {}".format(int(self.ba_pipeline.ba_iters)))

    def run_bruteforce_bundle_adjustment(self):
        """Reference: ba_timeseries.py:461-477."""
        ba_dir = os.path.join(self.dst_dir, self.ba_method)
        os.makedirs(ba_dir, exist_ok=True)
        self.tracks_config["FT_predefined_pairs"] = []
        self.set_ba_input_data(self.selected_timeline_indices, ba_dir, ba_dir, 0)
        running_time, time_FT, n_tracks, ba_e, init_e = self.bundle_adjust()
        if self.remove_FT_files:
            self.rm_tmp_files_after_ba()
        flush_print(
            "All dates adjusted in {:.2f} seconds, {} ({:.3f}, {:.3f})".format(
                running_time, n_tracks, init_e, ba_e
            )
        )
        flush_print("Total BA iterations: {}".format(int(self.ba_pipeline.ba_iters)))

    def is_ba_method_valid(self, ba_method):
        return ba_method in ["ba_global", "ba_sequential", "ba_bruteforce"]

    def compute_reprojection_error_before_and_after_bundle_adjust(self):
        """Triangulate + reproject with initial and adjusted RPCs
        (reference: ba_timeseries.py:482-514)."""
        from sat_bundleadjust_tpu.models.cameras import apply_rpc_projection_np
        from sat_bundleadjust_tpu.ops.triangulate import init_pts3d

        im_fnames = [im.geotiff_path for im in self.ba_pipeline.images]
        C = self.ba_pipeline.ba_params.C
        pairs = self.ba_pipeline.ba_params.pairs_to_triangulate

        rpcs_init = loader.load_rpcs_from_dir(
            im_fnames, os.path.join(self.dst_dir, "rpcs_init"), extension="rpc", verbose=False
        )
        rpcs_ba = loader.load_rpcs_from_dir(
            im_fnames, os.path.join(self.dst_dir, self.ba_method, "rpcs_adj"),
            extension="rpc_adj", verbose=False,
        )
        pts3d_before = init_pts3d(C, rpcs_init, "rpc", pairs)
        pts3d_after = init_pts3d(C, rpcs_ba, "rpc", pairs)

        n_cam = C.shape[0] // 2
        err_before, err_after = [], []
        for cam_idx in range(n_cam):
            sel = np.where(~np.isnan(C[2 * cam_idx]))[0]
            obs2d = C[(cam_idx * 2) : (cam_idx * 2 + 2), sel].T
            proj_b = apply_rpc_projection_np(rpcs_init[cam_idx], pts3d_before[sel])
            proj_a = apply_rpc_projection_np(rpcs_ba[cam_idx], pts3d_after[sel])
            err_before.extend(np.linalg.norm(proj_b - obs2d, axis=1).tolist())
            err_after.extend(np.linalg.norm(proj_a - obs2d, axis=1).tolist())
        return float(np.mean(err_before)), float(np.mean(err_after))

    def run_bundle_adjustment_for_RPC_refinement(self):
        """Reference: ba_timeseries.py:516-551."""
        if self.selected_timeline_indices is None:
            self.selected_timeline_indices = list(range(len(self.timeline)))
            flush_print("All dates selected to bundle adjust!\n")
        else:
            flush_print(
                "Found {} selected dates to bundle adjust! timeline_indices: {}\n".format(
                    len(self.selected_timeline_indices), self.selected_timeline_indices
                )
            )
        for idx, t_idx in enumerate(self.selected_timeline_indices):
            flush_print(
                "({}) {} --> {} views".format(
                    idx + 1, self.timeline[t_idx]["datetime"], self.timeline[t_idx]["n_images"]
                )
            )
        if self.reset:
            self.reset_ba_params()

        if self.ba_method == "ba_sequential":
            flush_print("\nRunning sequential bundle adjustment !")
            flush_print("Each date aligned with {} previous date(s)\n".format(self.n_dates))
            self.run_sequential_bundle_adjustment()
        elif self.ba_method == "ba_global":
            flush_print("\nRunning global bundle adjustment !")
            flush_print("Track pairs restricted to the same date and the next {} dates\n".format(self.n_dates))
            self.run_global_bundle_adjustment()
        elif self.ba_method == "ba_bruteforce":
            flush_print("\nRunning bruteforce bundle adjustment !")
            self.run_bruteforce_bundle_adjustment()
        else:
            print("ba_method {} is not valid !".format(self.ba_method))
            print("accepted values are: [ba_sequential, ba_global, ba_bruteforce]")
            sys.exit()


def load_pairs_from_same_date_and_next_dates(timeline, timeline_indices, next_dates=1):
    """Image pairs restricted to intra-date plus the next N dates
    (reference: ba_utils.load_pairs_from_same_date_and_next_dates,
    ba_utils.py:236-266)."""
    timeline_indices = [int(i) for i in timeline_indices]
    n_dates = len(timeline_indices)
    # global index of each image within the concatenated sequence
    init_pairs = []
    offsets = []
    acc = 0
    for t_idx in timeline_indices:
        offsets.append(acc)
        acc += timeline[t_idx]["n_images"]
    for k, t_idx in enumerate(timeline_indices):
        n_img = timeline[t_idx]["n_images"]
        # intra-date pairs
        for i in range(n_img):
            for j in range(i + 1, n_img):
                init_pairs.append((offsets[k] + i, offsets[k] + j))
        # pairs with the next `next_dates` dates
        for dk in range(1, next_dates + 1):
            if k + dk >= n_dates:
                continue
            n_img2 = timeline[timeline_indices[k + dk]]["n_images"]
            for i in range(n_img):
                for j in range(n_img2):
                    init_pairs.append((offsets[k] + i, offsets[k + dk] + j))
    return init_pairs
