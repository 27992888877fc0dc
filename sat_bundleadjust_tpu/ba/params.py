"""Bundle adjustment parameterization.

Converts the pipeline-level problem description (correspondence matrix C,
initial tie points, camera models) into the flat observation table consumed
by the device solver, and back. Covers the reference's
bundle_adjust/ba_params.py (BundleAdjustmentParameters, :78-286).

Structural change vs the reference (deliberate, see SURVEY.md section 7):
the NaN-dense C matrix is kept only as the host-side bookkeeping structure;
the device-facing format is the flat observation table
(pts_ind, cam_ind, pts2d, weights) — which is exactly what the reference
itself derives from C at ba_params.py:139-149 — plus frozen-entity masks
instead of vector slicing.

Camera parameter layouts per model (= load_cam_params_from_camera,
reference: ba_params.py:19-44):
  rpc:         [euler(3), T(3), C(3)]                  (9)
  affine:      [euler(3), T(2), fx, fy, skew]          (8)
  perspective: [euler(3), T(3), fx, fy, skew, cx, cy]  (11)
"""

import numpy as np

from sat_bundleadjust_tpu.models import cameras as cam_utils
from sat_bundleadjust_tpu.models import rotations as ba_rotate
from sat_bundleadjust_tpu.models.rpc import RPCModel, stack_rpcs


class Error(Exception):
    pass


def load_cam_params_from_camera(camera, camera_center, cam_model):
    """Extract the per-camera parameter vector (reference: ba_params.py:19-44)."""
    if cam_model == "affine":
        K, R, vecT = cam_utils.decompose_affine_camera(camera)
        vecR = np.array(ba_rotate.euler_angles_from_R(R), dtype=np.float64)
        fx, fy, skew = K[0, 0], K[1, 1], K[0, 1]
        return np.hstack((vecR.ravel(), np.asarray(vecT).ravel(), fx, fy, skew))
    if cam_model == "perspective":
        K, R, vecT, _ = cam_utils.decompose_perspective_camera(camera)
        K = K / K[2, 2]
        vecR = np.array(ba_rotate.euler_angles_from_R(R), dtype=np.float64)
        fx, fy, skew, cx, cy = K[0, 0], K[1, 1], K[0, 1], K[0, 2], K[1, 2]
        return np.hstack((vecR.ravel(), np.asarray(vecT).ravel(), fx, fy, skew, cx, cy))
    # rpc: corrective transform starts at identity; camera center is constant
    return np.hstack((np.zeros(6), np.asarray(camera_center).ravel()))


def load_camera_from_cam_params(cam_params, cam_model):
    """Rebuild a camera model from its parameter vector
    (reference: ba_params.py:47-75)."""
    cam_params = np.asarray(cam_params)
    if cam_model == "affine":
        vecR, vecT = cam_params[0:3], cam_params[3:5]
        fx, fy, skew = cam_params[5], cam_params[6], cam_params[7]
        K = np.array([[fx, skew], [0, fy]])
        R = np.asarray(ba_rotate.euler_angles_to_R(*vecR.tolist()))
        P = cam_utils.compose_affine_camera(K, R, vecT)
        return P / P[2, 3]
    if cam_model == "perspective":
        vecR, vecT = cam_params[0:3], cam_params[3:6]
        fx, fy, skew = cam_params[6], cam_params[7], cam_params[8]
        cx, cy = cam_params[9], cam_params[10]
        K = np.array([[fx, skew, cx], [0, fy, cy], [0, 0, 1]])
        R = np.asarray(ba_rotate.euler_angles_to_R(*vecR.tolist()))
        P = K @ np.hstack((R, vecT.reshape(3, 1)))
        return P / P[2, 3]
    return cam_params.reshape(1, 9)


class BAParams:
    """The bundle adjustment problem state (reference:
    BundleAdjustmentParameters, ba_params.py:78-286).

    Args mirror the reference __init__ (ba_params.py:79-100):
      C: (2M, N) correspondence matrix
      pts3d: (N, 3) initial ECEF tie points
      cameras: list of M RPCModel (cam_model="rpc") or 3x4 matrices
      cam_model: "rpc" | "affine" | "perspective"
      pairs_to_triangulate: list of camera index pairs
      camera_centers: list of (3,) arrays
      d: optional dict with n_cam_fix, n_pts_fix, reduce, verbose,
         correction_params (subset of R/T/K/COMMON_K), ref_cam_weight
    """

    def __init__(self, C, pts3d, cameras, cam_model, pairs_to_triangulate, camera_centers, d=None):
        d = d or {}
        self.C = np.array(C, dtype=np.float64)
        self.pts3d = np.array(pts3d, dtype=np.float64)
        self.cameras = list(cameras)
        self.cam_model = cam_model
        self.pairs_to_triangulate = list(pairs_to_triangulate)
        self.camera_centers = [np.asarray(c) for c in camera_centers]

        self.cam_params_to_optimize = d.get("correction_params", ["R"])
        self.ref_cam_weight = float(d.get("ref_cam_weight", 1.0))
        self.n_cam_fix = int(d.get("n_cam_fix", 0))
        self.n_pts_fix = int(d.get("n_pts_fix", 0))
        self.verbose = bool(d.get("verbose", True))
        reduce = bool(d.get("reduce", True))

        self.n_cam, self.n_pts = self.C.shape[0] // 2, self.C.shape[1]
        self.n_cam_opt = self.n_cam - self.n_cam_fix
        self.n_pts_opt = self.n_pts - self.n_pts_fix
        self.cam_prev_indices = np.arange(self.n_cam)
        self.pts_prev_indices = np.arange(self.n_pts)
        if reduce:
            self._reduce()

        # per-camera parameter matrix (M, F)
        self.cam_params = np.array(
            [
                load_cam_params_from_camera(c, oC, cam_model)
                for c, oC in zip(self.cameras, self.camera_centers)
            ]
        )

        # flat observation table (sorted by point, the reference's own order
        # at ba_params.py:139-149)
        mask = ~np.isnan(self.C[::2, :])  # (M, N)
        # nonzero of mask.T yields (point_idx, cam_idx) pairs in point-major
        # order — the same ordering the reference builds at ba_params.py:139-149
        pt_idx, c_idx = np.nonzero(mask.T)
        self.pts_ind = pt_idx.astype(np.int32)
        self.cam_ind = c_idx.astype(np.int32)
        cols = self.C[2 * self.cam_ind, self.pts_ind]
        rows = self.C[2 * self.cam_ind + 1, self.pts_ind]
        self.pts2d = np.stack([cols, rows], axis=1)
        self.n_obs = self.pts2d.shape[0]

        # observation weights; camera 0 may be a weighted reference camera
        # (reference: ba_params.py:173-176)
        self.pts2d_w = np.ones(self.n_obs)
        if self.ref_cam_weight > 1.0:
            self.pts2d_w[self.cam_ind == 0] = self.ref_cam_weight

        self._set_param_layout()

        if self.verbose:
            print("\nDefining bundle adjustment parameters...")
            print("     - cam_params_to_optimize: {}".format(self.cam_params_to_optimize))
            print("{} 3d points, {} fixed and {} to be optimized".format(self.n_pts, self.n_pts_fix, self.n_pts_opt))
            print("{} cameras, {} fixed and {} to be optimized".format(self.n_cam, self.n_cam_fix, self.n_cam_opt))
            print("{} parameters to optimize per camera\n".format(self.n_params))

    # ------------------------------------------------------------------

    def _set_param_layout(self):
        """Parameter-vector layout, frozen-entity masks, batched RPC pytree
        and solver-output slots (reference: ba_params.py:151-176); shared by
        the C-matrix constructor and from_obs_table."""
        cam_model = self.cam_model
        # how many per-camera parameters are optimized
        # (reference: ba_params.py:151-171)
        n_params = 0
        self.n_params_k = 0
        if "R" in self.cam_params_to_optimize:
            n_params += 3
            if "T" in self.cam_params_to_optimize:
                n_params += 2 if cam_model == "affine" else 3
                if "K" in self.cam_params_to_optimize:
                    self.n_params_k = 3 if cam_model == "affine" else 5
                    n_params += self.n_params_k
        self.n_params = n_params
        # COMMON_K: one K shared by all cameras (reference:
        # ba_params.py:167-171 extracts camera 0's K as the shared block).
        # Here the K stays in each camera's parameter row, seeded from
        # camera 0 and kept equal by the solver's tied-tail projection
        # (ops/lm.LMConfig.tie_tail). Deviation: the reference broadcasts
        # the shared K onto FIXED cameras too and lets their observations
        # drive its gradient (ba_params.py:253-255); here frozen cameras
        # keep their own (identically seeded) K and do not contribute —
        # "fixed" stays fixed. Differs only when n_cam_fix > 0.
        self.common_k = (
            self.n_params_k > 0 and "COMMON_K" in self.cam_params_to_optimize
        )
        if self.common_k:
            k0, k1 = self.n_params - self.n_params_k, self.n_params
            self.cam_params[:, k0:k1] = self.cam_params[0, k0:k1]

        # frozen-entity masks (first n_cam_fix cameras / n_pts_fix points)
        self.cam_opt_mask = np.ones(self.n_cam)
        self.cam_opt_mask[: self.n_cam_fix] = 0.0
        self.pts_opt_mask = np.ones(self.n_pts)
        self.pts_opt_mask[: self.n_pts_fix] = 0.0

        # batched RPC pytree for the device path
        self.rpcs = stack_rpcs(self.cameras) if self.cam_model == "rpc" else None

        # filled by the solver
        self.pts3d_ba = None
        self.cameras_ba = None
        self.estimated_params = None

    @classmethod
    def from_obs_table(cls, pts_ind, cam_ind, pts2d, pts3d, cameras, cam_model,
                      camera_centers, pairs_to_triangulate=None, d=None):
        """Scalable construction from a flat observation table — no dense
        correspondence matrix is ever materialized.

        The C matrix is (2M, N) float64: 3.2 GB at the 1000-cam/200k-track
        config-#5 scale (the dominant term of bench_dist_scale's 13.1 GB
        host RSS) and quadratic in scene size, while the solvers only ever
        consume the flat (pts_ind, cam_ind, pts2d) table the reference
        itself converts C into (ba_params.py:139-149). The table is sorted
        to the C path's point-major (point, camera) order so both
        constructors yield identical problems. No _reduce pass runs:
        callers pass pre-filtered tables (every track observed >= once by
        an optimizable camera)."""
        self = cls.__new__(cls)
        d = d or {}
        self.C = None
        self.pts3d = np.array(pts3d, dtype=np.float64)
        self.cameras = list(cameras)
        self.cam_model = cam_model
        self.pairs_to_triangulate = list(pairs_to_triangulate or [])
        self.camera_centers = [np.asarray(c) for c in camera_centers]

        self.cam_params_to_optimize = d.get("correction_params", ["R"])
        self.ref_cam_weight = float(d.get("ref_cam_weight", 1.0))
        self.n_cam_fix = int(d.get("n_cam_fix", 0))
        self.n_pts_fix = int(d.get("n_pts_fix", 0))
        self.verbose = bool(d.get("verbose", False))

        self.n_cam = len(self.cameras)
        self.n_pts = int(self.pts3d.shape[0])
        self.n_cam_opt = self.n_cam - self.n_cam_fix
        self.n_pts_opt = self.n_pts - self.n_pts_fix
        self.cam_prev_indices = np.arange(self.n_cam)
        self.pts_prev_indices = np.arange(self.n_pts)

        self.cam_params = np.array(
            [
                load_cam_params_from_camera(c, oC, cam_model)
                for c, oC in zip(self.cameras, self.camera_centers)
            ]
        )

        order = np.lexsort((np.asarray(cam_ind), np.asarray(pts_ind)))
        self.pts_ind = np.asarray(pts_ind, np.int32)[order]
        self.cam_ind = np.asarray(cam_ind, np.int32)[order]
        self.pts2d = np.asarray(pts2d, np.float64)[order]
        self.n_obs = self.pts2d.shape[0]
        self.pts2d_w = np.ones(self.n_obs)
        if self.ref_cam_weight > 1.0:
            self.pts2d_w[self.cam_ind == 0] = self.ref_cam_weight

        self._set_param_layout()
        return self

    def _reduce(self):
        """Drop tracks with no observation in the cameras being optimized,
        then cameras left with 0 observations (reference: ba_params.py:183-219)."""
        C = self.C
        cols_where_obs = (
            np.sum(~np.isnan(C[::2, :])[-self.n_cam_opt :], axis=0).astype(bool)
            if self.n_cam_opt > 0
            else np.zeros(C.shape[1], dtype=bool)
        )
        self.pts_prev_indices = np.arange(self.n_pts)[cols_where_obs]
        self.n_pts_fix -= int(np.sum(~cols_where_obs[: self.n_pts_fix]))
        self.C = C[:, cols_where_obs].copy()
        self.pts3d = self.pts3d[self.pts_prev_indices, :].copy()

        obs_per_cam = np.sum(~np.isnan(self.C[::2]), axis=1)
        cams_to_keep = obs_per_cam > 0
        self.cam_prev_indices = np.arange(self.n_cam)[cams_to_keep]
        self.C = self.C[np.repeat(cams_to_keep, 2), :]
        old_n_cam_fix = self.n_cam_fix
        self.n_cam = int(self.C.shape[0] // 2)
        self.n_pts = int(self.C.shape[1])
        self.n_cam_fix -= int(np.sum(~cams_to_keep[:old_n_cam_fix]))
        self.n_cam_opt = self.n_cam - self.n_cam_fix
        self.n_pts_opt = self.n_pts - self.n_pts_fix
        self.cameras = [self.cameras[i] for i in self.cam_prev_indices]
        self.camera_centers = [self.camera_centers[i] for i in self.cam_prev_indices]

        new_idx = np.full(len(cams_to_keep), -1)
        new_idx[cams_to_keep] = np.arange(int(np.sum(cams_to_keep)))
        pairs = []
        for (a, b) in self.pairs_to_triangulate:
            if a < len(cams_to_keep) and b < len(cams_to_keep) and cams_to_keep[a] and cams_to_keep[b]:
                pairs.append((int(new_idx[a]), int(new_idx[b])))
        self.pairs_to_triangulate = pairs

    # ------------------------------------------------------------------

    def opt_block(self):
        """Initial optimized camera block (M, n_params)."""
        return self.cam_params[:, : self.n_params].copy()

    def full_cam_params(self, cam_opt):
        """Merge optimized prefix with the constant tail -> (M, F)."""
        return np.hstack([np.asarray(cam_opt), self.cam_params[:, self.n_params :]])

    def reconstruct_vars(self, cam_opt, pts3d_ba, pts3d_init, cameras_init):
        """Recover camera models and corrected points from the solution
        (reference: ba_params.py:259-286). Returns (corrected_pts3d,
        corrected_cameras) in the ORIGINAL (pre-reduce) indexing."""
        cam_params = self.full_cam_params(np.asarray(cam_opt))
        self.pts3d_ba = np.asarray(pts3d_ba)
        if self.cam_model == "rpc":
            self.cameras_ba = [cam_params[i].reshape(1, 9) for i in range(self.n_cam)]
        else:
            self.cameras_ba = [
                load_camera_from_cam_params(cam_params[i], self.cam_model)
                for i in range(self.n_cam)
            ]

        self.estimated_params = []
        for i in range(self.n_cam):
            est = {}
            if "R" in self.cam_params_to_optimize:
                est["R"] = cam_params[i, :3]
            if "T" in self.cam_params_to_optimize:
                est["T"] = cam_params[i, 3:6]
            if self.cam_model == "rpc":
                est["C"] = cam_params[i, 6:9]
            self.estimated_params.append(est)

        corrected_pts3d = np.array(pts3d_init, dtype=np.float64, copy=True)
        corrected_cameras = list(cameras_init)
        for ba_idx, prev_idx in enumerate(self.pts_prev_indices):
            corrected_pts3d[prev_idx] = self.pts3d_ba[ba_idx]
        for ba_idx, prev_idx in enumerate(self.cam_prev_indices):
            corrected_cameras[prev_idx] = self.cameras_ba[ba_idx]
        return corrected_pts3d, corrected_cameras
