"""Pairwise matching orchestration over stereo pairs.

Covers the reference's feature_tracks/ft_match.py:76-393: restriction of
the candidate keypoints to the UTM intersection polygon of the two
footprints, the 2-NN + RANSAC matching itself (here the MXU kernel of
ops/match.py instead of the native sift4ctypes matcher), the UTM
geo-consistency elbow filter, and the npy match caching protocol.

Parallelism note: the reference fans pairs out over multiprocessing.Pool /
ray workers (ft_match.py:342-393). Here, on a single TPU chip ALL
uncached pairs run through ONE batched kernel dispatch + one packed fetch
(ops/match.match_pairs_2nn_batched — per-pair dispatches cost ~100 ms of
tunnel round trips each); with more than one device match_stereo_pairs
shards the pair list over the mesh instead
(parallel/feature_shard.match_pairs_mesh: one pair per device per
dispatch). Host-side RANSAC/elbow finalize runs on the survivors in both
paths."""

import os
import time

import numpy as np

from sat_bundleadjust_tpu.ops.match import match_pair
from sat_bundleadjust_tpu.utils import geo as geo_utils
from sat_bundleadjust_tpu.utils.io import get_id

# SATBA_MATCH_TIMING=1 prints a per-stage wall breakdown of
# match_stereo_pairs (cache/bbox prep, device 2-NN, host finalize,
# assembly) — the tool that decomposed the matching stage at the
# 1350-pair scale runs (BENCHMARKS.md).
_TIMING_ON = os.environ.get("SATBA_MATCH_TIMING", "0") == "1"

# process-unique prefix for in-memory feature tokens (see fid in
# match_stereo_pairs)
import uuid as _uuid

_MEM_TOKEN_SESSION = _uuid.uuid4().hex[:8]


class _FrameCache:
    """Budget-bounded LRU of DECODED per-frame arrays (features / UTM
    coords). The round-4 config-#4 profile charged 75.1 s of the matching
    wall to re-reading + fancy-indexing each frame's npy once per pair
    (~27x per frame at 1350 pairs, tracks/matching.py pass 1); decoding
    each frame once and slicing in memory removes that tax. Budget via
    SATBA_FEATURE_CACHE_MB (default 4096); eviction is LRU, which matches
    the i-grouped order of real pair lists."""

    def __init__(self, budget_mb=None):
        from collections import OrderedDict

        if budget_mb is None:
            budget_mb = int(os.environ.get("SATBA_FEATURE_CACHE_MB", 4096))
        self.budget = budget_mb * (1 << 20)
        self.entries = OrderedDict()
        self.bytes = 0

    def get(self, key, source):
        if key in self.entries:
            self.entries.move_to_end(key)
            return self.entries[key]
        arr = np.load(source) if isinstance(source, str) else np.asarray(source)
        self.entries[key] = arr
        self.bytes += arr.nbytes
        while self.bytes > self.budget and len(self.entries) > 1:
            _, old = self.entries.popitem(last=False)
            self.bytes -= old.nbytes
        return arr


def _guard_mem_token(npy_name):
    """In-memory feature tokens are session-local and must never be
    persisted: a cache file named after one would produce stale false
    hits in a later session."""
    if npy_name.startswith("mem-"):
        raise RuntimeError(
            "refusing to persist a session-local in-memory match id "
            "({}); pass FT_save=True only with on-disk features".format(npy_name)
        )
    return npy_name


def keypoints_to_utm_coords(im_features, im_rpc, im_offset, alt):
    """Approximate (east, north) of each keypoint by localization at the
    footprint altitude (reference: ft_match.py:190-217). Host-side numpy
    (the vectorized Newton localization handles 1e5 keypoints in ~100 ms)."""
    im_features = np.asarray(im_features)
    n_kp = int(np.sum(~np.isnan(im_features[:, 0])))
    cols = im_features[:n_kp, 0] + im_offset["col0"]
    rows = im_features[:n_kp, 1] + im_offset["row0"]
    alts = np.full(n_kp, float(alt))
    lon, lat = im_rpc.localization(cols, rows, alts)
    east, north = geo_utils.utm_from_lonlat(np.asarray(lon), np.asarray(lat))
    utm = np.stack((east, north), axis=1)
    rest = im_features[n_kp:, :2].copy()
    return np.vstack((utm, rest))


def get_pt_indices_inside_utm_bbx(easts, norths, min_east, max_east, min_north, max_north):
    """Reference: ft_match.py:76-90."""
    east_ok = (easts > min_east) & (easts < max_east)
    north_ok = (norths > min_north) & (norths < max_north)
    return np.where(east_ok & north_ok)[0]


def filter_matches_inconsistent_utm_coords(matches_ij, utm_i, utm_j):
    """Elbow filter on the distances between matched geo-coordinates
    (reference: ft_match.py:220-247)."""
    from sat_bundleadjust_tpu.ba.outliers import get_elbow_value

    pt_i = utm_i[matches_ij[:, 0]]
    pt_j = utm_j[matches_ij[:, 1]]
    d = np.linalg.norm(pt_i - pt_j, axis=1)
    utm_thr, success = get_elbow_value(d, max_outliers_percent=20)
    utm_thr = utm_thr + 5 if success else np.max(d)
    return matches_ij[d <= utm_thr]


def match_kp_within_utm_polygon(features_i, features_j, utm_i, utm_j, utm_polygon,
                                tracks_config, F=None):
    """Match keypoints restricted to the UTM intersection polygon's bbox
    (reference: ft_match.py:93-187).

    features_* and utm_* may be arrays or .npy paths."""
    load = lambda x: np.load(x, mmap_mode="r") if isinstance(x, str) else np.asarray(x)
    features_i, features_j = load(features_i), load(features_j)
    utm_i, utm_j = load(utm_i), load(utm_j)

    east_poly = utm_polygon.coords[:, 0]
    north_poly = utm_polygon.coords[:, 1]
    idx_i = get_pt_indices_inside_utm_bbx(
        utm_i[:, 0], utm_i[:, 1], east_poly.min(), east_poly.max(), north_poly.min(), north_poly.max()
    )
    idx_j = get_pt_indices_inside_utm_bbx(
        utm_j[:, 0], utm_j[:, 1], east_poly.min(), east_poly.max(), north_poly.min(), north_poly.max()
    )
    if len(idx_i) == 0 or len(idx_j) == 0:
        return None, [0, 0, 0]

    fi, fj = np.asarray(features_i[idx_i]), np.asarray(features_j[idx_j])
    method_cfg = tracks_config["FT_sift_matching"]
    if method_cfg == "epipolar_based":
        matches_poly, n_ratio, n_ransac = match_pair(
            fi, fj, F=F,
            rel_thr=tracks_config["FT_rel_thr"],
            ransac_thr=tracks_config["FT_ransac"],
            method="relative",
        )
        n = [n_ransac]
    elif method_cfg in ("bruteforce", "flann"):
        # pure descriptor matching without epipolar gating (reference's
        # OpenCV path, ft_opencv.py:94-140)
        matches_poly, n_ratio, n_ransac = match_pair(
            fi, fj, F=None,
            rel_thr=tracks_config["FT_rel_thr"],
            ransac_thr=tracks_config["FT_ransac"],
            method="relative",
        )
        n = [n_ratio, n_ransac]
    elif method_cfg == "absolute":
        matches_poly, n_ratio, n_ransac = match_pair(
            fi, fj, F=F,
            abs_thr=tracks_config["FT_abs_thr"],
            ransac_thr=tracks_config["FT_ransac"],
            method="absolute",
        )
        n = [n_ratio, n_ransac]
    elif method_cfg == "lightglue":
        # optional torch LightGlue backend (tracks/lightglue.py; reference:
        # ft_match.py:492-558) — raises a clean ImportError with install
        # instructions when the lightglue package is absent
        from sat_bundleadjust_tpu.tracks.lightglue import lightglue_matching

        matches_poly, n_matches, n_final = lightglue_matching(
            fi, fj, ransac_thr=tracks_config["FT_ransac"]
        )
        n = [n_matches, n_final]
    elif method_cfg == "local_window":
        # the reference's local-window matcher depends on an imscript
        # binary (siftu.so) that is not shipped with it either
        # (ft_match.py:406-409)
        raise NotImplementedError(
            "FT_sift_matching='local_window' requires the imscript siftu "
            "binary, which the reference does not ship; use "
            "'epipolar_based' or 'bruteforce'"
        )
    else:
        raise ValueError("unknown FT_sift_matching: {}".format(method_cfg))

    if matches_poly is None:
        matches_ij = None
    else:
        matches_ij = np.stack(
            [idx_i[matches_poly[:, 0]], idx_j[matches_poly[:, 1]]], axis=1
        )

    n_init = 0 if matches_ij is None else matches_ij.shape[0]
    if n_init > 0:
        matches_ij = filter_matches_inconsistent_utm_coords(matches_ij, utm_i, utm_j)
        n.append(0 if matches_ij is None else matches_ij.shape[0])
    else:
        n.append(0)
    return matches_ij, n


def init_F_pair_to_match(h, w, rpc_i, rpc_j):
    """Affine fundamental matrix from a 5^3 grid of RPC virtual matches
    (reference: ft_pipeline.py:139-145 + s2p/rpc_utils.matches_from_rpc
    :226-246 + s2p/estimation.affine_fundamental_matrix :114-154)."""
    import jax.numpy as jnp

    # virtual matches over the altitude validity range
    n = 5
    m = float(np.asarray(rpc_i.alt_offset)) - float(np.asarray(rpc_i.alt_scale))
    M = float(np.asarray(rpc_i.alt_offset)) + float(np.asarray(rpc_i.alt_scale))
    from sat_bundleadjust_tpu.models.cameras import generate_point_mesh

    col_range = [(1.0 / (2 * n)) * w, ((2 * n - 1.0) / (2 * n)) * w, n]
    row_range = [(1.0 / (2 * n)) * h, ((2 * n - 1.0) / (2 * n)) * h, n]
    from sat_bundleadjust_tpu.utils.hostdev import small_compute

    cols, rows, alts = generate_point_mesh(col_range, row_range, [m, M, n])
    with small_compute():
        lons, lats = rpc_i.localization(jnp.asarray(cols), jnp.asarray(rows), jnp.asarray(alts))
        x1, y1 = rpc_i.projection(lons, lats, jnp.asarray(alts))
        x2, y2 = rpc_j.projection(lons, lats, jnp.asarray(alts))
    matches = np.vstack([np.asarray(x1), np.asarray(y1), np.asarray(x2), np.asarray(y2)]).T
    return affine_fundamental_matrix(matches)


def init_F_pairs_batched(pairs_to_match, images):
    """Affine fundamental matrices for every pair, host-side and batched.

    History of this stage at the 1350-pair config-#4 scale: the round-1
    per-pair init_F_pair_to_match device loop cost ~0.3-0.5 s of dispatch
    overhead per pair (~8 minutes); the rounds-3/4 batched device version
    still measured 47 s WARM (tunneled-device call overheads on ~30
    stacked f64 pytree operands — not compute: the whole job is 125
    virtual-match points per unique image). Round 5 moved it onto the
    numpy twins of the RPC chain: localization once per unique FIRST
    image, one per-pair second projection, one batched SVD — well under a
    second end to end. Reference counterpart: ft_pipeline.py:139-152 +
    s2p/rpc_utils.matches_from_rpc (5^3 grids) +
    s2p/estimation.affine_fundamental_matrix."""
    from sat_bundleadjust_tpu.models.cameras import generate_point_mesh

    n = 5
    P = len(pairs_to_match)
    if P == 0:
        return []
    # virtual-match grids depend only on the FIRST image of the pair:
    # compute one per unique image, not per pair (the per-pair loop of the
    # round-3 version spent ~0.08 s/pair on repeated mesh builds + device
    # scalar fetches — 108 s at the 1350-pair config-#4 scale)
    mesh_of = {}
    for i in {i for (i, _) in pairs_to_match}:
        h = images[i].offset["height"]
        w = images[i].offset["width"]
        alt_off = float(np.asarray(images[i].rpc.alt_offset))
        alt_sc = float(np.asarray(images[i].rpc.alt_scale))
        mesh_of[i] = generate_point_mesh(
            [(1.0 / (2 * n)) * w, ((2 * n - 1.0) / (2 * n)) * w, n],
            [(1.0 / (2 * n)) * h, ((2 * n - 1.0) / (2 * n)) * h, n],
            [alt_off - alt_sc, alt_off + alt_sc, n],
        )
    # the virtual-match geometry is tiny (125 points per unique image) and
    # runs entirely through the numpy twins: the vmapped device version of
    # rounds 3-4 measured 47 s WARM at 1350 pairs on the tunneled chip
    # (dominated by device-call overheads on ~30 stacked f64 pytree
    # operands, not compute), where the host twins take well under a
    # second. Localization depends only on the pair's FIRST image, so it
    # runs once per unique image; only the second projection is per-pair.
    from sat_bundleadjust_tpu.models.rpc import rpc_localization_np, rpc_projection_np

    geom_of = {}
    for i, (c, r, a) in mesh_of.items():
        lon, lat = rpc_localization_np(images[i].rpc, c, r, a)
        px, py = rpc_projection_np(images[i].rpc, lon, lat, a)
        geom_of[i] = (lon, lat, a, px, py)
    x1 = np.stack([geom_of[i][3] for (i, _) in pairs_to_match])
    y1 = np.stack([geom_of[i][4] for (i, _) in pairs_to_match])
    x2 = np.empty_like(x1)
    y2 = np.empty_like(y1)
    for k, (i, j) in enumerate(pairs_to_match):
        lon, lat, a, _, _ = geom_of[i]
        x2[k], y2[k] = rpc_projection_np(images[j].rpc, lon, lat, a)
    # Gold Standard affine F per pair, batched: one (P, 125, 4) SVD call
    # instead of P sequential host SVDs
    X = np.stack([x2, y2, x1, y1], axis=2)  # (P, 125, 4), reference col order
    XX = X.mean(axis=1)  # (P, 4)
    _, _, V = np.linalg.svd(X - XX[:, None, :])
    Nv = V[:, -1, :]  # (P, 4)
    Fs = np.zeros((P, 3, 3))
    Fs[:, 0, 2] = Nv[:, 0]
    Fs[:, 1, 2] = Nv[:, 1]
    Fs[:, 2, 0] = Nv[:, 2]
    Fs[:, 2, 1] = Nv[:, 3]
    Fs[:, 2, 2] = -np.einsum("pk,pk->p", Nv, XX)
    return list(Fs)


def affine_fundamental_matrix(matches):
    """Gold Standard affine F (reference: s2p/estimation.py:114-154)."""
    X = matches[:, [2, 3, 0, 1]]
    N = len(X)
    XX = np.sum(X, axis=0) / N
    A = X - np.tile(XX, (N, 1))
    _, _, V = np.linalg.svd(A)
    Nv = V[-1, :]
    F = np.zeros((3, 3))
    F[0, 2] = Nv[0]
    F[1, 2] = Nv[1]
    F[2, 0] = Nv[2]
    F[2, 1] = Nv[3]
    F[2, 2] = -np.dot(Nv, XX)
    return F


def _finalize_pair_from_nn(fi, fj, idx_i, idx_j, nn_idx, accepted, utm_i, utm_j,
                           tracks_config):
    """Host-side finalize shared with the mesh path: RANSAC geometric
    filter on the accepted 2-NN matches, index remap to the full keypoint
    arrays, then the UTM-consistency elbow filter."""
    from sat_bundleadjust_tpu.ops.match import _finalize_matches

    matches_poly, n_ratio, n_ransac = _finalize_matches(
        fi, fj, np.asarray(nn_idx), np.asarray(accepted), tracks_config["FT_ransac"]
    )
    if matches_poly is None:
        return None
    matches_ij = np.stack(
        [idx_i[matches_poly[:, 0]], idx_j[matches_poly[:, 1]]], axis=1
    )
    if matches_ij.shape[0] > 0:
        matches_ij = filter_matches_inconsistent_utm_coords(matches_ij, utm_i, utm_j)
    return matches_ij


_FINALIZE_TIMING = {}


def _finalize_pairs_from_nn_batched(items, nn_results, tracks_config):
    """Batched finalize of many pairs: identical semantics to
    _finalize_pair_from_nn per pair, but the RANSAC runs vectorized
    across ALL pairs (ops/ransac.ransac_fundamental_many) — the per-pair
    loop cost 223 s at the 1350-pair scale run (BENCHMARKS.md round 3).

    items: list of (idx, fi, fj, idx_i, idx_j, utm_i, utm_j) tuples;
    nn_results: list of (nn_idx, accepted). Returns a list of matches_ij
    arrays (or None), aligned with items."""
    from sat_bundleadjust_tpu.ops.ransac import MIN_SAMPLES, ransac_fundamental_many

    thr = tracks_config["FT_ransac"]
    t0 = time.time()
    prelim = []
    pts1_list, pts2_list, ransac_pos = [], [], []
    for pos, ((_idx, fi, fj, *_rest), (nn, acc)) in enumerate(zip(items, nn_results)):
        ii = np.where(np.asarray(acc))[0]
        m = np.stack([ii, np.asarray(nn)[ii]], axis=1).astype(np.int64)
        prelim.append(m if m.shape[0] > 0 else None)
        if thr is not None and m.shape[0] >= MIN_SAMPLES:
            pts1_list.append(fi[m[:, 0], :2])
            pts2_list.append(fj[m[:, 1], :2])
            ransac_pos.append(pos)
    _FINALIZE_TIMING["collect_s"] = _FINALIZE_TIMING.get("collect_s", 0.0) + time.time() - t0

    t0 = time.time()
    if pts1_list:
        for pos, (_F, inl) in zip(
            ransac_pos, ransac_fundamental_many(pts1_list, pts2_list, thr=thr)
        ):
            if inl is None or inl.sum() == 0:
                prelim[pos] = None
            else:
                prelim[pos] = prelim[pos][inl]
    _FINALIZE_TIMING["ransac_s"] = _FINALIZE_TIMING.get("ransac_s", 0.0) + time.time() - t0

    t0 = time.time()
    results = []
    for pos, (_idx, _fi, _fj, idx_i, idx_j, utm_i, utm_j) in enumerate(items):
        m = prelim[pos]
        if m is None or m.shape[0] == 0:
            results.append(None)
            continue
        matches_ij = np.stack([idx_i[m[:, 0]], idx_j[m[:, 1]]], axis=1)
        matches_ij = filter_matches_inconsistent_utm_coords(matches_ij, utm_i, utm_j)
        results.append(matches_ij)
    _FINALIZE_TIMING["utm_s"] = _FINALIZE_TIMING.get("utm_s", 0.0) + time.time() - t0
    return results


def match_stereo_pairs(pairs_to_match, features, footprints, utm_coords, tracks_config,
                       F=None, thread_idx=None, mesh=None):
    """Match all pairs; returns (K, 4) rows (kp_i, kp_j, im_i, im_j).

    Implements the npy caching protocol of the reference
    (ft_match.py:289-336): matches are cached per pair id in
    matches/pairwise_matches/<idA>_<idB>.npy, reused in either order when
    FT_reset is False.

    With more than one device the uncached pairs' 2-NN stage runs sharded
    over the mesh (one pair per device per dispatch) — the TPU-native
    replacement of the reference's Pool/ray fan-out (ft_match.py:342-393)."""
    import jax

    F = [None] * len(pairs_to_match) if F is None else F
    in_dir = tracks_config.get("in_dir", "")
    out_dir = tracks_config.get("out_dir", "")
    load = lambda x: np.load(x, mmap_mode="r") if isinstance(x, str) else np.asarray(x)
    # in-memory features (FT_save=False handoff) get a session-local token.
    # id(x) is stable for the lifetime of the array (all lookups within
    # this call), and the per-process uuid prefix guarantees a token can
    # never collide with another session's even if one ever leaked into a
    # persistent cache (id() alone is a reusable memory address);
    # _guard_mem_token below additionally refuses to np.save such names.
    fid = lambda x: get_id(x) if isinstance(x, str) else "mem-{}-{}".format(
        _MEM_TOKEN_SESSION, id(x))

    # multi-process deployments: each host matches ONLY its own pairs on its
    # LOCAL devices and exchanges results through the shared
    # pairwise_matches/ npy cache — replacing the reference's Pool/ray pair
    # fan-out + filesystem transport (ft_match.py:342-393)
    multiproc = jax.process_count() > 1
    if multiproc:
        from sat_bundleadjust_tpu.parallel import multihost
        from sat_bundleadjust_tpu.parallel.mesh import make_mesh

        if not out_dir:
            raise ValueError(
                "multi-process matching needs out_dir (shared-filesystem "
                "npy exchange)"
            )
        owned = set(multihost.partition_by_process(len(pairs_to_match)))
        local_devs = jax.local_devices()
        mesh = make_mesh(devices=local_devs) if len(local_devs) > 1 else False

    # staged matching (TPU, single device): frames go to the device ONCE
    # and pair operands assemble on-device (ops/match.py round-5 rework);
    # the matcher then only needs the coordinate columns host-side (for
    # RANSAC/UTM finalize), so pass 1 slices slim (k, 2) views. Falls
    # back to full host packing when staging declines (non-integer
    # descriptors) or on other backends / mesh runs.
    staged_intent = (
        jax.default_backend() == "tpu"
        and os.environ.get("SATBA_MATCH_BATCHED", "1") == "1"
        and os.environ.get("SATBA_MATCH_STAGED", "1") == "1"
        and len(jax.local_devices()) == 1
        and (mesh is None or mesh is False)
    ) and tracks_config["FT_sift_matching"] in (
        "epipolar_based", "bruteforce", "flann", "absolute")

    frame_cache = _FrameCache()
    utm_cache = _FrameCache()

    # pass 1: resolve caches, restrict uncached pairs to their UTM bbox
    _timing = {"prep_s": 0.0, "nn_s": 0.0, "finalize_s": 0.0, "assemble_s": 0.0}
    t_prep = time.time()
    resolved = [None] * len(pairs_to_match)  # matches_ij or None
    npy_ids = [None] * len(pairs_to_match)
    from_cache = [False] * len(pairs_to_match)
    remote = []  # uncached pairs another process owns (multi-process only)
    to_match = []  # (idx, fi, fj, idx_i, idx_j, utm_i, utm_j)
    to_match_frames = []  # (i, j) aligned with to_match (staged path)
    for idx, (i, j) in enumerate(pairs_to_match):
        npy_id1 = "{}_{}.npy".format(fid(features[i]), fid(features[j]))
        npy_id2 = "{}_{}.npy".format(fid(features[j]), fid(features[i]))
        npy_path1 = os.path.join(in_dir, "pairwise_matches", npy_id1)
        npy_path2 = os.path.join(in_dir, "pairwise_matches", npy_id2)
        npy_ids[idx] = npy_id1

        if in_dir and os.path.exists(npy_path1) and not tracks_config["FT_reset"]:
            resolved[idx] = np.load(npy_path1)
            from_cache[idx] = npy_path1
            continue
        if in_dir and os.path.exists(npy_path2) and not tracks_config["FT_reset"]:
            resolved[idx] = np.load(npy_path2)[:, ::-1]
            npy_ids[idx] = npy_id2
            from_cache[idx] = npy_path2
            continue

        if multiproc and idx not in owned:
            remote.append(idx)
            continue

        t_sub = time.time()
        poly_i = geo_utils.geojson_to_polygon(footprints[i]["geojson"])
        poly_j = geo_utils.geojson_to_polygon(footprints[j]["geojson"])
        utm_polygon = poly_i.intersection(poly_j)
        _timing["prep_poly_s"] = _timing.get("prep_poly_s", 0.0) + time.time() - t_sub
        if utm_polygon.coords.shape[0] < 3:
            continue
        utm_i = utm_cache.get(i, utm_coords[i])
        utm_j = utm_cache.get(j, utm_coords[j])
        east_poly = utm_polygon.coords[:, 0]
        north_poly = utm_polygon.coords[:, 1]
        idx_i = get_pt_indices_inside_utm_bbx(
            utm_i[:, 0], utm_i[:, 1], east_poly.min(), east_poly.max(),
            north_poly.min(), north_poly.max()
        )
        idx_j = get_pt_indices_inside_utm_bbx(
            utm_j[:, 0], utm_j[:, 1], east_poly.min(), east_poly.max(),
            north_poly.min(), north_poly.max()
        )
        if len(idx_i) == 0 or len(idx_j) == 0:
            continue
        t_sub = time.time()
        frame_i = frame_cache.get(i, features[i])
        frame_j = frame_cache.get(j, features[j])
        if staged_intent:
            # the staged matcher gathers descriptors on-device; the host
            # only needs keypoint coordinates (RANSAC / UTM finalize)
            fi = frame_i[idx_i, :2]
            fj = frame_j[idx_j, :2]
        else:
            fi = np.asarray(frame_i[idx_i])
            fj = np.asarray(frame_j[idx_j])
        to_match.append((idx, fi, fj, idx_i, idx_j, utm_i, utm_j))
        to_match_frames.append((i, j))
        _timing["prep_io_s"] = _timing.get("prep_io_s", 0.0) + time.time() - t_sub

    _timing["prep_s"] += time.time() - t_prep

    # pass 2: the O(N^2) 2-NN stage — sharded over the mesh when possible
    method_cfg = tracks_config["FT_sift_matching"]
    mesh_ok = method_cfg in ("epipolar_based", "bruteforce", "flann", "absolute")
    if mesh is None and mesh_ok:
        from sat_bundleadjust_tpu.parallel.feature_shard import default_mesh_or_none

        mesh = default_mesh_or_none()
    mesh = mesh or None  # False = force single-device (multi-process local work)
    use_mesh = mesh is not None and len(to_match) >= 2
    if mesh_ok and len(to_match) >= 1:
        pair_F = [
            None if method_cfg in ("bruteforce", "flann") else F[idx]
            for (idx, *_rest) in to_match
        ]
        t_nn = time.time()
        method = "absolute" if method_cfg == "absolute" else "relative"
        nn_results = None
        if staged_intent and not use_mesh:
            # stage each frame on-device once; pair operands assemble as
            # device gathers (ops/match.py round-5 rework — kills the
            # per-pair descriptor transfer and host packing temps)
            from sat_bundleadjust_tpu.ops import match as match_ops

            frames_used = sorted({f for ij in to_match_frames for f in ij})
            fmap = {f: k for k, f in enumerate(frames_used)}
            staged = match_ops.stage_frames_for_matching(
                [frame_cache.get(f, features[f]) for f in frames_used])
            if staged is not None:
                nn_results = match_ops.match_pairs_2nn_staged(
                    staged,
                    [(fmap[i], fmap[j]) for (i, j) in to_match_frames],
                    [(idx_i, idx_j)
                     for (_, _, _, idx_i, idx_j, *_r) in to_match],
                    pair_F,
                    rel_thr=float(tracks_config["FT_rel_thr"]),
                    abs_thr=float(tracks_config["FT_abs_thr"]),
                    method=method,
                )
        if nn_results is not None:
            pass
        elif not use_mesh:
            # one batched Pallas dispatch + one packed fetch for ALL pairs
            # on a single TPU (a tunneled chip pays ~100 ms of round trips
            # per per-pair launch); on other backends the same entry point
            # loops the jitted lax matcher with bucket-padded shapes so
            # pairs share compilations (ops/match.match_pairs_2nn_batched)
            from sat_bundleadjust_tpu.ops.match import match_pairs_2nn_batched

            if staged_intent:
                # staging declined (non-integer descriptors): the host
                # packer needs full 132-column slices
                pair_feats = [
                    (np.asarray(frame_cache.get(i, features[i])[idx_i]),
                     np.asarray(frame_cache.get(j, features[j])[idx_j]))
                    for ((i, j), (_, _, _, idx_i, idx_j, *_r))
                    in zip(to_match_frames, to_match)
                ]
            else:
                pair_feats = [(fi, fj) for (_, fi, fj, *_r) in to_match]
            nn_results = match_pairs_2nn_batched(
                pair_feats, pair_F,
                rel_thr=float(tracks_config["FT_rel_thr"]),
                abs_thr=float(tracks_config["FT_abs_thr"]),
                method=method,
            )
        else:
            from sat_bundleadjust_tpu.parallel.feature_shard import match_pairs_mesh

            nn_results = match_pairs_mesh(
                [(fi, fj) for (_, fi, fj, *_r) in to_match], pair_F, tracks_config, mesh
            )
        _timing["nn_s"] += time.time() - t_nn
        t_fin = time.time()
        for (idx, *_rest), matches_ij in zip(
            to_match, _finalize_pairs_from_nn_batched(to_match, nn_results, tracks_config)
        ):
            resolved[idx] = matches_ij
        _timing["finalize_s"] += time.time() - t_fin
    else:
        t_fin = time.time()
        for (idx, fi, fj, idx_i, idx_j, utm_i, utm_j) in to_match:
            i, j = pairs_to_match[idx]
            poly_i = geo_utils.geojson_to_polygon(footprints[i]["geojson"])
            poly_j = geo_utils.geojson_to_polygon(footprints[j]["geojson"])
            matches_ij, _n = match_kp_within_utm_polygon(
                features[i], features[j], utm_coords[i], utm_coords[j],
                poly_i.intersection(poly_j), tracks_config, F[idx]
            )
            resolved[idx] = matches_ij
        _timing["finalize_s"] += time.time() - t_fin

    if multiproc:
        # publish this host's pair results (empties included, so peers can
        # distinguish "computed, 0 matches" from "not computed"), sync, and
        # pick up the pairs the other hosts own
        for (idx, *_rest) in to_match:
            out_path = os.path.join(
                out_dir, "pairwise_matches", _guard_mem_token(npy_ids[idx]))
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            m = resolved[idx]
            np.save(out_path, np.zeros((0, 2), np.int64) if m is None else np.asarray(m))
        multihost.barrier("pairwise_matching")
        for idx in remote:
            out_path = os.path.join(out_dir, "pairwise_matches", npy_ids[idx])
            if os.path.exists(out_path):  # owner may have skipped the pair
                m = np.load(out_path)
                resolved[idx] = m if m.shape[0] > 0 else None

    # pass 3: assemble, print, write caches (save semantics as the
    # reference, ft_match.py:327-336: cached matches are re-saved when the
    # output cache location differs from where they were loaded)
    t_pass3 = time.time()
    kp_rows, im_rows = [], []
    for idx, (i, j) in enumerate(pairs_to_match):
        matches_ij = resolved[idx]
        n_matches = 0 if matches_ij is None else matches_ij.shape[0]
        if from_cache[idx]:
            print("{:4} matches (from pre-existing file) in pair {}".format(
                n_matches, (i, j)), flush=True)
        else:
            print("{:4} matches in pair {}".format(n_matches, (i, j)), flush=True)
        if n_matches > 0:
            # array blocks concatenated once at the end: at millions of
            # total matches a Python-list assembly (tolist + np.array)
            # costs tens of seconds of pure interpreter time
            kp_rows.append(np.asarray(matches_ij, dtype=np.int64))
            im_rows.append(np.broadcast_to(
                np.array([i, j], dtype=np.int64), (n_matches, 2)
            ))
            if tracks_config.get("FT_save") and out_dir:
                out_path = os.path.join(
                    out_dir, "pairwise_matches", _guard_mem_token(npy_ids[idx]))
                if multiproc:
                    # owned results were already published pre-barrier; only
                    # the main process relocates cache hits (no write races)
                    from sat_bundleadjust_tpu.parallel.multihost import is_main_process

                    if (
                        from_cache[idx]
                        and out_path != from_cache[idx]
                        and is_main_process()
                        and not os.path.exists(out_path)
                    ):
                        os.makedirs(os.path.dirname(out_path), exist_ok=True)
                        np.save(out_path, np.asarray(matches_ij))
                elif out_path != from_cache[idx]:
                    os.makedirs(os.path.dirname(out_path), exist_ok=True)
                    np.save(out_path, np.asarray(matches_ij))

    _timing["assemble_s"] += time.time() - t_pass3
    if _TIMING_ON:
        print(
            "[match timing] cache/bbox {:.1f}s (poly {:.1f}s, feat io {:.1f}s) | "
            "2-NN device {:.1f}s | finalize (RANSAC+UTM) {:.1f}s "
            "(collect {:.1f}s, ransac {:.1f}s, utm {:.1f}s) | "
            "assemble+write {:.1f}s".format(
                _timing["prep_s"], _timing.get("prep_poly_s", 0.0),
                _timing.get("prep_io_s", 0.0), _timing["nn_s"],
                _timing["finalize_s"],
                _FINALIZE_TIMING.get("collect_s", 0.0),
                _FINALIZE_TIMING.get("ransac_s", 0.0),
                _FINALIZE_TIMING.get("utm_s", 0.0),
                _timing["assemble_s"],
            ),
            flush=True,
        )
    if not kp_rows:
        return np.zeros((0, 4), dtype=np.int64)
    return np.hstack((np.concatenate(kp_rows), np.concatenate(im_rows)))
