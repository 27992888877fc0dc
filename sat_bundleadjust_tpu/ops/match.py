"""Batched descriptor matching on the MXU.

Replaces the reference's native O(N1*N2) brute-force 2-NN matcher
(3rdparty/sift/simd/sift4ctypes.cpp:125-195 `matching`, with epipolar
gating via `distance_epipolar` at :23-48) and the OpenCV BF/FLANN path
(feature_tracks/ft_opencv.py:94-140).

Design: squared descriptor distances are computed as
||a||^2 + ||b||^2 - 2 a.b — the cross term is a (B, 128) x (128, N2)
matmul that maps straight onto the MXU. The scan over row blocks keeps
the distance matrix tile-sized in VMEM regardless of keypoint counts.
Epipolar gating is a point-to-line distance mask applied to the distance
tiles before the top-2 reduction (equivalent to the reference's
rectified-ordinate test with threshold 20 px, ft_s2p.py:144-145)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

EPIPOLAR_THR = 20.0  # px, reference: ft_s2p.py:145


def _epipolar_distance_sq(pts_i, pts_j, F):
    """Squared distance of pts_j to the epipolar lines F @ pts_i, and of
    pts_i to F.T @ pts_j; returns the max of both (B, N2).

    pts_i: (B, 2); pts_j: (N2, 2); F: (3, 3)."""
    one_i = jnp.ones(pts_i.shape[:-1] + (1,), pts_i.dtype)
    one_j = jnp.ones(pts_j.shape[:-1] + (1,), pts_j.dtype)
    hi = jnp.concatenate([pts_i, one_i], axis=-1)  # (B, 3)
    hj = jnp.concatenate([pts_j, one_j], axis=-1)  # (N2, 3)
    li = hi @ F.T  # (B, 3): epipolar lines in image j
    lj = hj @ F  # (N2, 3): epipolar lines in image i
    num = hi @ F.T @ hj.T  # (B, N2) algebraic residual
    d_j = num ** 2 / jnp.maximum(li[:, 0:1] ** 2 + li[:, 1:2] ** 2, 1e-30)
    d_i = num ** 2 / jnp.maximum((lj[:, 0] ** 2 + lj[:, 1] ** 2)[None, :], 1e-30)
    return jnp.maximum(d_i, d_j)


@partial(jax.jit, static_argnames=("block", "method"))
@partial(jax.jit, static_argnames=("method", "block"))
def match_descriptors_2nn(
    desc_i,
    desc_j,
    pts_i,
    pts_j,
    valid_i,
    valid_j,
    F=None,
    rel_thr=0.6,
    abs_thr=250.0,
    epipolar_thr=EPIPOLAR_THR,
    method="relative",
    block=2048,
):
    """2-nearest-neighbour matching with ratio/absolute test.

    Args:
      desc_i: (N1, 128), desc_j: (N2, 128) float descriptors (NaN rows allowed)
      pts_i: (N1, 2), pts_j: (N2, 2) pixel coordinates (for epipolar gating)
      valid_i/valid_j: (N1,)/(N2,) bool
      F: optional (3, 3) fundamental matrix enabling epipolar gating
      method: "relative" (d1 < rel_thr * d2, reference default) or
              "absolute" (d1 < abs_thr, sift4ctypes.cpp:169-178)
    Returns:
      nn_idx: (N1,) best match index in j (valid only where accepted)
      accepted: (N1,) bool
      d1: (N1,) best squared distance
    """
    n1 = desc_i.shape[0]
    desc_j_t = jnp.where(valid_j[:, None], desc_j, 0.0).astype(jnp.float32)
    sq_j = jnp.sum(desc_j_t * desc_j_t, axis=-1)  # (N2,)
    big = jnp.float32(1e12)

    n_blocks = -(-n1 // block)
    pad = n_blocks * block - n1

    desc_i_p = jnp.pad(jnp.where(valid_i[:, None], desc_i, 0.0).astype(jnp.float32), ((0, pad), (0, 0)))
    pts_i_p = jnp.pad(pts_i.astype(jnp.float32), ((0, pad), (0, 0)))
    valid_i_p = jnp.pad(valid_i, (0, pad))

    def process_block(carry, blk):
        di, pi, vi = blk
        sq_i = jnp.sum(di * di, axis=-1)
        # MXU cross term
        cross = jnp.dot(di, desc_j_t.T, preferred_element_type=jnp.float32)
        d2 = sq_i[:, None] + sq_j[None, :] - 2.0 * cross
        d2 = jnp.maximum(d2, 0.0)
        mask = valid_j[None, :] & vi[:, None]
        if F is not None:
            ed = _epipolar_distance_sq(pi, pts_j.astype(jnp.float32), F.astype(jnp.float32))
            mask = mask & (ed < epipolar_thr ** 2)
        d2 = jnp.where(mask, d2, big)
        # top-2 as two min-reductions, NOT lax.top_k: XLA lowers top_k(k=2)
        # to a full per-row sort on CPU (~2 s at 3k x 3k) while these
        # reduce to argmin/min scans (~50 ms); on TPU the hot path is the
        # Pallas kernel anyway (ops/pallas_match.py)
        idx1 = jnp.argmin(d2, axis=1)
        d1 = jnp.take_along_axis(d2, idx1[:, None], axis=1)[:, 0]
        cols = jnp.arange(d2.shape[1], dtype=idx1.dtype)
        dsecond = jnp.min(jnp.where(cols[None, :] == idx1[:, None], big, d2), axis=1)
        if method == "relative":
            ok = d1 < (rel_thr ** 2) * dsecond
        else:
            ok = d1 < abs_thr ** 2
        ok = ok & (d1 < big * 0.5) & vi
        return carry, (idx1, ok, d1)

    _, (nn_idx, accepted, d1) = jax.lax.scan(
        process_block,
        None,
        (
            desc_i_p.reshape(n_blocks, block, -1),
            pts_i_p.reshape(n_blocks, block, 2),
            valid_i_p.reshape(n_blocks, block),
        ),
    )
    return (
        nn_idx.reshape(-1)[:n1],
        accepted.reshape(-1)[:n1],
        d1.reshape(-1)[:n1],
    )


def match_pair(features_i, features_j, F=None, rel_thr=0.6, abs_thr=250.0,
               method="relative", ransac_thr=0.3, epipolar_thr=EPIPOLAR_THR):
    """Full pairwise matching: 2-NN + ratio test (+ epipolar gating) then
    RANSAC fundamental-matrix filtering. Host-facing wrapper.

    features_*: (N, 132) arrays in the reference keypoint layout
    (col, row, scale, orientation, 128-dim descriptor), NaN padded.

    Returns (matches_ij (M, 2) int array or None, n_ratio, n_ransac)."""
    from sat_bundleadjust_tpu.ops.ransac import ransac_fundamental

    features_i = np.asarray(features_i)
    features_j = np.asarray(features_j)
    valid_i = ~np.isnan(features_i[:, 0])
    valid_j = ~np.isnan(features_j[:, 0])
    if valid_i.sum() == 0 or valid_j.sum() == 0:
        return None, 0, 0

    if jax.default_backend() == "tpu":
        # tiled Pallas kernel with fused epipolar gating (MXU distance
        # tiles + VPU top-2 merge); see ops/pallas_match.py
        from sat_bundleadjust_tpu.ops.pallas_match import pallas_2nn

        desc_i = np.nan_to_num(features_i[:, 4:]).astype(np.float32)
        desc_j = np.nan_to_num(features_j[:, 4:]).astype(np.float32)
        pts_j = np.nan_to_num(features_j[:, :2]).astype(np.float32)
        hp_j = np.hstack([pts_j, np.ones((len(pts_j), 1), np.float32)])
        if F is not None:
            h_i = np.hstack(
                [np.nan_to_num(features_i[:, :2]), np.ones((len(features_i), 1))]
            )
            lines_i = (h_i @ np.asarray(F).T).astype(np.float32)
            thr = float(epipolar_thr)
        else:
            lines_i = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (len(features_i), 1))
            thr = 1e9
        d1, d2, nn = pallas_2nn(
            jnp.asarray(desc_i), jnp.asarray(desc_j), jnp.asarray(lines_i),
            jnp.asarray(hp_j), jnp.asarray(valid_i, jnp.float32),
            jnp.asarray(valid_j, jnp.float32), thr,
        )
        d1 = np.asarray(d1)
        d2 = np.asarray(d2)
        nn_idx = np.asarray(nn)
        if method == "relative":
            accepted = d1 < (rel_thr ** 2) * d2
        else:
            accepted = d1 < abs_thr ** 2
        accepted &= (d1 < 5e11) & valid_i
        return _finalize_matches(features_i, features_j, nn_idx, accepted, ransac_thr)

    nn_idx, accepted, _ = match_descriptors_2nn(
        jnp.asarray(features_i[:, 4:]),
        jnp.asarray(features_j[:, 4:]),
        jnp.asarray(features_i[:, :2]),
        jnp.asarray(features_j[:, :2]),
        jnp.asarray(valid_i),
        jnp.asarray(valid_j),
        F=None if F is None else jnp.asarray(F),
        rel_thr=rel_thr,
        abs_thr=abs_thr,
        epipolar_thr=epipolar_thr,
        method=method,
    )
    return _finalize_matches(features_i, features_j, np.asarray(nn_idx), np.asarray(accepted), ransac_thr)


def pack_pairs(pair_feats, pair_F, epipolar_thr=EPIPOLAR_THR, b_pad=None,
               n1=None, n2=None):
    """Pack a list of stereo pairs into the batched matcher operand layout
    (the pallas_2nn_batched contract, ops/pallas_match.py): descriptors,
    per-row epipolar lines l_i = F^T h_i, per-column homogeneous points,
    validity masks and per-pair thresholds (1e9 disables the gate), padded
    to shared (b_pad, n1, n2) shapes so similar-size runs reuse one
    compilation. Shared by the single-device batched path and the mesh
    path (parallel/feature_shard.match_pairs_mesh)."""
    B = len(pair_feats)
    if n1 is None:
        n1 = max(max(np.asarray(f[0]).shape[0] for f in pair_feats), 1)
        n1 = -(-n1 // 256) * 256
    if n2 is None:
        n2 = max(max(np.asarray(f[1]).shape[0] for f in pair_feats), 1)
        n2 = -(-n2 // 512) * 512
    b_pad = B if b_pad is None else b_pad
    di = np.zeros((b_pad, n1, 128), np.float32)
    dj = np.zeros((b_pad, n2, 128), np.float32)
    li = np.zeros((b_pad, n1, 3), np.float32)
    li[:, :, 0] = 1.0
    hj = np.zeros((b_pad, n2, 3), np.float32)
    hj[:, :, 2] = 1.0
    vi = np.zeros((b_pad, n1), np.float32)
    vj = np.zeros((b_pad, n2), np.float32)
    thr = np.full(b_pad, 1e9, np.float32)
    for b, ((fi, fj), F) in enumerate(zip(pair_feats, pair_F)):
        fi, fj = np.asarray(fi), np.asarray(fj)
        ki, kj = fi.shape[0], fj.shape[0]
        vi[b, :ki] = ~np.isnan(fi[:, 0])
        vj[b, :kj] = ~np.isnan(fj[:, 0])
        di[b, :ki] = np.nan_to_num(fi[:, 4:])
        dj[b, :kj] = np.nan_to_num(fj[:, 4:])
        hj[b, :kj, :2] = np.nan_to_num(fj[:, :2])
        if F is not None:
            h_i = np.hstack([np.nan_to_num(fi[:, :2]), np.ones((ki, 1))])
            li[b, :ki] = (h_i @ np.asarray(F).T).astype(np.float32)
            thr[b] = float(epipolar_thr)
    return {"di": di, "dj": dj, "li": li, "hj": hj, "vi": vi, "vj": vj, "thr": thr}


def int8_packable(di, dj):
    """True when descriptors are exact integers in 0..255 (the uint8 SIFT
    quantization), so the int8-MXU kernel is bit-identical to f32."""
    import os

    return (
        os.environ.get("SATBA_MATCH_INT8", "1") == "1"
        and di.max(initial=0.0) <= 255.0
        and dj.max(initial=0.0) <= 255.0
        and di.min(initial=0.0) >= 0.0
        and dj.min(initial=0.0) >= 0.0
        and np.array_equal(di, np.rint(di))
        and np.array_equal(dj, np.rint(dj))
    )


def accept_from_packed(packed, pair_feats, vi, method, rel_thr, abs_thr):
    """Host-side acceptance tail of the batched matchers: ratio/absolute
    test per pair on the packed (B, 3, n1) (d1, d2, nn) result."""
    out = []
    for b, (fi, _fj) in enumerate(pair_feats):
        ki = np.asarray(fi).shape[0]
        d1, d2, nn = packed[b, 0, :ki], packed[b, 1, :ki], packed[b, 2, :ki]
        if method == "relative":
            accepted = d1 < (rel_thr ** 2) * d2
        else:
            accepted = d1 < abs_thr ** 2
        accepted &= (d1 < 5e11) & (vi[b, :ki] > 0)
        out.append((nn.astype(np.int64), accepted))
    return out


def stage_frames_for_matching(frames):
    """Stage per-frame keypoints on the device ONCE for
    match_pairs_2nn_staged (TPU path). frames: list of (N, 132) float
    feature arrays (nan-padded rows allowed).

    Returns None when any frame's descriptors are not exact integers in
    0..255 (the caller then uses the host-packed f32 path); otherwise a
    dict with:
      desc  — (n_frames, n_f, 128) int8 device array (descriptor - 128)
      hpts  — (n_frames, n_f, 3) f32 device array, homogeneous (x, y, 1)
      n_f   — common padded row count

    Rationale (round-5 matching rework): the host-packed path re-sends
    every frame's descriptors over the device link once per pair (~27x
    per frame at the config-#4 1350-pair scale, 1.9 GB on a ~90 MB/s
    tunnel) and pays GB-scale f32 pack/convert/rint-scan temps on the
    host; staging each frame once cuts the transfer to ~70 MB and moves
    pair-operand assembly onto the device as gathers."""
    n_frames = len(frames)
    if n_frames == 0:
        return None
    n_f = -(-max(max(int(np.asarray(f).shape[0]) for f in frames), 1) // 512) * 512
    desc = np.zeros((n_frames, n_f, 128), np.int8)
    hpts = np.zeros((n_frames, n_f, 3), np.float32)
    hpts[:, :, 2] = 1.0
    for fidx, f in enumerate(frames):
        f = np.asarray(f)
        k = f.shape[0]
        d = np.nan_to_num(f[:, 4:])
        if (d.min(initial=0.0) < 0.0 or d.max(initial=0.0) > 255.0
                or not np.array_equal(d, np.rint(d))):
            return None
        desc[fidx, :k] = (d - 128.0).astype(np.int8)
        hpts[fidx, :k, :2] = np.nan_to_num(f[:, :2])
    return {
        "desc": jax.device_put(jnp.asarray(desc)),
        "hpts": jax.device_put(jnp.asarray(hpts)),
        "n_f": n_f,
    }


@partial(jax.jit, static_argnames=("interpret",))
def _staged_chunk_match(desc, hpts, frame_i, ii, mi, frame_j, jj, mj, Fmat,
                        thr, interpret=False):
    """Device-side pair-operand assembly + batched int8 2-NN kernel.

    desc/hpts: staged frame tables; frame_i/j: (B,) int32; ii/jj: (B, n)
    int32 row indices into the frame tables (0 on padding slots); mi/mj:
    (B, n) f32 validity; Fmat: (B, 3, 3) f32 (identity when the epipolar
    gate is off); thr: (B,) f32 per-pair epipolar threshold."""
    from sat_bundleadjust_tpu.ops.pallas_match import pallas_2nn_batched_i8

    di = desc[frame_i[:, None], ii]  # (B, n1, 128) int8 gather
    dj = desc[frame_j[:, None], jj]  # (B, n2, 128)
    hi = hpts[frame_i[:, None], ii]  # (B, n1, 3)
    hj = hpts[frame_j[:, None], jj]  # (B, n2, 3)
    li = jnp.einsum("bnk,blk->bnl", hi, Fmat)  # h_i @ F^T per pair
    return pallas_2nn_batched_i8(di, dj, li, hj, mi, mj, thr,
                                 interpret=interpret)


def match_pairs_2nn_staged(staged, pair_frames, pair_idx, pair_F,
                           rel_thr=0.6, abs_thr=250.0, method="relative",
                           epipolar_thr=EPIPOLAR_THR, max_bytes=None,
                           interpret=False):
    """2-NN + ratio stage for many pairs against device-staged frames.

    staged: stage_frames_for_matching output; pair_frames: list of
    (frame_i, frame_j) indices; pair_idx: list of (idx_i, idx_j) row
    subsets (the UTM-bbox restriction); pair_F: per-pair (3, 3) F or
    None. Same return contract as match_pairs_2nn_batched. Chunks pairs
    under an operand-byte budget; all dispatches enqueue asynchronously
    and drain in one pass."""
    import os

    B = len(pair_frames)
    if B == 0:
        return []
    if max_bytes is None:
        max_bytes = int(os.environ.get("SATBA_MATCH_MAX_BYTES", 1 << 30))
    sizes = [max(len(pi), 1) for pi, _ in pair_idx]
    order = np.argsort(sizes, kind="stable")
    results = [None] * B
    pending = []
    c0 = 0
    while c0 < B:
        chunk = [order[c0]]
        c1 = c0 + 1
        while c1 < B:
            trial = chunk + [order[c1]]
            n1 = -(-max(max(len(pair_idx[q][0]) for q in trial), 1) // 256) * 256
            n2 = -(-max(max(len(pair_idx[q][1]) for q in trial), 1) // 512) * 512
            if len(trial) * (n1 + n2) * 131 * 4 > max_bytes:
                break
            chunk = trial
            c1 += 1
        c0 = c1

        n1 = -(-max(max(len(pair_idx[q][0]) for q in chunk), 1) // 256) * 256
        n2 = -(-max(max(len(pair_idx[q][1]) for q in chunk), 1) // 512) * 512
        # round the batch up (dummy pairs: empty validity, gate off) so
        # chunk shapes repeat across runs and reuse compilations
        Bc = -(-len(chunk) // 32) * 32
        fi_a = np.zeros(Bc, np.int32)
        fj_a = np.zeros(Bc, np.int32)
        ii = np.zeros((Bc, n1), np.int32)
        jj = np.zeros((Bc, n2), np.int32)
        mi = np.zeros((Bc, n1), np.float32)
        mj = np.zeros((Bc, n2), np.float32)
        Fm = np.broadcast_to(np.eye(3, dtype=np.float32), (Bc, 3, 3)).copy()
        thr = np.full(Bc, 1e9, np.float32)
        for b, q in enumerate(chunk):
            pi, pj = pair_idx[q]
            fi_a[b], fj_a[b] = pair_frames[q]
            ii[b, : len(pi)] = pi
            jj[b, : len(pj)] = pj
            mi[b, : len(pi)] = 1.0
            mj[b, : len(pj)] = 1.0
            if pair_F[q] is not None:
                Fm[b] = np.asarray(pair_F[q], np.float32)
                thr[b] = float(epipolar_thr)
        packed = _staged_chunk_match(
            staged["desc"], staged["hpts"],
            jnp.asarray(fi_a), jnp.asarray(ii), jnp.asarray(mi),
            jnp.asarray(fj_a), jnp.asarray(jj), jnp.asarray(mj),
            jnp.asarray(Fm), jnp.asarray(thr), interpret=interpret)
        pending.append((chunk, packed, mi))

    for chunk, packed, mi in pending:  # drain async dispatches
        packed = np.asarray(packed)
        for b, q in enumerate(chunk):
            ki = len(pair_idx[q][0])
            d1, d2, nn = packed[b, 0, :ki], packed[b, 1, :ki], packed[b, 2, :ki]
            if method == "relative":
                accepted = d1 < (rel_thr ** 2) * d2
            else:
                accepted = d1 < abs_thr ** 2
            accepted &= (d1 < 5e11) & (mi[b, :ki] > 0)
            results[q] = (nn.astype(np.int64), accepted)
    return results


def match_pairs_2nn_batched(pair_feats, pair_F, rel_thr=0.6, abs_thr=250.0,
                            method="relative", epipolar_thr=EPIPOLAR_THR):
    """2-NN + ratio/epipolar stage for MANY pairs in one device dispatch.

    pair_feats: list of (features_i, features_j) (N, 132) arrays; pair_F:
    list of (3, 3) fundamental matrices or None (disables the epipolar
    gate for that pair). Returns a list of (nn_idx, accepted) numpy arrays
    — the caller runs the host-side finalize (RANSAC, UTM elbow).

    On a TPU backend all pairs run through ONE batched Pallas kernel
    launch and ONE packed fetch: the single-pair path costs a dispatch
    plus three array fetches per pair, ~100 ms of tunnel round trips each
    — this was the dominant cost of the whole tracks stage once detection
    was batched (BENCHMARKS.md). Non-TPU backends loop the lax matcher
    (compiles per shape; fine on CPU test sizes)."""
    import os

    B = len(pair_feats)
    if B == 0:
        return []
    # SATBA_MATCH_BATCHED=0 escape hatch: per-pair matching through
    # match_pair's own backend dispatch (single-pair Pallas kernel on TPU,
    # lax matcher elsewhere)
    if jax.default_backend() != "tpu" or os.environ.get("SATBA_MATCH_BATCHED", "1") == "0":
        out = []
        for (fi, fj), F in zip(pair_feats, pair_F):
            fi, fj = np.asarray(fi), np.asarray(fj)
            ki, kj = fi.shape[0], fj.shape[0]
            # bucket-pad the keypoint counts (invalid filler) so the jitted
            # matcher compiles once per size bucket, not once per pair —
            # per-pair shapes caused a compile per pair on CPU (~2 s/pair
            # where the compiled kernel itself runs in ~60 ms)
            pi = -(-max(ki, 1) // 256) * 256 - ki
            pj = -(-max(kj, 1) // 512) * 512 - kj
            fi_p = np.pad(fi, ((0, pi), (0, 0)), constant_values=np.nan)
            fj_p = np.pad(fj, ((0, pj), (0, 0)), constant_values=np.nan)
            nn, acc, _ = match_descriptors_2nn(
                jnp.asarray(np.nan_to_num(fi_p[:, 4:])),
                jnp.asarray(np.nan_to_num(fj_p[:, 4:])),
                jnp.asarray(np.nan_to_num(fi_p[:, :2])),
                jnp.asarray(np.nan_to_num(fj_p[:, :2])),
                jnp.asarray(~np.isnan(fi_p[:, 0])), jnp.asarray(~np.isnan(fj_p[:, 0])),
                F=None if F is None else jnp.asarray(F),
                rel_thr=rel_thr, abs_thr=abs_thr,
                epipolar_thr=epipolar_thr, method=method,
            )
            out.append((np.asarray(nn)[:ki], np.asarray(acc)[:ki]))
        return out

    from sat_bundleadjust_tpu.ops.pallas_match import (
        pallas_2nn_batched, pallas_2nn_batched_i8,
    )

    # chunk the pair list under an operand-byte budget: a 100-view scene's
    # 1350 pairs at 5k keypoints packed into ONE call is 2x 880 MB of
    # descriptor operands plus temps, which blew HBM during compile on the
    # first config-#4 scale run (round 3). Pairs are size-sorted so each
    # chunk pads to its own maximum; dispatches enqueue asynchronously and
    # drain in one pass (same scheme as the mesh path,
    # parallel/feature_shard.match_pairs_mesh).
    max_bytes = int(os.environ.get("SATBA_MATCH_MAX_BYTES", 1 << 30))
    sizes = [max(np.asarray(fi).shape[0], 1) for fi, _ in pair_feats]
    order = np.argsort(sizes, kind="stable")
    results = [None] * B
    pending = []
    c0 = 0
    while c0 < B:
        chunk = [order[c0]]
        c1 = c0 + 1
        while c1 < B:
            trial = chunk + [order[c1]]
            n1 = -(-max(max(pair_feats[q][0].shape[0] for q in trial), 1) // 256) * 256
            n2 = -(-max(max(pair_feats[q][1].shape[0] for q in trial), 1) // 512) * 512
            if len(trial) * (n1 + n2) * 131 * 4 > max_bytes:
                break
            chunk = trial
            c1 += 1
        c0 = c1

        feats = [pair_feats[q] for q in chunk]
        p = pack_pairs(feats, [pair_F[q] for q in chunk], epipolar_thr)
        di, dj = p["di"], p["dj"]
        # int8 MXU path (SATBA_MATCH_INT8=0 disables): SIFT descriptors are
        # exact uint8 (0..255 quantized, ops/sift.py), so (d - 128) fits
        # int8 — 4x less HBM/transfer traffic, results bit-identical to the
        # f32 kernel (ops/pallas_match.py)
        if int8_packable(di, dj):
            packed = pallas_2nn_batched_i8(
                jnp.asarray((di - 128.0).astype(np.int8)),
                jnp.asarray((dj - 128.0).astype(np.int8)),
                jnp.asarray(p["li"]), jnp.asarray(p["hj"]),
                jnp.asarray(p["vi"]), jnp.asarray(p["vj"]), jnp.asarray(p["thr"]),
            )  # (B_c, 3, n1): d1, d2, nn
        else:
            packed = pallas_2nn_batched(
                jnp.asarray(di), jnp.asarray(dj), jnp.asarray(p["li"]), jnp.asarray(p["hj"]),
                jnp.asarray(p["vi"]), jnp.asarray(p["vj"]), jnp.asarray(p["thr"]),
            )
        pending.append((chunk, packed, p["vi"], feats))

    for chunk, packed, vi, feats in pending:  # drain async dispatches
        packed = np.asarray(packed)
        for q, res in zip(chunk, accept_from_packed(packed, feats, vi, method,
                                                    rel_thr, abs_thr)):
            results[q] = res
    return results


def _finalize_matches(features_i, features_j, nn_idx, accepted, ransac_thr):
    """Shared tail: collect accepted pairs + RANSAC geometric filtering."""
    from sat_bundleadjust_tpu.ops.ransac import ransac_fundamental

    idx_i = np.where(accepted)[0]
    matches_ij = np.stack([idx_i, nn_idx[idx_i]], axis=1).astype(np.int64)
    n_ratio = matches_ij.shape[0]
    if n_ratio == 0:
        return None, 0, 0

    if ransac_thr is not None and n_ratio >= 8:
        pts_i = features_i[matches_ij[:, 0], :2]
        pts_j = features_j[matches_ij[:, 1], :2]
        _, inliers = ransac_fundamental(pts_i, pts_j, thr=ransac_thr)
        if inliers is None or inliers.sum() == 0:
            return None, n_ratio, 0
        matches_ij = matches_ij[inliers]
    return matches_ij, n_ratio, matches_ij.shape[0]
