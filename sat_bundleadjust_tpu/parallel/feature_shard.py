"""Feature stages (detection / pairwise matching) sharded over the mesh.

The reference's only data-parallel axis is fanning images and stereo pairs
out over multiprocessing.Pool / ray workers (ft_s2p.py:97-124,
ft_match.py:342-393), with npy files as transport. The TPU-native
equivalent: batch the per-image / per-pair work along a leading axis,
shard that axis over the device mesh (jax.sharding, axis "obs"), and let
XLA partition the vmapped kernels — every device matches its own pairs /
detects on its own images with zero cross-device traffic (embarrassingly
parallel, no collectives needed beyond the final host gather).

Used automatically by tracks/matching.py and tracks/detection.py when the
runtime has more than one device; exercised on the virtual 8-device CPU
mesh in tests/test_feature_shard.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sat_bundleadjust_tpu.parallel.mesh import OBS_AXIS, make_mesh


def default_mesh_or_none():
    """A 1-D mesh over all local devices, or None when only one device is
    available (single-chip: batching already saturates it; sharding would
    only add padding)."""
    devs = jax.devices()
    if len(devs) < 2:
        return None
    return make_mesh(devices=devs)


# ---------------------------------------------------------------------------
# pairwise 2-NN matching over a sharded pair axis
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("method", "block"))
def _batched_2nn(desc_i, desc_j, pts_i, pts_j, valid_i, valid_j, F, use_F,
                 rel_thr, abs_thr, epipolar_thr, method="relative", block=1024):
    """Vmapped twin of ops/match.match_descriptors_2nn over a pair axis.

    All operands carry a leading pair dimension; F is always an array, with
    use_F (P,) switching the epipolar gate per pair (a traced substitute
    for the reference's `if F is not None`). The caller shards the leading
    axis over the mesh; every op here is per-pair independent, so the SPMD
    partitioner emits no collectives."""
    from sat_bundleadjust_tpu.ops.match import _epipolar_distance_sq

    def one_pair(di, dj, pi, pj, vi, vj, Fp, useF):
        dj_t = jnp.where(vj[:, None], dj, 0.0).astype(jnp.float32)
        sq_j = jnp.sum(dj_t * dj_t, axis=-1)
        big = jnp.float32(1e12)
        n1 = di.shape[0]
        n_blocks = -(-n1 // block)
        pad = n_blocks * block - n1
        di_p = jnp.pad(jnp.where(vi[:, None], di, 0.0).astype(jnp.float32), ((0, pad), (0, 0)))
        pi_p = jnp.pad(pi.astype(jnp.float32), ((0, pad), (0, 0)))
        vi_p = jnp.pad(vi, (0, pad))

        def process_block(carry, blk):
            dib, pib, vib = blk
            sq_i = jnp.sum(dib * dib, axis=-1)
            cross = jnp.dot(dib, dj_t.T, preferred_element_type=jnp.float32)
            d2 = jnp.maximum(sq_i[:, None] + sq_j[None, :] - 2.0 * cross, 0.0)
            mask = vj[None, :] & vib[:, None]
            ed = _epipolar_distance_sq(pib, pj.astype(jnp.float32), Fp.astype(jnp.float32))
            gate = (ed < epipolar_thr ** 2) | ~useF
            d2 = jnp.where(mask & gate, d2, big)
            # two min-reductions instead of lax.top_k(k=2): XLA lowers the
            # latter to a full per-row sort on CPU (see ops/match.py)
            idx1 = jnp.argmin(d2, axis=1)
            d1 = jnp.take_along_axis(d2, idx1[:, None], axis=1)[:, 0]
            cols = jnp.arange(d2.shape[1], dtype=idx1.dtype)
            dsecond = jnp.min(
                jnp.where(cols[None, :] == idx1[:, None], big, d2), axis=1
            )
            if method == "relative":
                ok = d1 < (rel_thr ** 2) * dsecond
            else:
                ok = d1 < abs_thr ** 2
            ok = ok & (d1 < big * 0.5) & vib
            return carry, (idx1, ok)

        _, (nn_idx, accepted) = jax.lax.scan(
            process_block, None,
            (di_p.reshape(n_blocks, block, -1),
             pi_p.reshape(n_blocks, block, 2),
             vi_p.reshape(n_blocks, block)),
        )
        return nn_idx.reshape(-1)[:n1], accepted.reshape(-1)[:n1]

    return jax.vmap(one_pair)(desc_i, desc_j, pts_i, pts_j, valid_i, valid_j, F, use_F)


def match_pairs_mesh(pair_feats, pair_F, tracks_config, mesh=None):
    """2-NN + ratio/epipolar stage for many pairs, pair axis sharded.

    pair_feats: list of (features_i, features_j) arrays in the (N, 132)
    keypoint layout (already restricted to the UTM polygon candidates).
    pair_F: list of (3, 3) fundamental matrices or None.
    Returns a list of (nn_idx, accepted) numpy arrays per pair — the
    caller runs the host-side finalize (RANSAC + UTM elbow + caching),
    which operates on the few surviving matches.

    Pairs are processed in chunks of n_devices (one pair per device per
    dispatch), sorted by size so each chunk pads to its own maximum; all
    chunk dispatches enqueue asynchronously and drain in one device_get.
    """
    mesh = mesh if mesh is not None else default_mesh_or_none()
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    method_cfg = tracks_config["FT_sift_matching"]
    method = "absolute" if method_cfg == "absolute" else "relative"
    rel_thr = float(tracks_config["FT_rel_thr"])
    abs_thr = float(tracks_config["FT_abs_thr"])
    from sat_bundleadjust_tpu.ops.match import EPIPOLAR_THR

    n_pairs = len(pair_feats)
    order = np.argsort([max(len(fi), 1) for fi, _ in pair_feats], kind="stable")
    shard = None if mesh is None else NamedSharding(mesh, P(OBS_AXIS))
    results = [None] * n_pairs
    pending = []  # (chunk_indices, device_handles)

    for c0 in range(0, n_pairs, max(n_dev, 1)):
        chunk = order[c0 : c0 + max(n_dev, 1)]
        Ki = max(max(pair_feats[q][0].shape[0] for q in chunk), 1)
        Kj = max(max(pair_feats[q][1].shape[0] for q in chunk), 1)
        # round up so pairs of similar size share one compiled program
        Ki = -(-Ki // 1024) * 1024
        Kj = -(-Kj // 1024) * 1024
        B = len(chunk)
        B_pad = n_dev if mesh is not None else B
        di = np.zeros((B_pad, Ki, 128), np.float32)
        dj = np.zeros((B_pad, Kj, 128), np.float32)
        pi = np.zeros((B_pad, Ki, 2), np.float32)
        pj = np.zeros((B_pad, Kj, 2), np.float32)
        vi = np.zeros((B_pad, Ki), bool)
        vj = np.zeros((B_pad, Kj), bool)
        Fs = np.tile(np.eye(3, dtype=np.float32), (B_pad, 1, 1))
        useF = np.zeros((B_pad,), bool)
        for b, q in enumerate(chunk):
            fi, fj = np.asarray(pair_feats[q][0]), np.asarray(pair_feats[q][1])
            ni, nj = fi.shape[0], fj.shape[0]
            vi[b, :ni] = ~np.isnan(fi[:, 0])
            vj[b, :nj] = ~np.isnan(fj[:, 0])
            di[b, :ni] = np.nan_to_num(fi[:, 4:])
            dj[b, :nj] = np.nan_to_num(fj[:, 4:])
            pi[b, :ni] = np.nan_to_num(fi[:, :2])
            pj[b, :nj] = np.nan_to_num(fj[:, :2])
            if pair_F[q] is not None:
                Fs[b] = np.asarray(pair_F[q], np.float32)
                useF[b] = True

        ops = [di, dj, pi, pj, vi, vj, Fs, useF]
        if shard is not None:
            ops = [jax.device_put(x, shard) for x in ops]
        else:
            ops = [jnp.asarray(x) for x in ops]
        nn, acc = _batched_2nn(
            *ops, jnp.float32(rel_thr), jnp.float32(abs_thr),
            jnp.float32(EPIPOLAR_THR), method=method,
        )
        pending.append((chunk, nn, acc))

    for chunk, nn, acc in pending:  # drain async dispatches
        nn = np.asarray(jax.device_get(nn))
        acc = np.asarray(jax.device_get(acc))
        for b, q in enumerate(chunk):
            ni = pair_feats[q][0].shape[0]
            results[q] = (nn[b, :ni], acc[b, :ni])
    return results


# ---------------------------------------------------------------------------
# detection batches over a sharded image axis
# ---------------------------------------------------------------------------


def detect_batches_mesh(images, tracks_config, mesh=None, max_kp=None):
    """SIFT detection for same-shape images with the batch axis sharded.

    Chunks of n_devices * BATCH_CHUNK images run through the vmapped
    octave programs of ops/sift.py with the leading axis device-sharded:
    each device extracts its own images' scale space (per-image work, no
    collectives). Returns a list of (N_i, 132) arrays."""
    from sat_bundleadjust_tpu.ops import sift as sift_ops

    mesh = mesh if mesh is not None else default_mesh_or_none()
    thresh = float(tracks_config.get("FT_thresh_dog", 0.0133))
    if mesh is None:
        return sift_ops.detect_sift_batch(images, thresh_dog=thresh, max_kp=max_kp)
    n_dev = int(mesh.devices.size)
    shard = NamedSharding(mesh, P(OBS_AXIS))
    out = []
    chunk_size = n_dev * sift_ops.BATCH_CHUNK
    for s in range(0, len(images), chunk_size):
        group = [np.asarray(im, np.float32) for im in images[s : s + chunk_size]]
        n_real = len(group)
        pad_to = -(-n_real // n_dev) * n_dev
        group = group + [np.zeros_like(group[0])] * (pad_to - n_real)
        feats = sift_ops.detect_sift_batch(
            group, thresh_dog=thresh, max_kp=max_kp,
            device_put_fn=lambda x: jax.device_put(x, shard),
            batch_chunk=pad_to,
        )
        out.extend(feats[:n_real])
    return out
