"""Batched tie-point triangulation.

Replaces the reference's native stereo triangulation kernel
(c/rpc.c:480-514 `rpc_height` + c/disp_to_h.c:40-64, called per match from
a Python per-pair loop in feature_tracks/ft_triangulate.py:57-127) with a
fully batched design:

* every (pair, track) observation duo across ALL stereo pairs is flattened
  into one giant batch and triangulated in a single fused XLA computation;
* the per-track running average over pairs (ft_triangulate.py:77-81) becomes
  a segment mean.

The altitude search itself keeps the reference's exact iteration semantics
(secant along the epipolar curve with hstep=1, lambda-stop 1e-5, <=100
iterations — c/rpc.c:475-514) but with a fixed trip count and masked
convergence freezing, which XLA compiles to straight-line code.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sat_bundleadjust_tpu.models import ellipsoid
from sat_bundleadjust_tpu.models.rpc import RPCModel, rpc_localization, rpc_projection

RPCH_ITERS = 24  # fixed trip count (reference caps at 100, converges in ~5)
RPCH_HSTEP = 1.0
RPCH_LAMBDA_STOP = 1e-5


def _pair_correspondence(rpc_a: RPCModel, rpc_b: RPCModel, x, y, h):
    """Map pixel (x=col, y=row) of image a at altitude h into image b.

    Equivalent of eval_rpc_pair (c/rpc.c:455-462): localize with a, project
    with b."""
    lon, lat = rpc_localization(rpc_a, x, y, h)
    col, row = rpc_projection(rpc_b, lon, lat, h)
    return col, row


def rpc_triangulation(rpc_a: RPCModel, rpc_b: RPCModel, pts_a, pts_b):
    """Triangulate matched pixel pairs between two RPC cameras.

    Args:
      rpc_a, rpc_b: RPCModel; leaves either scalar or batched to match pts
      pts_a, pts_b: (..., 2) matched (col, row) coordinates
    Returns:
      pts3d: (..., 3) ECEF coordinates
      err:   (...,) residual distance in image b (px)

    Reference: c/rpc.c:480-514 (rpc_height) + disp_to_h.c:40-64 +
    ft_triangulate.rpc_triangulation (ft_triangulate.py:37-54)."""
    xa, ya = pts_a[..., 0], pts_a[..., 1]
    xb, yb = pts_b[..., 0], pts_b[..., 1]

    def body(_, state):
        h, err, done = state
        px, py = _pair_correspondence(rpc_a, rpc_b, xa, ya, h)
        qx, qy = _pair_correspondence(rpc_a, rpc_b, xa, ya, h + RPCH_HSTEP)
        ax, ay = qx - px, qy - py
        bx, by = xb - px, yb - py
        a2 = ax * ax + ay * ay
        lam = (ax * bx + ay * by) / jnp.where(a2 == 0, 1.0, a2)
        zx, zy = px + lam * ax, py + lam * ay
        new_err = jnp.hypot(zx - xb, zy - yb)
        h_new = jnp.where(done, h, h + lam * RPCH_HSTEP)
        err_new = jnp.where(done, err, new_err)
        done_new = done | (jnp.abs(lam) < RPCH_LAMBDA_STOP)
        return h_new, err_new, done_new

    h0 = jnp.zeros_like(xa)
    err0 = jnp.zeros_like(xa)
    done0 = jnp.zeros_like(xa, dtype=bool)

    # batch-wide early exit: the reference C loop exits per point as soon
    # as |lambda| < 1e-5 (rpc.c:505-508, typical ~5 iterations); a fixed
    # trip count pays all RPCH_ITERS for every batch. Stopping when EVERY
    # lane is frozen keeps identical results (converged lanes are masked)
    # at ~4x less work.
    def cond(state):
        i, _, _, done = state
        return (i < RPCH_ITERS) & ~jnp.all(done)

    def wbody(state):
        i, h, err, done = state
        h, err, done = body(i, (h, err, done))
        return i + 1, h, err, done

    _, h, err, _ = jax.lax.while_loop(cond, wbody, (0, h0, err0, done0))

    lon, lat = rpc_localization(rpc_a, xa, ya, h)
    x, y, z = ellipsoid.latlon_to_ecef(lat, lon, h)
    return jnp.stack([x, y, z], axis=-1), err


def linear_triangulation(P1, P2, pts1, pts2):
    """DLT triangulation with two 3x4 projection matrices, batched.

    Reference: ft_triangulate.linear_triangulation_multiple_pts
    (ft_triangulate.py:18-34, via cv2.triangulatePoints)."""
    P1 = jnp.asarray(P1)
    P2 = jnp.asarray(P2)

    def rows(P, pts):
        # pts: (..., 2)
        return jnp.stack(
            [
                pts[..., 0:1] * P[2, :] - P[0, :],
                pts[..., 1:2] * P[2, :] - P[1, :],
            ],
            axis=-2,
        ).reshape(pts.shape[:-1] + (2, 4))

    A = jnp.concatenate([rows(P1, pts1), rows(P2, pts2)], axis=-2)  # (..., 4, 4)
    _, _, vh = jnp.linalg.svd(A)
    X = vh[..., -1, :]
    return X[..., :3] / X[..., 3:4]


def build_triangulation_batch(C, pairs_to_triangulate):
    """Flatten (pair, track) observation duos into one batch (host-side).

    Args:
      C: (2M, N) correspondence matrix (NaN where unobserved)
      pairs_to_triangulate: list of (i, j) camera index tuples
    Returns dict of numpy arrays:
      cam_a, cam_b: (B,) camera indices per entry
      pts_a, pts_b: (B, 2) observations
      track: (B,) track index per entry
    """
    n_cam = C.shape[0] // 2
    mask = ~np.isnan(C[::2])
    cam_a, cam_b, pa, pb, track = [], [], [], [], []
    for (ci, cj) in pairs_to_triangulate:
        if ci >= n_cam or cj >= n_cam:
            continue
        sel = np.where(mask[ci] & mask[cj])[0]
        if sel.size == 0:
            continue
        cam_a.append(np.full(sel.size, ci, dtype=np.int32))
        cam_b.append(np.full(sel.size, cj, dtype=np.int32))
        pa.append(C[2 * ci : 2 * ci + 2, sel].T)
        pb.append(C[2 * cj : 2 * cj + 2, sel].T)
        track.append(sel.astype(np.int32))
    if not cam_a:
        return None
    return {
        "cam_a": np.concatenate(cam_a),
        "cam_b": np.concatenate(cam_b),
        "pts_a": np.concatenate(pa, axis=0),
        "pts_b": np.concatenate(pb, axis=0),
        "track": np.concatenate(track),
    }


def init_pts3d(C, cameras, cam_model, pairs_to_triangulate, verbose=False):
    """Initialize one 3-D point per track: mean of all pairwise triangulations.

    Reference: ft_triangulate.init_pts3d (ft_triangulate.py:57-127), which
    loops over pairs on the host; here a single device launch handles all
    pairs, followed by a segment mean over track ids.

    Args:
      C: (2M, N) correspondence matrix
      cameras: list of RPCModel (cam_model="rpc") or 3x4 matrices
      cam_model: "rpc" | "affine" | "perspective"
      pairs_to_triangulate: list of (i, j)
    Returns:
      (N, 3) float array of ECEF points (zeros for tracks with no pair)
    """
    import os

    from sat_bundleadjust_tpu.models.rpc import stack_rpcs

    n_pts = C.shape[1]
    batch = build_triangulation_batch(C, pairs_to_triangulate)
    if batch is None:
        return np.zeros((n_pts, 3))

    # chunk the (pair, track) duo axis: a 100-view scene produces millions
    # of duos and the per-duo RPC gather + Newton temps (~3 KB f64 each)
    # blew HBM on the first config-#4 scale run (round 3). Chunks pad to a
    # fixed size so every slice reuses one compilation; per-chunk segment
    # sums accumulate on the host.
    B = int(batch["track"].shape[0])
    chunk = int(os.environ.get("SATBA_TRIANG_CHUNK", 500_000))
    if cam_model != "rpc":
        P = jnp.stack([jnp.asarray(c) for c in cameras])
    else:
        rpcs = stack_rpcs(cameras)

    sums = np.zeros((n_pts, 3))
    counts = np.zeros(n_pts)
    for s in range(0, B, chunk):
        n_real = min(chunk, B - s) if B > chunk else B
        pad = (chunk - n_real) if B > chunk else 0
        sl = slice(s, s + n_real)
        cam_a = np.pad(batch["cam_a"][sl], (0, pad))
        cam_b = np.pad(batch["cam_b"][sl], (0, pad))
        pts_a = np.pad(batch["pts_a"][sl], ((0, pad), (0, 0)))
        pts_b = np.pad(batch["pts_b"][sl], ((0, pad), (0, 0)))
        # padded duos accumulate into the sentinel segment n_pts (dropped)
        track = np.pad(batch["track"][sl], (0, pad), constant_values=n_pts)
        if cam_model == "rpc":
            rpc_a = jax.tree.map(lambda leaf: leaf[cam_a], rpcs)
            rpc_b = jax.tree.map(lambda leaf: leaf[cam_b], rpcs)
            pts3d, _ = rpc_triangulation(
                rpc_a, rpc_b, jnp.asarray(pts_a), jnp.asarray(pts_b)
            )
        else:
            pts3d = jax.vmap(
                lambda ca, cb, a, b: linear_triangulation(P[ca], P[cb], a, b)
            )(jnp.asarray(cam_a), jnp.asarray(cam_b),
              jnp.asarray(pts_a), jnp.asarray(pts_b))
        t = jnp.asarray(track)
        sums += np.asarray(
            jax.ops.segment_sum(pts3d, t, num_segments=n_pts + 1)
        )[:n_pts]
        counts += np.asarray(
            jax.ops.segment_sum(jnp.ones_like(t, dtype=pts3d.dtype), t, num_segments=n_pts + 1)
        )[:n_pts]
    return sums / np.maximum(counts, 1.0)[:, None]
