"""Batched-hypothesis RANSAC for the fundamental matrix.

Replaces the reference's control-flow-heavy host RANSAC (the `ransac`
package called from s2p/sift.py:181-184 and cv2.findFundamentalMat at
feature_tracks/ft_opencv.py:206-208) with the TPU-native pattern: all
hypotheses are generated and scored in parallel — sample 8-point minimal
sets, solve the normalized 8-point problem per hypothesis (batched SVD),
score every match against every hypothesis, pick the best, refit on its
inliers.

The inlier criterion is the max-of-both-images squared epipolar distance
with threshold thr^2, matching OpenCV's FM_RANSAC error
(ft_opencv.inliers_mask_from_fundamental_matrix, ft_opencv.py:143-185)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_HYPOTHESES = 512
MIN_SAMPLES = 8


def _normalize(pts):
    """Hartley normalization, batched over leading dims."""
    c = jnp.mean(pts, axis=-2, keepdims=True)
    centered = pts - c
    scale = jnp.sqrt(2.0) / jnp.maximum(
        jnp.mean(jnp.linalg.norm(centered, axis=-1), axis=-1), 1e-12
    )
    T = jnp.zeros(pts.shape[:-2] + (3, 3))
    T = T.at[..., 0, 0].set(scale)
    T = T.at[..., 1, 1].set(scale)
    T = T.at[..., 0, 2].set(-scale * c[..., 0, 0])
    T = T.at[..., 1, 2].set(-scale * c[..., 0, 1])
    T = T.at[..., 2, 2].set(1.0)
    return centered * scale[..., None, None], T


def _eight_point(pts1, pts2):
    """Normalized 8-point algorithm, batched: pts (..., S, 2) -> F (..., 3, 3).

    Runs in f32 internally: Hartley normalization makes f32 adequate, and
    TPU XLA implements SVD only for f32."""
    pts1 = pts1.astype(jnp.float32)
    pts2 = pts2.astype(jnp.float32)
    n1, T1 = _normalize(pts1)
    n2, T2 = _normalize(pts2)
    x1, y1 = n1[..., 0], n1[..., 1]
    x2, y2 = n2[..., 0], n2[..., 1]
    ones = jnp.ones_like(x1)
    # constraint rows: x2*x1 x2*y1 x2 y2*x1 y2*y1 y2 x1 y1 1
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (..., S, 9)
    # economy SVD gives the same (9, 9) Vh whenever S > 9; full_matrices is
    # only needed for the minimal S=8 case (null vector = 9th row of full
    # Vh). With full_matrices=True a large-S refit would materialize an
    # S x S U block (48k inliers -> ~9 GB).
    _, _, vh = jnp.linalg.svd(A, full_matrices=A.shape[-2] <= A.shape[-1])
    f = vh[..., -1, :]
    F = f.reshape(f.shape[:-1] + (3, 3))
    # enforce rank 2
    u, s, vt = jnp.linalg.svd(F)
    s = s.at[..., 2].set(0.0)
    F = u @ (s[..., None] * vt)
    # denormalize: F = T2^T F T1
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    norm = jnp.linalg.norm(F.reshape(F.shape[:-2] + (9,)), axis=-1)
    return F / jnp.maximum(norm, 1e-30)[..., None, None]


def _sym_epipolar_err(F, pts1, pts2):
    """Max-of-both squared epipolar distance, batched.

    F: (..., 3, 3); pts: (N, 2) -> (..., N)."""
    h1 = jnp.concatenate([pts1, jnp.ones_like(pts1[:, :1])], axis=-1)  # (N, 3)
    h2 = jnp.concatenate([pts2, jnp.ones_like(pts2[:, :1])], axis=-1)
    l2 = h1 @ jnp.swapaxes(F, -1, -2)  # (..., N, 3): lines in image 2
    l1 = h2 @ F  # (..., N, 3): lines in image 1
    num = jnp.sum(l2 * h2, axis=-1)  # (..., N)
    d2 = num ** 2 / jnp.maximum(l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-30)
    d1 = num ** 2 / jnp.maximum(l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-30)
    return jnp.maximum(d1, d2)


# hypotheses scored per tile: bounds the transient error matrix at
# HYP_TILE x N floats regardless of n_hypotheses (512 x 60k matches would
# otherwise materialize ~125 MB per intermediate)
HYP_TILE = 64


@partial(jax.jit, static_argnames=("n_hypotheses",))
def _ransac_core(pts1, pts2, valid, thr, seed, n_hypotheses=N_HYPOTHESES):
    n = pts1.shape[0]
    key = jax.random.PRNGKey(seed)
    # sample indices only among valid matches by inverting the validity CDF
    # (categorical sampling would materialize (H, 8, N) gumbel noise — GBs
    # at 60k matches; searchsorted over the (N,) cumsum is exact and tiny)
    cdf = jnp.cumsum(valid.astype(jnp.float32))
    u = jax.random.uniform(key, (n_hypotheses, MIN_SAMPLES)) * cdf[-1]
    samples = jnp.searchsorted(cdf, u, side="right")  # (H, 8)
    F = _eight_point(pts1[samples], pts2[samples])  # (H, 3, 3)
    tile = min(HYP_TILE, n_hypotheses)
    pad = (-n_hypotheses) % tile
    F_tiles = jnp.concatenate([F, jnp.zeros((pad, 3, 3), F.dtype)]).reshape(
        -1, tile, 3, 3
    )

    def count_tile(F_t):
        errs = _sym_epipolar_err(F_t, pts1, pts2)  # (tile, N)
        return jnp.sum((errs < thr ** 2) & valid[None, :], axis=-1)

    counts = jax.lax.map(count_tile, F_tiles).reshape(-1)[:n_hypotheses]
    best = jnp.argmax(counts)
    errs_best = _sym_epipolar_err(F[best], pts1, pts2)
    inl_best = (errs_best < thr ** 2) & valid
    return F[best], inl_best, counts[best]


def _np_eight_point(pts1, pts2):
    """Numpy normalized 8-point (batched over leading dims)."""
    def normalize(pts):
        c = pts.mean(axis=-2, keepdims=True)
        centered = pts - c
        scale = np.sqrt(2.0) / np.maximum(
            np.mean(np.linalg.norm(centered, axis=-1), axis=-1), 1e-12
        )
        T = np.zeros(pts.shape[:-2] + (3, 3))
        T[..., 0, 0] = scale
        T[..., 1, 1] = scale
        T[..., 0, 2] = -scale * c[..., 0, 0]
        T[..., 1, 2] = -scale * c[..., 0, 1]
        T[..., 2, 2] = 1.0
        return centered * scale[..., None, None], T

    n1, T1 = normalize(pts1)
    n2, T2 = normalize(pts2)
    x1, y1 = n1[..., 0], n1[..., 1]
    x2, y2 = n2[..., 0], n2[..., 1]
    A = np.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, np.ones_like(x1)], axis=-1
    )
    # economy SVD unless the null vector needs the full Vh (S <= 9); see
    # the jax twin above for the S x S memory blowup otherwise
    _, _, vh = np.linalg.svd(A, full_matrices=A.shape[-2] <= A.shape[-1])
    F = vh[..., -1, :].reshape(A.shape[:-2] + (3, 3))
    u, s, vt = np.linalg.svd(F)
    s[..., 2] = 0.0
    F = u @ (s[..., None] * vt)
    F = np.swapaxes(T2, -1, -2) @ F @ T1
    norm = np.linalg.norm(F.reshape(F.shape[:-2] + (9,)), axis=-1)
    return F / np.maximum(norm, 1e-30)[..., None, None]


def _np_sym_err(F, pts1, pts2):
    h1 = np.concatenate([pts1, np.ones_like(pts1[..., :1])], axis=-1)
    h2 = np.concatenate([pts2, np.ones_like(pts2[..., :1])], axis=-1)
    l2 = h1 @ np.swapaxes(F, -1, -2)
    l1 = h2 @ F
    num = np.sum(l2 * h2, axis=-1)
    d2 = num ** 2 / np.maximum(l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-30)
    d1 = num ** 2 / np.maximum(l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-30)
    return np.maximum(d1, d2)


def ransac_fundamental_many(pts1_list, pts2_list, thr=0.3, seed=0,
                            n_hypotheses=N_HYPOTHESES, refit=True,
                            adaptive=True, confidence=0.99):
    """Batched-across-pairs numpy RANSAC with the standard adaptive
    stopping rule.

    Same sampling stream, dtypes and refit as ransac_fundamental's numpy
    path — with adaptive=False the per-pair inliers are bit-identical to
    _ransac_numpy. With adaptive=True (default), hypotheses are scored in
    blocks and each pair stops once enough have been examined for the
    usual (1 - (1 - w^8)^k) >= confidence guarantee, where w is its best
    inlier ratio so far, capped at n_hypotheses. At the 100-view scale run
    (1350 pairs x ~5000 matches, high inlier ratios) the fixed-512 loop
    cost 223 s of the matching wall (BENCHMARKS.md round 3); the adaptive
    rule examines ~1/16th of the hypotheses on clean pairs.

    Scoring stays per-pair-tiled: one pair's (block, N) error transient
    fits the CPU cache, a (B, block, N) batch does not (measured 10x
    slower). Hypothesis generation IS batched across pairs per block
    (one LAPACK-batched eight-point call).

    Returns a list of (F (3,3) or None, inlier mask (N_b,) or None)."""
    B = len(pts1_list)
    if B == 0:
        return []
    pts1 = [np.asarray(p, np.float64) for p in pts1_list]
    pts2 = [np.asarray(p, np.float64) for p in pts2_list]
    valid = [np.isfinite(p1[:, 0]) & np.isfinite(p2[:, 0])
             for p1, p2 in zip(pts1, pts2)]
    pools = [np.where(v)[0] for v in valid]
    results = [(None, None)] * B

    H = n_hypotheses
    block = min(32 if adaptive else H, H)
    thr2 = thr ** 2
    log1mconf = np.log(max(1.0 - confidence, 1e-12))

    rngs = {}
    for b in range(B):
        if len(pools[b]) >= MIN_SAMPLES:
            rngs[b] = np.random.RandomState(seed)

    active = sorted(rngs)
    best_count = np.zeros(B, np.int64)
    best_F = [None] * B
    done_h = np.zeros(B, np.int64)

    while active:
        # sample this block's minimal sets (same per-pair stream as the
        # fixed-H path: randint fills row-major, so consecutive blocks
        # reproduce the upfront (H, 8) draw exactly)
        samp = np.stack([
            pools[b][rngs[b].randint(0, len(pools[b]), size=(block, MIN_SAMPLES))]
            for b in active
        ])  # (B_a, block, 8)
        p1s = np.stack([pts1[b][samp[k]] for k, b in enumerate(active)])
        p2s = np.stack([pts2[b][samp[k]] for k, b in enumerate(active)])
        F_blk = _np_eight_point(p1s.astype(np.float32), p2s.astype(np.float32))

        next_active = []
        for k, b in enumerate(active):
            errs = _np_sym_err(F_blk[k], pts1[b], pts2[b])  # (block, N_b)
            counts = ((errs < thr2) & valid[b][None, :]).sum(axis=-1)
            i = int(np.argmax(counts))
            if counts[i] > best_count[b]:
                best_count[b] = counts[i]
                best_F[b] = F_blk[k, i]
            done_h[b] += block
            if done_h[b] >= H:
                continue
            w = best_count[b] / max(len(pools[b]), 1)
            # hypotheses needed for the confidence guarantee at ratio w
            denom = np.log1p(-min(w, 1.0 - 1e-12) ** MIN_SAMPLES)
            needed = H if denom >= 0 else log1mconf / denom
            if done_h[b] < needed:
                next_active.append(b)
        active = next_active

    for b in rngs:
        if best_count[b] < MIN_SAMPLES:
            continue
        F_b = best_F[b].astype(np.float64)
        inl = (_np_sym_err(F_b, pts1[b], pts2[b]) < thr2) & valid[b]
        if refit and inl.sum() >= MIN_SAMPLES:
            F_b = _np_eight_point(
                pts1[b][inl].astype(np.float32), pts2[b][inl].astype(np.float32)
            )
            inl = (_np_sym_err(F_b, pts1[b], pts2[b]) < thr2) & valid[b]
        results[b] = (np.asarray(F_b, np.float64), inl)
    return results


def _ransac_numpy(pts1, pts2, valid, thr, seed, n_hypotheses, refit):
    """Pure-numpy RANSAC (host fallback when no CPU jax backend exists)."""
    rng = np.random.RandomState(seed)
    idx_pool = np.where(valid)[0]
    if len(idx_pool) < MIN_SAMPLES:
        return None, None
    samples = idx_pool[rng.randint(0, len(idx_pool), size=(n_hypotheses, MIN_SAMPLES))]
    F = _np_eight_point(pts1[samples].astype(np.float32), pts2[samples].astype(np.float32))
    # score in hypothesis tiles to bound the (H, N) transient (see HYP_TILE)
    counts = np.empty(n_hypotheses, dtype=np.int64)
    for s in range(0, n_hypotheses, HYP_TILE):
        errs = _np_sym_err(F[s : s + HYP_TILE], pts1, pts2)
        counts[s : s + HYP_TILE] = ((errs < thr ** 2) & valid[None, :]).sum(axis=-1)
    best = int(np.argmax(counts))
    if counts[best] < MIN_SAMPLES:
        return None, None
    F_best = F[best]
    inliers = (_np_sym_err(F_best, pts1, pts2) < thr ** 2) & valid
    if refit:
        F_best = _np_eight_point(pts1[inliers].astype(np.float32), pts2[inliers].astype(np.float32))
        errs = _np_sym_err(F_best, pts1, pts2)
        inliers = (errs < thr ** 2) & valid
    return np.asarray(F_best, dtype=np.float64), inliers


def _preferred_device():
    """RANSAC runs on the host CPU device when the default backend is an
    accelerator: the batched-SVD hypothesis program is tiny (ms of work),
    and the axon TPU AOT compiler aborts on it (internal
    'Check failed: buffer != nullptr')."""
    import jax

    if jax.default_backend() != "cpu":
        try:
            return jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            return None
    return None


def ransac_fundamental(pts1, pts2, thr=0.3, seed=0, n_hypotheses=N_HYPOTHESES,
                       refit=True):
    """RANSAC fundamental matrix from Nx2 matched points.

    Returns (F (3, 3) numpy, inlier mask (N,) bool numpy) or (None, None)."""
    import contextlib

    pts1 = np.asarray(pts1, dtype=np.float64)
    pts2 = np.asarray(pts2, dtype=np.float64)
    n = pts1.shape[0]
    if n < MIN_SAMPLES:
        return None, None
    valid = np.isfinite(pts1[:, 0]) & np.isfinite(pts2[:, 0])
    if jax.default_backend() != "cpu" and _preferred_device() is None:
        # no CPU jax backend in this deployment (axon-only): pure numpy path
        return _ransac_numpy(pts1, pts2, valid, thr, seed, n_hypotheses, refit)
    dev = _preferred_device()

    # bucket-pad the match count (valid=False filler) so _ransac_core
    # compiles once per size bucket instead of once per exact match count
    # (pipelines call this per pair with a different count every time)
    n_pad = max(MIN_SAMPLES, 1 << int(np.ceil(np.log2(n))))
    if n_pad > n:
        pts1 = np.concatenate([pts1, np.zeros((n_pad - n, 2))])
        pts2 = np.concatenate([pts2, np.zeros((n_pad - n, 2))])
        valid = np.concatenate([valid, np.zeros(n_pad - n, bool)])

    def put(x):
        # committing the inputs to the device pins the jitted computation
        # there (jax.default_device alone is not honored under the axon
        # platform aliasing)
        a = jnp.asarray(x)
        return jax.device_put(a, dev) if dev is not None else a

    ctx = jax.default_device(dev) if dev is not None else contextlib.nullcontext()
    with ctx:
        F, inliers, count = _ransac_core(
            put(pts1), put(pts2), put(valid),
            float(thr), int(seed), n_hypotheses=n_hypotheses,
        )
        inliers = np.asarray(inliers)
        if int(count) < MIN_SAMPLES:
            return None, None
        if refit:
            # least-squares refit on all inliers, then re-derive the inliers
            F = _eight_point(put(pts1[inliers]), put(pts2[inliers]))
            errs = np.asarray(_sym_epipolar_err(F, put(pts1), put(pts2)))
            inliers = (errs < thr ** 2) & valid
    return np.asarray(F), inliers[:n]
