"""Pallas TPU kernel: tiled 2-nearest-neighbour descriptor matching.

The counterpart of the reference's native brute-force matcher
(3rdparty/sift/simd/sift4ctypes.cpp:125-195). The jnp implementation in
ops/match.py scans row blocks with lax; this kernel goes one level lower:

  * grid (row_block i, col_block j) — TPU grid steps run sequentially, so
    VMEM scratch carries the running top-2 across the j dimension;
  * the (BM, 128) x (128, BN) distance cross-term runs on the MXU via
    pl.dot while the top-2 merge runs on the VPU;
  * epipolar gating is fused: the kernel receives per-row epipolar lines
    (l = F^T h_i) and per-column homogeneous points, so the gating mask
    never materializes in HBM;
  * descriptors stream through VMEM tile by tile — HBM traffic is
    N1*128 + N1/BM * N2*128 floats, independent of the (N1 x N2) logical
    distance matrix.

Used on TPU backends; ops/match.py keeps the lax implementation as the
CPU/interpret fallback (the kernel itself also runs under
pallas interpret mode for testing)."""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 256  # row tile (keypoints of image i)
BN = 512  # column tile (keypoints of image j)
BIG = 1e12


def _kernel(di_ref, li_ref, vi_ref, dj_ref, hj_ref, vj_ref, thr_ref,
            d1_ref, d2_ref, idx_ref, c_d1, c_d2, c_idx):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        c_d1[:] = jnp.full((BM, 1), BIG, jnp.float32)
        c_d2[:] = jnp.full((BM, 1), BIG, jnp.float32)
        c_idx[:] = jnp.zeros((BM, 1), jnp.int32)

    di = di_ref[:]  # (BM, 128)
    dj = dj_ref[:]  # (BN, 128)
    # squared euclidean distances: |a|^2 + |b|^2 - 2 a.b (MXU cross term)
    cross = jax.lax.dot_general(
        di, dj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BM, BN)
    sq_i = jnp.sum(di * di, axis=1, keepdims=True)
    sq_j = jnp.sum(dj * dj, axis=1, keepdims=True)
    dist = jnp.maximum(sq_i + sq_j.T - 2.0 * cross, 0.0)

    # fused epipolar gating: |l_i . h_j|^2 <= thr^2 * (l_a^2 + l_b^2)
    li = li_ref[:]  # (BM, 3)
    hj = hj_ref[:]  # (BN, 3)
    num = jax.lax.dot_general(
        li, hj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BM, BN)
    denom = li[:, 0:1] ** 2 + li[:, 1:2] ** 2  # (BM, 1)
    thr = thr_ref[0]
    gate_ok = num * num <= (thr * thr) * denom

    valid = (vi_ref[:] > 0) & (vj_ref[:].T > 0) & gate_ok  # (BM, BN)
    big32 = jnp.float32(BIG)  # f32 literal: a python float would enter the
    # jaxpr as f64 under x64 and insert a truncf Mosaic cannot legalize
    dist = jnp.where(valid, dist, big32)

    # local top-2 within this column tile. argmin is computed as a min over
    # masked int32 iota (the argmin primitive emits int64 indices under
    # x64, which Mosaic rejects)
    v1 = jnp.min(dist, axis=1, keepdims=True)  # (BM, 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    arg1 = jnp.min(
        jnp.where(dist <= v1, col_ids, jnp.int32(2 ** 30)), axis=1, keepdims=True
    )  # (BM, 1) int32
    dist_wo = jnp.where(col_ids == arg1, big32, dist)
    v2 = jnp.min(dist_wo, axis=1, keepdims=True)
    g_idx = arg1 + j * BN

    # merge (c_d1, c_d2) with (v1, v2)
    old1, old2, oldi = c_d1[:], c_d2[:], c_idx[:]
    new1 = jnp.minimum(old1, v1)
    newi = jnp.where(v1 < old1, g_idx, oldi)
    # second-best = min of the losers
    new2 = jnp.minimum(jnp.maximum(old1, v1), jnp.minimum(old2, v2))
    c_d1[:] = new1
    c_d2[:] = new2
    c_idx[:] = newi

    @pl.when(j == n_j - 1)
    def _():
        d1_ref[:] = c_d1[:]
        d2_ref[:] = c_d2[:]
        idx_ref[:] = c_idx[:]


def _kernel_b(di_ref, li_ref, vi_ref, dj_ref, hj_ref, vj_ref, thr_ref,
              d1_ref, d2_ref, idx_ref, c_d1, c_d2, c_idx):
    """Pair-batched twin of _kernel: grid (pair b, row tile i, col tile j),
    j innermost so the VMEM top-2 carry stays valid per (b, i); the
    epipolar threshold comes from SMEM per pair (1e9 disables gating)."""
    b = pl.program_id(0)
    j = pl.program_id(2)
    n_j = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        c_d1[:] = jnp.full((BM, 1), BIG, jnp.float32)
        c_d2[:] = jnp.full((BM, 1), BIG, jnp.float32)
        c_idx[:] = jnp.zeros((BM, 1), jnp.int32)

    di = di_ref[0]  # (BM, 128)
    dj = dj_ref[0]  # (BN, 128)
    cross = jax.lax.dot_general(
        di, dj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    sq_i = jnp.sum(di * di, axis=1, keepdims=True)
    sq_j = jnp.sum(dj * dj, axis=1, keepdims=True)
    dist = jnp.maximum(sq_i + sq_j.T - 2.0 * cross, 0.0)

    li = li_ref[0]  # (BM, 3)
    hj = hj_ref[0]  # (BN, 3)
    num = jax.lax.dot_general(
        li, hj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    denom = li[:, 0:1] ** 2 + li[:, 1:2] ** 2
    thr = thr_ref[b]
    gate_ok = num * num <= (thr * thr) * denom

    valid = (vi_ref[0] > 0) & (vj_ref[0].T > 0) & gate_ok
    big32 = jnp.float32(BIG)
    dist = jnp.where(valid, dist, big32)

    v1 = jnp.min(dist, axis=1, keepdims=True)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    arg1 = jnp.min(
        jnp.where(dist <= v1, col_ids, jnp.int32(2 ** 30)), axis=1, keepdims=True
    )
    dist_wo = jnp.where(col_ids == arg1, big32, dist)
    v2 = jnp.min(dist_wo, axis=1, keepdims=True)
    g_idx = arg1 + j * BN

    old1, old2, oldi = c_d1[:], c_d2[:], c_idx[:]
    new1 = jnp.minimum(old1, v1)
    newi = jnp.where(v1 < old1, g_idx, oldi)
    new2 = jnp.minimum(jnp.maximum(old1, v1), jnp.minimum(old2, v2))
    c_d1[:] = new1
    c_d2[:] = new2
    c_idx[:] = newi

    @pl.when(j == n_j - 1)
    def _():
        d1_ref[0] = c_d1[:]
        d2_ref[0] = c_d2[:]
        idx_ref[0] = c_idx[:]




def _kernel_b_i8(di_ref, li_ref, vi_ref, dj_ref, hj_ref, vj_ref, thr_ref,
                 d1_ref, d2_ref, idx_ref, c_d1, c_d2, c_idx):
    """int8-MXU twin of _kernel_b. SIFT descriptors are EXACT uint8
    (0..255 quantized, ops/sift.py); stored as (d - 128) int8, the cross
    term (a-128).(b-128) runs on the MXU's int8 path with s32 accumulate
    — halving the descriptor VMEM/HBM traffic and using the MXU's higher
    int8 rate. Everything elementwise converts to f32 immediately: the
    max distance 128 * 255^2 = 8 323 200 < 2^24, so f32 stays exact and
    the result is bit-identical to the f32 kernel (pinned in
    tests/test_pallas_match.py). A full-int32-VPU variant was measured
    SLOWER than f32 (the kernel is VPU-bound; BENCHMARKS.md round 3).
    Reference counterpart: sift4ctypes.cpp:162-192."""
    b = pl.program_id(0)
    j = pl.program_id(2)
    n_j = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        c_d1[:] = jnp.full((BM, 1), BIG, jnp.float32)
        c_d2[:] = jnp.full((BM, 1), BIG, jnp.float32)
        c_idx[:] = jnp.zeros((BM, 1), jnp.int32)

    di = di_ref[0]  # (BM, 128) int8, value = descriptor - 128
    dj = dj_ref[0]  # (BN, 128) int8
    cross = jax.lax.dot_general(
        di, dj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )  # (BM, BN) s32, exact
    # hybrid int8-MXU / f32-VPU: only the O(BM*BN*128) cross term runs in
    # int8; everything elementwise converts to f32 immediately (every value
    # is an exact integer < 2^24, so f32 arithmetic stays exact and the
    # result is bit-identical to the f32 kernel). A full-int32 VPU variant
    # measured SLOWER than f32 (BENCHMARKS.md round 3): the kernel is
    # VPU-bound and int32 compare/min throughput is below f32.
    dif = di.astype(jnp.float32)
    djf = dj.astype(jnp.float32)
    sq_i = jnp.sum(dif * dif, axis=1, keepdims=True)
    sq_j = jnp.sum(djf * djf, axis=1, keepdims=True)
    # |a - b|^2 = |a'|^2 + |b'|^2 - 2 a'.b' with a' = a-128, b' = b-128
    dist = jnp.maximum(sq_i + sq_j.T - 2.0 * cross.astype(jnp.float32), 0.0)

    li = li_ref[0]  # (BM, 3) f32
    hj = hj_ref[0]  # (BN, 3) f32
    num = jax.lax.dot_general(
        li, hj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    denom = li[:, 0:1] ** 2 + li[:, 1:2] ** 2
    thr = thr_ref[b]
    gate_ok = num * num <= (thr * thr) * denom

    valid = (vi_ref[0] > 0) & (vj_ref[0].T > 0) & gate_ok
    big32 = jnp.float32(BIG)
    dist = jnp.where(valid, dist, big32)

    v1 = jnp.min(dist, axis=1, keepdims=True)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    arg1 = jnp.min(
        jnp.where(dist <= v1, col_ids, jnp.int32(2 ** 30)), axis=1, keepdims=True
    )
    dist_wo = jnp.where(col_ids == arg1, big32, dist)
    v2 = jnp.min(dist_wo, axis=1, keepdims=True)
    g_idx = arg1 + j * BN

    old1, old2, oldi = c_d1[:], c_d2[:], c_idx[:]
    new1 = jnp.minimum(old1, v1)
    newi = jnp.where(v1 < old1, g_idx, oldi)
    new2 = jnp.minimum(jnp.maximum(old1, v1), jnp.minimum(old2, v2))
    c_d1[:] = new1
    c_d2[:] = new2
    c_idx[:] = newi

    @pl.when(j == n_j - 1)
    def _():
        d1_ref[0] = c_d1[:]
        d2_ref[0] = c_d2[:]
        idx_ref[0] = c_idx[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_2nn_batched_i8(desc_i, desc_j, lines_i, hpts_j, valid_i, valid_j,
                          epi_thr, interpret=False):
    """int8 variant of pallas_2nn_batched: desc_* are int8 (descriptor
    value minus 128); distances and results are bit-identical to the f32
    kernel on integer-valued descriptors. Same packed (B, 3, N1) return."""
    B, n1 = desc_i.shape[0], desc_i.shape[1]
    n2 = desc_j.shape[1]
    pad1 = (-n1) % BM
    pad2 = (-n2) % BN
    di = jnp.pad(desc_i.astype(jnp.int8), ((0, 0), (0, pad1), (0, 0)))
    dj = jnp.pad(desc_j.astype(jnp.int8), ((0, 0), (0, pad2), (0, 0)))
    li = jnp.pad(lines_i.astype(jnp.float32), ((0, 0), (0, pad1), (0, 0)))
    hj = jnp.pad(hpts_j.astype(jnp.float32), ((0, 0), (0, pad2), (0, 0)))
    vi = jnp.pad(valid_i.astype(jnp.float32)[..., None], ((0, 0), (0, pad1), (0, 0)))
    vj = jnp.pad(valid_j.astype(jnp.float32)[..., None], ((0, 0), (0, pad2), (0, 0)))
    thr = epi_thr.astype(jnp.float32)

    grid = (B, di.shape[1] // BM, dj.shape[1] // BN)
    with jax.enable_x64(False):
        d1, d2, idx = pl.pallas_call(
            _kernel_b_i8,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BM, 128), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BM, 3), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BM, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BN, 128), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BN, 3), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BN, 1), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, BM, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BM, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BM, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, di.shape[1], 1), jnp.float32),
                jax.ShapeDtypeStruct((B, di.shape[1], 1), jnp.float32),
                jax.ShapeDtypeStruct((B, di.shape[1], 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((BM, 1), jnp.float32),
                pltpu.VMEM((BM, 1), jnp.float32),
                pltpu.VMEM((BM, 1), jnp.int32),
            ],
            interpret=interpret,
        )(di, li, vi, dj, hj, vj, thr)
    return jnp.stack(
        [d1[:, :n1, 0], d2[:, :n1, 0], idx[:, :n1, 0].astype(jnp.float32)], axis=1
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_2nn_batched(desc_i, desc_j, lines_i, hpts_j, valid_i, valid_j,
                       epi_thr, interpret=False):
    """Batched-pair 2-NN: ONE kernel dispatch for all pairs, ONE packed
    fetch — on a tunneled device the per-pair dispatch + 3-array fetch of
    the single-pair path costs ~100 ms of round trips per pair.

    desc_i: (B, N1, 128); desc_j: (B, N2, 128); lines_i: (B, N1, 3);
    hpts_j: (B, N2, 3); valid_*: (B, N) 0/1; epi_thr: (B,) per-pair
    threshold (1e9 disables the gate).
    Returns ONE (B, 3, N1) f32 array stacking (d1, d2, nn_index)."""
    B, n1 = desc_i.shape[0], desc_i.shape[1]
    n2 = desc_j.shape[1]
    pad1 = (-n1) % BM
    pad2 = (-n2) % BN
    di = jnp.pad(desc_i.astype(jnp.float32), ((0, 0), (0, pad1), (0, 0)))
    dj = jnp.pad(desc_j.astype(jnp.float32), ((0, 0), (0, pad2), (0, 0)))
    li = jnp.pad(lines_i.astype(jnp.float32), ((0, 0), (0, pad1), (0, 0)))
    hj = jnp.pad(hpts_j.astype(jnp.float32), ((0, 0), (0, pad2), (0, 0)))
    vi = jnp.pad(valid_i.astype(jnp.float32)[..., None], ((0, 0), (0, pad1), (0, 0)))
    vj = jnp.pad(valid_j.astype(jnp.float32)[..., None], ((0, 0), (0, pad2), (0, 0)))
    thr = epi_thr.astype(jnp.float32)

    grid = (B, di.shape[1] // BM, dj.shape[1] // BN)
    with jax.enable_x64(False):
        d1, d2, idx = pl.pallas_call(
            _kernel_b,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BM, 128), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BM, 3), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BM, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BN, 128), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BN, 3), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BN, 1), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, BM, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BM, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BM, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, di.shape[1], 1), jnp.float32),
                jax.ShapeDtypeStruct((B, di.shape[1], 1), jnp.float32),
                jax.ShapeDtypeStruct((B, di.shape[1], 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((BM, 1), jnp.float32),
                pltpu.VMEM((BM, 1), jnp.float32),
                pltpu.VMEM((BM, 1), jnp.int32),
            ],
            interpret=interpret,
        )(di, li, vi, dj, hj, vj, thr)
    return jnp.stack(
        [d1[:, :n1, 0], d2[:, :n1, 0], idx[:, :n1, 0].astype(jnp.float32)], axis=1
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_2nn(desc_i, desc_j, lines_i, hpts_j, valid_i, valid_j, epi_thr,
               interpret=False):
    """Run the tiled 2-NN kernel.

    desc_i: (N1, 128) f32; desc_j: (N2, 128) f32
    lines_i: (N1, 3) epipolar lines of image-i keypoints in image j
             (pass zeros with lines_i[:, 2] = 1 to disable gating along
             with a large epi_thr)
    hpts_j: (N2, 3) homogeneous pixel coords of image-j keypoints
    valid_*: (N,) float32 validity (0/1)
    Returns (d1 (N1,), d2 (N1,), idx (N1,) int32)."""
    n1, n2 = desc_i.shape[0], desc_j.shape[0]
    pad1 = (-n1) % BM
    pad2 = (-n2) % BN
    di = jnp.pad(desc_i.astype(jnp.float32), ((0, pad1), (0, 0)))
    dj = jnp.pad(desc_j.astype(jnp.float32), ((0, pad2), (0, 0)))
    li = jnp.pad(lines_i.astype(jnp.float32), ((0, pad1), (0, 0)))
    hj = jnp.pad(hpts_j.astype(jnp.float32), ((0, pad2), (0, 0)))
    vi = jnp.pad(valid_i.astype(jnp.float32)[:, None], ((0, pad1), (0, 0)))
    vj = jnp.pad(valid_j.astype(jnp.float32)[:, None], ((0, pad2), (0, 0)))
    thr = jnp.asarray([epi_thr], jnp.float32)

    grid = (di.shape[0] // BM, dj.shape[0] // BN)
    # trace the kernel with 32-bit types: under jax_enable_x64 the Mosaic
    # lowering receives 64-bit scalars it cannot legalize
    with jax.enable_x64(False):
        return _call_kernel(di, li, vi, dj, hj, vj, thr, grid, n1, interpret)


def _call_kernel(di, li, vi, dj, hj, vj, thr, grid, n1, interpret):
    d1, d2, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 128), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((BM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((di.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((di.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((di.shape[0], 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BM, 1), jnp.float32),
            pltpu.VMEM((BM, 1), jnp.float32),
            pltpu.VMEM((BM, 1), jnp.int32),
        ],
        interpret=interpret,
    )(di, li, vi, dj, hj, vj, thr)
    return d1[:n1, 0], d2[:n1, 0], idx[:n1, 0]
