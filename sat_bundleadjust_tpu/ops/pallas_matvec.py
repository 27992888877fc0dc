"""Fused Pallas TPU kernel for the Schur-complement CG matvec.

The CG matvec wz-part computes, for x (M, P):

    wz[m] = sum_{k: cam(k)=m} What_k ( sum_{k' in pt(k)} What_k'^T x[cam(k')] )

with What = W L, L = chol(V^-1) folded once per LM step. The shipped XLA
path ("aos", ops/lm.py) does this with two K-sized row gathers, which a
round-4 device decomposition showed are per-ROW bound at ~3 ns/row and
are 4.4 of the 4.3 ms fused step at 1000 cams / 800k obs
(scripts/bench_matvec2.py; the dense reductions are ~0.5 ms each). Pure-
XLA one-hot matmul replacements lose — every intermediate is materialized
in HBM (scripts/bench_matvec3.py: 6.2-7.3 ms).

This kernel keeps the whole chain in VMEM, in the POINT-MAJOR layout
only (camera-major W is never built):

  * both camera-axis crossings (fetch x[cam(k)]; scatter y_k into wz) are
    TWO-LEVEL ONE-HOT MATMULS: with cam = 64*hi + lo, a (R, 64) one-hot
    of lo rides the MXU against a re-tiled x table / the y tile, and the
    (R, H) hi mask selects — one MXU dot per crossing per chunk, one-hots
    built on the VPU and never written to HBM;
  * per-point reductions (over the Tp obs of each track) are aligned
    sublane reshapes — points are contiguous in this layout;
  * numerical contract: the operator must be EXACTLY the f32 operator or
    CG diverges at 1000-cam conditioning (measured in bench_matvec3:
    bf16 W makes S indefinite; per-step bf16 rounding of the Krylov
    vector gets conditioning-amplified). So W stays f32 and every value
    that crosses a one-hot dot (x, y) is decomposed into THREE exact
    bf16 terms — each term survives its single-product dot exactly, and
    the f32 recombination reproduces the value to ~2^-27, i.e. f32
    roundoff.

Reference counterpart being replaced: the repeated residual evaluations
inside scipy TRF's implicit normal equations (ba_core.py:284-297).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

LO = 64  # low-level one-hot width (lanes of the one-hot dot)
SPLIT = 3  # bf16 split terms: 3 -> f32-exact crossing


def _cdiv(a, b):
    return -(-a // b)


def build_wh_operands(W, Vinv, prob, n_cam, block_pts=512):
    """Per-LM-step operands for the fused matvec.

    W: (K, P, 3) f32 per-obs blocks; Vinv: (N, 3, 3) SPD. Returns
    (Wh_flat, c_flat, meta): Wh_flat (Kp, 9) f32 in j-major layout
    (col = j*3 + p holds What[k][p][j]); c_flat (1, Kp) int32 camera ids
    with sentinel n_cam for padding; meta dict of static shape info.
    Kp = N_pad * Tp rows in point-major order (track n's observations at
    rows n*Tp..n*Tp+Tp-1, zero rows beyond the track's length)."""
    P = W.shape[1]
    N = Vinv.shape[0]
    Tp = prob.pt_gather.shape[1]
    Np = _cdiv(N, block_pts) * block_pts
    Kp = Np * Tp
    H = _cdiv(n_cam + 1, LO)

    # fold: What[k] = W[k] @ L_n with L_n = chol(Vinv_n)
    Lc = jnp.linalg.cholesky(
        0.5 * (Vinv + jnp.swapaxes(Vinv, -1, -2))
        + 1e-30 * jnp.eye(3, dtype=Vinv.dtype)
    ).astype(jnp.float32)
    W_pad = jnp.concatenate([W.astype(jnp.float32),
                             jnp.zeros((1, P, 3), jnp.float32)])
    Wh_pt = jnp.einsum("ntpi,nij->ntpj", W_pad[prob.pt_gather], Lc)  # (N,Tp,P,3)
    # j-major flat layout, padded to Np points
    Wh_flat = jnp.zeros((Kp, P * 3), jnp.float32)
    Wh_flat = Wh_flat.at[: N * Tp].set(
        Wh_pt.transpose(0, 1, 3, 2).reshape(N * Tp, 3 * P)
    )
    c = jnp.full((Kp,), n_cam, jnp.int32)
    c = c.at[: N * Tp].set(prob.cam_ind_pt.reshape(-1).astype(jnp.int32))
    meta = dict(P=P, Tp=Tp, N=N, Np=Np, H=H, n_cam=n_cam, block_pts=block_pts)
    return Wh_flat, c.reshape(Kp, 1), meta


def _split3(v, dtype=jnp.bfloat16):
    """Three exact bf16 terms summing to v at ~f32 precision."""
    t0 = v.astype(dtype)
    r1 = v - t0.astype(v.dtype)
    t1 = r1.astype(dtype)
    t2 = (r1 - t1.astype(v.dtype)).astype(dtype)
    return t0, t1, t2


def _build_xmat(x, H, P):
    """Re-tile x (M, P) to the one-hot dot operand (LO, H*P*SPLIT) bf16.

    col = s*(H*P) + h*P + p holds split-term s of x[h*LO + l, p] at row l."""
    M = x.shape[0]
    xpad = jnp.zeros((H * LO, P), x.dtype).at[:M].set(x)
    xmat = xpad.reshape(H, LO, P).transpose(1, 0, 2).reshape(LO, H * P)
    return jnp.concatenate(_split3(xmat), axis=1)  # (LO, H*P*SPLIT)


def schur_wz(x, Wh_flat, c_flat, meta, interpret=False):
    """wz (M, P) = sum over obs of What (What^T x)-per-point, fused."""
    from jax.experimental import pallas as pl  # noqa: F401

    P = meta["P"]
    Tp = meta["Tp"]
    H = meta["H"]
    M = meta["n_cam"]
    block_pts = meta["block_pts"]
    Np = meta["Np"]
    R = block_pts * Tp
    NC = SPLIT * H * P
    grid = Np // block_pts

    xmat = _build_xmat(x.astype(jnp.float32), H, P)

    kern = functools.partial(_matvec_kernel_impl, P=P, Tp=Tp, H=H,
                             block_pts=block_pts)
    wzmat = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((R, 1), lambda i: (i, 0)),
            pl.BlockSpec((R, 3 * P), lambda i: (i, 0)),
            pl.BlockSpec((LO, NC), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((LO, NC), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((LO, NC), jnp.float32),
        interpret=interpret,
    )(c_flat, Wh_flat, xmat)

    # (LO, SPLIT, H, P) -> sum splits -> (H, LO, P) -> (H*LO, P) -> slice M
    wz = wzmat.reshape(LO, SPLIT, H, P).sum(axis=1).transpose(1, 0, 2)
    return wz.reshape(H * LO, P)[:M]


def _matvec_kernel_impl(c_ref, wh_ref, xmat_ref, wz_ref, *, P, Tp, H, block_pts):
    from jax.experimental import pallas as pl

    R = block_pts * Tp
    HP = H * P
    NC = SPLIT * HP

    c = c_ref[:]  # (R, 1) int32
    lo32 = jnp.int32(LO)
    lo = jax.lax.rem(c, lo32)
    hi = jax.lax.div(c, lo32)

    lanes_lo = jax.lax.broadcasted_iota(jnp.int32, (R, LO), 1)
    oh = (lo == lanes_lo).astype(jnp.bfloat16)  # (R, LO)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, NC), 1)
    h_cols = jax.lax.div(jax.lax.rem(cols, jnp.int32(HP)), jnp.int32(P))
    maskc = (hi == h_cols).astype(jnp.bfloat16)  # (R, NC)

    # f32 accumulator (Mosaic requires 32-bit matmul acc); entries are
    # still exact bf16 split terms (single product each)
    xcand = jax.lax.dot(oh, xmat_ref[:], preferred_element_type=jnp.float32)
    masked = xcand * maskc.astype(jnp.float32)

    wh = wh_ref[:]
    wtx_cols = []
    for j in range(3):
        whj = wh[:, j * P:(j + 1) * P]
        whS = jnp.broadcast_to(whj[:, None, :], (R, SPLIT * H, P)).reshape(R, NC)
        wtx_cols.append(jnp.sum(masked * whS, axis=1, keepdims=True))
    wtx = jnp.concatenate(wtx_cols, axis=1)

    what = jnp.sum(wtx.reshape(block_pts, Tp, 3), axis=1)
    whatr = jnp.broadcast_to(what[:, None, :], (block_pts, Tp, 3)).reshape(R, 3)

    what9 = jnp.broadcast_to(whatr[:, :, None], (R, 3, P)).reshape(R, 3 * P)
    yprod = wh * what9
    y = yprod[:, 0:P] + yprod[:, P:2 * P] + yprod[:, 2 * P:3 * P]

    y0, y1, y2 = _split3(y)
    ybroad = jnp.concatenate(
        [jnp.broadcast_to(t[:, None, :], (R, H, P)).reshape(R, HP)
         for t in (y0, y1, y2)], axis=1)
    Y2 = ybroad * maskc
    wz_part = jax.lax.dot_general(
        oh, Y2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        wz_ref[:] = jnp.zeros_like(wz_ref)

    wz_ref[:] += wz_part


def schur_wz_reference(x, Wh_flat, c_flat, meta):
    """Pure-jnp twin of schur_wz for parity tests (identical math modulo
    f32 summation order)."""
    P = meta["P"]
    Tp = meta["Tp"]
    M = meta["n_cam"]
    Np = meta["Np"]
    Kp = Np * Tp
    c = c_flat.reshape(-1)
    Wh = Wh_flat.reshape(Kp, 3, P)  # [k, j, p]
    xpad = jnp.concatenate([x.astype(jnp.float32),
                            jnp.zeros((1, P), jnp.float32)])
    xg = xpad[jnp.minimum(c, M)]  # (Kp, P); pad rows have Wh = 0
    wtx = jnp.einsum("kjp,kp->kj", Wh, xg)  # (Kp, 3)
    what = jnp.sum(wtx.reshape(Np, Tp, 3), axis=1)
    whatr = jnp.broadcast_to(what[:, None, :], (Np, Tp, 3)).reshape(Kp, 3)
    y = jnp.einsum("kjp,kj->kp", Wh, whatr)  # (Kp, P)
    wz = jax.ops.segment_sum(
        jnp.where((c < M)[:, None], y, 0.0), jnp.minimum(c, M - 1),
        num_segments=M)
    return wz
