"""Fused Pallas TPU kernel for the Schur-complement CG matvec.

The CG matvec wz-part computes, for x (M, P):

    wz[m] = sum_{k: cam(k)=m} What_k ( sum_{k' in pt(k)} What_k'^T x[cam(k')] )

with What = W L, L = chol(V^-1) folded once per LM step. The shipped XLA
path ("aos", ops/lm.py) does this with two K-sized row gathers, which the
round-4 device decomposition showed are per-ROW bound at ~3 ns/row and
are 4.4 of the 4.3 ms fused step at 1000 cams / 800k obs
(scripts/bench_matvec2.py; the dense reductions are ~0.5 ms each). Pure-
XLA one-hot matmul replacements lose — every intermediate is
materialized in HBM (scripts/bench_matvec3.py: 6.2-7.3 ms).

This kernel keeps the whole chain in VMEM, in the POINT-MAJOR
observation order and a COMPONENT-MAJOR (SoA) layout — the batch axis
lives in lanes, the tiny (P, 3) component axes in sublanes, so every
reshape is a leading-dim view (Mosaic rejects trailing-dim reshapes)
and the small-matrix arithmetic runs full-lane on the VPU:

  * both camera-axis crossings (fetch x[cam(k)]; scatter y_k into wz)
    are TWO-LEVEL ONE-HOT MATMULS: with cam = 64*hi + lo, a (64, R)
    one-hot of lo rides the MXU against the re-tiled x table / the y
    tile, and an (NC, R) hi mask selects — ONE MXU dot per crossing per
    chunk, one-hots built on the VPU and never written to HBM;
  * the per-track reduction over its Tp observations (tracks are
    contiguous lanes in point-major order) is 2*Tp-1 masked lane rolls,
    which also broadcasts the result back to every observation;
  * numerical contract: the operator must be EXACTLY the f32 operator
    or CG diverges at 1000-cam conditioning (measured, bench_matvec3:
    bf16 W makes the damped S indefinite; per-step bf16 rounding of the
    Krylov vector is conditioning-amplified). So W stays f32 and every
    value that crosses a one-hot dot (x, y) is decomposed into THREE
    exact bf16 terms — each term survives its single-product dot
    exactly, and the f32 recombination reproduces the value to ~2^-27.

Reference counterpart being replaced: the repeated residual evaluations
inside scipy TRF's implicit normal equations (ba_core.py:284-297).
"""

import functools
import math

import jax
import jax.numpy as jnp

LO = 64  # low-level one-hot width
# bf16 split terms per crossed value: 3 -> ~2^-24 reconstruction (f32
# roundoff level); SATBA_PALLAS_SPLIT overrides for experiments
import os as _os

SPLIT = int(_os.environ.get("SATBA_PALLAS_SPLIT", "3"))
MAX_TP = 16  # beyond this the roll-based track reduce stops being cheap


def _cdiv(a, b):
    return -(-a // b)


def build_wh_operands(W, Vinv, prob, n_cam, block_pts=None):
    """Per-LM-step operands for the fused matvec.

    W: (K, P, 3) f32 per-obs blocks; Vinv: (N, 3, 3) SPD. Returns
    (Wh_soa, c_flat, meta): Wh_soa (3*P, Kp) f32 component-major (row
    p*3 + j holds What[k][p][j]); c_flat (1, Kp) int32 camera ids with
    sentinel n_cam on padding slots; meta dict of static shape info.
    Kp = N_pad * Tp columns in point-major order (track n's observations
    at columns n*Tp .. n*Tp+Tp-1, zero columns beyond the track)."""
    P = W.shape[1]
    N = Vinv.shape[0]
    Tp = prob.pt_gather.shape[1]
    # R = block_pts * Tp must be a multiple of 128 (Mosaic lane tiling)
    lane_q = 128 // math.gcd(Tp, 128)
    if block_pts is None:
        # ~8192 obs lanes per chunk: fastest measured (0.89 vs 1.04
        # ms/matvec at 2048 vs 512 points, Tp=4, 1000 cams) while keeping
        # VMEM bounded for larger Tp
        block_pts = max(256, 8192 // Tp)
    block_pts = _cdiv(block_pts, lane_q) * lane_q
    Np = _cdiv(N, block_pts) * block_pts
    Kp = Np * Tp
    H = _cdiv(n_cam + 1, LO)

    from sat_bundleadjust_tpu.ops import smallmat as sm

    Lc = sm.chol3x3(
        0.5 * (Vinv + jnp.swapaxes(Vinv, -1, -2))).astype(jnp.float32)
    W_pad = jnp.concatenate([W.astype(jnp.float32),
                             jnp.zeros((1, P, 3), jnp.float32)])
    # the V^-1/2 fold MUST go through the unrolled smallmat multiply-adds
    # (full-f32 VPU), exactly like the aos path: a jnp.einsum here lowers
    # to an MXU dot at XLA's DEFAULT (bf16-pass) precision on TPU, which
    # perturbs What at ~2^-8 — the "bf16 What makes the damped S
    # indefinite" failure of round 4 (BENCHMARKS.md), re-measured in round
    # 5 as the kernel solve stalling at 0.19 px while every CPU twin (f32
    # einsum) converged to the 0.098 px optimum
    Wh_pt = sm.mm(W_pad[prob.pt_gather], Lc[:, None])  # (N,Tp,P,3)
    Wh_soa = jnp.zeros((P * 3, Kp), jnp.float32)
    Wh_soa = Wh_soa.at[:, : N * Tp].set(
        Wh_pt.reshape(N * Tp, P * 3).T  # row-major (p, j) -> row p*3+j
    )
    c = jnp.full((Kp,), n_cam, jnp.int32)
    c = c.at[: N * Tp].set(prob.cam_ind_pt.reshape(-1).astype(jnp.int32))
    meta = dict(P=P, Tp=Tp, N=N, Np=Np, H=H, n_cam=n_cam, block_pts=block_pts)
    return Wh_soa, c.reshape(1, Kp), meta


def _round_bf16_grid(v):
    """Round f32 to the bf16 grid (round-to-nearest-even), staying f32.

    Integer bit arithmetic instead of astype or lax.reduce_precision:
    the deployment compiles with --xla_allow_excess_precision=true, under
    which an f32->bf16->f32 round-trip may be ELIDED — the split
    residuals then silently collapse to zero while the MXU still
    truncates its operands (measured on-chip: 1e-3..2e-2 relative error
    scaling with problem size) — and reduce_precision has no Pallas TPU
    lowering. The uint32 add-carry RNE cannot be elided."""
    u = jax.lax.bitcast_convert_type(v, jnp.uint32)
    lsb = jax.lax.shift_right_logical(u, jnp.uint32(16)) & jnp.uint32(1)
    u = (u + jnp.uint32(0x7FFF) + lsb) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def _trunc_bf16_grid(v):
    """Truncate f32 toward zero onto the bf16 grid (mask the low 16
    mantissa bits; no carry). Like _round_bf16_grid this is real integer
    arithmetic that --xla_allow_excess_precision cannot elide."""
    u = jax.lax.bitcast_convert_type(v, jnp.uint32)
    return jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)


def _split3(v, dtype=jnp.bfloat16):
    """SPLIT bf16 terms summing to v via TRUNCATING grid splits.

    With truncation (not RNE) and SPLIT=3 the decomposition of an f32 is
    BIT-EXACT: each term keeps the next 8 mantissa bits (both
    subtractions are exact — the operands share a common ulp), the third
    remainder holds the final <=8 bits and is itself on the bf16 grid,
    and the f32 recombination t1+t2+t3 is exact in any order because
    every partial sum is representable. An RNE-split (round 4) left a
    ~2^-25 per-value residual on the Krylov vector, which late-LM CG at
    1000-cam conditioning measurably amplified (0.19 px stall vs the
    0.098 px optimum on the real chip, round 5). The final casts are
    exact: the values already sit on the bf16 grid."""
    v = v.astype(jnp.float32)
    terms = []
    rem = v
    for i in range(SPLIT):
        t = rem if i == SPLIT - 1 else _trunc_bf16_grid(rem)
        terms.append(t.astype(dtype))
        rem = rem - t
    return tuple(terms)


def _build_xmat(x, H, P):
    """Re-tile x (M, P) to the crossing-1 dot operand (NC, LO) bf16:
    row (p*SPLIT + s)*H + h holds split-term s of x[h*LO + l, p] at
    column l."""
    M = x.shape[0]
    xpad = jnp.zeros((H * LO, P), jnp.float32).at[:M].set(x.astype(jnp.float32))
    xphl = xpad.reshape(H, LO, P).transpose(2, 0, 1)  # (P, H, LO)
    terms = _split3(xphl)
    xm = jnp.stack(terms, axis=1)  # (P, SPLIT, H, LO)
    return xm.reshape(P * SPLIT * H, LO)


def _matvec_kernel(c_ref, wh_ref, xmat_ref, wz_ref, *, P, Tp, H, block_pts):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = block_pts * Tp
    SH = SPLIT * H
    NC = P * SH
    NC2 = P * S_CAM * H

    c = c_ref[:]  # (1, R) int32
    lo = jax.lax.rem(c, jnp.int32(LO))
    hi = jax.lax.div(c, jnp.int32(LO))

    sub_lo = jax.lax.broadcasted_iota(jnp.int32, (LO, R), 0)
    ohT = (lo == sub_lo).astype(jnp.bfloat16)  # (LO, R)

    # h of each operand row: row = (p*SPLIT + s)*H + h
    rows_h = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (NC, R), 0), jnp.int32(H))
    maskT = hi == rows_h  # (NC, R) bool
    maskT_f = maskT.astype(jnp.float32)

    # ---- crossing 1: xcandT[row, k] = split term of x[64*h(row)+lo_k, p(row)]
    xcandT = jax.lax.dot_general(
        xmat_ref[:], ohT, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (NC, R), entries exact terms
    maskedT = xcandT * maskT_f
    # sum splits and hi levels: rows grouped per p (leading-dim reshape)
    xg = jnp.sum(maskedT.reshape(P, SH, R), axis=1)  # (P, R) == x[cam_k, p]

    # ---- wtx[j, k] = sum_p What[k, p, j] * xg[p, k]
    wh = wh_ref[:]  # (3*P, R), row p*3 + j
    wtx = jnp.concatenate(
        [sum(wh[p * 3 + j:p * 3 + j + 1, :] * xg[p:p + 1, :] for p in range(P))
         for j in range(3)], axis=0)  # (3, R)

    # ---- track reduce + broadcast-back: whatr[j, k] = sum over the Tp
    # lanes of k's track. Tracks are Tp-aligned lane groups, so 2*Tp-1
    # masked cyclic rolls cover every in-group pair; wrapped lanes are
    # excluded by the in-track-position mask.
    lane_t = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (1, R), 1), jnp.int32(Tp))
    whatr = wtx
    for d in range(1, Tp):
        # pltpu.roll requires non-negative shifts: -d == R - d (cyclic)
        # int32 shifts: under jax_enable_x64 a Python int traces as i64,
        # which Mosaic's dynamic_rotate rejects
        fwd = pltpu.roll(wtx, jnp.int32(R - d), 1) * (lane_t < Tp - d).astype(jnp.float32)
        bwd = pltpu.roll(wtx, jnp.int32(d), 1) * (lane_t >= d).astype(jnp.float32)
        whatr = whatr + fwd + bwd

    # ---- y[p, k] = sum_j What[k, p, j] * whatr[j, k]
    y = jnp.concatenate(
        [sum(wh[p * 3 + j:p * 3 + j + 1, :] * whatr[j:j + 1, :]
             for j in range(3)) for p in range(P)], axis=0)  # (P, R)

    # ---- crossing 2: wz as ohT-contraction of FIXED-POINT slices of y.
    # Unlike crossing 1 (one nonzero product per output: value-relative
    # bf16 splits suffice), this dot ACCUMULATES up to R contributions per
    # camera in the f32 MXU accumulator, and the Schur cancellation at
    # 1000-cam conditioning amplifies that summation rounding (round-4/5
    # diagnosis; the wide-accumulator twins also HALVE the LM iteration
    # count at 1000 cams). Fixed-point slicing makes the accumulation
    # error-free: per p row, S_CAM slices of 8 bits on a common
    # power-of-two ulp derived from the chunk max — every slice value is
    # bf16-exact AND every f32 partial sum of up to 2^16 of them is an
    # exactly-representable multiple of the ulp. The only loss is the
    # dropped residual below slice S_CAM (~2^-40 of the chunk max at the
    # default 5 slices); slice sums cross chunks exactly via the f64
    # combine in schur_wz.
    rows_h2 = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (NC2, R), 0), jnp.int32(H))
    mask2_b = (hi == rows_h2).astype(jnp.bfloat16)  # (NC2, R)
    u = _fixedpoint_ulp(jnp.max(jnp.abs(y), axis=1, keepdims=True))  # (P, 1)
    terms = []
    r = y
    for _ in range(S_CAM):
        q = _slice_fixedpoint(r, u)
        terms.append(q.astype(jnp.bfloat16))  # exact: 8-bit multiples of u
        r = r - q
        u = u * jnp.float32(2.0 ** -8)
    ys = jnp.stack(terms, axis=1)  # (P, S_CAM, R)
    ybroadT = jnp.broadcast_to(
        ys[:, :, None, :], (P, S_CAM, H, R)).reshape(NC2, R)
    Y2T = ybroadT * mask2_b  # (NC2, R) exact bf16 slice terms
    wz_part = jax.lax.dot_general(
        Y2T, ohT, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (NC2, LO), all sums EXACT

    # per-chunk PARTIAL output; the cross-chunk + cross-slice reduction
    # happens in XLA in f64 (schur_wz) — together with the exact in-chunk
    # slice sums the camera-side reduction is effectively a wide
    # accumulator, independent of observation order.
    wz_ref[0, :, :] = wz_part


def schur_wz(x, Wh_soa, c_flat, meta, interpret=False):
    """wz (M, P) = sum over obs of What (What^T x)-per-point, fused."""
    from jax.experimental import pallas as pl

    P = meta["P"]
    Tp = meta["Tp"]
    H = meta["H"]
    M = meta["n_cam"]
    block_pts = meta["block_pts"]
    Np = meta["Np"]
    R = block_pts * Tp
    NC = P * SPLIT * H
    NC2 = P * S_CAM * H
    grid = Np // block_pts

    xmat = _build_xmat(x, H, P)

    kern = functools.partial(_matvec_kernel, P=P, Tp=Tp, H=H,
                             block_pts=block_pts)
    wzmat = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            # i * 0 instead of literal 0: under jax_enable_x64 a Python 0
            # traces as i64 and Mosaic rejects the mixed (i64, i32) index
            pl.BlockSpec((1, R), lambda i: (i * 0, i)),
            pl.BlockSpec((3 * P, R), lambda i: (i * 0, i)),
            pl.BlockSpec((NC, LO), lambda i: (i * 0, i * 0)),
        ],
        out_specs=pl.BlockSpec((1, NC2, LO), lambda i: (i, i * 0, i * 0)),
        out_shape=jax.ShapeDtypeStruct((grid, NC2, LO), jnp.float32),
        interpret=interpret,
    )(c_flat, Wh_soa, xmat)
    # cross-chunk + cross-slice combine in f64: the per-chunk per-slice
    # camera sums are EXACT f32 values (fixed-point slicing in-kernel), so
    # this reduction makes the whole camera-side accumulation effectively
    # a wide accumulator (a tiny (grid, NC2, LO) operand — f64 emulation
    # cost is negligible next to the kernel)
    wzmat = jnp.sum(wzmat.astype(jnp.float64), axis=0)

    # row (p*S_CAM + s)*H + h, col l -> wz[h*LO + l, p], summing s
    wz = wzmat.reshape(P, S_CAM, H, LO).sum(axis=1)  # (P, H, LO)
    return wz.reshape(P, H * LO).T[:M].astype(jnp.float32)  # (M, P)


S_CAM = int(_os.environ.get("SATBA_PALLAS_CAM_SLICES", "5"))


def _fixedpoint_ulp(m, bits_down=7):
    """Largest slice ulp u = 2^(E - bits_down) with 2^E >= m, from the f32
    exponent field (no log2). m: positive f32 (0 -> tiny u, harmless: all
    slices come out zero)."""
    mb = jax.lax.bitcast_convert_type(m.astype(jnp.float32), jnp.uint32)
    e = jax.lax.shift_right_logical(mb, jnp.uint32(23)) & jnp.uint32(0xFF)
    # u = 2^(e - 127 + 1 - bits_down); clamp so the exponent field stays
    # in (0, 255) (no denormals/infs). Explicit int32 constants: under
    # jax_enable_x64 a Python int traces as i64, which Mosaic's lowering
    # cannot legalize (observed as a RecursionError at pallas_call
    # lowering on the real chip)
    eu = jnp.minimum(
        jnp.maximum(e.astype(jnp.int32) + jnp.int32(1 - bits_down),
                    jnp.int32(1)),
        jnp.int32(254))
    return jax.lax.bitcast_convert_type(
        jax.lax.shift_left(eu.astype(jnp.uint32), jnp.uint32(23)), jnp.float32)


def _slice_fixedpoint(r, u):
    """Round r to the nearest multiple of the power-of-two u (RNE), via the
    big-constant add/sub trick (exact for |r| <= 2^22 u; here |r| <= 2^7 u).
    Pure f32 adds — cannot be elided under --xla_allow_excess_precision,
    and each output is an integer multiple k*u with |k| <= 128, i.e. an
    8-significant-bit value: exactly representable in bf16, and f32 sums
    of up to 2^16 of them are EXACT (all partial sums are multiples of u
    below 2^24 u)."""
    c = u * jnp.float32(1.5 * 2.0 ** 23)
    return (r + c) - c


def schur_wz_twin(x, Wh_soa, c_flat, meta, accum="slice", block_pts=None,
                  n_slices=None):
    """Pure-jnp twins of the fused kernel with selectable CAMERA-SIDE
    accumulation (the round-4 diagnosis localized the pallas-vs-aos solve
    gap to exactly this reduction's f32 rounding at 1000-cam Schur
    cancellation):

      accum="pm"    — point-major f32 segment_sum (== schur_wz_reference;
                      reproduces the round-4 degradation)
      accum="f64"   — f64 segment_sum (ground-truth wide accumulator)
      accum="slice" — the kernel's fix, simulated faithfully: per-chunk
                      per-row fixed-point slicing (n_slices x 8-bit
                      common-ulp slices -> every in-chunk f32 camera sum
                      is EXACT) + f64 cross-chunk/cross-slice combine.

    Used by tests to pin solve-quality parity of the slice scheme on CPU.
    """
    P = meta["P"]
    Tp = meta["Tp"]
    M = meta["n_cam"]
    Np = meta["Np"]
    Kp = Np * Tp
    if block_pts is None:
        block_pts = meta["block_pts"]
    if n_slices is None:
        n_slices = S_CAM
    c = c_flat.reshape(-1)
    Wh = Wh_soa.T.reshape(Kp, P, 3)
    xpad = jnp.concatenate([x.astype(jnp.float32), jnp.zeros((1, P), jnp.float32)])
    if accum.endswith("+xsplit"):
        # simulate crossing 1's value-relative bf16 SPLIT-term transport
        # of x (the kernel's only remaining non-f32-exact stage): x is
        # rounded to the sum of SPLIT bf16 terms, recombined in f32
        accum = accum[: -len("+xsplit")]
        xpad = sum(t.astype(jnp.float32) for t in _split3(xpad))
    xg = xpad[jnp.minimum(c, M)]
    wtx = jnp.einsum("kpj,kp->kj", Wh, xg)
    what = jnp.sum(wtx.reshape(Np, Tp, 3), axis=1)
    whatr = jnp.broadcast_to(what[:, None, :], (Np, Tp, 3)).reshape(Kp, 3)
    y = jnp.einsum("kpj,kj->kp", Wh, whatr)  # (Kp, P)
    y = jnp.where((c < M)[:, None], y, 0.0)
    seg = jnp.minimum(c, M - 1)
    if accum == "pm":
        return jax.ops.segment_sum(y, seg, num_segments=M)
    if accum == "f64":
        return jax.ops.segment_sum(
            y.astype(jnp.float64), seg, num_segments=M).astype(jnp.float32)
    # accum == "slice": mirror the kernel chunking
    grid = Np // block_pts
    R = block_pts * Tp
    yc = y.reshape(grid, R, P)
    segc = (jnp.arange(grid)[:, None] * M + seg.reshape(grid, R)).reshape(-1)
    u0 = _fixedpoint_ulp(jnp.max(jnp.abs(yc), axis=1))  # (grid, P)
    total = jnp.zeros((grid, M, P), jnp.float64)
    r = yc
    u = u0
    for _ in range(n_slices):
        q = _slice_fixedpoint(r, u[:, None, :])
        part = jax.ops.segment_sum(  # EXACT f32 sums by construction
            q.reshape(grid * R, P), segc, num_segments=grid * M)
        total = total + part.reshape(grid, M, P).astype(jnp.float64)
        r = r - q
        u = u * jnp.float32(2.0 ** -8)
    return jnp.sum(total, axis=0).astype(jnp.float32)


def schur_wz_reference(x, Wh_soa, c_flat, meta):
    """Pure-jnp twin of schur_wz for parity tests (identical math modulo
    f32 summation order)."""
    P = meta["P"]
    Tp = meta["Tp"]
    M = meta["n_cam"]
    Np = meta["Np"]
    Kp = Np * Tp
    c = c_flat.reshape(-1)
    Wh = Wh_soa.T.reshape(Kp, P, 3)  # [k, p, j]
    xpad = jnp.concatenate([x.astype(jnp.float32),
                            jnp.zeros((1, P), jnp.float32)])
    xg = xpad[jnp.minimum(c, M)]  # (Kp, P); pad slots have Wh = 0
    wtx = jnp.einsum("kpj,kp->kj", Wh, xg)  # (Kp, 3)
    what = jnp.sum(wtx.reshape(Np, Tp, 3), axis=1)
    whatr = jnp.broadcast_to(what[:, None, :], (Np, Tp, 3)).reshape(Kp, 3)
    y = jnp.einsum("kpj,kj->kp", Wh, whatr)  # (Kp, P)
    wz = jax.ops.segment_sum(
        jnp.where((c < M)[:, None], y, 0.0), jnp.minimum(c, M - 1),
        num_segments=M)
    return wz
