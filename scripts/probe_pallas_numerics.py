"""On-chip probes of the fused-matvec numerical building blocks.

The wide-accumulator kernel (ops/pallas_matvec.py round 5) rests on three
claims that hold in interpret mode but must be verified against the REAL
Mosaic compilation (--xla_allow_excess_precision already broke plain
casts in round 4):

  1. _split3 truncating bf16 decomposition is bit-exact on chip
  2. _slice_fixedpoint's (r + c) - c rounding survives compilation
     (not folded to r), slices land on the bf16 grid as integer
     multiples of the ulp
  3. the one-hot MXU dot accumulates common-ulp bf16 terms EXACTLY in
     its f32 accumulator

Usage: python scripts/probe_pallas_numerics.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sat_bundleadjust_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from sat_bundleadjust_tpu.ops import pallas_matvec as pmv

    print("platform:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    R = 1024
    y = (rng.normal(size=(8, R)) * np.exp(rng.normal(size=(8, R)) * 4)).astype(
        np.float32)

    # ---- probe 1: truncating split terms, returned from a real kernel
    def k_split(y_ref, o_ref):
        t = pmv._split3(y_ref[:])
        o_ref[:] = jnp.stack([a.astype(jnp.float32) for a in t], axis=0)

    with jax.enable_x64(False):
        terms = pl.pallas_call(
            k_split,
            out_shape=jax.ShapeDtypeStruct((pmv.SPLIT, 8, R), jnp.float32),
        )(jnp.asarray(y))
    terms = np.asarray(terms)
    recon = terms.sum(axis=0, dtype=np.float64)
    ongrid = all(
        np.array_equal(t, t.astype(np.float32).astype(np.dtype("bfloat16")
                       if False else np.float32))
        for t in terms)  # grid check done via float cast below
    import ml_dtypes
    grid_ok = all(np.array_equal(t, t.astype(ml_dtypes.bfloat16).astype(np.float32))
                  for t in terms)
    print("split3 on-chip: max|recon-y| = {:.3e}  bf16-grid terms: {}".format(
        np.abs(recon - y).max(), grid_ok), flush=True)

    # ---- probe 2: fixed-point slices
    def k_slice(y_ref, o_ref):
        yv = y_ref[:]
        u = pmv._fixedpoint_ulp(jnp.max(jnp.abs(yv), axis=1, keepdims=True))
        outs = []
        r = yv
        for _ in range(pmv.S_CAM):
            q = pmv._slice_fixedpoint(r, u)
            outs.append(q)
            r = r - q
            u = u * jnp.float32(2.0 ** -8)
        outs.append(r)
        o_ref[:] = jnp.stack(outs, axis=0)

    with jax.enable_x64(False):
        sl = pl.pallas_call(
            k_slice,
            out_shape=jax.ShapeDtypeStruct((pmv.S_CAM + 1, 8, R), jnp.float32),
        )(jnp.asarray(y))
    sl = np.asarray(sl)
    slices, resid = sl[:-1], sl[-1]
    recon = slices.sum(axis=0, dtype=np.float64) + resid
    # host-side expected ulps
    m = np.abs(y).max(axis=1, keepdims=True)
    e = ((m.view(np.uint32) >> 23) & 0xFF).astype(np.int64)
    u0 = ((np.clip(e + 1 - 7, 1, 254).astype(np.uint32) << 23)
          ).view(np.float32)
    ok_int = True
    ok_grid = True
    u = u0.astype(np.float64)
    for s in range(pmv.S_CAM):
        ratio = slices[s] / u
        ok_int &= bool(np.all(np.abs(ratio) <= 128)
                       and np.array_equal(ratio, np.rint(ratio)))
        ok_grid &= bool(np.array_equal(
            slices[s],
            slices[s].astype(ml_dtypes.bfloat16).astype(np.float32)))
        u = u * 2.0 ** -8
    folded = bool(np.array_equal(slices[0], y))  # (r+c)-c folded away?
    print("slices on-chip: recon err {:.3e}  resid max {:.3e}  "
          "integer-multiples: {}  bf16-grid: {}  folded-to-identity: {}".format(
              np.abs(recon - y).max(), np.abs(resid).max(), ok_int, ok_grid,
              folded), flush=True)

    # ---- probe 3: MXU one-hot accumulation of common-ulp terms
    # terms: integer multiples of 1.0 in [-128, 128], 4096 lanes, all
    # assigned to 7 distinct one-hot columns; f32 accumulator must give
    # the exact integer sums
    n = 4096
    q = rng.integers(-128, 129, size=(8, n)).astype(np.float32)
    cols = rng.integers(0, 7, size=n)
    oh = np.zeros((64, n), np.float32)
    oh[cols, np.arange(n)] = 1.0

    def k_dot(q_ref, oh_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            q_ref[:].astype(jnp.bfloat16), oh_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    with jax.enable_x64(False):
        got = pl.pallas_call(
            k_dot,
            out_shape=jax.ShapeDtypeStruct((8, 64), jnp.float32),
        )(jnp.asarray(q), jnp.asarray(oh))
    got = np.asarray(got)
    want = q.astype(np.float64) @ oh.T.astype(np.float64)
    print("one-hot MXU accumulation: max|err| = {:.3e} (exact: {})".format(
        np.abs(got - want).max(), bool(np.array_equal(got, want))), flush=True)


if __name__ == "__main__":
    main()
