"""Batched tiny-matrix algebra as unrolled elementwise ops.

On TPU, a batched matmul over tiny trailing dims — einsum("kij,kjl->kil")
with i, j, l in {2, 3, 9} — lowers to MXU dot_generals that pad every tiny
operand to hardware tiles, wasting ~99% of the systolic array. The right
mapping is the VPU: unroll the tiny static dims into fused multiply-adds
over the large batch axis. These helpers do that for arbitrary small
static shapes; XLA fuses each output element into one vectorized kernel.

Used by the BA solver hot path (ops/jacobians.py, ops/lm.py), where the
batch axis is the number of observations (1e5-1e7)."""

import jax.numpy as jnp


def mm(a, b):
    """Batched matmul a @ b with small trailing dims.

    a: (..., I, J); b: (..., J, L) -> (..., I, L), unrolled over I, J, L."""
    I, J = a.shape[-2], a.shape[-1]
    J2, L = b.shape[-2], b.shape[-1]
    assert J == J2, (a.shape, b.shape)
    rows = []
    for i in range(I):
        cols = []
        for l in range(L):
            acc = a[..., i, 0] * b[..., 0, l]
            for j in range(1, J):
                acc = acc + a[..., i, j] * b[..., j, l]
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def mv(a, x):
    """Batched matrix-vector a @ x: (..., I, J) x (..., J) -> (..., I)."""
    I, J = a.shape[-2], a.shape[-1]
    outs = []
    for i in range(I):
        acc = a[..., i, 0] * x[..., 0]
        for j in range(1, J):
            acc = acc + a[..., i, j] * x[..., j]
        outs.append(acc)
    return jnp.stack(outs, axis=-1)


def mtm(a, b):
    """Batched a^T @ b: (..., R, I) x (..., R, J) -> (..., I, J)."""
    R, I = a.shape[-2], a.shape[-1]
    J = b.shape[-1]
    rows = []
    for i in range(I):
        cols = []
        for j in range(J):
            acc = a[..., 0, i] * b[..., 0, j]
            for r in range(1, R):
                acc = acc + a[..., r, i] * b[..., r, j]
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def mtv(a, x):
    """Batched a^T @ x: (..., R, I) x (..., R) -> (..., I)."""
    R, I = a.shape[-2], a.shape[-1]
    outs = []
    for i in range(I):
        acc = a[..., 0, i] * x[..., 0]
        for r in range(1, R):
            acc = acc + a[..., r, i] * x[..., r]
        outs.append(acc)
    return jnp.stack(outs, axis=-1)


def mbt(a, b):
    """Batched a @ b^T: (..., I, J) x (..., L, J) -> (..., I, L)."""
    I, J = a.shape[-2], a.shape[-1]
    L = b.shape[-2]
    rows = []
    for i in range(I):
        cols = []
        for l in range(L):
            acc = a[..., i, 0] * b[..., l, 0]
            for j in range(1, J):
                acc = acc + a[..., i, j] * b[..., l, j]
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def chol3x3(A, eps=0.0):
    """Batched closed-form Cholesky of SPD (..., 3, 3) matrices.

    jnp.linalg.cholesky lowers to the generic blocked algorithm, which is
    slow for huge batches of tiny matrices on TPU (measured ~+70 ms per
    LM step at 200k points); the unrolled formulas are a handful of fused
    VPU ops. eps: additive diagonal jitter."""
    a11 = A[..., 0, 0] + eps
    a21 = A[..., 1, 0]
    a31 = A[..., 2, 0]
    a22 = A[..., 1, 1] + eps
    a32 = A[..., 2, 1]
    a33 = A[..., 2, 2] + eps
    tiny = jnp.asarray(1e-30, A.dtype)
    l11 = jnp.sqrt(jnp.maximum(a11, tiny))
    l21 = a21 / l11
    l31 = a31 / l11
    l22 = jnp.sqrt(jnp.maximum(a22 - l21 * l21, tiny))
    l32 = (a32 - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(a33 - l31 * l31 - l32 * l32, tiny))
    z = jnp.zeros_like(l11)
    return jnp.stack(
        [
            jnp.stack([l11, z, z], axis=-1),
            jnp.stack([l21, l22, z], axis=-1),
            jnp.stack([l31, l32, l33], axis=-1),
        ],
        axis=-2,
    )
