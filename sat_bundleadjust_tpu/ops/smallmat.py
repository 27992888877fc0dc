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
