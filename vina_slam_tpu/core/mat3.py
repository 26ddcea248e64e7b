"""Batched small-matrix products as broadcast-multiply-sum (VPU), never
dot_general.

On the TPU backend, a batched tiny matmul expressed as einsum/@ lowers to
dot_general over 3x3 (or 6x3, 9x9, 15x15) contractions; the MXU tiles each
contraction to 128x128 and the op can run 100-500x slower than the
equivalent broadcast-multiply-sum, which vectorizes the BATCH dimension
across VPU lanes and fuses with neighbors. FLOPs are identical — only the
lowering differs.

Rule of thumb used across this codebase:
  * contracted dim is LARGE (points, voxels) -> keep einsum (real MXU work);
  * contracted dims are tiny (3/6/9/15) and the batch is large -> use these.
"""

from __future__ import annotations

import jax.numpy as jnp


def bmm(A, B):
    """Batched (..., m, k) @ (..., k, n) with small m/k/n via broadcast-sum.
    Operands broadcast against each other like jnp.matmul."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def bmv(A, v):
    """Batched (..., m, k) @ (..., k) matvec."""
    return jnp.sum(A * v[..., None, :], axis=-1)


def bvm(v, A):
    """Batched (..., k) @ (..., k, n) row-vector product."""
    return jnp.sum(v[..., :, None] * A, axis=-2)


def bmmT(A, B):
    """Batched A @ B^T: (..., m, k) x (..., n, k) -> (..., m, n)."""
    return jnp.sum(A[..., :, None, :] * B[..., None, :, :], axis=-1)


def bTmm(A, B):
    """Batched A^T @ B: (..., k, m) x (..., k, n) -> (..., m, n)."""
    return jnp.sum(A[..., :, :, None] * B[..., :, None, :], axis=-3)


def sandwich(R, V):
    """Batched R @ V @ R^T (R, V broadcastable (..., n, n))."""
    return bmmT(bmm(R, V), R)


def outer(a, b):
    """Batched outer product (..., m) x (..., n) -> (..., m, n)."""
    return a[..., :, None] * b[..., None, :]
