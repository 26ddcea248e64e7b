"""Closed-form batched symmetric 3x3 eigendecomposition.

The reference calls Eigen::SelfAdjointEigenSolver on a single 3x3 at a time
(octree.cpp:362, factors.cpp:148, ...). On TPU the same decomposition runs
over O(10^4) voxel covariances per step, so we use the closed-form
trigonometric (Cardano) solution for the eigenvalues and cross-product-based
eigenvectors — fully elementwise, fusable, and vmappable, with no LAPACK
call. Eigenvalues are returned in ascending order matching Eigen's
convention (the pipeline consumes lambda_min = w[..., 0]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vina_slam_tpu.core.mat3 import bmm

_TINY = 1e-30


@jax.jit
def eigh3(A: jnp.ndarray):
    """Eigendecomposition of symmetric (..., 3, 3) matrices.

    Returns (w, V): eigenvalues w (..., 3) ascending and eigenvectors as
    columns of V (..., 3, 3), i.e. A @ V[..., :, k] ~= w[..., k] * V[..., :, k].
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    dtype = A.dtype

    # scale for numerical safety (Cardano is scale-homogeneous)
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1)), _TINY)
    As = A / scale[..., None, None]

    q = (As[..., 0, 0] + As[..., 1, 1] + As[..., 2, 2]) / 3.0
    eye = jnp.eye(3, dtype=dtype)
    B = As - q[..., None, None] * eye
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _TINY))

    C = B / p[..., None, None]
    detC = (
        C[..., 0, 0] * (C[..., 1, 1] * C[..., 2, 2] - C[..., 1, 2] * C[..., 2, 1])
        - C[..., 0, 1] * (C[..., 1, 0] * C[..., 2, 2] - C[..., 1, 2] * C[..., 2, 0])
        + C[..., 0, 2] * (C[..., 1, 0] * C[..., 2, 1] - C[..., 1, 1] * C[..., 2, 0])
    )
    r = jnp.clip(0.5 * detC, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    two_pi_3 = 2.0 * jnp.pi / 3.0
    w2 = q + 2.0 * p * jnp.cos(phi)              # largest
    w0 = q + 2.0 * p * jnp.cos(phi + two_pi_3)   # smallest
    w1 = 3.0 * q - w0 - w2

    degenerate = p2 < 1e-14  # (near-)isotropic: any orthonormal basis works
    w0 = jnp.where(degenerate, q, w0)
    w1 = jnp.where(degenerate, q, w1)
    w2 = jnp.where(degenerate, q, w2)

    v0 = _eigvec(As, w1, w2, degenerate, jnp.array([1.0, 0.0, 0.0], dtype=dtype))
    v2 = _eigvec(As, w0, w1, degenerate, jnp.array([0.0, 0.0, 1.0], dtype=dtype))
    # re-orthogonalize v2 against v0 (guards the nearly-degenerate w1~w2 case)
    v2 = v2 - jnp.sum(v2 * v0, axis=-1, keepdims=True) * v0
    n2 = jnp.sqrt(jnp.maximum(jnp.sum(v2 * v2, axis=-1, keepdims=True), _TINY))
    fallback2 = _any_orthogonal(v0)
    v2 = jnp.where(n2 < 1e-6, fallback2, v2 / n2)
    v1 = jnp.cross(v2, v0)

    w = jnp.stack([w0, w1, w2], axis=-1) * scale[..., None]
    V = jnp.stack([v0, v1, v2], axis=-1)
    return w, V


def _eigvec(A, wa, wb, degenerate, default):
    """Eigenvector for the eigenvalue that is neither wa nor wb: columns of
    (A - wa I)(A - wb I) span it (Cayley-Hamilton)."""
    eye = jnp.eye(3, dtype=A.dtype)
    M = bmm(A - wa[..., None, None] * eye, A - wb[..., None, None] * eye)
    norms = jnp.sum(M * M, axis=-2)  # (..., 3) squared column norms
    idx = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(M, idx[..., None, None], axis=-1)[..., 0]
    n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), _TINY))
    good = (jnp.max(norms, axis=-1) > 1e-20)[..., None] & ~degenerate[..., None]
    return jnp.where(good, v / n, jnp.broadcast_to(default, v.shape))


def _any_orthogonal(v):
    """A unit vector orthogonal to unit vector v (branch-free)."""
    # pick the axis least aligned with v, project out, normalize
    ax = jnp.argmin(jnp.abs(v), axis=-1)
    e = jnp.zeros_like(v).at[..., :].set(0.0)
    e = jnp.eye(3, dtype=v.dtype)[ax]
    u = e - jnp.sum(e * v, axis=-1, keepdims=True) * v
    n = jnp.sqrt(jnp.maximum(jnp.sum(u * u, axis=-1, keepdims=True), _TINY))
    return u / n
