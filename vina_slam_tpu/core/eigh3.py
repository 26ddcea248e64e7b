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


def _cardano6(a00, a01, a02, a11, a12, a22):
    """Cardano eigenvalues of a PRE-SCALED symmetric 3x3 in flat columns.
    Returns (w0, w1, w2, degenerate) ascending, unscaled."""
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _TINY))
    ip = 1.0 / p
    c00, c11, c22 = b00 * ip, b11 * ip, b22 * ip
    c01, c02, c12 = a01 * ip, a02 * ip, a12 * ip
    detC = (c00 * (c11 * c22 - c12 * c12)
            - c01 * (c01 * c22 - c12 * c02)
            + c02 * (c01 * c12 - c11 * c02))
    r = jnp.clip(0.5 * detC, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = jnp.asarray(2.0 * jnp.pi / 3.0, a00.dtype)
    w2 = q + 2.0 * p * jnp.cos(phi)
    w0 = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    w1 = 3.0 * q - w0 - w2
    degenerate = p2 < 1e-14
    w0 = jnp.where(degenerate, q, w0)
    w1 = jnp.where(degenerate, q, w1)
    w2 = jnp.where(degenerate, q, w2)
    return w0, w1, w2, degenerate


def _scale6(a00, a01, a02, a11, a12, a22):
    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(a00), jnp.abs(a11)),
                    jnp.maximum(jnp.abs(a22), jnp.abs(a01))),
        jnp.maximum(jnp.maximum(jnp.abs(a02), jnp.abs(a12)), _TINY))
    inv = 1.0 / scale
    return (scale, a00 * inv, a01 * inv, a02 * inv, a11 * inv, a12 * inv,
            a22 * inv)


def eigvals3c(a00, a01, a02, a11, a12, a22):
    """Ascending eigenvalues (w0, w1, w2) of symmetric 3x3 in flat columns —
    the Cardano half of eigh3c for residual-only paths that never need
    eigenvectors (evaluate_only_residual, factors.cpp:128-158)."""
    scale, a00, a01, a02, a11, a12, a22 = _scale6(a00, a01, a02, a11, a12, a22)
    w0, w1, w2, _ = _cardano6(a00, a01, a02, a11, a12, a22)
    return w0 * scale, w1 * scale, w2 * scale


def eigh3c(a00, a01, a02, a11, a12, a22):
    """Componentwise eigh3 over flat (N,) columns.

    The (N, 3, 3) form keeps the matrix dims minor-most, so every VPU op
    uses 3 (or 9) of the 8x128 tile's 1024 lanes; the flat-column form is
    fully lane-dense and runs ~an order of magnitude faster at the same N.
    Same math as eigh3 (Cardano + Cayley-Hamilton eigenvectors).

    Returns (w0, w1, w2) ascending eigenvalues and the eigenvector MATRIX
    columns as ((v0x, v0y, v0z), (v1x, ...), (v2x, ...)) with v0 the
    lambda_min eigenvector (matching eigh3's V[..., :, 0])."""
    scale, a00, a01, a02, a11, a12, a22 = _scale6(a00, a01, a02, a11, a12, a22)
    w0, w1, w2, degenerate = _cardano6(a00, a01, a02, a11, a12, a22)

    def eigvec(wa, wb, dx, dy, dz):
        # columns of (A - wa I)(A - wb I) span the remaining eigenvector
        m00, m11, m22 = a00 - wa, a11 - wa, a22 - wa
        n00, n11, n22 = a00 - wb, a11 - wb, a22 - wb
        # M = (A-waI)(A-wbI), exploiting symmetry of the factors
        M00 = m00 * n00 + a01 * a01 + a02 * a02
        M10 = a01 * n00 + m11 * a01 + a12 * a02
        M20 = a02 * n00 + a12 * a01 + m22 * a02
        M01 = m00 * a01 + a01 * n11 + a02 * a12
        M11 = a01 * a01 + m11 * n11 + a12 * a12
        M21 = a02 * a01 + a12 * n11 + m22 * a12
        M02 = m00 * a02 + a01 * a12 + a02 * n22
        M12 = a01 * a02 + m11 * a12 + a12 * n22
        M22 = a02 * a02 + a12 * a12 + m22 * n22
        q0 = M00 * M00 + M10 * M10 + M20 * M20
        q1 = M01 * M01 + M11 * M11 + M21 * M21
        q2 = M02 * M02 + M12 * M12 + M22 * M22
        best01 = q0 >= q1
        vx = jnp.where(best01, M00, M01)
        vy = jnp.where(best01, M10, M11)
        vz = jnp.where(best01, M20, M21)
        qb = jnp.where(best01, q0, q1)
        use2 = q2 > qb
        vx = jnp.where(use2, M02, vx)
        vy = jnp.where(use2, M12, vy)
        vz = jnp.where(use2, M22, vz)
        qb = jnp.where(use2, q2, qb)
        n = jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, _TINY))
        good = (qb > 1e-20) & ~degenerate
        return (jnp.where(good, vx / n, dx), jnp.where(good, vy / n, dy),
                jnp.where(good, vz / n, dz))

    one = jnp.ones_like(a00)
    zero = jnp.zeros_like(a00)
    v0x, v0y, v0z = eigvec(w1, w2, one, zero, zero)
    v2x, v2y, v2z = eigvec(w0, w1, zero, zero, one)
    # re-orthogonalize v2 against v0 (nearly-degenerate w1 ~ w2)
    dot = v2x * v0x + v2y * v0y + v2z * v0z
    v2x, v2y, v2z = v2x - dot * v0x, v2y - dot * v0y, v2z - dot * v0z
    n2sq = v2x * v2x + v2y * v2y + v2z * v2z
    n2 = jnp.sqrt(jnp.maximum(n2sq, _TINY))
    # fallback: axis least aligned with v0, projected out (branch-free)
    ax, ay, az = jnp.abs(v0x), jnp.abs(v0y), jnp.abs(v0z)
    use_x = (ax <= ay) & (ax <= az)
    use_y = ~use_x & (ay <= az)
    ex = use_x.astype(a00.dtype)
    ey = use_y.astype(a00.dtype)
    ez = 1.0 - ex - ey
    de = ex * v0x + ey * v0y + ez * v0z
    fx, fy, fz = ex - de * v0x, ey - de * v0y, ez - de * v0z
    fn = jnp.sqrt(jnp.maximum(fx * fx + fy * fy + fz * fz, _TINY))
    bad = n2[...] < 1e-6
    v2x = jnp.where(bad, fx / fn, v2x / n2)
    v2y = jnp.where(bad, fy / fn, v2y / n2)
    v2z = jnp.where(bad, fz / fn, v2z / n2)
    v1x = v2y * v0z - v2z * v0y
    v1y = v2z * v0x - v2x * v0z
    v1z = v2x * v0y - v2y * v0x
    return ((w0 * scale, w1 * scale, w2 * scale),
            ((v0x, v0y, v0z), (v1x, v1y, v1z), (v2x, v2y, v2z)))


def _any_orthogonal(v):
    """A unit vector orthogonal to unit vector v (branch-free)."""
    # pick the axis least aligned with v, project out, normalize
    ax = jnp.argmin(jnp.abs(v), axis=-1)
    e = jnp.zeros_like(v).at[..., :].set(0.0)
    e = jnp.eye(3, dtype=v.dtype)[ax]
    u = e - jnp.sum(e * v, axis=-1, keepdims=True) * v
    n = jnp.sqrt(jnp.maximum(jnp.sum(u * u, axis=-1, keepdims=True), _TINY))
    return u / n
