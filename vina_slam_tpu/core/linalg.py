"""Arithmetic-only dense linear algebra for TPU f64.

The axon/XLA TPU backend implements LuDecomposition only for f32/c64, so
jnp.linalg.inv/solve on the pipeline's f64 covariances and LM systems fails
to compile on device. These routines use nothing but elementwise arithmetic
and fori_loop (masked full-width column updates), so they lower on any
backend at any dtype. Sizes in this codebase are tiny (3..153), so the
O(n) sequential steps are negligible.

All inputs are assumed symmetric PSD (state covariances, damped gauge-fixed
Gauss-Newton systems). A floor on the pivot keeps near-singular systems
finite; the LM reject/re-damp loop absorbs any resulting step-quality loss,
mirroring how the reference's LDLT behaves on marginal systems.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_psd(A: jnp.ndarray, floor: float = 1e-30) -> jnp.ndarray:
    """Lower Cholesky factor of a symmetric PSD matrix (..., n, n) using
    masked column updates (no LAPACK)."""
    n = A.shape[-1]
    L0 = jnp.zeros_like(A)
    idx = jnp.arange(n)

    def body(i, L):
        row_i = L[..., i, :] * (idx < i)                      # L[i, :i]
        d2 = A[..., i, i] - jnp.sum(row_i * row_i, axis=-1)
        d = jnp.sqrt(jnp.maximum(d2, floor))
        col = (A[..., :, i] - jnp.einsum("...jk,...k->...j", L, row_i)) / d[..., None]
        col = jnp.where(idx > i, col, 0.0)
        col = col.at[..., i].set(d)
        return L.at[..., :, i].set(col)

    return jax.lax.fori_loop(0, n, body, L0)


def solve_lower(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Forward substitution L y = b with b (..., n) or (..., n, m)."""
    n = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    y0 = jnp.zeros_like(b)

    def body(i, y):
        num = b[..., i, :] - jnp.einsum("...k,...km->...m", L[..., i, :], y)
        return y.at[..., i, :].set(num / L[..., i, i][..., None])

    y = jax.lax.fori_loop(0, n, body, y0)
    return y[..., 0] if vec else y


def solve_upper(U: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Back substitution U x = b (U upper triangular)."""
    n = U.shape[-1]
    vec = b.ndim == U.ndim - 1
    if vec:
        b = b[..., None]
    x0 = jnp.zeros_like(b)

    def body(k, x):
        i = n - 1 - k
        num = b[..., i, :] - jnp.einsum("...k,...km->...m", U[..., i, :], x)
        return x.at[..., i, :].set(num / U[..., i, i][..., None])

    x = jax.lax.fori_loop(0, n, body, x0)
    return x[..., 0] if vec else x


def solve_psd(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for symmetric PSD A via Cholesky."""
    L = cholesky_psd(A)
    y = solve_lower(L, b)
    return solve_upper(jnp.swapaxes(L, -1, -2), y)


def inv_psd(A: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a symmetric PSD matrix (solve against I)."""
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    return solve_psd(A, eye)


def inv_psd_refined(A: jnp.ndarray) -> jnp.ndarray:
    """f64-accurate PSD inverse via the NATIVE f32 Cholesky plus one f64
    Newton step X' = X (2I - A X), which doubles the correct digits
    (f32 ~1e-7 -> ~1e-14 for the well-damped systems here). Avoids the
    15-step sequential arithmetic Cholesky (cholesky_psd) that dominates
    when called inside iteration loops."""
    n = A.shape[-1]
    A32 = A.astype(jnp.float32)
    L = jax.scipy.linalg.cholesky(A32, lower=True)
    eye32 = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), A.shape)
    X = jax.scipy.linalg.cho_solve((L, True), eye32).astype(A.dtype)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    X = X @ (2.0 * eye - A @ X)
    return 0.5 * (X + jnp.swapaxes(X, -1, -2))


def solve_psd_refined(A: jnp.ndarray, b: jnp.ndarray, iters: int = 2) -> jnp.ndarray:
    """f64-accurate PSD solve using the NATIVE f32 Cholesky (fast on TPU,
    where f64 factorizations are either unsupported or sequential) plus
    f64 iterative refinement: factor once in f32, then 2 residual-correction
    passes recover ~f64 accuracy for moderately conditioned systems (the
    damped gauge-fixed LM Hessians here).

    Robustness: the lambda-min GN Hessian is INDEFINITE before damping
    (factors.cpp cgap terms are negative), so at small LM damping the
    Cholesky can hit a negative pivot and the whole step goes NaN — and
    because each damping_iter restarts at u=0.01, an init round can deadlock
    on the same NaN forever (corridor-world CPU repro). Eigen's LDLT in the
    reference stays finite there. On breakdown we retry with an escalating
    diagonal boost tau and refine against the BOOSTED (PD) system — a
    modified-Newton step: finite, possibly conservative, judged by the LM
    accept/reject like any other step. Zero extra cost in the PD case (the
    retry while_loop runs 0 iterations)."""
    n = A.shape[-1]
    A32 = A.astype(jnp.float32)
    eye32 = jnp.eye(n, dtype=jnp.float32)
    maxd = jnp.max(jnp.abs(jnp.diagonal(A32, axis1=-2, axis2=-1)))

    def chol(t):
        return jax.scipy.linalg.cholesky(A32 + t * eye32, lower=True)

    def retry_cond(c):
        t, L, k = c
        return ~jnp.all(jnp.isfinite(L)) & (k < 8)

    def retry_body(c):
        t, L, k = c
        t2 = jnp.where(t == 0.0, maxd * jnp.float32(1e-4) + jnp.float32(1e-20),
                       t * jnp.float32(16.0))
        return t2, chol(t2), k + 1

    tau, L, _ = jax.lax.while_loop(
        retry_cond, retry_body,
        (jnp.float32(0.0), chol(jnp.float32(0.0)), jnp.int32(0)))
    Aref = A + tau.astype(A.dtype) * jnp.eye(n, dtype=A.dtype)

    def f32_solve(rhs):
        return jax.scipy.linalg.cho_solve((L, True), rhs.astype(jnp.float32)
                                          ).astype(jnp.float64)

    x = f32_solve(b)
    for _ in range(iters):
        r = b - Aref @ x
        x = x + f32_solve(r)
    return x
