"""Batched SO(3) utilities.

Same operator set as the reference (include/vina_slam/core/math.hpp:12-88:
Exp, Log, hat, jr, jr_inv) but written as shape-polymorphic, vmappable JAX
functions: every op accepts arbitrary leading batch dimensions and is safe
to differentiate through (small-angle branches are implemented with
jnp.where on Taylor expansions rather than data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

from vina_slam_tpu.core.mat3 import bmm

_EPS = 1e-9


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [v]x for (..., 3) -> (..., 3, 3)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def _safe_norm(v: jnp.ndarray):
    sq = jnp.sum(v * v, axis=-1)
    nrm = jnp.sqrt(jnp.maximum(sq, _EPS * _EPS))
    return sq, nrm


def exp(ang: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map (..., 3) -> (..., 3, 3).

    Matches reference Exp (core/math.hpp:12-24); the small-angle branch
    returns the 2nd-order Taylor series instead of exactly I so the map
    stays differentiable at 0.
    """
    sq, theta = _safe_norm(ang)
    small = sq < _EPS * _EPS
    K = hat(ang)  # = theta * hat(axis)
    KK = bmm(K, K)  # batched tiny matmul: VPU broadcast-sum, not dot_general
    st = jnp.sin(theta) / theta
    ct = (1.0 - jnp.cos(theta)) / (theta * theta)
    # Taylor: sin(t)/t ~ 1 - t^2/6 ; (1-cos t)/t^2 ~ 1/2 - t^2/24
    st = jnp.where(small, 1.0 - sq / 6.0, st)
    ct = jnp.where(small, 0.5 - sq / 24.0, ct)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=ang.dtype), K.shape)
    return eye + st[..., None, None] * K + ct[..., None, None] * KK


def exp_dt(ang_vel: jnp.ndarray, dt) -> jnp.ndarray:
    """Exp(omega * dt) — reference's second overload (core/math.hpp:26-41)."""
    return exp(ang_vel * jnp.asarray(dt)[..., None])


def log(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of exp: (..., 3, 3) -> (..., 3).

    Mirrors the reference Log (core/math.hpp:43-48): theta from the trace,
    axis from the antisymmetric part, with the same small-angle fallback
    0.5*K. (Like the reference, angles near pi lose precision; the SLAM
    pipeline only evaluates Log on small incremental rotations.)
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    K = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    small = jnp.abs(theta) < 1e-3
    sin_t = jnp.sin(theta)
    # 0.5*theta/sin(theta); Taylor 0.5*(1 + theta^2/6)
    scale = jnp.where(
        small,
        0.5 * (1.0 + theta * theta / 6.0),
        0.5 * theta / jnp.where(small, jnp.ones_like(sin_t), sin_t),
    )
    return scale[..., None] * K


def jr(vec: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian of SO(3) (reference jr, core/math.hpp:57-71)."""
    sq, ang = _safe_norm(vec)
    small = sq < _EPS * _EPS
    axis = vec / ang[..., None]
    ra = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(ang) / ang)
    rb = jnp.where(small, ang / 2.0 - ang * sq / 24.0, (1.0 - jnp.cos(ang)) / ang)
    eye = jnp.eye(3, dtype=vec.dtype)
    aaT = axis[..., :, None] * axis[..., None, :]
    return (
        ra[..., None, None] * eye
        + (1.0 - ra)[..., None, None] * aaT
        - rb[..., None, None] * hat(axis)
    )


def jr_inv_vec(vec: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian from an axis-angle vector (..., 3)."""
    sq, ang = _safe_norm(vec)
    small = sq < _EPS * _EPS
    axis = vec / ang[..., None]
    half = 0.5 * ang
    # ang/2 / tan(ang/2); Taylor: 1 - ang^2/12
    ctt = jnp.where(small, 1.0 - sq / 12.0, half / jnp.tan(jnp.where(small, jnp.ones_like(half), half)))
    eye = jnp.eye(3, dtype=vec.dtype)
    aaT = axis[..., :, None] * axis[..., None, :]
    return (
        ctt[..., None, None] * eye
        + (1.0 - ctt)[..., None, None] * aaT
        + half[..., None, None] * hat(axis)
    )


def jr_inv(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian from a rotation matrix (reference jr_inv,
    core/math.hpp:73-88, which goes through AngleAxis)."""
    return jr_inv_vec(log(R))
