"""Per-point covariance model, batched.

Reference: src/core/point_utils.cpp:3-65. Each LiDAR return carries a 3x3
covariance from range noise (dept_err, meters) plus bearing noise
(beam_err, degrees); the extrinsic rotates it into the IMU frame and
`pvec_update` pushes state uncertainty into the world-frame covariance.
All functions operate on (..., N, 3) point batches.
"""

from __future__ import annotations

import jax.numpy as jnp

from vina_slam_tpu.core import so3
from vina_slam_tpu.core.mat3 import bmm, bmmT, sandwich


def body_var(pts: jnp.ndarray, dept_err: float, beam_err_deg: float) -> jnp.ndarray:
    """calcBodyVar (point_utils.cpp:3-34) for (..., 3) points -> (..., 3, 3).

    var = d (range_err^2) d^T + A diag(sin^2(beam)) A^T  with
    A = range * [d]x [b1 b2] built from an orthonormal bearing basis.
    """
    z = pts[..., 2]
    pts = pts.at[..., 2].set(jnp.where(z == 0, 1e-4, z))

    rng = jnp.sqrt(jnp.maximum(jnp.sum(pts * pts, axis=-1), 1e-12))
    d = pts / rng[..., None]

    range_var = jnp.asarray(dept_err * dept_err, pts.dtype)
    s = jnp.sin(jnp.deg2rad(jnp.asarray(beam_err_deg, pts.dtype)))
    dir_var = s * s

    # base_vector1 = normalize([1, 1, -(d0+d1)/d2]) as in the reference
    b1 = jnp.stack(
        [jnp.ones_like(d[..., 0]), jnp.ones_like(d[..., 0]), -(d[..., 0] + d[..., 1]) / d[..., 2]],
        axis=-1,
    )
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = jnp.cross(b1, d)
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)

    dhat = so3.hat(d)
    Nmat = jnp.stack([b1, b2], axis=-1)  # (..., 3, 2)
    A = rng[..., None, None] * bmm(dhat, Nmat)  # (..., 3, 2)

    ddT = d[..., :, None] * d[..., None, :]
    return range_var * ddT + dir_var * bmmT(A, A)


def var_init(ext_R, ext_p, pts_lidar, dept_err, beam_err_deg):
    """var_init (point_utils.cpp:36-52): LiDAR-frame points -> IMU-frame
    points + covariances. Returns (pts_imu, var_imu)."""
    var = body_var(pts_lidar, dept_err, beam_err_deg)
    pts = pts_lidar @ ext_R.T + ext_p
    var = sandwich(jnp.broadcast_to(ext_R, var.shape), var)
    return pts, var


# Packed symmetric 3x3 in (xx, xy, xz, yy, yz, zz) order — matches the
# voxel map's _seg_cols moment-column convention.
SYM3 = ((0, 1, 2), (1, 3, 4), (2, 4, 5))


def sym3_pack(M):
    """(..., 3, 3) symmetric -> (..., 6) packed upper triangle."""
    return jnp.stack([M[..., 0, 0], M[..., 0, 1], M[..., 0, 2],
                      M[..., 1, 1], M[..., 1, 2], M[..., 2, 2]], axis=-1)


def sym3_unpack(p6):
    """(..., 6) packed -> full symmetric (..., 3, 3)."""
    a, b, c, d, e, f = (p6[..., i] for i in range(6))
    return jnp.stack([jnp.stack([a, b, c], -1),
                      jnp.stack([b, d, e], -1),
                      jnp.stack([c, e, f], -1)], -2)


def world_var(pts_body, var_body, R, p, cov15):
    """pvec_update (point_utils.cpp:54-65): push pose uncertainty into the
    world-frame point covariance and return world points.

    var_w = R var R^T + [p_body]x Sigma_R [p_body]x^T + Sigma_t
    """
    rot_var = cov15[0:3, 0:3].astype(pts_body.dtype)
    tsl_var = cov15[3:6, 3:6].astype(pts_body.dtype)
    phat = so3.hat(pts_body)
    R32 = R.astype(pts_body.dtype)
    var_w = (
        sandwich(jnp.broadcast_to(R32, var_body.shape), var_body)
        + sandwich(phat, jnp.broadcast_to(rot_var, var_body.shape))
        + tsl_var
    )
    pts_w = pts_body @ R.T.astype(pts_body.dtype) + p.astype(pts_body.dtype)
    return pts_w, var_w
