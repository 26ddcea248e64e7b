"""Point-cluster (second moment) algebra — the PointCluster analog.

Reference: include/vina_slam/core/types.hpp:115-175. A cluster is the
sufficient statistic of a set of points: P = sum p p^T, v = sum p, N = count.
Represented struct-of-arrays so clusters batch over (voxel, window-frame, ...)
axes; the closed-form rigid `transform` (types.hpp:168-174) is what lets BA
re-evaluate per-frame voxel statistics without touching raw points.

All ops broadcast over leading axes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Cluster(NamedTuple):
    P: jnp.ndarray  # (..., 3, 3)
    v: jnp.ndarray  # (..., 3)
    N: jnp.ndarray  # (...,)


def zero(batch=(), dtype=jnp.float32) -> Cluster:
    return Cluster(
        P=jnp.zeros(batch + (3, 3), dtype),
        v=jnp.zeros(batch + (3,), dtype),
        N=jnp.zeros(batch, dtype),
    )


def from_points(pts: jnp.ndarray, mask=None) -> Cluster:
    """Accumulate points (..., N, 3) (optionally masked by (..., N)) into a
    cluster over the second-to-last axis."""
    if mask is not None:
        w = mask.astype(pts.dtype)
        pts = pts * w[..., None]  # masked points zeroed -> P, v already correct
        N = jnp.sum(w, axis=-1)
    else:
        N = jnp.full(pts.shape[:-2], pts.shape[-2], pts.dtype)
    P = jnp.einsum("...ni,...nj->...ij", pts, pts)
    v = jnp.sum(pts, axis=-2)
    return Cluster(P=P, v=v, N=N)


def add(a: Cluster, b: Cluster) -> Cluster:
    return Cluster(a.P + b.P, a.v + b.v, a.N + b.N)


def sub(a: Cluster, b: Cluster) -> Cluster:
    return Cluster(a.P - b.P, a.v - b.v, a.N - b.N)


def cov(c: Cluster) -> jnp.ndarray:
    """Covariance P/N - mean mean^T (types.hpp:144-148); safe at N=0."""
    n = jnp.maximum(c.N, 1.0)[..., None]
    center = c.v / n
    return c.P / n[..., None] - center[..., :, None] * center[..., None, :]


def mean(c: Cluster) -> jnp.ndarray:
    n = jnp.maximum(c.N, 1.0)[..., None]
    return c.v / n


def transform(c: Cluster, R: jnp.ndarray, p: jnp.ndarray) -> Cluster:
    """Rigid transform of cluster moments (types.hpp:168-174):
      v' = R v + N p
      P' = R P R^T + (R v) p^T + p (R v)^T + N p p^T
    R: (..., 3, 3), p: (..., 3) broadcast against the cluster batch."""
    Rv = jnp.einsum("...ij,...j->...i", R, c.v)
    v2 = Rv + c.N[..., None] * p
    rp = Rv[..., :, None] * p[..., None, :]
    P2 = (
        jnp.einsum("...ij,...jk,...lk->...il", R, c.P, R)
        + rp
        + jnp.swapaxes(rp, -1, -2)
        + (c.N[..., None, None]) * p[..., :, None] * p[..., None, :]
    )
    return Cluster(P=P2, v=v2, N=c.N)
