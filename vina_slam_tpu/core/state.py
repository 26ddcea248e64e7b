"""Navigation state pytree — the IMUST analog.

Reference: include/vina_slam/core/types.hpp:43-113. A 15-DoF error-state
[dtheta, dp, dv, dbg, dba] rides on (R, p, v, bg, ba); gravity g and time t
are carried alongside; cov is the 15x15 state covariance. Implemented as a
NamedTuple pytree so states batch/vmap/scan naturally (a window of states is
just a NavState with a leading axis).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vina_slam_tpu.core import so3
from vina_slam_tpu.core.constants import DIM, G_M_S2


class NavState(NamedTuple):
    t: jnp.ndarray    # (...,)       scan-end timestamp
    R: jnp.ndarray    # (..., 3, 3)  body->world rotation
    p: jnp.ndarray    # (..., 3)     position
    v: jnp.ndarray    # (..., 3)     velocity
    bg: jnp.ndarray   # (..., 3)     gyro bias
    ba: jnp.ndarray   # (..., 3)     accel bias
    g: jnp.ndarray    # (..., 3)     gravity in world frame
    cov: jnp.ndarray  # (..., 15, 15) state covariance


def identity_state(dtype=jnp.float64, batch=()) -> NavState:
    """Zero state with the reference's initial covariance
    (types.hpp:101-112: 1e-4*I, bias block 1e-5*I)."""
    cov = jnp.eye(DIM, dtype=dtype) * 1e-4
    cov = cov.at[9:, 9:].set(jnp.eye(6, dtype=dtype) * 1e-5)

    def b(x):
        return jnp.broadcast_to(x, batch + x.shape)

    return NavState(
        t=jnp.zeros(batch, dtype),
        R=b(jnp.eye(3, dtype=dtype)),
        p=b(jnp.zeros(3, dtype)),
        v=b(jnp.zeros(3, dtype)),
        bg=b(jnp.zeros(3, dtype)),
        ba=b(jnp.zeros(3, dtype)),
        g=b(jnp.array([0.0, 0.0, -G_M_S2], dtype)),
        cov=b(cov),
    )


def boxplus(x: NavState, delta: jnp.ndarray) -> NavState:
    """x [+] delta with right-perturbation on rotation: R <- R Exp(dtheta)
    (reference operator+=, types.hpp:67-75). delta: (..., 15)."""
    return x._replace(
        R=x.R @ so3.exp(delta[..., 0:3]),
        p=x.p + delta[..., 3:6],
        v=x.v + delta[..., 6:9],
        bg=x.bg + delta[..., 9:12],
        ba=x.ba + delta[..., 12:15],
    )


def boxminus(a: NavState, b: NavState) -> jnp.ndarray:
    """a [-] b -> (..., 15) with dtheta = Log(R_b^T R_a)
    (reference operator-, types.hpp:77-86)."""
    return jnp.concatenate(
        [
            so3.log(jnp.swapaxes(b.R, -1, -2) @ a.R),
            a.p - b.p,
            a.v - b.v,
            a.bg - b.bg,
            a.ba - b.ba,
        ],
        axis=-1,
    )


def index(x: NavState, i) -> NavState:
    """Select state i from a batched NavState."""
    return NavState(*(f[i] for f in x))


def set_index(x: NavState, i, xi: NavState) -> NavState:
    """Functionally write state xi at index i of a batched NavState."""
    return NavState(*(f.at[i].set(fi) for f, fi in zip(x, xi)))
