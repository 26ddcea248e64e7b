"""Sliding-window bundle-adjustment optimizers (damped Levenberg-Marquardt).

Reference: src/mapping/optimizers.cpp — three LM drivers sharing one
trust-region policy (Nielsen mu-update u *= max(1/3, 1-(2q-1)^3),
optimizers.cpp:144-160):
  * Lidar_BA_Optimizer        — 6-DoF/frame, lidar factor only (cpp:12-167)
  * LI_BA_Optimizer           — 15-DoF/frame, lidar(+normal)+IMU (cpp:169-594)
  * LI_BA_OptimizerGravity    — adds a shared 3-dim gravity column (cpp:627-826)

TPU design: the reference's 4-5 thread Hessian fan-out becomes the batched
factor kernels in factors.py; the LM loop is a lax.while_loop whose carry
holds (poses, damping, residual, bias-correction state); the 150x150 (or
153x153) gauge-fixed solve runs in f64 via an arithmetic-only PSD
Cholesky (core/linalg.py; TPU has no f64 LAPACK). IMU factor
blocks are assembled with a statically unrolled loop over the W-1 window
edges. Rejected steps roll back the preintegration bias corrections
(optimizers.cpp:507-511).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vina_slam_tpu.core import so3
from vina_slam_tpu.core.constants import DIM
from vina_slam_tpu.core.linalg import solve_psd, solve_psd_refined
from vina_slam_tpu.core.state import NavState
from vina_slam_tpu.estimation import preintegration as pre
from vina_slam_tpu.mapping import factors as fx


class WindowPoses(NamedTuple):
    """The optimized window variables (a batched 15-DoF state + shared g)."""
    R: jnp.ndarray   # (W, 3, 3)
    p: jnp.ndarray   # (W, 3)
    v: jnp.ndarray   # (W, 3)
    bg: jnp.ndarray  # (W, 3)
    ba: jnp.ndarray  # (W, 3)
    g: jnp.ndarray   # (3,) shared gravity


def from_states(xs: NavState) -> WindowPoses:
    return WindowPoses(R=xs.R, p=xs.p, v=xs.v, bg=xs.bg, ba=xs.ba,
                       g=xs.g[0] if xs.g.ndim == 2 else xs.g)


def _imu_assemble(pre_f: pre.PreintFactor, w: WindowPoses, W: int,
                  with_gravity: bool, jac: bool):
    """Evaluate all W-1 preintegration edges and assemble their JtJ/Jtr into
    the (W*DIM [+3]) system (optimizers.cpp:215-231, 671-683)."""
    L = W * DIM + (3 if with_gravity else 0)
    H = jnp.zeros((L, L), jnp.float64)
    g = jnp.zeros((L,), jnp.float64)

    if not jac:
        # residual-only trial evaluation: no Jacobians at all
        res = pre.cost_all(pre_f, w.R, w.p, w.v, w.bg, w.ba, w.g)
        return res, H, g

    cost, joca, jocb, jocg, rr, cov_inv = pre.evaluate_all(
        pre_f, w.R, w.p, w.v, w.bg, w.ba, w.g, with_gravity)
    res = jnp.sum(cost)

    if with_gravity:
        joc = jnp.concatenate([joca, jocb, jocg], axis=-1)   # (W-1, 15, 33)
    else:
        joc = jnp.concatenate([joca, jocb], axis=-1)         # (W-1, 15, 30)
    # batched tiny contractions (15-wide): broadcast-sum, not dot_general
    cj = jnp.sum(cov_inv[..., :, :, None] * joc[..., None, :, :], axis=-2)
    jtj = jnp.sum(joc[..., :, :, None] * cj[..., :, None, :], axis=-3)
    jtr = jnp.sum(joc * jnp.sum(cov_inv * rr[..., None, :], axis=-1)[..., None],
                  axis=-2)

    for i in range(W - 1):  # static unroll: W-1 block-placements
        H = H.at[i * DIM:(i + 2) * DIM, i * DIM:(i + 2) * DIM].add(
            jtj[i, : 2 * DIM, : 2 * DIM])
        g = g.at[i * DIM:(i + 2) * DIM].add(jtr[i, : 2 * DIM])
        if with_gravity:
            H = H.at[i * DIM:(i + 2) * DIM, L - 3:].add(jtj[i, : 2 * DIM, 2 * DIM:])
            H = H.at[L - 3:, i * DIM:(i + 2) * DIM].add(jtj[i, 2 * DIM:, : 2 * DIM])
            H = H.at[L - 3:, L - 3:].add(jtj[i, 2 * DIM:, 2 * DIM:])
            g = g.at[L - 3:].add(jtr[i, 2 * DIM:])
    return res, H, g


def _lift_matrix(W, L):
    """0/1 embedding P (L, 6W) mapping pose-only coords into the DIM layout;
    H_full = P H6 P^T in one matmul (replaces W^2 slice updates — far
    smaller XLA graph than hess_plus's per-block loop, optimizers.cpp:171)."""
    P = np.zeros((L, 6 * W))
    for i in range(W):
        P[i * DIM:i * DIM + 6, i * 6:(i + 1) * 6] = np.eye(6)
    return jnp.asarray(P)


def _lift6_to_full(H6, g6, W, L):
    """Map the 6-DoF lidar blocks into the DIM-DoF layout
    (hess_plus, optimizers.cpp:171-179)."""
    P = _lift_matrix(W, L)
    return P @ H6 @ P.T, P @ g6


def _apply_step(w: WindowPoses, dxi, W, with_gravity):
    """Boxplus the LM step onto all window states (optimizers.cpp:468-475)."""
    from vina_slam_tpu.core.mat3 import bmm
    d = dxi[: W * DIM].reshape(W, DIM)
    R = bmm(w.R, so3.exp(d[:, 0:3]))
    out = w._replace(R=R, p=w.p + d[:, 3:6], v=w.v + d[:, 6:9],
                     bg=w.bg + d[:, 9:12], ba=w.ba + d[:, 12:15])
    if with_gravity:
        out = out._replace(g=w.g + dxi[W * DIM:])
    return out


def _nielsen(u, v, q, q1):
    """Trust-region update (optimizers.cpp:144-160)."""
    ratio = q / q1
    accept = q > 0
    scale = 1.0 - (2.0 * ratio - 1.0) ** 3
    scale = jnp.maximum(scale, 1.0 / 3.0)
    u_acc, v_acc = u * scale, jnp.asarray(2.0)
    u_rej, v_rej = u * v, 2.0 * v
    return accept, jnp.where(accept, u_acc, u_rej), jnp.where(accept, v_acc, v_rej)


class LMResult(NamedTuple):
    poses: WindowPoses
    pre_f: pre.PreintFactor
    hess: jnp.ndarray
    residual0: jnp.ndarray
    residual1: jnp.ndarray
    iters: jnp.ndarray


@partial(jax.jit, static_argnames=("W", "max_iter", "use_normal",
                                   "with_gravity", "use_imu", "axis_name"))
def damping_iter(w: WindowPoses, lidar_f: fx.BAFactors, pre_f, imu_coef,
                 W: int, max_iter: int = 10, use_normal: bool = False,
                 with_gravity: bool = False, use_imu: bool = True,
                 axis_name: str | None = None) -> LMResult:
    """The LM driver covering all three reference optimizers:
      use_imu=False                  -> Lidar_BA_Optimizer (6-DoF semantics;
                                        run in the 15-DoF layout with the
                                        unused sub-blocks untouched)
      use_imu=True                   -> LI_BA_Optimizer::damping_iter (cpp:430)
      use_imu=True, use_normal=True  -> 3-factor overload (cpp:519, max_iter=3)
      with_gravity=True              -> LI_BA_OptimizerGravity (cpp:746)

    Gauge fixing: first pose rows/cols zeroed, identity block (cpp:460-463);
    gravity variant fixes only the first 6 DoF (cpp:772-775).

    axis_name: when run inside shard_map with the factor arrays sharded over
    a mesh axis (parallel/mesh.sharded_damping_iter), the per-shard lidar/
    normal factor evaluations are psum-reduced over that axis — the TPU ICI
    analog of the reference's per-thread Hessian join (optimizers.cpp:36-56).
    Window states, IMU factors, and the LM control flow stay replicated."""
    L = W * DIM + (3 if with_gravity else 0)
    gauge = 6 if with_gravity else DIM

    def _reduce(*vals):
        if axis_name is None:
            return vals
        return tuple(jax.lax.psum(v, axis_name) for v in vals)

    def total_eval(w_, pre_f_, jac):
        H = jnp.zeros((L, L), jnp.float64)
        g = jnp.zeros((L,), jnp.float64)
        res = jnp.zeros((), jnp.float64)
        if use_imu:
            r_imu, H_imu, g_imu = _imu_assemble(pre_f_, w_, W, with_gravity, jac)
            res += 0.5 * imu_coef * r_imu
            H += imu_coef * H_imu
            g += imu_coef * g_imu
        if jac:
            r_l, g6, H6 = _reduce(*fx.lidar_acc(lidar_f, w_.R, w_.p, W))
            Hl, gl = _lift6_to_full(H6, g6, W, L)
            H += Hl
            g += gl
            res += r_l
            if use_normal:
                r_n, g6n, H6n = _reduce(*fx.normal_acc(lidar_f, w_.R, w_.p, W))
                Hn, gn = _lift6_to_full(H6n, g6n, W, L)
                H += Hn
                g += gn
                res += r_n
        else:
            (r_l,) = _reduce(fx.lidar_residual(lidar_f, w_.R, w_.p))
            res += r_l
            if use_normal:
                (r_n,) = _reduce(fx.normal_residual(lidar_f, w_.R, w_.p))
                res += r_n
        return res, H, g

    res0, H0, g0 = total_eval(w, pre_f, True)

    def cond(carry):
        (i, done, *_rest) = carry
        return (i < max_iter) & ~done

    def body(carry):
        i, done, w_, pre_f_, u, v, res1, H, g, hess_out, res_last = carry

        # gauge fix + damped solve
        Hf = H.at[:gauge, :].set(0.0).at[:, :gauge].set(0.0)
        Hf = Hf.at[:gauge, :gauge].set(jnp.eye(gauge))
        gf = g.at[:gauge].set(0.0)
        D = jnp.diag(jnp.diag(Hf))
        dxi = solve_psd_refined(Hf + u * D, -gf)

        w_try = _apply_step(w_, dxi, W, with_gravity)
        pre_try = jax.vmap(pre.update_bias_state)(
            pre_f_, dxi[: (W - 1) * DIM].reshape(W - 1, DIM)) if use_imu else pre_f_

        q1 = 0.5 * jnp.dot(dxi, u * (D @ dxi) - gf)
        # ONE full Jacobian evaluation at the trial point replaces the
        # residual-only trial eval PLUS the accepted-step Hessian recompute
        # (is_calc_hess): lidar_acc is no dearer than lidar_residual (both
        # are dominated by the column aggregation) and already returns the
        # energy, so on accept the new H/g are free and on reject they are
        # simply dropped — same accept/reject sequence, ~2 factor sweeps
        # per iteration saved.
        res2, H2, g2 = total_eval(w_try, pre_try, True)

        q = res1 - res2
        accept, u2, v2 = _nielsen(u, v, q, q1)

        w_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), w_, w_try)
        # only the bias-correction fields mutate under update_bias_state —
        # a whole-pytree where would copy the (W-1, 15, 15) f64 covariances
        # and deltas every iteration
        pre_next = pre_f_._replace(
            dbg=jnp.where(accept, pre_try.dbg, pre_f_.dbg),
            dba=jnp.where(accept, pre_try.dba, pre_f_.dba),
            dbg_buf=jnp.where(accept, pre_try.dbg_buf, pre_f_.dbg_buf),
            dba_buf=jnp.where(accept, pre_try.dba_buf, pre_f_.dba_buf),
        ) if use_imu else pre_f_

        res_n = jnp.where(accept, res2, res1)
        H_n = jnp.where(accept, H2, H)
        g_n = jnp.where(accept, g2, g)
        hess_out = jnp.where(accept, H2, hess_out)

        converged = jnp.abs((res1 - res2) / jnp.maximum(jnp.abs(res1), 1e-30)) < 1e-6
        return (i + 1, converged, w_next, pre_next, u2, v2, res_n, H_n, g_n,
                hess_out, res2)

    init = (jnp.asarray(0), jnp.asarray(False), w, pre_f,
            jnp.asarray(0.01), jnp.asarray(2.0), res0, H0, g0, H0, res0)
    i, done, w_out, pre_out, u, v, res_f, H_f, g_f, hess, res_last = (
        jax.lax.while_loop(cond, body, init))
    return LMResult(poses=w_out, pre_f=pre_out, hess=hess,
                    residual0=res0, residual1=res_last, iters=i)


@partial(jax.jit, static_argnames=("W",))
def energy_breakdown(w: WindowPoses, lidar_f: fx.BAFactors, pre_f, imu_coef, W: int):
    """print_breakdown analog (optimizers.cpp:596-625): per-factor-type
    energies (E_imu, E_lidar, E_normal, total) for debugging/telemetry."""
    r_imu, _, _ = _imu_assemble(pre_f, w, W, False, False)
    e_imu = 0.5 * imu_coef * r_imu
    e_lidar = fx.lidar_residual(lidar_f, w.R, w.p)
    e_normal = fx.normal_residual(lidar_f, w.R, w.p)
    return e_imu, e_lidar, e_normal, e_imu + e_lidar + e_normal


@partial(jax.jit, static_argnames=("W", "max_iter"))
def damping_iter_lidar_only(w: WindowPoses, lidar_f: fx.BAFactors,
                            W: int, max_iter: int = 10) -> LMResult:
    """Lidar_BA_Optimizer::damping_iter (optimizers.cpp:91-167): 6-DoF per
    frame, lidar eigenvalue factor only, same gauge fix and Nielsen policy."""
    L = W * 6

    def ev_full(w_):
        return fx.lidar_acc(lidar_f, w_.R, w_.p, W)

    res0, g0, H0 = ev_full(w)

    def cond(c):
        return (c[0] < max_iter) & ~c[1]

    def body(c):
        i, done, w_, u, v, res1, H, g, hess_out, _ = c
        Hf = H.at[:6, :].set(0.0).at[:, :6].set(0.0)
        Hf = Hf.at[:6, :6].set(jnp.eye(6))
        gf = g.at[:6].set(0.0)
        D = jnp.diag(jnp.diag(Hf))
        dxi = solve_psd_refined(Hf + u * D, -gf)
        d = dxi.reshape(W, 6)
        from vina_slam_tpu.core.mat3 import bmm as _bmm
        w_try = w_._replace(
            R=_bmm(w_.R, so3.exp(d[:, 0:3])),
            p=w_.p + d[:, 3:6])
        q1 = 0.5 * jnp.dot(dxi, u * (D @ dxi) - gf)
        # one full eval at the trial point (see damping_iter): the energy
        # comes with the Jacobians, so accept keeps H2/g2 and reject drops
        # them — no separate residual pass, no recompute cond
        res2, g2, H2 = ev_full(w_try)
        q = res1 - res2
        accept, u2, v2 = _nielsen(u, v, q, q1)
        w_next = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, b, a), w_, w_try)
        res_n = jnp.where(accept, res2, res1)
        g_n = jnp.where(accept, g2, g)
        H_n = jnp.where(accept, H2, H)
        hess_out = jnp.where(accept, H2, hess_out)
        converged = jnp.abs((res1 - res2) / jnp.maximum(jnp.abs(res1), 1e-30)) < 1e-6
        return (i + 1, converged, w_next, u2, v2, res_n, H_n, g_n, hess_out, res2)

    init = (jnp.asarray(0), jnp.asarray(False), w, jnp.asarray(0.01),
            jnp.asarray(2.0), res0, H0, g0, H0, res0)
    i, done, w_out, u, v, res_f, H_f, g_f, hess, res_last = (
        jax.lax.while_loop(cond, body, init))
    return LMResult(poses=w_out, pre_f=None, hess=hess,
                    residual0=res0, residual1=res_last, iters=i)
