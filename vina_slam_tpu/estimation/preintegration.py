"""On-manifold IMU preintegration factor.

Reference: src/estimation/imu_preintegration.cpp. The per-sample recursion
(add_imu, cpp:57-95) runs as a lax.scan over a fixed IMU bucket; the factor
evaluation give_evaluate / give_evaluate_g (cpp:97-237) is a direct batched
translation producing the (30x30 / 33x33) JtJ blocks and gradients used by
the windowed BA. First-order bias correction state (dbg/dba) with rollback
buffers matches update_state (cpp:239-246). All math f64 (tiny tensors).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vina_slam_tpu.core import so3
from vina_slam_tpu.core.constants import DIM, IMU_BUCKET
from vina_slam_tpu.core.mat3 import bmm, bmv, sandwich
from vina_slam_tpu.core.linalg import inv_psd
from vina_slam_tpu.core.state import NavState
from vina_slam_tpu.sensor.sync import ImuBlock


class PreintFactor(NamedTuple):
    """Batched over leading axes (the window has W-1 factors)."""
    R_delta: jnp.ndarray  # (..., 3, 3)
    p_delta: jnp.ndarray  # (..., 3)
    v_delta: jnp.ndarray  # (..., 3)
    R_bg: jnp.ndarray     # (..., 3, 3) d(DeltaR)/d(bg)
    p_bg: jnp.ndarray
    p_ba: jnp.ndarray
    v_bg: jnp.ndarray
    v_ba: jnp.ndarray
    dtime: jnp.ndarray    # (...,)
    cov: jnp.ndarray      # (..., 15, 15)
    cov_inv: jnp.ndarray  # (..., 15, 15) cached information (cov is fixed
                          # through the LM; only dbg/dba change)
    dbg: jnp.ndarray      # (..., 3) first-order bias corrections
    dba: jnp.ndarray
    dbg_buf: jnp.ndarray  # rollback buffers
    dba_buf: jnp.ndarray


def _zero(dtype=jnp.float64):
    z3 = jnp.zeros(3, dtype)
    z33 = jnp.zeros((3, 3), dtype)
    return PreintFactor(
        R_delta=jnp.eye(3, dtype=dtype), p_delta=z3, v_delta=z3,
        R_bg=z33, p_bg=z33, p_ba=z33, v_bg=z33, v_ba=z33,
        dtime=jnp.zeros((), dtype), cov=jnp.zeros((DIM, DIM), dtype),
        cov_inv=jnp.zeros((DIM, DIM), dtype),
        dbg=z3, dba=z3, dbg_buf=z3, dba_buf=z3,
    )


@jax.jit
def build_factor(gyr_mid, acc_mid, dt, valid, bg, ba, noise_meas, noise_walk, scale_gravity):
    """add_imu (cpp:57-95) reformulated in LOG depth (see ekf._propagate for
    the rationale — a sequential scan over ~100 samples cost ~40 ms/scan on
    TPU). Rotation increments compose by matmul prefix products; the delta
    p/v become cumulative sums once the DeltaR prefixes are known; the bias
    Jacobian recursion J' = Ja J + B (J: 9x6 over [R_bg; p_bg|p_ba;
    v_bg|v_ba], J0 = 0) and the covariance recursion cov' = Ja cov Ja^T + Q
    compose associatively, so three jax.lax.associative_scan calls replace
    the 128-step chain. Padding samples have dt == 0 and are exact identity
    maps.

    gyr_mid/acc_mid: (K, 3) midpoint samples; dt: (K,); valid: (K,) mask.
    bg/ba: linearization-point biases. noise_meas/noise_walk: (6, 6).
    """
    f32 = jnp.float32
    dtc = jnp.where(valid, dt, 0.0)
    K = dtc.shape[0]
    w = gyr_mid - bg[None, :]
    a = acc_mid * scale_gravity - ba[None, :]
    E = so3.exp(w * dtc[:, None])                    # (K, 3, 3) rot_inc
    jrk = so3.jr(w * dtc[:, None])                   # (K, 3, 3) right Jacobian
    a_skew = so3.hat(a)

    Rd_incl = jax.lax.associative_scan(bmm, E)       # DeltaR after step i
    eye3 = jnp.eye(3, dtype=E.dtype)
    Rd_excl = jnp.concatenate([eye3[None], Rd_incl[:-1]], axis=0)

    rot_dt = dtc[:, None, None] * Rd_excl
    rot_dt2_half = (0.5 * dtc * dtc)[:, None, None] * Rd_excl

    dv = bmv(rot_dt, a)
    v_incl = jnp.cumsum(dv, axis=0)
    v_excl = jnp.concatenate([jnp.zeros((1, 3), dv.dtype), v_incl[:-1]], axis=0)
    dp = v_excl * dtc[:, None] + bmv(rot_dt2_half, a)
    p_incl = jnp.cumsum(dp, axis=0)

    # bias Jacobian: X' = Ja X + B with X0 = 0  =>  X_final = composed B
    Ja = jnp.broadcast_to(jnp.eye(9, dtype=E.dtype), (K, 9, 9))
    Ja = Ja.at[:, 0:3, 0:3].set(jnp.swapaxes(E, -1, -2))
    Ja = Ja.at[:, 3:6, 0:3].set(-bmm(rot_dt2_half, a_skew))
    Ja = Ja.at[:, 3:6, 6:9].set(eye3[None] * dtc[:, None, None])
    Ja = Ja.at[:, 6:9, 0:3].set(-bmm(rot_dt, a_skew))
    B = jnp.zeros((K, 9, 6), E.dtype)
    B = B.at[:, 0:3, 0:3].set(-jrk * dtc[:, None, None])
    B = B.at[:, 3:6, 3:6].set(-rot_dt2_half)
    B = B.at[:, 6:9, 3:6].set(-rot_dt)

    def aff(c1, c2):  # apply c1 first, then c2
        A1, B1 = c1
        A2, B2 = c2
        return bmm(A2, A1), bmm(A2, B1) + B2

    # only the TERMINAL composition is consumed: pairwise tree REDUCTION
    # instead of a full-prefix associative_scan (same trick as
    # ekf._propagate's covariance; ~log2(K)x less batched-matmul work).
    # Padding to a power of two is free — identity affine pairs.
    def _tree_reduce(A_, B_, comb, eyeA, zeroB):
        Kp = 1 << (A_.shape[0] - 1).bit_length()
        if Kp != A_.shape[0]:
            pad = Kp - A_.shape[0]
            A_ = jnp.concatenate(
                [A_, jnp.broadcast_to(eyeA, (pad,) + eyeA.shape)])
            B_ = jnp.concatenate(
                [B_, jnp.broadcast_to(zeroB, (pad,) + zeroB.shape)])
        while A_.shape[0] > 1:
            A_, B_ = comb((A_[0::2], B_[0::2]), (A_[1::2], B_[1::2]))
        return A_[0], B_[0]

    _, J = _tree_reduce(Ja, B, aff, jnp.eye(9, dtype=E.dtype),
                        jnp.zeros((9, 6), E.dtype))

    # covariance: cov99' = Ja cov99 Ja^T + Jb nm Jb^T, composed in f32 (the
    # covariance only weights the BA residuals; f64 matmuls are emulated)
    Jb = jnp.zeros((K, 9, 6), f32)
    Jb = Jb.at[:, 0:3, 0:3].set((jrk * dtc[:, None, None]).astype(f32))
    Jb = Jb.at[:, 3:6, 3:6].set(rot_dt2_half.astype(f32))
    Jb = Jb.at[:, 6:9, 3:6].set(rot_dt.astype(f32))
    Qk = sandwich(Jb, jnp.broadcast_to(noise_meas.astype(f32),
                                       Jb.shape[:-2] + (6, 6)))

    def cov_comp(c1, c2):
        F1, Q1 = c1
        F2, Q2 = c2
        return bmm(F2, F1), sandwich(F2, Q1) + Q2

    _, Qterm = _tree_reduce(Ja.astype(f32), Qk, cov_comp,
                            jnp.eye(9, dtype=f32), jnp.zeros((9, 9), f32))
    dtime = jnp.sum(dtc)
    cov = jnp.zeros((DIM, DIM), jnp.float64)
    cov = cov.at[0:9, 0:9].set(Qterm.astype(jnp.float64))
    cov = cov.at[9:15, 9:15].set(noise_walk * dtime)

    f = _zero()._replace(
        R_delta=Rd_incl[-1], p_delta=p_incl[-1], v_delta=v_incl[-1],
        R_bg=J[0:3, 0:3], p_bg=J[3:6, 0:3], p_ba=J[3:6, 3:6],
        v_bg=J[6:9, 0:3], v_ba=J[6:9, 3:6],
        dtime=dtime, cov=cov,
    )
    return f._replace(cov_inv=inv_psd(cov))


def factor_from_block(imu: ImuBlock, bg, ba, noise_meas, noise_walk, scale_gravity) -> PreintFactor:
    """push_imu analog (cpp:31-55): midpoint samples from consecutive raw
    samples of the (stamp-conditioned) block."""
    K = IMU_BUCKET
    t, g, a = imu.t, imu.gyr, imu.acc
    n = len(t) - 1
    if n > K:
        raise RuntimeError(f"IMU bucket overflow: {n} > {K}")
    gm = np.zeros((K, 3))
    am = np.zeros((K, 3))
    dt = np.zeros(K)
    gm[:n] = 0.5 * (g[:-1] + g[1:])
    am[:n] = 0.5 * (a[:-1] + a[1:])
    dt[:n] = t[1:] - t[:-1]
    valid = np.arange(K) < n
    return build_factor(
        jnp.asarray(gm), jnp.asarray(am), jnp.asarray(dt), jnp.asarray(valid),
        jnp.asarray(bg, jnp.float64), jnp.asarray(ba, jnp.float64),
        jnp.asarray(noise_meas), jnp.asarray(noise_walk),
        jnp.asarray(float(scale_gravity)),
    )


def evaluate(f: PreintFactor, st1: NavState, st2: NavState, with_gravity: bool = False):
    """give_evaluate[_g] (cpp:97-237), single factor.

    Returns (cost, joca, jocb, jocg, rr, cov_inv): per-state 15x15 Jacobians
    (and 15x3 gravity Jacobian if requested), residual and information. The
    optimizer assembles jtj = J^T cov_inv J itself so lidar/imu/gravity
    layouts can share one code path. cost = rr^T cov_inv rr (unscaled; the
    optimizer applies imu_coef and the 0.5).
    """
    R_correct = f.R_delta @ so3.exp(f.R_bg @ f.dbg)
    t_correct = f.p_delta + f.p_bg @ f.dbg + f.p_ba @ f.dba
    v_correct = f.v_delta + f.v_bg @ f.dbg + f.v_ba @ f.dba

    res_R = R_correct.T @ st1.R.T @ st2.R
    exp_v = st1.R.T @ (st2.v - st1.v - f.dtime * st1.g)
    res_v = exp_v - v_correct
    exp_t = st1.R.T @ (st2.p - st1.p - st1.v * f.dtime - 0.5 * f.dtime**2 * st1.g)
    res_t = exp_t - t_correct

    rr = jnp.concatenate([
        so3.log(res_R), res_t, res_v, st2.bg - st1.bg, st2.ba - st1.ba,
    ])
    cov_inv = f.cov_inv  # cached at build (cov is fixed through the LM)
    cost = rr @ cov_inv @ rr

    JR_inv = so3.jr_inv(res_R)
    eye = jnp.eye(3, dtype=jnp.float64)
    joca = jnp.zeros((DIM, DIM), jnp.float64)
    jocb = jnp.zeros((DIM, DIM), jnp.float64)

    joca = joca.at[0:3, 0:3].set(-JR_inv @ st2.R.T @ st1.R)
    jocb = jocb.at[0:3, 0:3].set(JR_inv)
    joca = joca.at[0:3, 9:12].set(-JR_inv @ res_R.T @ so3.jr(f.R_bg @ f.dbg) @ f.R_bg)

    joca = joca.at[3:6, 0:3].set(so3.hat(exp_t))
    joca = joca.at[3:6, 3:6].set(-st1.R.T)
    joca = joca.at[3:6, 6:9].set(-st1.R.T * f.dtime)
    joca = joca.at[3:6, 9:12].set(-f.p_bg)
    joca = joca.at[3:6, 12:15].set(-f.p_ba)
    jocb = jocb.at[3:6, 3:6].set(st1.R.T)

    joca = joca.at[6:9, 0:3].set(so3.hat(exp_v))
    joca = joca.at[6:9, 6:9].set(-st1.R.T)
    joca = joca.at[6:9, 9:12].set(-f.v_bg)
    joca = joca.at[6:9, 12:15].set(-f.v_ba)
    jocb = jocb.at[6:9, 6:9].set(st1.R.T)

    joca = joca.at[9:12, 9:12].set(-eye)
    joca = joca.at[12:15, 12:15].set(-eye)
    jocb = jocb.at[9:12, 9:12].set(eye)
    jocb = jocb.at[12:15, 12:15].set(eye)

    if with_gravity:
        jocg = jnp.zeros((DIM, 3), jnp.float64)
        jocg = jocg.at[3:6, 0:3].set(st1.R.T * (-0.5 * f.dtime**2))
        jocg = jocg.at[6:9, 0:3].set(st1.R.T * (-f.dtime))
    else:
        jocg = None
    return cost, joca, jocb, jocg, rr, cov_inv


def _residuals_all(f: PreintFactor, R, p, v, bg, ba, g):
    """Batched bias-corrected residuals of all W-1 window edges (factor
    pytree batched on axis 0; R/p/v/bg/ba are the (W, ...) window states,
    g the shared gravity). Returns (rr (E, 15), res_R (E, 3, 3), exp_t,
    exp_v, R1T). Broadcast-sum forms throughout — under vmap each tiny 3x3
    product lowers to a batched dot_general, which is the documented
    100-500x TPU pathology (core/mat3.py)."""
    R1, R2 = R[:-1], R[1:]
    p1, p2 = p[:-1], p[1:]
    v1, v2 = v[:-1], v[1:]
    dt = f.dtime[:, None]
    R_corr = bmm(f.R_delta, so3.exp(bmv(f.R_bg, f.dbg)))
    t_corr = f.p_delta + bmv(f.p_bg, f.dbg) + bmv(f.p_ba, f.dba)
    v_corr = f.v_delta + bmv(f.v_bg, f.dbg) + bmv(f.v_ba, f.dba)
    R1T = jnp.swapaxes(R1, -1, -2)
    res_R = bmm(jnp.swapaxes(R_corr, -1, -2), bmm(R1T, R2))
    exp_v = bmv(R1T, v2 - v1 - dt * g)
    exp_t = bmv(R1T, p2 - p1 - v1 * dt - 0.5 * dt * dt * g)
    rr = jnp.concatenate([
        so3.log(res_R), exp_t - t_corr, exp_v - v_corr,
        bg[1:] - bg[:-1], ba[1:] - ba[:-1]], axis=-1)
    return rr, res_R, exp_t, exp_v, R1T


def cost_all(f: PreintFactor, R, p, v, bg, ba, g):
    """Batched residual-only evaluation: sum_e rr^T cov_inv rr (the LM trial
    step, evaluate_only_residual cadence, optimizers.cpp:484-505)."""
    rr, _, _, _, _ = _residuals_all(f, R, p, v, bg, ba, g)
    civ_r = jnp.sum(f.cov_inv * rr[:, None, :], axis=-1)
    return jnp.sum(rr * civ_r)


def evaluate_all(f: PreintFactor, R, p, v, bg, ba, g, with_gravity: bool):
    """Batched give_evaluate[_g] (cpp:97-237) over all W-1 window edges.
    Returns (cost (E,), joca (E, 15, 15), jocb, jocg or None, rr, cov_inv);
    semantics identical to vmap(evaluate) but with broadcast-sum products."""
    E = f.dtime.shape[0]
    rr, res_R, exp_t, exp_v, R1T = _residuals_all(f, R, p, v, bg, ba, g)
    civ_r = jnp.sum(f.cov_inv * rr[:, None, :], axis=-1)
    cost = jnp.sum(rr * civ_r, axis=-1)

    R1, R2 = R[:-1], R[1:]
    JR_inv = so3.jr_inv(res_R)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), (E, 3, 3))
    dt = f.dtime[:, None, None]
    phi = bmv(f.R_bg, f.dbg)
    joca = jnp.zeros((E, DIM, DIM), R.dtype)
    jocb = jnp.zeros((E, DIM, DIM), R.dtype)
    joca = joca.at[:, 0:3, 0:3].set(
        -bmm(JR_inv, bmm(jnp.swapaxes(R2, -1, -2), R1)))
    jocb = jocb.at[:, 0:3, 0:3].set(JR_inv)
    joca = joca.at[:, 0:3, 9:12].set(
        -bmm(JR_inv, bmm(jnp.swapaxes(res_R, -1, -2),
                         bmm(so3.jr(phi), f.R_bg))))
    joca = joca.at[:, 3:6, 0:3].set(so3.hat(exp_t))
    joca = joca.at[:, 3:6, 3:6].set(-R1T)
    joca = joca.at[:, 3:6, 6:9].set(-R1T * dt)
    joca = joca.at[:, 3:6, 9:12].set(-f.p_bg)
    joca = joca.at[:, 3:6, 12:15].set(-f.p_ba)
    jocb = jocb.at[:, 3:6, 3:6].set(R1T)
    joca = joca.at[:, 6:9, 0:3].set(so3.hat(exp_v))
    joca = joca.at[:, 6:9, 6:9].set(-R1T)
    joca = joca.at[:, 6:9, 9:12].set(-f.v_bg)
    joca = joca.at[:, 6:9, 12:15].set(-f.v_ba)
    jocb = jocb.at[:, 6:9, 6:9].set(R1T)
    joca = joca.at[:, 9:12, 9:12].set(-eye)
    joca = joca.at[:, 12:15, 12:15].set(-eye)
    jocb = jocb.at[:, 9:12, 9:12].set(eye)
    jocb = jocb.at[:, 12:15, 12:15].set(eye)
    if with_gravity:
        jocg = jnp.zeros((E, DIM, 3), R.dtype)
        jocg = jocg.at[:, 3:6, 0:3].set(R1T * (-0.5 * f.dtime**2)[:, None, None])
        jocg = jocg.at[:, 6:9, 0:3].set(R1T * (-f.dtime)[:, None, None])
    else:
        jocg = None
    return cost, joca, jocb, jocg, rr, f.cov_inv


def evaluate_cost(f: PreintFactor, st1: NavState, st2: NavState):
    """Residual-only give_evaluate (cpp:97-237): cost = rr^T cov_inv rr
    without building any Jacobian — the LM trial evaluation needs only this
    (evaluate_only_residual cadence, optimizers.cpp:484-505)."""
    R_correct = f.R_delta @ so3.exp(f.R_bg @ f.dbg)
    t_correct = f.p_delta + f.p_bg @ f.dbg + f.p_ba @ f.dba
    v_correct = f.v_delta + f.v_bg @ f.dbg + f.v_ba @ f.dba
    res_R = R_correct.T @ st1.R.T @ st2.R
    res_v = st1.R.T @ (st2.v - st1.v - f.dtime * st1.g) - v_correct
    res_t = st1.R.T @ (st2.p - st1.p - st1.v * f.dtime
                       - 0.5 * f.dtime**2 * st1.g) - t_correct
    rr = jnp.concatenate([so3.log(res_R), res_t, res_v,
                          st2.bg - st1.bg, st2.ba - st1.ba])
    return rr @ f.cov_inv @ rr


def update_bias_state(f: PreintFactor, dxi_first15: jnp.ndarray) -> PreintFactor:
    """update_state (cpp:239-246): stash rollback buffers, apply first-order
    bias increments of the FIRST state of the factor edge."""
    return f._replace(
        dbg_buf=f.dbg, dba_buf=f.dba,
        dbg=f.dbg + dxi_first15[9:12], dba=f.dba + dxi_first15[12:15],
    )


def rollback_bias_state(f: PreintFactor) -> PreintFactor:
    """Rejected-LM-step rollback (optimizers.cpp:507-511)."""
    return f._replace(dbg=f.dbg_buf, dba=f.dba_buf)


def merge(f1: PreintFactor, f2: PreintFactor) -> PreintFactor:
    """Factor composition f1 (+) f2 (IMU_PRE::merge, cpp:248-274): chains two
    preintegrated segments into one, composing deltas, bias Jacobians and
    covariance. (Defined but uncalled in the reference pipeline; provided for
    parity and for keyframe-rate factor thinning.)"""
    p_bg = f1.p_bg + f1.v_bg * f2.dtime + f1.R_delta @ (
        f2.p_bg - so3.hat(f2.p_delta) @ f1.R_bg)
    p_ba = f1.p_ba + f1.v_ba * f2.dtime + f1.R_delta @ f2.p_ba
    v_bg = f1.v_bg + f1.R_delta @ (f2.v_bg - so3.hat(f2.v_delta) @ f1.R_bg)
    v_ba = f1.v_ba + f1.R_delta @ f2.v_ba
    R_bg = f2.R_delta.T @ f1.R_bg + f2.R_bg

    Ai = jnp.eye(DIM, dtype=jnp.float64)
    Ai = Ai.at[0:3, 0:3].set(f2.R_delta.T)
    Ai = Ai.at[3:6, 0:3].set(-f1.R_delta @ so3.hat(f2.p_delta))
    Ai = Ai.at[3:6, 6:9].set(jnp.eye(3) * f2.dtime)
    Ai = Ai.at[6:9, 0:3].set(-f1.R_delta @ so3.hat(f2.v_delta))
    Bi = jnp.eye(DIM, dtype=jnp.float64)
    Bi = Bi.at[3:6, 3:6].set(f1.R_delta)
    Bi = Bi.at[6:9, 6:9].set(f1.R_delta)
    cov = Ai @ f1.cov @ Ai.T + Bi @ f2.cov @ Bi.T

    return f1._replace(
        R_delta=f1.R_delta @ f2.R_delta,
        p_delta=f1.p_delta + f1.v_delta * f2.dtime + f1.R_delta @ f2.p_delta,
        v_delta=f1.v_delta + f1.R_delta @ f2.v_delta,
        R_bg=R_bg, p_bg=p_bg, p_ba=p_ba, v_bg=v_bg, v_ba=v_ba,
        dtime=f1.dtime + f2.dtime, cov=cov, cov_inv=inv_psd(cov),
    )


def naive_integrate(imu_t, gyr, acc, bg, ba, scale_gravity=1.0):
    """NumPy oracle: direct midpoint integration of DeltaR/Dv/Dp for tests."""
    R = np.eye(3)
    v = np.zeros(3)
    p = np.zeros(3)
    for i in range(len(imu_t) - 1):
        dt = imu_t[i + 1] - imu_t[i]
        w = 0.5 * (gyr[i] + gyr[i + 1]) - bg
        a = 0.5 * (acc[i] + acc[i + 1]) * scale_gravity - ba
        p = p + v * dt + 0.5 * dt * dt * (R @ a)
        v = v + R @ a * dt
        R = R @ np.asarray(so3.exp(jnp.asarray(w * dt)))
    return R, p, v
