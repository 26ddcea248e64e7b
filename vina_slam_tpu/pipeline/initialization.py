"""System initialization: gravity alignment and the motion_init loop.

Reference: src/pipeline/initialization.cpp. motion_init (cpp:158-367)
repeatedly (<=10 rounds): rebuilds the whole voxel map from re-deskewed
window clouds under relaxed plane thresholds, runs the gravity-augmented
window BA for 3 LM iterations, rebuilds preintegrations with the optimized
biases; after first convergence it aligns gravity to +/-z, tightens
thresholds and converges again; acceptance requires a normal-spread
eigenvalue >= 15 and |g| in [9.6, 10.0].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vina_slam_tpu.core import so3
from vina_slam_tpu.core.constants import IMU_BUCKET
from vina_slam_tpu.core.eigh3 import eigh3


def align_gravity(Rs, ps, vs, g0):
    """align_gravity (initialization.cpp:28-62): rotate the whole window so
    gravity is parallel to +/-z, pivoting about the first position."""
    n0 = g0 / jnp.linalg.norm(g0)
    n1 = jnp.where(n0[2] < 0, jnp.asarray([0.0, 0.0, -1.0]), jnp.asarray([0.0, 0.0, 1.0]))
    rotvec = jnp.cross(n0, n1)
    rnorm = jnp.linalg.norm(rotvec)
    axis = rotvec / jnp.maximum(rnorm, 1e-12)
    ang = jnp.arcsin(jnp.clip(rnorm, -1.0, 1.0))
    rot = so3.exp(axis * ang)
    p0 = ps[0]
    return (
        jnp.einsum("ij,wjk->wik", rot, Rs),
        (ps - p0) @ rot.T + p0,
        vs @ rot.T,
        rot @ g0,
    )


@jax.jit
def _init_deskew_jit(x_R, x_p, x_v, g, bg, ba, gyr_mid, acc_mid, dt_neg, offt,
                     valid, pts, rel_time, pts_valid, ext_R, ext_p, scale_gravity):
    """Initialization::motion_blur (initialization.cpp:64-156): integrate the
    IMU BACKWARD from the scan-end state and deskew points into the scan-end
    IMU frame. Unlike the EKF deskew, output points stay in the IMU frame
    (the extrinsic is applied forward only, cpp:146)."""

    def body(carry, inp):
        R, p, v = carry
        w_m, a_m, dti, vld = inp          # dti < 0 (backward)
        w = w_m - bg
        a = a_m * scale_gravity - ba
        acc_w = R @ a + g
        p_n = p + v * dti + 0.5 * acc_w * dti * dti
        v_n = v + acc_w * dti
        R_n = R @ so3.exp(w * dti)
        m = vld.astype(R.dtype)
        entry = (R_n, p_n, v_n, w, acc_w)  # pose AFTER the backward step
        return (
            jnp.where(vld, R_n, R), p * (1 - m) + p_n * m, v * (1 - m) + v_n * m
        ), entry

    (Rf, pf, vf), poses = jax.lax.scan(body, (x_R, x_p, x_v),
                                       (gyr_mid, acc_mid, dt_neg, valid))
    Rt, pt, vt, wt, at = poses

    # per point: find the pose entry with largest offt <= t (entries are in
    # decreasing offt order; flip for searchsorted)
    K = offt.shape[0]
    offt_s = jnp.where(jnp.arange(K) < jnp.sum(valid), offt, jnp.inf)
    order = jnp.argsort(offt_s)  # ascending, invalid at end
    offt_a = offt_s[order]
    idx_a = jnp.searchsorted(offt_a, rel_time.astype(offt_a.dtype), side="right") - 1
    ok = (idx_a >= 0) & pts_valid
    idx = order[jnp.clip(idx_a, 0, K - 1)]

    dt = (rel_time - offt[idx]).astype(jnp.float64)
    R_i = Rt[idx] @ so3.exp(wt[idx] * dt[:, None])
    T_ei = pt[idx] + vt[idx] * dt[:, None] + 0.5 * at[idx] * dt[:, None] ** 2 - x_p

    P = pts.astype(jnp.float64)
    P_imu = P @ ext_R.T + ext_p
    P_out = (jnp.einsum("nij,nj->ni", R_i, P_imu) + T_ei) @ x_R
    out = jnp.where(ok[:, None], P_out, P @ ext_R.T + ext_p)
    return out.astype(pts.dtype)


def init_deskew(x, bg, ba, imu, beg_time, pts, rel_time, pts_valid,
                ext_R, ext_p, scale_gravity, point_notime=False):
    """Host wrapper building the backward interval arrays (cpp:76-107).

    point_notime: no per-point stamps -> NO IMU compensation, only the
    lidar->IMU extrinsic map (initialization.cpp:114-123). Can NOT be left
    to the rel_time=0 fallback inside the jit: the prepended conditioned
    IMU sample sits at offt == 0.0 exactly, so searchsorted(…, 0.0, right)
    picks the earliest backward pose and compensates every point by the
    full inter-frame motion."""
    if point_notime:
        out = (jnp.asarray(pts, jnp.float64) @ jnp.asarray(ext_R).T
               + jnp.asarray(ext_p))
        return out.astype(pts.dtype)
    K = IMU_BUCKET
    t, g_arr, a_arr = imu.t, imu.gyr, imu.acc
    n = len(t) - 1
    gm = np.zeros((K, 3)); am = np.zeros((K, 3))
    dt = np.zeros(K); offt = np.zeros(K)
    # iterate pairs from the end backwards
    for j in range(n):
        i = n - j            # tail index
        gm[j] = 0.5 * (g_arr[i - 1] + g_arr[i])
        am[j] = 0.5 * (a_arr[i - 1] + a_arr[i])
        dt[j] = t[i - 1] - t[i]          # negative
        offt[j] = t[i - 1] - beg_time    # pose time after the step
    valid = np.arange(K) < n
    return _init_deskew_jit(
        jnp.asarray(x.R, jnp.float64), jnp.asarray(x.p, jnp.float64),
        jnp.asarray(x.v, jnp.float64), jnp.asarray(x.g, jnp.float64),
        jnp.asarray(bg, jnp.float64), jnp.asarray(ba, jnp.float64),
        jnp.asarray(gm), jnp.asarray(am), jnp.asarray(dt), jnp.asarray(offt),
        jnp.asarray(valid), pts, rel_time, pts_valid,
        jnp.asarray(ext_R, jnp.float64), jnp.asarray(ext_p, jnp.float64),
        jnp.asarray(float(scale_gravity)),
    )


def normal_spread_eig(eig_vectors, valid):
    """nnt accumulation over BA factor normals (initialization.cpp:277-284):
    lambda_min of sum(u0 u0^T) measures rotation observability."""
    u0 = eig_vectors[..., :, 0]
    nnt = jnp.einsum("v,vi,vj->ij", valid.astype(u0.dtype), u0, u0)
    w, _ = eigh3(nnt)
    return w
