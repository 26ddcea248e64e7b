"""Trajectory evaluation: ATE / RPE (evo-style), used by the parity
harness (BASELINE.md protocol) and bench.py."""

from __future__ import annotations

import numpy as np


def umeyama_align(est: np.ndarray, ref: np.ndarray, with_scale: bool = False):
    """SE(3) (optionally Sim(3)) alignment of est onto ref; both (N, 3)."""
    mu_e = est.mean(0)
    mu_r = ref.mean(0)
    E = est - mu_e
    Rf = ref - mu_r
    C = Rf.T @ E / len(est)
    U, S, Vt = np.linalg.svd(C)
    D = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        D[2, 2] = -1
    Rot = U @ D @ Vt
    if with_scale:
        var_e = (E**2).sum() / len(est)
        s = np.trace(np.diag(S) @ D) / var_e
    else:
        s = 1.0
    t = mu_r - s * Rot @ mu_e
    return s, Rot, t


def ate_rmse(est_xyz: np.ndarray, ref_xyz: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error RMSE after SE(3) alignment."""
    est = np.asarray(est_xyz, float)
    ref = np.asarray(ref_xyz, float)
    n = min(len(est), len(ref))
    est, ref = est[:n], ref[:n]
    if align and n >= 3:
        s, R, t = umeyama_align(est, ref)
        est = est @ R.T * s + t
    return float(np.sqrt(np.mean(np.sum((est - ref) ** 2, axis=1))))


def associate(est_t: np.ndarray, ref_t: np.ndarray, max_dt: float = 0.02):
    """Nearest-timestamp association (evo-style). Returns (idx_est, idx_ref)."""
    est_t = np.asarray(est_t, float)
    ref_t = np.asarray(ref_t, float)
    j = np.searchsorted(ref_t, est_t)
    j = np.clip(j, 1, max(len(ref_t) - 1, 1))
    left = np.abs(ref_t[j - 1] - est_t)
    right = np.abs(ref_t[np.minimum(j, len(ref_t) - 1)] - est_t)
    pick = np.where(left <= right, j - 1, np.minimum(j, len(ref_t) - 1))
    ok = np.abs(ref_t[pick] - est_t) <= max_dt
    return np.nonzero(ok)[0], pick[ok]


def rpe_rmse(est_xyz: np.ndarray, ref_xyz: np.ndarray, delta: int = 10) -> float:
    """Relative pose (translation) error RMSE over a fixed frame delta."""
    est = np.asarray(est_xyz, float)
    ref = np.asarray(ref_xyz, float)
    n = min(len(est), len(ref))
    if n <= delta:
        return float("nan")
    de = est[delta:n] - est[: n - delta]
    dr = ref[delta:n] - ref[: n - delta]
    return float(np.sqrt(np.mean(np.sum((de - dr) ** 2, axis=1))))


def rot_rpe_rmse_deg(Rs_est, Rs_ref, delta: int = 10) -> float:
    """Relative ROTATION error RMSE (degrees) over a fixed frame delta:
    angle( (R_ref_i^T R_ref_j)^T (R_est_i^T R_est_j) ), j = i + delta.
    Invariant to any fixed world-frame offset of the estimate (yaw gauge
    AND gravity tilt), so it measures rotation TRACKING, not init frame."""
    n = min(len(Rs_est), len(Rs_ref))
    if n <= delta:
        return float("nan")
    errs = []
    for i in range(n - delta):
        de = np.asarray(Rs_est[i]).T @ np.asarray(Rs_est[i + delta])
        dr = np.asarray(Rs_ref[i]).T @ np.asarray(Rs_ref[i + delta])
        c = np.clip((np.trace(dr.T @ de) - 1) / 2, -1.0, 1.0)
        errs.append(np.degrees(np.arccos(c)))
    return float(np.sqrt(np.mean(np.square(errs))))
