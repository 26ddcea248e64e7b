"""Error-state EKF forward propagation + motion deskew.

Reference: src/estimation/imu_ekf.cpp. The per-IMU-interval midpoint
integration and 15x15 covariance propagation (imu_ekf.cpp:66-85) become a
lax.scan over a fixed-size interval bucket; the backward per-point deskew
loop (imu_ekf.cpp:111-144) becomes a vectorized gather into the pose table
(one searchsorted + fused pose compose per point). The static gravity init
(imu_ekf.cpp:147-201) is trivial host arithmetic.

Dtype policy: pose/cov propagation in f64 (tiny), per-point deskew in f32.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vina_slam_tpu.core import so3
from vina_slam_tpu.core.constants import DIM, G_M_S2, IMU_BUCKET, IMU_BUCKETS
from vina_slam_tpu.core.mat3 import bmm, bmv, sandwich
from vina_slam_tpu.core.state import NavState
from vina_slam_tpu.sensor.sync import ImuBlock


class LidarTimeRegression(RuntimeError):
    """Scan begins >10 ms before the previous scan ended
    (reference hard-exits, imu_ekf.cpp:19-24)."""


@partial(jax.jit, static_argnames=())
def _propagate(
    R0, p0, v0, cov0, bg, ba, g,
    avr_gyr, avr_acc, dt, offt, valid,
    cov_gyr, cov_acc, cov_bg, cov_ba,
    scale_gravity, end_minus_last_offt,
):
    """Propagation over IMU intervals in LOG depth. Returns terminal
    (R, p, v, cov) extrapolated to scan end and the pose table (imu_poses
    analog) at interval starts.

    A sequential lax.scan over the ~100 intervals cost ~25 ms/scan on TPU
    (the 15x15 body is far too small to hide per-iteration latency), so the
    recursion is reformulated associatively: rotations compose by matmul
    prefix products, p/v are cumulative sums once the rotation prefixes are
    known, and the covariance recursion cov' = F cov F^T + Q composes as
    (F2 F1, F2 Q1 F2^T + Q2) — all via jax.lax.associative_scan (7 levels of
    batched matmuls). Padding intervals have dt == 0 and are exact identity
    maps, so no masking is needed. States f64; covariance f32 (it only
    weights the IEKF update; f64 matmuls are emulated on TPU)."""
    f32 = jnp.float32
    dtc = jnp.where(valid, dt, 0.0)
    w = avr_gyr - bg[None, :]                       # (K, 3)
    a = avr_acc * scale_gravity - ba[None, :]       # (K, 3)
    E = so3.exp(w * dtc[:, None])                   # (K, 3, 3)

    P_incl = jax.lax.associative_scan(bmm, E)       # E0 @ ... @ Ei
    R_incl = bmm(jnp.broadcast_to(R0, P_incl.shape), P_incl)
    R_excl = jnp.concatenate([R0[None], R_incl[:-1]], axis=0)

    acc_w = bmv(R_excl, a) + g[None, :]
    dv = acc_w * dtc[:, None]
    v_incl = v0[None, :] + jnp.cumsum(dv, axis=0)
    v_excl = jnp.concatenate([v0[None], v_incl[:-1]], axis=0)
    dp = v_excl * dtc[:, None] + 0.5 * acc_w * (dtc * dtc)[:, None]
    p_incl = p0[None, :] + jnp.cumsum(dp, axis=0)
    p_excl = jnp.concatenate([p0[None], p_incl[:-1]], axis=0)

    K = dtc.shape[0]
    dt32 = dtc.astype(f32)[:, None, None]
    Rf = R_excl.astype(f32)
    I3 = jnp.eye(3, dtype=f32)
    F = jnp.broadcast_to(jnp.eye(DIM, dtype=f32), (K, DIM, DIM))
    F = F.at[:, 0:3, 0:3].set(so3.exp(-w * dtc[:, None]).astype(f32))
    F = F.at[:, 0:3, 9:12].set(-I3 * dt32)
    F = F.at[:, 3:6, 6:9].set(I3 * dt32)
    F = F.at[:, 6:9, 0:3].set((-bmm(R_excl, so3.hat(a))).astype(f32) * dt32)
    F = F.at[:, 6:9, 12:15].set(-Rf * dt32)
    dt322 = dt32 * dt32
    Q = jnp.zeros((K, DIM, DIM), f32)
    Q = Q.at[:, 0:3, 0:3].set(jnp.diag(cov_gyr).astype(f32) * dt322)
    Q = Q.at[:, 6:9, 6:9].set(
        sandwich(Rf, jnp.broadcast_to(jnp.diag(cov_acc).astype(f32),
                                      Rf.shape)) * dt322)
    Q = Q.at[:, 9:12, 9:12].set(jnp.diag(cov_bg).astype(f32) * dt322)
    Q = Q.at[:, 12:15, 12:15].set(jnp.diag(cov_ba).astype(f32) * dt322)

    # Only the TERMINAL (F, Q) composition is consumed (cov at scan end), so
    # a pairwise tree REDUCTION replaces the earlier associative_scan: the
    # scan computed every prefix (K batched (15,15) matmul-triples per
    # level), the reduction halves the batch each level (2K triples total,
    # ~log2(K)x less MXU work for the same result). Padding intervals are
    # exact identities (dt=0 -> F=I, Q=0), so power-of-two padding is free.
    def comp(c1, c2):  # apply c1 first, then c2
        F1, Q1 = c1
        F2, Q2 = c2
        return bmm(F2, F1), sandwich(F2, Q1) + Q2

    Kp = 1 << (K - 1).bit_length()
    Ft, Qt = F, Q
    if Kp != K:
        pad = Kp - K
        Ft = jnp.concatenate(
            [Ft, jnp.broadcast_to(jnp.eye(DIM, dtype=f32), (pad, DIM, DIM))])
        Qt = jnp.concatenate([Qt, jnp.zeros((pad, DIM, DIM), f32)])
    while Ft.shape[0] > 1:
        Ft, Qt = comp((Ft[0::2], Qt[0::2]), (Ft[1::2], Qt[1::2]))
    cov = (Ft[0] @ cov0.astype(f32) @ Ft[0].T + Qt[0]).astype(cov0.dtype)
    cov = 0.5 * (cov + cov.T)   # exact symmetry for downstream Cholesky

    R, p, v = R_incl[-1], p_incl[-1], v_incl[-1]
    # terminal extrapolation to scan end (imu_ekf.cpp:88-94): signed dt from
    # the last IMU stamp to pcl_end_time, using the final interval's w/a.
    # The reference's note/dt convention (note = sign(delta), dt = |delta|)
    # makes the linear terms depend on delta but the QUADRATIC term on
    # note*dt^2 = delta*|delta| — when the last IMU sample lands past scan
    # end (the usual case: sync waits for IMU coverage), the 0.5*a*dt^2
    # term is SUBTRACTED. Pinned against the compiled reference by
    # tests/test_reference_oracle.py::test_ekf_propagation_deskew....
    last_idx = jnp.maximum(jnp.sum(valid) - 1, 0)
    w_last = w[last_idx]
    a_last = acc_w[last_idx]
    dte = end_minus_last_offt
    v_end = v + a_last * dte
    R_end = R @ so3.exp(w_last * dte)
    p_end = p + v * dte + 0.5 * a_last * dte * jnp.abs(dte)
    pose_table = (R_excl, p_excl, v_excl, w, acc_w)
    return R_end, p_end, v_end, cov, pose_table


@jax.jit
def _deskew(pts, rel_time, valid_pts, pose_table, offt, n_valid, R_end, p_end, ext_R, ext_p):
    """Backward deskew into the scan-end LiDAR frame (imu_ekf.cpp:111-144),
    vectorized: per point find its covering interval, compose the pose at its
    stamp, and map through the extrinsic. Points earlier than the first pose
    entry keep their raw coordinates (reference loop never reaches them).

    Precision: the K-entry pose table composes in f64; the PER-POINT math
    runs in f32 on world-relative quantities (T_ei = position relative to
    scan end is centimeters over one 0.1 s sweep; point coords < few hundred
    m), where f32 keeps ~1e-5 m — far below sensor noise. f64 per-point ops
    are emulated ~20x slower on TPU and dominated this stage."""
    Rt, pt, vt, wt, at = pose_table
    f32 = pts.dtype
    # idx of last pose with offt <= t  (reference: curvature > head.t);
    # padded tail is pushed to +inf so searchsorted sees a sorted array
    k_ids = jnp.arange(offt.shape[0])
    offt_s = jnp.where(k_ids < n_valid, offt, jnp.inf)
    idx = jnp.searchsorted(offt_s, rel_time.astype(offt.dtype), side="right") - 1
    idx_c = jnp.clip(idx, 0, offt.shape[0] - 1)
    # only compensate where a pose entry exists and is within the valid range
    compensate = (idx >= 0) & (idx < n_valid) & valid_pts

    # per-interval table in f64 (K ~ 100 entries, cheap), gathered as f32
    Rt_e = bmm(jnp.broadcast_to(R_end.T, Rt.shape), Rt)      # R_end^T R_k
    pt_e = (pt - p_end) @ R_end                               # in end-IMU frame
    vt_e = vt @ R_end
    at_e = at @ R_end

    dt = (rel_time - offt[idx_c].astype(rel_time.dtype)).astype(f32)
    R_i = bmm(Rt_e[idx_c].astype(f32),
              so3.exp(wt[idx_c].astype(f32) * dt[:, None]))
    T_ei = (pt_e[idx_c].astype(f32) + vt_e[idx_c].astype(f32) * dt[:, None]
            + 0.5 * at_e[idx_c].astype(f32) * (dt * dt)[:, None])

    ext_R32 = ext_R.astype(f32)
    ext_p32 = ext_p.astype(f32)
    P_imu = pts @ ext_R32.T + ext_p32
    P_endimu = bmv(R_i, P_imu) + T_ei
    P_out = (P_endimu - ext_p32) @ ext_R32
    out = jnp.where(compensate[:, None], P_out, pts)
    return out.astype(f32)


def pick_imu_bucket(n: int, bucket: int | None = None) -> int:
    """Smallest IMU pad bucket covering max(n, bucket). `bucket` acts as a
    floor so callers can pin a sticky minimum — every distinct bucket is a
    separate compile of the fused step, and a mid-run bucket flip lands a
    multi-minute compile inside the steady loop."""
    need = max(n, bucket or 0)
    for b in IMU_BUCKETS:
        if need <= b:
            return b
    raise RuntimeError(f"IMU bucket overflow: {need} > {IMU_BUCKETS[-1]}")


def build_intervals(last_imu, last_pcl_end_time, beg_time, end_time,
                    imu: ImuBlock, bucket: int | None = None):
    """Host-side interval preconditioning shared by the modular and fused
    paths (imu_ekf.cpp:33-62 semantics): prepend last_imu, skip pre-scan
    samples, midpoint gyro/acc, dt and offsets, padded to the smallest
    covering bucket (or `bucket` when forced, e.g. for multiseq stacking).

    Returns (arrays dict, cond ImuBlock, n_intervals)."""
    ts = np.concatenate([[last_imu[0]], imu.t])
    gs = np.concatenate([[last_imu[1]], imu.gyr])
    accs = np.concatenate([[last_imu[2]], imu.acc])

    # vectorized interval build (this runs on the host EVERY frame — the
    # per-sample Python loop was a measurable slice of the 12 ms/frame
    # packaging cost scripts/host_overhead.py flagged)
    keep = ts[:-1] >= last_pcl_end_time - 1e-12
    cur = np.maximum(ts[:-1][keep], last_pcl_end_time)
    n = int(keep.sum())
    K = pick_imu_bucket(n, bucket)

    def pad(a, shape=()):
        out = np.zeros((K,) + shape)
        if n:
            out[:n] = a
        return out

    arrays = dict(
        avr_gyr=pad(0.5 * (gs[:-1][keep] + gs[1:][keep]), (3,)),
        avr_acc=pad(0.5 * (accs[:-1][keep] + accs[1:][keep]), (3,)),
        dt=pad(ts[1:][keep] - cur),
        offt=pad(cur - beg_time),
        valid=np.arange(K) < n,
        end_minus_last=end_time - ts[-1],
    )
    cond_t = np.concatenate([[last_pcl_end_time], imu.t])
    cond_g = np.concatenate([[last_imu[1]], imu.gyr])
    cond_a = np.concatenate([[last_imu[2]], imu.acc])
    cond_t[-1] = end_time
    cond = ImuBlock(cond_t, cond_g, cond_a)
    return arrays, cond, n


def midpoint_arrays(imu: ImuBlock, bucket: int | None = None):
    """Preintegration midpoint arrays (push_imu preamble,
    imu_preintegration.cpp:36-54), padded to the smallest covering bucket."""
    t, g, a = imu.t, imu.gyr, imu.acc
    n = len(t) - 1
    K = pick_imu_bucket(n, bucket)
    gm = np.zeros((K, 3))
    am = np.zeros((K, 3))
    dt = np.zeros(K)
    gm[:n] = 0.5 * (g[:-1] + g[1:])
    am[:n] = 0.5 * (a[:-1] + a[1:])
    dt[:n] = t[1:] - t[:-1]
    return gm, am, dt, np.arange(K) < n


@dataclass
class ImuEkf:
    """Host wrapper holding the (tiny) mutable stream state; all math is in
    the jitted pure functions above."""

    cov_gyr: np.ndarray
    cov_acc: np.ndarray
    cov_bias_gyr: np.ndarray
    cov_bias_acc: np.ndarray
    ext_R: np.ndarray
    ext_p: np.ndarray
    point_notime: bool = False
    min_init_num: int = 30

    init_flag: bool = False
    init_num: int = 0
    mean_acc: np.ndarray = field(default_factory=lambda: np.zeros(3))
    mean_gyr: np.ndarray = field(default_factory=lambda: np.zeros(3))
    scale_gravity: float = 1.0
    last_imu: tuple | None = None   # (t, gyr, acc)
    last_pcl_end_time: float = -1.0

    def imu_init(self, imu: ImuBlock):
        """Running mean of acc/gyr (imu_ekf.cpp:147-172)."""
        for k in range(imu.t.shape[0]):
            if self.init_num == 0:
                self.mean_acc = imu.acc[k].copy()
                self.mean_gyr = imu.gyr[k].copy()
                self.init_num = 1
            else:
                self.mean_acc += (imu.acc[k] - self.mean_acc) / self.init_num
                self.mean_gyr += (imu.gyr[k] - self.mean_gyr) / self.init_num
            self.init_num += 1
        self.last_imu = (imu.t[-1], imu.gyr[-1].copy(), imu.acc[-1].copy())

    def process(self, x: NavState, pts, rel_time, beg_time, end_time, imu: ImuBlock):
        """Full process() (imu_ekf.cpp:174-201).

        Returns (status, x_new, deskewed_pts, cond_imu) where status=0 means
        still initializing (frame skipped). cond_imu is the stamp-conditioned
        IMU block the preintegration must consume (imu_ekf.cpp:96-106).
        """
        if not self.init_flag:
            self.imu_init(imu)
            if np.linalg.norm(self.mean_acc) < 2:
                self.scale_gravity = G_M_S2
            x = x._replace(g=jnp.asarray(-self.mean_acc * self.scale_gravity))
            if self.init_num > self.min_init_num:
                self.init_flag = True
            self.last_pcl_end_time = end_time
            return 0, x, pts, imu

        if self.last_pcl_end_time - beg_time > 0.01:
            raise LidarTimeRegression(
                f"LiDAR time regress: beg={beg_time} last_end={self.last_pcl_end_time}"
            )

        # ---- build interval arrays (host; ~20 samples) ----
        ts = np.concatenate([[self.last_imu[0]], imu.t])
        gs = np.concatenate([[self.last_imu[1]], imu.gyr])
        accs = np.concatenate([[self.last_imu[2]], imu.acc])

        avr_g, avr_a, dts, offts = [], [], [], []
        for i in range(len(ts) - 1):
            if ts[i] < self.last_pcl_end_time - 1e-12:
                continue
            cur = max(ts[i], self.last_pcl_end_time)
            avr_g.append(0.5 * (gs[i] + gs[i + 1]))
            avr_a.append(0.5 * (accs[i] + accs[i + 1]))
            dts.append(ts[i + 1] - cur)
            offts.append(cur - beg_time)
        K = IMU_BUCKET
        n = len(dts)
        if n == 0:
            # still consume the stream like the reference (and like
            # fused_args, which advances unconditionally): otherwise the next
            # frame sees a stale last_pcl_end_time and trips
            # LidarTimeRegression or integrates a doubled interval
            self.last_imu = (end_time, imu.gyr[-1].copy(), imu.acc[-1].copy())
            self.last_pcl_end_time = end_time
            return 0, x, pts, imu
        if n > K:
            raise RuntimeError(f"IMU bucket overflow: {n} > {K}")

        def pad(a, shape):
            out = np.zeros((K,) + shape)
            out[:n] = a
            return jnp.asarray(out)

        valid = jnp.asarray(np.arange(K) < n)
        end_minus_last = end_time - ts[-1]
        note = 1.0 if end_time > ts[-1] else -1.0
        # reference computes dt = note*(end-imu_end) then applies with note:
        # net effect is the signed offset end-imu_end applied directly.
        del note

        R_end, p_end, v_end, cov, pose_table = _propagate(
            x.R.astype(jnp.float64), x.p.astype(jnp.float64), x.v.astype(jnp.float64),
            x.cov.astype(jnp.float64), x.bg.astype(jnp.float64), x.ba.astype(jnp.float64),
            x.g.astype(jnp.float64),
            pad(np.stack(avr_g), (3,)), pad(np.stack(avr_a), (3,)),
            pad(np.asarray(dts), ()), pad(np.asarray(offts), ()), valid,
            jnp.asarray(self.cov_gyr), jnp.asarray(self.cov_acc),
            jnp.asarray(self.cov_bias_gyr), jnp.asarray(self.cov_bias_acc),
            jnp.asarray(float(self.scale_gravity)), jnp.asarray(end_minus_last),
        )
        x_new = x._replace(
            R=R_end, p=p_end, v=v_end, cov=cov, t=jnp.asarray(float(end_time))
        )

        # conditioned IMU block for downstream preintegration
        # (imu_ekf.cpp:96-106: clamp first/last stamps to [last_end, end])
        cond_t = imu.t.copy()
        cond_t = np.concatenate([[self.last_pcl_end_time], cond_t])
        cond_g = np.concatenate([[self.last_imu[1]], imu.gyr])
        cond_a = np.concatenate([[self.last_imu[2]], imu.acc])
        cond_t[-1] = end_time
        cond = ImuBlock(cond_t, cond_g, cond_a)

        self.last_imu = (end_time, imu.gyr[-1].copy(), imu.acc[-1].copy())
        self.last_pcl_end_time = end_time

        if self.point_notime or pts.shape[0] == 0:
            # no per-point times -> no IMU compensation; points stay RAW
            # lidar-frame (imu_ekf.cpp:108 skips the backward loop, and the
            # timed path's _deskew maps back to the lidar frame too) —
            # downstream var_init applies the extrinsic exactly once.
            # (Round-3 bug: an extra ext_R/ext_p transform here double-applied
            # the extrinsic on any notime profile with non-identity extrinsics;
            # initialization.cpp:114-123 is Initialization::motion_blur, which
            # initialization.py already ports.)
            return 1, x_new, pts, cond

        offt_arr = pad(np.asarray(offts), ())
        deskewed = _deskew(
            jnp.asarray(pts), jnp.asarray(rel_time),
            jnp.ones(pts.shape[0], bool),
            pose_table, offt_arr, jnp.asarray(n),
            R_end, p_end,
            jnp.asarray(self.ext_R, jnp.float64), jnp.asarray(self.ext_p, jnp.float64),
        )
        return 1, x_new, np.asarray(deskewed), cond
