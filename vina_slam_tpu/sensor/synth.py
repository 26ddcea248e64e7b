"""Synthetic LiDAR+IMU world generator (host, NumPy).

The reference validates against recorded rosbags (ReadMe.md:16-22); none are
available here, so this module provides a physically consistent simulator
used by the golden-trajectory integration tests and bench.py: a plane-patch
world (rooms/corridors), a smooth 6-DoF trajectory, spinning-LiDAR ray
casting with per-column timestamps (so deskew is actually exercised), and
IMU synthesis by differentiating the trajectory.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List

import numpy as np

from vina_slam_tpu.core.constants import G_M_S2
from vina_slam_tpu.sensor.decoders import DecodedScan
from vina_slam_tpu.sensor.sync import FrameAssembler


@dataclass
class PlanePatch:
    q: np.ndarray   # a point on the plane
    n: np.ndarray   # unit normal
    u: np.ndarray   # in-plane axis 1
    v: np.ndarray   # in-plane axis 2
    hu: float       # half extent along u
    hv: float       # half extent along v


def box_room(center, size) -> List[PlanePatch]:
    """Six inward-facing wall patches of an axis-aligned box."""
    c = np.asarray(center, np.float64)
    sx, sy, sz = np.asarray(size, np.float64) / 2.0
    ex, ey, ez = np.eye(3)
    out = []
    for axis, h, (a1, h1), (a2, h2) in [
        (ex, sx, (ey, sy), (ez, sz)),
        (ey, sy, (ex, sx), (ez, sz)),
        (ez, sz, (ex, sx), (ey, sy)),
    ]:
        for sgn in (+1.0, -1.0):
            out.append(PlanePatch(q=c + sgn * h * axis, n=-sgn * axis, u=a1, v=a2, hu=h1, hv=h2))
    return out


def default_world() -> List[PlanePatch]:
    """A room with an attached corridor plus a few interior slabs — enough
    plane diversity that rotation is observable (lambda_min(nn^T) large)."""
    patches = box_room([0, 0, 1.5], [16, 12, 3])
    patches += box_room([14, 0, 1.5], [12, 4, 3])  # corridor off +x side
    # interior slabs (furniture-like) to add normal diversity
    ex, ey, ez = np.eye(3)
    patches.append(PlanePatch(np.array([3.0, 2.0, 1.0]), ex, ey, ez, 1.5, 1.0))
    patches.append(PlanePatch(np.array([-2.0, -3.0, 0.8]), ey, ex, ez, 2.0, 0.8))
    patches.append(PlanePatch(np.array([1.0, -1.0, 0.9]), ez, ex, ey, 1.2, 1.2))
    patches.append(PlanePatch(np.array([-4.0, 3.0, 1.2]), (ex + ey) / np.sqrt(2), (ex - ey) / np.sqrt(2), ez, 1.5, 1.0))
    return patches


def corridor_world(length: float = 120.0, width: float = 4.0,
                   height: float = 3.0, x0: float = -6.0,
                   lobby: bool = True) -> List[PlanePatch]:
    """A long corridor along +x with NO x-facing surfaces except the lobby's
    back wall — the degenerate geometry of config/compus_elevator.yaml
    (elevator/corridor): once the sensor is out of range of the back wall,
    every visible normal lies in span{y, z}, so lambda_min(sum n n^T) along x
    collapses and translation along the corridor is unobservable from
    point-to-plane matches (the regime VNC + the degeneracy gate exist for,
    src/pipeline/odometry.cpp:244-254, docs/VNCLio_formulation.md:130-194).

    The lobby is a closed room section x in [x0, x_door] with a doorway wall
    at its far end (wall segments either side of the corridor mouth, normals
    facing -x): motion_init runs inside it with full observability; the
    degenerate regime begins once the sensor passes through the door and the
    lobby geometry falls behind / out of range."""
    ex, ey, ez = np.eye(3)
    hy, hz = width / 2.0, height / 2.0
    cz = hz
    lw = 10.0                      # lobby width
    x_door = x0 + 12.0             # doorway plane (lobby length 12 m)
    cx = (x_door + x0 + length) / 2.0
    chl = (length - 12.0) / 2.0    # corridor half-length
    out = [
        # corridor side walls (normals +-y), floor, ceiling (normals +-z)
        PlanePatch(q=np.array([cx, +hy, cz]), n=-ey, u=ex, v=ez,
                   hu=chl, hv=hz),
        PlanePatch(q=np.array([cx, -hy, cz]), n=+ey, u=ex, v=ez,
                   hu=chl, hv=hz),
        PlanePatch(q=np.array([cx, 0.0, 0.0]), n=+ez, u=ex, v=ey,
                   hu=chl, hv=hy),
        PlanePatch(q=np.array([cx, 0.0, height]), n=-ez, u=ex, v=ey,
                   hu=chl, hv=hy),
    ]
    if lobby:
        lx = (x0 + x_door) / 2.0
        lhl = 6.0
        out += [
            # lobby box: back wall (+x normal), side walls, floor, ceiling
            PlanePatch(q=np.array([x0, 0.0, cz]), n=ex, u=ey, v=ez,
                       hu=lw / 2, hv=hz),
            PlanePatch(q=np.array([lx, +lw / 2, cz]), n=-ey, u=ex, v=ez,
                       hu=lhl, hv=hz),
            PlanePatch(q=np.array([lx, -lw / 2, cz]), n=+ey, u=ex, v=ez,
                       hu=lhl, hv=hz),
            PlanePatch(q=np.array([lx, 0.0, 0.0]), n=+ez, u=ex, v=ey,
                       hu=lhl, hv=lw / 2),
            PlanePatch(q=np.array([lx, 0.0, height]), n=-ez, u=ex, v=ey,
                       hu=lhl, hv=lw / 2),
            # doorway wall: segments either side of the corridor mouth
            PlanePatch(q=np.array([x_door, (lw / 2 + hy) / 2, cz]), n=-ex,
                       u=ey, v=ez, hu=(lw / 2 - hy) / 2, hv=hz),
            PlanePatch(q=np.array([x_door, -(lw / 2 + hy) / 2, cz]), n=-ex,
                       u=ey, v=ez, hu=(lw / 2 - hy) / 2, hv=hz),
            # interior slabs for extra normal diversity during init
            PlanePatch(q=np.array([x0 + 3.0, lw / 2 - 1.2, 1.0]),
                       n=(ex + ey) / np.sqrt(2),
                       u=(ex - ey) / np.sqrt(2), v=ez, hu=0.8, hv=0.8),
            PlanePatch(q=np.array([x0 + 5.0, -lw / 2 + 1.3, 0.9]),
                       n=(ex - ey) / np.sqrt(2),
                       u=(ex + ey) / np.sqrt(2), v=ez, hu=0.8, hv=0.8),
        ]
    return out


def stairwell_world(n_floors: int = 4, shaft: float = 3.2,
                    floor_h: float = 3.0, steps_per_turn: int = 12,
                    column: float = 0.6) -> List[PlanePatch]:
    """A spiral stairwell — the OTHER geometry VNC targets (ReadMe.md:8,
    docs/VNCLio_formulation.md:130-194, config/compus_elevator.yaml's
    regime). Unlike the corridor, every normal direction IS represented
    (walls +-x/+-y, treads +z, risers tangential), but each visible patch is
    SMALL and CLOSE: point-to-plane rotation information scales with the
    lever arms |q| of the matched points, which a 3.2 m shaft caps at ~2 m,
    while the repetitive tread/riser pattern aliases vertically. Normal-
    alignment residuals (VNC) constrain rotation independent of lever arms.

    Square shaft of inward-facing walls, a central square column, and
    spiral treads+risers winding up `n_floors` turns (one turn per floor)."""
    ex, ey, ez = np.eye(3)
    H = n_floors * floor_h
    hs = shaft / 2.0
    out = []
    # shaft walls (inward normals) + ground floor + roof
    for axis, other in ((ex, ey), (ey, ex)):
        for sgn in (+1.0, -1.0):
            out.append(PlanePatch(q=np.array([0.0, 0.0, H / 2]) + sgn * hs * axis,
                                  n=-sgn * axis, u=other, v=ez,
                                  hu=hs, hv=H / 2))
    out.append(PlanePatch(q=np.zeros(3), n=ez, u=ex, v=ey, hu=hs, hv=hs))
    out.append(PlanePatch(q=np.array([0.0, 0.0, H]), n=-ez, u=ex, v=ey,
                          hu=hs, hv=hs))
    # central column (outward normals), full height
    hc = column / 2.0
    for axis, other in ((ex, ey), (ey, ex)):
        for sgn in (+1.0, -1.0):
            out.append(PlanePatch(q=np.array([0.0, 0.0, H / 2]) + sgn * hc * axis,
                                  n=sgn * axis, u=other, v=ez,
                                  hu=hc, hv=H / 2))
    # spiral treads + risers: tread k spans angles around theta_k at height
    # z_k; tread normal +z, riser normal tangential (faces the climber)
    n_steps = n_floors * steps_per_turn
    dz = floor_h / steps_per_turn
    r_mid = (hc + hs) / 2.0           # tread center radius
    tread_r = (hs - hc) / 2.0         # radial half extent
    tread_t = np.pi * r_mid / steps_per_turn * 0.95  # tangential half extent
    for k in range(n_steps):
        th = 2 * np.pi * k / steps_per_turn
        zk = (k + 1) * dz
        rad = np.array([np.cos(th), np.sin(th), 0.0])
        tan = np.array([-np.sin(th), np.cos(th), 0.0])
        c = r_mid * rad + np.array([0.0, 0.0, zk])
        out.append(PlanePatch(q=c, n=ez, u=rad, v=tan,
                              hu=tread_r, hv=tread_t))
        # riser: vertical face at the tread's leading edge
        out.append(PlanePatch(q=c + tread_t * tan - 0.5 * dz * ez,
                              n=tan, u=rad, v=ez, hu=tread_r, hv=dz / 2))
    return out


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def _rotx(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _roty(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


class Trajectory:
    """Smooth 6-DoF trajectory p(t), R(t) with a velocity ramp so the first
    ~0.5 s is near-static (the EKF's static gravity init needs it)."""

    def __init__(self, amp=(2.0, 1.5, 0.15), freq=(0.20, 0.27, 0.4), yaw_rate=0.25,
                 wiggle=0.06, ramp=1.0, origin=(0.0, 0.0, 1.2)):
        self.amp = np.asarray(amp)
        self.freq = np.asarray(freq)
        self.yaw_rate = yaw_rate
        self.wiggle = wiggle
        self.ramp = ramp
        self.origin = np.asarray(origin, np.float64)

    def _s(self, t):
        # smooth ramp 0->1 over [0, ramp]
        x = np.clip(t / self.ramp, 0.0, 1.0)
        return x * x * (3 - 2 * x)

    def pos(self, t):
        s = self._s(t)
        w = 2 * np.pi * self.freq
        return self.origin + s * self.amp * np.sin(w * t)

    def rot(self, t):
        s = self._s(t)
        yaw = s * self.yaw_rate * t
        roll = s * self.wiggle * np.sin(2 * np.pi * 0.5 * t)
        pitch = s * self.wiggle * np.sin(2 * np.pi * 0.33 * t + 1.0)
        return _rotz(yaw) @ _roty(pitch) @ _rotx(roll)

    def pose(self, t):
        return self.rot(t), self.pos(t)


class LinearTrajectory(Trajectory):
    """Constant-speed run down the +x axis with gentle yaw/pitch wiggle —
    the corridor-traversal motion profile (reach cruise speed after `ramp`
    seconds of constant acceleration).

    Times are TRAJECTORY times: simulate_events calls pose()/imu_sample()
    with tau = t - start_time, so tau 0 is the first scan. Motion begins at
    tau = t0 + dwell (default 1.5 s), so the first `dwell` seconds of scans
    are static inside the lobby for initialization. (A round-3 bug had
    t0=10.0 "absolute" here while simulate_events passes relative times —
    every corridor sequence sat motionless in the lobby and the degeneracy
    machinery was never actually exercised.)"""

    def __init__(self, speed: float = 8.0, ramp: float = 1.5,
                 yaw_amp: float = 0.10, wiggle: float = 0.04,
                 origin=(0.0, 0.0, 1.2), t0: float = 0.0,
                 dwell: float = 1.5):
        self.speed = speed
        self.ramp = ramp
        self.yaw_amp = yaw_amp
        self.wiggle = wiggle
        self.origin = np.asarray(origin, np.float64)
        self.t0 = t0
        self.dwell = dwell

    def pos(self, t):
        te = float(t) - self.t0 - self.dwell
        if te <= 0.0:
            x = 0.0
        elif te <= self.ramp:
            x = 0.5 * self.speed * te * te / self.ramp
        else:
            x = self.speed * (te - 0.5 * self.ramp)
        s = self._s(te)
        return self.origin + np.array([
            x,
            s * 0.25 * np.sin(2 * np.pi * 0.21 * te),
            s * 0.08 * np.sin(2 * np.pi * 0.37 * te),
        ])

    def rot(self, t):
        te = float(t) - self.t0 - self.dwell
        s = self._s(te)
        yaw = s * self.yaw_amp * np.sin(2 * np.pi * 0.3 * te)
        roll = s * self.wiggle * np.sin(2 * np.pi * 0.5 * te)
        pitch = s * self.wiggle * np.sin(2 * np.pi * 0.33 * te + 1.0)
        return _rotz(yaw) @ _roty(pitch) @ _rotx(roll)


class HelixTrajectory(Trajectory):
    """Stairwell ascent: after `dwell` static seconds on the ground floor,
    climb a helix of radius `r` at `turn_s` seconds per turn and `climb`
    m/s, yaw tracking the tangent — sustained ~(360/turn_s) deg/s yaw, the
    fast-rotation + short-lever-arm regime of a real stair climb."""

    def __init__(self, r: float = 1.0, turn_s: float = 6.0,
                 climb: float = 0.5, dwell: float = 1.5, ramp: float = 1.0,
                 z0: float = 1.3, wiggle: float = 0.04):
        self.r = r
        self.turn_s = turn_s
        self.climb = climb
        self.dwell = dwell
        self.ramp = ramp
        self.z0 = z0
        self.wiggle = wiggle

    def _te(self, t):
        return max(float(t) - self.dwell, 0.0)

    def _ang(self, te):
        # angle ramps quadratically over [0, ramp] then linearly
        w = 2 * np.pi / self.turn_s
        if te <= 0:
            return 0.0
        if te <= self.ramp:
            return 0.5 * w * te * te / self.ramp
        return w * (te - 0.5 * self.ramp)

    def pos(self, t):
        te = self._te(t)
        a = self._ang(te)
        z = self.z0 + self.climb * (a / (2 * np.pi)) * self.turn_s
        return np.array([self.r * np.cos(a), self.r * np.sin(a), z])

    def rot(self, t):
        te = self._te(t)
        a = self._ang(te)
        s = self._s(te)
        pitch = s * (-0.15 + self.wiggle * np.sin(2 * np.pi * 0.5 * te))
        roll = s * self.wiggle * np.sin(2 * np.pi * 0.37 * te + 1.0)
        # face the tangent direction (a + 90 deg)
        return _rotz(a + np.pi / 2) @ _roty(pitch) @ _rotx(roll)


class FlightTrajectory(Trajectory):
    """Aggressive outdoor flight — the config/outdoor_fly.yaml regime: after
    `dwell` static seconds near the ground, climb out into a banked
    figure-8 (x = A sin th, y = B sin 2th) at up to ~|Aw|+|2Bw| m/s, with
    coordinated roll (bank angle from lateral acceleration), pitch
    following the climb angle, and yaw tracking the velocity heading
    (blended in smoothly from the static attitude so the synthetic IMU
    stays continuous)."""

    def __init__(self, A: float = 14.0, B: float = 7.0, w: float = 0.6,
                 z0: float = 1.5, z_mean: float = 6.0, z_amp: float = 2.5,
                 dwell: float = 1.5, ramp: float = 2.0):
        self.A = A
        self.B = B
        self.w = w
        self.z0 = z0
        self.z_mean = z_mean
        self.z_amp = z_amp
        self.dwell = dwell
        self.ramp = ramp

    def _te(self, t):
        return max(float(t) - self.dwell, 0.0)

    def _ang(self, te):
        # pattern angle ramps quadratically over [0, ramp] then linearly
        if te <= 0:
            return 0.0
        if te <= self.ramp:
            return 0.5 * self.w * te * te / self.ramp
        return self.w * (te - 0.5 * self.ramp)

    def pos(self, t):
        te = self._te(t)
        th = self._ang(te)
        s = self._s(te)
        x = self.A * np.sin(th)
        y = self.B * np.sin(2 * th)
        z = self.z0 + s * (self.z_mean - self.z0
                           + self.z_amp * np.sin(0.7 * th))
        return np.array([x, y, z])

    def _vel(self, t, h=1e-3):
        return (self.pos(t + h) - self.pos(t - h)) / (2 * h)

    def rot(self, t):
        te = self._te(t)
        s = self._s(te)
        v = self._vel(t)
        a = (self._vel(t + 1e-3) - self._vel(t - 1e-3)) / 2e-3
        vxy = float(np.hypot(v[0], v[1]))
        # heading relative to the pattern's initial heading, blended by s
        # so yaw is continuous through the dwell->flight transition
        head0 = np.arctan2(2 * self.B, self.A)
        head = np.arctan2(v[1], v[0]) if vxy > 1e-6 else head0
        yaw = s * float(np.unwrap([head0, head])[1] - head0)
        # coordinated bank: lateral (heading-left) acceleration over gravity
        a_lat = float(-np.sin(head) * a[0] + np.cos(head) * a[1])
        roll = s * np.arctan2(a_lat, G_M_S2)
        pitch = -s * np.arctan2(v[2], max(vxy, 1.0))
        return _rotz(yaw) @ _roty(pitch) @ _rotx(roll)


def imu_sample(traj: Trajectory, t: float, h: float = 1e-4):
    """Gyro/accel by central differences of the trajectory:
    gyro = vee(R^T dR/dt), acc = R^T (p_ddot - g_world)."""
    R = traj.rot(t)
    Rp, Rm = traj.rot(t + h), traj.rot(t - h)
    W = R.T @ (Rp - Rm) / (2 * h)
    gyr = np.array([W[2, 1] - W[1, 2], W[0, 2] - W[2, 0], W[1, 0] - W[0, 1]]) / 2.0
    pp, p0, pm = traj.pos(t + h), traj.pos(t), traj.pos(t - h)
    acc_w = (pp - 2 * p0 + pm) / (h * h)
    g_world = np.array([0.0, 0.0, -G_M_S2])
    return gyr, R.T @ (acc_w - g_world)


def raycast(origins: np.ndarray, dirs: np.ndarray, patches: List[PlanePatch],
            max_range: float = 80.0) -> np.ndarray:
    """Batched ray casting: (N,3) origins + unit dirs -> (N,) ranges
    (inf where nothing is hit within max_range)."""
    N = dirs.shape[0]
    best = np.full(N, np.inf)
    for pl in patches:
        denom = dirs @ pl.n
        with np.errstate(divide="ignore", invalid="ignore"):
            # inf/nan t values flow through hit/rel too — keep the whole
            # chain inside the errstate guard and mask at the end
            tt = ((pl.q - origins) @ pl.n) / denom
            hit = origins + tt[:, None] * dirs
            rel = hit - pl.q
            ok = (
                (tt > 0.05)
                & (tt < max_range)
                & (np.abs(rel @ pl.u) <= pl.hu)
                & (np.abs(rel @ pl.v) <= pl.hv)
                & np.isfinite(tt)
            )
        best = np.where(ok & (tt < best), tt, best)
    return best


def simulate_scan(
    traj: Trajectory,
    t0: float,
    patches: List[PlanePatch],
    n_az: int = 360,
    n_el: int = 16,
    span: float = 0.1,
    ext_R: np.ndarray | None = None,
    ext_p: np.ndarray | None = None,
    noise: float = 0.0,
    rng: np.random.Generator | None = None,
    el_range=(-0.35, 0.35),
    max_range: float = 80.0,
) -> DecodedScan:
    """One spinning-LiDAR sweep starting at t0: n_az columns x n_el rings,
    each column cast from the sensor pose at its own firing time."""
    ext_R = np.eye(3) if ext_R is None else ext_R
    ext_p = np.zeros(3) if ext_p is None else ext_p

    az = 2 * np.pi * np.arange(n_az) / n_az
    el = np.linspace(el_range[0], el_range[1], n_el)
    ca, sa = np.cos(az), np.sin(az)
    ce, se = np.cos(el), np.sin(el)
    # body-frame directions (n_az, n_el, 3)
    d_body = np.stack(
        [ca[:, None] * ce[None, :], sa[:, None] * ce[None, :], np.broadcast_to(se, (n_az, n_el))],
        axis=-1,
    )
    t_col = t0 + span * np.arange(n_az) / n_az

    pts, times = [], []
    # a scene object (sensor/worldgen.py) casts with the ABSOLUTE column
    # firing time so dynamic geometry moves within a sweep; a plain patch
    # list stays on the static fast path
    scene_cast = getattr(patches, "cast", None)
    for j in range(n_az):
        R_imu, p_imu = traj.pose(t_col[j])
        R_l = R_imu @ ext_R
        p_l = R_imu @ ext_p + p_imu
        dw = d_body[j] @ R_l.T
        if scene_cast is not None:
            rr = scene_cast(np.broadcast_to(p_l, (n_el, 3)), dw,
                            t_col[j], max_range)
        else:
            rr = raycast(np.broadcast_to(p_l, (n_el, 3)), dw, patches,
                         max_range)
        ok = np.isfinite(rr)
        if ok.any():
            pb = d_body[j][ok] * rr[ok, None]
            pts.append(pb)
            times.append(np.full(ok.sum(), t_col[j] - t0))
    if not pts:
        return DecodedScan(np.zeros((0, 3), np.float32), np.zeros(0, np.float32), np.zeros(0, np.float32), t0)
    P = np.concatenate(pts).astype(np.float32)
    T = np.concatenate(times).astype(np.float32)
    if noise > 0 and rng is not None:
        P = P + rng.normal(scale=noise, size=P.shape).astype(np.float32)
    return DecodedScan(P, np.zeros(len(P), np.float32), T, t0)


def simulate_events(
    duration: float = 10.0,
    scan_hz: float = 10.0,
    imu_hz: float = 200.0,
    traj: Trajectory | None = None,
    patches: List[PlanePatch] | None = None,
    n_az: int = 360,
    n_el: int = 16,
    noise: float = 0.0,
    imu_noise_gyr: float = 0.0,
    imu_noise_acc: float = 0.0,
    seed: int = 0,
    ext_R=None,
    ext_p=None,
    start_time: float = 10.0,
    static_lead: float = 1.0,
    max_range: float = 80.0,
    el_range=(-0.35, 0.35),
    span: float | None = None,
):
    """Raw time-ordered sensor events BEFORE frame assembly: a list of
    ("imu", t, gyr, acc_gunits) and ("scan", DecodedScan) entries plus
    ground truth [(t, R, p)] at scan-end times. Feed to a FrameAssembler
    (simulate_sequence) or serialize into a rosbag2 via
    platform/rosbag_write.write_sequence_bag (the PARITY_RUNS path).

    span: sweep duration of one scan; None = spinning lidar
    (min(0.1, scan period)). Use 0.0 for snapshot sensors (all columns
    cast from one pose at the frame stamp — the TartanAir/point_notime
    model, where no per-point time exists to deskew with)."""
    traj = traj or Trajectory()
    patches = patches if patches is not None else default_world()
    rng = np.random.default_rng(seed)

    out, gts = [], []
    t_imu = start_time - static_lead
    imu_dt = 1.0 / imu_hz
    scan_dt = 1.0 / scan_hz
    n_scans = int(duration * scan_hz)
    scan_starts = start_time + scan_dt * np.arange(n_scans)

    events = [(t, "imu") for t in np.arange(t_imu, start_time + duration + 0.2, imu_dt)]
    events += [(t, "scan") for t in scan_starts]
    events.sort(key=lambda e: (e[0], e[1] == "imu"))

    span = min(0.1, scan_dt) if span is None else float(span)
    for t, kind in events:
        if kind == "imu":
            tau = max(t - start_time, 0.0)  # trajectory time (ramped)
            gyr, acc = imu_sample(traj, tau)
            if imu_noise_gyr > 0:
                gyr = gyr + rng.normal(scale=imu_noise_gyr, size=3)
            if imu_noise_acc > 0:
                acc = acc + rng.normal(scale=imu_noise_acc, size=3)
            out.append(("imu", t, gyr, acc / G_M_S2))  # g-unit IMU like Livox
        else:
            tau = t - start_time
            scan = simulate_scan(
                traj, tau, patches, n_az=n_az, n_el=n_el, span=span,
                ext_R=ext_R, ext_p=ext_p, noise=noise, rng=rng,
                max_range=max_range, el_range=el_range,
            )
            scan.stamp = t
            out.append(("scan", scan))
            R, p = traj.pose(tau + span)
            gts.append((t + span, R, p))
    return out, gts


def simulate_sequence(
    duration: float = 10.0,
    scan_hz: float = 10.0,
    imu_hz: float = 200.0,
    traj: Trajectory | None = None,
    patches: List[PlanePatch] | None = None,
    n_az: int = 360,
    n_el: int = 16,
    noise: float = 0.0,
    imu_noise_gyr: float = 0.0,
    imu_noise_acc: float = 0.0,
    seed: int = 0,
    ext_R=None,
    ext_p=None,
    start_time: float = 10.0,
    static_lead: float = 1.0,
    max_range: float = 80.0,
    el_range=(-0.35, 0.35),
):
    """Full sequence: returns (frames, ground_truth) where frames come out of
    a FrameAssembler exactly as the live pipeline would see them, and
    ground_truth is [(t, R, p)] at scan-end times.

    static_lead seconds of pure static IMU precede the first scan so the
    EKF's static init (imu_ekf.cpp:147-201, >=30 samples) has data.
    """
    events, gts = simulate_events(
        duration=duration, scan_hz=scan_hz, imu_hz=imu_hz, traj=traj,
        patches=patches, n_az=n_az, n_el=n_el, noise=noise,
        imu_noise_gyr=imu_noise_gyr, imu_noise_acc=imu_noise_acc, seed=seed,
        ext_R=ext_R, ext_p=ext_p, start_time=start_time,
        static_lead=static_lead, max_range=max_range, el_range=el_range)
    asm = FrameAssembler()
    frames = []
    for ev in events:
        if ev[0] == "imu":
            asm.push_imu(ev[1], ev[2], ev[3])
        else:
            asm.push_scan(ev[1])
        f = asm.try_assemble()
        if f is not None:
            frames.append(f)

    return frames, gts[: len(frames) + 2]
