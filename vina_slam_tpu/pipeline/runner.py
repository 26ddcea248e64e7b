"""The per-scan SLAM orchestrator.

Reference: the dedicated SLAM thread thd_odometry_localmapping
(src/pipeline/local_mapping.cpp:258-572) plus the initialization wrapper
(src/platform/ros2/node.cpp:293-366) and system_reset (node.cpp:368-408).

Host code here only sequences jitted device programs and moves O(scan)
buffers; every compute stage (deskew, downsample, IEKF, recut, BA, margi)
is a fixed-shape XLA program. Variable scan sizes are padded to buckets
(SCAN_BUCKETS) so each bucket compiles exactly once.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vina_slam_tpu.core import state as st
from vina_slam_tpu.core import pointcov
from vina_slam_tpu.core.config import SlamConfig
from vina_slam_tpu.core.constants import SCAN_BUCKETS
from vina_slam_tpu.estimation import preintegration as pre
from vina_slam_tpu.estimation.ekf import ImuEkf
from vina_slam_tpu.mapping import ba, factors as fx, voxel_map as vm
from vina_slam_tpu.ops import downsample as ds
from vina_slam_tpu.pipeline import initialization as init_mod
from vina_slam_tpu.pipeline import odometry as odom
from vina_slam_tpu.sensor.sync import Frame


def pick_bucket(n: int) -> int:
    for b in SCAN_BUCKETS:
        if n <= b:
            return b
    return SCAN_BUCKETS[-1]


def pad_points(pts, rel=None, bucket=None):
    n = pts.shape[0]
    b = bucket or pick_bucket(n)
    out = np.zeros((b, 3), np.float32)
    out[:n] = pts
    valid = np.zeros(b, bool)
    valid[:n] = True
    if rel is None:
        return jnp.asarray(out), jnp.asarray(valid)
    r = np.zeros(b, np.float32)
    r[:n] = rel
    return jnp.asarray(out), jnp.asarray(r), jnp.asarray(valid)


@jax.jit
def _win_world(win_pts, win_valid, Rs, ps):
    """Window body points -> world under the current window poses."""
    from vina_slam_tpu.core.mat3 import bmv
    R32 = Rs.astype(jnp.float32)
    p32 = ps.astype(jnp.float32)
    w = bmv(R32[:, None], win_pts) + p32[:, None, :]
    return jnp.where(win_valid[..., None], w, 1e7)  # park invalid far away


@jax.jit
def _var_init_jit(pts, ext_R, ext_p, dept_err, beam_err):
    return pointcov.var_init(ext_R, ext_p, pts, dept_err, beam_err)


@jax.jit
def _evict_needed(keys, vox_jour, jour, evict_dist):
    """True iff the table holds entries older than the release distance."""
    return jnp.any((keys != vm.vh.EMPTY_KEY) & (jour - vox_jour >= evict_dist))


@partial(jax.jit, static_argnames=("ms", "W", "Np"))
def _fresh_containers(ms: vm.MapStatic, W: int, Np: int):
    """Zero state for reset_containers as ONE program (see its comment)."""
    return (vm.make_map(ms), vm.make_pool(ms), st.identity_state(),
            jnp.zeros((W, Np, 3), jnp.float32),
            jnp.zeros((W, Np, 6), jnp.float32),
            jnp.zeros((W, Np), bool),
            jnp.zeros((65536, 3), jnp.float32),
            jnp.zeros(65536, bool))


@jax.jit
def _world_var_jit(pts_body, var_body, R, p, cov):
    """World points + SYM3-packed world covariance (the window/pool
    storage format — see pointcov.sym3_pack)."""
    pts_w, var_w = pointcov.world_var(pts_body, var_body, R, p, cov)
    return pts_w, pointcov.sym3_pack(var_w)


@dataclass
class RunnerStats:
    frames: int = 0
    degrade_cnt: int = 0
    ba_runs: int = 0
    init_rounds: int = 0
    resets: int = 0
    evictions: int = 0
    # per-BA-run telemetry (modular path only; the fused step keeps these
    # on-device): LM iterations actually executed out of max_iter, and how
    # many of the V factor-pad rows held real voxels
    lm_iters: list = field(default_factory=list)
    ba_fill: list = field(default_factory=list)
    # trajectory-row index where each post-reset session begins (the
    # reference's publishers carry a `cur_session` id for the same reason:
    # after system_reset the world frame is rebased, so rows from different
    # sessions must not be compared in one rigid alignment)
    session_starts: list = field(default_factory=list)


class SlamRunner:
    """End-to-end LiDAR-inertial SLAM on one device."""

    def __init__(self, cfg: SlamConfig, npad_map: int = 16384, verbose: bool = False,
                 enable_degrade_reset: bool = False, use_fused: bool = True,
                 fetch_every: int = 32):
        # TPU MXU default precision runs f32 dots as single bf16 passes
        # (8-bit mantissa). That silently corrupts the initialization chain
        # in hard regimes: on the stairwell world, motion_init's gravity LM
        # stalls (rel-residual never < 0.05), |g| lands near 5 instead of
        # 9.8, plane detection finds 16-69 voxels instead of ~140, and
        # every window is (correctly) rejected -> 12 resets, while the SAME
        # code on CPU initializes first-try. "highest" restores f32-true
        # dots (measured cost on bench.py: see BENCH.md round-4 log).
        # SURVEY §7 hard-part #5 ("matching CPU double-precision numerics")
        # made concrete.
        jax.config.update("jax_default_matmul_precision", "highest")
        self.cfg = cfg
        self.npad_map = npad_map
        self.verbose = verbose
        # fused single-dispatch steady state (pipeline/fused.py); the modular
        # path remains for debugging and the initialization phase
        self.use_fused = use_fused
        self.fetch_every = fetch_every
        self._fused = None
        self._pending_rows = 0
        self._traj_base = 0
        # sticky IMU pad bucket: grows monotonically so the fused step
        # compiles at most once more after warmup (see pick_imu_bucket)
        self._imu_sticky = 0
        # the reference's auto-reset branch is compiled out (if (0),
        # local_mapping.cpp:474-487); keep it available behind a flag
        self.enable_degrade_reset = enable_degrade_reset

        from vina_slam_tpu.mapping.keyframe import GlobalMapAccumulator
        from vina_slam_tpu.utils.profiling import StageTimer
        self.timer = StageTimer()
        save_dir = ""
        if cfg.general.is_save_map:
            # session lifecycle incl. the overwrite guard (node.cpp:267-287)
            from vina_slam_tpu.platform.io import prepare_session_dir
            save_dir = prepare_session_dir(
                cfg.general.save_path, cfg.general.bagname,
                cfg.general.is_save_map)
        self.map_accum = GlobalMapAccumulator(
            save_dir=save_dir,
            full_map_voxel_size=cfg.general.full_map_voxel_size)
        o, lb, tp = cfg.odometry, cfg.local_ba, cfg.tpu
        self.W = lb.win_size
        self.ms = vm.MapStatic(
            capacity=tp.map_capacity, levels=lb.max_layer + 1,
            probe=tp.probe_len, max_new=tp.max_new_voxels,
            pool_capacity=tp.fix_pool_capacity,
            active_cap=tp.active_cap, refind_cap=tp.refind_cap,
            pool_move_cap=tp.pool_move_cap, evict_dist=tp.evict_dist)
        self.params = vm.MapParams(
            voxel_size=jnp.asarray(o.voxel_size, jnp.float32),
            min_eigen_value=jnp.asarray(o.min_eigen_value, jnp.float32),
            plane_thre=jnp.asarray(cfg.plane_thre_inv, jnp.float32),
            min_point=jnp.asarray(cfg.min_point, jnp.float32),
            max_points=jnp.asarray(100.0, jnp.float32))
        self.noise_meas = np.diag(np.repeat([lb.cov_gyr, lb.cov_acc], 3))
        self.noise_walk = np.diag(np.repeat([lb.rdw_gyr, lb.rdw_acc], 3))

        self.ekf = ImuEkf(
            cov_gyr=np.full(3, o.cov_gyr), cov_acc=np.full(3, o.cov_acc),
            cov_bias_gyr=np.full(3, o.rdw_gyr), cov_bias_acc=np.full(3, o.rdw_acc),
            ext_R=cfg.ext_R, ext_p=cfg.ext_p, point_notime=bool(o.point_notime))
        self.imupre_scale_gravity = 1.0

        self.reset_containers()
        self.stats = RunnerStats()
        # trajectory store: scan index -> [t, R, p]; BA refines the window tail
        self.traj: list = []

    # ------------------------------------------------------------ lifecycle
    def reset_containers(self):
        Np = self.npad_map
        # ONE program zero-initializes every container: the eager per-array
        # jnp.zeros calls dispatched ~25 broadcast programs into the
        # cold-start compile storm (VERDICT r4 item 6)
        (self.map, self.pool, self.x_curr, self.win_pts, self.win_var,
         self.win_valid, self.boot_pts, self.boot_valid) = _fresh_containers(
            ms=self.ms, W=self.W, Np=Np)
        self.win_count = 0
        self.win_base = 0
        self.x_buf: list = []
        self.pre_buf: list = []
        self.motion_init_flag = True
        self._fused = None
        self._fused_consts = None  # scale_gravity may change on re-init
        self._pending_rows = 0
        self.jour = 0.0
        self.last_pos = np.zeros(3)
        self.release_flag = False
        # init collection
        self.pl_origs: list = []
        self.beg_times: list = []
        self.vec_imus: list = []

    def system_reset(self, imu_block):
        """system_reset (node.cpp:368-408)."""
        self.stats.session_starts.append(len(self.traj))
        self.reset_containers()
        self.x_curr = self.x_curr._replace(p=jnp.asarray([0.0, 0.0, 30.0]))
        self.ekf.mean_acc = np.zeros(3)
        self.ekf.init_num = 0
        self.ekf.init_flag = False
        if imu_block is not None:
            self.ekf.imu_init(imu_block)
            self.x_curr = self.x_curr._replace(
                g=jnp.asarray(-self.ekf.mean_acc * self.imupre_scale_gravity))
        self.stats.resets += 1

    # ------------------------------------------------------------ main loop
    def process_frame(self, frame: Frame):
        """One scan through the pipeline. Returns a dict of outputs or None
        while initializing."""
        if self._fused is not None:
            return self._steady_fused(frame)

        scan = frame.scan
        status, self.x_curr, deskewed, cond_imu = self.ekf.process(
            self.x_curr, scan.pts, scan.rel_time, frame.beg_time,
            frame.end_time, frame.imu)
        if status == 0:
            return None

        if self.motion_init_flag:
            out = self._initialization(frame, deskewed, cond_imu)
            if not self.motion_init_flag and self.use_fused:
                self._enter_fused()
            return out
        return self._steady_step(frame, deskewed, cond_imu)

    # -------------------------------------------------------- fused driver
    def _enter_fused(self):
        """Package the modular state into the device-resident SteadyState
        and switch to the single-dispatch fused step."""
        from vina_slam_tpu.pipeline import fused
        import vina_slam_tpu.core.state as stmod

        W = self.W
        pad = W - len(self.x_buf)
        xs_list = self.x_buf + [self.x_buf[-1]] * pad
        xs = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *xs_list)
        if self.pre_buf:
            pre_list = self.pre_buf + [self.pre_buf[-1]] * (W - 1 - len(self.pre_buf))
            pre_st = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *pre_list)
        else:
            from vina_slam_tpu.estimation.preintegration import _zero
            pre_st = jax.tree_util.tree_map(
                lambda a: jnp.stack([a] * (W - 1)), _zero())
        # the fused state OWNS its buffers (steady_step donates them):
        # seeding it with the modular arrays directly would leave
        # self.map/self.x_curr/... pointing at deleted buffers after the
        # first step (caught by tests/test_faults.py readback asserts).
        # ONE jitted program does every copy: the eager per-leaf jnp.copy
        # tree dispatched ~25 copy programs into the cold-start storm
        # (a jit's outputs never alias its undonated inputs, so the single
        # program IS the copy).
        self._fused = fused.package_steady_state(
            self.map, self.pool, self.x_curr, xs, pre_st,
            self.win_pts, self.win_var, self.win_valid,
            jnp.asarray(self.win_count, jnp.int32),
            jnp.asarray(self.jour, jnp.float32),
            jnp.asarray(np.asarray(self.x_curr.p), jnp.float64),
            jnp.asarray(self.win_base + self.win_count, jnp.int32))
        self._traj_base = len(self.traj)
        self._fetched = 0
        self._cfgs = self.fused_static_cfgs()
        if self.win_count != self.W - 1:
            # the assume_full invariant (every fused step runs on a full
            # window) holds on the normal post-init path; fall back to the
            # guarded while_loop form if a caller enters fused mode with a
            # partially filled window
            self._cfgs = self._cfgs[:8] + (False,)

    def fused_static_cfgs(self):
        """STRUCTURE-only static tuple of the fused step; float tuning knobs
        travel as traced args (fused_args tail) so profiles differing only in
        tuning share one compiled program (plane gates are traced via params)."""
        o, lb = self.cfg.odometry, self.cfg.local_ba
        use_normal = bool(lb.use_normal)
        iekf_iters = int(o.iekf_max_iter) or (4 if o.use_vnc else 20)
        return (bool(self.cfg.general.if_BA), int(self.npad_map),
                3 if use_normal else 10, use_normal,
                bool(o.use_vnc), bool(o.point_notime), iekf_iters,
                bool(self.cfg.tpu.recut_defer),
                True)  # assume_full — guarded at _enter_fused

    def fused_program_key(self):
        """Everything that selects a compiled fused-step program: two
        SlamRunners with equal keys reuse ONE XLA executable (given equal
        scan/IMU pad buckets). The six shipped profiles collapse to two keys
        (max_layer 2 vs 3); see tests/test_lifecycle.py."""
        return (self.ms, self.W, self.cfg.tpu.max_voxels_ba,
                self.fused_static_cfgs())

    def _frame_host_arrays(self, frame: Frame, imu_bucket: int | None = None):
        """Shared host-side interval/midpoint computation for one frame.
        Returns (arrays, gm, am, dtm, vmsk) numpy buckets of equal K, or
        None when the frame spans no IMU interval. Advances the EKF stream
        cursor either way (matching the reference's consume-always loop)."""
        from vina_slam_tpu.estimation.ekf import build_intervals, midpoint_arrays

        ekf = self.ekf
        if ekf.last_pcl_end_time - frame.beg_time > 0.01:
            from vina_slam_tpu.estimation.ekf import LidarTimeRegression
            raise LidarTimeRegression(
                f"beg={frame.beg_time} last_end={ekf.last_pcl_end_time}")
        floor = imu_bucket if imu_bucket is not None else self._imu_sticky
        prev_imu, prev_end = ekf.last_imu, ekf.last_pcl_end_time
        arrays, cond, n = build_intervals(
            prev_imu, prev_end, frame.beg_time,
            frame.end_time, frame.imu, bucket=floor)
        ekf.last_imu = (frame.end_time, frame.imu.gyr[-1].copy(),
                        frame.imu.acc[-1].copy())
        ekf.last_pcl_end_time = frame.end_time
        if n == 0:
            return None
        gm, am, dtm, vm_ = midpoint_arrays(cond, bucket=floor)
        K = max(len(arrays["dt"]), len(gm))
        if len(arrays["dt"]) != K:
            arrays, _, _ = build_intervals(
                prev_imu, prev_end, frame.beg_time, frame.end_time,
                frame.imu, bucket=K)
        if len(gm) != K:
            gm, am, dtm, vm_ = midpoint_arrays(cond, bucket=K)
        self._imu_sticky = max(self._imu_sticky, K)
        return arrays, gm, am, dtm, vm_

    def fused_consts(self):
        """The constant tail of steady_step's signature, uploaded ONCE and
        reused every frame (these were ~15 fresh host->device puts per frame
        before — half the measured 12 ms/frame packaging cost)."""
        if getattr(self, "_fused_consts", None) is None:
            self._fused_consts = (
                self.params, jnp.asarray(self.noise_meas),
                jnp.asarray(self.noise_walk),
                jnp.asarray(np.asarray(self.ekf.cov_gyr)),
                jnp.asarray(np.asarray(self.ekf.cov_acc)),
                jnp.asarray(np.asarray(self.ekf.cov_bias_gyr)),
                jnp.asarray(np.asarray(self.ekf.cov_bias_acc)),
                jnp.asarray(self.cfg.ext_R), jnp.asarray(self.cfg.ext_p),
                jnp.asarray(float(self.imupre_scale_gravity)),
                jnp.asarray(float(self.cfg.local_ba.imu_coef)),
                jnp.asarray(float(self.cfg.odometry.down_size), jnp.float32),
                jnp.asarray(float(self.cfg.odometry.dept_err), jnp.float32),
                jnp.asarray(float(self.cfg.odometry.beam_err), jnp.float32),
            )
        return self._fused_consts

    def fused_args(self, frame: Frame, imu_bucket: int | None = None):
        """Host-side packaging of one frame into steady_step's positional
        args (after the state). Returns None when the frame spans no IMU
        interval. Used by the batched multi-sequence drivers
        (parallel/multiseq.py — which force a fixed imu_bucket so
        per-sequence args stack); the single-sequence driver takes the
        3-transfer fused_args_packed path instead."""
        host = self._frame_host_arrays(frame, imu_bucket)
        if host is None:
            return None
        arrays, gm, am, dtm, vm_ = host
        full_pts, full_rel, full_valid = pad_points(frame.scan.pts,
                                                    frame.scan.rel_time)
        return (
            full_pts, full_rel, full_valid,
            jnp.asarray(arrays["avr_gyr"]), jnp.asarray(arrays["avr_acc"]),
            jnp.asarray(arrays["dt"]), jnp.asarray(arrays["offt"]),
            jnp.asarray(arrays["valid"]), jnp.asarray(arrays["end_minus_last"]),
            jnp.asarray(float(frame.end_time)),
            jnp.asarray(gm), jnp.asarray(am), jnp.asarray(dtm), jnp.asarray(vm_),
            *self.fused_consts(),
        )

    def fused_args_packed(self, frame: Frame, imu_bucket: int | None = None):
        """3-transfer per-frame payload for steady_step_packed_donated:
        scan_pack (Np, 5) f32, imu_pack (K, IMU_PACK_COLS) f64, scal (2,)
        f64. Returns None when the frame spans no IMU interval."""
        from vina_slam_tpu.pipeline.fused import IMU_PACK_COLS

        host = self._frame_host_arrays(frame, imu_bucket)
        if host is None:
            return None
        arrays, gm, am, dtm, vm_ = host
        pts = frame.scan.pts
        n = pts.shape[0]
        b = pick_bucket(n)
        scan_pack = np.zeros((b, 5), np.float32)
        scan_pack[:n, 0:3] = pts
        scan_pack[:n, 3] = frame.scan.rel_time
        scan_pack[:n, 4] = 1.0
        K = len(gm)
        imu_pack = np.zeros((K, IMU_PACK_COLS))
        imu_pack[:, 0:3] = arrays["avr_gyr"]
        imu_pack[:, 3:6] = arrays["avr_acc"]
        imu_pack[:, 6] = arrays["dt"]
        imu_pack[:, 7] = arrays["offt"]
        imu_pack[:, 8] = arrays["valid"]
        imu_pack[:, 9:12] = gm
        imu_pack[:, 12:15] = am
        imu_pack[:, 15] = dtm
        imu_pack[:, 16] = vm_
        scal = np.asarray([arrays["end_minus_last"], float(frame.end_time)])
        return (jnp.asarray(scan_pack), jnp.asarray(imu_pack),
                jnp.asarray(scal))

    def _steady_fused(self, frame: Frame):
        from vina_slam_tpu.pipeline import fused

        args = self.fused_args_packed(frame)
        if args is None:
            return None
        self._fused = fused.steady_step_packed_donated(
            self._fused, *args, *self.fused_consts(),
            ms=self.ms, W=self.W, Vmax=self.cfg.tpu.max_voxels_ba,
            cfgs=self._cfgs,
        )
        self.stats.frames += 1
        self._pending_rows += 1
        if self._pending_rows >= self.fetch_every:
            self.drain_traj()
            # config-gated geometric-degeneracy recovery, fused mode: the
            # counter accumulates on-device (fused.steady_step) and is
            # inspected at the fetch cadence (local_mapping.cpp:474-487 —
            # compiled out via `if (0)` in the reference; kept behind the
            # same flag as the modular path)
            if (self.enable_degrade_reset
                    and self.stats.degrade_cnt > self.cfg.odometry.degrade_bound):
                self.system_reset(frame.imu)
                return {"reset": True, "t": float(frame.end_time),
                        "degenerate": True}
        return {"queued": True, "t": float(frame.end_time)}

    def sync_from_fused(self):
        """Mirror the device-resident fused SteadyState back into the modular
        fields (map, pool, window buffers, states, preintegrations, journey).
        Checkpointing and any other whole-state consumer MUST see this view —
        the modular fields are stale _enter_fused()-time snapshots otherwise.
        The runner stays in fused mode; this is a read-out, not an exit."""
        if self._fused is None:
            return
        self.drain_traj()  # traj store + x_curr + degrade counter
        f = self._fused
        # COPY every mirrored leaf: the production step DONATES the fused
        # SteadyState, so aliased views become deleted arrays on the next
        # process_frame (caught by tests/test_faults.py readback-after-sync)
        copy = jnp.copy
        self.map = jax.tree_util.tree_map(copy, f.m)
        self.pool = jax.tree_util.tree_map(copy, f.pool)
        self.win_pts, self.win_var, self.win_valid = (
            copy(f.win_pts), copy(f.win_var), copy(f.win_valid))
        wc = int(f.win_count)
        self.win_count = wc
        self.win_base = int(f.scan_idx) - wc
        self.x_curr = jax.tree_util.tree_map(copy, f.x)
        self.x_buf = [jax.tree_util.tree_map(lambda a, i=i: copy(a[i]), f.xs)
                      for i in range(wc)]
        self.pre_buf = [jax.tree_util.tree_map(lambda a, i=i: a[i], f.pre_f)
                        for i in range(max(wc - 1, 0))]
        self.jour = float(f.jour)
        self.last_pos = np.asarray(f.last_pos)

    def drain_traj(self):
        """Fetch the device trajectory ring into the host path store
        (re-reading the whole window tail picks up BA refinements)."""
        if self._fused is None or self._pending_rows == 0:
            return
        from vina_slam_tpu.pipeline import fused as fmod
        head = int(self._fused.traj_head)
        ring = np.asarray(self._fused.traj)
        n_rows = min(head, fmod.TRAJ_CAP)
        # rebuild the host tail from the ring (covers refreshed BA poses)
        start = max(head - n_rows, 0)
        rows = [ring[k % fmod.TRAJ_CAP] for k in range(start, head)]
        # col 13 is the per-scan degeneracy verdict (odometry.cpp:244-254)
        out = [[r[0], r[4:13].reshape(3, 3).copy(), r[1:4].copy(), bool(r[13])]
               for r in rows]
        self.traj = self.traj[: self._traj_base + start] + out
        self._pending_rows = 0
        # copy, don't alias: the fused state is donated on the next step
        self.x_curr = jax.tree_util.tree_map(jnp.copy, self._fused.x)
        self.stats.degrade_cnt = int(self._fused.degrade_cnt)
        # drain-cadence eviction (assume_full mode): the per-scan evict
        # while_loop is hoisted out of the fused program — even at zero
        # iterations it cost ~10 ms/scan in loop-state copies. Staleness is
        # checked here (one tiny dispatch per drain) and the rebuild runs
        # as its own program, matching the reference's opportunistic
        # idle-tick eviction (local_mapping.cpp:317-344).
        if len(self._cfgs) > 8 and self._cfgs[8]:
            f = self._fused
            stale = _evict_needed(f.m.keys, f.m.jour, f.jour,
                                  jnp.asarray(self.ms.evict_dist, jnp.float32))
            if bool(stale):
                m2, pool2, ws2, wm2 = vm.evict(
                    f.m, f.pool, f.jour, self.params, self.ms,
                    win_slots=f.win_slots, win_mom=f.win_mom)
                self._fused = f._replace(m=m2, pool=pool2, win_slots=ws2,
                                         win_mom=wm2)
                self.stats.evictions += 1

    # ------------------------------------------------------------- steady
    def _steady_step(self, frame: Frame, deskewed, cond_imu):
        cfg = self.cfg
        o = cfg.odometry
        full_pts, full_rel, full_valid = pad_points(deskewed, frame.scan.rel_time)

        # downsample for mapping (local_mapping.cpp:396-403)
        dpts, dvalid, n = ds.downsample_mean(full_pts, full_valid,
                                             jnp.asarray(o.down_size, jnp.float32),
                                             self.npad_map)
        if int(n) < 2000:
            dpts, dvalid, n = ds.downsample_mean(
                full_pts, full_valid, jnp.asarray(o.down_size / 2, jnp.float32),
                self.npad_map)

        ext_R = jnp.asarray(cfg.ext_R, jnp.float32)
        ext_p = jnp.asarray(cfg.ext_p, jnp.float32)
        map_body, map_var = _var_init_jit(dpts, ext_R, ext_p, o.dept_err, o.beam_err)
        odo_body, odo_var = _var_init_jit(full_pts, ext_R, ext_p, o.dept_err, o.beam_err)

        # VNC scan planes on the full-res body cloud (odometry.cpp:85-96);
        # the plain path (use_vnc=0) skips scan-plane extraction entirely
        # and runs the 20-iteration budget (odometry.cpp:64-68)
        use_vnc = bool(self.cfg.odometry.use_vnc)
        if use_vnc:
            planes = odom.extract_scan_planes(
                odo_body, full_valid, self.params.voxel_size,
                self.params.min_eigen_value,
                tuple(np.asarray(self.params.plane_thre)),
                levels=self.ms.levels)
        else:
            planes = odom.empty_scan_planes()

        res = odom.iekf_update(
            self.x_curr, self.map, odo_body, odo_var, full_valid, planes,
            self.params, self.ms,
            max_iter=int(self.cfg.odometry.iekf_max_iter)
            or (4 if use_vnc else 20),
            use_vnc=use_vnc)
        self.x_curr = res.x
        if bool(res.ok):
            self.stats.degrade_cnt = max(0, self.stats.degrade_cnt - 1)
        else:
            self.stats.degrade_cnt += 1
        if (self.enable_degrade_reset
                and self.stats.degrade_cnt > self.cfg.odometry.degrade_bound):
            # geometric-degeneracy recovery (local_mapping.cpp:474-487)
            self.stats.degrade_cnt = 0
            self.system_reset(frame.imu)
            return {"reset": True, "t": float(frame.end_time),
                    "pose_R": np.eye(3), "pose_p": np.asarray(self.x_curr.p),
                    "degenerate": True, "match_num": 0}

        # world-frame vars at insertion (pvec_update, point_utils.cpp:54-65)
        _, w_var = _world_var_jit(map_body, map_var, self.x_curr.R,
                                  self.x_curr.p, self.x_curr.cov)

        # window push (local_mapping.cpp:434-441)
        i = self.win_count
        self.win_pts = self.win_pts.at[i].set(map_body)
        self.win_var = self.win_var.at[i].set(w_var)
        self.win_valid = self.win_valid.at[i].set(dvalid)
        self.x_buf.append(self.x_curr)
        if self.win_count >= 1:
            prev = self.x_buf[-2]
            self.pre_buf.append(pre.factor_from_block(
                cond_imu, np.asarray(prev.bg), np.asarray(prev.ba),
                self.noise_meas, self.noise_walk, self.imupre_scale_gravity))
        self.win_count += 1

        self.traj.append([float(self.x_curr.t), np.asarray(self.x_curr.R),
                          np.asarray(self.x_curr.p), not bool(res.ok)])

        out = self._map_update_and_ba(cond_imu)
        self.stats.frames += 1
        out.update(
            pose_R=np.asarray(self.x_curr.R), pose_p=np.asarray(self.x_curr.p),
            t=float(self.x_curr.t), degenerate=not bool(res.ok),
            match_num=int(res.match_num), nnt_min=float(res.nnt_min))
        return out

    def _stacked_poses(self):
        Rs = jnp.stack([x.R for x in self.x_buf] +
                       [self.x_buf[-1].R] * (self.W - self.win_count))
        ps = jnp.stack([x.p for x in self.x_buf] +
                       [self.x_buf[-1].p] * (self.W - self.win_count))
        return Rs, ps

    def _map_update_and_ba(self, cond_imu):
        cfg = self.cfg
        out = {}
        Rs, ps = self._stacked_poses()
        win_w = _win_world(self.win_pts, self.win_valid, Rs, ps)
        # recut owns the Bf accumulation: insertion-time add for the newly
        # pushed frame + re-adds into children on subdivision (push/subdivide
        # semantics, octree.cpp:151-300)
        new_row = min(self.win_count - 1, self.W - 1)
        new_mask = jnp.zeros(self.win_valid.shape, bool).at[new_row].set(True)
        self.map, self.pool, slots, _ = vm.recut(
            self.map, self.pool, win_w, self.win_valid, self.params, self.ms,
            self.W, jnp.asarray(self.jour, jnp.float32),
            win_var=self.win_var, new_mask=new_mask)

        if self.win_count >= self.W:
            factors = fx.extract_factors(
                self.map, slots, win_w, self.win_valid, Rs, ps, self.params,
                self.ms, cfg.tpu.max_voxels_ba, self.W)

            if cfg.general.if_BA and len(self.pre_buf) == self.W - 1:
                pre_st = jax.tree_util.tree_map(
                    lambda *a: jnp.stack(a), *self.pre_buf)
                w0 = ba.WindowPoses(
                    R=Rs.astype(jnp.float64), p=ps.astype(jnp.float64),
                    v=jnp.stack([x.v for x in self.x_buf]),
                    bg=jnp.stack([x.bg for x in self.x_buf]),
                    ba=jnp.stack([x.ba for x in self.x_buf]),
                    g=self.x_buf[-1].g)
                use_normal = bool(cfg.local_ba.use_normal)
                # 3-factor overload runs max_iter=3 (optimizers.cpp:536)
                lm = ba.damping_iter(
                    w0, factors, pre_st, jnp.asarray(cfg.local_ba.imu_coef),
                    self.W, max_iter=3 if use_normal else 10,
                    use_normal=use_normal)
                self._absorb_ba(lm)
                self.stats.ba_runs += 1
                self.stats.lm_iters.append(int(lm.iters))
                self.stats.ba_fill.append(int(factors.n_valid))
                Rs, ps = self._stacked_poses()

            # marginalize the oldest frame (local_mapping.cpp:505-546)
            win_w = _win_world(self.win_pts, self.win_valid, Rs, ps)
            self.map, self.pool = vm.margi(
                self.map, self.pool, slots, win_w, self.win_var, self.win_valid,
                self.params, self.ms, jnp.asarray(self.jour, jnp.float32), mgsize=1)

            # marginalized cloud -> keyframes / global map (pub_localmap)
            if self.cfg.general.is_save_map:
                w0 = np.asarray(win_w[0])[np.asarray(self.win_valid[0])]
                self.map_accum.push_marginalized(
                    w0, np.asarray(self.x_buf[0].R), np.asarray(self.x_buf[0].p))

            # path rewrite for the refined window (publishers.cpp:99-131)
            for k, x in enumerate(self.x_buf):
                idx = len(self.traj) - self.win_count + k
                if 0 <= idx < len(self.traj):
                    self.traj[idx] = [float(x.t), np.asarray(x.R),
                                      np.asarray(x.p), self.traj[idx][3]]

            self._journey_update()
            self._shift_window()
        return out

    def _absorb_ba(self, lm: ba.LMResult):
        """Write LM-refined poses back into the window states and x_curr
        (local_mapping.cpp:499-502)."""
        for k in range(self.win_count):
            self.x_buf[k] = self.x_buf[k]._replace(
                R=lm.poses.R[k], p=lm.poses.p[k], v=lm.poses.v[k],
                bg=lm.poses.bg[k], ba=lm.poses.ba[k])
        self.pre_buf = [jax.tree_util.tree_map(lambda a, i=i: a[i], lm.pre_f)
                        for i in range(self.W - 1)]
        self.x_curr = self.x_curr._replace(
            R=lm.poses.R[self.win_count - 1], p=lm.poses.p[self.win_count - 1])

    def _journey_update(self):
        """700 m release cadence (local_mapping.cpp:510-519 + 317-344)."""
        if (self.win_base + self.win_count) % 10 == 0:
            p = np.asarray(self.x_curr.p)
            spat = float(np.linalg.norm(p - self.last_pos))
            if spat > 0.5:
                self.jour += spat
                self.last_pos = p
                self.release_flag = True
        if self.release_flag:
            self.release_flag = False
            # rebuild only if the table actually holds entries older than the
            # release distance (reference idle-tick semantics,
            # local_mapping.cpp:317-344) — not on every movement tick
            ed = self.ms.evict_dist
            if self.jour > ed and bool(jnp.any(
                    (self.map.keys != vm.vh.EMPTY_KEY)
                    & (self.jour - self.map.jour >= ed))):
                self.map, self.pool = vm.evict(
                    self.map, self.pool, jnp.asarray(self.jour, jnp.float32),
                    self.params, self.ms)
                self.stats.evictions += 1

    def _shift_window(self, mgsize: int = 1):
        self.win_pts = jnp.roll(self.win_pts, -mgsize, axis=0)
        self.win_var = jnp.roll(self.win_var, -mgsize, axis=0)
        self.win_valid = jnp.roll(self.win_valid, -mgsize, axis=0)
        self.win_valid = self.win_valid.at[self.W - mgsize:].set(False)
        self.x_buf = self.x_buf[mgsize:]
        self.pre_buf = self.pre_buf[mgsize:]
        self.win_base += mgsize
        self.win_count -= mgsize

    # ------------------------------------------------------ initialization
    def _initialization(self, frame: Frame, deskewed, cond_imu):
        """VINA_SLAM::initialization (node.cpp:293-366). The per-frame
        collection work runs as ONE jitted program (init_fused.init_frame) —
        the modular form dispatched ~20 programs/frame into the cold-start
        compile storm (VERDICT r4 item 6)."""
        from vina_slam_tpu.pipeline import init_fused

        cfg = self.cfg
        o = cfg.odometry
        if self.win_count == 0:
            self.imupre_scale_gravity = self.ekf.scale_gravity

        full_pts, full_rel, full_valid = pad_points(deskewed, frame.scan.rel_time)
        # raw (pre-deskew) cloud for the motion_init re-deskews
        # (node.cpp:300-302, initialization.cpp:223)
        raw_pts, raw_rel, raw_valid = pad_points(frame.scan.pts,
                                                 frame.scan.rel_time)
        (self.x_curr, self.boot_pts, self.boot_valid,
         cpts, crel, cvalid) = init_fused.init_frame(
            self.x_curr, self.boot_pts, self.boot_valid,
            full_pts, full_valid, raw_pts, raw_rel, raw_valid,
            jnp.asarray(cfg.ext_R), jnp.asarray(cfg.ext_p),
            max(o.down_size, 0.5), o.down_size, o.dept_err, o.beam_err,
            npad=self.npad_map)

        self.x_buf.append(self.x_curr)
        self.win_count += 1
        if self.win_count > 1:
            prev = self.x_buf[-2]
            self.pre_buf.append(pre.factor_from_block(
                cond_imu, np.asarray(prev.bg), np.asarray(prev.ba),
                self.noise_meas, self.noise_walk, self.imupre_scale_gravity))

        self.pl_origs.append((cpts, crel, cvalid))
        self.beg_times.append(frame.beg_time)
        self.vec_imus.append(cond_imu)

        self.traj.append([float(self.x_curr.t), np.asarray(self.x_curr.R),
                          np.asarray(self.x_curr.p), False])

        if self.win_count >= self.W:
            ok = self._motion_init()
            if ok:
                self.motion_init_flag = False
                # fall through to BA + margi like the reference loop
                out = self._post_init_finalize(cond_imu)
                return out
            self.system_reset(frame.imu)
            return None
        return None

    def _motion_init(self) -> bool:
        """Initialization::motion_init (initialization.cpp:158-367). Each
        round runs as ONE jitted program (init_fused.init_round); only the
        <=10-round convergence/align logic stays host-side. The modular form
        dispatched ~25 programs/round plus dozens of eager ops into the
        cold-start compile storm (VERDICT r4 item 6)."""
        from vina_slam_tpu.estimation.ekf import midpoint_arrays
        from vina_slam_tpu.pipeline import init_fused

        cfg = self.cfg
        W = self.W
        params_orig = self.params
        params_relax = self.params._replace(
            min_eigen_value=jnp.asarray(0.02, jnp.float32),
            plane_thre=jnp.full(4, 0.25, jnp.float32))
        converge_flag = 0
        converge_thre = 0.05
        is_degrade = True
        gvec = None
        eigvalue = np.zeros(3)

        # one-time stacked inputs: window clouds, backward-deskew interval
        # arrays (IMU-only, state-independent), preint midpoint arrays
        from vina_slam_tpu.core.constants import IMU_BUCKET
        dsk = [init_fused.backward_deskew_arrays(self.vec_imus[i],
                                                 self.beg_times[i])
               for i in range(W)]
        dsk_arr = [jnp.asarray(np.stack([d[k] for d in dsk]))
                   for k in range(5)]
        pm = [midpoint_arrays(self.vec_imus[i], bucket=IMU_BUCKET)
              for i in range(1, W)]
        pm_arr = [jnp.asarray(np.stack([p[k] for p in pm]))
                  for k in range(4)]

        (pts_st, rel_st, valid_st, states, pre_st, covs) = (
            init_fused.stack_inputs(tuple(self.pl_origs), tuple(self.x_buf),
                                    tuple(self.pre_buf)))
        win_pts = None
        consts = (jnp.asarray(cfg.local_ba.imu_coef),
                  jnp.asarray(self.noise_meas), jnp.asarray(self.noise_walk),
                  jnp.asarray(cfg.ext_R, jnp.float64),
                  jnp.asarray(cfg.ext_p, jnp.float64),
                  jnp.asarray(float(self.imupre_scale_gravity)))

        for round_i in range(10):
            self.stats.init_rounds += 1
            params = params_orig if converge_flag == 1 else params_relax
            (new_states, new_pre, win_pts_r, r0d, r1d, gv, eigd,
             n_valid) = init_fused.init_round(
                states, pre_st, pts_st, rel_st, valid_st, *dsk_arr, *pm_arr,
                params, *consts, ms=self.ms, W=W,
                Vmax=cfg.tpu.max_voxels_ba,
                point_notime=bool(cfg.odometry.point_notime))
            # the round re-deskewed the clouds BEFORE the voxel check, like
            # the reference (initialization.cpp:217's break keeps them)
            win_pts = win_pts_r
            if int(n_valid) < 10:
                break
            states, pre_st, gvec = new_states, new_pre, gv
            r0, r1 = float(r0d), float(r1d)
            if self.verbose:
                print(f"  [init r{round_i}] voxels={int(n_valid)} "
                      f"res {r0:.5g}->{r1:.5g} "
                      f"rel={abs(r0-r1)/max(abs(r0),1e-30):.4f} "
                      f"|g|={float(jnp.linalg.norm(gvec)):.3f} "
                      f"flag={converge_flag}", flush=True)
            if abs(r0 - r1) / max(abs(r0), 1e-30) < converge_thre and round_i >= 2:
                eigvalue = np.asarray(eigd)
                is_degrade = eigvalue[0] < 15
                if self.verbose:
                    print(f"  [init r{round_i}] converged: nnt eig={eigvalue}",
                          flush=True)
                converge_thre = 0.01
                if converge_flag == 0:
                    states = init_fused.align_states(states)
                    gvec = states.g[0]
                    converge_flag = 1
                    continue
                else:
                    break

        self.params = params_orig
        gnm = float(jnp.linalg.norm(self.x_buf[0].g)) if gvec is None else float(
            jnp.linalg.norm(gvec))
        if is_degrade or not (9.6 <= gnm <= 10.0):
            return False

        for k in range(W):
            self.x_buf[k] = self.x_buf[k]._replace(
                R=states.R[k], p=states.p[k], v=states.v[k],
                bg=states.bg[k], ba=states.ba[k], g=states.g[k])
        self.pre_buf = [jax.tree_util.tree_map(lambda a, i=i: a[i], pre_st)
                        for i in range(W - 1)]
        self.win_pts = win_pts
        self.win_valid = valid_st
        self.x_curr = self.x_buf[W - 1]
        # give the window clouds real covariances for the first margi
        o = cfg.odometry
        self.win_var = init_fused.init_win_var(
            self.win_pts, states.R, states.p, covs, o.dept_err, o.beam_err)
        # refresh the trajectory with the initialized poses
        for k in range(W):
            idx = len(self.traj) - W + k
            self.traj[idx] = [float(self.x_buf[k].t), np.asarray(self.x_buf[k].R),
                              np.asarray(self.x_buf[k].p), self.traj[idx][3]]
        return True

    def _post_init_finalize(self, cond_imu):
        """After init success the reference falls through to the
        win_count >= win_size branch in the same loop pass
        (local_mapping.cpp:373-376 -> 489)."""
        out = self._map_update_and_ba(cond_imu)
        # same output contract as _steady_step so consumers need not
        # special-case the first post-init frame
        out.update(
            pose_R=np.asarray(self.x_curr.R), pose_p=np.asarray(self.x_curr.p),
            t=float(self.x_curr.t), degenerate=False, match_num=-1,
            nnt_min=float("nan"))
        return out

    # --------------------------------------------------------------- output
    def sync(self):
        """Block until all queued device work completes (timing fences)."""
        if self._fused is not None:
            jax.block_until_ready(self._fused.traj_head)
        else:
            jax.block_until_ready(self.x_curr.p)

    def trajectory(self) -> np.ndarray:
        """(N, 8) TUM-style array from the (BA-refined) path store."""
        self.drain_traj()
        rows = []
        from vina_slam_tpu.platform.io import rot_to_quat
        for t, R, p, *_ in self.traj:
            q = rot_to_quat(R)
            rows.append([t, p[0], p[1], p[2], q[0], q[1], q[2], q[3]])
        return np.asarray(rows)

    def last_session_start(self) -> int:
        """Trajectory-row index where the current (post-last-reset) session
        begins; 0 if no reset ever fired. Rows before it live in a
        different, arbitrarily rebased world frame."""
        self.drain_traj()
        return self.stats.session_starts[-1] if self.stats.session_starts else 0

    def degenerate_flags(self) -> np.ndarray:
        """Per-scan geometric-degeneracy verdicts aligned with trajectory()
        rows (the reference's IEKF lambda_min(nnt) < 14 check,
        odometry.cpp:244-254) — preserved through the fused traj ring."""
        self.drain_traj()
        return np.asarray([bool(r[3]) if len(r) > 3 else False
                           for r in self.traj])
