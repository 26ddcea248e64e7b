"""Degenerate-geometry safety machinery, end-to-end (VERDICT r2 item 4).

A corridor world (synth.corridor_world — the config/compus_elevator.yaml
regime) starves lambda_min(sum n n^T) along the corridor axis once the
lobby's back wall leaves sensor range. These tests prove, on the full
pipeline: (a) the per-scan degeneracy verdict fires (odometry.cpp:244-254),
(b) the degrade counter climbs (local_mapping.cpp:413-423), (c) the
config-gated system reset fires in fused mode (the reference's disabled
`if (0)` branch, local_mapping.cpp:474-487), and (d) distance-based
eviction runs INSIDE the fused loop on a long run with bounded occupancy
(local_mapping.cpp:317-344; threshold shrunk via tpu.evict_dist so the CPU
test stays small — scripts/degenerate_runs.py drives the real 700 m on
TPU)."""

import numpy as np
import pytest

from vina_slam_tpu.core.config import SlamConfig
from vina_slam_tpu.pipeline.runner import SlamRunner
from vina_slam_tpu.sensor import synth


def corridor_cfg(use_vnc=1, evict_dist=700.0):
    cfg = SlamConfig()
    cfg.odometry.voxel_size = 1.0
    cfg.odometry.down_size = 0.1
    cfg.odometry.use_vnc = use_vnc
    cfg.local_ba.win_size = 10
    cfg.local_ba.max_layer = 2
    cfg.local_ba.plane_eigen_value_thre = [4.0, 4.0, 4.0, 4.0]
    cfg.local_ba.imu_coef = 2e-4
    cfg.general.if_BA = 1
    cfg.tpu.map_capacity = 1 << 15
    cfg.tpu.fix_pool_capacity = 1 << 15
    cfg.tpu.max_voxels_ba = 1024
    cfg.tpu.max_new_voxels = 1024
    cfg.tpu.evict_dist = evict_dist
    return cfg


def corridor_frames(dur=8.0, speed=8.0, max_range=25.0, seed=4):
    length = speed * dur + 40.0
    patches = synth.corridor_world(length=length)
    traj = synth.LinearTrajectory(speed=speed)
    return synth.simulate_sequence(
        duration=dur, traj=traj, patches=patches, n_az=180, n_el=12,
        noise=0.005, imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=seed,
        max_range=max_range)


@pytest.mark.slow
def test_corridor_degeneracy_detected_and_reset_fires():
    """Down the corridor, out of range of any x-facing plane: the verdict
    flags frames degenerate, the counter climbs past the bound, and the
    config-gated reset fires (fused mode)."""
    frames, gts = corridor_frames()
    cfg = corridor_cfg(use_vnc=1)
    cfg.odometry.degrade_bound = 5
    runner = SlamRunner(cfg, npad_map=4096, enable_degrade_reset=True,
                        fetch_every=8)
    peak = 0
    for f in frames:
        runner.process_frame(f)
        peak = max(peak, runner.stats.degrade_cnt)
    runner.sync()
    runner.drain_traj()
    peak = max(peak, runner.stats.degrade_cnt)

    flags = runner.degenerate_flags()
    assert np.sum(flags) >= 5, (
        f"expected degenerate frames deep in the corridor, got {np.sum(flags)}")
    assert peak > 5 or runner.stats.resets >= 1, (
        f"degrade counter never climbed (peak={peak})")
    assert runner.stats.resets >= 1, "config-gated reset did not fire"


@pytest.mark.slow
def test_corridor_vnc_vs_plain_rotation():
    """VNC's reason to exist (ReadMe.md:8): with rotation wiggle in a
    corridor, the VNC IEKF's rotation error stays bounded and does not lose
    rotation tracking relative to the plain path. Records both; asserts the
    VNC error is bounded and not dramatically worse than plain."""
    frames, gts = corridor_frames(dur=6.0)

    def rot_rmse(runner):
        from vina_slam_tpu.platform.metrics import associate
        traj = runner.trajectory()
        Rs = [r[1] for r in runner.traj]
        ref_t = np.asarray([t for (t, R, p) in gts])
        ie, ir = associate(traj[:, 0], ref_t)
        errs = []
        for i, j in zip(ie, ir):
            dR = np.asarray(Rs[i]).T @ gts[j][1]
            c = np.clip((np.trace(dR) - 1) / 2, -1, 1)
            errs.append(np.degrees(np.arccos(c)))
        return float(np.sqrt(np.mean(np.square(errs))))

    out = {}
    for name, vnc in (("vnc", 1), ("plain", 0)):
        runner = SlamRunner(corridor_cfg(use_vnc=vnc), npad_map=4096,
                            fetch_every=8)
        for f in frames:
            runner.process_frame(f)
        runner.sync()
        assert not runner.motion_init_flag, f"{name}: init failed in lobby"
        out[name] = rot_rmse(runner)

    # hard bound on VNC rotation error; soft comparative bound vs plain
    assert out["vnc"] < 2.0, f"VNC rotation RMSE too large: {out['vnc']:.3f} deg"
    assert out["vnc"] <= out["plain"] * 1.5 + 0.25, (
        f"VNC ({out['vnc']:.3f} deg) much worse than plain "
        f"({out['plain']:.3f} deg)")


@pytest.mark.slow
def test_long_run_eviction_in_fused_loop():
    """A run whose journey exceeds tpu.evict_dist: eviction executes INSIDE
    the fused step (the 0/1-iteration while_loop), occupancy stays bounded,
    and the pipeline keeps tracking afterwards."""
    import jax.numpy as jnp

    from vina_slam_tpu.mapping import voxel_hash as vh

    dur, speed = 10.0, 8.0
    frames, gts = corridor_frames(dur=dur, speed=speed, max_range=25.0)
    cfg = corridor_cfg(use_vnc=1, evict_dist=30.0)
    runner = SlamRunner(cfg, npad_map=4096, fetch_every=8)
    for f in frames:
        runner.process_frame(f)
    runner.sync()
    assert not runner.motion_init_flag
    runner.drain_traj()
    runner.sync_from_fused()
    assert runner.jour > 30.0, f"journey only {runner.jour:.1f}"

    keys = runner.map.keys
    occ = (keys != vh.EMPTY_KEY)
    stale = occ & (runner.jour - runner.map.jour >= 30.0)
    # eviction ran: nothing older than evict_dist survives (modulo the
    # current tick's in-flight inserts)
    assert int(jnp.sum(stale)) < 64, (
        f"{int(jnp.sum(stale))} stale voxels survived past evict_dist")
    # the trajectory kept advancing after evictions
    traj = runner.trajectory()
    assert traj[-1, 1] > speed * (dur - 2.5), "tracking lost after eviction"


@pytest.mark.slow
def test_stairwell_vnc_tracks_fast_rotation():
    """Third degenerate family (docs/VNCLio_formulation.md:130-194, the
    compus_elevator stair regime): a spiral stairwell ascent at ~60 deg/s
    yaw. Every normal direction is visible but the patches are small and
    close (short point-to-plane lever arms) and the tread pattern aliases
    vertically — exactly where normal-alignment residuals (VNC) add
    rotation information that point-to-plane alone lacks. Asserts the VNC
    pipeline initializes on the ground floor, survives the climb, and keeps
    rotation error bounded."""
    dur, turn_s = 8.0, 6.0
    n_floors = int(np.ceil((dur - 1.5) / turn_s)) + 1
    patches = synth.stairwell_world(n_floors=n_floors)
    traj = synth.HelixTrajectory(turn_s=turn_s, climb=3.0 / turn_s)
    # dome FOV: a narrow spinner starves z-facing voxels inside the shaft
    # (walls intercept the down-rays) and init is correctly rejected
    frames, gts = synth.simulate_sequence(
        duration=dur, traj=traj, patches=patches, n_az=180, n_el=12,
        noise=0.01, imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4,
        max_range=20.0, el_range=(-0.9, 0.9))

    cfg = corridor_cfg(use_vnc=1)
    cfg.odometry.voxel_size = 0.5  # small-patch world: finer voxels
    runner = SlamRunner(cfg, npad_map=4096, fetch_every=8)
    for f in frames:
        runner.process_frame(f)
    runner.sync()
    assert not runner.motion_init_flag, "init never succeeded in the stairwell"
    runner.drain_traj()

    # the static dwell window may be legitimately rejected by the init
    # normal-spread gate (a system_reset rebases the world frame with
    # arbitrary yaw; init under orbital motion can absorb the centripetal
    # acceleration as a small gravity tilt) -> score the final session:
    # ATE SE(3)-aligned, rotation as RPE (invariant to any fixed world
    # offset, so it measures tracking rather than the init frame)
    from vina_slam_tpu.platform.metrics import (associate, ate_rmse,
                                                rot_rpe_rmse_deg)
    s0 = runner.last_session_start()
    traj_arr = runner.trajectory()[s0:]
    Rs = [r[1] for r in runner.traj][s0:]
    assert len(traj_arr) >= 25, f"final session too short: {len(traj_arr)}"
    ref_t = np.asarray([t for (t, R, p) in gts])
    ref_p = np.asarray([p for (t, R, p) in gts])
    ie, ir = associate(traj_arr[:, 0], ref_t)
    ate = ate_rmse(traj_arr[ie, 1:4], ref_p[ir])
    rot_rpe = rot_rpe_rmse_deg([Rs[i] for i in ie],
                               [gts[j][1] for j in ir], delta=10)
    assert ate < 0.10, f"stairwell ATE too large: {ate:.3f} m"
    # 60 deg/s of true yaw between RPE endpoints; demand <2 deg error per
    # 1 s relative motion
    assert rot_rpe < 2.0, f"stairwell rotation RPE too large: {rot_rpe:.2f} deg/s"


@pytest.mark.slow
def test_outdoor_flight_tracks_aggressive_motion():
    """Fourth hard regime (config/outdoor_fly.yaml): a banked figure-8 over
    the outdoor yard at up to ~12 m/s and ~45 deg coordinated bank, flown
    above the buildings looking down, on the reference's outdoor parameter
    set (4 m voxels, 0.5 m downsample, degrade_bound 100). Asserts first-
    window init (no resets), bounded SE(3)-aligned ATE, and near-zero
    relative rotation error under ~110 deg/s peak rates."""
    import os

    from vina_slam_tpu.core.config import load_config
    from vina_slam_tpu.platform.metrics import (associate, ate_rmse,
                                                rot_rpe_rmse_deg)
    from vina_slam_tpu.sensor.worldgen import yard_world

    scene = yard_world(seed=7, clutter=150)
    traj = synth.FlightTrajectory()
    frames, gts = synth.simulate_sequence(
        duration=12.0, traj=traj, patches=scene, n_az=180, n_el=12,
        noise=0.01, imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=7,
        max_range=60.0, el_range=(-1.1, 0.2))

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "outdoor_fly.yaml"))
    cfg.tpu.map_capacity = 1 << 15
    cfg.tpu.fix_pool_capacity = 1 << 15
    cfg.tpu.max_voxels_ba = 1024
    cfg.tpu.max_new_voxels = 1024
    runner = SlamRunner(cfg, npad_map=4096, fetch_every=8)
    for f in frames:
        runner.process_frame(f)
    runner.sync()
    assert not runner.motion_init_flag, "flight init failed on the pad"
    runner.drain_traj()
    assert runner.stats.resets == 0, "flight should never reset"

    traj_arr = runner.trajectory()
    Rs = [r[1] for r in runner.traj]
    ref_t = np.asarray([t for (t, R, p) in gts])
    ref_p = np.asarray([p for (t, R, p) in gts])
    ie, ir = associate(traj_arr[:, 0], ref_t)
    ate = ate_rmse(traj_arr[ie, 1:4], ref_p[ir])
    rpe = rot_rpe_rmse_deg([Rs[i] for i in ie], [gts[j][1] for j in ir],
                           delta=10)
    # measured on CPU: ate=0.052 m, rot_rpe=0.103 deg/s (120 frames)
    assert ate < 0.15, f"flight ATE too large: {ate:.3f} m"
    assert rpe < 1.0, f"flight rotation RPE too large: {rpe:.2f} deg/s"


@pytest.mark.slow
def test_sparse_world_init_rejected_like_reference():
    """Root-cause regression for the sparse-scan 'divergence' (round-2
    verdict item 10, the BENCH_NAZ=96 NEL=8 -> 14 m ATE gotcha): at that
    density the ~8 m room yields only ~80 planar voxels whose normals
    cluster around two directions, so the init normal-spread eigenvalue
    lambda_min(sum n n^T) lands below the reference's hard gate of 15
    (initialization.cpp:285) and initialization must be REJECTED with a
    teardown + system reset (the red 'gravity direction degrade' branch,
    initialization.cpp:312-322 -> local_mapping.cpp:377-389). The 14 m ATE
    came from scoring a trajectory that never initialized — not from
    steady-state divergence. This pins the rejection-loop behavior."""
    frames, _ = synth.simulate_sequence(
        duration=1.1, n_az=96, n_el=8, noise=0.005,
        imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4)
    cfg = corridor_cfg()
    runner = SlamRunner(cfg, npad_map=4096, verbose=True)
    for f in frames:
        runner.process_frame(f)

    # one full window was collected, motion_init ran its relax->tighten
    # rounds, rejected the window, and reset the system
    assert runner.motion_init_flag, "sparse world must NOT initialize"
    assert runner.stats.resets >= 1, "rejection must trigger system_reset"
    assert runner.stats.init_rounds >= 3, "the 10-round loop must have run"
