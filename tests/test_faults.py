"""Fault-injection robustness (SURVEY §5.3 notes the reference has NO fault
injection anywhere — this suite exceeds it): corrupt the sensor stream
mid-sequence and assert the pipeline degrades gracefully (recoverable
exception, skipped frame, or degrade verdict) and then RECOVERS — never
NaNs, never silent state corruption.

Fault surfaces under test:
  - IMU gap       -> FrameAssembler coverage wait / >4-sample gate
                     (sync.cpp:87-95) and the EKF's consume-always cursor
  - stamp jitter  -> interval builder robustness (imu_ekf.cpp:33-62)
  - accel saturation -> degrade counter climbs, recovery after the burst
  - scan dropout  -> longer propagation interval, no LidarTimeRegression
"""

import numpy as np
import pytest

from vina_slam_tpu.core.config import SlamConfig
from vina_slam_tpu.pipeline.runner import SlamRunner
from vina_slam_tpu.platform.metrics import associate, ate_rmse
from vina_slam_tpu.sensor import synth
from vina_slam_tpu.sensor.sync import FrameAssembler


def small_cfg():
    cfg = SlamConfig()
    cfg.odometry.voxel_size = 1.0
    cfg.odometry.down_size = 0.1
    cfg.odometry.min_eigen_value = 0.0025
    cfg.local_ba.win_size = 10
    cfg.local_ba.max_layer = 2
    cfg.local_ba.plane_eigen_value_thre = [4.0, 4.0, 4.0, 4.0]
    cfg.local_ba.imu_coef = 2e-4
    cfg.general.if_BA = 1
    cfg.tpu.map_capacity = 1 << 15
    cfg.tpu.fix_pool_capacity = 1 << 16
    cfg.tpu.max_voxels_ba = 1024
    cfg.tpu.max_new_voxels = 2048
    return cfg


def base_events(duration=4.0, seed=4):
    return synth.simulate_events(
        duration=duration, n_az=180, n_el=12, noise=0.005,
        imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=seed)


def run_events(events, cfg=None, expect_frames=25):
    """Assemble + run; returns (runner, frames, n_skipped_frames)."""
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
    assert len(frames) >= expect_frames
    runner = SlamRunner(cfg or small_cfg(), npad_map=8192)
    for f in frames:
        runner.process_frame(f)
    runner.sync()
    return runner, frames


def final_ate(runner, gts):
    traj = runner.trajectory()
    ref_t = np.asarray([t for (t, R, p) in gts])
    ref_p = np.asarray([p for (t, R, p) in gts])
    ie, ir = associate(traj[:, 0], ref_t)
    assert len(ie) >= 10
    return ate_rmse(traj[ie, 1:4], ref_p[ir])


def assert_state_finite(runner):
    assert np.isfinite(np.asarray(runner.x_curr.p)).all()
    assert np.isfinite(np.asarray(runner.x_curr.R)).all()
    assert np.isfinite(runner.trajectory()).all()


@pytest.mark.slow
def test_imu_gap_recovers():
    """Drop ALL IMU samples in a 0.25 s mid-sequence window (after init).
    The assembler's coverage wait merges the gap frame's samples into the
    next frame; the EKF integrates across the hole. The run must continue
    and end at mm-to-cm accuracy."""
    events, gts = base_events()
    t_all = [ev[1] for ev in events if ev[0] == "imu"]
    t0 = t_all[0] + 3.0  # well past init
    out = [ev for ev in events
           if not (ev[0] == "imu" and t0 <= ev[1] < t0 + 0.25)]
    runner, frames = run_events(out)
    assert not runner.motion_init_flag
    assert_state_finite(runner)
    err = final_ate(runner, gts)
    assert err < 0.05, f"ATE after IMU gap {err:.4f} m"


@pytest.mark.slow
def test_imu_stream_death_stalls_not_fabricates():
    """Killing the IMU stream mid-sequence must make the assembler STALL
    (coverage wait: no frame is ever fabricated without IMU spanning it —
    sync.cpp:62-64's `imu_last_time <= pcl_end_time` gate), not emit
    partial frames; and the direct underflow edge raises the typed
    ImuStreamDry instead of the reference's exit(0) (sync.cpp:80-83)."""
    from vina_slam_tpu.sensor.sync import ImuStreamDry

    events, _ = base_events(duration=2.0)
    t_all = [ev[1] for ev in events if ev[0] == "imu"]
    t_cut = t_all[0] + 2.2
    asm = FrameAssembler()
    n_before = n_after = 0
    for ev in events:
        if ev[0] == "imu":
            if ev[1] >= t_cut:
                continue
            asm.push_imu(ev[1], ev[2], ev[3])
        else:
            asm.push_scan(ev[1])
        while asm.try_assemble() is not None:
            if ev[0] == "imu" and ev[1] < t_cut - 0.2:
                n_before += 1
            else:
                n_after += 1
    # frames stop near the cut; nothing is fabricated past it
    assert n_before >= 8
    assert n_after <= 3
    assert asm._pending is not None or asm._scans  # work is parked, not lost

    # the underflow edge itself (deque drained while coverage claimed):
    # reachable only through reordered driver input, so construct it
    asm2 = FrameAssembler()
    asm2.push_imu(0.00, np.zeros(3), np.asarray([0, 0, 1.0]))
    sc = [ev for ev in events if ev[0] == "scan"][0][1]
    asm2.push_scan(sc)
    asm2._imu_last_time = sc.stamp + 10.0  # stale high-water mark
    with pytest.raises(ImuStreamDry):
        asm2.try_assemble()


@pytest.mark.slow
def test_imu_timestamp_jitter():
    """±1.5 ms uniform jitter on every IMU stamp (sorted to stay monotone —
    transport jitter, not reordering). Interval building and deskew must
    absorb it."""
    rng = np.random.default_rng(7)
    events, gts = base_events()
    jittered = []
    for ev in events:
        if ev[0] == "imu":
            jittered.append(("imu", ev[1] + rng.uniform(-0.0015, 0.0015),
                             ev[2], ev[3]))
        else:
            jittered.append(ev)
    # keep the stream monotone like a UDP-reordered-then-sorted driver
    imu_ts = sorted(e[1] for e in jittered if e[0] == "imu")
    k = 0
    out = []
    for ev in jittered:
        if ev[0] == "imu":
            out.append(("imu", imu_ts[k], ev[2], ev[3]))
            k += 1
        else:
            out.append(ev)
    runner, _ = run_events(out)
    assert not runner.motion_init_flag
    assert_state_finite(runner)
    err = final_ate(runner, gts)
    assert err < 0.05, f"ATE under IMU jitter {err:.4f} m"


@pytest.mark.slow
def test_accel_saturation_burst():
    """Clip accelerometer output to a +-1.05 g box for 0.3 s mid-run (sensor
    saturation during a bump). The filter must neither NaN nor reset the
    session; accuracy may degrade during the burst but the end state stays
    bounded."""
    events, gts = base_events()
    t_all = [ev[1] for ev in events if ev[0] == "imu"]
    t0 = t_all[0] + 3.2
    out = []
    for ev in events:
        if ev[0] == "imu" and t0 <= ev[1] < t0 + 0.3:
            acc = np.clip(ev[3], -1.05, 1.05)  # g-units
            out.append(("imu", ev[1], ev[2], acc))
        else:
            out.append(ev)
    runner, _ = run_events(out)
    assert not runner.motion_init_flag
    assert runner.stats.resets == 0
    assert_state_finite(runner)
    err = final_ate(runner, gts)
    assert err < 0.10, f"ATE after saturation burst {err:.4f} m"


@pytest.mark.slow
def test_scan_dropout_recovers():
    """Drop 3 consecutive scans mid-run (sensor hiccup). The next frame's
    propagation interval spans the hole (larger IMU bucket), matching
    resumes against the existing map, and accuracy recovers."""
    events, gts = base_events()
    scan_ts = [ev[1].stamp for ev in events if ev[0] == "scan"]
    drop = set(scan_ts[32:35])
    out = [ev for ev in events
           if not (ev[0] == "scan" and ev[1].stamp in drop)]
    runner, frames = run_events(out, expect_frames=25)
    assert not runner.motion_init_flag
    assert_state_finite(runner)
    err = final_ate(runner, gts)
    assert err < 0.05, f"ATE after scan dropout {err:.4f} m"
