"""Golden-trajectory integration test: the full pipeline (init -> VNC
odometry -> windowed BA -> marginalization) on a synthetic world, compared
against ground truth (the SURVEY.md section 4 strategy — headless replay,
no ROS)."""

import numpy as np
import pytest

from vina_slam_tpu.core.config import SlamConfig
from vina_slam_tpu.pipeline.runner import SlamRunner
from vina_slam_tpu.platform.metrics import ate_rmse
from vina_slam_tpu.sensor import synth


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


@pytest.mark.slow
def test_e2e_synthetic_ate():
    frames, gts = synth.simulate_sequence(
        duration=4.0, n_az=180, n_el=12, noise=0.005,
        imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4)
    assert len(frames) >= 30

    runner = SlamRunner(small_cfg(), npad_map=8192)
    outs = []
    for f in frames:
        out = runner.process_frame(f)
        outs.append(out)

    assert not runner.motion_init_flag, "initialization must succeed"
    traj = runner.trajectory()
    assert traj.shape[0] >= 30

    # compare against ground truth via nearest-time association
    from vina_slam_tpu.platform.metrics import associate
    ref_t = np.asarray([t for (t, R, p) in gts])
    ref_p = np.asarray([p for (t, R, p) in gts])
    ie, ir = associate(traj[:, 0], ref_t)
    assert len(ie) >= 20
    err = ate_rmse(traj[ie, 1:4], ref_p[ir])
    # synthetic world, mild motion: sub-5cm ATE expected
    assert err < 0.05, f"ATE RMSE {err:.4f} m too large"


@pytest.mark.slow
def test_e2e_three_factor_ba():
    """Same sequence through the 3-factor BA overload (lidar + NORMAL + IMU,
    optimizers.cpp:519-594) selected via LocalBA.use_normal, max_iter=3."""
    frames, gts = synth.simulate_sequence(
        duration=3.0, n_az=180, n_el=12, noise=0.005,
        imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4)

    cfg = small_cfg()
    cfg.local_ba.use_normal = 1
    runner = SlamRunner(cfg, npad_map=8192)
    for f in frames:
        runner.process_frame(f)

    assert not runner.motion_init_flag, "initialization must succeed"
    traj = runner.trajectory()
    from vina_slam_tpu.platform.metrics import associate
    ref_t = np.asarray([t for (t, R, p) in gts])
    ref_p = np.asarray([p for (t, R, p) in gts])
    ie, ir = associate(traj[:, 0], ref_t)
    err = ate_rmse(traj[ie, 1:4], ref_p[ir])
    assert err < 0.05, f"3-factor BA ATE RMSE {err:.4f} m too large"


@pytest.mark.slow
def test_e2e_point_notime():
    """Snapshot-sensor (TartanAir-style) sequence: span=0 scans, frame times
    synthesized from inter-frame gaps (sync.cpp:43-56), NO per-point deskew
    (imu_ekf.cpp:108). Round-3 regression pinned here: the fused steady path
    deskewed rel_time=0 points by the full inter-frame motion (9.8 m ATE on
    the tartanair profile, PARITY_RUNS round 3), and the modular notime
    branch double-applied the extrinsic — so this runs with a NON-identity
    extrinsic."""
    from vina_slam_tpu.sensor.sync import FrameAssembler

    ext_R = np.asarray(
        [[0.9992, -0.0400, 0.0], [0.0400, 0.9992, 0.0], [0.0, 0.0, 1.0]])
    # re-orthonormalize the hand-rounded rotation
    u, _, vt = np.linalg.svd(ext_R)
    ext_R = u @ vt
    ext_p = np.asarray([0.05, -0.02, 0.03])

    events, gts = synth.simulate_events(
        duration=4.0, n_az=180, n_el=12, noise=0.005,
        imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4,
        ext_R=ext_R, ext_p=ext_p, span=0.0)
    asm = FrameAssembler(point_notime=True)
    frames = []
    for ev in events:
        if ev[0] == "imu":
            asm.push_imu(ev[1], ev[2], ev[3])
        else:
            asm.push_scan(ev[1])
        f = asm.try_assemble()
        if f is not None:
            frames.append(f)
    assert len(frames) >= 30

    cfg = small_cfg()
    cfg.odometry.point_notime = 1
    cfg.general.extrinsic_rota = ext_R.reshape(-1).tolist()
    cfg.general.extrinsic_tran = ext_p.tolist()
    runner = SlamRunner(cfg, npad_map=8192)
    for f in frames:
        runner.process_frame(f)

    assert not runner.motion_init_flag, "initialization must succeed"
    traj = runner.trajectory()
    from vina_slam_tpu.platform.metrics import associate
    ref_t = np.asarray([t for (t, R, p) in gts])
    ref_p = np.asarray([p for (t, R, p) in gts])
    ie, ir = associate(traj[:, 0], ref_t)
    assert len(ie) >= 20
    err = ate_rmse(traj[ie, 1:4], ref_p[ir])
    assert err < 0.05, f"point_notime ATE RMSE {err:.4f} m too large"


@pytest.mark.slow
def test_e2e_plain_iekf():
    """Same sequence through the plain (non-VNC, 20-iteration) IEKF path
    selected via Odometry.use_vnc=0 (odometry.cpp:64-68: the reference
    exposes LioStateEstimation(pptr, use_vnc) with both budgets)."""
    frames, gts = synth.simulate_sequence(
        duration=3.0, n_az=180, n_el=12, noise=0.005,
        imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4)

    cfg = small_cfg()
    cfg.odometry.use_vnc = 0
    runner = SlamRunner(cfg, npad_map=8192)
    for f in frames:
        runner.process_frame(f)

    assert not runner.motion_init_flag, "initialization must succeed"
    traj = runner.trajectory()
    from vina_slam_tpu.platform.metrics import associate
    ref_t = np.asarray([t for (t, R, p) in gts])
    ref_p = np.asarray([p for (t, R, p) in gts])
    ie, ir = associate(traj[:, 0], ref_t)
    err = ate_rmse(traj[ie, 1:4], ref_p[ir])
    assert err < 0.05, f"plain-IEKF ATE RMSE {err:.4f} m too large"
