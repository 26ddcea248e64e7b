"""Ours-vs-REFERENCE trajectory parity (BASELINE.md's actual accuracy
metric): replay the same synthetic sequence through

  (a) the compiled reference pipeline (csrc/refpipe: the UNMODIFIED
      odometry.cpp + initialization.cpp + local_mapping.cpp main loop,
      writing its own TUM via FileReaderWriter), and
  (b) our SlamRunner,

then score each against ground truth and against each other. The refpipe
binary consumes pre-decoded clouds (decoder parity is pinned separately by
csrc/decode.cpp + tests/test_sensor.py).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ref_replay.py \
           [profile ...]   (default: a built-in small config + 3 profiles)
Writes PARITY_REF.md.
"""

import os
import struct
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFPIPE = os.path.join(HERE, "csrc", "refpipe")
TMP = "/tmp/refpipe"


def write_events(path, events):
    with open(path, "wb") as f:
        f.write(b"VREF1\n")
        for ev in events:
            if ev[0] == "imu":
                _, t, gyr, acc = ev
                f.write(b"I")
                f.write(struct.pack("<d", float(t)))
                f.write(struct.pack("<3d", *np.asarray(gyr, float)))
                f.write(struct.pack("<3d", *np.asarray(acc, float)))
            else:
                scan = ev[1]
                pts = np.asarray(scan.pts, np.float32)
                rel = np.asarray(scan.rel_time, np.float32)
                order = np.argsort(rel, kind="stable")  # back() must be max
                pts, rel = pts[order], rel[order]
                f.write(b"S")
                f.write(struct.pack("<d", float(scan.stamp)))
                f.write(struct.pack("<i", pts.shape[0]))
                buf = np.concatenate([pts, rel[:, None]], axis=1)
                f.write(buf.astype("<f4").tobytes())


def write_params(path, cfg, out_dir):
    g, o, lb = cfg.general, cfg.odometry, cfg.local_ba
    lines = [
        ("General.bagname", "str", "refpipe"),
        ("General.save_path", "str", out_dir + "/session/"),
        ("General.lidar_type", "int", int(g.lidar_type)),
        ("General.blind", "double", float(g.blind)),
        ("General.point_filter_num", "int", int(g.point_filter_num)),
        ("General.extrinsic_tran", "vec",
         ",".join(str(v) for v in np.asarray(cfg.ext_p).ravel())),
        ("General.extrinsic_rota", "vec",
         ",".join(str(v) for v in np.asarray(cfg.ext_R).ravel())),
        ("General.is_save_map", "int", 0),
        ("General.is_save_pose", "int", 1),
        ("General.pose_save_path", "str", out_dir + "/"),
        ("General.pose_filename", "str", "ref.tum"),
        ("General.if_BA", "int", int(cfg.general.if_BA)),
        ("General.enable_visualization", "int", 0),
        ("Odometry.cov_gyr", "double", float(o.cov_gyr)),
        ("Odometry.cov_acc", "double", float(o.cov_acc)),
        ("Odometry.rdw_gyr", "double", float(o.rdw_gyr)),
        ("Odometry.rdw_acc", "double", float(o.rdw_acc)),
        ("Odometry.down_size", "double", float(o.down_size)),
        ("Odometry.dept_err", "double", float(o.dept_err)),
        ("Odometry.beam_err", "double", float(o.beam_err)),
        ("Odometry.voxel_size", "double", float(o.voxel_size)),
        ("Odometry.min_eigen_value", "double", float(o.min_eigen_value)),
        ("Odometry.degrade_bound", "int", int(o.degrade_bound)),
        ("Odometry.point_notime", "int", int(o.point_notime)),
        ("LocalBA.win_size", "int", int(lb.win_size)),
        ("LocalBA.max_layer", "int", int(lb.max_layer)),
        ("LocalBA.cov_gyr", "double", float(lb.cov_gyr)),
        ("LocalBA.cov_acc", "double", float(lb.cov_acc)),
        ("LocalBA.rdw_gyr", "double", float(lb.rdw_gyr)),
        ("LocalBA.rdw_acc", "double", float(lb.rdw_acc)),
        ("LocalBA.min_ba_point", "int", int(lb.min_ba_point)),
        ("LocalBA.plane_eigen_value_thre", "vec",
         ",".join(str(float(v)) for v in lb.plane_eigen_value_thre)),
        ("LocalBA.imu_coef", "double", float(lb.imu_coef)),
        ("LocalBA.thread_num", "int", 2),
    ]
    with open(path, "w") as f:
        for n, t, v in lines:
            f.write(f"{n} {t} {v}\n")


def load_tum(path):
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 4:
                rows.append([float(parts[0]), float(parts[1]),
                             float(parts[2]), float(parts[3])])
    return np.asarray(rows)


def run_one(name, cfg, duration=8.0, n_az=180, n_el=12, seed=4):
    from vina_slam_tpu.sensor import synth

    events, gts = synth.simulate_events(
        duration=duration, n_az=n_az, n_el=n_el, noise=0.005,
        imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=seed,
        ext_R=cfg.ext_R, ext_p=cfg.ext_p,
        span=0.0 if cfg.odometry.point_notime else None)
    return run_events(name, cfg, events, gts)


def run_events(name, cfg, events, gts, npad=8192):
    from vina_slam_tpu.pipeline.runner import SlamRunner
    from vina_slam_tpu.platform.metrics import associate, ate_rmse
    from vina_slam_tpu.sensor.sync import FrameAssembler

    os.makedirs(TMP, exist_ok=True)
    out_dir = os.path.join(TMP, name)
    os.makedirs(out_dir, exist_ok=True)

    ev_path = os.path.join(out_dir, "events.bin")
    par_path = os.path.join(out_dir, "params.txt")
    write_events(ev_path, events)
    write_params(par_path, cfg, out_dir)

    # ---- (a) the compiled reference pipeline ----
    tum_path = os.path.join(out_dir, "ref.tum")
    if os.path.exists(tum_path):
        os.remove(tum_path)
    t0 = time.perf_counter()
    proc = subprocess.run([REFPIPE, ev_path, par_path], cwd=out_dir,
                          capture_output=True, text=True, timeout=1800)
    ref_s = time.perf_counter() - t0
    sys.stderr.write(proc.stderr[-2000:] + "\n")
    ref_traj = load_tum(tum_path) if os.path.exists(tum_path) else np.zeros((0, 4))

    # ---- (b) ours, from the same events ----
    asm = FrameAssembler(point_notime=bool(cfg.odometry.point_notime))
    frames = []
    for ev in events:
        if ev[0] == "imu":
            asm.push_imu(ev[1], ev[2], ev[3])
        else:
            asm.push_scan(ev[1])
        fr = asm.try_assemble()
        if fr is not None:
            frames.append(fr)
    runner = SlamRunner(cfg, npad_map=npad)
    t0 = time.perf_counter()
    for fr in frames:
        runner.process_frame(fr)
    runner.sync()
    ours_s = time.perf_counter() - t0
    ours = runner.trajectory()  # (N, >=4): t x y z ...

    ref_t, ref_p = np.asarray([t for (t, R, p) in gts]), np.asarray(
        [p for (t, R, p) in gts])

    def vs_gt(traj):
        if traj.shape[0] < 3:
            return float("nan"), 0
        ie, ir = associate(traj[:, 0], ref_t)
        if len(ie) < 3:
            return float("nan"), 0
        return ate_rmse(traj[ie, 1:4], ref_p[ir]), len(ie)

    ate_ref, n_ref = vs_gt(ref_traj)
    ate_ours, n_ours = vs_gt(ours)

    # direct trajectory diff: ours vs reference at associated stamps
    if ref_traj.shape[0] >= 3 and ours.shape[0] >= 3:
        ie, ir = associate(ours[:, 0], ref_traj[:, 0])
        ate_cross = ate_rmse(ours[ie, 1:4], ref_traj[ir, 1:4]) if len(ie) >= 3 else float("nan")
        n_cross = len(ie)
    else:
        ate_cross, n_cross = float("nan"), 0

    row = dict(profile=name, frames=len(frames),
               ref_rows=int(ref_traj.shape[0]), our_rows=int(ours.shape[0]),
               ate_ref_mm=round(ate_ref * 1e3, 2),
               ate_ours_mm=round(ate_ours * 1e3, 2),
               ate_cross_mm=round(ate_cross * 1e3, 2),
               n_assoc=n_cross, ref_s=round(ref_s, 1), ours_s=round(ours_s, 1))
    print(row, flush=True)
    return row


def bench_style_cfg():
    from vina_slam_tpu.core.config import SlamConfig

    cfg = SlamConfig()
    cfg.odometry.voxel_size = 1.0
    cfg.odometry.down_size = 0.1
    cfg.local_ba.win_size = 10
    cfg.local_ba.max_layer = 2
    cfg.local_ba.plane_eigen_value_thre = [4.0, 4.0, 4.0, 4.0]
    cfg.local_ba.imu_coef = 2e-4
    cfg.general.if_BA = 1
    cfg.tpu.map_capacity = 1 << 16
    cfg.tpu.fix_pool_capacity = 1 << 16
    cfg.tpu.max_voxels_ba = 2048
    return cfg


def run_scenario(kind):
    """Hard-regime replays (VERDICT r4 item 5): same worlds/trajectories as
    scripts/degenerate_runs.py, where ATE sits well above the simulator
    noise floor — the regimes that stress the reference's init gates
    (initialization.cpp:285,302-323) and degeneracy verdict
    (odometry.cpp:244-254)."""
    from vina_slam_tpu.core.config import load_config
    from vina_slam_tpu.sensor import synth

    if kind == "corridor":
        speed, dur = 8.0, 10.0
        patches = synth.corridor_world(length=speed * dur + 40.0)
        traj = synth.LinearTrajectory(speed=speed)
        events, gts = synth.simulate_events(
            duration=dur, traj=traj, patches=patches, n_az=180, n_el=12,
            noise=0.005, imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4,
            max_range=30.0)
        return run_events("corridor(80m)", bench_style_cfg(), events, gts)
    if kind == "stairwell":
        dur, turn_s = 14.0, 6.0
        n_floors = int(np.ceil((dur - 1.5) / turn_s)) + 1
        patches = synth.stairwell_world(n_floors=n_floors)
        traj = synth.HelixTrajectory(turn_s=turn_s, climb=3.0 / turn_s)
        events, gts = synth.simulate_events(
            duration=dur, traj=traj, patches=patches, n_az=180, n_el=12,
            noise=0.01, imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4,
            max_range=20.0, el_range=(-0.9, 0.9))
        cfg = bench_style_cfg()
        cfg.odometry.voxel_size = 0.5  # small-patch world: finer voxels
        return run_events("stairwell(60dps)", cfg, events, gts)
    if kind == "flight":
        from vina_slam_tpu.sensor.worldgen import yard_world
        scene = yard_world(seed=7, clutter=150)
        traj = synth.FlightTrajectory()
        events, gts = synth.simulate_events(
            duration=12.0, traj=traj, patches=scene, n_az=180, n_el=12,
            noise=0.01, imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=7,
            max_range=60.0, el_range=(-1.1, 0.2))
        cfg = load_config(os.path.join(HERE, "configs", "outdoor_fly.yaml"))
        cfg.tpu.map_capacity = 1 << 16
        cfg.tpu.fix_pool_capacity = 1 << 16
        cfg.tpu.max_voxels_ba = 2048
        return run_events("flight(12mps)", cfg, events, gts)
    if kind == "long60":
        # 60 s duration on the benign room: drift accumulation over 600
        # frames, an order longer than the 8 s standard rows
        return run_one("long60", bench_style_cfg(), duration=60.0)
    raise ValueError(kind)


SCENARIOS = ("corridor", "stairwell", "flight", "long60")


def main():
    from vina_slam_tpu.core.config import load_config

    names = sys.argv[1:]
    rows = []
    if not names:
        # the bench-style small config first (known-good init envelope)
        rows.append(run_one("small", bench_style_cfg()))
        names = ["velodyne", "compus_elevator", "tartanair"]
    for prof in names:
        if prof in SCENARIOS:
            rows.append(run_scenario(prof))
            continue
        cfg = load_config(os.path.join(HERE, "configs", prof + ".yaml"))
        cfg.tpu.map_capacity = 1 << 16
        cfg.tpu.fix_pool_capacity = 1 << 16
        cfg.tpu.max_voxels_ba = 2048
        cfg.general.blind = min(cfg.general.blind, 0.5)
        rows.append(run_one(prof, cfg))

    out_md = os.path.join(HERE, "PARITY_REF.md")
    append = os.environ.get("REF_REPLAY_APPEND", "0") == "1"
    with open(out_md, "a" if append else "w") as f:
        if not append:
            f.write(
                "# PARITY_REF — ours vs the COMPILED reference pipeline\n\n"
                "The reference's own main loop (`thd_odometry_localmapping` "
                "+\n"
                "`initialization` + `odometry`, compiled UNMODIFIED from\n"
                "`/root/reference/src` by `csrc/Makefile` target `refpipe`)\n"
                "replays the same synthetic events our runner consumes and\n"
                "writes its TUM trajectory via its own `FileReaderWriter`.\n"
                "ATE columns: each pipeline vs simulator ground truth, plus "
                "the\n"
                "direct ours-vs-reference trajectory RMSE at associated\n"
                "stamps. `ref s` / `ours s` are whole-replay wall times; "
                "ours\n"
                "INCLUDES one-time jit compilation (cold start), so it is "
                "NOT\n"
                "a steady-state throughput comparison — bench.py is.\n\n"
                "| profile | frames | ref rows | our rows | ref vs GT (mm) | "
                "ours vs GT (mm) | ours vs ref (mm) | assoc | ref s | "
                "ours s* |\n"
                "|---|---|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['profile']} | {r['frames']} | {r['ref_rows']} "
                    f"| {r['our_rows']} | {r['ate_ref_mm']} "
                    f"| {r['ate_ours_mm']} | {r['ate_cross_mm']} "
                    f"| {r['n_assoc']} | {r['ref_s']} | {r['ours_s']} |\n")
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
