"""PARITY_RUNS protocol: replay a real-format rosbag2 sequence through every
shipped config profile and tabulate ATE/RPE + decoder equivalence.

BASELINE.md's parity protocol calls for replaying recorded sequences through
the 6 shipped configs (config/*.yaml in the reference). This environment has
no network egress, so the sequences are SYNTHETIC but the *formats* are
genuine end-to-end: each sequence is serialized into a real rosbag2 sqlite
bag with CDR-encoded vendor messages (livox CustomMsg / PointCloud2 field
layouts per vendor), then consumed by the production path
(platform/rosbag.replay_rosbag -> vendor decoder -> FrameAssembler ->
SlamRunner), exactly like `cli.py run --bag`.

Per profile this checks:
  * the bag reader + CDR parser against independently written messages,
  * the vendor decoder (incl. native/Python equivalence where the .so is
    built),
  * the full pipeline (init -> VNC IEKF -> BA -> margi) under the profile's
    own voxel/noise/extrinsic parameters,
  * ATE RMSE / RPE vs the synthetic ground truth.

Writes PARITY_RUNS.md. Run on the TPU host: python scripts/parity_runs.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    # cache EVERYTHING: the axon remote compile costs ~0.5 s RTT per
    # program, and the init path dispatches hundreds of small programs
    # that a 5 s write-threshold re-pays on every run
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from vina_slam_tpu.core.config import LIVOX, TARTANAIR, load_config
    from vina_slam_tpu.pipeline.runner import SlamRunner
    from vina_slam_tpu.platform import rosbag, rosbag_write
    from vina_slam_tpu.platform.metrics import associate, ate_rmse, rpe_rmse
    from vina_slam_tpu.sensor import decoders, native, synth

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_dir = os.path.join(here, "configs")
    out_md = os.path.join(here, "PARITY_RUNS.md")
    tmpdir = "/tmp/parity_bags"
    os.makedirs(tmpdir, exist_ok=True)

    duration = float(os.environ.get("PARITY_DURATION", "8.0"))
    only = os.environ.get("PARITY_ONLY", "")
    profiles = sorted(f for f in os.listdir(cfg_dir) if f.endswith(".yaml"))
    if only:
        profiles = [f for f in profiles if f.replace(".yaml", "") in
                    only.split(",")]

    rows = []
    for prof in profiles:
        cfg = load_config(os.path.join(cfg_dir, prof))
        g = cfg.general
        name = prof.replace(".yaml", "")
        print(f"=== {name}: lidar_type={g.lidar_type} "
              f"voxel={cfg.odometry.voxel_size}", flush=True)

        # cap pipeline table sizes for the synthetic world
        cfg.tpu.map_capacity = 1 << 16
        cfg.tpu.fix_pool_capacity = 1 << 16
        cfg.tpu.max_voxels_ba = 2048
        # profile blind radii (e.g. mid360 blind=3.0) assume vehicle-scale
        # scenes; shrink the cull for the ~8 m synthetic room
        g.blind = min(g.blind, 0.5)

        # synthesize with the profile's own extrinsics: scan points come out
        # in the LIDAR frame and the pipeline maps them through ext_R/ext_p
        # point_notime profiles model a snapshot sensor (TartanAir: one
        # depth-camera frame per stamp, no per-point time to deskew with) —
        # cast all columns from the frame-stamp pose (span=0); spinning
        # profiles sweep over 100 ms like the real devices
        events, gts = synth.simulate_events(
            duration=duration, n_az=360, n_el=16, noise=0.005,
            imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4,
            ext_R=cfg.ext_R, ext_p=cfg.ext_p,
            span=0.0 if cfg.odometry.point_notime else None)

        # serialize to a genuine rosbag2 sqlite bag in the vendor format
        scans = [(ev[1].stamp, ev[1].pts, ev[1].rel_time)
                 for ev in events if ev[0] == "scan"]
        imu_t = [ev[1] for ev in events if ev[0] == "imu"]
        imu_gyr = [ev[2] for ev in events if ev[0] == "imu"]
        imu_acc = [ev[3] for ev in events if ev[0] == "imu"]
        bag_path = os.path.join(tmpdir, f"{name}.db3")
        if os.path.exists(bag_path):
            os.remove(bag_path)
        rosbag_write.write_sequence_bag(
            bag_path, cfg, scans, imu_t, imu_gyr, imu_acc)

        # decoder equivalence native-vs-Python on this profile's raw fields
        dec_match = "n/a"
        if native.available() and g.lidar_type not in (LIVOX, TARTANAIR):
            s0 = scans[len(scans) // 2]
            _, fields = rosbag.parse_pointcloud2(
                rosbag_write.scan_to_message(
                    g.lidar_type, s0[1], s0[2], s0[0])[1])
            py = decoders.decode(g.lidar_type, fields, s0[0],
                                 g.point_filter_num, g.blind)
            nat = native.decode(g.lidar_type, fields, s0[0],
                                g.point_filter_num, g.blind)
            dec_match = ("exact" if nat is not None
                         and np.array_equal(py.pts, nat.pts)
                         and np.allclose(py.rel_time, nat.rel_time,
                                         atol=1e-6)
                         else "MISMATCH" if nat is not None else "n/a")

        # full replay through the production bag path
        runner = SlamRunner(cfg, npad_map=8192)
        t0 = time.perf_counter()
        n = 0
        t_prev = t0
        for frame in rosbag.replay_rosbag(bag_path, cfg):
            runner.process_frame(frame)
            n += 1
            if os.environ.get("PARITY_TRACE"):
                runner.sync()
                t_now = time.perf_counter()
                print(f"    [{n:03d}] {t_now - t_prev:6.2f}s "
                      f"init={runner.motion_init_flag} "
                      f"resets={runner.stats.resets} "
                      f"init_rounds={runner.stats.init_rounds}", flush=True)
                t_prev = t_now
        runner.sync()
        elapsed = time.perf_counter() - t0

        init_ok = not runner.motion_init_flag
        ate = rpe = float("nan")
        if init_ok:
            traj = runner.trajectory()
            ref_t = np.asarray([t for (t, R, p) in gts])
            ref_p = np.asarray([p for (t, R, p) in gts])
            ie, ir = associate(traj[:, 0], ref_t)
            if len(ie) >= 3:
                ate = ate_rmse(traj[ie, 1:4], ref_p[ir])
                rpe = rpe_rmse(traj[ie, 1:4], ref_p[ir])
        rows.append(dict(
            profile=name, lidar_type=g.lidar_type, frames=n,
            init="ok" if init_ok else "FAIL",
            ate_mm=round(ate * 1e3, 2), rpe_mm=round(rpe * 1e3, 2),
            scans_per_sec=round(n / elapsed, 2), decoder=dec_match,
            dur_s=round(duration, 1)))
        print(f"    frames={n} init={init_ok} ate={ate*1e3:.2f}mm "
              f"rate={n/elapsed:.2f}/s dec={dec_match}", flush=True)

    # a PARITY_ONLY run merges into the existing table (keyed by profile)
    # so adding one profile doesn't drop the others' recorded rows; each row
    # carries its own duration so merged rows keep the protocol they were
    # actually measured under (split on '|' — no char-class regex)
    if only and os.path.exists(out_md):
        have = {r["profile"] for r in rows}
        with open(out_md) as f:
            for line in f:
                cells = [c.strip() for c in line.split("|")]
                # | profile | type | frames | init | ate | rpe | scans/s
                # | decoder | dur |  -> 11 cells incl. leading/trailing ''
                if len(cells) != 11 or not cells[2].isdigit():
                    continue
                if cells[1] in have:
                    continue
                try:
                    rows.append(dict(
                        profile=cells[1], lidar_type=int(cells[2]),
                        frames=int(cells[3]), init=cells[4],
                        ate_mm=float(cells[5]), rpe_mm=float(cells[6]),
                        scans_per_sec=float(cells[7]), decoder=cells[8],
                        dur_s=float(cells[9])))
                except ValueError:
                    continue
        rows.sort(key=lambda r: r["profile"])

    with open(out_md, "w") as f:
        f.write(
            "# PARITY_RUNS — all shipped config profiles through the real "
            "bag path\n\n"
            "Protocol per BASELINE.md: each profile replayed end-to-end "
            "from a **genuine rosbag2 sqlite bag** with CDR-encoded vendor "
            "messages (livox CustomMsg / per-vendor PointCloud2 layouts), "
            "through `platform/rosbag.replay_rosbag` -> vendor decoder -> "
            "FrameAssembler -> SlamRunner (the `cli.py run --bag` path).\n\n"
            "No network egress in this environment, so sequences are "
            "synthetic (sensor/synth.py raycaster; ~8 m indoor world, "
            "10 Hz scans, 200 Hz IMU in g-units, each generated THROUGH "
            "the profile's own extrinsics; per-row duration in the last "
            "column) — formats, decoders, sync, and the full estimation "
            "stack are the production path. ATE/RPE are against the "
            "simulator ground truth.\n\n"
            "| profile | lidar type | frames | init | ATE RMSE (mm) | "
            "RPE RMSE (mm) | scans/s | decoder py=native | dur (s) |\n"
            "|---|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['profile']} | {r['lidar_type']} | {r['frames']} "
                    f"| {r['init']} | {r['ate_mm']} | {r['rpe_mm']} "
                    f"| {r['scans_per_sec']} | {r['decoder']} "
                    f"| {r.get('dur_s', duration)} |\n")
        f.write(
            "\nThe scans/s column is the cold replay rate (each profile "
            "compiles its own program shapes on first use); steady-state "
            "throughput is bench.py's number.\n"
            "\nDecoder column: native C++ fast path (csrc/decode.cpp) vs "
            "Python fallback on this profile's message layout — `exact` "
            "means identical point sets and timestamps. Livox/TartanAir "
            "use format-specific paths covered in tests/test_sensor.py.\n")
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
