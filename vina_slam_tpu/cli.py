"""Command-line interface — the `ros2 launch vina_slam start.launch.py`
analog for headless replay.

  python -m vina_slam_tpu.cli run --config configs/mid360.yaml \
      --data sequence.npz --out traj.txt [--save-map map.pcd] [--markers m.json]
  python -m vina_slam_tpu.cli synth-bench   # synthetic smoke run
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def cmd_run(args):
    import jax

    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from vina_slam_tpu.core.config import load_config
    from vina_slam_tpu.pipeline.runner import SlamRunner
    from vina_slam_tpu.platform import dataset, io
    from vina_slam_tpu.utils.profiling import StageTimer, rss_gb

    cfg = load_config(args.config)
    runner = SlamRunner(cfg)
    if args.resume:
        from vina_slam_tpu.platform.checkpoint import load_checkpoint
        load_checkpoint(args.resume, runner)
    writer = io.TumWriter(args.out) if args.out else None

    if args.data.endswith(".db3"):
        from vina_slam_tpu.platform.rosbag import replay_rosbag
        source = replay_rosbag(args.data, cfg)
    else:
        source = dataset.replay_npz(args.data, cfg)

    n = 0
    n_streamed = 0
    streamer = None
    t0 = time.perf_counter()
    for frame in source:
        out = runner.process_frame(frame)
        n += 1
        if out is not None and writer is not None and "pose_R" in out:
            # modular path emits per-frame poses; the fused path queues
            # asynchronously and the refined trajectory is written at the end
            writer.write(out["t"], out["pose_R"], out["pose_p"])
            n_streamed += 1
        if args.live_scene and n % args.live_every == 0:
            # live viewer feed (serve with `cli viz --scene <path>`); the
            # rviz MarkerArray-publisher analog (octree.cpp:758-949) —
            # INCREMENTAL: periodic scene.json snapshots + per-tick
            # update.json add/delete deltas keyed by stable voxel ids
            if streamer is None:
                import os as _os

                from vina_slam_tpu.platform.webviz import SceneStreamer
                streamer = SceneStreamer(
                    _os.path.dirname(_os.path.abspath(args.live_scene)))
            runner.drain_traj()
            runner.sync_from_fused()
            streamer.tick(runner.trajectory(), runner.map, runner.params)
        if args.max_frames and n >= args.max_frames:
            break
    elapsed = time.perf_counter() - t0

    if writer:
        # fused path queues asynchronously: write the final (BA-refined)
        # trajectory if nothing was streamed per frame
        if n_streamed == 0:
            runner.drain_traj()
            for t, R, p, *_ in runner.traj:
                writer.write(t, R, p)
        writer.close()
    if args.checkpoint:
        from vina_slam_tpu.platform.checkpoint import save_checkpoint
        runner.drain_traj()
        save_checkpoint(args.checkpoint, runner)
    if args.refined_out:
        traj = runner.trajectory()
        np.savetxt(args.refined_out, traj, fmt="%.9f")
    if args.markers:
        from vina_slam_tpu.platform.viz import save_markers_json
        # fused mode: runner.map is a donated (deleted) snapshot otherwise
        runner.sync_from_fused()
        save_markers_json(args.markers, runner.map, runner.params)
    if args.live_scene:
        runner.drain_traj()
        runner.sync_from_fused()
        if streamer is not None:
            # final incremental tick through the SAME streamer — a plain
            # snapshot write here would drop the "base" stamp and desync
            # any viewer mid-protocol
            streamer.tick(runner.trajectory(), runner.map, runner.params)
        else:
            from vina_slam_tpu.platform.webviz import write_scene_json
            write_scene_json(args.live_scene, runner.trajectory(),
                             runner.map, runner.params)
    print(json.dumps({
        "frames": n, "elapsed_s": round(elapsed, 2),
        "scans_per_sec": round(n / max(elapsed, 1e-9), 2),
        "rss_gb": round(rss_gb(), 2),
        "stats": vars(runner.stats),
    }))


def cmd_synth(args):
    import jax

    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from vina_slam_tpu.core.config import SlamConfig
    from vina_slam_tpu.pipeline.runner import SlamRunner
    from vina_slam_tpu.platform.metrics import ate_rmse
    from vina_slam_tpu.sensor import synth

    frames, gts = synth.simulate_sequence(duration=args.duration, n_az=180, n_el=12,
                                          noise=0.005, seed=4)
    cfg = SlamConfig()
    cfg.tpu.map_capacity = 1 << 15
    runner = SlamRunner(cfg, npad_map=8192)
    for f in frames:
        runner.process_frame(f)
    traj = runner.trajectory()
    gt = {round(t, 4): p for (t, R, p) in gts}
    est, ref = [], []
    for row in traj:
        if round(row[0], 4) in gt:
            est.append(row[1:4])
            ref.append(gt[round(row[0], 4)])
    print(json.dumps({
        "frames": len(frames),
        "ate_rmse_m": round(ate_rmse(np.asarray(est), np.asarray(ref)), 5),
        "init_ok": not runner.motion_init_flag,
    }))


def cmd_viz(args):
    from vina_slam_tpu.platform.webviz import serve

    serve(args.scene, port=args.port)


def main(argv=None):
    p = argparse.ArgumentParser(prog="vina_slam_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="replay a recorded sequence")
    pr.add_argument("--config", required=True)
    pr.add_argument("--data", required=True)
    pr.add_argument("--out", default="")
    pr.add_argument("--refined-out", default="")
    pr.add_argument("--markers", default="")
    pr.add_argument("--live-scene", default="",
                    help="write a live viewer scene JSON (see `viz`)")
    pr.add_argument("--live-every", type=int, default=20,
                    help="frames between live scene refreshes")
    pr.add_argument("--max-frames", type=int, default=0)
    pr.add_argument("--checkpoint", default="", help="save full state npz at end")
    pr.add_argument("--resume", default="", help="resume from a checkpoint npz")
    pr.set_defaults(fn=cmd_run)

    ps = sub.add_parser("synth-bench", help="synthetic smoke run")
    ps.add_argument("--duration", type=float, default=4.0)
    ps.set_defaults(fn=cmd_synth)

    pv = sub.add_parser("viz", help="serve the live web viewer")
    pv.add_argument("--scene", required=True,
                    help="scene JSON path written by `run --live-scene`")
    pv.add_argument("--port", type=int, default=8008)
    pv.set_defaults(fn=cmd_viz)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
