"""In-context cost bisection of the fused steady step on the real TPU:
compiles prefix programs of steady_step (static stop_after) against one
real steady state + frame, so each stage's cost is measured exactly as it
executes inside the full program (fusion context, real data)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
# cache EVERYTHING: the axon remote compile costs ~0.5 s RTT per
# program, and the init path dispatches hundreds of small programs
# that a 5 s write-threshold re-pays on every run
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np

from vina_slam_tpu.core.config import SlamConfig
from vina_slam_tpu.pipeline import fused
from vina_slam_tpu.pipeline.runner import SlamRunner
from vina_slam_tpu.sensor import synth


def main():
    # BIS_BIG=1: realistic Mid-360-class density (bench.py's big world);
    # warm-starts from the bench_ckpt/ checkpoint when one exists so
    # profiling never re-pays the init storm.
    big = _os.environ.get("BIS_BIG", "0") == "1"
    w_dur, w_az, w_el = (8.0, 1024, 20) if big else (4.0, 180, 12)
    frames, _ = synth.simulate_sequence(
        duration=w_dur, n_az=w_az, n_el=w_el, noise=0.005,
        imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4)
    cfg = SlamConfig()
    cfg.odometry.voxel_size = 1.0
    cfg.odometry.down_size = 0.1
    cfg.local_ba.win_size = 10
    cfg.local_ba.max_layer = 2
    cfg.local_ba.plane_eigen_value_thre = [4.0, 4.0, 4.0, 4.0]
    cfg.local_ba.imu_coef = 2e-4
    cfg.general.if_BA = 1
    # match bench.py's settings so the full-program compile cache is shared
    cfg.tpu.map_capacity = (1 << 16) if big else (1 << 15)
    cfg.tpu.fix_pool_capacity = (1 << 16) if big else (1 << 15)
    cfg.tpu.max_voxels_ba = 2048 if big else 1024
    cfg.tpu.max_new_voxels = 4096 if big else 1024
    if big:
        cfg.tpu.refind_cap = 12288
    runner = SlamRunner(cfg, npad_map=8192 if big else 3072)

    split = None
    if big:
        import glob

        from vina_slam_tpu.platform import checkpoint as ck
        for path in sorted(glob.glob(_os.path.join(
                _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                "bench_ckpt", "big_s4_*.npz"))):
            try:
                extras = ck.load_checkpoint(path, runner)
                split = int(extras["split"])
                print(f"warm-start from {path} (frame {split})", flush=True)
                break
            except Exception as e:  # noqa: BLE001 — stale ckpt, keep looking
                print(f"ckpt {path} unusable: {e!r}", flush=True)
                split = None
    if split is None:
        warm = 0
        split = len(frames)
        for i, f in enumerate(frames):
            out = runner.process_frame(f)
            if not runner.motion_init_flag and out is not None:
                warm += 1
            if warm >= (3 if big else 10):
                split = i + 1
                break
    # advance a couple frames so the profiled state is mid-steady
    for f in frames[split:split + 2]:
        runner.process_frame(f)
    split += 2
    runner.sync()
    st = runner._fused
    args = runner.fused_args(frames[split])
    assert args is not None

    stages = ["prop", "down", "iekf", "win", "recut_assign", "recut_nobf",
              "recut_nowhile", "recut", "extract", "lm", "ba", "all"]
    prev = 0.0
    print(f"{'prefix':10s} {'total ms':>9s} {'delta ms':>9s}", flush=True)
    for stage in stages:
        fn = lambda: fused.steady_step(
            st, *args, ms=runner.ms, W=runner.W,
            Vmax=cfg.tpu.max_voxels_ba, cfgs=runner._cfgs, stop_after=stage)
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{stage:10s} {ms:9.2f} {ms - prev:9.2f}", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
