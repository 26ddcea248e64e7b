"""Measure the host-side share of a steady fused-step frame on TPU:
fused_args packaging (numpy loops + ~30 jnp.asarray device puts) vs the
dispatch call vs device compute. Decides the 'consolidate per-frame small
transfers' lever."""
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
    big = _os.environ.get("HO_BIG", "0") == "1"
    w_dur, w_az, w_el = (8.0, 1024, 20) if big else (8.0, 180, 12)
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
    cfg.tpu.map_capacity = (1 << 16) if big else (1 << 15)
    cfg.tpu.fix_pool_capacity = (1 << 16) if big else (1 << 15)
    cfg.tpu.max_voxels_ba = 2048 if big else 1024
    cfg.tpu.max_new_voxels = 4096 if big else 1024
    if big:
        cfg.tpu.refind_cap = 12288
    runner = SlamRunner(cfg, npad_map=int(
        _os.environ.get("NPAD", "8192" if big else "3072")))

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
            except Exception as e:  # noqa: BLE001
                print(f"ckpt {path} unusable: {e!r}", flush=True)
    if split is None:
        warm = 0
        split = len(frames)
        for i, f in enumerate(frames):
            out = runner.process_frame(f)
            if not runner.motion_init_flag and out is not None:
                warm += 1
            if warm >= 10:
                split = i + 1
                break
    runner.sync()
    rest = frames[split:]
    print(f"{len(rest)} frames to time")

    # phase 1: full loop, per-frame host/arg/dispatch breakdown
    t_args = t_disp = 0.0
    n = 0
    last_args = None
    runner.sync()
    t0 = time.perf_counter()
    consts = runner.fused_consts()
    for f in rest:
        ta = time.perf_counter()
        args = runner.fused_args_packed(f)
        tb = time.perf_counter()
        if args is None:
            continue
        last_args = args
        runner._fused = fused.steady_step_packed_donated(
            runner._fused, *args, *consts, ms=runner.ms, W=runner.W,
            Vmax=cfg.tpu.max_voxels_ba, cfgs=runner._cfgs)
        tc = time.perf_counter()
        t_args += tb - ta
        t_disp += tc - tb
        n += 1
    runner.sync()
    wall = time.perf_counter() - t0
    print(f"frames={n} wall={wall/n*1e3:.2f} ms/frame  "
          f"fused_args={t_args/n*1e3:.2f}  dispatch={t_disp/n*1e3:.2f}  "
          f"device-tail={(wall - t_args - t_disp)/n*1e3:.2f}")

    # phase 2: device-only — one frame's args already on device, pure
    # dispatch+compute loop (no host packaging at all; donated, so each
    # output feeds the next call like production)
    st = runner._fused
    args = jax.tree_util.tree_map(jax.device_put, last_args)
    jax.block_until_ready(st.x.p)
    t0 = time.perf_counter()
    K = 32
    for _ in range(K):
        st = fused.steady_step_packed_donated(
            st, *args, *consts, ms=runner.ms, W=runner.W,
            Vmax=cfg.tpu.max_voxels_ba, cfgs=runner._cfgs)
    jax.block_until_ready(st.x.p)
    print(f"pure device loop (donated): "
          f"{(time.perf_counter() - t0)/K*1e3:.2f} ms/frame")


if __name__ == "__main__":
    main()
