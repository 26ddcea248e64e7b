import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
#!/usr/bin/env python
"""Measure LM-iteration counts and BA factor-pad fill on the bench world.

The fused step's BA phase costs ~20 ms of the 43 ms TPU step; its while_loop
runs up to max_iter=10 LM iterations, each paying a full lidar_acc sweep
over the (V=max_voxels_ba, W) factor pad. Two questions decide the next
optimization: (a) how many iterations actually execute before the 1e-6
relative-residual exit (optimizers.cpp:162), and (b) how much of the V pad
holds real voxels. Runs the MODULAR runner (same math, host-visible LM
results) on CPU.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from vina_slam_tpu.core.config import SlamConfig  # noqa: E402
from vina_slam_tpu.pipeline.runner import SlamRunner  # noqa: E402
from vina_slam_tpu.sensor import synth  # noqa: E402


def main():
    duration = float(os.environ.get("BENCH_DURATION", "4.0"))
    n_az = int(os.environ.get("BENCH_NAZ", "180"))
    n_el = int(os.environ.get("BENCH_NEL", "12"))

    cfg = SlamConfig()
    cfg.odometry.voxel_size = 1.0
    cfg.odometry.down_size = 0.1
    cfg.local_ba.win_size = 10
    cfg.local_ba.max_layer = 2
    cfg.local_ba.plane_eigen_value_thre = [4.0, 4.0, 4.0, 4.0]
    cfg.local_ba.imu_coef = 2e-4
    cfg.general.if_BA = 1
    cfg.tpu.map_capacity = 1 << 15
    cfg.tpu.fix_pool_capacity = 1 << 15
    cfg.tpu.max_voxels_ba = 1024
    cfg.tpu.max_new_voxels = 1024

    frames, gts = synth.simulate_sequence(
        duration=duration, n_az=n_az, n_el=n_el, noise=0.005,
        imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4)

    runner = SlamRunner(cfg, npad_map=4096, use_fused=False)
    for i, f in enumerate(frames):
        runner.process_frame(f)
        if i % 10 == 0:
            print(f"frame {i}/{len(frames)} ba_runs={runner.stats.ba_runs}")

    it = np.asarray(runner.stats.lm_iters)
    fill = np.asarray(runner.stats.ba_fill)
    print(f"\nBA runs: {len(it)}")
    if len(it):
        print(f"LM iters: mean {it.mean():.2f}  p50 {np.percentile(it, 50):.0f}"
              f"  p90 {np.percentile(it, 90):.0f}  max {it.max()}"
              f"  hist {np.bincount(it, minlength=11).tolist()}")
        print(f"BA fill (of {cfg.tpu.max_voxels_ba}): mean {fill.mean():.0f}"
              f"  p50 {np.percentile(fill, 50):.0f}"
              f"  p90 {np.percentile(fill, 90):.0f}  max {fill.max()}")


if __name__ == "__main__":
    main()
