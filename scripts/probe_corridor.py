#!/usr/bin/env python
"""Probe: per-frame nnt_min / match_num down the corridor (modular path) to
validate the degeneracy detector against the corridor world."""
import os

import numpy as np

if os.environ.get("SLAM_PLATFORM", "") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
# cache EVERYTHING: the axon remote compile costs ~0.5 s RTT per
# program, and the init path dispatches hundreds of small programs
# that a 5 s write-threshold re-pays on every run
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from vina_slam_tpu.core.config import SlamConfig
from vina_slam_tpu.pipeline.runner import SlamRunner
from vina_slam_tpu.sensor import synth

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

speed, dur = 8.0, 8.0
patches = synth.corridor_world(length=speed * dur + 40.0)
traj = synth.LinearTrajectory(speed=speed)
frames, gts = synth.simulate_sequence(
    duration=dur, traj=traj, patches=patches, n_az=180, n_el=12,
    noise=0.005, imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4,
    max_range=25.0)
print(f"{len(frames)} frames", flush=True)

runner = SlamRunner(cfg, npad_map=4096, use_fused=False)
for i, f in enumerate(frames):
    out = runner.process_frame(f)
    if out is None:
        print(f"{i:3d} init...", flush=True)
        continue
    gx = gts[min(i, len(gts) - 1)][2][0]
    print(f"{i:3d} x_est={out['pose_p'][0]:7.2f} x_gt={gx:7.2f} "
          f"match={out.get('match_num', -1)!s:>5} "
          f"nnt_min={out.get('nnt_min', float('nan')):8.2f} "
          f"degen={out.get('degenerate')}", flush=True)
