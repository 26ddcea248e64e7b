"""Count the XLA programs a COLD initialization compiles (VERDICT r4
item 6: the init path's op-by-op dispatch storm re-paid ~0.5 s remote
compile RTT per program; target <= 50 programs for the whole cold init).

Runs the small bench world on CPU with a FRESH persistent cache dir and
counts cache entries written (a) through the end of initialization
(first steady frame) and (b) after 3 more steady frames. Every entry is
one compiled program the TPU path would round-trip through the tunnel.

Usage: python scripts/init_programs.py
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import shutil
import tempfile
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
CACHE = tempfile.mkdtemp(prefix="init_cache_")
jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from vina_slam_tpu.core.config import SlamConfig
from vina_slam_tpu.pipeline.runner import SlamRunner
from vina_slam_tpu.sensor import synth


def count():
    return len([f for f in _os.listdir(CACHE)])


def main():
    frames, _ = synth.simulate_sequence(
        duration=4.0, n_az=180, n_el=12, noise=0.005,
        imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4)
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
    runner = SlamRunner(cfg, npad_map=3072)
    t0 = time.perf_counter()
    steady = 0
    for i, f in enumerate(frames):
        out = runner.process_frame(f)
        if not runner.motion_init_flag and out is not None:
            if steady == 0:
                runner.sync()
                print(f"init done at frame {i}: {count()} programs, "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
            steady += 1
            if steady >= 4:
                break
    runner.sync()
    print(f"after {steady} steady frames: {count()} programs, "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    shutil.rmtree(CACHE, ignore_errors=True)


if __name__ == "__main__":
    main()
