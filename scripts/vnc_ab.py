#!/usr/bin/env python
"""VNC separation study (round-4 verdict item 7): does the VNC normal
residual measurably beat the plain point-to-plane IEKF when both get the
SAME iteration budget?

The reference's headline claim (ReadMe.md:8, docs/VNCLio_formulation.md:
130-194) is rotation rescue in rotation-starved regimes. Round 3 showed
plain-20-iter matching VNC-4-iter on corridor and stairwell synthetics —
but that comparison gives plain 5x the iterations (the reference's own
budgets, odometry.cpp:64-68). Here the budget is EQUALIZED via
odometry.iekf_max_iter: {vnc-4, plain-4, plain-20} on progressively harder
fast-yaw stairwells (the regime where per-scan motion is largest and
under-convergence compounds). Results land in PARITY.md.

Env: AB_TURNS (comma list of seconds-per-turn, default "6,3,2"),
     AB_NOISE (default 0.01), SLAM_PLATFORM=cpu for CPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

import importlib.util

_here = os.path.dirname(os.path.abspath(__file__))
_spec = importlib.util.spec_from_file_location(
    "degenerate_runs", os.path.join(_here, "degenerate_runs.py"))
dg = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(dg)

from vina_slam_tpu.platform.metrics import associate, rot_rpe_rmse_deg
from vina_slam_tpu.sensor import synth


def run_variant(frames, gts, use_vnc, iters):
    cfg = dg.corridor_cfg(use_vnc=use_vnc)
    cfg.odometry.voxel_size = 0.5
    cfg.odometry.iekf_max_iter = iters
    runner, el, peak = dg.run_seq(cfg, frames)
    ate, rerr, n = dg.seq_metrics(runner, gts, last_session=True,
                                  align_rot=True)
    s0 = runner.last_session_start()
    traj = runner.trajectory()[s0:]
    Rs = [r[1] for r in runner.traj][s0:]
    ref_t = np.asarray([t for (t, R, p) in gts])
    ie, ir = associate(traj[:, 0], ref_t)
    rpe = (rot_rpe_rmse_deg([Rs[i] for i in ie], [gts[j][1] for j in ir],
                            delta=10) if len(ie) > 10 else float("nan"))
    return dict(ate=ate, rot_rmse=rerr, rot_rpe=rpe,
                resets=runner.stats.resets, peak_degrade=peak,
                frames=n, wall=el)


def main():
    turns = [float(t) for t in os.environ.get("AB_TURNS", "6,3,2").split(",")]
    noise = float(os.environ.get("AB_NOISE", "0.01"))
    dur = float(os.environ.get("AB_DUR", "14.0"))

    for turn_s in turns:
        n_floors = int(np.ceil((dur - 1.5) / turn_s)) + 1
        patches = synth.stairwell_world(n_floors=n_floors)
        traj = synth.HelixTrajectory(turn_s=turn_s, climb=3.0 / turn_s)
        frames, gts = synth.simulate_sequence(
            duration=dur, traj=traj, patches=patches, n_az=180, n_el=12,
            noise=noise, imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4,
            max_range=20.0, el_range=(-0.9, 0.9))
        yaw = 360.0 / turn_s
        print(f"=== stairwell turn_s={turn_s} ({yaw:.0f} deg/s yaw, "
              f"{len(frames)} frames) ===", flush=True)
        for name, vnc, iters in (("vnc-4", 1, 4), ("plain-4", 0, 4),
                                 ("plain-20", 0, 20)):
            r = run_variant(frames, gts, vnc, iters)
            print(f"  [{name:9s}] ate={r['ate']:.4f} m "
                  f"rot_rmse={r['rot_rmse']:.3f} deg "
                  f"rot_rpe={r['rot_rpe']:.3f} deg/s "
                  f"resets={r['resets']} peak_degrade={r['peak_degrade']} "
                  f"frames={r['frames']} wall={r['wall']:.0f}s", flush=True)


if __name__ == "__main__":
    main()
