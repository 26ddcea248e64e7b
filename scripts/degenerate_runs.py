import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
#!/usr/bin/env python
"""Degenerate-geometry + long-trajectory evidence runs (VERDICT r2 item 4).

Drives the full pipeline through a corridor world (the
config/compus_elevator.yaml regime: no x-facing surfaces in range, so
lambda_min(sum n n^T) collapses along the corridor axis) and through a
>=700 m run that exercises the in-loop eviction, and prints a summary for
PARITY.md:

  * corridor: per-frame degeneracy verdicts, degrade counter peak, ATE and
    rotation error with VNC on vs off, optional config-gated reset firing;
  * long: eviction count, map occupancy before/after, bounded step time.

CPU-friendly (run with SLAM_PLATFORM=cpu) but sized for the TPU.
Env: CORRIDOR_SPEED, CORRIDOR_DUR, LONG_DUR, LONG_SPEED, EVICT_DIST.
"""

import os
import sys
import time

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
from vina_slam_tpu.platform.metrics import associate, ate_rmse
from vina_slam_tpu.sensor import synth


def corridor_cfg(use_vnc=1, evict_dist=700.0):
    cfg = SlamConfig()
    cfg.odometry.voxel_size = 1.0
    cfg.odometry.down_size = 0.1
    cfg.odometry.use_vnc = use_vnc
    cfg.local_ba.win_size = 10
    cfg.local_ba.max_layer = 2
    cfg.local_ba.plane_eigen_value_thre = [4.0, 4.0, 4.0, 4.0]
    cfg.local_ba.imu_coef = 2e-4
    cfg.general.if_BA = 1
    # match bench.py's table sizes so the fused program cache is shared
    cfg.tpu.map_capacity = 1 << 15
    cfg.tpu.fix_pool_capacity = 1 << 15
    cfg.tpu.max_voxels_ba = 1024
    cfg.tpu.max_new_voxels = 1024
    cfg.tpu.evict_dist = evict_dist
    return cfg


def run_seq(cfg, frames, enable_reset=False, degrade_bound=10):
    cfg.odometry.degrade_bound = degrade_bound
    runner = SlamRunner(cfg, npad_map=4096,
                        enable_degrade_reset=enable_reset, fetch_every=8)
    t0 = time.perf_counter()
    peak_degrade = 0
    for f in frames:
        runner.process_frame(f)
        peak_degrade = max(peak_degrade, runner.stats.degrade_cnt)
    runner.sync()
    el = time.perf_counter() - t0
    runner.drain_traj()
    peak_degrade = max(peak_degrade, runner.stats.degrade_cnt)
    return runner, el, peak_degrade


def rot_err_deg(traj_R, gts, traj_t):
    ref_t = np.asarray([t for (t, R, p) in gts])
    ie, ir = associate(traj_t, ref_t)
    errs = []
    for i, j in zip(ie, ir):
        dR = traj_R[i].T @ gts[j][1]
        c = np.clip((np.trace(dR) - 1) / 2, -1, 1)
        errs.append(np.degrees(np.arccos(c)))
    return float(np.sqrt(np.mean(np.square(errs)))) if errs else float("nan")


def seq_metrics(runner, gts, last_session=False, align_rot=False):
    """ATE (SE(3)-aligned) + rotation RMSE. With last_session, score only
    rows after the final system_reset (earlier rows live in a different,
    arbitrarily rebased world frame). With align_rot, remove the first
    matched frame's orientation offset first (post-reset yaw is arbitrary;
    gravity pins only roll/pitch)."""
    traj = runner.trajectory()
    s0 = runner.last_session_start() if last_session else 0
    traj = traj[s0:]
    Rs = [r[1] for r in runner.traj][s0:]
    ref_t = np.asarray([t for (t, R, p) in gts])
    ref_p = np.asarray([p for (t, R, p) in gts])
    ie, ir = associate(traj[:, 0], ref_t)
    ate = ate_rmse(traj[ie, 1:4], ref_p[ir]) if len(ie) >= 3 else float("nan")
    if align_rot and len(ie):
        C = np.asarray(Rs[ie[0]]).T @ gts[ir[0]][1]
        errs = []
        for i, j in zip(ie, ir):
            dR = C.T @ np.asarray(Rs[i]).T @ gts[j][1]
            c = np.clip((np.trace(dR) - 1) / 2, -1, 1)
            errs.append(np.degrees(np.arccos(c)))
        rerr = float(np.sqrt(np.mean(np.square(errs))))
    else:
        rerr = rot_err_deg(np.asarray(Rs), gts, traj[:, 0])
    return ate, rerr, traj.shape[0]


def corridor_case():
    speed = float(os.environ.get("CORRIDOR_SPEED", "8.0"))
    dur = float(os.environ.get("CORRIDOR_DUR", "10.0"))
    length = speed * dur + 40.0
    patches = synth.corridor_world(length=length)
    traj = synth.LinearTrajectory(speed=speed)
    frames, gts = synth.simulate_sequence(
        duration=dur, traj=traj, patches=patches, n_az=180, n_el=12,
        noise=0.005, imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4,
        max_range=30.0)
    print(f"[corridor] {len(frames)} frames, {speed} m/s, length {length:.0f} m",
          flush=True)

    results = {}
    for name, vnc in (("vnc", 1), ("plain", 0)):
        runner, el, peak = run_seq(corridor_cfg(use_vnc=vnc), frames)
        ate, rerr, n = seq_metrics(runner, gts)
        flags = runner.degenerate_flags()
        n_degen = int(np.sum(flags))
        results[name] = (ate, rerr, n_degen, peak)
        print(f"[corridor:{name}] ate={ate:.3f} m rot_rmse={rerr:.3f} deg "
              f"degenerate_frames={n_degen}/{len(flags)} "
              f"peak_degrade_cnt={peak} wall={el:.1f}s frames={n}", flush=True)

    # config-gated reset: small bound, reset enabled
    runner, el, peak = run_seq(corridor_cfg(use_vnc=1), frames,
                               enable_reset=True, degrade_bound=5)
    print(f"[corridor:reset] resets={runner.stats.resets} "
          f"peak_degrade_cnt={peak} wall={el:.1f}s", flush=True)
    return results


def long_case():
    speed = float(os.environ.get("LONG_SPEED", "15.0"))
    dur = float(os.environ.get("LONG_DUR", "52.0"))
    evict_dist = float(os.environ.get("EVICT_DIST", "700.0"))
    length = speed * dur + 60.0
    patches = synth.corridor_world(length=length, width=6.0)
    traj = synth.LinearTrajectory(speed=speed, yaw_amp=0.05)
    frames, gts = synth.simulate_sequence(
        duration=dur, traj=traj, patches=patches, n_az=180, n_el=12,
        noise=0.005, imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4,
        max_range=40.0)
    dist = speed * (dur - 1.0)
    print(f"[long] {len(frames)} frames, {dist:.0f} m travelled, "
          f"evict_dist={evict_dist}", flush=True)
    cfg = corridor_cfg(use_vnc=1, evict_dist=evict_dist)
    runner = SlamRunner(cfg, npad_map=4096, fetch_every=8)
    times = []
    for f in frames:
        t0 = time.perf_counter()
        runner.process_frame(f)
        runner.sync()
        times.append(time.perf_counter() - t0)
    runner.drain_traj()
    runner.sync_from_fused()
    import jax.numpy as jnp
    from vina_slam_tpu.mapping import voxel_hash as vh
    occ = int(jnp.sum(runner.map.keys != vh.EMPTY_KEY))
    ate, rerr, n = seq_metrics(runner, gts)
    times = np.asarray(times[10:])
    print(f"[long] occupancy={occ}/{cfg.tpu.map_capacity} "
          f"jour={runner.jour:.0f} ate={ate:.3f} m rot_rmse={rerr:.3f} deg "
          f"step_ms p50={np.percentile(times,50)*1e3:.1f} "
          f"p99={np.percentile(times,99)*1e3:.1f} max={times.max()*1e3:.1f}",
          flush=True)


def stairwell_case():
    """Third degenerate family: spiral stairwell ascent (VNC's OTHER target
    regime) — every normal direction visible but all patches small and
    close (short lever arms) with a vertically aliasing tread pattern,
    under sustained ~60 deg/s yaw."""
    dur = float(os.environ.get("STAIR_DUR", "14.0"))
    turn_s = float(os.environ.get("STAIR_TURN_S", "6.0"))
    noise = float(os.environ.get("STAIR_NOISE", "0.01"))
    n_floors = int(np.ceil((dur - 1.5) / turn_s)) + 1
    patches = synth.stairwell_world(n_floors=n_floors)
    traj = synth.HelixTrajectory(turn_s=turn_s, climb=3.0 / turn_s)
    # dome FOV (-52..52 deg, mid360-like): inside a 3.2 m shaft a narrow
    # (+-31 deg) spinner never sees the treads below -- rays hit walls
    # first, z-facing voxels starve, and the init normal-spread gate
    # (initialization.cpp:285) correctly REJECTS every window
    frames, gts = synth.simulate_sequence(
        duration=dur, traj=traj, patches=patches, n_az=180, n_el=12,
        noise=noise, imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4,
        max_range=20.0, el_range=(-0.9, 0.9))
    yaw_dps = 360.0 / turn_s
    print(f"[stairwell] {len(frames)} frames, {n_floors} floors, "
          f"{yaw_dps:.0f} deg/s yaw, noise {noise*100:.1f} cm", flush=True)

    results = {}
    for name, vnc in (("vnc", 1), ("plain", 0)):
        cfg = corridor_cfg(use_vnc=vnc)
        cfg.odometry.voxel_size = 0.5   # small-patch world: finer voxels
        runner, el, peak = run_seq(cfg, frames)
        # the static dwell window may be rejected by the init gates (a
        # correct refusal) -> score the final session, yaw-offset removed
        ate, rerr, n = seq_metrics(runner, gts, last_session=True,
                                   align_rot=True)
        # frame-invariant rotation tracking (ignores any init-frame tilt)
        from vina_slam_tpu.platform.metrics import rot_rpe_rmse_deg
        s0 = runner.last_session_start()
        traj = runner.trajectory()[s0:]
        Rs = [r[1] for r in runner.traj][s0:]
        ref_t = np.asarray([t for (t, R, p) in gts])
        ie, ir = associate(traj[:, 0], ref_t)
        rpe = rot_rpe_rmse_deg([Rs[i] for i in ie], [gts[j][1] for j in ir],
                               delta=10)
        flags = runner.degenerate_flags()
        n_degen = int(np.sum(flags))
        results[name] = (ate, rerr, n_degen, peak)
        print(f"[stairwell:{name}] ate={ate:.4f} m rot_rmse={rerr:.3f} deg "
              f"rot_rpe={rpe:.3f} deg/s resets={runner.stats.resets} "
              f"degenerate_frames={n_degen}/{len(flags)} "
              f"peak_degrade_cnt={peak} wall={el:.1f}s frames={n}", flush=True)
    return results


def flight_case():
    """Fourth hard regime: aggressive outdoor flight (the
    config/outdoor_fly.yaml profile) — banked figure-8 over the yard world
    at up to ~12 m/s with ~45 deg coordinated bank, flown ABOVE the
    buildings looking down. Exercises the outdoor param set (4 m voxels,
    0.5 m downsample) under high linear+angular rates."""
    from vina_slam_tpu.core.config import load_config
    from vina_slam_tpu.sensor.worldgen import yard_world

    dur = float(os.environ.get("FLY_DUR", "12.0"))
    noise = float(os.environ.get("FLY_NOISE", "0.01"))
    scene = yard_world(seed=7, clutter=150)
    traj = synth.FlightTrajectory()
    frames, gts = synth.simulate_sequence(
        duration=dur, traj=traj, patches=scene, n_az=180, n_el=12,
        noise=noise, imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=7,
        max_range=60.0, el_range=(-1.1, 0.2))
    print(f"[flight] {len(frames)} frames, figure-8 A=14 B=7 w=0.6 "
          f"(~12 m/s peak, ~45 deg bank), noise {noise*100:.1f} cm",
          flush=True)

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "outdoor_fly.yaml"))
    cfg.tpu.map_capacity = 1 << 15
    cfg.tpu.fix_pool_capacity = 1 << 15
    cfg.tpu.max_voxels_ba = 1024
    cfg.tpu.max_new_voxels = 1024
    runner, el, peak = run_seq(cfg, frames)
    ate, rerr, n = seq_metrics(runner, gts, last_session=True,
                               align_rot=True)
    from vina_slam_tpu.platform.metrics import rot_rpe_rmse_deg
    s0 = runner.last_session_start()
    traj_arr = runner.trajectory()[s0:]
    Rs = [r[1] for r in runner.traj][s0:]
    ref_t = np.asarray([t for (t, R, p) in gts])
    ie, ir = associate(traj_arr[:, 0], ref_t)
    rpe = rot_rpe_rmse_deg([Rs[i] for i in ie], [gts[j][1] for j in ir],
                           delta=10)
    print(f"[flight] ate={ate:.4f} m rot_rmse={rerr:.3f} deg "
          f"rot_rpe={rpe:.3f} deg/s resets={runner.stats.resets} "
          f"peak_degrade_cnt={peak} wall={el:.1f}s frames={n}", flush=True)
    return ate, rerr, rpe


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("corridor", "all"):
        corridor_case()
    if which in ("long", "all"):
        long_case()
    if which in ("stairwell", "all"):
        stairwell_case()
    if which in ("flight", "all"):
        flight_case()
