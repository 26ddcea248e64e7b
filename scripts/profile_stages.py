"""Per-stage device timing on the real TPU: runs the modular pipeline to a
steady state, then times each jitted stage in isolation (block_until_ready
fenced). Pinpoints where the per-scan budget goes."""
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
import jax.numpy as jnp
import numpy as np

from vina_slam_tpu.estimation import preintegration as pre
from vina_slam_tpu.mapping import ba, factors as fx, voxel_map as vm
from vina_slam_tpu.ops import downsample as ds
from vina_slam_tpu.pipeline import odometry as odom
from vina_slam_tpu.pipeline.runner import SlamRunner, pad_points, _win_world
from vina_slam_tpu.sensor import synth
from tests.test_pipeline_e2e import small_cfg


def timeit(name, fn, n=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    cfg = small_cfg()
    cfg.tpu.map_capacity = 1 << 16
    cfg.tpu.fix_pool_capacity = 1 << 16
    cfg.tpu.max_voxels_ba = 2048
    frames, gts = synth.simulate_sequence(
        duration=2.5, n_az=180, n_el=12, noise=0.005, seed=4)
    runner = SlamRunner(cfg, npad_map=8192, use_fused=False)
    for f in frames:
        runner.process_frame(f)
        if not runner.motion_init_flag and runner.stats.frames >= 3:
            break
    print("steady reached; timing stages", flush=True)

    W = runner.W
    Rs, ps = runner._stacked_poses()
    f0 = frames[len(frames) - 1]
    full_pts, full_rel, full_valid = pad_points(f0.scan.pts, f0.scan.rel_time)
    o = cfg.odometry

    timeit("downsample_mean", lambda: ds.downsample_mean(
        full_pts, full_valid, jnp.asarray(o.down_size, jnp.float32), 8192))

    from vina_slam_tpu.core import pointcov
    ext_R = jnp.asarray(cfg.ext_R, jnp.float32)
    ext_p = jnp.asarray(cfg.ext_p, jnp.float32)
    body, var = pointcov.var_init(ext_R, ext_p, full_pts, o.dept_err, o.beam_err)

    planes = timeit("extract_scan_planes", lambda: odom.extract_scan_planes(
        body, full_valid, runner.params.voxel_size, runner.params.min_eigen_value,
        tuple(np.asarray(runner.params.plane_thre)), levels=runner.ms.levels))

    timeit("iekf_update(4it,vnc)", lambda: odom.iekf_update(
        runner.x_curr, runner.map, body, var, full_valid, planes,
        runner.params, runner.ms, max_iter=4, use_vnc=True))

    win_w = _win_world(runner.win_pts, runner.win_valid, Rs, ps)
    out = timeit("recut", lambda: vm.recut(
        runner.map, runner.pool, win_w, runner.win_valid, runner.params,
        runner.ms, W, jnp.asarray(runner.jour, jnp.float32)))
    _, _, slots, _ = out

    factors = timeit("extract_factors", lambda: fx.extract_factors(
        runner.map, slots, win_w, runner.win_valid, Rs, ps, runner.params,
        runner.ms, cfg.tpu.max_voxels_ba, W))

    print("pre_buf:", len(runner.pre_buf), flush=True)
    try:
      if runner.pre_buf:
        # pad edges to W-1 and states to W so the BA stage always gets timed
        pb = list(runner.pre_buf) + [runner.pre_buf[-1]] * (W - 1 - len(runner.pre_buf))
        pre_st = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *pb)
        xb = list(runner.x_buf) + [runner.x_buf[-1]] * (W - len(runner.x_buf))
        w0 = ba.WindowPoses(R=Rs.astype(jnp.float64), p=ps.astype(jnp.float64),
                            v=jnp.stack([x.v for x in xb]),
                            bg=jnp.stack([x.bg for x in xb]),
                            ba=jnp.stack([x.ba for x in xb]),
                            g=xb[-1].g)
        timeit("ba.damping_iter(10)", lambda: ba.damping_iter(
            w0, factors, pre_st, jnp.asarray(cfg.local_ba.imu_coef), W, max_iter=10))
        timeit("lidar_acc(1 hess)", lambda: fx.lidar_acc(
            factors, w0.R, w0.p, W))
    except Exception as e:
      print("BA timing skipped:", e, flush=True)

    # ---- pieces of the fused step not covered above ----
    from vina_slam_tpu.estimation import ekf as ekf_mod
    ekf = runner.ekf
    arrays, cond_blk, n_iv = ekf_mod.build_intervals(
        ekf.last_imu, ekf.last_pcl_end_time, f0.beg_time, f0.end_time, f0.imu)
    x = runner.x_curr
    prop = timeit("ekf _propagate(128 iv)", lambda: ekf_mod._propagate(
        x.R, x.p, x.v, x.cov, x.bg, x.ba, x.g,
        jnp.asarray(arrays["avr_gyr"]), jnp.asarray(arrays["avr_acc"]),
        jnp.asarray(arrays["dt"]), jnp.asarray(arrays["offt"]),
        jnp.asarray(arrays["valid"]),
        jnp.asarray(np.asarray(ekf.cov_gyr)), jnp.asarray(np.asarray(ekf.cov_acc)),
        jnp.asarray(np.asarray(ekf.cov_bias_gyr)),
        jnp.asarray(np.asarray(ekf.cov_bias_acc)),
        jnp.asarray(float(runner.imupre_scale_gravity)),
        jnp.asarray(arrays["end_minus_last"])))
    pose_table = prop[4]
    timeit("ekf _deskew", lambda: ekf_mod._deskew(
        full_pts, full_rel, full_valid, pose_table,
        jnp.asarray(arrays["offt"]), jnp.sum(jnp.asarray(arrays["valid"])),
        prop[0], prop[1], jnp.asarray(cfg.ext_R), jnp.asarray(cfg.ext_p)))

    gm, am, dtm, vmid = ekf_mod.midpoint_arrays(cond_blk)
    timeit("preint build_factor", lambda: pre.build_factor(
        jnp.asarray(gm), jnp.asarray(am), jnp.asarray(dtm), jnp.asarray(vmid),
        x.bg, x.ba, jnp.asarray(runner.noise_meas),
        jnp.asarray(runner.noise_walk),
        jnp.asarray(float(runner.imupre_scale_gravity))))

    timeit("accumulate_cov(new row)", lambda: vm.accumulate_cov(
        runner.map, slots[0], win_w[0], runner.win_var[0],
        runner.win_valid[0], runner.params, runner.ms))

    timeit("margi", lambda: vm.margi(
        runner.map, runner.pool, slots, win_w, runner.win_var, runner.win_valid,
        runner.params, runner.ms, jnp.asarray(runner.jour, jnp.float32), mgsize=1))

    timeit("evict", lambda: vm.evict(
        runner.map, runner.pool, jnp.asarray(0.0, jnp.float32),
        runner.params, runner.ms))

    # dispatch RTT probe: trivial op round-trips
    x = jnp.zeros(8)
    timeit("tiny-op dispatch+sync", lambda: (x + 1.0), n=20)


if __name__ == "__main__":
    main()
