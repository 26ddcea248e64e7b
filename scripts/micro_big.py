"""Sub-stage microbenchmarks at realistic Mid-360 density (20,480 raw pts,
bucket 24576, npad 8192, capacity 2^16): warm-starts from the bench
checkpoint and times each hot piece of the fused step in isolation —
downsample, scan-plane extraction, the IEKF match chain split into
descend / refresh / match / solver-einsums, and recut. Attack map for the
9.8 -> >=30 scans/s big-world target (VERDICT r4 item 2)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np

from vina_slam_tpu.core import pointcov
from vina_slam_tpu.core.config import SlamConfig
from vina_slam_tpu.mapping import voxel_map as vm
from vina_slam_tpu.ops import downsample as ds
from vina_slam_tpu.pipeline import odometry as odom
from vina_slam_tpu.pipeline.runner import SlamRunner, pad_points
from vina_slam_tpu.platform import checkpoint as ck
from vina_slam_tpu.sensor import synth


def timeit(name, fn, n=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    frames, _ = synth.simulate_sequence(
        duration=8.0, n_az=1024, n_el=20, noise=0.005,
        imu_noise_gyr=1e-3, imu_noise_acc=1e-3, seed=4)
    cfg = SlamConfig()
    cfg.odometry.voxel_size = 1.0
    cfg.odometry.down_size = 0.1
    cfg.local_ba.win_size = 10
    cfg.local_ba.max_layer = 2
    cfg.local_ba.plane_eigen_value_thre = [4.0, 4.0, 4.0, 4.0]
    cfg.local_ba.imu_coef = 2e-4
    cfg.general.if_BA = 1
    cfg.tpu.map_capacity = 1 << 16
    cfg.tpu.fix_pool_capacity = 1 << 16
    cfg.tpu.max_voxels_ba = 2048
    cfg.tpu.max_new_voxels = 4096
    cfg.tpu.refind_cap = 12288
    runner = SlamRunner(cfg, npad_map=8192)

    split = None
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
    assert split is not None, "run bench.py BENCH_BIG once to create the ckpt"
    for f in frames[split:split + 3]:
        runner.process_frame(f)
    runner.sync()
    runner.sync_from_fused()

    o = cfg.odometry
    f0 = frames[split + 3]
    st = runner._fused
    m = jax.tree_util.tree_map(jnp.copy, st.m)
    x = jax.tree_util.tree_map(jnp.copy, st.x)
    params, ms, W = runner.params, runner.ms, runner.W

    full_pts, full_rel, full_valid = pad_points(f0.scan.pts, f0.scan.rel_time)
    N = full_pts.shape[0]
    print(f"scan bucket N={N}, npad={runner.npad_map}, "
          f"C={ms.capacity}", flush=True)

    # ---- downsample ----
    timeit("downsample_mean 24k->8k", lambda: ds.downsample_mean(
        full_pts, full_valid, jnp.asarray(o.down_size, jnp.float32), 8192))

    ext_R = jnp.asarray(cfg.ext_R, jnp.float32)
    ext_p = jnp.asarray(cfg.ext_p, jnp.float32)
    body, var = pointcov.var_init(ext_R, ext_p, full_pts, o.dept_err,
                                  o.beam_err)
    timeit("var_init 24k", lambda: pointcov.var_init(
        ext_R, ext_p, full_pts, o.dept_err, o.beam_err))

    # ---- scan planes ----
    planes = timeit("extract_scan_planes 24k", lambda: odom.extract_scan_planes(
        body, full_valid, params.voxel_size, params.min_eigen_value,
        tuple(np.asarray(params.plane_thre)), levels=ms.levels))

    # ---- IEKF pieces ----
    R0 = x.R.astype(jnp.float32)
    p0 = x.p.astype(jnp.float32)
    wld0 = body @ R0.T + p0

    @jax.jit
    def _descend(m, wld):
        return vm.descend(m, wld, params, ms)

    slot0, lv0, crd0 = timeit("descend 24k", lambda: _descend(m, wld0))

    refind_cap = max(512, N // 8)

    @jax.jit
    def _refresh(m, wld, slot, lv, crd):
        return vm.refresh_slots(m, wld, slot, lv, crd, params, ms, refind_cap)

    slot1, lv1, crd1 = timeit("refresh_slots 24k", lambda: _refresh(
        m, wld0, slot0, lv0, crd0))

    from vina_slam_tpu.core.pointcov import sym3_pack
    from vina_slam_tpu.core import so3
    from vina_slam_tpu.core.mat3 import sandwich
    rot_var0 = x.cov[0:3, 0:3].astype(jnp.float32)
    tsl_var0 = x.cov[3:6, 3:6].astype(jnp.float32)

    @jax.jit
    def _varw(body, var):
        phat0 = so3.hat(body)
        return sym3_pack(
            sandwich(jnp.broadcast_to(R0, var.shape), var)
            + sandwich(phat0, jnp.broadcast_to(rot_var0, var.shape))
            + tsl_var0)

    var_world = timeit("world var 24k", lambda: _varw(body, var))

    @jax.jit
    def _match(m, wld, var_world, slot):
        return vm.match_with_slots(m, wld, var_world, slot, params)

    ok, nrm, ctr, sigma_d = timeit("match_with_slots 24k", lambda: _match(
        m, wld0, var_world, slot1))
    ok = ok & full_valid

    from vina_slam_tpu.core.linalg import inv_psd_refined as inv_psd
    cov_inv = inv_psd(x.cov)
    c_w0 = planes.center @ R0.T + p0
    vnc_found, vnc_n_map, _, _ = vm.match_neighbors(m, c_w0, params, ms)
    vnc_n_map = vnc_n_map / jnp.maximum(
        jnp.linalg.norm(vnc_n_map, axis=-1, keepdims=True), 1e-12)

    @jax.jit
    def _solver(x_c, ok, nrm, ctr, sigma_d):
        return odom.iekf_iteration_math(
            x, cov_inv, x_c, body, wld0, ok, nrm, ctr, sigma_d,
            planes, vnc_found, vnc_n_map)

    timeit("iekf solver math 24k (1 it)", lambda: _solver(
        x, ok, nrm, ctr, sigma_d))

    timeit("match_neighbors 512 planes", lambda: vm.match_neighbors(
        m, c_w0, params, ms))

    timeit("iekf_update full (4 it)", lambda: odom.iekf_update(
        x, m, body, var, full_valid, planes, params, ms,
        max_iter=4, use_vnc=True))


if __name__ == "__main__":
    main()
