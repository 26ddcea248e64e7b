"""Diagnostics on a real steady-state frame (TPU): recut wave count /
straggler population, LM iteration count, downsample fill — decides the
round-4 device-side levers (extra split waves? LM early exit? pad slack)."""
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

from vina_slam_tpu.core.config import SlamConfig
from vina_slam_tpu.core.mat3 import bmv
from vina_slam_tpu.mapping import ba, factors as fx, voxel_map as vm
from vina_slam_tpu.ops import downsample as ds_ops
from vina_slam_tpu.pipeline import fused
from vina_slam_tpu.pipeline.runner import SlamRunner
from vina_slam_tpu.sensor import synth


def main():
    frames, _ = synth.simulate_sequence(
        duration=8.0, n_az=180, n_el=12, noise=0.005,
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
    cfg.tpu.max_voxels_ba = 1024
    cfg.tpu.max_new_voxels = 1024
    runner = SlamRunner(cfg, npad_map=4096)

    warm = 0
    for i, f in enumerate(frames):
        out = runner.process_frame(f)
        if not runner.motion_init_flag and out is not None:
            warm += 1
        if warm >= 12:
            split = i + 1
            break
    runner.sync()
    st = runner._fused
    W, ms, params = runner.W, runner.ms, runner.params

    for fi in range(split, split + 6):
        args = runner.fused_args(frames[fi])
        if args is None:
            continue
        (pts, rel, valid, avr_gyr, avr_acc, dt_i, offt_i, valid_i,
         eml, set_, gm, am, dtm, vmsk, *consts) = args
        # replicate the pre-recut stages via the bisect prefixes
        st_prop = fused.steady_step(st, *args, ms=ms, W=W,
                                    Vmax=cfg.tpu.max_voxels_ba,
                                    cfgs=runner._cfgs, stop_after="win")
        # downsample fill
        down32 = consts[11]
        dpts, dvalid, n_ds = ds_ops.downsample_mean(
            st_prop.win_pts[st.win_count], valid, down32, runner.npad_map)
        # recut with debug on the post-push window
        i2 = st_prop.win_count - 1 if False else st.win_count
        R32 = st_prop.xs.R.astype(jnp.float32)
        p32 = st_prop.xs.p.astype(jnp.float32)
        win_w = bmv(R32[:, None], st_prop.win_pts) + p32[:, None, :]
        win_w = jnp.where(st_prop.win_valid[..., None], win_w, 1e7)
        hint = st.win_slots.at[i2].set(-1)
        new_mask = jnp.broadcast_to(
            (jnp.arange(W) == jnp.minimum(i2, W - 1))[:, None],
            st_prop.win_valid.shape)
        m2, p2, slots, lv, dbg = vm.recut(
            st.m, st.pool, win_w, st_prop.win_valid, params, ms, W,
            st.jour, cached=hint, win_var=st_prop.win_var,
            new_mask=new_mask, debug=True)
        waves, n_lost, n_full = (int(x) for x in jax.device_get(dbg))
        # LM iterations on the same window
        factors = fx.extract_factors(m2, slots, win_w, st_prop.win_valid,
                                     st_prop.xs.R, st_prop.xs.p, params, ms,
                                     cfg.tpu.max_voxels_ba, W)
        w0 = ba.WindowPoses(R=st_prop.xs.R, p=st_prop.xs.p, v=st_prop.xs.v,
                            bg=st_prop.xs.bg, ba=st_prop.xs.ba,
                            g=st_prop.xs.g[W - 1])
        lm = ba.damping_iter(w0, factors, st_prop.pre_f, consts[10], W,
                             max_iter=10)
        print(f"frame {fi}: n_ds={int(n_ds)} waves={waves} lost={n_lost} "
              f"full={n_full} lm_iters={int(lm.iters)} "
              f"nvox={int(factors.n_valid)} "
              f"res {float(lm.residual0):.4g}->{float(lm.residual1):.4g}",
              flush=True)
        # advance the real state
        st = fused.steady_step(st, *args, ms=ms, W=W,
                               Vmax=cfg.tpu.max_voxels_ba, cfgs=runner._cfgs)
        jax.block_until_ready(st.x.p)


if __name__ == "__main__":
    main()
