"""Consolidated (few-program) initialization path.

The modular init dispatched ~276 distinct XLA programs per cold start
(scripts/init_programs.py; ~230 of them EAGER op-by-op dispatches —
broadcast_in_dim x62, multiply x21, copy x20, ... — each a ~0.5 s
compile round-trip through the axon remote-compile tunnel). That storm is
the root of the r04 official-bench 0.0 (watchdog death mid-warmup) and of
the minutes-long cold per-profile replays in PARITY_RUNS.md (VERDICT r4
item 6).

Here the two init phases are each ONE jitted program with identical
reference semantics:

- `init_frame`: the per-frame bootstrap collection work of
  VINA_SLAM::initialization (node.cpp:293-366) — 0.5 m kd-cloud
  downsample, extrinsic map, kdtree-bootstrap IEKF (odometry.cpp:267-439,
  cond-gated on >=100 accumulated points), registered-scan insert +
  0.5 m re-downsample, and the time-sorted close-downsample snapshot
  (node.cpp:334-341) with its <1000-point half-voxel retry.

- `init_round`: one full motion_init round (initialization.cpp:193-299) —
  re-deskew all W window clouds with current states (motion_blur,
  cpp:64-156, batched over frames), rebuild the voxel map from scratch,
  extract BA factors, run the gravity-augmented LM (3 iters), rebuild the
  window preintegrations with the optimized biases (cpp:269-273), and
  compute the convergence scalars (residuals, |g|, normal-spread
  eigenvalues, cpp:277-284). The <=10-round relax->tighten loop and the
  align_gravity flip stay host-side (tiny, no per-round compiles).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vina_slam_tpu.core import pointcov
from vina_slam_tpu.core.constants import IMU_BUCKET
from vina_slam_tpu.core.mat3 import bmv
from vina_slam_tpu.estimation import preintegration as pre
from vina_slam_tpu.mapping import ba, factors as fx, voxel_map as vm
from vina_slam_tpu.ops import downsample as ds
from vina_slam_tpu.pipeline import initialization as init_mod
from vina_slam_tpu.pipeline import odometry as odom


class InitStates(NamedTuple):
    """Stacked (W,) window states carried through the motion_init rounds."""
    R: jnp.ndarray    # (W, 3, 3) f64
    p: jnp.ndarray    # (W, 3)
    v: jnp.ndarray    # (W, 3)
    bg: jnp.ndarray   # (W, 3)
    ba: jnp.ndarray   # (W, 3)
    g: jnp.ndarray    # (W, 3) (all rows equal; reference shares one g)


# --------------------------------------------------------------- per frame

@partial(jax.jit, static_argnames=("npad",))
def init_frame(x, boot_pts, boot_valid, full_pts, full_valid,
               raw_pts, raw_rel, raw_valid, ext_R, ext_p,
               downkd, down_size, dept_err, beam_err, npad: int):
    """One program for the per-frame init collection (node.cpp:293-366).

    Returns (x_new, boot_pts, boot_valid, cpts, crel, cvalid) — the
    bootstrap-refined state, the re-downsampled accumulated cloud, and the
    time-sorted close-downsampled ORIGINAL cloud for motion_init."""
    kpts, kvalid, _ = ds.downsample_mean(full_pts, full_valid, downkd, 8192)
    ext_R32 = ext_R.astype(jnp.float32)
    ext_p32 = ext_p.astype(jnp.float32)
    kbody, _ = pointcov.var_init(ext_R32, ext_p32, kpts, dept_err, beam_err)

    n_boot = jnp.sum(boot_valid)
    x = jax.lax.cond(
        n_boot >= 100,
        lambda x: odom.iekf_update_knn(x, boot_pts, boot_valid, kbody, kvalid),
        lambda x: x, x)

    # insert the registered scan + re-downsample at 0.5 m (odometry.cpp:428-439)
    R32 = x.R.astype(jnp.float32)
    p32 = x.p.astype(jnp.float32)
    wld = kbody @ R32.T + p32
    merged = jnp.concatenate([boot_pts, wld])
    mvalid = jnp.concatenate([boot_valid, kvalid])
    boot_pts2, boot_valid2, _ = ds.downsample_mean(
        merged, mvalid, jnp.asarray(0.5, jnp.float32), boot_pts.shape[0])

    # time-sorted close-downsample snapshot of the RAW cloud (node.cpp:334-341)
    cpts, crel, cvalid, cn = ds.downsample_close(
        raw_pts, raw_rel, raw_valid, down_size, npad)
    cpts, crel, cvalid = jax.lax.cond(
        cn < 1000,
        lambda _: ds.downsample_close(raw_pts, raw_rel, raw_valid,
                                      down_size / 2, npad)[:3],
        lambda _: (cpts, crel, cvalid), ())
    order = jnp.argsort(jnp.where(cvalid, crel, jnp.inf))
    return x, boot_pts2, boot_valid2, cpts[order], crel[order], cvalid[order]


@jax.jit
def stack_inputs(pl_origs, x_buf, pre_buf):
    """One-program stacking of the motion_init inputs (the eager per-leaf
    jnp.stack calls dispatched ~20 concat programs into the cold-start
    storm). Lists arrive as pytrees; same W -> one trace."""
    pts_st = jnp.stack([p for (p, _, _) in pl_origs])
    rel_st = jnp.stack([r for (_, r, _) in pl_origs])
    valid_st = jnp.stack([v for (_, _, v) in pl_origs])
    W = len(x_buf)
    states = InitStates(
        R=jnp.stack([x.R for x in x_buf]).astype(jnp.float64),
        p=jnp.stack([x.p for x in x_buf]).astype(jnp.float64),
        v=jnp.stack([x.v for x in x_buf]),
        bg=jnp.stack([x.bg for x in x_buf]),
        ba=jnp.stack([x.ba for x in x_buf]),
        g=jnp.broadcast_to(x_buf[0].g, (W, 3)))
    pre_st = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *pre_buf)
    covs = jnp.stack([x.cov for x in x_buf])
    return pts_st, rel_st, valid_st, states, pre_st, covs


# ------------------------------------------------------------- round body

@partial(jax.jit, static_argnames=("ms", "W", "Vmax", "point_notime"))
def init_round(states: InitStates, pre_st, pts_st, rel_st, valid_st,
               dsk_gm, dsk_am, dsk_dt, dsk_offt, dsk_valid,
               pm_gm, pm_am, pm_dt, pm_valid,
               params, imu_coef, noise_meas, noise_walk,
               ext_R, ext_p, scale_gravity,
               ms: vm.MapStatic, W: int, Vmax: int, point_notime: bool):
    """One full motion_init round (initialization.cpp:193-299) as ONE
    program. Returns (new_states, new_pre, win_pts, r0, r1, gvec, eig,
    n_valid); the host applies the update only when n_valid >= 10
    (cpp:217's early break leaves the previous round's states in place)."""
    if point_notime:
        # no per-point stamps -> extrinsic map only (cpp:114-123)
        P = pts_st.astype(jnp.float64)
        win_pts = (P @ ext_R.T + ext_p).astype(jnp.float32)
    else:
        l_idx = jnp.maximum(jnp.arange(W) - 1, 0)
        win_pts = jax.vmap(
            init_mod._init_deskew_jit,
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None, None,
                     None),
        )(states.R, states.p, states.v, states.g,
          states.bg[l_idx], states.ba[l_idx],
          dsk_gm, dsk_am, dsk_dt, dsk_offt, dsk_valid,
          pts_st, rel_st, valid_st, ext_R, ext_p, scale_gravity)

    win_valid = valid_st
    m = vm.make_map(ms)
    pool = vm.make_pool(ms)
    Rs32 = states.R.astype(jnp.float32)
    ps32 = states.p.astype(jnp.float32)
    win_w = bmv(Rs32[:, None], win_pts) + ps32[:, None, :]
    win_w = jnp.where(win_valid[..., None], win_w, 1e7)
    m, pool, slots, _ = vm.recut(m, pool, win_w, win_valid, params, ms, W,
                                 jnp.asarray(0.0, jnp.float32))
    factors = fx.extract_factors(m, slots, win_w, win_valid, states.R,
                                 states.p, params, ms, Vmax, W)

    w0 = ba.WindowPoses(R=states.R, p=states.p, v=states.v,
                        bg=states.bg, ba=states.ba, g=states.g[0])
    lm = ba.damping_iter(w0, factors, pre_st, imu_coef, W, max_iter=3,
                         with_gravity=True)
    gvec = lm.poses.g
    new_states = InitStates(
        R=lm.poses.R, p=lm.poses.p, v=lm.poses.v,
        bg=lm.poses.bg, ba=lm.poses.ba,
        g=jnp.broadcast_to(gvec, (W, 3)))

    # rebuild preintegrations with the optimized biases (cpp:269-273):
    # edge i-1 -> i linearizes at frame i-1's bias
    new_pre = jax.vmap(
        pre.build_factor,
        in_axes=(0, 0, 0, 0, 0, 0, None, None, None),
    )(pm_gm, pm_am, pm_dt, pm_valid,
      lm.poses.bg[:-1], lm.poses.ba[:-1],
      noise_meas, noise_walk, scale_gravity)

    # normal-spread eigenvalue under the refined poses (cpp:277-284)
    P, v_, N, _ = fx._aggregate(factors, lm.poses.R, lm.poses.p)
    _, U, _, _ = fx._eig_state(P, v_, N)
    eig = init_mod.normal_spread_eig(U, factors.coe > 0)
    return (new_states, new_pre, win_pts, lm.residual0, lm.residual1,
            gvec, eig, factors.n_valid)


@jax.jit
def align_states(states: InitStates) -> InitStates:
    """align_gravity on the stacked window (initialization.cpp:28-62)."""
    R2, p2, v2, g2 = init_mod.align_gravity(states.R, states.p, states.v,
                                            states.g[0])
    return InitStates(R=R2, p=p2, v=v2, bg=states.bg, ba=states.ba,
                      g=jnp.broadcast_to(g2, states.g.shape))


@jax.jit
def init_win_var(win_pts, Rs, ps, covs, dept_err, beam_err):
    """Window-cloud world covariances for the first margi
    (pvec_update semantics, point_utils.cpp:54-65), batched over frames."""
    def one(body, R, p, cov):
        var = pointcov.body_var(body, dept_err, beam_err)
        _, wvar = pointcov.world_var(body, var, R, p, cov)
        return pointcov.sym3_pack(wvar)

    return jax.vmap(one)(win_pts, Rs, ps, covs)


# ----------------------------------------------------- host-side preconditioning

def backward_deskew_arrays(imu, beg_time):
    """The backward interval arrays of Initialization::motion_blur
    (initialization.cpp:76-107), host-built once per frame — they depend
    only on the raw IMU block, not on the evolving states."""
    K = IMU_BUCKET
    t, g_arr, a_arr = imu.t, imu.gyr, imu.acc
    n = len(t) - 1
    gm = np.zeros((K, 3))
    am = np.zeros((K, 3))
    dt = np.zeros(K)
    offt = np.zeros(K)
    for j in range(n):
        i = n - j
        gm[j] = 0.5 * (g_arr[i - 1] + g_arr[i])
        am[j] = 0.5 * (a_arr[i - 1] + a_arr[i])
        dt[j] = t[i - 1] - t[i]
        offt[j] = t[i - 1] - beg_time
    return gm, am, dt, offt, np.arange(K) < n
