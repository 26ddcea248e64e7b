"""Fused steady-state step: the whole per-scan pipeline as ONE XLA program.

The modular runner (runner.py) issues ~14 device calls and ~30 blocking
host<->device syncs per scan — fine on-die, ruinous through a high-latency
device tunnel. Here the entire steady-state update (deskew -> downsample ->
var_init -> scan planes -> VNC IEKF -> window push -> recut -> factor
extraction -> windowed BA -> marginalization -> window shift -> journey/
eviction bookkeeping) is a single jitted function over a device-resident
SteadyState pytree; per-scan poses land in an on-device trajectory ring
buffer fetched every `fetch_every` frames. The host only pads the scan and
preconditions the (tiny) IMU arrays — no per-frame sync points, so JAX's
async dispatch pipelines scans back-to-back (the BASELINE.json
"double-buffered scan-pipelined" design).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vina_slam_tpu.core import pointcov, so3
from vina_slam_tpu.core.mat3 import bmv
from vina_slam_tpu.core.constants import DIM, IMU_BUCKET
from vina_slam_tpu.core.state import NavState
from vina_slam_tpu.estimation import ekf as ekf_mod
from vina_slam_tpu.estimation import preintegration as pre
from vina_slam_tpu.mapping import ba, factors as fx, voxel_map as vm
from vina_slam_tpu.ops import downsample as ds_ops
from vina_slam_tpu.pipeline import odometry as odom

TRAJ_CAP = 4096          # trajectory ring capacity (fetched incrementally)
TRAJ_COLS = 14           # t, p(3), R(9), degenerate flag


class SteadyState(NamedTuple):
    m: vm.VoxelMap
    pool: vm.FixPool
    x: NavState                    # current state (f64)
    xs: NavState                   # window states, batched (W,)
    pre_f: pre.PreintFactor        # (W-1,) batched window edges
    win_pts: jnp.ndarray           # (W, Np, 3) f32 body
    win_var: jnp.ndarray           # (W, Np, 6) f32 SYM3-packed world var @ insertion
    win_valid: jnp.ndarray         # (W, Np)
    win_slots: jnp.ndarray         # (W, Np) i32 cached leaf slots (-1 unknown)
    win_mom: jnp.ndarray           # (W, C, 10) f32 persistent per-(frame,
                                   # slot) moment table, ALWAYS valid under
                                   # the poses in `xs` (the full branch
                                   # re-tags it right after BA moves them)
    win_count: jnp.ndarray         # () i32
    scan_idx: jnp.ndarray          # () i32 global scan counter
    degrade_cnt: jnp.ndarray       # () i32
    jour: jnp.ndarray              # () f32
    last_pos: jnp.ndarray          # (3,) f64
    traj: jnp.ndarray              # (TRAJ_CAP, TRAJ_COLS) f64 ring
    traj_head: jnp.ndarray         # () i32


def make_steady_state(m, pool, x, xs, pre_f, win_pts, win_var, win_valid,
                      win_count, jour, last_pos, scan_idx=0) -> SteadyState:
    W = win_valid.shape[0]
    C = m.keys.shape[0]
    return SteadyState(
        m=m, pool=pool, x=x, xs=xs, pre_f=pre_f,
        win_pts=win_pts, win_var=win_var, win_valid=win_valid,
        win_slots=jnp.full(win_valid.shape, -1, jnp.int32),
        # zero table + all-(-1) slots is the consistent empty invariant; the
        # first steps fill both through recut's compacted re-descends
        win_mom=jnp.zeros((W, C, 10), jnp.float32),
        win_count=jnp.asarray(win_count, jnp.int32),
        scan_idx=jnp.asarray(scan_idx, jnp.int32),
        degrade_cnt=jnp.asarray(0, jnp.int32),
        jour=jnp.asarray(jour, jnp.float32),
        last_pos=jnp.asarray(last_pos, jnp.float64),
        traj=jnp.zeros((TRAJ_CAP, TRAJ_COLS), jnp.float64),
        traj_head=jnp.asarray(0, jnp.int32),
    )


@jax.jit
def package_steady_state(m, pool, x, xs, pre_f, win_pts, win_var, win_valid,
                         win_count, jour, last_pos, scan_idx) -> SteadyState:
    """make_steady_state as ONE program whose outputs are fresh buffers
    (jit outputs never alias undonated inputs) — the fused-entry copy set,
    without the ~25 eager per-leaf copy dispatches."""
    return make_steady_state(m, pool, x, xs, pre_f, win_pts, win_var,
                             win_valid, win_count, jour, last_pos,
                             scan_idx=scan_idx)


def _set_frame(arr, i, val):
    return jax.lax.dynamic_update_index_in_dim(arr, val, i, 0)


def _push_state(xs: NavState, i, x: NavState) -> NavState:
    return NavState(*(
        jax.lax.dynamic_update_index_in_dim(f, v.astype(f.dtype), i, 0)
        for f, v in zip(xs, x)))


@partial(jax.jit, static_argnames=("ms", "W", "Vmax", "cfgs", "stop_after"))
def steady_step(
    st: SteadyState,
    # scan (padded to a bucket)
    pts, rel_time, pts_valid,
    # EKF interval arrays (IMU_BUCKET,)
    avr_gyr, avr_acc, dt_i, offt_i, valid_i, end_minus_last, scan_end_t,
    # preintegration midpoint arrays for this frame's edge (IMU_BUCKET,)
    pm_gyr, pm_acc, pm_dt, pm_valid,
    # runtime params
    params: vm.MapParams, noise_meas, noise_walk, cov_gyr, cov_acc,
    cov_bg, cov_ba, ext_R, ext_p, scale_gravity, imu_coef,
    # traced tuning knobs: kept OUT of the static tuple so profiles that
    # differ only in float tuning (down_size, sensor error model, plane
    # gates — which live in `params`) share ONE compiled program; the six
    # shipped profiles collapse to two structural variants (max_layer 2/3)
    down_size, dept_err, beam_err,
    # statics — program STRUCTURE only
    ms: vm.MapStatic, W: int, Vmax: int,
    cfgs,  # hashable tuple: (if_ba, npad_map, max_iter_ba, use_normal,
           #                  use_vnc, point_notime, iekf_iters)
    stop_after: str = "all",  # profiling bisect: compile a prefix program
):
    (if_ba, npad_map, ba_iters, use_normal, use_vnc, point_notime,
     iekf_iters) = cfgs[:7]
    recut_defer = cfgs[7] if len(cfgs) > 7 else True
    # assume_full (runner-set invariant): every fused step runs on a FULL
    # window (the modular path handles warmup; post-init win_count is
    # always W-1 entering a step), so the BA+margi+shift branch executes
    # unconditionally instead of through a 0/1-iteration while_loop — an
    # XLA while at map scale costs ~10 ms/scan in loop-state copies even
    # at exactly one iteration (same pathology as the recut cascade; see
    # voxel_map.recut "defer"). Eviction is likewise hoisted to the
    # runner's drain cadence (a separate, rarely-dispatched program)
    # instead of an in-step while. Non-runner callers (test fixtures with
    # partially filled windows) omit the flag and keep both while_loops.
    assume_full = cfgs[8] if len(cfgs) > 8 else False
    x = st.x

    # ---------------- EKF propagation + deskew ----------------
    R_end, p_end, v_end, cov, pose_table = ekf_mod._propagate(
        x.R, x.p, x.v, x.cov, x.bg, x.ba, x.g,
        avr_gyr, avr_acc, dt_i, offt_i, valid_i,
        cov_gyr, cov_acc, cov_bg, cov_ba, scale_gravity, end_minus_last)
    x = x._replace(R=R_end, p=p_end, v=v_end, cov=cov, t=scan_end_t)
    if point_notime:
        # vendors without per-point stamps (rel_time all zero) get NO motion
        # compensation (imu_ekf.cpp:108 skips the backward loop entirely);
        # points stay raw lidar-frame — var_init below applies the extrinsic
        # exactly once, same as the timed path whose _deskew maps back.
        deskewed = pts
    else:
        n_valid_i = jnp.sum(valid_i)
        deskewed = ekf_mod._deskew(
            pts, rel_time, pts_valid, pose_table, offt_i, n_valid_i,
            R_end, p_end, ext_R, ext_p)
    if stop_after == "prop":  # bisect point: propagation + deskew only
        k = min(deskewed.shape[0], st.win_pts.shape[1])
        return st._replace(
            x=x, win_pts=st.win_pts.at[0, :k].set(deskewed[:k]))

    # ---------------- downsample (with half-size retry) ----------------
    down32 = jnp.asarray(down_size, jnp.float32)
    dpts, dvalid, n_ds = ds_ops.downsample_mean(
        deskewed, pts_valid, down32, npad_map)

    # half-size retry only when the scan came out sparse — a lax.cond, NOT
    # the 0/1-iteration while_loop used for the map-carrying branches: this
    # carry is tiny ((Np,3)+(Np,) ~100 KB, so the cond's untaken-identity
    # copy is free), while the while form stalled the step ~15 ms per scan
    # at 20k-pt density even at zero iterations (scripts/micro_down.py:
    # while 28.7 ms vs cond 13.3 ms vs bare op 13.1 ms).
    def ds_retry(_):
        dp2, dv2, _ = ds_ops.downsample_mean(
            deskewed, pts_valid, down32 / 2, npad_map)
        return dp2, dv2

    dpts, dvalid = jax.lax.cond(
        n_ds < 2000, ds_retry, lambda _: (dpts, dvalid), ())
    if stop_after == "down":
        return st._replace(x=x, win_pts=st.win_pts.at[0, : dpts.shape[0]].set(dpts))

    ext_R32 = ext_R.astype(jnp.float32)
    ext_p32 = ext_p.astype(jnp.float32)
    map_body, map_var = pointcov.var_init(ext_R32, ext_p32, dpts, dept_err, beam_err)
    odo_body, odo_var = pointcov.var_init(ext_R32, ext_p32, deskewed, dept_err, beam_err)

    # ---------------- VNC scan planes + IEKF ----------------
    # plain path (use_vnc=0): skip scan-plane extraction, run the
    # 20-iteration budget (odometry.cpp:64-68)
    if use_vnc:
        planes = odom.extract_scan_planes(
            odo_body, pts_valid, params.voxel_size, params.min_eigen_value,
            params.plane_thre, levels=ms.levels)
    else:
        planes = odom.empty_scan_planes()
    res = odom.iekf_update(x, st.m, odo_body, odo_var, pts_valid, planes,
                           params, ms, max_iter=iekf_iters, use_vnc=use_vnc)
    x = res.x
    degrade_cnt = jnp.where(res.ok, jnp.maximum(st.degrade_cnt - 1, 0),
                            st.degrade_cnt + 1)
    if stop_after == "iekf":
        return st._replace(x=x, degrade_cnt=degrade_cnt)

    # ---------------- window push ----------------
    _, w_var_full = pointcov.world_var(map_body, map_var, x.R, x.p, x.cov)
    w_var = pointcov.sym3_pack(w_var_full)
    i = st.win_count
    win_pts = _set_frame(st.win_pts, i, map_body)
    win_var = _set_frame(st.win_var, i, w_var)
    win_valid = _set_frame(st.win_valid, i, dvalid)
    xs = _push_state(st.xs, i, x)

    # preintegration edge i-1 -> i with the PREVIOUS state's biases
    prev = jax.tree_util.tree_map(lambda f: f[jnp.maximum(i - 1, 0)], xs)
    new_edge = pre.build_factor(pm_gyr, pm_acc, pm_dt, pm_valid,
                                prev.bg, prev.ba, noise_meas, noise_walk,
                                scale_gravity)
    pre_f = jax.tree_util.tree_map(
        lambda buf, e: jnp.where(i >= 1,
                                 jax.lax.dynamic_update_index_in_dim(
                                     buf, e.astype(buf.dtype),
                                     jnp.maximum(i - 1, 0), 0),
                                 buf),
        st.pre_f, new_edge)

    win_count = i + 1
    if stop_after == "win":
        return st._replace(x=x, xs=xs, pre_f=pre_f, win_pts=win_pts,
                           win_var=win_var, win_valid=win_valid,
                           win_count=win_count.astype(jnp.int32))

    # ---------------- map recut + factor extraction ----------------
    R32 = xs.R.astype(jnp.float32)
    p32 = xs.p.astype(jnp.float32)
    win_w = bmv(R32[:, None], win_pts) + p32[:, None, :]
    win_w = jnp.where(win_valid[..., None], win_w, 1e7)
    win_slots_hint = _set_frame(st.win_slots, i,
                                jnp.full(st.win_slots.shape[1:], -1, jnp.int32))
    # recut owns the Bf covariance accumulation: insertion-time add for the
    # NEW frame (OctoTree::push, octree.cpp:172-176) plus re-adds into
    # children on subdivision (subdivide/push_fix re-push semantics)
    new_row = jnp.minimum(i, W - 1)
    new_mask = jnp.broadcast_to(
        (jnp.arange(W) == new_row)[:, None], win_valid.shape)
    # st.win_mom is valid under st.xs poses == xs rows 0..i-1 (the push only
    # filled row i, whose table row is empty), so recut consumes it as-is
    recut_stage = (stop_after[6:] if stop_after.startswith("recut_")
                   else ("defer" if recut_defer else "all"))
    m, pool0, slots, _, win_n, win_accf = vm.recut(
        st.m, st.pool, win_w, win_valid, params, ms, W, st.jour,
        cached=win_slots_hint,
        win_var=None if stop_after == "recut_nobf" else win_var,
        new_mask=new_mask,
        return_counts=True, return_frame_moments=True, mom=st.win_mom,
        stage=("defer" if recut_defer else "all")
        if recut_stage == "nobf" else recut_stage)
    win_slots = slots
    # the returned frame-moment table IS the persistent table under the
    # current (pre-BA) poses
    win_mom = win_accf
    if stop_after == "recut" or stop_after.startswith("recut_"):
        return st._replace(x=x, m=m, pool=pool0, win_slots=slots,
                           win_mom=win_mom)
    factors = fx.extract_factors(m, slots, win_w, win_valid, xs.R, xs.p,
                                 params, ms, Vmax, W, win_count=win_n,
                                 frame_moments=win_accf)
    if stop_after == "extract":
        return st._replace(x=x, m=m, pool=pool0, win_slots=slots,
                           win_mom=win_mom,
                           win_count=win_count.astype(jnp.int32)
                           + (factors.n_valid * 0))

    # ---------------- window-full branch: BA + margi + shift ----------------
    full = win_count >= W

    def full_branch(op):
        (m, pool, xs, pre_f, win_pts, win_var, win_valid, win_slots,
         win_mom, x, jour) = op
        w0 = ba.WindowPoses(R=xs.R, p=xs.p, v=xs.v, bg=xs.bg, ba=xs.ba,
                            g=xs.g[W - 1])
        if if_ba:
            lm = ba.damping_iter(w0, factors, pre_f, imu_coef, W,
                                 max_iter=ba_iters, use_normal=use_normal)
            w1, pre_f = lm.poses, lm.pre_f
        else:
            w1 = w0
        xs = xs._replace(R=w1.R, p=w1.p, v=w1.v, bg=w1.bg, ba=w1.ba)
        # only R/p flow back into the odometry state, like the reference
        # (local_mapping.cpp:501-502) and the modular _absorb_ba
        x = x._replace(R=w1.R[W - 1], p=w1.p[W - 1])
        if stop_after == "lm":  # bisect point: BA without margi/shift
            return (m, pool, xs, pre_f, win_pts, win_var, win_valid,
                    win_slots, win_mom, x, jour)

        # BA moved every pose: re-tag the moment table from the pre-BA poses
        # (w0) to the refined ones in closed form (PointCluster::transform),
        # restoring the invariant "win_mom is valid under xs"; margi then
        # consumes it directly (no per-point segment-sums).
        win_mom = vm._mom_retag(
            vm.WinMoments(cols=win_mom, R=w0.R, p=w0.p),
            m, params, xs.R, xs.p).cols

        R32 = xs.R.astype(jnp.float32)
        p32 = xs.p.astype(jnp.float32)
        ww = bmv(R32[:, None], win_pts) + p32[:, None, :]
        ww = jnp.where(win_valid[..., None], ww, 1e7)
        m, pool = vm.margi(m, pool, slots, ww, win_var, win_valid, params, ms,
                           jour, mgsize=1, tbl=win_mom)

        # shift the window (local_mapping.cpp:521-546)
        win_pts = jnp.roll(win_pts, -1, axis=0)
        win_var = jnp.roll(win_var, -1, axis=0)
        win_valid = jnp.roll(win_valid, -1, axis=0).at[W - 1].set(False)
        win_slots = jnp.roll(win_slots, -1, axis=0)
        # the marginalized frame's table row retires; the incoming frame's
        # row must be EMPTY (zero moments <-> slot -1, the push invariant)
        win_mom = jnp.roll(win_mom, -1, axis=0).at[W - 1].set(0.0)
        xs = NavState(*(jnp.roll(f, -1, axis=0) for f in xs))
        pre_f = jax.tree_util.tree_map(lambda f: jnp.roll(f, -1, axis=0), pre_f)
        return (m, pool, xs, pre_f, win_pts, win_var, win_valid, win_slots,
                win_mom, x, jour)

    # 0/1-iteration while_loop, NOT lax.cond (same reasoning as evict below):
    # the cond's untaken identity branch forced fresh output buffers for the
    # whole map + pool every step, so margi's .at[].set column updates copied
    # instead of aliasing; a while aliases its carry in place and simply runs
    # zero iterations during window warmup.
    def full_body(carry):
        out = full_branch(carry[:-1])
        return (*out, jnp.asarray(True))

    op = (m, pool0, xs, pre_f, win_pts, win_var, win_valid, win_slots,
          win_mom, x, st.jour, jnp.asarray(False))
    if assume_full:
        (m, pool, xs, pre_f, win_pts, win_var, win_valid, win_slots,
         win_mom, x, jour) = full_branch(op[:-1])
    else:
        (m, pool, xs, pre_f, win_pts, win_var, win_valid, win_slots,
         win_mom, x,
         jour, _) = jax.lax.while_loop(lambda c: ~c[-1] & full, full_body, op)
    win_count = jnp.where(full, win_count - 1, win_count)
    if stop_after in ("lm", "ba"):
        return st._replace(x=x, m=m, pool=pool, xs=xs, pre_f=pre_f,
                           win_pts=win_pts, win_var=win_var,
                           win_valid=win_valid, win_slots=win_slots,
                           win_mom=win_mom,
                           win_count=win_count.astype(jnp.int32))

    # ---------------- journey / eviction bookkeeping ----------------
    scan_idx = st.scan_idx + 1
    tick = (scan_idx % 10) == 0
    spat = jnp.linalg.norm(x.p - st.last_pos)
    move = tick & (spat > 0.5)
    jour = jnp.where(move, jour + spat.astype(jnp.float32), jour)
    last_pos = jnp.where(move, x.p, st.last_pos)

    if not assume_full:
        # 0/1-iteration while_loop, NOT lax.cond: a cond's untaken-identity
        # branch copies the ~150 MB map + pool every non-evict scan.
        # (Production — assume_full — hoists eviction OUT of the step: even
        # a zero-iteration while costs ~10 ms/scan in loop-state copies at
        # map scale, so the runner checks staleness at its drain cadence
        # and dispatches vm.evict as a separate program, matching the
        # reference's opportunistic idle-tick eviction,
        # local_mapping.cpp:317-344.) Rebuild only when the table actually
        # holds entries older than the release distance — `jour > 700`
        # alone would re-trigger the rebuild on EVERY movement tick.
        def evict_body(carry):
            mm, pp, ws, wm, _ = carry
            # the rebuild remaps every slot id: the cached window slots and
            # the persistent moment table move with their voxels (points
            # whose voxel was released drop to -1 / zero)
            mm, pp, ws, wm = vm.evict(mm, pp, jour, params, ms,
                                      win_slots=ws, win_mom=wm)
            return mm, pp, ws, wm, jnp.asarray(True)

        evictable = jnp.any((m.keys != vm.vh.EMPTY_KEY)
                            & (jour - m.jour >= ms.evict_dist))
        m, pool, win_slots, win_mom, evicted = jax.lax.while_loop(
            lambda c: ~c[4] & move & evictable, evict_body,
            (m, pool, win_slots, win_mom, jnp.asarray(False)))

    # ---------------- trajectory ring ----------------
    row = jnp.concatenate([
        x.t[None], x.p, x.R.reshape(9),
        (~res.ok).astype(jnp.float64)[None],
    ])
    traj = st.traj.at[st.traj_head % TRAJ_CAP].set(row)
    # refresh the BA-refined window tail (path rewrite, publishers.cpp:99-131):
    # when the window was full, rows head-W+1..head correspond to the
    # PRE-shift window states; jnp.roll is circular so un-rolling recovers them
    xs_pre = NavState(*(jnp.roll(f, 1, axis=0) for f in xs))
    tail_idx = (st.traj_head - jnp.arange(W - 1, -1, -1)) % TRAJ_CAP
    # the rewrite refreshes POSES only — the degeneracy-verdict column (13)
    # must survive, or every flag gets zeroed W times before it can be
    # drained (the rewrite window always includes the row just written)
    tail_rows = jnp.concatenate([
        xs_pre.t[:, None], xs_pre.p, xs_pre.R.reshape(W, 9),
        traj[tail_idx][:, 13:14],
    ], axis=1)
    traj = traj.at[tail_idx].set(jnp.where(full, tail_rows, traj[tail_idx]))
    traj_head = st.traj_head + 1

    st2 = SteadyState(
        m=m, pool=pool, x=x, xs=xs, pre_f=pre_f,
        win_pts=win_pts, win_var=win_var, win_valid=win_valid,
        win_slots=win_slots,
        win_mom=win_mom,
        win_count=win_count.astype(jnp.int32), scan_idx=scan_idx,
        degrade_cnt=degrade_cnt, jour=jour, last_pos=last_pos,
        traj=traj, traj_head=traj_head,
    )
    return st2


# Donating variant for the production driver: the previous SteadyState is
# dead after the call, so donating it lets XLA alias every .at[].set on the
# big map columns in place instead of copying them (the undonated step
# showed per-column copy ops throughout the profile). Do NOT use from
# profiling/bisect scripts that re-call with the same state — donated
# buffers cannot be reused.
steady_step_donated = partial(
    jax.jit, static_argnames=("ms", "W", "Vmax", "cfgs", "stop_after"),
    donate_argnums=(0,),
)(steady_step.__wrapped__)


# Packed-argument production path: the unpacked signature costs ~27 host->
# device transfers per frame (~12 ms of a 33 ms frame through the tunnel —
# measured by scripts/host_overhead.py). Here the per-frame payload arrives
# as THREE buffers (scan_pack (Np, 5) f32; imu_pack (K, 17) f64; scal (2,)
# f64) and everything else is a device-resident constant the runner uploads
# once (SlamRunner._fused_consts), so the host does 3 puts + 1 dispatch.
IMU_PACK_COLS = 17   # avr_gyr 3 | avr_acc 3 | dt | offt | valid
                     # | pm_gyr 3 | pm_acc 3 | pm_dt | pm_valid


def _steady_step_packed(st, scan_pack, imu_pack, scal,
                        params, noise_meas, noise_walk, cov_gyr, cov_acc,
                        cov_bg, cov_ba, ext_R, ext_p, scale_gravity,
                        imu_coef, down_size, dept_err, beam_err,
                        ms, W, Vmax, cfgs, stop_after="all"):
    pts = scan_pack[:, 0:3]
    rel_time = scan_pack[:, 3]
    pts_valid = scan_pack[:, 4] > 0.5
    avr_gyr, avr_acc = imu_pack[:, 0:3], imu_pack[:, 3:6]
    dt_i, offt_i = imu_pack[:, 6], imu_pack[:, 7]
    valid_i = imu_pack[:, 8] > 0.5
    pm_gyr, pm_acc = imu_pack[:, 9:12], imu_pack[:, 12:15]
    pm_dt = imu_pack[:, 15]
    pm_valid = imu_pack[:, 16] > 0.5
    return steady_step.__wrapped__(
        st, pts, rel_time, pts_valid,
        avr_gyr, avr_acc, dt_i, offt_i, valid_i, scal[0], scal[1],
        pm_gyr, pm_acc, pm_dt, pm_valid,
        params, noise_meas, noise_walk, cov_gyr, cov_acc, cov_bg, cov_ba,
        ext_R, ext_p, scale_gravity, imu_coef, down_size, dept_err, beam_err,
        ms=ms, W=W, Vmax=Vmax, cfgs=cfgs, stop_after=stop_after)


steady_step_packed_donated = partial(
    jax.jit, static_argnames=("ms", "W", "Vmax", "cfgs", "stop_after"),
    donate_argnums=(0,),
)(_steady_step_packed)
