"""Recut-internals breakdown at REAL big-world state (20k pts/scan,
C=2^16, npad 8192): warm-starts from the bench checkpoint and times each
piece of the persistent-table recut wave in isolation. Recut is 16.6 ms
of the 43.4 ms big-world frame (scripts/bisect_fused.py BIS_BIG=1) — the
dominant stage; this pinpoints where inside it the time goes."""
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

from vina_slam_tpu.core.config import SlamConfig
from vina_slam_tpu.mapping import voxel_hash as vh, voxel_map as vm
from vina_slam_tpu.pipeline.runner import SlamRunner
from vina_slam_tpu.platform import checkpoint as ck
from vina_slam_tpu.sensor import synth
from vina_slam_tpu.core.mat3 import bmv


def timeit(name, fn, n=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:36s} {dt*1e3:9.2f} ms", flush=True)
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
    assert split is not None
    for f in frames[split:split + 3]:
        runner.process_frame(f)
    runner.sync()
    runner.sync_from_fused()

    st = runner._fused
    params, ms, W = runner.params, runner.ms, runner.W
    C = ms.capacity
    m = jax.tree_util.tree_map(jnp.copy, st.m)
    pool = jax.tree_util.tree_map(jnp.copy, st.pool)
    win_valid = jnp.copy(st.win_valid)
    win_slots = jnp.copy(st.win_slots)
    win_var = jnp.copy(st.win_var)
    win_mom = jnp.copy(st.win_mom)
    xs = st.xs
    R32 = xs.R.astype(jnp.float32)
    p32 = xs.p.astype(jnp.float32)
    win_w = bmv(R32[:, None], jnp.copy(st.win_pts)) + p32[:, None, :]
    win_w = jnp.where(win_valid[..., None], win_w, 1e7)
    Np = win_w.shape[1]
    i = jnp.minimum(st.win_count, W - 1)
    new_mask = jnp.broadcast_to((jnp.arange(W) == i)[:, None],
                                win_valid.shape)
    # fresh frame row has no cached slots, like the fused step's hint
    hint = win_slots.at[i].set(-1)

    jour = jnp.asarray(float(st.jour), jnp.float32)

    # ---- the real thing: full recut (persistent path) + wave count ----
    rc = jax.jit(lambda h, mom_: vm.recut(
        m, pool, win_w, win_valid, params, ms, W, jour, cached=h,
        win_var=win_var, new_mask=new_mask, return_counts=True,
        return_frame_moments=True, mom=mom_), static_argnames=())
    timeit("recut persistent (fused form)", lambda: rc(hint, win_mom), n=5)

    dbg = vm.recut(m, pool, win_w, win_valid, params, ms, W, jour,
                   cached=hint, win_var=win_var, new_mask=new_mask,
                   debug=True, mom=win_mom)
    waves, n_lost, n_full = dbg[4]
    print(f"  waves={int(waves)} lost={int(n_lost)} probe_full={int(n_full)}",
          flush=True)

    # ---- pieces ----
    flat_w = win_w.reshape(-1, 3)
    flat_v = win_valid.reshape(-1)
    prev = hint.reshape(-1)
    Npts = flat_v.shape[0]

    @jax.jit
    def verify(prev):
        sc = jnp.maximum(prev, 0)
        r = m.meta_pack[sc]
        lv_c = r[:, 0]
        st_c = r[:, 4]
        coords_c = r[:, 1:4]
        key_ok = lv_c >= 0
        edge_c = params.voxel_size / (2.0 ** jnp.maximum(lv_c, 0).astype(jnp.float32))
        my_coords = vh.coords_of(flat_w, edge_c[:, None])
        ok_cached = (flat_v & (prev >= 0) & key_ok & (st_c == 0)
                     & jnp.all(my_coords == coords_c, axis=-1))
        return ok_cached

    ok_cached = timeit("verify gather 82k", lambda: verify(prev))
    need = flat_v & ~ok_cached
    print(f"  need re-descend: {int(jnp.sum(need))}", flush=True)

    comp = jax.jit(lambda msk: vh.compact_indices(msk, ms.refind_cap, -1))
    rows = timeit("compact_indices 82k->12288", lambda: comp(need))
    sub_valid = rows >= 0
    sel = jnp.maximum(rows, 0)
    sub_pts = flat_w[sel]

    ai = jax.jit(lambda p, v: vm.assign_insert(m, p, v, params, ms, jour,
                                               create_roots=True))
    _, sub_slots = timeit("assign_insert 12288", lambda: ai(sub_pts, sub_valid))

    @jax.jit
    def mom_scatter2(tbl, sub_slots):
        f_sel = (sel // Np).astype(jnp.int32)
        v_sel = sub_valid & flat_v[sel]
        prev_sel = prev[sel]
        _, c_prev, _ = vm.slot_meta(m, prev_sel, params)
        tbl = vm._mom_scatter(tbl, f_sel, jnp.maximum(prev_sel, 0),
                              sub_pts - c_prev, v_sel & (prev_sel >= 0),
                              -1.0, C)
        _, c_new, _ = vm.slot_meta(m, sub_slots, params)
        tbl = vm._mom_scatter(tbl, f_sel, jnp.maximum(sub_slots, 0),
                              sub_pts - c_new, v_sel & (sub_slots >= 0),
                              1.0, C)
        return tbl

    timeit("mom_scatter x2 12288", lambda: mom_scatter2(win_mom, sub_slots))

    flat_var = win_var.reshape(-1, 6)
    flat_new = new_mask.reshape(-1)

    @jax.jit
    def addbf(sub_slots):
        _, c_new, _ = vm.slot_meta(m, sub_slots, params)
        relb = (flat_w[sel] - c_new).astype(jnp.float32)
        bf_ok = sub_valid & (sub_slots >= 0) & ((prev[sel] == -1) & flat_new[sel])
        B = (vm._bf_var45(flat_var[sel], relb)
             * bf_ok[:, None].astype(jnp.float32))
        tgt = jnp.where(bf_ok, sub_slots, C)
        return m.cov_add.at[tgt].add(B.astype(m.cov_add.dtype), mode="drop")

    timeit("add_bf 12288 (45-col)", lambda: addbf(sub_slots))

    # refit persistent: table sum + dense componentwise refit
    @jax.jit
    def refit_sum(tbl):
        return tbl.sum(axis=0).T

    timeit("tbl.sum (W,C,10)->(10,C)", lambda: refit_sum(win_mom))

    from vina_slam_tpu.core.eigh3 import eigh3c
    acc = refit_sum(win_mom)

    @jax.jit
    def dense_refit(acc):
        wN = acc[9]
        fP = m.fix_P.T
        fv = m.fix_v.T
        tN = wN + m.fix_N
        t00, t01, t02 = acc[0] + fP[0], acc[1] + fP[1], acc[2] + fP[2]
        t11, t12, t22 = acc[3] + fP[3], acc[4] + fP[4], acc[5] + fP[5]
        nn = jnp.maximum(tN, 1.0)
        mx, my, mz = (acc[6] + fv[0]) / nn, (acc[7] + fv[1]) / nn, (acc[8] + fv[2]) / nn
        c00 = t00 / nn - mx * mx
        c01 = t01 / nn - mx * my
        c02 = t02 / nn - mx * mz
        c11 = t11 / nn - my * my
        c12 = t12 / nn - my * mz
        c22 = t22 / nn - mz * mz
        (w0, w1, w2), V = eigh3c(c00, c01, c02, c11, c12, c22)
        return w0, w1, w2, V

    timeit("dense refit C=65536", lambda: dense_refit(acc))

    pf = jax.jit(lambda: vm._pool_fix(m, pool, params, ms, jour))
    timeit("_pool_fix", lambda: pf())

    # plane_update/margi counterparts for context
    @jax.jit
    def slot_meta_g(s):
        return vm.slot_meta(m, s, params)

    timeit("slot_meta 12288", lambda: slot_meta_g(sub_slots))


if __name__ == "__main__":
    main()
