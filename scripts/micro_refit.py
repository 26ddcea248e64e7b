"""Prototype timing: dense componentwise plane refit over ALL C slots (flat
(C,) column math, eigh3c) vs the current compacted gather->eigh3(3x3)->
scatter refit, plus the miss-path assign_insert at new-frame size."""
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

from vina_slam_tpu.core.eigh3 import eigh3, eigh3c
from vina_slam_tpu.core import cluster as cl
from vina_slam_tpu.mapping import voxel_hash as vh, voxel_map as vm


def timeit(name, fn, n=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:38s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)
    return out


C = 1 << 15
W, Np = 10, 4096
N = W * Np
rng = np.random.default_rng(0)
ms = vm.MapStatic(capacity=C, levels=3, probe=8, max_new=1024,
                  pool_capacity=1 << 15, active_cap=4096, refind_cap=4096,
                  pool_move_cap=2048)
par = vm.default_params(voxel_size=1.0)
m = vm.make_map(ms)
pts = jnp.asarray(rng.uniform(-8, 8, (N, 3)).astype(np.float32))
valid = jnp.ones(N, bool)
m, slots = vm.assign_insert(m, pts, valid, par, ms, jnp.asarray(0.0, jnp.float32))


# ---------------- current refit (compacted) as a standalone ----------------
@jax.jit
def refit_compact(m, slots):
    flat_w = pts
    flat_v = valid
    wc = vm._seg_cluster(slots, flat_w - jnp.floor(flat_w), flat_v, C)
    leaf = (m.keys != vh.EMPTY_KEY) & (m.state == 0)
    active = leaf & (wc.N > 0)
    rows = vh.compact_indices(active, ms.active_cap, C)
    ok = rows < C
    rr = jnp.minimum(rows, C - 1)
    lv_a, _, _ = vm.slot_meta(m, rr, par)
    dt = wc.P.dtype
    from vina_slam_tpu.core.pointcov import sym3_unpack
    tot = cl.Cluster(P=sym3_unpack(m.fix_P[rr]).astype(dt) + wc.P[rr],
                     v=m.fix_v[rr].astype(dt) + wc.v[rr],
                     N=m.fix_N[rr].astype(dt) + wc.N[rr])
    enough = ok & (tot.N > par.min_point[jnp.clip(lv_a, 0, 3)])
    eig, V = eigh3(cl.cov(tot))
    judged = vm._plane_judge(eig, lv_a, par)
    tgt_all = jnp.where(ok, rows, C)
    tgt_upd = jnp.where(enough, rows, C)
    is_plane = m.is_plane.at[tgt_all].set(enough & judged, mode="drop")
    eig_val = m.eig_val.at[tgt_upd].set(eig.astype(jnp.float32), mode="drop")
    eig_vec = m.eig_vec.at[tgt_upd].set(V.astype(jnp.float32), mode="drop")
    return is_plane, eig_val, eig_vec


# ---------------- dense componentwise refit ----------------
@jax.jit
def refit_dense(m, slots):
    flat_w = pts
    flat_v = valid
    sid = jnp.where(flat_v & (slots >= 0), slots, C)
    w = (flat_v & (slots >= 0)).astype(jnp.float32)
    rel = (flat_w - jnp.floor(flat_w)) * w[:, None]
    x, y, z = rel[:, 0], rel[:, 1], rel[:, 2]
    cols = jnp.stack([x * x, x * y, x * z, y * y, y * z, z * z, x, y, z, w],
                     axis=-1)  # (N, 10)
    acc = jax.ops.segment_sum(cols, sid, num_segments=C + 1)[:C]  # (C, 10)
    accT = acc.T  # (10, C) -> each component a dense (C,) row
    P00, P01, P02, P11, P12, P22 = (accT[0], accT[1], accT[2], accT[3],
                                    accT[4], accT[5])
    vx, vy, vz, wN = accT[6], accT[7], accT[8], accT[9]
    fN = m.fix_N
    fP = m.fix_P.T  # (6, C) packed
    fv = m.fix_v.T
    tN = wN + fN
    t00, t01, t02 = P00 + fP[0], P01 + fP[1], P02 + fP[2]
    t11, t12, t22 = P11 + fP[3], P12 + fP[4], P22 + fP[5]
    tvx, tvy, tvz = vx + fv[0], vy + fv[1], vz + fv[2]
    nn = jnp.maximum(tN, 1.0)
    mx, my, mz = tvx / nn, tvy / nn, tvz / nn
    c00 = t00 / nn - mx * mx
    c01 = t01 / nn - mx * my
    c02 = t02 / nn - mx * mz
    c11 = t11 / nn - my * my
    c12 = t12 / nn - my * mz
    c22 = t22 / nn - mz * mz
    (w0, w1, w2), V = eigh3c(c00, c01, c02, c11, c12, c22)
    leaf = (m.keys != vh.EMPTY_KEY) & (m.state == 0)
    upd = leaf & (wN > 0)
    lv = jnp.clip(m.vox_level, 0, 3)
    enough = upd & (tN > par.min_point[lv])
    ratio = w0 / jnp.maximum(w2, 1e-20)
    judged = (w0 < par.min_eigen_value) & (ratio < par.plane_thre[lv])
    is_plane = jnp.where(upd, enough & judged, m.is_plane)
    eigs = jnp.stack([w0, w1, w2], axis=0)  # (3, C) columns
    eig_val = jnp.where(enough, eigs, m.eig_val.T).T
    Vflat = jnp.stack([V[0][0], V[1][0], V[2][0],
                       V[0][1], V[1][1], V[2][1],
                       V[0][2], V[1][2], V[2][2]], axis=0)  # (9, C) row-major
    eig_vec = jnp.where(enough, Vflat, m.eig_vec.reshape(C, 9).T)
    eig_vec = eig_vec.T.reshape(C, 3, 3)
    return is_plane, eig_val, eig_vec


r1 = timeit("refit compacted (current)", lambda: refit_compact(m, slots))
r2 = timeit("refit dense componentwise", lambda: refit_dense(m, slots))

# correctness cross-check on the is_plane verdicts + eig values
p1, e1, V1 = jax.tree_util.tree_map(np.asarray, r1)
p2, e2, V2 = jax.tree_util.tree_map(np.asarray, r2)
print("is_plane agree:", (p1 == p2).mean())
sel = p1 & p2
print("eig_val max diff on planes:", np.abs(e1[sel] - e2[sel]).max()
      if sel.any() else "n/a", flush=True)

# ---------------- miss-path costs at new-frame size ----------------
sub = pts[:4096]
subv = valid[:4096]
keys4 = vh.encode(0, vh.coords_of(sub, par.voxel_size))
timeit("find_slots 4096x8", lambda: jax.jit(
    lambda k: vh.find_slots(m.keys, k, 8))(keys4))
timeit("assign_insert 4096 steady", lambda: jax.jit(
    lambda p, v: vm.assign_insert(m, p, v, par, ms,
                                  jnp.asarray(0.0, jnp.float32)))(sub, subv))

# Bf add at new-frame size
var4 = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None] * 1e-4, (4096, 1, 1))


@jax.jit
def addbf(m, rows, okk, ss):
    _, c_new, _ = vm.slot_meta(m, ss, par)
    relb = (pts[rows] - c_new).astype(jnp.float32)
    B = (vm._bf_var(var4, relb) * okk[:, None, None].astype(jnp.float32))
    tgt = jnp.where(okk, ss, C)
    return m.cov_add.at[tgt].add(B.astype(m.cov_add.dtype), mode="drop")


rows4 = jnp.arange(4096, dtype=jnp.int32)
timeit("add_bf 4096 (9x9 scatter)", lambda: addbf(m, rows4, subv, slots[:4096]))
