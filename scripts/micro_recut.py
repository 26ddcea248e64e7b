"""Micro-timing of recut's constituent ops on the real TPU."""
import time
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from vina_slam_tpu.mapping import voxel_hash as vh, voxel_map as vm
from vina_slam_tpu.core.eigh3 import eigh3
from vina_slam_tpu.core import cluster as cl

def timeit(name, fn, n=10):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)
    return out

C = 1 << 16
N = 81920
rng = np.random.default_rng(0)
ms = vm.MapStatic(capacity=C, levels=3, probe=8, max_new=2048, pool_capacity=1<<16)
par = vm.default_params(voxel_size=1.0)
m = vm.make_map(ms)
pts = jnp.asarray(rng.uniform(-20, 20, (N, 3)).astype(np.float32))
valid = jnp.ones(N, bool)
m, slots = vm.assign_insert(m, pts, valid, par, ms, jnp.asarray(0.0, jnp.float32))
keys = vh.encode(0, vh.coords_of(pts, par.voxel_size))

f = jax.jit(lambda k: vh.find_slots(m.keys, k, 8))
timeit("find_slots 80k x8probe", lambda: f(keys))

ins = jax.jit(lambda k: vh.insert_keys(m.keys, k, jnp.zeros(N, bool), 8, rounds=8))
timeit("insert_keys 80k allfalse", lambda: ins(keys))

ins2 = jax.jit(lambda k: vh.insert_keys(m.keys, k[:2048], jnp.ones(2048, bool), 8, rounds=8))
timeit("insert_keys 2k", lambda: ins2(keys))

nzf = jax.jit(lambda mask: jnp.nonzero(mask, size=2048, fill_value=-1)[0])
timeit("nonzero 80k->2k", lambda: nzf(valid))

sl = jnp.asarray(np.asarray(slots))
rel = pts - jnp.floor(pts)
seg = jax.jit(lambda s, p, v: vm._seg_cluster(s, p, v, C))
timeit("seg_cluster 80k->64k", lambda: seg(sl, rel, valid))

A = jnp.asarray(rng.normal(size=(C, 3, 3)).astype(np.float32))
A = jnp.einsum('cij,ckj->cik', A, A)
timeit("eigh3 64k f32", lambda: eigh3(A))

sm = jax.jit(lambda s: vm.slot_meta(m, s, par))
timeit("slot_meta arange(C)", lambda: sm(jnp.arange(C)))

ai = jax.jit(lambda p, v: vm.assign_insert(m, p, v, par, ms, jnp.asarray(0.0, jnp.float32)))
timeit("assign_insert 80k steady", lambda: ai(pts, valid))



# ---- bench-shape internals: W=10 x Np=4096 window over C=1<<15 ----
print("---- bench shapes ----", flush=True)
C2 = 1 << 15
W, Np = 10, 4096
ms2 = vm.MapStatic(capacity=C2, levels=3, probe=8, max_new=1024,
                   pool_capacity=1 << 15, active_cap=4096, refind_cap=4096,
                   pool_move_cap=2048)
m2 = vm.make_map(ms2)
pts2 = jnp.asarray(rng.uniform(-8, 8, (W * Np, 3)).astype(np.float32))
valid2 = jnp.ones(W * Np, bool)
m2, slots2 = vm.assign_insert(m2, pts2, valid2, par, ms2,
                              jnp.asarray(0.0, jnp.float32))

seg = jax.jit(lambda s, p, v: vm._seg_cluster(s, p, v, C2))
timeit("seg_cluster 40960->32k", lambda: seg(slots2, pts2, valid2))

meta = jax.jit(lambda s: vm.slot_meta(m2, s, par))
timeit("slot_meta gather 40960", lambda: meta(slots2))

comp = jax.jit(lambda mask: vh.compact_indices(mask, 4096, -1))
timeit("compact_indices 40960", lambda: comp(valid2[:40960] & (slots2 >= 0)))
compC = jax.jit(lambda mask: vh.compact_indices(mask, 4096, C2))
timeit("compact_indices 32768(C)", lambda: compC(m2.keys != vh.EMPTY_KEY))

e3 = jax.jit(lambda P: eigh3(P))
Ps = jnp.asarray(rng.normal(size=(4096, 3, 3)).astype(np.float32))
Ps = Ps @ jnp.swapaxes(Ps, -1, -2)
timeit("eigh3 4096", lambda: e3(Ps))

# verify gather chain (assign_cached's ok_cached test)
def verify(prev):
    sc = jnp.maximum(prev, 0)
    lv_c = m2.vox_level[sc]
    key_ok = lv_c >= 0
    coords_c = m2.vox_coords[sc]
    edge_c = par.voxel_size / (2.0 ** jnp.maximum(lv_c, 0).astype(jnp.float32))
    my_coords = vh.coords_of(pts2, edge_c[:, None])
    return (valid2 & (prev >= 0) & key_ok & (m2.state[sc] == 0)
            & jnp.all(my_coords == coords_c, axis=-1))
vf = jax.jit(verify)
timeit("verify gathers 40960", lambda: vf(slots2))

# full recut steady (cached slots, no splits)
win_w = pts2.reshape(W, Np, 3)
win_valid = valid2.reshape(W, Np)
win_var = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None, None] * 1e-4,
                   (W, Np, 1, 1))
new_mask = jnp.broadcast_to((jnp.arange(W) == W - 1)[:, None], (W, Np))
rc = jax.jit(lambda s: vm.recut(m2, vm.make_pool(ms2), win_w, win_valid, par,
                                ms2, W, jnp.asarray(0.0, jnp.float32),
                                cached=s, win_var=win_var, new_mask=new_mask))
timeit("recut cached steady", lambda: rc(slots2.reshape(W, Np)), n=5)
