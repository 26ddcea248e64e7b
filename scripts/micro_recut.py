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

bf = jax.jit(lambda s, p, v: vm._seg_bf(s, p, jnp.tile(jnp.eye(3,dtype=jnp.float32)[None]*1e-4,(N,1,1)), v, C))
timeit("seg_bf 80k->64k (81f)", lambda: bf(sl, rel, valid))
