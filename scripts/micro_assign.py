"""Break down assign_insert's steady-state cost on the real TPU."""
import time
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from vina_slam_tpu.mapping import voxel_hash as vh, voxel_map as vm


def timeit(name, fn, n=10):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)
    return out


C = 1 << 16
N = 40960
rng = np.random.default_rng(0)
ms = vm.MapStatic(capacity=C, levels=3, probe=8, max_new=2048, pool_capacity=1 << 16)
par = vm.default_params(voxel_size=1.0)
m = vm.make_map(ms)
pts = jnp.asarray(rng.uniform(-20, 20, (N, 3)).astype(np.float32))
valid = jnp.ones(N, bool)
for _ in range(25):   # converge: creation is throttled to max_new per call
    m, slots = vm.assign_insert(m, pts, valid, par, ms, jnp.asarray(0.0, jnp.float32))
print("unplaced(-1):", int(jnp.sum(valid & (slots == -1))),
      "window-full(-2):", int(jnp.sum(valid & (slots == -2))), flush=True)
keys0 = vh.encode(0, vh.coords_of(pts, par.voxel_size))

f1 = jax.jit(lambda k: vh.find_slots(m.keys, k, 8))
timeit("1x find_slots 40k", lambda: f1(keys0))


@jax.jit
def finds3(p):
    root = vh.coords_of(p, par.voxel_size)
    s = vh.find_slots(m.keys, vh.encode(0, root), 8)
    coords = root
    for l in range(1, ms.levels):
        edge = par.voxel_size / (2.0 ** (l - 1))
        split = (s >= 0) & (m.state[jnp.maximum(s, 0)] == 1)
        center = (coords.astype(jnp.float32) + 0.5) * edge
        cc = 2 * coords + (p > center).astype(jnp.int32)
        cs = vh.find_slots(m.keys, vh.encode(l, cc), 8)
        s = jnp.where(split, cs, s)
        coords = jnp.where(split[..., None], cc, coords)
    return s


timeit("finds-only descend (3 lvl)", lambda: finds3(pts))

ai = jax.jit(lambda p, v: vm.assign_insert(m, p, v, par, ms, jnp.asarray(0.0, jnp.float32)))
timeit("assign_insert steady", lambda: ai(pts, valid))

ai_nr = jax.jit(lambda p, v: vm.assign_insert(m, p, v, par, ms,
                                              jnp.asarray(0.0, jnp.float32),
                                              create_roots=False))
timeit("assign_insert no-roots", lambda: ai_nr(pts, valid))


@jax.jit
def cond_identity(mm, flag):
    return jax.lax.cond(flag, lambda x: x, lambda x: x, mm)


timeit("cond identity full map", lambda: cond_identity(m, jnp.asarray(False)))


# cached-slot verify: gather stored key, compare against recomputed leaf key
@jax.jit
def verify_cached(p, cached):
    s = jnp.maximum(cached, 0)
    lv, coords = vh.decode(m.keys[s])
    edge = par.voxel_size / (2.0 ** jnp.maximum(lv - 1, 0)) / jnp.where(lv > 0, 1.0, 1.0)
    edge = par.voxel_size * (0.5 ** lv.astype(jnp.float32)) * jnp.where(lv > 0, 2.0, 1.0)
    my = vh.coords_of(p, edge[..., None])
    ok = (cached >= 0) & jnp.all(my == coords, axis=-1) & (m.state[s] == 0)
    return ok


timeit("cached-slot verify", lambda: verify_cached(pts, slots))
