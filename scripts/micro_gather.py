"""Micro-benchmarks for the gather/compaction strategies underlying the
hash-probe redesign: element-gather vs packed-row gather, int64 vs int32
fingerprints, and compact_indices alternatives. Run on the real TPU."""
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

from vina_slam_tpu.mapping import voxel_hash as vh


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
N = 40960
rng = np.random.default_rng(0)
tbl64 = jnp.asarray(rng.integers(0, 1 << 60, C, dtype=np.int64))
tbl32 = jnp.asarray(rng.integers(1, 1 << 31, C, dtype=np.int32))
tbl_rows = tbl32.reshape(C // 8, 8)
meta8 = jnp.asarray(rng.integers(0, 100, (C, 8), dtype=np.int32))
metaf8 = jnp.asarray(rng.normal(size=(C, 8)).astype(np.float32))
h0 = jnp.asarray(rng.integers(0, C, N, dtype=np.int32))
q64 = jnp.asarray(rng.integers(0, 1 << 60, N, dtype=np.int64))

offs = jnp.arange(8, dtype=jnp.int32)


@jax.jit
def elem_gather64(h0):
    cand = (h0[:, None] + offs[None, :]) & jnp.int32(C - 1)
    return tbl64[cand]


@jax.jit
def elem_gather32(h0):
    cand = (h0[:, None] + offs[None, :]) & jnp.int32(C - 1)
    return tbl32[cand]


@jax.jit
def row_gather32(h0):
    r0 = (h0 >> 3) & jnp.int32(C // 8 - 1)
    r1 = (r0 + 1) & jnp.int32(C // 8 - 1)
    return tbl_rows[r0], tbl_rows[r1]  # (N, 8) x2 covering h0..h0+8


@jax.jit
def single_elem_gather64(h0):
    return tbl64[h0]


@jax.jit
def meta_row_gather(h0):
    return meta8[h0]


@jax.jit
def meta_elem_gather5(h0):
    return (meta8[h0, 0], meta8[h0, 1], meta8[h0, 2], meta8[h0, 3],
            meta8[h0, 4])


@jax.jit
def planef_row_gather(h0):
    return metaf8[h0]


timeit("elem gather (N,8) int64", lambda: elem_gather64(h0))
timeit("elem gather (N,8) int32", lambda: elem_gather32(h0))
timeit("row  gather (N,8)x2 int32", lambda: row_gather32(h0))
timeit("elem gather (N,) int64", lambda: single_elem_gather64(h0))
timeit("meta row gather (N,8) i32", lambda: meta_row_gather(h0))
timeit("meta elem gather 5x(N,) i32", lambda: meta_elem_gather5(h0))
timeit("plane row gather (N,8) f32", lambda: planef_row_gather(h0))

# wider payload rows (plane_var packing would need (C, 24) f32)
metaf24 = jnp.asarray(rng.normal(size=(C, 24)).astype(np.float32))
timeit("plane row gather (N,24) f32",
       lambda: jax.jit(lambda i: metaf24[i])(h0))

# ----- compaction variants: mask (N,) with ~2k true -> indices (4096,)
mask = jnp.asarray(rng.random(N) < 0.05)
SZ = 4096
timeit("compact_indices (matmul+scatter)",
       lambda: jax.jit(lambda m: vh.compact_indices(m, SZ, -1))(mask))


@jax.jit
def compact_sorted(m):
    # argsort keys: ~mask then index (stable ascending) — one 32-bit sort
    key = jnp.where(m, jnp.arange(N, dtype=jnp.int32),
                    jnp.int32(N))
    srt = jax.lax.sort(key)[:SZ]
    return jnp.where(srt < N, srt, -1)


timeit("compact via lax.sort", lambda: compact_sorted(mask))


@jax.jit
def compact_searchsorted(m):
    cum = jnp.cumsum(m.astype(jnp.int32))
    k = jnp.arange(1, SZ + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(cum, k, side="left")
    ok = k <= cum[-1]
    return jnp.where(ok, idx.astype(jnp.int32), -1)


timeit("compact via cumsum+searchsorted", lambda: compact_searchsorted(mask))

# correctness cross-check
a = np.asarray(vh.compact_indices(mask, SZ, -1))
b = np.asarray(compact_sorted(mask))
c = np.asarray(compact_searchsorted(mask))
print("sort matches:", np.array_equal(a, b), "searchsorted matches:",
      np.array_equal(a, c), flush=True)
