#!/usr/bin/env python
"""Microbench: MXU one-hot contraction vs native gather/scatter for the
voxel-map hot paths (segment-sum into per-voxel rows; per-point row
gathers of plane/meta fields).

Hypothesis driving the round-3 kernel work: TPU element gathers/scatters
cost ~1 ms per 40k rows regardless of payload width, while a one-hot
matmul over a COMPACT active-voxel table (A ~= 4096 rows) moves the same
data through the MXU in ~0.1 ms. If true, the hot paths should carry
compact per-point active ids (aid in [0, A)) and do ALL per-voxel
reductions and lookups as (N, A) contractions, keeping the big hash table
only for cache-miss descents.
"""
import os
import time

import numpy as np

if os.environ.get("SLAM_PLATFORM", "") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERP = jax.default_backend() == "cpu"  # pallas CPU = interpret mode only

N = 40960          # window points
C = 32768          # hash-table capacity
A = 4096           # compact active-voxel cap
K = 16             # payload columns (13 used, padded to 16)

rng = np.random.default_rng(0)
seg_c = jnp.asarray(rng.integers(0, 3000, N), jnp.int32)   # ~3k live voxels
aid = jnp.asarray(rng.integers(0, 3000, N), jnp.int32)
vals = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
tblK = jnp.asarray(rng.normal(size=(A, K)).astype(np.float32))
tbl36 = jnp.asarray(rng.normal(size=(A, 40)).astype(np.float32))
tblC = jnp.asarray(rng.normal(size=(C, 8)).astype(np.float32))
slotsC = jnp.asarray(rng.integers(0, C, N), jnp.int32)


def timeit(name, fn, reps=30):
    fn()[1].block_until_ready() if isinstance(fn(), tuple) else jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:42s} {dt:8.3f} ms", flush=True)
    return dt


# ---------------------------------------------------------------- seg-sum
@jax.jit
def seg_scatter_C(seg, v):
    return jax.ops.segment_sum(v, seg, num_segments=C)


@jax.jit
def seg_scatter_A(seg, v):
    return jax.ops.segment_sum(v, seg, num_segments=A)


@jax.jit
def seg_onehot_A(seg, v):
    oh = (seg[None, :] == jax.lax.broadcasted_iota(jnp.int32, (A, 1), 0)
          ).astype(jnp.float32)
    return jax.lax.dot_general(oh, v, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


TN = 2048


def _seg_kernel(seg_ref, v_ref, o_ref, acc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    seg = seg_ref[...]          # (1, TN) int32
    v = v_ref[...]              # (TN, K)
    oh = (seg == jax.lax.broadcasted_iota(jnp.int32, (A, 1), 0)
          ).astype(jnp.float32)      # (A, TN)
    acc[...] += jax.lax.dot_general(oh, v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc[...]


@jax.jit
def seg_pallas_A(seg, v):
    return pl.pallas_call(
        _seg_kernel,
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((1, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((A, K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((A, K), jnp.float32)],
        interpret=INTERP,
    )(seg.reshape(1, N), v)


# ---------------------------------------------------------------- gathers
@jax.jit
def elem_gather_C(s):
    return tblC[s]              # (N, 8) row gather from big table


@jax.jit
def elem_gather_A(s):
    return tblK[s]              # (N, K) row gather from compact table


@jax.jit
def onehot_gather_A(s):
    oh = (s[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, A), 1)
          ).astype(jnp.float32)
    return oh @ tblK            # (N, K)


@jax.jit
def onehot_gather_A40(s):
    oh = (s[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, A), 1)
          ).astype(jnp.float32)
    return oh @ tbl36           # (N, 40): plane_pack+plane_var row


def _gather_kernel(s_ref, t_ref, o_ref):
    s = s_ref[...]              # (TN, 1)
    oh = (s == jax.lax.broadcasted_iota(jnp.int32, (1, A), 1)
          ).astype(jnp.float32)
    o_ref[...] = jnp.dot(oh, t_ref[...], preferred_element_type=jnp.float32)


@jax.jit
def pallas_gather_A40(s):
    return pl.pallas_call(
        _gather_kernel,
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((TN, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A, 40), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, 40), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 40), jnp.float32),
        interpret=INTERP,
    )(s.reshape(N, 1), tbl36)


# ------------------------------------------------- compact-id construction
@jax.jit
def build_compact(slots):
    mark = jnp.zeros(C, bool).at[slots].set(True)
    from vina_slam_tpu.mapping import voxel_hash as vh
    actives = vh.compact_indices(mark, A, -1)
    inv = jnp.full(C + 1, -1, jnp.int32).at[
        jnp.where(actives >= 0, actives, C)].set(
        jnp.arange(A, dtype=jnp.int32), mode="drop")
    aid2 = inv[slots]
    return actives, aid2


def safe(name, fn):
    try:
        timeit(name, fn)
    except Exception as e:
        print(f"{name:42s} FAILED: {type(e).__name__}", flush=True)


print(f"N={N} C={C} A={A} K={K}", flush=True)
safe("segsum scatter -> C", lambda: seg_scatter_C(seg_c, vals))
safe("segsum scatter -> A", lambda: seg_scatter_A(seg_c, vals))
safe("segsum one-hot matmul -> A (XLA)", lambda: seg_onehot_A(seg_c, vals))
safe("segsum one-hot matmul -> A (pallas)", lambda: seg_pallas_A(seg_c, vals))
safe("row gather (N,8) from C", lambda: elem_gather_C(slotsC))
safe("row gather (N,16) from A", lambda: elem_gather_A(aid))
safe("one-hot gather (N,16) from A (XLA)", lambda: onehot_gather_A(aid))
safe("one-hot gather (N,40) from A (XLA)", lambda: onehot_gather_A40(aid))
safe("one-hot gather (N,40) from A (pallas)", lambda: pallas_gather_A40(aid))
safe("compact-id build (mark+sort+inv+gather)", lambda: build_compact(slotsC))
# scatter (.at[].set) of N rows into C (the window/meta write paths)
safe("row scatter (N,16) -> C", lambda: jax.jit(
    lambda s, v: jnp.zeros((C, K), jnp.float32).at[s].set(v))(slotsC, vals))

ok1 = np.allclose(np.asarray(seg_onehot_A(seg_c, vals)),
                  np.asarray(seg_scatter_A(seg_c, vals)), atol=1e-3)
ok2 = np.allclose(np.asarray(seg_pallas_A(seg_c, vals)),
                  np.asarray(seg_scatter_A(seg_c, vals)), atol=1e-3)
ok3 = np.allclose(np.asarray(pallas_gather_A40(aid)),
                  np.asarray(tbl36[aid]), atol=1e-5)
print(f"correct: onehotA={ok1} pallasA={ok2} pallas_gather={ok3}", flush=True)
