"""Voxel downsampling ops (fixed output shapes).

Reference: down_sampling_voxel / down_sampling_close
(include/vina_slam/core/point_utils.hpp:7-113) and down_sampling_pvec
(src/mapping/voxel_map.cpp:315-360). Hash-map-per-scan becomes a throwaway
open-addressing table (early-exit claim-and-verify insert; int64 sorts via
jnp.unique are emulated bitonic sorts on TPU) + segment means; the
"closest real point" variant packs (f32 distance bits | index) into one
int64 segment-min — exact and branch-free. out_size must be a power of
two (hash mask).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vina_slam_tpu.mapping import voxel_hash as vh

_SENTINEL = jnp.int64(0x7FFFFFFFFFFFFFFF)


def _seg_hash(pts, valid, voxel, out_size: int):
    """Voxelize via a fresh int32-fingerprint table (see
    vh.fingerprint32 for the collision tradeoff): returns
    (occupied (K,), seg (N,) in [0,K]). The table is >=2x out_size (next
    power of two — the probe sequence masks by T-1) to keep the load
    factor low (hash clustering at load ~0.5 cost ~10 insert rounds);
    occupied slots are then compacted into out_size rows, which may be any
    size (half-step scan buckets like 3072)."""
    # 4x out_size: at 20k-pt scans the unique-voxel count can exceed
    # out_size, so a 2x table ran at load ~0.6 and even quadratic probing
    # needed ~8 full-array rounds; load ~0.3 converges in ~4 (the extra
    # capacity costs only a wider compact_indices, ~0.1 ms)
    T = 1 << (4 * out_size - 1).bit_length()
    coords = vh.coords_of(pts, voxel)
    fp = vh.fingerprint32(vh.encode(0, coords))
    tbl, slots, _ = vh.insert_keys32(
        jnp.full((T,), vh.EMPTY32, jnp.int32), fp, valid,
        probe=32, rounds=32,  # deep probe: drops lose real points; the
                              # early-exit round loop makes unused depth free
        quadratic=True)       # linear probing's clustering at load ~0.5 ran
                              # ~30 full-array rounds at 20k-pt scans
    occ = tbl != vh.EMPTY32
    rows = vh.compact_indices(occ, out_size, T)
    inv = jnp.full(T + 1, out_size, jnp.int32).at[
        jnp.where(rows >= 0, rows, T)].set(
        jnp.arange(out_size, dtype=jnp.int32), mode="drop")
    seg = inv[jnp.where(valid & (slots >= 0), slots, T)]
    return rows >= 0, seg


@partial(jax.jit, static_argnames=("out_size",))
def downsample_mean(pts, valid, voxel, out_size: int):
    """down_sampling_voxel: one mean point per voxel.
    Returns (pts_out (out_size, 3), valid_out, n_voxels)."""
    occupied, seg = _seg_hash(pts, valid, voxel, out_size)
    w = (seg < out_size).astype(pts.dtype)
    acc = jax.ops.segment_sum(
        jnp.concatenate([pts * w[:, None], w[:, None]], axis=-1), seg,
        num_segments=out_size + 1)[:out_size]
    s, n = acc[:, 0:3], acc[:, 3]
    out_valid = occupied & (n > 0)
    out = s / jnp.maximum(n, 1.0)[:, None]
    return out, out_valid, jnp.sum(out_valid.astype(jnp.int32))


@partial(jax.jit, static_argnames=("out_size",))
def downsample_close(pts, rel_time, valid, voxel, out_size: int):
    """down_sampling_close: keep the REAL point nearest its voxel mean
    (preserves per-point timestamps for the init re-deskew path,
    node.cpp:334-341). Returns (pts_out, rel_time_out, valid_out, n)."""
    occupied, seg = _seg_hash(pts, valid, voxel, out_size)
    inb = seg < out_size
    w = inb.astype(pts.dtype)
    acc = jax.ops.segment_sum(
        jnp.concatenate([pts * w[:, None], w[:, None]], axis=-1), seg,
        num_segments=out_size + 1)[:out_size]
    s, n = acc[:, 0:3], acc[:, 3]
    mean = s / jnp.maximum(n, 1.0)[:, None]
    d = pts - mean[jnp.minimum(seg, out_size - 1)]
    dist = jnp.sum(d * d, axis=-1).astype(jnp.float32)
    # pack (distance bits, index): f32 >= 0 bit pattern is order-preserving
    packed = (
        jax.lax.bitcast_convert_type(dist, jnp.int32).astype(jnp.int64) << 32
    ) | jnp.arange(pts.shape[0], dtype=jnp.int64)
    packed = jnp.where(inb, packed, _SENTINEL)
    best = jax.ops.segment_min(packed, seg, num_segments=out_size + 1)[:out_size]
    idx = (best & jnp.int64(0xFFFFFFFF)).astype(jnp.int32)
    out_valid = occupied & (best != _SENTINEL)
    safe = jnp.clip(idx, 0, pts.shape[0] - 1)
    return pts[safe], rel_time[safe], out_valid, jnp.sum(out_valid.astype(jnp.int32))


@partial(jax.jit, static_argnames=("out_size",))
def downsample_pvec(pts, var, valid, voxel, out_size: int):
    """down_sampling_pvec (voxel_map.cpp:315-360): mean of points AND of
    their covariances per voxel."""
    occupied, seg = _seg_hash(pts, valid, voxel, out_size)
    w = (seg < out_size).astype(pts.dtype)
    s = jax.ops.segment_sum(pts * w[:, None], seg, num_segments=out_size + 1)[:out_size]
    sv = jax.ops.segment_sum(var * w[:, None, None], seg, num_segments=out_size + 1)[:out_size]
    n = jax.ops.segment_sum(w, seg, num_segments=out_size + 1)[:out_size]
    nn = jnp.maximum(n, 1.0)
    out_valid = occupied & (n > 0)
    return s / nn[:, None], sv / nn[:, None, None], out_valid, jnp.sum(out_valid.astype(jnp.int32))
