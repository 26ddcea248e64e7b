"""The global probabilistic voxel map — TPU-native redesign.

Reference: include/vina_slam/mapping/octree.hpp + src/mapping/octree.cpp and
voxel_map.cpp. The reference stores a hash-of-octrees of mutex-guarded
OctoTree nodes, each holding per-window SlideWindow point storage, fixed
(marginalized) statistics, and fitted plane parameters. Here every octree
node (any level) is a row of ONE flat hash table (see voxel_hash.py), and
the per-voxel *window* statistics are never stored: they are recomputed each
step by masked segment-sums over the window's point buffers — functional,
race-free, and cheap on TPU (a few MB of streaming per scan).

Semantic mapping (reference -> here):
  cut_voxel/cut_voxel_multi (voxel_map.cpp:4-135)  -> assign_insert()
  OctoTree::recut + subdivide (octree.cpp:335-393) -> recut(): fixed number
      of split waves; each wave reassigns points, re-fits planes, and marks
      non-planar populated nodes for subdivision
  OctoTree::match (octree.cpp:551-595)             -> match_points()
  matchVoxelMap 27-neighbor (voxel_map.cpp:268)    -> match_neighbors()
  OctoTree::margi + plane_update (octree.cpp:302-495) -> margi()
  700 m eviction (local_mapping.cpp:317-344)       -> evict()

Numerical note: all cluster moments are accumulated RELATIVE TO THE VOXEL
CENTER so f32 second moments never suffer catastrophic cancellation; plane
eigenstructure and covariance are shift-invariant under this recentering.

Known reference discrepancy (documented, intentional): the shipped
OctoTree::match never writes its max_prob output, so matchVoxelMap's
best-probability selection can never fire and VNC silently contributes
nothing (octree.cpp:551-595, voxel_map.cpp:296-307). We implement the
documented intent (docs/VNCLio_formulation.md): neighbor matches are ranked
by certainty 1/(sigma_l + eps) and the best one is returned.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vina_slam_tpu.core import cluster as cl
from vina_slam_tpu.core import so3
from vina_slam_tpu.core.mat3 import bmm, bmmT, bmv
from vina_slam_tpu.core.eigh3 import eigh3, eigh3c
from vina_slam_tpu.mapping import voxel_hash as vh


# Packed symmetric 6x6: row-major upper-triangle order. SYM6[a][b] is the
# packed column of entry (a, b); diagonals are 0,6,11,15,18,20.
SYM6 = [[0] * 6 for _ in range(6)]
_k = 0
for _a in range(6):
    for _b in range(_a, 6):
        SYM6[_a][_b] = SYM6[_b][_a] = _k
        _k += 1


def sym3_quadform(var, n):
    """n^T S n for a point covariance: accepts SYM3-packed (..., 6) or full
    (..., 3, 3)."""
    if var.shape[-1] == 6:
        n0, n1, n2 = n[..., 0], n[..., 1], n[..., 2]
        return (n0 * n0 * var[..., 0] + n1 * n1 * var[..., 3]
                + n2 * n2 * var[..., 5]
                + 2.0 * (n0 * n1 * var[..., 1] + n0 * n2 * var[..., 2]
                         + n1 * n2 * var[..., 4]))
    return jnp.sum(bmv(var, n) * n, axis=-1)


def sym6_quadform(p21, j6):
    """j^T S j for a packed symmetric 6x6: p21 (..., 21), j6 tuple/list of 6
    (...,) components. Pure lane-wise VPU work — no 6x6 materialization."""
    acc = 0.0
    for a in range(6):
        acc = acc + j6[a] * j6[a] * p21[..., SYM6[a][a]]
        for b in range(a + 1, 6):
            acc = acc + 2.0 * j6[a] * j6[b] * p21[..., SYM6[a][b]]
    return acc


# Packed symmetric 9x9 (same convention): SYM9[r][c] -> packed column of 45.
SYM9 = [[0] * 9 for _ in range(9)]
_k = 0
for _a in range(9):
    for _b in range(_a, 9):
        SYM9[_a][_b] = SYM9[_b][_a] = _k
        _k += 1


class MapStatic(NamedTuple):
    """Hashable jit-static geometry of the map."""
    capacity: int = 1 << 18
    levels: int = 3           # max_layer + 1
    probe: int = 16
    max_new: int = 4096       # new hash entries per insert wave
    pool_capacity: int = 1 << 20
    active_cap: int = 1 << 14  # max leaves refit per recut wave (compaction)
    refind_cap: int = 1 << 14  # max cache-miss points re-descended per recut
    pool_move_cap: int = 1 << 14  # max pool points redistributed per split wave
    evict_dist: float = 700.0  # journey-distance release threshold
                               # (local_mapping.cpp:323); configurable so
                               # tests can exercise eviction on short runs


class MapParams(NamedTuple):
    """Runtime (traced) map parameters; mirrors the reference globals set
    from config (octree.cpp:66-75)."""
    voxel_size: jnp.ndarray          # root edge length
    min_eigen_value: jnp.ndarray     # plane gate on lambda_min
    plane_thre: jnp.ndarray          # (4,) per-layer lambda0/lambda2 gates (inverted yaml)
    min_point: jnp.ndarray           # (4,) per-layer minimum N
    max_points: jnp.ndarray          # fix seal threshold (default 100)


def default_params(voxel_size=1.0, min_eigen_value=0.0025,
                   plane_thre=(0.25, 0.25, 0.25, 0.25),
                   min_point=(20, 20, 15, 10), max_points=100) -> MapParams:
    return MapParams(
        voxel_size=jnp.asarray(voxel_size, jnp.float32),
        min_eigen_value=jnp.asarray(min_eigen_value, jnp.float32),
        plane_thre=jnp.asarray(plane_thre, jnp.float32),
        min_point=jnp.asarray(min_point, jnp.float32),
        max_points=jnp.asarray(max_points, jnp.float32),
    )


class VoxelMap(NamedTuple):
    keys: jnp.ndarray          # (C,) int64, EMPTY_KEY when free
    fkeys: jnp.ndarray         # (C,) int32 fingerprint shadow of `keys`
                               # (0 when free): lookups probe this table as
                               # contiguous 8-wide row gathers (~3x cheaper
                               # than int64 element gathers); the int64 keys
                               # stay authoritative for insertion
    state: jnp.ndarray         # (C,) int32: 0 leaf, 1 split
    sealed: jnp.ndarray        # (C,) bool: fixed stats frozen (>= max_points)
    fix_P: jnp.ndarray         # (C, 6) f32 SYM3-packed second moments,
                               # voxel-center-relative
    fix_v: jnp.ndarray         # (C, 3) f32
    fix_N: jnp.ndarray         # (C,) f32
    cov_add: jnp.ndarray       # (C, 45) f32 SYM9-packed Bf_var accumulator of ALL points
                               # at their insertion-time world positions (the
                               # reference's ever-growing cov_add, octree.cpp:173-176)
    plane_center: jnp.ndarray  # (C, 3) f32 world
    plane_normal: jnp.ndarray  # (C, 3) f32
    plane_pack: jnp.ndarray    # (C, 8) f32 gather-packed match row
                               # [nx, ny, nz, cx, cy, cz, radius, is_plane]:
                               # the per-point match gate reads one row
                               # instead of 4 separate gathers
    plane_var: jnp.ndarray     # (C, 21) f32 packed upper triangle of the
                               # symmetric 6x6 (normal, center) covariance,
                               # row-major (a<=b; see SYM6 / sym6_quadform).
                               # Packed because the matcher GATHERS a row
                               # per query point: 21 lanes move ~40% of the
                               # 36, and a (.., 6, 6) minor-dim layout pads
                               # to full (8, 128) tiles on TPU
    plane_radius: jnp.ndarray  # (C,) f32 (= lambda_max)
    is_plane: jnp.ndarray      # (C,) bool
    eig_val: jnp.ndarray       # (C, 3) f32
    eig_vec: jnp.ndarray       # (C, 3, 3) f32
    last_num: jnp.ndarray      # (C,) f32
    jour: jnp.ndarray          # (C,) f32 journey stamp for eviction
    vox_level: jnp.ndarray     # (C,) i32 decoded key level (-1 when free) —
                               # int64 key decodes are u32-pair emulated and
                               # cost ~4 ms per 40k-point gather+decode
    vox_coords: jnp.ndarray    # (C, 3) i32 decoded key coords
    child_slots: jnp.ndarray   # (C, 8) i32 child-link row, octant-indexed
                               # (oct = (cx&1)<<2 | (cy&1)<<1 | (cz&1)):
                               # -1 everywhere on a LEAF, and on a SPLIT
                               # node -2 for absent children / the child's
                               # table slot otherwise. The octree walk
                               # (_walk) reads ONE 8-lane row per level in
                               # place of a state gather plus a 3-row
                               # fingerprint probe of the child key (~2x
                               # fewer gathers per descent). Invariant:
                               # state==1 <=> the row holds no -1 lane;
                               # maintained at split (recut refit), child
                               # creation (_create_level), and table
                               # rebuild (evict / shard_table via
                               # rebuild_child_links)
    meta_pack: jnp.ndarray     # (C, 8) i32 gather-packed hot row
                               # [level, cx, cy, cz, state, 0, 0, 0]: the
                               # verify/slot_meta chains read one contiguous
                               # 32-byte row per point instead of 5 element
                               # gathers (~2x cheaper, micro_gather.py);
                               # kept in sync at every vox_level/vox_coords/
                               # state write site
    n_dropped: jnp.ndarray     # () i32 diagnostic: inserts dropped (table full)


class FixPool(NamedTuple):
    """Raw fixed-point ring pool — the point_fix analog (octree.hpp:30).
    Holds world points + covariances of marginalized frames for voxels that
    have not yet sealed, so later subdivisions can redistribute them."""
    pts: jnp.ndarray    # (F, 3) f32 world
    var: jnp.ndarray    # (F, 6) f32 SYM3-packed world point covariance
    valid: jnp.ndarray  # (F,) bool
    slot: jnp.ndarray   # (F,) i32 cached leaf assignment (refreshed on
                        # split redistribution and eviction)
    head: jnp.ndarray   # () i32 ring position
    n_dropped: jnp.ndarray  # () i32 diagnostic


def make_map(ms: MapStatic) -> VoxelMap:
    C = ms.capacity
    f32 = jnp.float32
    return VoxelMap(
        keys=jnp.full((C,), vh.EMPTY_KEY, jnp.int64),
        fkeys=jnp.zeros(C, jnp.int32),
        state=jnp.zeros(C, jnp.int32),
        sealed=jnp.zeros(C, bool),
        fix_P=jnp.zeros((C, 6), f32),
        fix_v=jnp.zeros((C, 3), f32),
        fix_N=jnp.zeros(C, f32),
        cov_add=jnp.zeros((C, 45), f32),
        plane_center=jnp.zeros((C, 3), f32),
        plane_normal=jnp.zeros((C, 3), f32),
        plane_pack=jnp.zeros((C, 8), f32),
        plane_var=jnp.zeros((C, 21), f32),
        plane_radius=jnp.zeros(C, f32),
        is_plane=jnp.zeros(C, bool),
        eig_val=jnp.zeros((C, 3), f32),
        eig_vec=jnp.zeros((C, 3, 3), f32),
        last_num=jnp.zeros(C, f32),
        jour=jnp.zeros(C, f32),
        vox_level=jnp.full(C, -1, jnp.int32),
        vox_coords=jnp.zeros((C, 3), jnp.int32),
        child_slots=jnp.full((C, 8), -1, jnp.int32),
        meta_pack=_meta_rows(jnp.full(C, -1, jnp.int32),
                             jnp.zeros((C, 3), jnp.int32),
                             jnp.zeros(C, jnp.int32)),
        n_dropped=jnp.zeros((), jnp.int32),
    )


def _meta_rows(level, coords, state):
    """Assemble packed meta rows [level, cx, cy, cz, state, 0, 0, 0]."""
    z = jnp.zeros_like(level)
    return jnp.stack([level, coords[..., 0], coords[..., 1], coords[..., 2],
                      state, z, z, z], axis=-1)


def make_pool(ms: MapStatic) -> FixPool:
    F = ms.pool_capacity
    return FixPool(
        pts=jnp.zeros((F, 3), jnp.float32),
        var=jnp.zeros((F, 6), jnp.float32),
        valid=jnp.zeros(F, bool),
        slot=jnp.full((F,), -1, jnp.int32),
        head=jnp.zeros((), jnp.int32),
        n_dropped=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------- geometry

def slot_meta(m: VoxelMap, slots, params: MapParams):
    """(level, voxel center, edge) of table slots; safe for slot==-1.
    ONE packed-row gather (meta_pack) instead of 4 element gathers of
    vox_level + vox_coords."""
    s = jnp.maximum(slots, 0)
    r = m.meta_pack[s]                   # (..., 8)
    lv = jnp.maximum(r[..., 0], 0)       # free rows are -1; callers mask
    coords = r[..., 1:4]
    edge = params.voxel_size / (2.0 ** lv.astype(jnp.float32))
    center = (coords.astype(jnp.float32) + 0.5) * edge[..., None]
    return lv, center, edge


# ------------------------------------------------------------ descent walk

def _octant(coords):
    """Octant lane index of a child's coords within its parent's row."""
    return ((coords[..., 0] & 1) * 4 + (coords[..., 1] & 1) * 2
            + (coords[..., 2] & 1))


def _walk(m: VoxelMap, root_coords, wld, params: MapParams, ms: MapStatic):
    """Descend from given root coords through split nodes toward the point.

    Octant choice replicates OctoTree::match (octree.cpp:583-591): compare
    the query to the CURRENT node's center, even if the query lies outside
    the node (the 27-neighbor VNC search relies on this clamping behavior).

    Each level reads ONE 8-lane child_slots row and selects the octant lane
    (a pure VPU 8-way select) — the earlier form paid a state gather plus a
    3-row fingerprint probe of the child key per level. The row encodes the
    split decision too: a -1 lane means LEAF (keep the node), -2 means split
    with this child absent (no leaf), >= 0 is the child's slot.

    Returns (slot, level, coords): slot==-1 if the root or a required child
    is missing."""
    key0 = vh.encode(0, root_coords)
    slot = vh.find_slots_fp(m.fkeys, key0, ms.probe)
    coords = root_coords
    level = jnp.zeros(wld.shape[:-1], jnp.int32)
    for l in range(1, ms.levels):
        edge = params.voxel_size / (2.0 ** (l - 1))
        ok = slot >= 0
        crow = m.child_slots[jnp.maximum(slot, 0)]          # (..., 8)
        center = (coords.astype(jnp.float32) + 0.5) * edge
        oct_up = (wld > center).astype(jnp.int32)
        child_coords = 2 * coords + oct_up
        oct = _octant(child_coords)
        cslot = jnp.full_like(slot, -1)
        for k in range(8):
            cslot = jnp.where(oct == k, crow[..., k], cslot)
        split = ok & (cslot != -1)
        slot = jnp.where(split, jnp.maximum(cslot, -1), slot)
        coords = jnp.where(split[..., None], child_coords, coords)
        level = jnp.where(split, l, level)
    return slot, level, coords


def descend(m: VoxelMap, wld, params: MapParams, ms: MapStatic):
    """Leaf lookup for points (match path — nothing is created)."""
    root = vh.coords_of(wld, params.voxel_size)
    return _walk(m, root, wld, params, ms)


def _create_level(m: VoxelMap, keys, need_mask, jour, ms: MapStatic,
                  parent_slots=None):
    """Create missing entries for `keys` where need_mask; returns
    (map, created_any). When `parent_slots` is given (child creation), each
    placed entry is also linked into its parent's child_slots row — the
    octant comes from the created key's own coords, so duplicate winners
    write the same (row, lane, value).

    No dedup sort: insert_keys' claim-and-verify converges with duplicate
    keys (duplicates see their key present and finish), and sorting 10^5
    int64 codes is the single most expensive op on TPU (emulated 64-bit
    bitonic sort). Duplicate winners re-init the same slot harmlessly.

    The missing candidates are COMPACTED to at most max_new before the
    insert scan: the claim-and-verify rounds cost per candidate processed,
    and typically only O(100) of 10^5 points need a new voxel (83 ms -> 12
    ms on TPU at 80k candidates). The whole step is additionally
    cond-skipped when nothing is missing; the cond carries ONLY the arrays
    the branch writes (keys, jour, n_dropped) because an XLA cond's
    untaken-identity branch COPIES its carries — carrying the whole VoxelMap
    (~150 MB of per-voxel state) cost ~6 ms per skipped call."""
    need_any = jnp.any(need_mask)

    link_parents = parent_slots is not None

    def do(op):
        # cs rides the cond ONLY when linking (an XLA cond's untaken
        # identity branch copies its carries — see the docstring note)
        (tk, fk, jr, nd, vl, vc, mp), cs = op[:7], (op[7] if link_parents
                                                    else None)
        nz = vh.compact_indices(need_mask, ms.max_new, -1)
        sub_valid = nz >= 0
        sub_keys = keys[jnp.maximum(nz, 0)]
        new_tk, slots, placed = vh.insert_keys(
            tk, sub_keys, sub_valid, ms.probe, rounds=ms.probe)
        n_over = jnp.maximum(
            jnp.sum(need_mask.astype(jnp.int32)) - ms.max_new, 0
        ).astype(jnp.int32)
        nd = (nd + n_over
              + jnp.sum(sub_valid & ~placed).astype(jnp.int32)).astype(jnp.int32)
        # journey-stamp + fingerprint + decoded-meta for the fresh claims
        # (other fields are already zero — evict's rebuild clears freed rows)
        tgt = jnp.where(placed, slots, tk.shape[0])
        fk = fk.at[tgt].set(vh.fingerprint32(sub_keys), mode="drop")
        jr = jr.at[tgt].set(jour, mode="drop")
        lv_new, crd_new = vh.decode(sub_keys)
        vl = vl.at[tgt].set(lv_new, mode="drop")
        vc = vc.at[tgt].set(crd_new, mode="drop")
        mp = mp.at[tgt].set(
            _meta_rows(lv_new, crd_new, jnp.zeros_like(lv_new)), mode="drop")
        if link_parents:
            pr = parent_slots[jnp.maximum(nz, 0)]
            link = placed & (pr >= 0)
            prow = jnp.where(link, pr, cs.shape[0])
            cs = cs.at[prow, _octant(crd_new)].set(slots, mode="drop")
            return new_tk, fk, jr, nd, vl, vc, mp, cs
        return new_tk, fk, jr, nd, vl, vc, mp

    ops = (m.keys, m.fkeys, m.jour, m.n_dropped, m.vox_level, m.vox_coords,
           m.meta_pack) + ((m.child_slots,) if link_parents else ())
    out = jax.lax.cond(need_any, do, lambda op: op, ops)
    tk, fk, jr, nd, vl, vc, mp = out[:7]
    m = m._replace(keys=tk, fkeys=fk, jour=jr, n_dropped=nd,
                   vox_level=vl, vox_coords=vc, meta_pack=mp)
    if link_parents:
        m = m._replace(child_slots=out[7])
    return m, need_any


def assign_insert(m: VoxelMap, wld, valid, params: MapParams, ms: MapStatic,
                  jour, create_roots: bool = True):
    """cut_voxel analog: find-or-create the leaf for each world point,
    creating missing roots (cut_voxel, voxel_map.cpp:33-43) and missing
    children of split nodes (OctoTree::allocate, octree.cpp:203-228).

    Returns (map, slot[N]). slot==-1 only for invalid points or drops."""
    root = vh.coords_of(wld, params.voxel_size)
    key0 = vh.encode(0, root)
    slot = vh.find_slots_fp(m.fkeys, key0, ms.probe)
    if create_roots:
        m, created = _create_level(m, key0, valid & (slot == -1), jour, ms)
        slot = jax.lax.cond(
            created, lambda: vh.find_slots_fp(m.fkeys, key0, ms.probe),
            lambda: slot)
    coords = root
    for l in range(1, ms.levels):
        edge = params.voxel_size / (2.0 ** (l - 1))
        split = valid & (slot >= 0) & (m.state[jnp.maximum(slot, 0)] == 1)
        center = (coords.astype(jnp.float32) + 0.5) * edge
        child_coords = 2 * coords + (wld > center).astype(jnp.int32)
        ckey = vh.encode(l, child_coords)
        cslot = vh.find_slots_fp(m.fkeys, ckey, ms.probe)
        m, created = _create_level(m, ckey, split & (cslot == -1), jour, ms,
                                   parent_slots=jnp.where(split, slot, -1))
        cslot = jax.lax.cond(
            created, lambda: vh.find_slots_fp(m.fkeys, ckey, ms.probe),
            lambda: cslot)
        slot = jnp.where(split, cslot, slot)
        coords = jnp.where(split[..., None], child_coords, coords)
    return m, jnp.where(valid, slot, -1)


# ------------------------------------------------------- cluster recompute

def _outer9(p):
    """(..., 3) -> (..., 9) row-major outer product built column-wise: a
    reshape of the (N, 3, 3) outer forces a physical relayout copy on TPU
    (~3 ms at 40k points); stacking 9 (N,) columns does not."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    return jnp.stack([x * x, x * y, x * z,
                      y * x, y * y, y * z,
                      z * x, z * y, z * z], axis=-1)


def _seg_cluster(slots, rel_pts, valid, C) -> cl.Cluster:
    """Masked segment-sum of voxel-center-relative points into per-slot
    clusters (the SlideWindow recompute)."""
    sid = jnp.where(valid & (slots >= 0), slots, C)
    w = (valid & (slots >= 0)).astype(rel_pts.dtype)
    p = rel_pts * w[..., None]
    flat = jnp.concatenate(
        [_outer9(p), p, w[..., None]], axis=-1).reshape(-1, 13)
    acc = jax.ops.segment_sum(flat, sid.reshape(-1), num_segments=C + 1)[:C]
    return cl.Cluster(P=acc[:, 0:9].reshape(C, 3, 3), v=acc[:, 9:12],
                      N=acc[:, 12])


def _seg_cols(slots, rel_pts, valid, C):
    """Componentwise _seg_cluster: (10, C) rows = the 6 unique second
    moments (xx, xy, xz, yy, yz, zz), the 3 first moments, and the count —
    each a dense lane-packed (C,) vector for flat-column consumers
    (3 fewer summed columns than the (3,3) form, no matrix relayout)."""
    sid = jnp.where(valid & (slots >= 0), slots, C)
    w = (valid & (slots >= 0)).astype(rel_pts.dtype)
    p = rel_pts * w[..., None]
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    cols = jnp.stack([x * x, x * y, x * z, y * y, y * z, z * z, x, y, z, w],
                     axis=-1).reshape(-1, 10)
    return jax.ops.segment_sum(cols, sid.reshape(-1),
                               num_segments=C + 1)[:C].T


def _seg_cols_frames(slots, rel_pts, valid, C, W):
    """Per-FRAME _seg_cols: (W, C, 10) central-moment columns, one (C, 10)
    table per window frame. Same scattered row volume as _seg_cols (the
    segment ids are just finer), so recut's final wave can hand factor
    extraction its per-(voxel, frame) moments for free — extract_factors'
    own full-window gather + outer-product + segment-sum disappears.
    Rows flatten as (W*Np,); the frame id is row // Np."""
    N = slots.size
    Np = N // W
    ok = (valid & (slots >= 0)).reshape(-1)
    f_id = jnp.arange(N, dtype=jnp.int32) // Np
    sid = jnp.where(ok, f_id * C + slots.reshape(-1), W * C)
    w = ok.astype(rel_pts.dtype)
    p = rel_pts.reshape(-1, 3) * w[:, None]
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    cols = jnp.stack([x * x, x * y, x * z, y * y, y * z, z * z, x, y, z, w],
                     axis=-1)
    acc = jax.ops.segment_sum(cols, sid, num_segments=W * C + 1)[: W * C]
    return acc.reshape(W, C, 10)


def _bf_var(var, rel):
    """Bf_var (octree.cpp:83-92): 9x9 covariance contribution of one point to
    (6 unique second-moment entries + 3 mean entries). rel is the point in
    the voxel-center frame (shift-invariance of the plane covariance holds,
    see module docstring)."""
    x, y, z = rel[..., 0], rel[..., 1], rel[..., 2]
    zero = jnp.zeros_like(x)
    Bi = jnp.stack([
        jnp.stack([2 * x, zero, zero], -1),
        jnp.stack([y, x, zero], -1),
        jnp.stack([z, zero, x], -1),
        jnp.stack([zero, 2 * y, zero], -1),
        jnp.stack([zero, z, y], -1),
        jnp.stack([zero, zero, 2 * z], -1),
    ], -2)  # (..., 6, 3)
    Biup = bmm(Bi, var)
    top = jnp.concatenate([bmmT(Biup, Bi), Biup], axis=-1)                   # (...,6,9)
    bot = jnp.concatenate([jnp.swapaxes(Biup, -1, -2), var], axis=-1)        # (...,3,9)
    return jnp.concatenate([top, bot], axis=-2)  # (..., 9, 9)


def _bf_var45(var6, rel):
    """_bf_var in SYM9-packed columns (..., 45) from a SYM3-packed point
    covariance (..., 6): the accumulator table stores only the 45 unique
    entries of the symmetric 9x9, so scatter-adds move 45 lanes instead of
    an (8, 128)-padded 9x9 tile, and no per-point matrix intermediate is
    ever materialized."""
    from vina_slam_tpu.core.pointcov import SYM3
    x, y, z = rel[..., 0], rel[..., 1], rel[..., 2]
    zero = jnp.zeros_like(x)
    Brows = ((2 * x, zero, zero), (y, x, zero), (z, zero, x),
             (zero, 2 * y, zero), (zero, z, y), (zero, zero, 2 * z))
    v = [[var6[..., SYM3[i][j]] for j in range(3)] for i in range(3)]
    U = [[sum(Brows[a][i] * v[i][j] for i in range(3)) for j in range(3)]
         for a in range(6)]
    out = []
    for r in range(9):
        for c in range(r, 9):
            if c < 6:
                out.append(sum(U[r][j] * Brows[c][j] for j in range(3)))
            elif r < 6:
                out.append(U[r][c - 6])
            else:
                out.append(v[r - 6][c - 6])
    return jnp.stack(out, axis=-1)  # (..., 45)


def _pool_fix(m: VoxelMap, pool: FixPool, params, ms, jour):
    """Redistribute fixed mass after subdivisions (fix_divide semantics,
    octree.cpp:257-277), INCREMENTALLY: only pool points whose cached leaf
    just split move — their mass is scatter-added to the child leaves they
    descend to. The (now non-leaf) parent keeps its stale fix stats, which
    no reader touches (match/refit/margi/extract all gate on leaves). A full
    pool reassignment per split wave cost ~30 ms/scan; the affected subset
    is O(100) points. Compacted to pool_move_cap; overflow points keep
    their stale (still-split) slot and are caught by the next wave. Sealed
    children keep their frozen stats (margi drops their pool points).

    Like the reference's push_fix (octree.cpp:178-187), redistribution also
    adds each moved point's Bf_var to the CHILD's cov_add, so subdivided
    planes carry the fixed points' covariance mass.

    Returns (m, pool) with updated fix arrays and cached pool slots."""
    C = ms.capacity
    ps = jnp.maximum(pool.slot, 0)
    moved = pool.valid & (pool.slot >= 0) & (m.state[ps] == 1)
    rows = vh.compact_indices(moved, ms.pool_move_cap, -1)
    rv = rows >= 0
    rr = jnp.maximum(rows, 0)
    pts = pool.pts[rr]
    m, new_slots = assign_insert(m, pts, rv, params, ms, jour,
                                 create_roots=False)
    _, centers, _ = slot_meta(m, new_slots, params)
    rel = pts - centers
    okm = rv & (new_slots >= 0)
    sid = jnp.where(okm, new_slots, C)
    w = okm.astype(jnp.float32)
    p = rel.astype(jnp.float32) * w[:, None]
    px, py, pz = p[..., 0], p[..., 1], p[..., 2]
    flat = jnp.stack([px * px, px * py, px * pz, py * py, py * pz, pz * pz,
                      px, py, pz, w], axis=-1)
    acc = jax.ops.segment_sum(flat, sid, num_segments=C + 1)[:C]
    dP = acc[:, 0:6]
    dv = acc[:, 6:9]
    dN = acc[:, 9]
    grow = (~m.sealed).astype(jnp.float32)
    B = _bf_var45(pool.var[rr], rel.astype(jnp.float32)) * w[:, None]
    dB = jax.ops.segment_sum(B, sid, num_segments=C + 1)[:C]
    m = m._replace(
        fix_P=m.fix_P + dP * grow[:, None],
        fix_v=m.fix_v + dv * grow[:, None],
        fix_N=m.fix_N + dN * grow,
        cov_add=m.cov_add + dB * grow[:, None],
    )
    tgt = jnp.where(rv, rr, pool.slot.shape[0])
    pool = pool._replace(
        slot=pool.slot.at[tgt].set(new_slots, mode="drop"))
    return m, pool


@partial(jax.jit, static_argnames=("ms",))
def accumulate_cov(m: VoxelMap, slots, pts_w, var_w, valid, params: MapParams,
                   ms: MapStatic):
    """Add the Bf_var contributions of newly inserted points to the per-voxel
    cov_add accumulator (OctoTree::push, octree.cpp:172-176). Called once per
    point lifetime, at insertion, exactly like the reference — the plane
    covariance therefore uses insertion-time positions (the reference's
    documented staleness)."""
    from vina_slam_tpu.core.pointcov import sym3_pack

    flat_s = slots.reshape(-1)
    flat_p = pts_w.reshape(-1, 3)
    # accepts full (.., 3, 3) or SYM3-packed (.., 6) point covariances
    flat_var = (var_w.reshape(-1, 6) if var_w.shape[-1] == 6
                else sym3_pack(var_w.reshape(-1, 3, 3)))
    flat_v = valid.reshape(-1)
    _, centers, _ = slot_meta(m, flat_s, params)
    rel = flat_p - centers
    ok = flat_v & (flat_s >= 0)
    B = (_bf_var45(flat_var, rel) * ok[:, None].astype(rel.dtype)
         ).astype(m.cov_add.dtype)
    tgt = jnp.where(ok, flat_s, ms.capacity)  # OOB rows dropped
    return m._replace(cov_add=m.cov_add.at[tgt].add(B, mode="drop"))


def _plane_judge(eig, level, params: MapParams):
    """plane_judge (octree.cpp:198-201)."""
    ratio = eig[..., 0] / jnp.maximum(eig[..., 2], 1e-20)
    thre = params.plane_thre[jnp.clip(level, 0, 3)]
    return (eig[..., 0] < params.min_eigen_value) & (ratio < thre)


# ------------------------------------------------- persistent window moments

class WinMoments(NamedTuple):
    """Persistent per-(window-frame, slot) moment table — the TPU analog of
    the reference's SlideWindow per-voxel clusters (slide_window.hpp:7-20,
    octree.cpp:115-140). cols[f, s] holds the voxel-CENTER-relative world
    moment columns [xx, xy, xz, yy, yz, zz, x, y, z, n] of frame f's points
    assigned to slot s, valid under the tag poses (R, p). Pose updates
    re-tag the whole table in closed form (PointCluster::transform,
    core/types.hpp:168-174) instead of re-running the full window
    segment-sum every scan; point (re)assignments apply compacted
    scatter deltas."""
    cols: jnp.ndarray   # (W, C, 10) f32
    R: jnp.ndarray      # (W, 3, 3) f64 — poses the columns are valid under
    p: jnp.ndarray      # (W, 3) f64


def make_win_moments(W: int, ms: MapStatic) -> WinMoments:
    return WinMoments(
        cols=jnp.zeros((W, ms.capacity, 10), jnp.float32),
        R=jnp.tile(jnp.eye(3, dtype=jnp.float64)[None], (W, 1, 1)),
        p=jnp.zeros((W, 3), jnp.float64))


def _slot_center_cols(m: VoxelMap, params: MapParams):
    """Dense (C,) world-center components straight from the decoded meta
    columns (no self-gather; same construction as margi's plane centers)."""
    lvA = jnp.maximum(m.vox_level, 0).astype(jnp.float32)
    edge = params.voxel_size / (2.0 ** lvA)
    cx = (m.vox_coords[:, 0].astype(jnp.float32) + 0.5) * edge
    cy = (m.vox_coords[:, 1].astype(jnp.float32) + 0.5) * edge
    cz = (m.vox_coords[:, 2].astype(jnp.float32) + 0.5) * edge
    return cx, cy, cz


def _mom_retag(mom: WinMoments, m: VoxelMap, params: MapParams, Rs, ps):
    """Rigid-transform every (frame, slot) cell from the tag poses to
    (Rs, ps): if the pose delta maps world points x' = dR x + dt, then
    center-relative offsets map rel' = dR rel + b with
    b_{f,s} = (dR_f - I) c_s + dt_f, so (exactly, per cell)
        M' = dR M dR^T + (dR u) b^T + b (dR u)^T + n b b^T
        u' = dR u + n b.
    dR - I is formed in f64 (the delta is ~1e-6 after a BA nudge; f32
    subtraction of two near-identity rotations would lose it), then the
    (W, C)-dense column math runs in f32."""
    cols = mom.cols
    dR64 = Rs @ jnp.swapaxes(mom.R, -1, -2)                  # (W, 3, 3) f64
    D64 = dR64 - jnp.eye(3, dtype=jnp.float64)
    dt64 = ps - jnp.einsum("wij,wj->wi", dR64, mom.p)
    dR = dR64.astype(jnp.float32)
    D = D64.astype(jnp.float32)
    dt = dt64.astype(jnp.float32)

    cx, cy, cz = _slot_center_cols(m, params)                 # (C,) each
    cvec = (cx, cy, cz)
    from vina_slam_tpu.core.pointcov import SYM3
    M = [[cols[..., SYM3[a][b]] for b in range(3)] for a in range(3)]
    u = [cols[..., 6 + a] for a in range(3)]
    n = cols[..., 9]

    b = [sum(D[:, a, k, None] * cvec[k][None, :] for k in range(3))
         + dt[:, a, None] for a in range(3)]                  # (W, C) x3
    v = [sum(dR[:, a, k, None] * u[k] for k in range(3)) for a in range(3)]
    RM = [[sum(dR[:, a, k, None] * M[k][c] for k in range(3))
           for c in range(3)] for a in range(3)]
    out = [None] * 10
    for a in range(3):
        for c in range(a, 3):
            rmr = sum(RM[a][k] * dR[:, c, k, None] for k in range(3))
            out[SYM3[a][c]] = (rmr + v[a] * b[c] + b[a] * v[c]
                               + n * b[a] * b[c])
        out[6 + a] = v[a] + n * b[a]
    out[9] = n
    return WinMoments(cols=jnp.stack(out, axis=-1), R=Rs, p=ps)


def _mom_scatter(tbl, f_id, slots, rel, ok, sign, C):
    """Scatter-add signed moment columns of a compacted point batch into the
    (W, C, 10) table at (frame, slot) cells."""
    W = tbl.shape[0]
    x, y, z = rel[..., 0], rel[..., 1], rel[..., 2]
    one = jnp.ones_like(x)
    cols = jnp.stack([x * x, x * y, x * z, y * y, y * z, z * z, x, y, z, one],
                     axis=-1)
    w = jnp.where(ok, jnp.float32(sign), jnp.float32(0.0))
    cols = cols * w[:, None]
    sid = jnp.where(ok, f_id * C + slots, W * C)
    return tbl.reshape(W * C, 10).at[sid].add(
        cols, mode="drop").reshape(W, C, 10)


# ----------------------------------------------------------------- recut

@partial(jax.jit, static_argnames=("ms", "win", "debug", "return_counts",
                              "return_frame_moments", "stage"))
def recut(m: VoxelMap, pool: FixPool, win_pts_w, win_valid, params: MapParams,
          ms: MapStatic, win: int, jour, cached=None, win_var=None,
          new_mask=None, debug: bool = False, return_counts: bool = False,
          return_frame_moments: bool = False, mom=None, stage: str = "all"):
    """Re-fit planes / subdivide after pose updates.

    cached: optional (W, Np) i32 leaf slots from the previous recut (-1 =
    unknown, e.g. the freshly pushed frame). When given, wave 1 verifies
    the cached assignment instead of re-probing every point (see the fast
    path below). Callers must invalidate the cache after evict().

    win_pts_w: (W, Np, 3) current-pose WORLD positions of the window points
    (the caller transforms body buffers by the latest poses — this makes the
    reference's insert + recut pair a single idempotent recompute).

    win_var/new_mask: optional (W, Np, 6) SYM3-packed world point
    covariances and a (W, Np) mask of the freshly pushed frame. When given, recut owns the
    Bf_var covariance accumulation of OctoTree::push / subdivide / push_fix
    (octree.cpp:151-300): a point's Bf contribution is scatter-added to its
    leaf's cov_add when it is first inserted (new_mask) and again to the
    child leaf whenever its voxel subdivides — exactly the reference's
    re-push. Callers using this MUST NOT also call accumulate_cov.

    Runs up to `levels` split waves; each wave fits planes on the current
    leaf assignment and marks populated non-planar leaves for subdivision
    (octree.cpp:335-393). Fixed clusters come from the STORED per-slot
    arrays (kept current by margi); the pool-based redistribution runs only
    inside the split-triggered waves. Returns (map, pool, slots (W, Np),
    levels (W, Np)); return_counts appends the final wave's per-slot window
    point counts (C,), return_frame_moments appends its per-(frame, slot)
    moment columns (W, C, 10) — extract_factors' payload (frame_moments).

    mom: the PERSISTENT window-moment path (requires cached): the (W, C, 10)
    moment table from the previous scan, ALREADY valid under the poses that
    produced win_pts_w (callers re-tag after BA via _mom_retag; between BA
    steps poses don't move). Only (re)assigned points apply compacted
    scatter deltas — the full W*Np-point `_seg_cols_frames` segment-sum
    disappears from every wave. The caller stores the returned frame-moment
    table for the next scan. Overflow semantics differ ONLY for
    verify-misses beyond refind_cap whose previous slot is still a live
    leaf: they KEEP that (stale but table-consistent) assignment for this
    wave instead of dropping to -1, and trigger a straggler wave."""
    C = ms.capacity
    W, Np, _ = win_pts_w.shape
    flat_w = win_pts_w.reshape(-1, 3)
    flat_v = win_valid.reshape(-1)
    do_bf = win_var is not None
    if do_bf:
        from vina_slam_tpu.core.pointcov import sym3_pack
        flat_var = (win_var.reshape(-1, 6) if win_var.shape[-1] == 6
                    else sym3_pack(win_var.reshape(-1, 3, 3)))
    else:
        flat_var = None
    flat_new = (new_mask.reshape(-1) if new_mask is not None
                else jnp.zeros_like(flat_v))

    def add_bf(m, sel_rows, sel_ok, sel_slots):
        """Scatter-add Bf_var of the selected points at their new slots."""
        _, c_new, _ = slot_meta(m, sel_slots, params)
        relb = (flat_w[sel_rows] - c_new).astype(jnp.float32)
        B = (_bf_var45(flat_var[sel_rows], relb)
             * sel_ok[:, None].astype(jnp.float32))
        tgt = jnp.where(sel_ok, sel_slots, C)
        return m._replace(cov_add=m.cov_add.at[tgt].add(
            B.astype(m.cov_add.dtype), mode="drop"))

    def refit(m, slots, tbl=None):
        if tbl is None:
            lv_pt, centers, _ = slot_meta(m, slots, params)
            rel = flat_w - centers
            # per-(frame, slot) central-moment columns; the final wave's
            # table IS extract_factors' payload (return_frame_moments)
            accf = _seg_cols_frames(slots, rel, flat_v, C, W)  # (W, C, 10)
        else:
            # persistent path: the table already reflects this wave's
            # assignment; levels come from one narrow column gather
            lv_pt = jnp.maximum(m.vox_level[jnp.maximum(slots, 0)], 0)
            accf = tbl
        acc = accf.sum(axis=0).T                           # (10, C)

        # The plane refit runs DENSE over all C slots in flat-column
        # (componentwise) form: every per-slot quantity is a lane-packed
        # (C,) vector and the eigendecomposition is the componentwise
        # eigh3c, so the whole chain is elementwise VPU work with NO
        # compaction, NO gathers, and NO scatters (the earlier compacted
        # gather -> (V,3,3) eigh3 -> scatter form spent its time moving
        # data and used 3 of 128 lanes in the matrix ops).
        wN = acc[9]
        fP = m.fix_P.T                      # (6, C) packed columns
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

        leaf = (m.keys != vh.EMPTY_KEY) & (m.state == 0)
        upd = leaf & (wN > 0)
        lvc = jnp.clip(m.vox_level, 0, 3)
        enough = upd & (tN > params.min_point[lvc])
        ratio = w0 / jnp.maximum(w2, 1e-20)
        judged = (w0 < params.min_eigen_value) & (ratio < params.plane_thre[lvc])

        # reference recut: too-few points -> is_plane=false, eig untouched
        want_split = enough & ~judged & (m.vox_level < ms.levels - 1)
        eigs = jnp.stack([w0, w1, w2], axis=-1)
        Vflat = jnp.stack([V[0][0], V[1][0], V[2][0],
                           V[0][1], V[1][1], V[2][1],
                           V[0][2], V[1][2], V[2][2]], axis=-1)  # (C, 9)
        en3 = enough[:, None]
        new_is_plane = jnp.where(upd, enough & judged, m.is_plane)
        m = m._replace(
            is_plane=new_is_plane,
            plane_pack=m.plane_pack.at[:, 7].set(
                new_is_plane.astype(jnp.float32)),
            eig_val=jnp.where(en3, eigs, m.eig_val),
            eig_vec=jnp.where(en3[..., None],
                              Vflat.reshape(C, 3, 3), m.eig_vec),
            state=jnp.where(want_split, 1, m.state),
            meta_pack=m.meta_pack.at[:, 4].set(
                jnp.where(want_split, 1, m.state)),
            # a fresh split's children don't exist yet: flip the whole link
            # row from leaf (-1) to split-with-absent-children (-2); child
            # creations fill the lanes (_create_level)
            child_slots=jnp.where(want_split[:, None], jnp.int32(-2),
                                  m.child_slots),
        )
        # another wave is needed if anything split OR some valid points are
        # still slotless but placeable (child creation is throttled to
        # max_new candidates per pass; stragglers get their children next
        # wave; slot==-2 probe-window-full points are dropped, not retried)
        unfinished = jnp.any(want_split) | jnp.any(flat_v & (slots == -1))
        # wN: per-slot window point counts of THIS wave's assignment — the
        # last wave's vector is exactly extract_factors' win_count, so the
        # fused step reuses it instead of re-running a full-capacity
        # segment sum (return_counts)
        return m, lv_pt, unfinished, wN, accf

    Npts = flat_v.shape[0]
    Np_f = Npts // W

    def assign_cached(m, prev, tbl=None):
        """Verify a previous flat slot assignment (one gather + key compare,
        ~5x cheaper than the 3-level probe descent) and fully re-descend only
        the misses, compacted to refind_cap (a new frame's worth plus slack).
        Overflow misses keep slot -1 this wave and are picked up by the next
        (straggler) wave, whose verify also fails for them. (Persistent-
        table path: overflow misses whose previous slot is a live leaf keep
        it instead, so the table stays consistent; see recut docstring.)

        Bf accounting (when win_var is given): a re-descended point adds its
        Bf_var to the new leaf iff (a) it had no slot yet and is a fresh
        insert (new_mask: OctoTree::push) or (b) its previous slot just
        split (subdivide's re-push, octree.cpp:283-300).

        Returns (m, slots, tbl, dropped_any)."""
        sc = jnp.maximum(prev, 0)
        r = m.meta_pack[sc]              # one packed row gather
        lv_c = r[:, 0]
        st_c = r[:, 4]
        coords_c = r[:, 1:4]
        key_ok = lv_c >= 0  # free rows carry level -1
        was_split = flat_v & (prev >= 0) & key_ok & (st_c == 1)
        edge_c = params.voxel_size / (2.0 ** jnp.maximum(lv_c, 0).astype(jnp.float32))
        my_coords = vh.coords_of(flat_w, edge_c[:, None])
        ok_cached = (
            flat_v & (prev >= 0)
            & key_ok
            & (st_c == 0)
            & jnp.all(my_coords == coords_c, axis=-1)
        )
        need = flat_v & ~ok_cached
        rows = vh.compact_indices(need, ms.refind_cap, -1)
        sub_valid = rows >= 0
        sel = jnp.maximum(rows, 0)
        sub_pts = flat_w[sel]
        m, sub_slots = assign_insert(m, sub_pts, sub_valid, params, ms, jour,
                                     create_roots=True)
        if do_bf:
            bf_ok = sub_valid & (sub_slots >= 0) & (
                was_split[sel] | ((prev[sel] == -1) & flat_new[sel]))
            m = add_bf(m, sel, bf_ok, sub_slots)
        if tbl is None:
            slots = jnp.where(ok_cached, prev, -1)
            tgt = jnp.where(sub_valid, rows, Npts)
            slots = slots.at[tgt].set(sub_slots, mode="drop")
            return m, slots, None, jnp.asarray(False)

        # ---- persistent-table maintenance ----
        selmask = jnp.zeros(Npts + 1, bool).at[
            jnp.where(sub_valid, rows, Npts)].set(True)[:Npts]
        # cap-overflow misses: keep a still-live-leaf previous slot (stale
        # but consistent with the table); dead/split/fresh ones drop to -1
        # and their stale contribution is subtracted below would be wrong —
        # they are NOT subtracted (not in the compacted set), so keep ONLY
        # live leaves and flag a straggler wave for everything dropped
        prev_live = (prev >= 0) & key_ok & (st_c == 0)
        dropped = need & ~selmask
        keep_stale = dropped & prev_live
        slots = jnp.where(ok_cached | keep_stale, prev, -1)
        tgt = jnp.where(sub_valid, rows, Npts)
        slots = slots.at[tgt].set(sub_slots, mode="drop")

        f_sel = (sel // Np_f).astype(jnp.int32)
        v_sel = sub_valid & flat_v[sel]
        prev_sel = prev[sel]
        # subtract the re-descended points from their previous cells (their
        # rel offsets under the CURRENT poses — the retag made the stored
        # contributions exactly these, up to f32 roundoff)
        _, c_prev, _ = slot_meta(m, prev_sel, params)
        tbl = _mom_scatter(tbl, f_sel, jnp.maximum(prev_sel, 0),
                           sub_pts - c_prev, v_sel & (prev_sel >= 0),
                           -1.0, C)
        # ... and add them at their new cells
        _, c_new, _ = slot_meta(m, sub_slots, params)
        tbl = _mom_scatter(tbl, f_sel, jnp.maximum(sub_slots, 0),
                           sub_pts - c_new, v_sel & (sub_slots >= 0),
                           1.0, C)
        # a dropped point that could NOT keep its slot lost its table
        # contribution-to-assignment consistency only if it had one and we
        # didn't subtract it — that case (dead prev slot beyond the cap) has
        # prev pointing at a freed/split row whose cell no longer aggregates
        # (split parents hold no window points after their wave), so the
        # stale mass self-corrects when the straggler wave re-descends it.
        return m, slots, tbl, jnp.any(dropped)

    tbl0 = mom
    if mom is not None:
        assert cached is not None, "persistent moments require cached slots"

    if mom is not None:
        # -------- persistent path: EVERY wave (incl. the first) runs inside
        # ONE while_loop. With wave 1 outside, the loop's entry carries were
        # wave-1 OUTPUTS and XLA's copy-insertion materialized the whole
        # map + pool + (W, C, 10) table into the loop state (~11 ms/scan at
        # 20k-pt shapes, scripts/bisect_fused.py recut vs recut_nowhile) —
        # entering with the caller's (donated) buffers aliases instead. The
        # first wave pays one extra _pool_fix (a no-op unless a previous
        # scan's wave cap left split nodes unredistributed — which this
        # sweep then heals, octree.cpp:257-277 semantics).
        def w_cond(carry):
            return carry[7] & (carry[4] < ms.levels + 1)

        def w_body(carry):
            mm, pp, s, lv, w, _, tb, _ = carry
            mm, pp = _pool_fix(mm, pp, params, ms, jour)
            mm, s, tb, drp = assign_cached(mm, s, tb)
            mm, lv, unf, wn, tb = refit(mm, s, tb)
            return mm, pp, s, lv, w + 1, wn, tb, unf | drp

        flat_prev = cached.reshape(-1)
        carry0 = (m, pool, flat_prev, jnp.zeros_like(flat_prev),
                  jnp.asarray(0, jnp.int32), jnp.zeros(C, jnp.float32), tbl0,
                  jnp.asarray(True))
        if stage == "assign":      # profiling bisect: one wave, no refit
            m, pool = _pool_fix(m, pool, params, ms, jour)
            m, slots, accf, _ = assign_cached(m, flat_prev, tbl0)
            levels_pt = jnp.zeros_like(flat_prev)
            waves = jnp.asarray(0, jnp.int32)
            win_n = jnp.zeros(C, jnp.float32)
        elif stage in ("defer", "nowhile"):
            # ---- deferred-cascade mode (the fused steady path's default,
            # cfg.tpu.recut_defer): EXACTLY one wave per scan, no
            # while_loop. An XLA while_loop at these shapes costs ~10-11
            # ms/scan in loop-state copies EVEN when its body runs zero or
            # one times (bisect_fused recut vs recut_nowhile, all three
            # loop placements tried) — more than the wave itself (~8 ms).
            # Instead, a split cascade heals across SCANS: a voxel that
            # wants splitting is marked split now; its points re-descend
            # (creating the children) in the NEXT scan's wave, whose
            # leading _pool_fix also redistributes the pool points of
            # just-split leaves (octree.cpp:257-277 semantics, one scan
            # late). Until then the parent is state==1, so factor
            # extraction, matching, and margi's plane refresh skip it — a
            # one-scan gap per cascade level, bounded by `levels`. Margi
            # absorbing a to-be-split slot stays correct: the parent's fix
            # stats are never read again and the pool copy re-adds the
            # mass to the children on redistribution.
            out1 = w_body(carry0)
            m, pool, slots, levels_pt, waves, win_n, accf, _ = out1
        else:
            (m, pool, slots, levels_pt, waves, win_n, accf,
             _) = jax.lax.while_loop(w_cond, w_body, carry0)
        out = (m, pool, slots.reshape(W, Np), levels_pt.reshape(W, Np))
        if debug:
            n_lost = jnp.sum(flat_v & (slots == -1))
            n_full = jnp.sum(flat_v & (slots == -2))
            out = out + ((waves, n_lost, n_full),)
        if return_counts:
            out = out + (win_n,)
        if return_frame_moments:
            out = out + (accf,)
        return out

    if cached is None:
        m, slots = assign_insert(m, flat_w, flat_v, params, ms, jour,
                                 create_roots=True)
        if do_bf:
            ins = flat_v & flat_new & (slots >= 0)
            rows0 = vh.compact_indices(ins, ms.refind_cap, -1)
            sel0 = jnp.maximum(rows0, 0)
            m = add_bf(m, sel0, rows0 >= 0, slots[sel0])
        dropped = jnp.asarray(False)
    else:
        m, slots, tbl0, dropped = assign_cached(m, cached.reshape(-1), tbl0)
    if stage == "assign":  # profiling bisect: wave-1 assignment only
        z = jnp.zeros_like(slots)
        out = (m, pool, slots.reshape(W, Np), z.reshape(W, Np))
        if debug:
            out = out + ((jnp.asarray(0, jnp.int32), 0, 0),)
        if return_counts:
            out = out + (jnp.zeros(C, jnp.float32),)
        if return_frame_moments:
            out = out + (tbl0 if tbl0 is not None
                         else jnp.zeros((W, C, 10), jnp.float32),)
        return out
    m, levels_pt, unfinished, win_n, accf = refit(m, slots, tbl0)
    unfinished = unfinished | dropped
    if stage == "nowhile":  # profiling bisect: skip straggler waves
        out = (m, pool, slots.reshape(W, Np), levels_pt.reshape(W, Np))
        if debug:
            out = out + ((jnp.asarray(1, jnp.int32), 0, 0),)
        if return_counts:
            out = out + (win_n,)
        if return_frame_moments:
            out = out + (accf,)
        return out

    # Later waves run only while the previous one split a node or left
    # stragglers; a while_loop (not a chain of conds) because XLA aliases
    # while carries in place, whereas each skipped cond's identity branch
    # would copy the whole map. Each wave verifies the previous wave's
    # assignment (points in just-split voxels fail the leaf check and
    # re-descend to the children) and redistributes only the pool points
    # whose leaf split — split waves cost O(affected points), not O(window +
    # pool). levels+1 passes cover a full split cascade plus a straggler
    # pass.
    def w_cond(carry):
        return carry[7] & (carry[4] < ms.levels + 1)

    def w_body(carry):
        mm, pp, s, lv, w, _, _, _ = carry
        mm, pp = _pool_fix(mm, pp, params, ms, jour)
        mm, s, _, drp = assign_cached(mm, s)
        mm, lv, unf, wn, af = refit(mm, s)
        return mm, pp, s, lv, w + 1, wn, af, unf | drp

    m, pool, slots, levels_pt, waves, win_n, accf, _ = jax.lax.while_loop(
        w_cond, w_body,
        (m, pool, slots, levels_pt, jnp.asarray(1, jnp.int32), win_n,
         accf, unfinished))

    out = (m, pool, slots.reshape(W, Np), levels_pt.reshape(W, Np))
    if debug:
        n_lost = jnp.sum(flat_v & (slots == -1))
        n_full = jnp.sum(flat_v & (slots == -2))
        out = out + ((waves, n_lost, n_full),)
    if return_counts:
        out = out + (win_n,)
    if return_frame_moments:
        out = out + (accf,)
    return out


# ----------------------------------------------------------------- match

@partial(jax.jit, static_argnames=("ms",))
def match_points(m: VoxelMap, wld, var_w, params: MapParams, ms: MapStatic):
    """Point-to-plane association (OctoTree::match, octree.cpp:551-595).

    Returns (valid, normal, center, sigma_d): the 3-sigma Mahalanobis-gated
    plane for each query, using plane_var + the point's world covariance."""
    slot, level, _ = descend(m, wld, params, ms)
    return match_with_slots(m, wld, var_w, slot, params)


@partial(jax.jit, static_argnames=("ms", "refind_cap"))
def refresh_slots(m: VoxelMap, wld, slot, level, coords, params: MapParams,
                  ms: MapStatic, refind_cap: int):
    """Update a cached descent result for moved query points (the octree
    fast path octos[i]->inside(), odometry.cpp:124-132, generalized to the
    flat table): a walk's outcome — hit OR miss — is fully determined by the
    query's cell at the level where the walk ended, so queries still inside
    that cell reuse (slot, level, coords) verbatim; only movers re-walk,
    compacted to refind_cap (overflowers keep the stale result one round;
    the Mahalanobis gate absorbs the rare misassociation).

    Returns updated (slot, level, coords)."""
    edge = params.voxel_size / (2.0 ** jnp.maximum(level, 0).astype(jnp.float32))
    same = jnp.all(vh.coords_of(wld, edge[:, None]) == coords, axis=-1)
    rows = vh.compact_indices(~same, refind_cap, -1)
    rv = rows >= 0
    rr = jnp.maximum(rows, 0)
    s2, l2, c2 = descend(m, wld[rr], params, ms)
    tgt = jnp.where(rv, rr, slot.shape[0])
    slot = slot.at[tgt].set(s2, mode="drop")
    level = level.at[tgt].set(l2, mode="drop")
    coords = coords.at[tgt].set(c2, mode="drop")
    return slot, level, coords


@jax.jit
def match_with_slots(m: VoxelMap, wld, var_w, slot, params: MapParams):
    """The gate half of match_points for precomputed leaf slots."""
    s = jnp.maximum(slot, 0)
    pk = m.plane_pack[s]                 # one packed row gather
    found = (slot >= 0) & (pk[..., 7] > 0)
    n = pk[..., 0:3]
    c = pk[..., 3:6]
    radius = pk[..., 6]
    pvar = m.plane_var[s]                # (N, 21) packed symmetric

    d = wld - c
    dis_to_plane = jnp.abs(jnp.sum(n * d, axis=-1))
    dis_to_center = jnp.sum(d * d, axis=-1)
    range_dis = dis_to_center - dis_to_plane * dis_to_plane
    gate1 = range_dis <= 9.0 * radius

    J6 = (d[..., 0], d[..., 1], d[..., 2],
          -n[..., 0], -n[..., 1], -n[..., 2])
    sigma_l = sym6_quadform(pvar, J6)
    sigma_l = sigma_l + sym3_quadform(var_w, n)
    gate2 = dis_to_plane < 3.0 * jnp.sqrt(jnp.maximum(sigma_l, 0.0))

    ok = found & gate1 & gate2
    return ok, n, c, sigma_l


@partial(jax.jit, static_argnames=("ms",))
def match_neighbors(m: VoxelMap, wld, params: MapParams, ms: MapStatic,
                    var_dummy: float = 0.01):
    """27-neighbor best plane for VNC (matchVoxelMap, voxel_map.cpp:268-313).
    Certainty ranking 1/(sigma_l+eps) implements the documented intent (the
    shipped max_prob plumbing is dead — see module docstring)."""
    S = wld.shape[0]
    base = vh.coords_of(wld, params.voxel_size)
    offs = jnp.stack(jnp.meshgrid(*([jnp.arange(-1, 2)] * 3), indexing="ij"),
                     -1).reshape(27, 3).astype(jnp.int32)
    roots = base[:, None, :] + offs[None, :, :]      # (S, 27, 3)
    wq = jnp.broadcast_to(wld[:, None, :], (S, 27, 3))
    slot, level, _ = _walk(m, roots.reshape(-1, 3), wq.reshape(-1, 3), params, ms)
    slot = slot.reshape(S, 27)
    s = jnp.maximum(slot, 0)
    pk = m.plane_pack[s]                 # one packed row gather
    found = (slot >= 0) & (pk[..., 7] > 0)
    n = pk[..., 0:3]
    c = pk[..., 3:6]
    radius = pk[..., 6]
    pvar = m.plane_var[s]                # (S, 27, 21) packed symmetric

    d = wld[:, None, :] - c
    dis_to_plane = jnp.abs(jnp.sum(n * d, axis=-1))
    range_dis = jnp.sum(d * d, axis=-1) - dis_to_plane**2
    J6 = (d[..., 0], d[..., 1], d[..., 2],
          -n[..., 0], -n[..., 1], -n[..., 2])
    sigma_l = sym6_quadform(pvar, J6)
    sigma_l = sigma_l + var_dummy * jnp.sum(n * n, axis=-1)
    ok = found & (range_dis <= 9.0 * radius) & (dis_to_plane < 3.0 * jnp.sqrt(jnp.maximum(sigma_l, 0)))

    prob = jnp.where(ok, 1.0 / (sigma_l + 1e-6), 0.0)
    best = jnp.argmax(prob, axis=1)
    take = lambda a: jnp.take_along_axis(a, best[:, None, *([None] * (a.ndim - 2))], axis=1)[:, 0]
    return (
        jnp.take_along_axis(prob, best[:, None], 1)[:, 0] > 0,
        take(n),
        take(c),
        jnp.take_along_axis(sigma_l, best[:, None], 1)[:, 0],
    )


# ----------------------------------------------------------------- margi

@partial(jax.jit, static_argnames=("ms", "mgsize"))
def margi(m: VoxelMap, pool: FixPool, slots, win_pts_w, win_var_w, win_valid,
          params: MapParams, ms: MapStatic, jour, mgsize: int = 1, tbl=None):
    """Marginalize the oldest `mgsize` window frames into fixed statistics
    (OctoTree::margi, octree.cpp:395-495) and refresh plane parameters +
    covariances (plane_update cadence, octree.cpp:441-446).

    slots: (W, Np) the leaf assignment from this step's recut — node
    membership is fixed at insertion like the reference's octrees, so margi
    re-transforms points with the POST-BA poses but does not reassign.
    win_pts_w/win_var_w: (W, Np, 3)/(W, Np, 6 packed) world positions and
    covariances under the post-BA poses; frames [0, mgsize) are absorbed.
    The caller shifts its buffers afterwards.

    tbl: optional (W, C, 10) persistent moment table ALREADY re-tagged to
    the post-BA poses (fused path) — replaces both per-point segment-sums:
    the window columns become tbl.sum(0) and the marginalized-frame columns
    tbl[:mgsize].sum(0) under a per-SLOT seal mask (sealing is per-slot, so
    the per-point `append` mask factorizes exactly)."""
    C = ms.capacity
    W, Np, _ = win_pts_w.shape
    flat_w = win_pts_w.reshape(-1, 3)
    from vina_slam_tpu.core.pointcov import sym3_pack
    flat_var = (win_var_w.reshape(-1, 6) if win_var_w.shape[-1] == 6
                else sym3_pack(win_var_w.reshape(-1, 3, 3)))
    flat_v = win_valid.reshape(-1)
    slots = slots.reshape(-1)

    if tbl is None:
        _, centers_pt, _ = slot_meta(m, slots, params)
        rel = flat_w - centers_pt
        acc = _seg_cols(slots, rel, flat_v, C)   # (10, C) window columns
    else:
        acc = tbl.sum(axis=0).T

    leaf = (m.keys != vh.EMPTY_KEY) & (m.state == 0)
    wN = acc[9]
    active = leaf & (wN > 0)

    # plane_update cadence (octree.cpp:441-446), DENSE over all C slots in
    # flat columns (same redesign as the recut refit): every per-slot
    # quantity is a lane-packed (C,) vector, the eigensolve is the
    # componentwise eigh3c, and updates are full-column where-selects — no
    # compaction sort, no gathers, no scatters (the earlier compacted
    # matrix-form chain ran the 3x3/9x9 algebra at <10% lane use and spent
    # the rest moving rows)
    fP = m.fix_P.T                      # (6, C) packed columns
    fv = m.fix_v.T
    tN = wN + m.fix_N
    t6 = (acc[0] + fP[0], acc[1] + fP[1], acc[2] + fP[2],
          acc[3] + fP[3], acc[4] + fP[4], acc[5] + fP[5])
    nn = jnp.maximum(tN, 1.0)
    nv = 1.0 / nn
    mx, my, mz = (acc[6] + fv[0]) * nv, (acc[7] + fv[1]) * nv, (acc[8] + fv[2]) * nv
    c6 = (t6[0] * nv - mx * mx, t6[1] * nv - mx * my, t6[2] * nv - mx * mz,
          t6[3] * nv - my * my, t6[4] * nv - my * mz, t6[5] * nv - mz * mz)
    (l0, l1, l2), U = eigh3c(*c6)
    u0, u1, u2 = U

    last = m.last_num
    upd = (active & m.is_plane & (m.fix_N < params.max_points)
           & ((tN - last >= 5) | (last <= 10)))

    # eigenvector perturbation u_c (octree.cpp:302-333) in columns:
    # u_c = sum_{k=1,2} (nv/(l0-lk)) u_k (x) fkl_k with fkl the 9-vector
    # of d(cov)/d(moments) contractions
    mean3 = (mx, my, mz)
    uc = [[jnp.zeros_like(tN) for _ in range(9)] for _ in range(3)]
    for uk, lk in ((u1, l1), (u2, l2)):
        den = l0 - lk
        den = jnp.where(jnp.abs(den) < 1e-12, -1e-12, den)
        ck = nv / den
        kdotm = uk[0] * mx + uk[1] * my + uk[2] * mz
        zdotm = u0[0] * mx + u0[1] * my + u0[2] * mz
        fkl = (uk[0] * u0[0],
               uk[1] * u0[0] + uk[0] * u0[1],
               uk[2] * u0[0] + uk[0] * u0[2],
               uk[1] * u0[1],
               uk[1] * u0[2] + uk[2] * u0[1],
               uk[2] * u0[2],
               -(kdotm * u0[0] + zdotm * uk[0]),
               -(kdotm * u0[1] + zdotm * uk[1]),
               -(kdotm * u0[2] + zdotm * uk[2]))
        for a in range(3):
            cka = ck * uk[a]
            for j in range(9):
                uc[a][j] = uc[a][j] + cka * fkl[j]

    cov = m.cov_add  # (C, 45) SYM9-packed symmetric
    Jc = [[sum(uc[a][jp] * cov[:, SYM9[jp][j]] for jp in range(9))
           for j in range(9)] for a in range(3)]
    # packed upper triangle (SYM6 order) — the matcher consumes this row
    # per query via sym6_quadform, so only the 21 unique entries are built
    pv21 = [None] * 21
    for a in range(3):
        for b in range(a, 3):
            pv21[SYM6[a][b]] = sum(Jc[a][j] * uc[b][j] for j in range(9))
        for b in range(3):
            pv21[SYM6[a][3 + b]] = nv * Jc[a][6 + b]
    for a in range(3):
        for b in range(a, 3):
            pv21[SYM6[3 + a][3 + b]] = nv * nv * cov[:, SYM9[6 + a][6 + b]]
    pv = jnp.stack(pv21, axis=-1)       # (C, 21)

    # dense slot centers straight from the decoded meta columns (a
    # slot_meta(arange(C)) would be a C-row self-gather)
    lvA = jnp.maximum(m.vox_level, 0).astype(jnp.float32)
    edgeA = params.voxel_size / (2.0 ** lvA)
    pcx = mx + (m.vox_coords[:, 0].astype(jnp.float32) + 0.5) * edgeA
    pcy = my + (m.vox_coords[:, 1].astype(jnp.float32) + 0.5) * edgeA
    pcz = mz + (m.vox_coords[:, 2].astype(jnp.float32) + 0.5) * edgeA
    pc = jnp.stack([pcx, pcy, pcz], axis=-1)
    pn = jnp.stack([u0[0], u0[1], u0[2]], axis=-1)
    pack_rows = jnp.concatenate(
        [pn, pc, l2[:, None], m.is_plane.astype(jnp.float32)[:, None]],
        axis=-1)
    u3 = upd[:, None]
    m = m._replace(
        plane_center=jnp.where(u3, pc, m.plane_center),
        plane_normal=jnp.where(u3, pn, m.plane_normal),
        plane_pack=jnp.where(u3, pack_rows, m.plane_pack),
        plane_var=jnp.where(u3, pv, m.plane_var),
        plane_radius=jnp.where(upd, l2, m.plane_radius),
        last_num=jnp.where(upd, tN, m.last_num),
        jour=jnp.where(active, jour, m.jour),
    )

    # ---- absorb marginalized frames into the pool / fixed stats ----
    # mgsize is static, so the marginalized frames are a PREFIX SLICE of the
    # flattened window — all absorb work (segment sums, the pool ring
    # scatter, the position cumsum) runs on mgsize*Np points, not W*Np.
    nm = mgsize * Np
    slots_m = slots[:nm]
    w_m = flat_w[:nm]
    var_m = flat_var[:nm]
    slot_unsealed = (slots_m >= 0) & (
        m.fix_N[jnp.maximum(slots_m, 0)] < params.max_points)
    append = flat_v[:nm] & slot_unsealed

    # marginalized-frame contribution per slot (for the updated fixed
    # stats); the points' Bf covariance contributions are ALREADY in cov_add
    # (added once at insertion, accumulate_cov) — the reference never
    # re-adds either
    if tbl is None:
        rel_m = rel[:nm]
        wc_m = _seg_cols(slots_m, rel_m, append, C)   # (10, C)
    else:
        # per-point append = valid & per-SLOT unsealed: factorizes exactly
        unsealed = (m.fix_N < params.max_points).astype(jnp.float32)
        wc_m = tbl[:mgsize].sum(axis=0).T * unsealed[None, :]
    fix_P_new = m.fix_P + wc_m[0:6].T
    fix_v_new = m.fix_v + wc_m[6:9].T
    fix_N_new = m.fix_N + wc_m[9]

    newly_sealed = leaf & (fix_N_new >= params.max_points) & ~m.sealed
    sealed = m.sealed | newly_sealed
    m = m._replace(
        sealed=sealed,
        fix_P=fix_P_new, fix_v=fix_v_new, fix_N=fix_N_new,
    )

    # ring-append the marginalized raw points (pool feeds future splits)
    F = ms.pool_capacity
    pos_in_batch = jnp.cumsum(append.astype(jnp.int32)) - 1
    # NB: jnp.sum(int32) promotes to int64 under x64 — keep the ring head a
    # stable int32 so cond branches carrying the pool agree on dtypes
    n_app = jnp.sum(append.astype(jnp.int32)).astype(jnp.int32)
    dst = (pool.head + pos_in_batch) % F
    dst = jnp.where(append, dst, F)  # drop-mode
    pool = pool._replace(
        pts=pool.pts.at[dst].set(w_m, mode="drop"),
        var=pool.var.at[dst].set(var_m, mode="drop"),
        valid=pool.valid.at[dst].set(True, mode="drop"),
        slot=pool.slot.at[dst].set(slots_m, mode="drop"),
        head=(pool.head + n_app) % F,
    )
    # drop pool points of sealed voxels (reference clears point_fix when full,
    # octree.cpp:461-469); their mass lives on in the frozen cluster. The
    # mask uses the POST-append pool.slot so just-appended entries are judged
    # by their own voxel, not the ring slot they overwrote
    psl = jnp.maximum(pool.slot, 0)
    pool = pool._replace(
        valid=pool.valid & ~((pool.slot >= 0) & sealed[psl])
    )
    return m, pool


# ----------------------------------------------------------------- evict

def rebuild_child_links(m: VoxelMap, ms: MapStatic) -> VoxelMap:
    """Derive the child_slots rows from scratch (table rebuilds: evict,
    shard_table — slot indices move, so stored links go stale). Split nodes
    start as all -2, then every level>=1 entry links itself into its
    parent's octant lane via one parent-key probe."""
    C = ms.capacity
    occ = m.keys != vh.EMPTY_KEY
    base = jnp.where((m.state == 1) & occ, jnp.int32(-2), jnp.int32(-1))
    child = jnp.broadcast_to(base[:, None], (C, 8))
    is_child = occ & (m.vox_level >= 1)
    pkey = vh.encode(jnp.maximum(m.vox_level - 1, 0), m.vox_coords >> 1)
    ps = vh.find_slots_fp(m.fkeys, pkey, ms.probe)
    rows = jnp.where(is_child & (ps >= 0), ps, C)
    child = child.at[rows, _octant(m.vox_coords)].set(
        jnp.arange(C, dtype=jnp.int32), mode="drop")
    return m._replace(child_slots=child)


@partial(jax.jit, static_argnames=("ms", "dist"))
def evict(m: VoxelMap, pool: FixPool, cur_jour, params: MapParams, ms: MapStatic,
          dist: float | None = None, win_slots=None, win_mom=None):
    """Distance-based map release (local_mapping.cpp:317-344): rebuild the
    table keeping only entries visited within `dist` journey units (default
    ms.evict_dist). Rebuild (rather than tombstoning) keeps probe chains
    intact.

    win_slots/win_mom: optional cached (W, Np) window slot assignment and
    (W, C, 10) persistent moment table — remapped through the rebuild so the
    fused step's incremental invariants survive (a stale assignment paired
    with a moved table cell would double-count on re-descend)."""
    if dist is None:
        dist = ms.evict_dist
    keep = (m.keys != vh.EMPTY_KEY) & (cur_jour - m.jour < dist)
    old_keys = jnp.where(keep, m.keys, vh.EMPTY_KEY)
    fresh = jnp.full_like(m.keys, vh.EMPTY_KEY)
    new_keys, slots, placed = vh.insert_keys(fresh, old_keys, keep, ms.probe, rounds=ms.probe)

    dst = jnp.where(placed, slots, ms.capacity)

    def move(arr, fill=0):
        out = jnp.zeros_like(arr)
        if arr.dtype == bool:
            out = jnp.zeros_like(arr)
        return out.at[dst].set(jnp.where(
            placed.reshape((-1,) + (1,) * (arr.ndim - 1)), arr,
            jnp.zeros_like(arr)), mode="drop")

    vox_level = jnp.full_like(m.vox_level, -1).at[dst].set(
        jnp.where(placed, m.vox_level, -1), mode="drop")
    fkeys = jnp.zeros_like(m.fkeys).at[dst].set(
        jnp.where(placed, vh.fingerprint32(old_keys), 0), mode="drop")
    state2 = move(m.state)
    vox_coords2 = move(m.vox_coords)
    m2 = VoxelMap(
        keys=new_keys, fkeys=fkeys,
        state=state2, sealed=move(m.sealed),
        fix_P=move(m.fix_P), fix_v=move(m.fix_v), fix_N=move(m.fix_N),
        cov_add=move(m.cov_add),
        plane_center=move(m.plane_center), plane_normal=move(m.plane_normal),
        plane_pack=move(m.plane_pack),
        plane_var=move(m.plane_var), plane_radius=move(m.plane_radius),
        is_plane=move(m.is_plane),
        eig_val=move(m.eig_val), eig_vec=move(m.eig_vec),
        last_num=move(m.last_num), jour=move(m.jour),
        vox_level=vox_level, vox_coords=vox_coords2,
        # every slot index moved: derive the link rows from scratch
        child_slots=jnp.zeros_like(m.child_slots),
        meta_pack=_meta_rows(vox_level, vox_coords2, state2),
        n_dropped=m.n_dropped,
    )
    m2 = rebuild_child_links(m2, ms)
    # pool entries of evicted voxels die with them; refresh cached slots
    pslot, _, _ = descend(m2, pool.pts, params, ms)
    pool = pool._replace(valid=pool.valid & (pslot >= 0),
                         slot=jnp.where(pool.valid & (pslot >= 0), pslot, -1))
    if win_slots is None and win_mom is None:
        return m2, pool
    if win_slots is not None:
        old = jnp.maximum(win_slots, 0)
        ok = (win_slots >= 0) & placed[old]
        win_slots = jnp.where(ok, slots[old], -1)
    if win_mom is not None:
        W_ = win_mom.shape[0]
        cols_t = jnp.swapaxes(win_mom, 0, 1).reshape(ms.capacity, -1)
        moved = jnp.zeros_like(cols_t).at[dst].set(
            jnp.where(placed[:, None], cols_t, 0.0), mode="drop")
        win_mom = jnp.swapaxes(
            moved.reshape(ms.capacity, W_, -1), 0, 1)
    return m2, pool, win_slots, win_mom
