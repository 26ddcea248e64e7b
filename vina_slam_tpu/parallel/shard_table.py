"""Hash-range-sharded voxel table (the SURVEY §5.8 alternative, measured).

The production configuration keeps the voxel map REPLICATED per device
(parallel/mesh.py): every chip advances its own sequence, and the sharded
paths split point/voxel WORK, not map STORAGE. This module implements the
alternative — one logical map partitioned across the mesh — so the choice
is backed by an experiment instead of an assertion.

Owner rule: a node lives on the device that owns its ROOT voxel,

    owner(node) = splitmix64(encode(0, root_coords(node))) mod D,

where root_coords = coords >> level (every octree descendant shares its
root's owner). Because the reference's match walk (octree.cpp:551-595)
descends root -> leaf, keeping whole trees device-local makes the entire
multi-level walk shard-local: no per-level cross-device hops. Queries are
REPLICATED (broadcast once over ICI); each device walks its local table —
a point's root lives on exactly one device, so at most one shard reports a
hit — and the per-point match results join with one psum. Downstream, the
per-device factor extraction feeds ba.damping_iter(axis_name=...) whose
Hessian join is already a psum (parallel/mesh.sharded_damping_iter).

What the experiment shows (tests/test_shard_table.py, virtual CPU mesh):
  + map HBM per device drops ~D x at equal load factor (capacity / D),
    so a capacity-bound world can grow ~D x larger at fixed per-chip HBM;
  + match results and the BA optimum agree with the replicated map exactly;
  - every scan's query points must be visible to all devices, so the
    per-scan collective volume grows with the scan, not with the map —
    on <= 8 chips with maps well under HBM, replication stays the right
    default, which is why the production step keeps it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vina_slam_tpu.mapping import voxel_hash as vh
from vina_slam_tpu.mapping import voxel_map as vm
from vina_slam_tpu.parallel.mesh import shard_map
from jax.sharding import PartitionSpec as P


def owner_of_keys(keys: jnp.ndarray, D: int) -> jnp.ndarray:
    """Device owner of each stored node key: hash of its level-0 ancestor."""
    lv, coords = vh.decode(keys)
    root = coords >> jnp.maximum(lv, 0)[..., None]
    rootkey = vh.encode(0, root)
    return (vh._mix(rootkey) % jnp.uint64(D)).astype(jnp.int32)


def owner_of_points(pts: jnp.ndarray, voxel_size, D: int) -> jnp.ndarray:
    """Device owner of a query point (the owner of its root voxel)."""
    root = vh.coords_of(pts, voxel_size)
    rootkey = vh.encode(0, root)
    return (vh._mix(rootkey) % jnp.uint64(D)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("ms_local", "D"))
def shard_table(m: vm.VoxelMap, ms_local: vm.MapStatic, D: int):
    """Partition a replicated map into D per-device local tables.

    Returns a VoxelMap pytree with a leading (D,) axis (shard it over the
    mesh with NamedSharding(P("dp"))) plus a (D,) count of rows dropped by
    local-capacity overflow (0 in any sane sizing: expected rows per shard
    is occupied/D, and ms_local.capacity should be >= 2x that for probe
    health, i.e. the same load factor as the replicated table)."""
    occ = m.keys != vh.EMPTY_KEY
    owner = owner_of_keys(m.keys, D)
    cap_l = ms_local.capacity

    shards = []
    dropped = []
    for d in range(D):
        mine = occ & (owner == d)
        rows = vh.compact_indices(mine, cap_l, -1)
        sel = rows >= 0
        rr = jnp.maximum(rows, 0)
        keys_d = jnp.where(sel, m.keys[rr], vh.EMPTY_KEY)

        loc = vm.make_map(ms_local)
        tk, slots, placed = vh.insert_keys(loc.keys, keys_d, sel,
                                           ms_local.probe,
                                           rounds=ms_local.probe)
        tgt = jnp.where(placed, slots, cap_l)

        def place(dst, src):
            return dst.at[tgt].set(src[rr].astype(dst.dtype), mode="drop")

        loc = loc._replace(
            keys=tk,
            fkeys=loc.fkeys.at[tgt].set(vh.fingerprint32(keys_d), mode="drop"),
            **{f: place(getattr(loc, f), getattr(m, f))
               for f in vm.VoxelMap._fields
               if f not in ("keys", "fkeys", "n_dropped", "child_slots")},
        )
        # child links hold SLOT INDICES of the source table; re-derive them
        # against the local one (a node's whole subtree shares its root's
        # owner, so every parent is present locally)
        loc = vm.rebuild_child_links(loc, ms_local)
        n_over = (jnp.sum(mine.astype(jnp.int32)) - jnp.sum(sel & placed))
        shards.append(loc)
        dropped.append(n_over)

    stacked = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *shards)
    return stacked, jnp.stack(dropped)


def sharded_match_points(mesh, params: vm.MapParams, ms_local: vm.MapStatic):
    """match_points over the partitioned table: queries replicated, each
    device walks its local table, per-point results psum-joined (a query's
    root is owned by exactly one device, so the masked sum IS the select).
    Returns fn(m_stacked, wld, var_w) -> (ok, normal, center, sigma)."""

    def local(m_loc, wld, var_w):
        # shard_map passes the local block WITH its size-1 device axis
        m_loc = jax.tree_util.tree_map(lambda a: a[0], m_loc)
        ok, n, c, sig = vm.match_points(m_loc, wld, var_w, params, ms_local)
        okf = ok.astype(jnp.float32)[:, None]
        n_j = jax.lax.psum(n * okf, "dp")
        c_j = jax.lax.psum(c * okf, "dp")
        sig_j = jax.lax.psum(sig * okf[:, 0], "dp")
        ok_j = jax.lax.psum(ok.astype(jnp.int32), "dp") > 0
        return ok_j, n_j, c_j, sig_j

    return shard_map(local, mesh,
                     in_specs=(P("dp"), P(), P()),
                     out_specs=(P(), P(), P(), P()))


def sharded_extract_ba(mesh, params: vm.MapParams, ms_local: vm.MapStatic,
                       W: int, Vmax_local: int, max_iter: int = 10,
                       use_normal: bool = False):
    """Windowed BA over the partitioned table: each device assigns the
    (replicated) window points against its local table, extracts ITS
    voxels' factors, and the LM driver joins per-shard Hessians with psum
    inside every iteration (ba.damping_iter axis_name) — the same join the
    replicated sharded-BA path uses, but here the factor arrays are truly
    local to the shard that owns the voxels, never gathered.

    Returns fn(m_stacked, win_w, win_valid, w0, pre_f, imu_coef)
    -> LMResult (replicated)."""
    from vina_slam_tpu.mapping import ba, factors as fx

    def local(m_loc, win_w, win_valid, w0, pre_f, imu_coef):
        m_loc = jax.tree_util.tree_map(lambda a: a[0], m_loc)
        flat_w = win_w.reshape(-1, 3)
        slots, _, _ = vm.descend(m_loc, flat_w, params, ms_local)
        slots = jnp.where(win_valid.reshape(-1), slots, -1).reshape(
            win_valid.shape)
        f = fx.extract_factors(m_loc, slots, win_w, win_valid,
                               w0.R, w0.p, params, ms_local, Vmax_local, W)
        return ba.damping_iter(w0, f, pre_f, imu_coef, W, max_iter=max_iter,
                               use_normal=use_normal, axis_name="dp")

    return shard_map(local, mesh,
                     in_specs=(P("dp"), P(), P(), P(), P(), P()),
                     out_specs=P())
