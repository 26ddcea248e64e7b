"""Multi-chip scale-out via jax.sharding + shard_map.

The reference's only parallelism is shared-memory std::thread fan-out over
voxels/points with a join-reduce (SURVEY.md section 2.9). The TPU-native
equivalents here:

  * IEKF measurement accumulation: points sharded over the mesh 'dp' axis,
    per-shard 6x6 normal equations reduced with psum over ICI (replaces the
    per-thread Hessian join, optimizers.cpp:36-56).
  * BA factor evaluation: voxels sharded over 'dp', per-shard (residual,
    JacT, Hess) psum-reduced (replaces divide_thread).
  * Multi-sequence data parallelism: independent sequences mapped over the
    mesh for evaluation throughput (SURVEY.md section 5.8) — no per-scan
    cross-host traffic, DCN-friendly.

The voxel map itself stays replicated: it is a few hundred MB and every
shard needs random access to it; sharding the point/voxel WORK (the
bandwidth-heavy part) is where the reference spends its threads too.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map  # jax >= 0.8 name

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _sm

    def shard_map(f, mesh, in_specs, out_specs):
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def sharded_point_accumulate(mesh: Mesh, match_fn):
    """Build a sharded IEKF accumulation: `match_fn(pts, var, valid) ->
    (ok, nrm, ctr, sigma)` runs per shard on its point slice; the 6x6/6
    normal equations are psum-reduced over the mesh axis."""

    def local(pts, var, valid, R32, p32, phat):
        ok, nrm, ctr, sigma = match_fn(pts, var, valid)
        w = jnp.where(ok, 1.0 / (0.0005 + sigma), 0.0).astype(jnp.float64)
        wld = pts @ R32.T + p32
        resi = jnp.sum(nrm * (wld - ctr), axis=-1).astype(jnp.float64)
        jac_rot = jnp.einsum("nij,jk,nk->ni", phat, R32.T, nrm)
        jac = jnp.concatenate([jac_rot, nrm], axis=-1).astype(jnp.float64)
        HTH = jnp.einsum("n,ni,nj->ij", w, jac, jac)
        HTz = -jnp.einsum("n,ni,n->i", w, jac, resi)
        HTH = jax.lax.psum(HTH, "dp")
        HTz = jax.lax.psum(HTz, "dp")
        return HTH, HTz

    return shard_map(
        local, mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P(), P(), P("dp")),
        out_specs=(P(), P()),
    )


def sharded_lidar_acc(mesh: Mesh, W: int):
    """BA Hessian fan-out over voxels: each shard evaluates its voxel slice
    of the factor arrays, results psum over ICI."""
    from vina_slam_tpu.mapping import factors as fx

    def local(f, Rs, ps):
        res, JacT, H = fx.lidar_acc(f, Rs, ps, W)
        return (jax.lax.psum(res, "dp"), jax.lax.psum(JacT, "dp"),
                jax.lax.psum(H, "dp"))

    fspec = fx.BAFactors(
        Pb=P("dp"), vb=P("dp"), Nb=P("dp"), fix_P=P("dp"), fix_v=P("dp"),
        fix_N=P("dp"), centers=P("dp"), n_ref=P("dp"), coe=P("dp"),
        n_valid=P(),
    )
    return shard_map(local, mesh, in_specs=(fspec, P(), P()), out_specs=(P(), P(), P()))
