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
The partitioned-table alternative (SURVEY §5.8) is implemented and
measured in parallel/shard_table.py — it buys ~D x map capacity per chip
at the cost of broadcasting every scan's queries over ICI, which is the
right trade only when the map outgrows HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map  # jax >= 0.8 name

    def shard_map(f, mesh, in_specs, out_specs, check_vma=True):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_vma)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _sm

    def shard_map(f, mesh, in_specs, out_specs, check_vma=True):
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=check_vma)


def make_mesh(n_devices: int | None = None, axis: str = "dp",
              devices=None) -> Mesh:
    """Build a 1-D mesh. `devices` overrides the platform default — pass
    jax.devices("cpu") to validate shardings on a virtual host mesh without
    touching an attached accelerator."""
    devs = devices if devices is not None else jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise RuntimeError(f"mesh wants {n} devices, only {len(devs)} present")
    return Mesh(np.asarray(devs[:n]), (axis,))


def factor_spec():
    """PartitionSpec pytree sharding BAFactors voxel arrays over 'dp'."""
    from vina_slam_tpu.mapping import factors as fx

    return fx.BAFactors(
        Pb=P("dp"), vb=P("dp"), Nb=P("dp"), fix_P=P("dp"), fix_v=P("dp"),
        fix_N=P("dp"), centers=P("dp"), n_ref=P("dp"), coe=P("dp"),
        n_valid=P(),
    )


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

    return shard_map(local, mesh, in_specs=(factor_spec(), P(), P()),
                     out_specs=(P(), P(), P()))


def sharded_damping_iter(mesh: Mesh, W: int, max_iter: int = 10,
                         use_normal: bool = False):
    """The REAL windowed-BA LM driver (ba.damping_iter) with its lidar/
    normal factor evaluations sharded over the mesh 'dp' axis: each device
    holds a voxel slice of the BAFactors arrays, evaluates its slice inside
    every LM iteration, and the (residual, gradient, Hessian) are psum-
    reduced over ICI before the replicated damped solve (the reference's
    divide_thread join, optimizers.cpp:204-242, as collectives).

    Returns a function (w, factors_sharded, pre_f, imu_coef) -> LMResult
    with all outputs replicated."""
    from vina_slam_tpu.mapping import ba

    def local(w, f, pre_f, imu_coef):
        return ba.damping_iter(w, f, pre_f, imu_coef, W, max_iter=max_iter,
                               use_normal=use_normal, axis_name="dp")

    return shard_map(local, mesh,
                     in_specs=(P(), factor_spec(), P(), P()),
                     out_specs=P())
