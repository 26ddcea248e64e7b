"""Multi-sequence data parallelism: N independent SLAM instances on one
mesh.

SURVEY.md sections 2.9/5.8: the reference is a single-sequence robot
pipeline; the natural multi-chip extension is embarrassingly parallel
evaluation of a batch of sequences (per-device state, zero cross-device
traffic per scan — DCN-friendly). Implemented by sharding the leading
"sequence" axis of a stacked SteadyState over the mesh and pmapping/
shard_mapping the fused step; each device advances its own sequence.

This module drives throughput scaling for the bench's scans/sec target:
aggregate scans/sec = per-chip rate x devices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vina_slam_tpu.pipeline import fused


def stack_states(states: list) -> fused.SteadyState:
    """Stack per-sequence SteadyStates along a leading sequence axis."""
    return jax.tree_util.tree_map(lambda *a: jnp.stack(a), *states)


def shard_states(stacked, mesh: Mesh):
    """Place the leading sequence axis across the mesh."""
    sh = NamedSharding(mesh, P("dp"))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), stacked)


def make_batched_step(ms, W, Vmax, cfgs):
    """vmapped fused step over the sequence axis; jit once, shard with the
    arrays' placement (XLA partitions the batch axis across devices).

    NB: under vmap every lax.cond runs both branches and every while_loop
    runs until ALL batch members finish — fine for correctness tests, but
    per-device throughput scaling should use make_sharded_step."""

    def one(st, args):
        return fused.steady_step(st, *args, ms=ms, W=W, Vmax=Vmax, cfgs=cfgs)

    # donate the stacked state: undonated, every batched step COPIED all B
    # full SteadyStates (~100 MB each) — measured 2.4 s/step at B=4 vs
    # ~0.1 s donated (BENCH_VMAP first capture, BENCH.md round-5)
    return jax.jit(jax.vmap(one), donate_argnums=(0,))


def make_sharded_step(mesh: Mesh, ms, W, Vmax, cfgs):
    """shard_map fused step: ONE sequence per mesh 'dp' device, each
    advancing with NATIVE control flow (conds skip, whiles exit early per
    device — none of vmap's both-branches serialization). This is the
    production multi-sequence form (SURVEY.md sections 2.9/5.8): zero
    cross-device traffic per scan, aggregate scans/s = per-chip rate x
    devices.

    Inputs/outputs carry a leading sequence axis of length mesh.size,
    sharded over 'dp'; inside, each device sees its own unbatched
    SteadyState and runs the exact single-sequence program."""
    from vina_slam_tpu.parallel.mesh import shard_map

    def local(st, args):
        st1 = jax.tree_util.tree_map(lambda a: a[0], st)
        args1 = jax.tree_util.tree_map(lambda a: a[0], args)
        out = fused.steady_step(st1, *args1, ms=ms, W=W, Vmax=Vmax, cfgs=cfgs)
        return jax.tree_util.tree_map(lambda a: a[None], out)

    # check_vma off: the step is embarrassingly parallel (no collectives),
    # and its internal while_loops seed carries from replicated constants
    # (fresh hash tables), which the varying-axes checker rejects.
    return jax.jit(shard_map(local, mesh, in_specs=(P("dp"), P("dp")),
                             out_specs=P("dp"), check_vma=False))
