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
    arrays' placement (XLA partitions the batch axis across devices)."""

    def one(st, args):
        return fused.steady_step(st, *args, ms=ms, W=W, Vmax=Vmax, cfgs=cfgs)

    return jax.jit(jax.vmap(one))
