"""Pallas TPU segment-sum EXPERIMENT (prepared, not wired).

The steady step runs several `jax.ops.segment_sum` reductions per scan
(recut refit 10-col, factor extraction 13-col over V*W, margi, pool_fix,
Bf cov_add 45-col). XLA lowers f32 scatter-adds through its scatter
expander; this kernel instead keeps the WHOLE output table resident in
VMEM and streams the rows once, doing one dynamic-sublane read-modify-
write per row — the same sequential-accumulator loop the reference's CPU
threads run (slide_window recompute), but against on-chip memory.

Grid steps execute sequentially on a TensorCore, so the output block
(indexed by a constant) persists across steps and carries the running
sums; segment ids stream through SMEM in chunks (scalar loads must come
from SMEM), data rows through VMEM.

MEASURED (TPU v5e, scripts/micro_segsum.py): the XLA scatter path wins at
every real call-site shape — pallas/xla = 1.39x (recut refit 10-col,
N=40960 S=32768), 3.20x (extract 13-col), 2.52x (cov_add 45-col), 2.49x
(win-count 1-col). The sequential dynamic-sublane RMW loop cannot beat
XLA's vectorized scatter expander at these sizes, so this stays UNWIRED;
the production code keeps jax.ops.segment_sum. Kept as the negative
result + a working example of sequential-grid accumulation in Pallas.
Correctness is pinned in interpret mode by tests/test_pallas_ops.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 1024


def _kernel(sid_ref, cols_ref, out_ref, *, n_seg_pad, n_valid_seg, chunk):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(n, _):
        s = sid_ref[n]
        w = jnp.where(s < n_valid_seg, 1.0, 0.0)
        sc = jnp.minimum(s, n_seg_pad - 1)
        row = cols_ref[pl.ds(n, 1), :]
        out_ref[pl.ds(sc, 1), :] = out_ref[pl.ds(sc, 1), :] + row * w
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.partial(jax.jit, static_argnames=("n_seg", "k_out"))
def segment_sum_tpu(cols: jnp.ndarray, sid: jnp.ndarray, n_seg: int,
                    k_out: int | None = None) -> jnp.ndarray:
    """sum rows of cols (N, k) into (n_seg, k) by sid; sid >= n_seg drops.
    Equivalent to jax.ops.segment_sum(cols, sid, n_seg) for f32 inputs."""
    n, k = cols.shape
    assert sid.shape == (n,)
    npad = ((n + _CHUNK - 1) // _CHUNK) * _CHUNK
    spad = max(((n_seg + 7) // 8) * 8, 8)
    cols_p = jnp.zeros((npad, k), cols.dtype).at[:n].set(cols)
    # padded rows carry sid == n_seg -> dropped by the validity weight
    sid_p = jnp.full((npad,), n_seg, jnp.int32).at[:n].set(
        sid.astype(jnp.int32))
    out = pl.pallas_call(
        functools.partial(_kernel, n_seg_pad=spad, n_valid_seg=n_seg,
                          chunk=_CHUNK),
        grid=(npad // _CHUNK,),
        in_specs=[
            pl.BlockSpec((_CHUNK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_CHUNK, k), lambda i: (i, i - i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((spad, k), lambda i: (i - i, i - i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((spad, k), cols.dtype),
        interpret=jax.default_backend() == "cpu",
    )(sid_p, cols_p)
    return out[:n_seg]
