"""Pallas TPU kernel unit tests (interpret mode on the CPU test mesh).

The kernels compile through Mosaic only on real TPU hardware; here they run
under `interpret=True` (pallas_compact gates this on the backend), which
executes the same kernel logic with jnp semantics — enough to lock the
index math, masking, and overflow behavior against the XLA reference path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vina_slam_tpu.mapping import voxel_hash as vh
from vina_slam_tpu.ops.pallas_compact import compact_indices_tpu


@pytest.mark.parametrize(
    "n,size,fill,p",
    [
        (40960, 8192, 8192, 0.1),
        (40960, 4096, -1, 0.3),   # overflow: trues > size are dropped
        (2048, 2048, 2048, 0.9),
        (4096, 512, 512, 0.5),
        (1000, 256, 256, 0.2),    # n not a multiple of the chunk width
        (256, 64, 64, 0.0),       # all-false
        (256, 300, -7, 1.0),      # size > n, all-true
    ],
)
def test_compact_indices_tpu_matches_reference(n, size, fill, p):
    rng = np.random.default_rng(hash((n, size)) % 2**31)
    mask = rng.random(n) < p
    got = np.asarray(compact_indices_tpu(jnp.asarray(mask), size, fill))
    idx = np.nonzero(mask)[0][:size]
    want = np.full(size, fill, got.dtype)
    want[: len(idx)] = idx
    np.testing.assert_array_equal(got, want)


def test_compact_indices_dispatch_agrees():
    """voxel_hash.compact_indices (sort path on CPU) and the Pallas kernel
    produce identical results for the call-site shapes used in the fused
    step (recut re-descend, BA extract, margi refresh, IEKF re-walk)."""
    rng = np.random.default_rng(3)
    for n, size in [(36864, 4096), (8192, 2048), (40960, 8192)]:
        mask = jnp.asarray(rng.random(n) < 0.12)
        a = np.asarray(vh.compact_indices(mask, size, n))
        b = np.asarray(compact_indices_tpu(mask, size, n))
        np.testing.assert_array_equal(a, b)


class TestSegmentSum:
    """pallas_segsum experiment: exact agreement with jax.ops.segment_sum
    (interpret mode on the CPU backend; measured on TPU before any wiring)."""

    def _check(self, n, k, s, seed):
        import jax.numpy as jnp

        from vina_slam_tpu.ops.pallas_segsum import segment_sum_tpu

        r = np.random.default_rng(seed)
        cols = jnp.asarray(r.normal(size=(n, k)).astype(np.float32))
        # include out-of-range ids (the drop convention) and heavy collisions
        sid = jnp.asarray(r.integers(0, s + 3, size=n).astype(np.int32))
        want = jax.ops.segment_sum(cols, sid, num_segments=s + 3)[:s]
        got = segment_sum_tpu(cols, sid, s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_matches_segment_sum(self):
        self._check(n=3000, k=10, s=257, seed=0)

    def test_single_chunk_and_wide(self):
        self._check(n=1000, k=45, s=64, seed=1)

    def test_all_dropped(self):
        import jax.numpy as jnp

        from vina_slam_tpu.ops.pallas_segsum import segment_sum_tpu

        cols = jnp.ones((100, 4), jnp.float32)
        sid = jnp.full((100,), 50, jnp.int32)
        got = segment_sum_tpu(cols, sid, 50)
        assert float(jnp.abs(got).sum()) == 0.0
