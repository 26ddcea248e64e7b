#!/usr/bin/env python
"""Measure the Pallas sequential segment-sum experiment vs jax.ops.segment_sum
at the fused step's real call-site shapes (run on TPU; decides whether
ops/pallas_segsum gets wired into voxel_map/factors)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def bench(name, fn, *args, iters=30):
    fn = jax.jit(fn)
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:54s} {dt:8.3f} ms")
    return dt


def main():
    from vina_slam_tpu.ops.pallas_segsum import segment_sum_tpu

    r = np.random.default_rng(0)
    # (rows N, cols k, segments S): recut refit 10-col over capacity;
    # extraction 13-col over V*W; margi 10-col; Bf cov_add 45-col
    cases = [
        ("recut refit 10col  N=40960 S=32768", 40960, 10, 32768),
        ("extract 13col      N=40960 S=10240", 40960, 13, 10240),
        ("cov_add 45col      N=16384 S=32768", 16384, 45, 32768),
        ("win_count 1col     N=40960 S=32768", 40960, 1, 32768),
    ]
    for name, n, k, s in cases:
        cols = jnp.asarray(r.normal(size=(n, k)).astype(np.float32))
        sid = jnp.asarray(r.integers(0, s + 1, size=n).astype(np.int32))
        a = bench(f"XLA  segment_sum {name}",
                  lambda c, i: jax.ops.segment_sum(c, i, num_segments=s + 1)[:s],
                  cols, sid)
        b = bench(f"PLLS segment_sum {name}",
                  lambda c, i: segment_sum_tpu(c, i, s), cols, sid)
        print(f"  -> pallas/xla = {b / a:.2f}x")


if __name__ == "__main__":
    main()
