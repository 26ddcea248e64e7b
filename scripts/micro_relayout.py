#!/usr/bin/env python
"""Micro-benchmark: does collapsing the window's leading dims force a
physical relayout on TPU?

Decides the 'flat (W*Np) window buffers end-to-end' lever (BENCH.md): if
(W, Np, 3) <-> (W*Np, 3) reshapes compile to bitcasts (expected when
Np % 8 == 0, since TPU tiling applies to the minormost two dims), the
refactor buys nothing; if they copy, flat storage removes one copy per
stage boundary per scan.

Prints ms per op for: reshape down, reshape up, the per-frame window
transform in (W, Np) form vs flat form, and a roll-shift in both forms.
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

W, Np = 10, 4096
N = W * Np


def bench(name, fn, *args, iters=50):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:8.3f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    win = jax.random.normal(key, (W, Np, 3), jnp.float32)
    flat = win.reshape(N, 3)
    R = jax.random.normal(key, (W, 3, 3), jnp.float32)
    p = jax.random.normal(key, (W, 3), jnp.float32)
    fid = jnp.repeat(jnp.arange(W, dtype=jnp.int32), Np)

    # +1.0 forces the reshape to feed a consumer (pure reshape would DCE)
    bench("reshape (W,Np,3)->(N,3) +consume", lambda a: a.reshape(N, 3) + 1.0, win)
    bench("reshape (N,3)->(W,Np,3) +consume", lambda a: a.reshape(W, Np, 3) + 1.0, flat)
    bench("baseline +consume (N,3)", lambda a: a + 1.0, flat)
    bench("baseline +consume (W,Np,3)", lambda a: a + 1.0, win)

    from vina_slam_tpu.core.mat3 import bmv

    bench("transform batched (W,Np,3)",
          lambda w, Rm, pm: bmv(Rm[:, None], w) + pm[:, None, :], win, R, p)

    def flat_transform(f, Rm, pm):
        out = jnp.zeros_like(f)
        for k in range(W):
            sel = (fid == k)[:, None]
            out = out + jnp.where(sel, bmv(Rm[k], f) + pm[k], 0.0)
        return out

    bench("transform flat masked-sum (N,3)", flat_transform, flat, R, p)

    def flat_transform_gather(f, Rm, pm):
        return bmv(Rm[fid], f) + pm[fid]

    bench("transform flat gathered-R (N,3)", flat_transform_gather, flat, R, p)

    bench("roll axis0 (W,Np,3)", lambda a: jnp.roll(a, -1, axis=0), win)
    bench("roll flat by Np (N,3)", lambda a: jnp.roll(a, -Np, axis=0), flat)

    # the (W, Np, 6) packed-var form used by win_var
    win6 = jax.random.normal(key, (W, Np, 6), jnp.float32)
    bench("reshape (W,Np,6)->(N,6) +consume",
          lambda a: a.reshape(N, 6) + 1.0, win6)


if __name__ == "__main__":
    main()
