"""TPU layout microbench: quantify the cost of (N, 3, 3) / (W, Np, 3)
window buffers vs packed flat-column layouts.

Decides the flat-window refactor (BENCH.md known next steps): if XLA pads
the two minor dims of (N, 3, 3) arrays to (8, 128) tiles, every roll/copy
of the window covariance buffer moves ~100x its logical bytes and packed
(6, N) columns win; if XLA picks a packed layout anyway, the refactor only
buys the reshape elimination.

Run on the TPU host: python scripts/layout_microbench.py
"""

import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

W, Np = 10, 4096
N = W * Np


def timeit(name, fn, n=20):
    out = jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt*1e6:9.1f} us")
    return out


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    stats0 = dev.memory_stats()
    base = stats0.get("bytes_in_use", 0)

    var_mat = jnp.zeros((W, Np, 3, 3), jnp.float32)
    jax.block_until_ready(var_mat)
    used1 = dev.memory_stats().get("bytes_in_use", 0) - base
    print(f"(W,Np,3,3) f32 logical {W*Np*9*4/1e6:.2f} MB, "
          f"device {used1/1e6:.2f} MB")

    var_col = jnp.zeros((6, N), jnp.float32)
    jax.block_until_ready(var_col)
    used2 = dev.memory_stats().get("bytes_in_use", 0) - base - used1
    print(f"(6,N)      f32 logical {6*N*4/1e6:.2f} MB, "
          f"device {used2/1e6:.2f} MB")

    pts = jnp.zeros((W, Np, 3), jnp.float32)
    jax.block_until_ready(pts)
    used3 = dev.memory_stats().get("bytes_in_use", 0) - base - used1 - used2
    print(f"(W,Np,3)   f32 logical {W*Np*3*4/1e6:.2f} MB, "
          f"device {used3/1e6:.2f} MB")

    roll_mat = jax.jit(lambda a: jnp.roll(a, -1, axis=0))
    roll_col = jax.jit(lambda a: jnp.roll(a.reshape(6, W, Np), -1, axis=1
                                          ).reshape(6, N))
    timeit("roll (W,Np,3,3) frame axis", lambda: roll_mat(var_mat))
    timeit("roll (6,W*Np) packed cols", lambda: roll_col(var_col))

    resh = jax.jit(lambda a: a.reshape(-1, 3) * 2.0)
    resh_keep = jax.jit(lambda a: a * 2.0)
    timeit("reshape (W,Np,3)->(N,3) + mul", lambda: resh(pts))
    timeit("mul (W,Np,3) no reshape", lambda: resh_keep(pts))

    # gather 3x3 rows vs packed 6-col gather (recut add_bf pattern)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, N, 8192))
    flat_mat = jnp.zeros((N, 3, 3), jnp.float32)
    g_mat = jax.jit(lambda a, i: a[i])
    g_col = jax.jit(lambda a, i: a[:, i])
    timeit("gather 8k rows of (N,3,3)", lambda: g_mat(flat_mat, idx))
    timeit("gather 8k cols of (6,N)", lambda: g_col(var_col, idx))

    # scatter set one frame (window push pattern)
    fr_mat = jnp.zeros((Np, 3, 3), jnp.float32)
    fr_col = jnp.zeros((6, Np), jnp.float32)
    s_mat = jax.jit(lambda a, v: jax.lax.dynamic_update_index_in_dim(a, v, 3, 0))
    s_col = jax.jit(lambda a, v: jax.lax.dynamic_update_slice(
        a.reshape(6, W, Np), v[:, None], (0, 3, 0)).reshape(6, N))
    timeit("set frame 3 of (W,Np,3,3)", lambda: s_mat(var_mat, fr_mat))
    timeit("set frame 3 of (6,W*Np)", lambda: s_col(var_col, fr_col))


if __name__ == "__main__":
    main()
