#!/usr/bin/env python
"""Micro-profile of the windowed-BA LM driver at bench shapes (V=1024,
W=10): per-component costs (lidar_acc, lidar_residual, imu_assemble,
solve) and per-iteration LM cost, to target optimization work."""

import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
# cache EVERYTHING: the axon remote compile costs ~0.5 s RTT per
# program, and the init path dispatches hundreds of small programs
# that a 5 s write-threshold re-pays on every run
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np

from vina_slam_tpu.core import so3
from vina_slam_tpu.estimation import preintegration as pre
from vina_slam_tpu.mapping import ba, factors as fx


def timeit(fn, *args, n=30, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def build(V=1024, W=10, n_active=600, seed=0):
    rng = np.random.default_rng(seed)
    Pb = np.zeros((V, W, 3, 3), np.float32)
    vb = np.zeros((V, W, 3), np.float32)
    Nb = np.zeros((V, W), np.float32)
    for a in range(n_active):
        nrm = rng.normal(size=3)
        nrm /= np.linalg.norm(nrm)
        for i in range(W):
            n = int(rng.integers(5, 20))
            pts = rng.normal(scale=0.4, size=(n, 3))
            pts -= 0.95 * np.outer(pts @ nrm, nrm)
            m = pts.mean(0)
            Pb[a, i] = (pts - m).T @ (pts - m)
            vb[a, i] = m
            Nb[a, i] = n
    f = fx.BAFactors(
        Pb=jnp.asarray(Pb), vb=jnp.asarray(vb), Nb=jnp.asarray(Nb),
        fix_P=jnp.asarray(Pb[:, 0] * 2), fix_v=jnp.asarray(vb[:, 0] * 3),
        fix_N=jnp.asarray(Nb[:, 0] * 3),
        centers=jnp.asarray(rng.normal(scale=4, size=(V, 3)), jnp.float32),
        n_ref=jnp.asarray(rng.normal(size=(V, 3)), jnp.float32),
        coe=jnp.asarray((np.arange(V) < n_active).astype(np.float32)),
        n_valid=jnp.asarray(n_active, jnp.int32),
    )
    Rs = jnp.asarray(np.stack([np.asarray(so3.exp(rng.normal(scale=0.05, size=3)))
                               for _ in range(W)]))
    ps = jnp.asarray(rng.normal(scale=0.5, size=(W, 3)))
    K = 16
    gm = np.zeros((K, 3)); am = np.zeros((K, 3)); dt = np.zeros(K)
    gm[:10] = rng.normal(scale=0.1, size=(10, 3))
    am[:10] = rng.normal(scale=0.2, size=(10, 3)) + [0, 0, 9.8]
    dt[:10] = 0.01
    vmask = np.arange(K) < 10
    edge = pre.build_factor(jnp.asarray(gm), jnp.asarray(am), jnp.asarray(dt),
                            jnp.asarray(vmask), jnp.zeros(3), jnp.zeros(3),
                            jnp.eye(6) * 1e-4, jnp.eye(6) * 1e-6, 1.0)
    pre_f = jax.tree_util.tree_map(lambda a: jnp.stack([a] * (W - 1)), edge)
    w = ba.WindowPoses(R=Rs, p=ps, v=jnp.zeros((W, 3)), bg=jnp.zeros((W, 3)),
                       ba=jnp.zeros((W, 3)), g=jnp.asarray([0., 0., -9.8]))
    return f, w, pre_f


def main():
    W = 10
    f, w, pre_f = build(W=W)
    imu_coef = jnp.asarray(2e-4)

    acc = jax.jit(lambda: fx.lidar_acc(f, w.R, w.p, W))
    resid = jax.jit(lambda: fx.lidar_residual(f, w.R, w.p))
    nacc = jax.jit(lambda: fx.normal_acc(f, w.R, w.p, W))

    @jax.jit
    def imu_asm():
        return ba._imu_assemble(pre_f, w, W, False, True)

    _, H, g = imu_asm()
    from vina_slam_tpu.core.linalg import solve_psd_refined

    @jax.jit
    def solve():
        Hf = H + jnp.eye(H.shape[0]) * 1e-3
        return solve_psd_refined(Hf, -g)

    print(f"lidar_acc        {timeit(acc):8.3f} ms", flush=True)
    print(f"lidar_residual   {timeit(resid):8.3f} ms", flush=True)
    print(f"normal_acc       {timeit(nacc):8.3f} ms", flush=True)
    print(f"imu_assemble     {timeit(imu_asm):8.3f} ms", flush=True)
    print(f"solve150_refined {timeit(solve):8.3f} ms", flush=True)

    for mi in (1, 3, 10):
        fn = jax.jit(lambda mi=mi: ba.damping_iter(
            w, f, pre_f, imu_coef, W, max_iter=mi))
        out = fn()
        print(f"damping_iter(max_iter={mi:2d}) {timeit(fn, n=10):8.3f} ms "
              f"iters={int(out.iters)}", flush=True)


if __name__ == "__main__":
    main()
