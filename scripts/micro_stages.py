"""Micro-timings of the fused step's building blocks at bench shapes on the
real TPU (each jitted standalone — fusion context differs from the full
program, so treat as upper/lower bound hints, not exact stage costs)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

from vina_slam_tpu.core.constants import IMU_BUCKETS


def bench(name, fn, *args, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    W, Np, C = 10, 4096, 1 << 15
    K = 32

    # ---- EKF propagation (f64 assoc scan over K) ----
    from vina_slam_tpu.estimation import ekf as ekf_mod

    R0 = jnp.eye(3, dtype=jnp.float64)
    p0 = jnp.zeros(3); v0 = jnp.zeros(3)
    cov0 = jnp.eye(15, dtype=jnp.float64) * 1e-4
    bg = jnp.zeros(3); ba = jnp.zeros(3); g = jnp.asarray([0.0, 0.0, -9.8])
    gyr = jnp.asarray(rng.normal(0, 0.1, (K, 3)))
    acc = jnp.asarray(rng.normal(0, 0.1, (K, 3)) + np.array([0, 0, 9.8]))
    dt = jnp.full(K, 0.005); offt = jnp.cumsum(dt) - 0.005
    valid = jnp.arange(K) < 20
    c3 = jnp.full(3, 1e-4)
    prop = lambda: ekf_mod._propagate(R0, p0, v0, cov0, bg, ba, g, gyr, acc,
                                      dt, offt, valid, c3, c3, c3, c3,
                                      jnp.asarray(1.0), jnp.asarray(0.001))
    bench("_propagate K=32", prop)

    pose_table = jax.jit(prop)()[4]
    pts = jnp.asarray(rng.normal(0, 3, (Np, 3)), jnp.float32)
    rel = jnp.asarray(np.sort(rng.uniform(0, 0.1, Np)), jnp.float32)
    pvalid = jnp.ones(Np, bool)
    bench("_deskew Np=4096", lambda: ekf_mod._deskew(
        pts, rel, pvalid, pose_table, offt, jnp.asarray(20), R0, p0,
        jnp.eye(3, dtype=jnp.float64), jnp.zeros(3)))

    # ---- preintegration build_factor ----
    from vina_slam_tpu.estimation import preintegration as pre
    bench("pre.build_factor K=32", lambda: pre.build_factor(
        gyr, acc, dt * valid, valid, bg, ba, jnp.eye(6) * 1e-4,
        jnp.eye(6) * 1e-6, 1.0))

    # ---- world_var + pack (window push payload) ----
    from vina_slam_tpu.core import pointcov
    var = jnp.tile(jnp.asarray([1e-4, 0, 0, 1e-4, 0, 1e-4], jnp.float32)
                   [None], (Np, 1))
    var33 = pointcov.sym3_unpack(var)
    cov15 = jnp.eye(15, dtype=jnp.float32) * 1e-4
    bench("world_var Np=4096", lambda: pointcov.world_var(
        pts, var33, R0, p0, cov15))

    # ---- segment sums at recut shapes ----
    from vina_slam_tpu.mapping import voxel_map as vm
    slots = jnp.asarray(rng.integers(0, 9000, (W, Np)), jnp.int32)
    relp = jnp.asarray(rng.normal(0, 0.4, (W * Np, 3)), jnp.float32)
    wvalid = jnp.ones((W, Np), bool)
    bench("_seg_cols_frames (W,C,10)", lambda: vm._seg_cols_frames(
        slots, relp, wvalid, C, W))
    bench("_seg_cols (10,C)", lambda: vm._seg_cols(
        slots.reshape(-1), relp, wvalid.reshape(-1), C))

    # ---- dense eigh3c over C ----
    from vina_slam_tpu.core.eigh3 import eigh3c
    cols = [jnp.asarray(rng.normal(0, 1, C), jnp.float32) for _ in range(6)]
    c00 = cols[0] * cols[0] + 1.0
    c11 = cols[3] * cols[3] + 1.0
    c22 = cols[5] * cols[5] + 1.0
    bench("eigh3c dense C=32768", lambda: eigh3c(
        c00, cols[1], cols[2], c11, cols[4], c22))

    # ---- compact_indices (Pallas) at recut shapes ----
    from vina_slam_tpu.mapping import voxel_hash as vh
    need = jnp.asarray(rng.random(W * Np) < 0.05)
    bench("compact_indices 40960->4096", lambda: vh.compact_indices(
        need, 4096, -1))
    needC = jnp.asarray(rng.random(C) < 0.03)
    bench("compact_indices C->1024", lambda: vh.compact_indices(
        needC, 1024, -1))

    # ---- LM solve at BA shape ----
    from vina_slam_tpu.core.linalg import solve_psd_refined
    A = jnp.asarray(rng.normal(0, 1, (150, 150)))
    A = A @ A.T + 150 * jnp.eye(150)
    b = jnp.asarray(rng.normal(0, 1, 150))
    bench("solve_psd_refined 150x150", lambda: solve_psd_refined(A, b))

    # ---- lidar_acc at factor shapes ----
    from vina_slam_tpu.mapping import factors as fx, ba
    V = 1024
    Pb = jnp.asarray(rng.normal(0, 0.1, (V, W, 3, 3)), jnp.float32)
    Pb = Pb @ jnp.swapaxes(Pb, -1, -2)
    vb = jnp.asarray(rng.normal(0, 1, (V, W, 3)), jnp.float32)
    Nb = jnp.asarray(rng.integers(1, 50, (V, W)), jnp.float32)
    fixP = jnp.asarray(rng.normal(0, 0.1, (V, 3, 3)), jnp.float32)
    fixP = fixP @ jnp.swapaxes(fixP, -1, -2)
    fixv = jnp.asarray(rng.normal(0, 1, (V, 3)), jnp.float32)
    fixN = jnp.asarray(rng.integers(1, 50, V), jnp.float32)
    fac = fx.BAFactors(Pb=Pb, vb=vb, Nb=Nb, fix_P=fixP, fix_v=fixv,
                       fix_N=fixN,
                       centers=jnp.asarray(rng.normal(0, 5, (V, 3)), jnp.float32),
                       n_ref=jnp.zeros((V, 3), jnp.float32),
                       coe=jnp.ones(V, jnp.float32),
                       n_valid=jnp.asarray(V, jnp.int32))
    Rs = jnp.tile(jnp.eye(3, dtype=jnp.float64)[None], (W, 1, 1))
    ps = jnp.zeros((W, 3), jnp.float64)
    bench("lidar_acc V=1024 W=10", lambda: fx.lidar_acc(fac, Rs, ps, W))


if __name__ == "__main__":
    main()
