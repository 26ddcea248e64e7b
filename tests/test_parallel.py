"""Multi-device tests for the parallel/ modules on the virtual 8-CPU mesh.

Covers SURVEY.md sections 2.9/5.8: the reference's std::thread fan-out +
join-reduce (optimizers.cpp:36-56, 204-242) maps to shard_map + psum here;
each sharded kernel must agree with its unsharded counterpart.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import __graft_entry__ as ge
from vina_slam_tpu.core import so3
from vina_slam_tpu.mapping import ba, factors as fx, voxel_map as vm
from vina_slam_tpu.parallel import mesh as pmesh
from vina_slam_tpu.parallel import multiseq

NDEV = 8


@pytest.fixture(scope="module")
def world():
    return ge._build_small_world(n_pts=64 * NDEV, cap=1 << 10)


@pytest.fixture(scope="module")
def mesh():
    cpus = jax.devices("cpu")
    assert len(cpus) >= NDEV, "conftest must provide 8 virtual CPU devices"
    return pmesh.make_mesh(NDEV, devices=cpus)


def _shard(mesh, a):
    return jax.device_put(a, NamedSharding(mesh, P("dp")))


def _repl(mesh, a):
    return jax.device_put(a, NamedSharding(mesh, P()))


def test_sharded_point_accumulate_matches_unsharded(world, mesh):
    ms, params, m, body = world
    n = body.shape[0]
    var = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None] * 1e-4, (n, 1, 1))
    valid = jnp.ones(n, bool)
    phat = so3.hat(body)
    R32 = jnp.eye(3, dtype=jnp.float32)
    p32 = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)

    def match_fn(pts, pvar, pvalid):
        ok, nrm, ctr, sig = vm.match_points(m, pts, pvar, params, ms)
        return ok & pvalid, nrm, ctr, sig

    # unsharded reference accumulation (same math as mesh.local)
    ok, nrm, ctr, sigma = match_fn(body, var, valid)
    w = jnp.where(ok, 1.0 / (0.0005 + sigma), 0.0).astype(jnp.float64)
    wld = body @ R32.T + p32
    resi = jnp.sum(nrm * (wld - ctr), axis=-1).astype(jnp.float64)
    jac_rot = jnp.einsum("nij,jk,nk->ni", phat, R32.T, nrm)
    jac = jnp.concatenate([jac_rot, nrm], axis=-1).astype(jnp.float64)
    HTH_ref = jnp.einsum("n,ni,nj->ij", w, jac, jac)
    HTz_ref = -jnp.einsum("n,ni,n->i", w, jac, resi)
    assert float(HTH_ref[5, 5]) > 0  # something actually matched

    acc = pmesh.sharded_point_accumulate(mesh, match_fn)
    with mesh:
        HTH, HTz = jax.jit(acc)(
            _shard(mesh, body), _shard(mesh, var), _shard(mesh, valid),
            _repl(mesh, R32), _repl(mesh, p32), _shard(mesh, phat))
    # psum reduces 8 per-shard partial sums; ordering differs from the
    # single einsum over f32-sourced values -> ~1e-8 relative noise
    np.testing.assert_allclose(np.asarray(HTH), np.asarray(HTH_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(HTz), np.asarray(HTz_ref),
                               rtol=1e-6, atol=1e-6)


def test_sharded_lidar_acc_matches_unsharded(world, mesh):
    ms, params, m, _ = world
    W, V = 4, 8 * NDEV
    w0, factors, _, _ = ge.build_ba_fixture(m, ms, params, V=V, W=W)
    assert int(factors.n_valid) > 0

    res_ref, jac_ref, H_ref = fx.lidar_acc(factors, w0.R, w0.p, W)

    acc = pmesh.sharded_lidar_acc(mesh, W)
    fspec = pmesh.factor_spec()
    with mesh:
        f_sh = jax.tree_util.tree_map(
            lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
            factors, fspec)
        res, jac, H = jax.jit(acc)(f_sh, _repl(mesh, w0.R), _repl(mesh, w0.p))
    # factor kernels accumulate in f32: per-shard partial sums differ from
    # the full-batch sum at f32 eps (~1e-7 absolute on O(1) entries)
    np.testing.assert_allclose(float(res), float(res_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ref),
                               rtol=2e-4, atol=3e-6)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref),
                               rtol=2e-4, atol=3e-6)


def test_sharded_damping_iter_matches_unsharded(world, mesh):
    ms, params, m, _ = world
    W, V = 4, 8 * NDEV
    w0, factors, pre_f, _ = ge.build_ba_fixture(m, ms, params, V=V, W=W)
    imu_coef = jnp.asarray(0.1)

    lm_ref = ba.damping_iter(w0, factors, pre_f, imu_coef, W, max_iter=3)

    run = pmesh.sharded_damping_iter(mesh, W, max_iter=3)
    fspec = pmesh.factor_spec()
    with mesh:
        f_sh = jax.tree_util.tree_map(
            lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
            factors, fspec)
        lm = jax.jit(run)(_repl(mesh, w0), f_sh, _repl(mesh, pre_f),
                          _repl(mesh, imu_coef))

    assert int(lm.iters) == int(lm_ref.iters)
    np.testing.assert_allclose(float(lm.residual1), float(lm_ref.residual1),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lm.poses.p),
                               np.asarray(lm_ref.poses.p),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(lm.poses.R),
                               np.asarray(lm_ref.poses.R),
                               rtol=1e-6, atol=1e-9)
    # the optimizer actually moved and did not diverge
    assert float(lm.residual1) <= float(lm.residual0) * (1 + 1e-9)


def test_multiseq_lockstep_matches_individual(world, mesh):
    """Two stacked sequences advanced by the batched fused step must equal
    two independently advanced fused steps (DP over sequences is pure)."""
    from vina_slam_tpu.pipeline import fused

    ms, params, m, _ = world
    W = 4
    Vmax = 32
    st0, args0, cfgs = ge.build_fused_fixture(m, ms, params, W=W, Vmax=Vmax,
                                              seed=1)
    st1, args1, _ = ge.build_fused_fixture(m, ms, params, W=W, Vmax=Vmax,
                                           seed=7)

    out0 = fused.steady_step(st0, *args0, ms=ms, W=W, Vmax=Vmax, cfgs=cfgs)
    out1 = fused.steady_step(st1, *args1, ms=ms, W=W, Vmax=Vmax, cfgs=cfgs)

    stacked = multiseq.stack_states([st0, st1])
    args = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), args0, args1)
    step = multiseq.make_batched_step(ms, W, Vmax, cfgs)
    out = step(stacked, args)

    for k, (single0, single1, batched) in enumerate(zip(
            (out0.x.p, out0.x.R, out0.jour, out0.win_count),
            (out1.x.p, out1.x.R, out1.jour, out1.win_count),
            (out.x.p, out.x.R, out.jour, out.win_count))):
        np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(single0),
                                   rtol=1e-6, atol=1e-8, err_msg=f"leaf {k} seq0")
        np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(single1),
                                   rtol=1e-6, atol=1e-8, err_msg=f"leaf {k} seq1")
    # the trajectory ring advanced exactly one row per sequence
    assert np.asarray(out.traj_head).tolist() == [1, 1]


def test_multiseq_sharded_step_matches_individual(world, mesh):
    """shard_map per-device fused step (native conds, one sequence per
    device) must equal independently advanced fused steps."""
    from vina_slam_tpu.pipeline import fused

    ms, params, m, _ = world
    W = 4
    Vmax = 32
    states, argss, outs = [], [], None
    cfgs = None
    for k in range(NDEV):
        stk, argk, cfgs = ge.build_fused_fixture(m, ms, params, W=W,
                                                 Vmax=Vmax, seed=1 + k)
        states.append(stk)
        argss.append(argk)

    ref = [fused.steady_step(s, *a, ms=ms, W=W, Vmax=Vmax, cfgs=cfgs)
           for s, a in zip(states, argss)]

    stacked = multiseq.stack_states(states)
    args = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *argss)
    with mesh:
        stacked = multiseq.shard_states(stacked, mesh)
        args = multiseq.shard_states(args, mesh)
        step = multiseq.make_sharded_step(mesh, ms, W, Vmax, cfgs)
        out = step(stacked, args)
        jax.block_until_ready(out.x.p)

    for k in range(NDEV):
        np.testing.assert_allclose(np.asarray(out.x.p[k]),
                                   np.asarray(ref[k].x.p),
                                   rtol=1e-6, atol=1e-8, err_msg=f"seq {k}")
        np.testing.assert_allclose(np.asarray(out.jour[k]),
                                   np.asarray(ref[k].jour),
                                   rtol=1e-6, err_msg=f"seq {k}")
    assert np.asarray(out.traj_head).tolist() == [1] * NDEV


def test_packed_step_matches_unpacked(world):
    """steady_step_packed (the 3-transfer production path) must be
    bit-identical to steady_step on the same frame: the pack is pure
    relayout (scan (Np,5) f32 / imu (K,17) f64 / scalars (2,))."""
    from vina_slam_tpu.pipeline import fused

    ms, params, m, _ = world
    W = 4
    Vmax = 32
    st0, args, cfgs = ge.build_fused_fixture(m, ms, params, W=W, Vmax=Vmax,
                                             seed=3)
    (pts, rel, valid, avr_gyr, avr_acc, dt_i, offt_i, valid_i,
     end_minus_last, scan_end_t, gm, am, dtm, vmsk, *consts) = args

    out_ref = fused.steady_step(st0, *args, ms=ms, W=W, Vmax=Vmax, cfgs=cfgs)

    Np = pts.shape[0]
    scan_pack = jnp.concatenate(
        [pts, rel[:, None],
         valid.astype(jnp.float32)[:, None]], axis=1)
    imu_pack = jnp.concatenate(
        [avr_gyr, avr_acc, dt_i[:, None], offt_i[:, None],
         valid_i.astype(jnp.float64)[:, None], gm, am, dtm[:, None],
         vmsk.astype(jnp.float64)[:, None]], axis=1)
    assert imu_pack.shape[1] == fused.IMU_PACK_COLS
    scal = jnp.stack([end_minus_last.astype(jnp.float64),
                      scan_end_t.astype(jnp.float64)])
    out_pk = jax.jit(
        fused._steady_step_packed,
        static_argnames=("ms", "W", "Vmax", "cfgs", "stop_after"))(
        st0, scan_pack, imu_pack, scal, *consts,
        ms=ms, W=W, Vmax=Vmax, cfgs=cfgs)

    for a, b in zip(jax.tree_util.tree_leaves(out_ref),
                    jax.tree_util.tree_leaves(out_pk)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
