"""Estimation layer tests: EKF propagation/deskew and IMU preintegration
against NumPy oracles and finite differences."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vina_slam_tpu.core import so3, state
from vina_slam_tpu.core.constants import G_M_S2
from vina_slam_tpu.estimation import ekf, preintegration as pre
from vina_slam_tpu.sensor import synth
from vina_slam_tpu.sensor.sync import ImuBlock

rng = np.random.default_rng(2)


def make_ekf(point_notime=False):
    return ekf.ImuEkf(
        cov_gyr=np.full(3, 0.01), cov_acc=np.full(3, 1.0),
        cov_bias_gyr=np.full(3, 1e-4), cov_bias_acc=np.full(3, 1e-4),
        ext_R=np.eye(3), ext_p=np.zeros(3), point_notime=point_notime,
    )


def synth_imu_block(traj, t0, t1, hz=200.0, g_units=True):
    ts = np.arange(t0, t1 + 1e-9, 1.0 / hz)
    gyr = np.stack([synth.imu_sample(traj, t)[0] for t in ts])
    acc = np.stack([synth.imu_sample(traj, t)[1] for t in ts])
    if g_units:
        acc = acc / G_M_S2
    return ImuBlock(ts, gyr, acc)


class TestEkfInit:
    def test_static_init_gravity(self):
        e = make_ekf()
        x = state.identity_state()
        # static IMU: acc measures -g in body = +z up, in g-units
        blk = ImuBlock(
            np.arange(0, 0.2, 0.005),
            np.zeros((40, 3)),
            np.tile(np.array([0.0, 0.0, 1.0]), (40, 1)),
        )
        status, x, _, _ = e.process(x, np.zeros((0, 3), np.float32), np.zeros(0, np.float32), 0.0, 0.1, blk)
        assert status == 0
        assert e.init_flag
        assert e.scale_gravity == pytest.approx(G_M_S2)
        np.testing.assert_allclose(np.asarray(x.g), [0, 0, -G_M_S2], atol=1e-9)


class TestPropagation:
    def test_matches_trajectory(self):
        """Propagating through noise-free synthetic IMU from the true initial
        state must land near the true final pose."""
        traj = synth.Trajectory(ramp=0.5)
        e = make_ekf()
        e.init_flag = True
        e.scale_gravity = G_M_S2
        e.last_pcl_end_time = 2.0
        blk0 = synth_imu_block(traj, 1.99, 2.0)
        e.last_imu = (blk0.t[-1], blk0.gyr[-1], blk0.acc[-1])

        dt0 = 1e-4
        x = state.identity_state()
        x = x._replace(
            R=jnp.asarray(traj.rot(2.0)), p=jnp.asarray(traj.pos(2.0)),
            v=jnp.asarray((traj.pos(2.0 + dt0) - traj.pos(2.0 - dt0)) / (2 * dt0)),
            g=jnp.asarray([0.0, 0.0, -G_M_S2]), t=jnp.asarray(2.0),
        )
        for k in range(5):
            t0, t1 = 2.0 + 0.1 * k, 2.0 + 0.1 * (k + 1)
            blk = synth_imu_block(traj, t0 + 0.005, t1 + 0.004)
            status, x, _, _ = e.process(
                x, np.zeros((0, 3), np.float32), np.zeros(0, np.float32), t0, t1, blk
            )
            assert status == 1
        np.testing.assert_allclose(np.asarray(x.p), traj.pos(2.5), atol=5e-3)
        np.testing.assert_allclose(np.asarray(x.R), traj.rot(2.5), atol=5e-3)
        # covariance must stay symmetric PSD and grow
        C = np.asarray(x.cov)
        np.testing.assert_allclose(C, C.T, atol=1e-12)
        assert np.linalg.eigvalsh(C).min() > 0

    def test_deskew_static_identity(self):
        """With zero motion, deskew must leave points untouched."""
        e = make_ekf()
        e.init_flag = True
        e.scale_gravity = G_M_S2
        e.last_pcl_end_time = 1.0
        e.last_imu = (1.0, np.zeros(3), np.array([0, 0, 1.0]))
        x = state.identity_state()
        ts = np.arange(1.005, 1.15, 0.005)
        blk = ImuBlock(ts, np.zeros((len(ts), 3)), np.tile([0, 0, 1.0], (len(ts), 1)))
        pts = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
        rel = np.sort(rng.uniform(0, 0.1, 100)).astype(np.float32)
        status, x2, out, _ = e.process(x, pts, rel, 1.0, 1.1, blk)
        assert status == 1
        np.testing.assert_allclose(out, pts, atol=1e-4)

    def test_deskew_rotation(self):
        """Pure z-rotation at rate w: a point captured at rel time t must be
        rotated by R(w*(t_end - t)) relative to its raw coords."""
        w = 0.5  # rad/s about z
        e = make_ekf()
        e.init_flag = True
        e.scale_gravity = G_M_S2
        e.last_pcl_end_time = 1.0
        gyr = np.array([0.0, 0.0, w])
        e.last_imu = (1.0, gyr, np.array([0, 0, 1.0]))
        x = state.identity_state()
        ts = np.arange(1.01, 1.14, 0.01)
        blk = ImuBlock(ts, np.tile(gyr, (len(ts), 1)), np.tile([0, 0, 1.0], (len(ts), 1)))
        pts = np.array([[5.0, 0.0, 0.0]], np.float32).repeat(50, 0)
        rel = np.linspace(0.0, 0.1, 50).astype(np.float32)
        status, x2, out, _ = e.process(x, pts, rel, 1.0, 1.1, blk)
        # expected: R_end^T R(t) p  => rotate by -w*(0.1 - t)
        exp = np.stack([
            np.asarray(so3.exp(jnp.asarray([0.0, 0.0, -w * (0.1 - t)]))) @ pts[0]
            for t in rel
        ])
        np.testing.assert_allclose(out, exp, atol=2e-3)


class TestPreintegration:
    def _block(self, n=25, spin=1.0, seed=7):
        r = np.random.default_rng(seed)
        ts = np.cumsum(np.full(n, 0.005)) + 10.0
        gyr = r.normal(scale=spin, size=(n, 3))
        acc = r.normal(scale=1.0, size=(n, 3)) + [0, 0, 9.8]
        return ImuBlock(ts, gyr, acc)

    def test_delta_matches_naive(self):
        blk = self._block()
        bg = np.array([0.01, -0.02, 0.005])
        ba = np.array([0.1, 0.05, -0.08])
        f = pre.factor_from_block(blk, bg, ba, np.eye(6) * 0.01, np.eye(6) * 1e-4, 1.0)
        R, p, v = pre.naive_integrate(blk.t, blk.gyr, blk.acc, bg, ba)
        np.testing.assert_allclose(np.asarray(f.R_delta), R, atol=1e-10)
        np.testing.assert_allclose(np.asarray(f.p_delta), p, atol=1e-10)
        np.testing.assert_allclose(np.asarray(f.v_delta), v, atol=1e-10)
        assert float(f.dtime) == pytest.approx(blk.t[-1] - blk.t[0])

    def test_bias_jacobians_fd(self):
        """R_bg/p_bg/p_ba/v_bg/v_ba vs finite differences of the integration."""
        blk = self._block()
        bg = np.zeros(3)
        ba = np.zeros(3)
        f = pre.factor_from_block(blk, bg, ba, np.eye(6) * 0.01, np.eye(6) * 1e-4, 1.0)
        eps = 1e-6
        for k in range(3):
            dbg = np.zeros(3); dbg[k] = eps
            Rp, pp, vp = pre.naive_integrate(blk.t, blk.gyr, blk.acc, bg + dbg, ba)
            Rm, pm, vm = pre.naive_integrate(blk.t, blk.gyr, blk.acc, bg - dbg, ba)
            # d(DeltaR): R_delta(bg+d) ~ R_delta Exp(R_bg d)
            dtheta = np.asarray(so3.log(jnp.asarray(np.asarray(f.R_delta).T @ Rp)))
            np.testing.assert_allclose(dtheta / eps, np.asarray(f.R_bg)[:, k], atol=2e-4)
            np.testing.assert_allclose((pp - pm) / (2 * eps), np.asarray(f.p_bg)[:, k], atol=2e-4)
            np.testing.assert_allclose((vp - vm) / (2 * eps), np.asarray(f.v_bg)[:, k], atol=2e-4)
            dba = np.zeros(3); dba[k] = eps
            Rp, pp, vp = pre.naive_integrate(blk.t, blk.gyr, blk.acc, bg, ba + dba)
            Rm, pm, vm = pre.naive_integrate(blk.t, blk.gyr, blk.acc, bg, ba - dba)
            np.testing.assert_allclose((pp - pm) / (2 * eps), np.asarray(f.p_ba)[:, k], atol=2e-4)
            np.testing.assert_allclose((vp - vm) / (2 * eps), np.asarray(f.v_ba)[:, k], atol=2e-4)

    def test_zero_residual_at_truth(self):
        """Factor residual vanishes when states exactly match the
        preintegrated motion."""
        blk = self._block(spin=0.5)
        f = pre.factor_from_block(blk, np.zeros(3), np.zeros(3), np.eye(6) * 0.01, np.eye(6) * 1e-4, 1.0)
        g = np.array([0.0, 0.0, -9.8])
        # build st2 from st1 by applying the deltas (acc includes +9.8 z so
        # with g_world=-9.8 the motion is consistent by construction)
        R1 = np.asarray(so3.exp(jnp.asarray(rng.normal(size=3) * 0.3)))
        p1 = rng.normal(size=3)
        v1 = rng.normal(size=3)
        dt = float(f.dtime)
        x1 = state.identity_state()._replace(
            R=jnp.asarray(R1), p=jnp.asarray(p1), v=jnp.asarray(v1), g=jnp.asarray(g))
        R2 = R1 @ np.asarray(f.R_delta)
        p2 = p1 + v1 * dt + 0.5 * dt * dt * g + R1 @ np.asarray(f.p_delta)
        v2 = v1 + dt * g + R1 @ np.asarray(f.v_delta)
        x2 = state.identity_state()._replace(
            R=jnp.asarray(R2), p=jnp.asarray(p2), v=jnp.asarray(v2), g=jnp.asarray(g))
        cost, joca, jocb, jocg, rr, cov_inv = jax.jit(pre.evaluate)(f, x1, x2)
        np.testing.assert_allclose(np.asarray(rr), 0, atol=1e-9)

    def test_evaluate_jacobian_fd(self):
        """joca/jocb vs finite differences of the residual in the boxplus
        parameterization."""
        blk = self._block(spin=0.5)
        f = pre.factor_from_block(blk, np.zeros(3), np.zeros(3), np.eye(6) * 0.01, np.eye(6) * 1e-4, 1.0)
        g = np.array([0.0, 0.0, -9.8])
        x1 = state.identity_state()._replace(
            R=so3.exp(jnp.asarray([0.1, 0.2, -0.1])), p=jnp.asarray([1.0, 2.0, 3.0]),
            v=jnp.asarray([0.5, -0.2, 0.1]), g=jnp.asarray(g))
        x2 = state.identity_state()._replace(
            R=so3.exp(jnp.asarray([0.15, 0.1, 0.0])), p=jnp.asarray([1.1, 2.1, 3.2]),
            v=jnp.asarray([0.4, -0.1, 0.0]), g=jnp.asarray(g))

        ev = jax.jit(pre.evaluate)
        _, joca, jocb, _, rr0, _ = ev(f, x1, x2)
        eps = 1e-7
        for which, joc in [(0, joca), (1, jocb)]:
            for k in range(15):
                d = np.zeros(15); d[k] = eps
                # bias columns of joca are Jacobians w.r.t. the COUPLED
                # increment: the optimizer bumps the factor's dbg/dba together
                # with st1's bias (update_state, imu_preintegration.cpp:239-246)
                fp = f
                if which == 0 and k >= 9:
                    fp = pre.update_bias_state(f, jnp.asarray(d))
                if which == 0:
                    rp = np.asarray(ev(fp, state.boxplus(x1, jnp.asarray(d)), x2)[4])
                else:
                    rp = np.asarray(ev(fp, x1, state.boxplus(x2, jnp.asarray(d)))[4])
                fd = (rp - np.asarray(rr0)) / eps
                np.testing.assert_allclose(fd, np.asarray(joc)[:, k], atol=5e-4,
                                           err_msg=f"which={which} col={k}")

    def test_gravity_jacobian_fd(self):
        blk = self._block(spin=0.3)
        f = pre.factor_from_block(blk, np.zeros(3), np.zeros(3), np.eye(6) * 0.01, np.eye(6) * 1e-4, 1.0)
        g = np.array([0.0, 0.0, -9.8])
        x1 = state.identity_state()._replace(g=jnp.asarray(g), v=jnp.asarray([0.1, 0.0, 0.0]))
        x2 = state.identity_state()._replace(g=jnp.asarray(g), p=jnp.asarray([0.05, 0, 0]))
        ev = jax.jit(lambda f, a, b: pre.evaluate(f, a, b, with_gravity=True))
        _, _, _, jocg, rr0, _ = ev(f, x1, x2)
        eps = 1e-7
        for k in range(3):
            d = np.zeros(3); d[k] = eps
            x1p = x1._replace(g=jnp.asarray(g + d))
            rp = np.asarray(ev(f, x1p, x2)[4])
            np.testing.assert_allclose((rp - np.asarray(rr0)) / eps, np.asarray(jocg)[:, k], atol=1e-5)

    def test_bias_update_rollback(self):
        blk = self._block()
        f = pre.factor_from_block(blk, np.zeros(3), np.zeros(3), np.eye(6) * 0.01, np.eye(6) * 1e-4, 1.0)
        dxi = jnp.asarray(rng.normal(size=15) * 0.01)
        f2 = pre.update_bias_state(f, dxi)
        np.testing.assert_allclose(np.asarray(f2.dbg), np.asarray(dxi)[9:12], atol=1e-12)
        f3 = pre.rollback_bias_state(f2)
        np.testing.assert_allclose(np.asarray(f3.dbg), 0, atol=0)


class TestMerge:
    def test_merge_equals_full_integration(self):
        """IMU_PRE::merge (cpp:248-274): composing two preintegrated halves
        must equal integrating the whole block."""
        r = np.random.default_rng(13)
        n = 24
        ts = 10.0 + np.cumsum(np.full(n, 0.005))
        gyr = r.normal(scale=0.5, size=(n, 3))
        acc = r.normal(scale=1.0, size=(n, 3)) + [0, 0, 9.8]
        bg = np.array([0.01, -0.005, 0.002])
        ba = np.array([0.05, 0.02, -0.03])
        nm, nw = np.eye(6) * 0.01, np.eye(6) * 1e-4

        full = pre.factor_from_block(ImuBlock(ts, gyr, acc), bg, ba, nm, nw, 1.0)
        h = n // 2
        # split so the second half starts at the shared sample
        f1 = pre.factor_from_block(ImuBlock(ts[:h + 1], gyr[:h + 1], acc[:h + 1]),
                                   bg, ba, nm, nw, 1.0)
        f2 = pre.factor_from_block(ImuBlock(ts[h:], gyr[h:], acc[h:]),
                                   bg, ba, nm, nw, 1.0)
        merged = pre.merge(f1, f2)
        np.testing.assert_allclose(np.asarray(merged.R_delta), np.asarray(full.R_delta), atol=1e-10)
        np.testing.assert_allclose(np.asarray(merged.p_delta), np.asarray(full.p_delta), atol=1e-10)
        np.testing.assert_allclose(np.asarray(merged.v_delta), np.asarray(full.v_delta), atol=1e-10)
        assert float(merged.dtime) == pytest.approx(float(full.dtime))
        # bias Jacobians compose to the same values
        np.testing.assert_allclose(np.asarray(merged.R_bg), np.asarray(full.R_bg), atol=1e-8)
        np.testing.assert_allclose(np.asarray(merged.p_bg), np.asarray(full.p_bg), atol=1e-8)
        np.testing.assert_allclose(np.asarray(merged.v_ba), np.asarray(full.v_ba), atol=1e-8)
