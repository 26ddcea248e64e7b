"""BA factor kernel tests: analytic gradients/Hessians of the eigenvalue
(LidarFactor) and normal-consistency (NormalFactor) costs vs finite
differences, plus LM optimizer convergence on synthetic windows."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vina_slam_tpu.core import so3
from vina_slam_tpu.mapping import ba, factors as fx
from vina_slam_tpu.estimation import preintegration as pre
from vina_slam_tpu.sensor.sync import ImuBlock


def make_factors(V=6, W=4, seed=0, n_pts=60, noise=0.01, static_poses=False):
    """Synthetic per-voxel planar clusters seen from W perturbed poses."""
    rng = np.random.default_rng(seed)
    if static_poses:
        Rs_true = [np.eye(3) for _ in range(W)]
        ps_true = [np.zeros(3) for _ in range(W)]
    else:
        Rs_true = [np.asarray(so3.exp(jnp.asarray(rng.normal(size=3) * 0.1))) for _ in range(W)]
        ps_true = [rng.normal(size=3) * 0.5 for _ in range(W)]

    Pb = np.zeros((V, W, 3, 3))
    vb = np.zeros((V, W, 3))
    Nb = np.zeros((V, W))
    centers = rng.uniform(-5, 5, (V, 3))
    n_ref = rng.normal(size=(V, 3))
    n_ref /= np.linalg.norm(n_ref, axis=-1, keepdims=True)

    for v in range(V):
        nrm = n_ref[v]
        b1 = np.cross(nrm, [0.3, 0.7, 0.1]); b1 /= np.linalg.norm(b1)
        b2 = np.cross(nrm, b1)
        for w in range(W):
            uv = rng.uniform(-0.5, 0.5, (n_pts, 2))
            pw = centers[v] + uv[:, :1] * b1 + uv[:, 1:] * b2
            pw += nrm * rng.normal(scale=noise, size=(n_pts, 1))
            pb = (pw - ps_true[w]) @ Rs_true[w]  # world -> body
            # central-moment parameterization (factors.py docstring)
            mean = pb.mean(0)
            pc = pb - mean
            Pb[v, w] = pc.T @ pc
            vb[v, w] = mean
            Nb[v, w] = n_pts

    f = fx.BAFactors(
        Pb=jnp.asarray(Pb), vb=jnp.asarray(vb), Nb=jnp.asarray(Nb),
        fix_P=jnp.zeros((V, 3, 3)), fix_v=jnp.zeros((V, 3)), fix_N=jnp.zeros(V),
        centers=jnp.asarray(centers), n_ref=jnp.asarray(n_ref),
        coe=jnp.ones(V), n_valid=jnp.asarray(V, jnp.int32),
    )
    return f, jnp.asarray(np.stack(Rs_true)), jnp.asarray(np.stack(ps_true))


def perturb(Rs, ps, d):
    """Right-perturb all poses by d (W, 6)."""
    return (jnp.einsum("wij,wjk->wik", Rs, so3.exp(d[:, 0:3])), ps + d[:, 3:6])


class TestLidarFactor:
    def test_gradient_fd(self):
        f, Rs, ps = make_factors()
        W = Rs.shape[0]
        res0, JacT, H = fx.lidar_acc(f, Rs, ps, W)
        # the factor kernels run in f32 (central moments): FD needs a larger
        # step than the f64 era, and the comparison an f32-appropriate rtol
        eps = 5e-4
        for k in range(6 * W):
            d = np.zeros((W, 6)); d.flat[k] = eps
            Rp, pp = perturb(Rs, ps, jnp.asarray(d))
            rp = float(fx.lidar_residual(f, Rp, pp))
            Rm, pm = perturb(Rs, ps, jnp.asarray(-d))
            rm = float(fx.lidar_residual(f, Rm, pm))
            fd = (rp - rm) / (2 * eps)
            np.testing.assert_allclose(fd, float(JacT[k]), rtol=5e-2, atol=2e-6,
                                       err_msg=f"grad col {k}")

    def test_hessian_fd_gn_dominant(self):
        """Near a noisy optimum the analytic (GN-style) Hessian must match
        the true second difference to good relative accuracy."""
        f, Rs, ps = make_factors(noise=0.02)
        W = Rs.shape[0]
        _, _, H = fx.lidar_acc(f, Rs, ps, W)
        H = np.asarray(H)
        np.testing.assert_allclose(H, H.T, atol=1e-9)
        eps = 3e-3
        # sample a few second differences d^T H d vs FD of the cost
        rng = np.random.default_rng(1)
        for _ in range(5):
            d = rng.normal(size=(W, 6)) * eps
            Rp, pp = perturb(Rs, ps, jnp.asarray(d))
            Rm, pm = perturb(Rs, ps, jnp.asarray(-d))
            r0 = float(fx.lidar_residual(f, Rs, ps))
            rp = float(fx.lidar_residual(f, Rp, pp))
            rm = float(fx.lidar_residual(f, Rm, pm))
            fd2 = (rp - 2 * r0 + rm)
            quad = float(d.reshape(-1) @ H @ d.reshape(-1))
            np.testing.assert_allclose(quad, fd2, rtol=0.3, atol=1e-6)

    def test_residual_matches_f64_oracle(self):
        """f32 central-moment residual vs f64 numpy eigenvalues from raw
        point reconstruction."""
        V, W, n_pts = 4, 3, 80
        rng2 = np.random.default_rng(17)
        f, Rs, ps = make_factors(V=V, W=W, seed=17, n_pts=n_pts, noise=0.01)
        got = float(fx.lidar_residual(f, Rs, ps))
        # oracle: rebuild aggregate covariance per voxel in f64
        tot = 0.0
        for v in range(V):
            P = np.zeros((3, 3)); s_ = np.zeros(3); n = 0.0
            for w in range(W):
                R = np.asarray(Rs[w]); p = np.asarray(ps[w]) - np.asarray(f.centers[v])
                u = R @ np.asarray(f.vb[v, w], np.float64) + p
                N = float(f.Nb[v, w])
                P += R @ np.asarray(f.Pb[v, w], np.float64) @ R.T + N * np.outer(u, u)
                s_ += N * u; n += N
            cov = P / n - np.outer(s_ / n, s_ / n)
            tot += np.linalg.eigvalsh(cov)[0]
        np.testing.assert_allclose(got, tot, rtol=1e-4, atol=1e-8)

    def test_residual_is_lambda_min(self):
        f, Rs, ps = make_factors(noise=0.0)
        # noise-free planes: residual ~ 0 at true poses (f32 path)
        assert float(fx.lidar_residual(f, Rs, ps)) < 1e-9
        # perturbed poses increase it
        d = jnp.full((Rs.shape[0], 6), 0.02)
        Rp, pp = perturb(Rs, ps, d)
        assert float(fx.lidar_residual(f, Rp, pp)) > 1e-7


class TestNormalFactor:
    def test_gradient_fd(self):
        f, Rs, ps = make_factors(seed=2, noise=0.02)
        W = Rs.shape[0]
        # rotate poses a bit so normals misalign with n_ref
        d0 = jnp.asarray(np.random.default_rng(3).normal(size=(W, 6)) * 0.05)
        Rs, ps = perturb(Rs, ps, d0)
        res0, JacT, H = fx.normal_acc(f, Rs, ps, W)
        assert float(res0) > 0
        eps = 5e-4
        for k in range(0, 6 * W, 5):
            d = np.zeros((W, 6)); d.flat[k] = eps
            Rp, pp = perturb(Rs, ps, jnp.asarray(d))
            Rm, pm = perturb(Rs, ps, jnp.asarray(-d))
            fd = (float(fx.normal_residual(f, Rp, pp)) -
                  float(fx.normal_residual(f, Rm, pm))) / (2 * eps)
            # GN gradient J^T r equals the true gradient of 0.5|r|^2 up to
            # the (small) curvature of u_min + f32 FD noise
            np.testing.assert_allclose(fd, float(JacT[k]), rtol=0.1, atol=1e-5,
                                       err_msg=f"col {k}")


class TestLMOptimizers:
    def test_lidar_only_converges(self):
        f, Rs, ps = make_factors(V=10, W=4, noise=0.005)
        W = 4
        rng = np.random.default_rng(5)
        d0 = jnp.asarray(rng.normal(size=(W, 6)) * 0.02)
        d0 = d0.at[0].set(0.0)  # keep gauge frame at truth
        R0, p0 = perturb(Rs, ps, d0)
        w0 = ba.WindowPoses(R=R0, p=p0, v=jnp.zeros((W, 3)), bg=jnp.zeros((W, 3)),
                            ba=jnp.zeros((W, 3)), g=jnp.asarray([0.0, 0.0, -9.8]))
        res = ba.damping_iter_lidar_only(w0, f, W, max_iter=10)
        assert float(res.residual1) < float(res.residual0) * 0.5

    def _imu_factors(self, W, dt_edge=0.1):
        """Static preintegration edges (zero motion, gravity-compensated)."""
        fs = []
        for i in range(W - 1):
            n = 21
            ts = np.linspace(0, dt_edge, n) + 10.0 + i * dt_edge
            blk = ImuBlock(ts, np.zeros((n, 3)), np.tile([0, 0, 9.8], (n, 1)))
            fs.append(pre.factor_from_block(blk, np.zeros(3), np.zeros(3),
                                            np.eye(6) * 0.01, np.eye(6) * 1e-4, 1.0))
        return jax.tree_util.tree_map(lambda *a: jnp.stack(a), *fs)

    def test_li_ba_converges(self):
        """Full lidar+IMU LM: static truth, perturbed window -> poses pulled
        back toward truth and residual decreases."""
        W = 4
        # static truth so lidar clusters and static IMU edges agree exactly
        rng = np.random.default_rng(9)
        f, Rs_t, ps_t = make_factors(V=10, W=W, noise=0.005, seed=8, static_poses=True)
        pre_f = self._imu_factors(W)
        d0 = jnp.asarray(rng.normal(size=(W, 6)) * 0.01)
        d0 = d0.at[0].set(0.0)
        R0, p0 = perturb(Rs_t, ps_t, d0)
        w0 = ba.WindowPoses(R=R0, p=p0, v=jnp.zeros((W, 3)), bg=jnp.zeros((W, 3)),
                            ba=jnp.zeros((W, 3)), g=jnp.asarray([0.0, 0.0, -9.8]))
        res = ba.damping_iter(w0, f, pre_f, jnp.asarray(1e-4), W, max_iter=8)
        assert float(res.residual1) <= float(res.residual0)
        # lidar geometry should dominate: refined poses closer to truth
        err0 = float(jnp.linalg.norm(p0[1:] - ps_t[1:]))
        err1 = float(jnp.linalg.norm(res.poses.p[1:] - ps_t[1:]))
        assert err1 < err0

    def test_gravity_variant_runs(self):
        W = 4
        f, Rs_t, ps_t = make_factors(V=10, W=W, noise=0.005, seed=11)
        pre_f = self._imu_factors(W)
        w0 = ba.WindowPoses(R=Rs_t, p=ps_t, v=jnp.zeros((W, 3)), bg=jnp.zeros((W, 3)),
                            ba=jnp.zeros((W, 3)), g=jnp.asarray([0.0, 0.1, -9.7]))
        res = ba.damping_iter(w0, f, pre_f, jnp.asarray(1e-4), W, max_iter=3,
                              with_gravity=True)
        assert np.isfinite(float(res.residual1))
        assert res.poses.g.shape == (3,)
