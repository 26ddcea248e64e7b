"""Unit tests for core math vs NumPy/SciPy oracles and the identities in
the reference formulation doc (docs/VNCLio_formulation.md:148-194)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vina_slam_tpu.core import so3, eigh3, cluster, state, pointcov

rng = np.random.default_rng(0)


def rand_rotvec(n, scale=2.0):
    return rng.normal(size=(n, 3)) * scale


class TestSO3:
    def test_exp_log_roundtrip(self):
        # stay inside the principal domain |w| < pi (log returns principal values)
        w = rand_rotvec(64, 0.8)
        w = w / np.maximum(1.0, np.linalg.norm(w, axis=-1, keepdims=True) / 3.0)
        R = so3.exp(jnp.asarray(w))
        w2 = so3.log(R)
        np.testing.assert_allclose(np.asarray(w2), w, atol=1e-9)

    def test_exp_orthonormal(self):
        w = rand_rotvec(32)
        R = np.asarray(so3.exp(jnp.asarray(w)))
        np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), R.shape), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)

    def test_exp_small_angle(self):
        w = jnp.asarray([[1e-12, 0, 0], [0.0, 0.0, 0.0]])
        R = so3.exp(w)
        np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-11)

    def test_hat_antisymmetric(self):
        v = jnp.asarray(rng.normal(size=(10, 3)))
        H = so3.hat(v)
        np.testing.assert_allclose(np.asarray(H + jnp.swapaxes(H, -1, -2)), 0, atol=0)
        x = jnp.asarray(rng.normal(size=(10, 3)))
        np.testing.assert_allclose(
            np.asarray(jnp.einsum("nij,nj->ni", H, x)), np.cross(np.asarray(v), np.asarray(x)), atol=1e-12
        )

    def test_jr_derivative_identity(self):
        # Exp(w + dw) ~ Exp(w) Exp(Jr(w) dw)
        w = rand_rotvec(16, 1.0)
        dw = rng.normal(size=(16, 3)) * 1e-6
        lhs = np.asarray(so3.exp(jnp.asarray(w + dw)))
        rhs = np.asarray(so3.exp(jnp.asarray(w))) @ np.asarray(
            so3.exp(jnp.einsum("nij,nj->ni", so3.jr(jnp.asarray(w)), jnp.asarray(dw)))
        )
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)

    def test_jr_inv_is_inverse(self):
        w = rand_rotvec(16, 1.0)
        J = np.asarray(so3.jr(jnp.asarray(w)))
        Jinv = np.asarray(so3.jr_inv_vec(jnp.asarray(w)))
        np.testing.assert_allclose(J @ Jinv, np.broadcast_to(np.eye(3), J.shape), atol=1e-9)

    def test_jr_inv_from_matrix(self):
        w = rand_rotvec(8, 1.0)
        R = so3.exp(jnp.asarray(w))
        np.testing.assert_allclose(
            np.asarray(so3.jr_inv(R)), np.asarray(so3.jr_inv_vec(jnp.asarray(w))), atol=1e-7
        )


class TestEigh3:
    def _check(self, A, atol=1e-8):
        w, V = eigh3.eigh3(jnp.asarray(A))
        w, V = np.asarray(w), np.asarray(V)
        w_ref = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(w, w_ref, atol=atol)
        # ascending order
        assert np.all(np.diff(w, axis=-1) >= -atol)
        # A V = V diag(w)
        resid = A @ V - V * w[..., None, :]
        np.testing.assert_allclose(resid, 0, atol=atol * 10)
        # orthonormal
        np.testing.assert_allclose(
            np.swapaxes(V, -1, -2) @ V, np.broadcast_to(np.eye(3), V.shape), atol=atol * 10
        )

    def test_random(self):
        B = rng.normal(size=(200, 3, 3))
        A = B @ np.swapaxes(B, -1, -2)
        self._check(A)

    def test_plane_like(self):
        # thin-plane covariances: lambda_min << others (the SLAM hot case)
        n = 100
        U = np.linalg.qr(rng.normal(size=(n, 3, 3)))[0]
        w = np.stack([rng.uniform(1e-7, 1e-4, n), rng.uniform(0.05, 0.2, n), rng.uniform(0.3, 1.0, n)], -1)
        A = np.einsum("nik,nk,njk->nij", U, w, U)
        wgot, V = eigh3.eigh3(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(wgot), np.sort(w, axis=-1), rtol=1e-5, atol=1e-9)
        # normal direction correct
        vmin_ref = np.take_along_axis(U, np.argmin(w, -1)[:, None, None].repeat(3, 1), axis=2)[..., 0]
        dots = np.abs(np.sum(np.asarray(V)[..., 0] * vmin_ref, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-6)

    def test_degenerate(self):
        A = np.stack([np.eye(3) * 2.0, np.zeros((3, 3)), np.diag([1.0, 1.0, 5.0])])
        self._check(A, atol=1e-7)

    def test_f32_voxel_centered(self):
        # f32 accuracy on voxel-centered moments (coords <= 1m)
        pts = rng.uniform(-0.5, 0.5, size=(50, 3)).astype(np.float32)
        pts[:, 2] *= 0.01  # near-planar
        A = np.cov(pts.T, bias=True).astype(np.float32)
        w, V = eigh3.eigh3(jnp.asarray(A))
        w_ref = np.linalg.eigvalsh(A.astype(np.float64))
        np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-6)

    def test_componentwise_matches_matrix_form(self):
        """eigh3c (flat lane-packed columns, used by the dense recut refit)
        agrees with eigh3 on eigenvalues and eigenvector directions."""
        B = rng.normal(size=(500, 3, 3)).astype(np.float32)
        A = B @ np.swapaxes(B, -1, -2)
        A[0] = np.eye(3)
        A[1] = 0.0
        A[2] = np.diag([1.0, 1.0, 5.0])
        w, V = eigh3.eigh3(jnp.asarray(A))
        (w0, w1, w2), Vc = eigh3.eigh3c(
            jnp.asarray(A[:, 0, 0]), jnp.asarray(A[:, 0, 1]),
            jnp.asarray(A[:, 0, 2]), jnp.asarray(A[:, 1, 1]),
            jnp.asarray(A[:, 1, 2]), jnp.asarray(A[:, 2, 2]))
        wc = np.stack([w0, w1, w2], -1)
        np.testing.assert_allclose(np.asarray(w), wc, rtol=1e-4, atol=1e-4)
        # eigenvector residual ||A v - w v|| small for well-separated rows
        Vm = np.stack([np.stack(Vc[k], -1) for k in range(3)], -1)  # (n,3,3)
        gaps = np.minimum(wc[:, 1] - wc[:, 0], wc[:, 2] - wc[:, 1])
        sep = gaps > 1e-2 * (1 + np.abs(wc).max(axis=-1))
        resid = np.einsum("nij,njk->nik", A, Vm) - wc[:, None, :] * Vm
        denom = 1.0 + np.abs(wc).max(axis=-1)
        assert (np.abs(resid).max(axis=(1, 2)) / denom)[sep].max() < 1e-3


class TestCluster:
    def test_from_points_and_cov(self):
        pts = rng.normal(size=(100, 3))
        c = cluster.from_points(jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(cluster.cov(c)), np.cov(pts.T, bias=True), atol=1e-10)

    def test_masked(self):
        pts = rng.normal(size=(100, 3))
        mask = rng.random(100) < 0.5
        c = cluster.from_points(jnp.asarray(pts), jnp.asarray(mask))
        ref = cluster.from_points(jnp.asarray(pts[mask]))
        np.testing.assert_allclose(np.asarray(c.P), np.asarray(ref.P), atol=1e-10)
        assert int(c.N) == int(ref.N)

    def test_transform_matches_pointwise(self):
        # transform(cluster) == cluster(transformed points)  (types.hpp:168-174)
        pts = rng.normal(size=(50, 3))
        R = np.asarray(so3.exp(jnp.asarray(rng.normal(size=3))))
        t = rng.normal(size=3)
        c = cluster.from_points(jnp.asarray(pts))
        ct = cluster.transform(c, jnp.asarray(R), jnp.asarray(t))
        cref = cluster.from_points(jnp.asarray(pts @ R.T + t))
        np.testing.assert_allclose(np.asarray(ct.P), np.asarray(cref.P), atol=1e-9)
        np.testing.assert_allclose(np.asarray(ct.v), np.asarray(cref.v), atol=1e-10)

    def test_transform_batched(self):
        pts = rng.normal(size=(4, 50, 3))
        c = cluster.from_points(jnp.asarray(pts))
        R = so3.exp(jnp.asarray(rng.normal(size=(4, 3))))
        t = jnp.asarray(rng.normal(size=(4, 3)))
        ct = cluster.transform(c, R, t)
        for i in range(4):
            cref = cluster.from_points(jnp.asarray(pts[i]) @ R[i].T + t[i])
            np.testing.assert_allclose(np.asarray(ct.P[i]), np.asarray(cref.P), atol=1e-9)


class TestState:
    def test_boxplus_boxminus_roundtrip(self):
        x = state.identity_state()
        delta = jnp.asarray(rng.normal(size=15) * 0.1)
        y = state.boxplus(x, delta)
        np.testing.assert_allclose(np.asarray(state.boxminus(y, x)), np.asarray(delta), atol=1e-10)

    def test_boxminus_boxplus_roundtrip(self):
        x = state.identity_state()
        y = state.boxplus(x, jnp.asarray(rng.normal(size=15) * 0.5))
        d = state.boxminus(y, x)
        z = state.boxplus(x, d)
        np.testing.assert_allclose(np.asarray(z.R), np.asarray(y.R), atol=1e-9)
        np.testing.assert_allclose(np.asarray(z.p), np.asarray(y.p), atol=1e-12)

    def test_batched_window(self):
        xs = state.identity_state(batch=(10,))
        assert xs.R.shape == (10, 3, 3) and xs.cov.shape == (10, 15, 15)
        d = jnp.asarray(rng.normal(size=(10, 15)) * 0.01)
        ys = state.boxplus(xs, d)
        np.testing.assert_allclose(np.asarray(state.boxminus(ys, xs)), np.asarray(d), atol=1e-10)


class TestPointCov:
    def test_body_var_psd_and_scale(self):
        pts = jnp.asarray(rng.uniform(-20, 20, size=(64, 3)))
        var = np.asarray(pointcov.body_var(pts, 0.02, 0.05))
        w = np.linalg.eigvalsh(var)
        assert (w > -1e-12).all()
        # radial variance ~ dept_err^2 along the bearing
        d = np.asarray(pts) / np.linalg.norm(np.asarray(pts), axis=-1, keepdims=True)
        radial = np.einsum("ni,nij,nj->n", d, var, d)
        np.testing.assert_allclose(radial, 0.02**2, rtol=1e-6)

    def test_var_init_extrinsic(self):
        R = np.asarray(so3.exp(jnp.asarray([0.1, -0.2, 0.3])))
        p = np.array([0.1, 0.0, -0.05])
        pts = rng.uniform(-10, 10, size=(16, 3))
        out_pts, out_var = pointcov.var_init(jnp.asarray(R), jnp.asarray(p), jnp.asarray(pts), 0.02, 0.05)
        np.testing.assert_allclose(np.asarray(out_pts), pts @ R.T + p, atol=1e-12)
        v0 = np.asarray(pointcov.body_var(jnp.asarray(pts), 0.02, 0.05))
        np.testing.assert_allclose(np.asarray(out_var), R @ v0 @ R.T, atol=1e-12)


class TestLinalgPSD:
    def test_solve_and_inv(self):
        from vina_slam_tpu.core import linalg as la
        import jax
        for n in (3, 15, 60):
            B = rng.normal(size=(n, n))
            A = B @ B.T + np.eye(n) * 0.1
            b = rng.normal(size=n)
            x = np.asarray(jax.jit(la.solve_psd)(jnp.asarray(A), jnp.asarray(b)))
            np.testing.assert_allclose(A @ x, b, atol=1e-8)
            Ainv = np.asarray(jax.jit(la.inv_psd)(jnp.asarray(A)))
            np.testing.assert_allclose(Ainv, np.linalg.inv(A), atol=1e-8)

    def test_matrix_rhs(self):
        from vina_slam_tpu.core import linalg as la
        B = rng.normal(size=(10, 10))
        A = B @ B.T + np.eye(10)
        X = rng.normal(size=(10, 4))
        got = np.asarray(la.solve_psd(jnp.asarray(A), jnp.asarray(X)))
        np.testing.assert_allclose(A @ got, X, atol=1e-9)
