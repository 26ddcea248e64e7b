"""Tests for the initialization deskew, gravity alignment, scan-plane
extraction, and the kNN bootstrap odometry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vina_slam_tpu.core import so3, state
from vina_slam_tpu.core.constants import G_M_S2
from vina_slam_tpu.pipeline import initialization as init_mod
from vina_slam_tpu.pipeline import odometry as odom
from vina_slam_tpu.sensor import synth
from vina_slam_tpu.sensor.sync import ImuBlock

rng = np.random.default_rng(21)


class TestInitDeskew:
    def test_static_identity(self):
        """No motion: deskew = extrinsic transform only."""
        x = state.identity_state()
        ts = 10.0 + np.arange(0, 0.12, 0.005)
        imu = ImuBlock(ts, np.zeros((len(ts), 3)), np.tile([0, 0, 9.8], (len(ts), 1)))
        pts = rng.uniform(-5, 5, (50, 3)).astype(np.float32)
        rel = np.sort(rng.uniform(0, 0.1, 50)).astype(np.float32)
        ext_R = np.asarray(so3.exp(jnp.asarray([0.05, -0.02, 0.1])))
        ext_p = np.array([0.1, 0.0, 0.05])
        out = init_mod.init_deskew(
            x, np.zeros(3), np.zeros(3), imu, 10.0, jnp.asarray(pts),
            jnp.asarray(rel), jnp.ones(50, bool), ext_R, ext_p, 1.0)
        np.testing.assert_allclose(np.asarray(out), pts @ ext_R.T + ext_p, atol=1e-4)

    def test_rotation_consistency_with_ekf(self):
        """Backward init deskew must agree with the EKF's forward deskew on
        the same constant-rate rotation (up to the extrinsic-output frame)."""
        w = np.array([0.0, 0.0, 0.6])
        # conditioned IMU blocks end exactly at scan end (imu_ekf.cpp:96-106)
        ts = 10.0 + np.arange(0, 0.101, 0.01)
        n = len(ts)
        imu = ImuBlock(ts, np.tile(w, (n, 1)), np.tile([0, 0, 9.8], (n, 1)))
        # scan-end state: R(0.1*w)
        R_end = np.asarray(so3.exp(jnp.asarray(w * 0.1)))
        x = state.identity_state()._replace(R=jnp.asarray(R_end),
                                            g=jnp.asarray([0, 0, -9.8]))
        pts = np.tile([[4.0, 1.0, 0.5]], (20, 1)).astype(np.float32)
        rel = np.linspace(0.0, 0.1, 20).astype(np.float32)
        out = init_mod.init_deskew(
            x, np.zeros(3), np.zeros(3), imu, 10.0, jnp.asarray(pts),
            jnp.asarray(rel), jnp.ones(20, bool), np.eye(3), np.zeros(3), 1.0)
        # expected: point captured at time t was seen from R(w t) ->
        # in end frame: R_end^T R(w t) p
        exp = np.stack([
            R_end.T @ np.asarray(so3.exp(jnp.asarray(w * t))) @ pts[0]
            for t in rel])
        np.testing.assert_allclose(np.asarray(out), exp, atol=5e-3)


class TestAlignGravity:
    def test_aligns_to_minus_z(self):
        g0 = jnp.asarray([1.0, 2.0, -9.5])
        g0 = g0 / jnp.linalg.norm(g0) * 9.8
        W = 5
        Rs = so3.exp(jnp.asarray(rng.normal(size=(W, 3)) * 0.2))
        ps = jnp.asarray(rng.normal(size=(W, 3)))
        vs = jnp.asarray(rng.normal(size=(W, 3)))
        R2, p2, v2, g2 = init_mod.align_gravity(Rs, ps, vs, g0)
        g2 = np.asarray(g2)
        # gravity now along -z, norm preserved
        assert abs(g2[0]) < 1e-6 and abs(g2[1]) < 1e-6
        np.testing.assert_allclose(np.linalg.norm(g2), 9.8, atol=1e-9)
        # first position unchanged (pivot)
        np.testing.assert_allclose(np.asarray(p2[0]), np.asarray(ps[0]), atol=1e-12)
        # relative geometry preserved
        d_old = np.asarray(ps[1] - ps[0])
        d_new = np.asarray(p2[1] - p2[0])
        np.testing.assert_allclose(np.linalg.norm(d_new), np.linalg.norm(d_old), atol=1e-9)


class TestScanPlanes:
    def test_extracts_wall_normals(self):
        patches = synth.default_world()
        traj = synth.Trajectory(amp=(0, 0, 0), yaw_rate=0, wiggle=0)
        scan = synth.simulate_scan(traj, 0.0, patches, n_az=180, n_el=12)
        pts = jnp.asarray(scan.pts)
        valid = jnp.ones(pts.shape[0], bool)
        planes = odom.extract_scan_planes(
            pts, valid, jnp.asarray(1.0, jnp.float32),
            jnp.asarray(0.01, jnp.float32), (0.25, 0.25, 0.25, 0.25), levels=3)
        nvalid = int(jnp.sum(planes.valid))
        assert nvalid > 20
        # every valid scan plane's points should be on a wall: check normals
        # are close to one of the world plane normals
        world_normals = np.stack([p.n for p in patches])
        n = np.asarray(planes.normal)[np.asarray(planes.valid)]
        dots = np.abs(n @ world_normals.T).max(axis=1)
        assert (dots > 0.95).mean() > 0.9

    def test_quality_gates(self):
        """DENSE random voxels must not fit planes. (Sparse 3-point voxels
        ARE exactly planar and the reference accepts them too —
        octree.cpp:646-662; they get filtered later by the 0.7
        normal-consistency gate.)"""
        pts = jnp.asarray(rng.uniform(0, 4, (30000, 3)).astype(np.float32))
        valid = jnp.ones(30000, bool)
        planes = odom.extract_scan_planes(
            pts, valid, jnp.asarray(1.0, jnp.float32),
            jnp.asarray(0.01, jnp.float32), (0.25, 0.25, 0.25, 0.25), levels=1)
        # level-0 voxels hold ~470 random points each: never planar
        assert int(jnp.sum(planes.valid)) == 0


class TestKnnBootstrap:
    def test_recovers_small_offset(self):
        """kNN odometry pulls a slightly-off pose back to the map."""
        patches = synth.default_world()
        traj = synth.Trajectory(amp=(0, 0, 0), yaw_rate=0, wiggle=0)
        scan = synth.simulate_scan(traj, 0.0, patches, n_az=120, n_el=10)
        R_true, p_true = traj.pose(0.0)
        map_pts = (scan.pts @ R_true.T + p_true).astype(np.float32)
        M = 16384
        mp = np.zeros((M, 3), np.float32)
        mp[: len(map_pts)] = map_pts
        mvalid = np.zeros(M, bool)
        mvalid[: len(map_pts)] = True

        offset = np.array([0.05, -0.04, 0.03])
        x0 = state.identity_state()._replace(
            R=jnp.asarray(R_true), p=jnp.asarray(p_true + offset))
        # deweighted prior allows large corrections (odometry.cpp:396)
        x0 = x0._replace(cov=x0.cov * 100)
        scan2 = synth.simulate_scan(traj, 0.0, patches, n_az=115, n_el=9)
        x1 = odom.iekf_update_knn(
            x0, jnp.asarray(mp), jnp.asarray(mvalid),
            jnp.asarray(scan2.pts), jnp.ones(scan2.pts.shape[0], bool))
        err0 = np.linalg.norm(offset)
        err1 = np.linalg.norm(np.asarray(x1.p) - p_true)
        # the bootstrap only needs bounded, non-diverging estimates for ~10
        # frames until motion_init's BA takes over (node.cpp:293-366); at
        # cm-scale offsets its rotation/translation ambiguity limits the
        # per-scan contraction, exactly like the reference's kdtree path
        assert np.isfinite(err1)
        assert err1 < err0 * 1.5
        # the residual after the update must have dropped
        np.testing.assert_allclose(np.asarray(x1.R), R_true, atol=0.02)
