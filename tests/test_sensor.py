"""Sensor layer tests: decoder semantics vs the reference behavior, frame
assembly invariants, and synthetic world self-consistency."""

import numpy as np
import pytest

from vina_slam_tpu.core.config import HESAI, LIVOX, OUSTER, ROBOSENSE, TARTANAIR, VELODYNE
from vina_slam_tpu.sensor import decoders, synth
from vina_slam_tpu.sensor.sync import FrameAssembler, ImuStreamDry

rng = np.random.default_rng(1)


def _xyz(n, lo=1.0, hi=20.0):
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = rng.uniform(lo, hi, n)
    return d * r[:, None]


class TestDecoders:
    def test_livox_time_scale_and_blind(self):
        pts = _xyz(100)
        pts[:10] *= 0.01  # inside blind radius
        f = {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
             "reflectivity": np.ones(100), "offset_time": np.arange(100) * 1e6}
        out = decoders.decode(LIVOX, f, 5.0, 1, 0.5)
        assert out.pts.shape[0] == 90
        assert out.rel_time.max() <= 100e6 * 1e-9 + 1e-9

    def test_stride_filter(self):
        pts = _xyz(99)
        f = {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
             "offset_time": np.zeros(99)}
        out = decoders.decode(LIVOX, f, 0.0, 3, 0.0)
        assert out.pts.shape[0] == 33

    def test_velodyne_trusted_time(self):
        pts = _xyz(50)
        t = np.linspace(0, 0.09, 50)
        f = {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2], "intensity": np.zeros(50), "time": t}
        out = decoders.decode(VELODYNE, f, 0.0, 1, 0.0)
        np.testing.assert_allclose(out.rel_time, t, atol=1e-7)

    def test_velodyne_azimuth_reconstruction(self):
        # points swept clockwise at omega=3610 deg/s with no time field:
        # reconstructed rel_time should grow linearly with sweep angle
        n = 720
        true_t = np.arange(n) * (0.1 / n)
        yaw = np.radians(30.0) - 2 * np.pi * true_t / 0.0997  # ~full turn in 0.0997s
        r = 10.0
        f = {
            "x": r * np.cos(yaw), "y": r * np.sin(yaw), "z": np.zeros(n),
            "intensity": np.zeros(n), "time": np.zeros(n),
        }
        out = decoders.decode(VELODYNE, f, 0.0, 1, 0.0)
        assert out.pts.shape[0] > n * 0.9
        # linear fit of rel_time vs true time: slope ~ (360/0.0997)/3610
        A = np.vstack([true_t[: out.rel_time.size], np.ones(out.rel_time.size)]).T
        slope = np.linalg.lstsq(A, out.rel_time, rcond=None)[0][0]
        assert 0.9 < slope < 1.1

    def test_ouster_ns(self):
        pts = _xyz(10)
        f = {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2], "intensity": np.zeros(10),
             "t": np.arange(10) * 1e7}
        out = decoders.decode(OUSTER, f, 0.0, 1, 0.0)
        np.testing.assert_allclose(out.rel_time, np.arange(10) * 0.01, atol=1e-9)

    def test_hesai_rebase(self):
        pts = _xyz(10)
        f = {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2], "intensity": np.zeros(10),
             "timestamp": 1700000000.0 + np.arange(10) * 0.01}
        out = decoders.decode(HESAI, f, 1700000000.0, 1, 0.0)
        np.testing.assert_allclose(out.rel_time, np.arange(10) * 0.01, atol=1e-6)

    def test_robosense_2d_blind(self):
        # points at small xy radius but large |z| must be culled (2-D blind)
        f = {"x": np.array([0.1, 5.0]), "y": np.array([0.1, 5.0]),
             "z": np.array([10.0, 0.0]), "intensity": np.zeros(2),
             "timestamp": np.array([2.0, 2.01])}
        out = decoders.decode(ROBOSENSE, f, 2.0, 1, 1.0)
        assert out.pts.shape[0] == 1
        np.testing.assert_allclose(out.rel_time, [0.01], atol=1e-9)

    def test_tartanair_no_time(self):
        pts = _xyz(10)
        f = {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]}
        out = decoders.decode(TARTANAIR, f, 0.0, 1, 0.0)
        assert (out.rel_time == 0).all()

    def test_postprocess_sorts_and_trims(self):
        scan = decoders.DecodedScan(
            pts=np.arange(12, dtype=np.float32).reshape(4, 3),
            intensity=np.zeros(4, np.float32),
            rel_time=np.array([0.05, 0.01, 0.2, 0.03], np.float32),
            stamp=0.0,
        )
        out = decoders.scan_postprocess(scan)
        assert (np.diff(out.rel_time) >= 0).all()
        assert out.rel_time.max() <= 0.11
        assert out.pts.shape[0] == 3

    def test_postprocess_pads_empty(self):
        scan = decoders.DecodedScan(np.zeros((0, 3), np.float32), np.zeros(0, np.float32),
                                    np.zeros(0, np.float32), 1.0)
        out = decoders.scan_postprocess(scan)
        assert out.pts.shape[0] == 2


class TestSync:
    def _scan(self, stamp, span=0.1, n=10):
        return decoders.DecodedScan(
            _xyz(n).astype(np.float32), np.zeros(n, np.float32),
            np.linspace(0, span, n).astype(np.float32), stamp)

    def test_waits_for_imu_coverage(self):
        asm = FrameAssembler()
        asm.push_scan(self._scan(10.0))
        for t in np.arange(9.9, 10.09, 0.01):
            asm.push_imu(t, np.zeros(3), np.zeros(3))
        assert asm.try_assemble() is None  # imu_last <= scan end
        asm.push_imu(10.2, np.zeros(3), np.zeros(3))
        f = asm.try_assemble()
        assert f is not None
        assert f.imu.t.size > 4
        assert f.imu.t.max() <= f.end_time

    def test_imu_dry_raises(self):
        asm = FrameAssembler()
        asm.push_scan(self._scan(10.0))
        for t in [9.9, 9.95, 10.0, 10.05, 10.08, 10.2]:
            asm.push_imu(t, np.zeros(3), np.zeros(3))
        # consume: all imus <= 10.1 popped, one remains -> ok
        f = asm.try_assemble()
        assert f is not None
        asm2 = FrameAssembler()
        asm2.push_scan(self._scan(10.0))
        for t in [10.0, 10.02, 10.04, 10.06, 10.08, 10.09, 10.15]:
            asm2.push_imu(t, np.zeros(3), np.zeros(3))
        f2 = asm2.try_assemble()  # fine
        assert f2 is not None

    def test_point_notime_mode(self):
        asm = FrameAssembler(point_notime=True)
        s1, s2 = self._scan(10.0, span=0.0), self._scan(10.1, span=0.0)
        asm.push_scan(s1)
        asm.push_scan(s2)
        for t in np.arange(9.9, 10.4, 0.01):
            asm.push_imu(t, np.zeros(3), np.zeros(3))
        f1 = asm.try_assemble()  # first scan only sets last_pcl_time
        f = f1 or asm.try_assemble()
        assert f is not None
        assert f.beg_time == pytest.approx(10.0)
        assert f.end_time == pytest.approx(10.1)


class TestSynth:
    def test_raycast_box(self):
        patches = synth.box_room([0, 0, 0], [10, 10, 10])
        o = np.zeros((3, 3))
        d = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
        r = synth.raycast(o, d, patches)
        np.testing.assert_allclose(r, 5.0, atol=1e-9)

    def test_static_scan_on_planes(self):
        # all returned points must lie on a wall: check plane residuals
        patches = synth.default_world()
        traj = synth.Trajectory(amp=(0, 0, 0), yaw_rate=0, wiggle=0)
        scan = synth.simulate_scan(traj, 0.0, patches, n_az=90, n_el=8)
        assert scan.pts.shape[0] > 200
        R, p = traj.pose(0.0)
        world = scan.pts @ R.T + p
        dists = []
        for pl in patches:
            dists.append(np.abs((world - pl.q) @ pl.n))
        mind = np.min(np.stack(dists), axis=0)
        assert np.percentile(mind, 95) < 1e-5

    def test_imu_consistency(self):
        # integrating synthesized IMU must reproduce the trajectory
        from vina_slam_tpu.core.constants import G_M_S2

        traj = synth.Trajectory()
        dt = 1e-3
        ts = np.arange(0.0, 3.0, dt)
        R = traj.rot(0.0)
        p = traj.pos(0.0)
        v = (traj.pos(dt) - traj.pos(-dt)) / (2 * dt)
        g = np.array([0, 0, -G_M_S2])
        import jax.numpy as jnp
        from vina_slam_tpu.core import so3
        for t in ts:
            gyr, acc = synth.imu_sample(traj, t + dt / 2)
            a_w = R @ acc + g  # midpoint-ish
            p = p + v * dt + 0.5 * a_w * dt * dt
            v = v + a_w * dt
            R = R @ np.asarray(so3.exp(jnp.asarray(gyr * dt)))
        np.testing.assert_allclose(p, traj.pos(3.0), atol=2e-3)
        np.testing.assert_allclose(R, traj.rot(3.0), atol=2e-3)

    def test_sequence_assembly(self):
        frames, gts = synth.simulate_sequence(duration=1.0, n_az=60, n_el=4)
        assert len(frames) >= 8
        f = frames[0]
        assert f.imu.t.size > 4
        assert (np.diff(f.scan.rel_time) >= 0).all()


class TestVelodyneExactParity:
    """The Python fallback unwrap must match the native state machine
    bit-for-bit (decode.cpp:79-108 == decoders._velodyne_unwrap_exact) on a
    wrap-around scan crossing the +/-180 deg seam."""

    def _wrap_scan(self, n=2000, seed=3):
        rng = np.random.default_rng(seed)
        true_t = np.arange(n) * (0.1 / n)
        # clockwise sweep starting near the atan2 seam so it wraps mid-scan,
        # plus azimuth jitter that triggers the fold-by-360 branch
        yaw = np.radians(175.0) - np.radians(3610.0) * true_t
        yaw += rng.normal(scale=2e-3, size=n)
        r = rng.uniform(2.0, 30.0, n)
        # sprinkle blind / |x|<0.1 points to exercise the skip paths
        r[rng.random(n) < 0.02] = 0.05
        x = (r * np.cos(yaw)).astype(np.float32)
        y = (r * np.sin(yaw)).astype(np.float32)
        z = rng.uniform(-1, 1, n).astype(np.float32)
        x[rng.random(n) < 0.01] = 0.05
        return x, y, z

    def test_python_matches_native(self):
        from vina_slam_tpu.sensor import native

        if not native.available():
            import subprocess
            subprocess.run(["make", "-C", "csrc"], cwd=str(
                __import__("pathlib").Path(__file__).resolve().parents[1]),
                check=False, capture_output=True)
            native._LIB = None
        if not native.available():
            pytest.skip("native decode library not built")

        x, y, z = self._wrap_scan()
        n = x.size
        inten = np.zeros(n, np.float32)
        tzero = np.zeros(n, np.float32)
        pts_n, int_n, rel_n = native.decode_velodyne(
            x, y, z, inten, tzero, 2, 1.0)
        idx_p, rel_p = decoders._velodyne_unwrap_exact(
            x, y, z, filter_num=2, blind_sq=1.0, omega_deg_s=3610.0)
        assert pts_n.shape[0] == idx_p.size
        np.testing.assert_array_equal(pts_n, np.stack([x, y, z], -1)[idx_p])
        np.testing.assert_allclose(rel_n, rel_p, rtol=0, atol=1e-7)
        # the scan actually wrapped (rel_time spans most of the revolution)
        assert rel_p.max() > 0.08

    def test_decode_velodyne_uses_exact_machine(self):
        x, y, z = self._wrap_scan(seed=5)
        n = x.size
        f = {"x": x, "y": y, "z": z, "intensity": np.zeros(n),
             "time": np.zeros(n)}
        out = decoders.decode(VELODYNE, f, 0.0, 1, 1.0)
        idx_p, rel_p = decoders._velodyne_unwrap_exact(
            x, y, z, filter_num=1, blind_sq=1.0, omega_deg_s=3610.0)
        np.testing.assert_array_equal(out.pts, np.stack([x, y, z], -1)[idx_p])
        np.testing.assert_array_equal(out.rel_time, rel_p)
