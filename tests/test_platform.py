"""Platform layer tests: downsample ops, IO round-trips, metrics,
checkpoint/resume, dataset replay, config loading."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from vina_slam_tpu.core.config import SlamConfig, load_config
from vina_slam_tpu.ops import downsample as ds
from vina_slam_tpu.platform import io, metrics


rng = np.random.default_rng(7)


class TestDownsample:
    def test_mean_matches_numpy(self):
        pts = rng.uniform(-4, 4, (2000, 3)).astype(np.float32)
        valid = jnp.ones(2000, bool)
        out, ovalid, n = ds.downsample_mean(jnp.asarray(pts), valid,
                                            jnp.asarray(0.5, jnp.float32), 4096)
        # numpy oracle
        keys = np.floor(pts / 0.5).astype(np.int64)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        assert int(n) == len(uniq)
        means = np.zeros((len(uniq), 3))
        cnt = np.zeros(len(uniq))
        np.add.at(means, inv, pts)
        np.add.at(cnt, inv, 1)
        means /= cnt[:, None]
        got = np.asarray(out)[np.asarray(ovalid)]
        got_sorted = got[np.lexsort(got.T)]
        ref_sorted = means[np.lexsort(means.T)]
        np.testing.assert_allclose(got_sorted, ref_sorted, atol=1e-5)

    def test_close_keeps_real_points(self):
        pts = rng.uniform(-2, 2, (500, 3)).astype(np.float32)
        rel = rng.uniform(0, 0.1, 500).astype(np.float32)
        valid = jnp.ones(500, bool)
        out, orel, ovalid, n = ds.downsample_close(
            jnp.asarray(pts), jnp.asarray(rel), valid,
            jnp.asarray(0.5, jnp.float32), 1024)
        got = np.asarray(out)[np.asarray(ovalid)]
        # every output point must be one of the inputs (a REAL point)
        src = {tuple(np.round(p, 5)) for p in pts}
        for p in got:
            assert tuple(np.round(p, 5)) in src

    def test_pvec_averages_covs(self):
        pts = rng.uniform(0, 0.4, (50, 3)).astype(np.float32)  # one voxel
        var = np.tile(np.eye(3, dtype=np.float32)[None], (50, 1, 1))
        var[:25] *= 3.0
        out, ovar, ovalid, n = ds.downsample_pvec(
            jnp.asarray(pts), jnp.asarray(var), jnp.ones(50, bool),
            jnp.asarray(1.0, jnp.float32), 64)
        assert int(n) == 1
        np.testing.assert_allclose(np.asarray(ovar)[np.asarray(ovalid)][0],
                                   np.eye(3) * 2.0, atol=1e-5)


class TestIO:
    def test_tum_roundtrip(self, tmp_path):
        from vina_slam_tpu.core import so3
        p = str(tmp_path / "traj.txt")
        w = io.TumWriter(p)
        R = np.asarray(so3.exp(jnp.asarray([0.1, 0.2, 0.3])))
        w.write(123.456, R, np.array([1.0, 2.0, 3.0]))
        w.close()
        data = io.load_tum(p)
        assert data.shape == (1, 8)
        np.testing.assert_allclose(data[0, 1:4], [1, 2, 3], atol=1e-8)
        q = data[0, 4:8]
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-8)

    def test_quat_matches_rotation(self):
        from vina_slam_tpu.core import so3
        for seed in range(5):
            w = np.random.default_rng(seed).normal(size=3)
            R = np.asarray(so3.exp(jnp.asarray(w)))
            q = io.rot_to_quat(R)
            x, y, z, qw = q
            # rebuild R from quaternion
            R2 = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * qw), 2 * (x * z + y * qw)],
                [2 * (x * y + z * qw), 1 - 2 * (x * x + z * z), 2 * (y * z - x * qw)],
                [2 * (x * z - y * qw), 2 * (y * z + x * qw), 1 - 2 * (x * x + y * y)],
            ])
            np.testing.assert_allclose(R2, R, atol=1e-9)

    def test_pcd(self, tmp_path):
        p = str(tmp_path / "map.pcd")
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        io.save_pcd(p, pts)
        raw = open(p, "rb").read()
        assert b"POINTS 100" in raw
        body = raw.split(b"DATA binary\n", 1)[1]
        arr = np.frombuffer(body, "<f4").reshape(100, 4)
        np.testing.assert_allclose(arr[:, :3], pts, atol=0)


class TestMetrics:
    def test_ate_zero_for_aligned(self):
        traj = rng.normal(size=(50, 3))
        # rigidly transformed copy must align to ~0 error
        from vina_slam_tpu.core import so3
        R = np.asarray(so3.exp(jnp.asarray([0.3, -0.2, 0.5])))
        t = np.array([10.0, -5.0, 2.0])
        est = traj @ R.T + t
        assert metrics.ate_rmse(est, traj) < 1e-9

    def test_associate(self):
        ref_t = np.arange(0, 10, 0.1)
        est_t = ref_t[::2] + 0.003
        ie, ir = metrics.associate(est_t, ref_t)
        assert len(ie) == len(est_t)
        np.testing.assert_array_equal(ir, np.arange(0, len(ref_t), 2))


class TestConfig:
    def test_load_reference_format(self, tmp_path):
        yaml_text = """
vina_slam:
  ros__parameters:
    General:
      lid_topic: "/livox/lidar"
      lidar_type: 0
      blind: 3.0
      extrinsic_tran: [-0.011, -0.02329, 0.04412]
    Odometry:
      voxel_size: 0.5
      min_eigen_value: 0.0025
    LocalBA:
      win_size: 10
      max_layer: 3
      plane_eigen_value_thre: [4.0, 4.0, 4.0, 4.0]
"""
        p = tmp_path / "c.yaml"
        p.write_text(yaml_text)
        cfg = load_config(str(p))
        assert cfg.general.lidar_type == 0
        assert cfg.odometry.voxel_size == 0.5
        assert cfg.local_ba.win_size == 10
        np.testing.assert_allclose(cfg.plane_thre_inv, 0.25)
        assert cfg.blind_sq == pytest.approx(9.0)
        assert cfg.n_levels == 4

    def test_shipped_profiles(self):
        import glob
        profiles = glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                          "configs", "*.yaml"))
        assert len(profiles) >= 6
        for p in profiles:
            cfg = load_config(p)
            assert 0 <= cfg.general.lidar_type <= 5


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from vina_slam_tpu.pipeline.runner import SlamRunner
        from vina_slam_tpu.platform import checkpoint as ck

        cfg = SlamConfig()
        cfg.tpu.map_capacity = 1 << 10
        cfg.tpu.fix_pool_capacity = 1 << 10
        r1 = SlamRunner(cfg, npad_map=256)
        r1.jour = 12.5
        r1.traj = [[1.0, np.eye(3), np.array([1.0, 2, 3]), True]]
        path = str(tmp_path / "ck.npz")
        ck.save_checkpoint(path, r1)

        r2 = SlamRunner(cfg, npad_map=256)
        ck.load_checkpoint(path, r2)
        assert r2.jour == 12.5
        assert len(r2.traj) == 1
        assert r2.traj[0][3] is True
        np.testing.assert_allclose(np.asarray(r2.map.keys), np.asarray(r1.map.keys))


class TestNative:
    def test_native_velodyne_matches_numpy(self):
        from vina_slam_tpu.sensor import native
        if not native.available():
            pytest.skip("native library not built")
        n = 720
        true_t = np.arange(n) * (0.1 / n)
        yaw = np.radians(30.0) - 2 * np.pi * true_t / 0.0997
        r = 10.0
        x = (r * np.cos(yaw)).astype(np.float32)
        y = (r * np.sin(yaw)).astype(np.float32)
        z = np.zeros(n, np.float32)
        xyz, inten, t = native.decode_velodyne(
            x, y, z, np.zeros(n, np.float32), np.zeros(n, np.float32), 1, 0.0)
        assert len(t) > 0.9 * n
        A = np.vstack([true_t[: len(t)], np.ones(len(t))]).T
        slope = np.linalg.lstsq(A, t, rcond=None)[0][0]
        assert 0.9 < slope < 1.1

    def test_pc2_extract(self):
        from vina_slam_tpu.sensor import native
        if not native.available():
            pytest.skip("native library not built")
        # pack 10 points of (f32 x, f32 y, f32 z, u16 ring) with stride 16
        n = 10
        buf = np.zeros((n, 16), np.uint8)
        xs = rng.normal(size=n).astype(np.float32)
        buf[:, 0:4] = xs.view(np.uint8).reshape(n, 4)
        rings = np.arange(n, dtype=np.uint16)
        buf[:, 12:14] = rings.view(np.uint8).reshape(n, 2)
        got_x = native.pc2_extract(buf.tobytes(), n, 16, 0, 0)
        got_r = native.pc2_extract(buf.tobytes(), n, 16, 12, 3)
        np.testing.assert_allclose(got_x, xs, atol=1e-7)
        np.testing.assert_array_equal(got_r, rings)


class TestWebViz:
    """Live web viewer (platform/webviz.py) — the rviz MarkerArray analog
    for headless deployments (octree.cpp:758-949 publishers)."""

    def _tiny_map(self):
        from vina_slam_tpu.mapping import voxel_map as vm
        from vina_slam_tpu.mapping import voxel_hash as vh

        ms = vm.MapStatic(capacity=1 << 10, levels=3, probe=16, max_new=256,
                          pool_capacity=1 << 10)
        m = vm.make_map(ms)
        params = vm.default_params()
        # hand-populate two planar leaves (viz reads keys/is_plane/state/
        # plane_center/plane_normal/eig_val/plane_var only)
        keys = jnp.asarray(
            [vh.encode(0, jnp.asarray([1, 2, 3], jnp.int32)),
             vh.encode(1, jnp.asarray([4, 5, 6], jnp.int32))])
        m = m._replace(
            keys=m.keys.at[:2].set(keys),
            is_plane=m.is_plane.at[:2].set(True),
            plane_center=m.plane_center.at[:2].set(jnp.asarray(
                [[1.5, 2.5, 3.5], [2.25, 2.75, 3.25]], m.plane_center.dtype)),
            plane_normal=m.plane_normal.at[:2].set(jnp.asarray(
                [[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], m.plane_normal.dtype)),
            eig_val=m.eig_val.at[:2].set(jnp.asarray(
                [[1e-4, 0.02, 0.03], [2e-4, 0.01, 0.04]], m.eig_val.dtype)),
        )
        return m, params

    def test_scene_and_server_roundtrip(self, tmp_path):
        import json
        import urllib.request

        from vina_slam_tpu.platform import webviz

        m, params = self._tiny_map()
        traj = np.column_stack([
            np.linspace(0, 1, 5), np.linspace(0, 4, 5),
            np.zeros(5), np.full(5, 1.0)])
        path = str(tmp_path / "scene.json")
        webviz.write_scene_json(path, traj, m, params)
        scene = json.load(open(path))
        assert scene["frames"] == 5
        assert len(scene["planes"]) == 2
        assert len(scene["normals"]) == 2
        assert scene["planes"][0]["center"] == [1.5, 2.5, 3.5]
        # arrow length = half the leaf edge (level 1 -> 0.25 at voxel 1.0)
        n1 = scene["normals"][1]
        assert abs((n1["end"][0] - n1["start"][0]) - 0.25) < 1e-6

        srv = webviz.serve(path, port=0, background=True)
        try:
            base = f"http://127.0.0.1:{srv.server_address[1]}"
            html = urllib.request.urlopen(base + "/").read().decode()
            assert "vina_slam_tpu viewer" in html and "scene.json" in html
            fetched = json.loads(
                urllib.request.urlopen(base + "/scene.json").read())
            assert fetched["frames"] == 5
            assert urllib.request.urlopen(base + "/").status == 200
        finally:
            srv.shutdown()

    def test_cli_viz_flag_registered(self):
        from vina_slam_tpu import cli

        p = None
        try:
            cli.main(["viz"])  # missing --scene must error, not crash
        except SystemExit as e:
            p = e.code
        assert p == 2


class TestSessionDir:
    def test_overwrite_guard(self, tmp_path):
        """is_save_map=1 must refuse an existing session dir
        (node.cpp:269-279) and create a fresh one otherwise."""
        d = io.prepare_session_dir(str(tmp_path), "bagA", 1)
        assert os.path.isdir(d)
        with pytest.raises(io.SessionDirExists):
            io.prepare_session_dir(str(tmp_path), "bagA", 1)
        # is_save_map=0: existing dir is fine, missing dir is created
        assert io.prepare_session_dir(str(tmp_path), "bagA", 0) == d
        d2 = io.prepare_session_dir(str(tmp_path), "bagB", 0)
        assert os.path.isdir(d2)


class TestIncrementalViz:
    def _markers(self, ids, shift=0.0):
        return [{"id": int(i), "center": [float(i), shift, 0.0],
                 "normal": [0.0, 0.0, 1.0], "scale": [1, 1, 0.1],
                 "color": [0.1, 0.2, 0.3]} for i in ids]

    def test_marker_differ_add_change_delete(self):
        from vina_slam_tpu.platform.viz import MarkerDiffer

        d = MarkerDiffer()
        u0 = d.diff(self._markers([1, 2, 3]))
        assert {m["id"] for m in u0["add"]} == {1, 2, 3} and u0["delete"] == []
        # 2 changes content, 3 vanishes, 4 appears
        m1 = self._markers([1]) + self._markers([2], shift=1.0) + self._markers([4])
        u1 = d.diff(m1)
        assert {m["id"] for m in u1["add"]} == {2, 4}
        assert u1["delete"] == [3]
        # rebase=False keeps the baseline: same diff again
        u2 = d.diff(m1, rebase=False)
        assert {m["id"] for m in u2["add"]} == set()
        assert u2["delete"] == []

    def test_scene_streamer_base_plus_update_is_full_state(self, tmp_path):
        """Viewer contract: base scene (+) LATEST update == current state,
        regardless of missed ticks (updates are cumulative vs the base)."""
        import json as js

        from vina_slam_tpu.mapping import voxel_map as vm
        from vina_slam_tpu.platform.webviz import SceneStreamer
        from vina_slam_tpu.platform.viz import collect_plane_markers

        rng = np.random.default_rng(5)
        ms = vm.MapStatic(capacity=1 << 10, levels=2, probe=16,
                          max_new=512, pool_capacity=1 << 10)
        par = vm.default_params(voxel_size=2.0, min_eigen_value=0.01)
        m = vm.make_map(ms)
        pool = vm.make_pool(ms)

        def plane_cloud(n, z):
            uv = rng.uniform(-4, 4, (n, 2))
            return np.concatenate(
                [uv, np.full((n, 1), z) + rng.normal(0, 1e-3, (n, 1))],
                axis=1).astype(np.float32)

        s = SceneStreamer(str(tmp_path), snapshot_every=3)
        traj = np.zeros((1, 4))
        # tick 1: first map state -> snapshot written (base)
        win = jnp.asarray(plane_cloud(800, 0.5))[None]
        valid = jnp.ones((1, 800), bool)
        m, pool, *_ = vm.recut(m, pool, win, valid, par, ms, 1,
                               jnp.asarray(0.0, jnp.float32))
        s.tick(traj, m, par)
        assert os.path.exists(tmp_path / "scene.json")
        # ticks 2-3: grow the map (new planar voxels appear)
        for z in (2.5, 4.5):
            win = jnp.asarray(plane_cloud(800, z))[None]
            m, pool, *_ = vm.recut(m, pool, win, valid, par, ms, 1,
                                   jnp.asarray(0.0, jnp.float32))
            traj = np.vstack([traj, [[len(traj) * 0.1, z, 0, 0]]])
            upd = s.tick(traj, m, par)
        scene = js.load(open(tmp_path / "scene.json"))
        u = js.load(open(tmp_path / "update.json"))
        assert u["base"] == scene["base"]
        # reconstruct: base (+) latest update
        by_id = {mk["id"]: mk for mk in scene["planes"]}
        for i in u["planes"]["delete"]:
            by_id.pop(i, None)
        for mk in u["planes"]["add"]:
            by_id[mk["id"]] = mk
        want = {mk["id"]: mk for mk in collect_plane_markers(m, par)}
        assert by_id == want
        # trajectory tail reconstructs too
        got_traj = scene["trajectory"] + u["traj_add"]
        np.testing.assert_allclose(np.asarray(got_traj),
                                   traj[:, 1:4], atol=1e-12)
        # the update is a real DELTA, smaller than the scene
        assert len(u["planes"]["add"]) < len(want)
