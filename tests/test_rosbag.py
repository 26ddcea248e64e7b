"""rosbag2 reader tests: build a synthetic .db3 with CDR-encoded messages
and replay it through the full decode+sync path."""

import sqlite3
import struct

import numpy as np
import pytest

from vina_slam_tpu.core.config import SlamConfig
from vina_slam_tpu.platform import rosbag

rng = np.random.default_rng(11)


def cdr_header(sec, nsec, frame="lidar"):
    b = struct.pack("<iI", sec, nsec)
    fid = frame.encode() + b"\x00"
    b += struct.pack("<I", len(fid)) + fid
    return b


def align(buf: bytes, n: int) -> bytes:
    r = len(buf) % n
    return buf + b"\x00" * ((n - r) % n)


def encode_imu(stamp, gyr, acc):
    body = cdr_header(int(stamp), int((stamp % 1) * 1e9))
    body = align(body, 8)
    body += struct.pack("<4d", 0, 0, 0, 1)
    body += struct.pack("<9d", *([0.0] * 9))
    body += struct.pack("<3d", *gyr)
    body += struct.pack("<9d", *([0.0] * 9))
    body += struct.pack("<3d", *acc)
    body += struct.pack("<9d", *([0.0] * 9))
    return b"\x00\x01\x00\x00" + body


def encode_pc2(stamp, pts, times):
    n = len(pts)
    body = cdr_header(int(stamp), int((stamp % 1) * 1e9))
    body = align(body, 4)
    body += struct.pack("<II", 1, n)  # height, width
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1),
              ("intensity", 12, 7, 1), ("time", 16, 7, 1)]
    body += struct.pack("<I", len(fields))
    for name, off, dt, cnt in fields:
        nm = name.encode() + b"\x00"
        body = align(body, 4)
        body += struct.pack("<I", len(nm)) + nm
        body = align(body, 4)
        body += struct.pack("<I", off)
        body += struct.pack("<B", dt)
        body = align(body, 4)
        body += struct.pack("<I", cnt)
    body += struct.pack("<B", 0)       # is_bigendian
    body = align(body, 4)
    body += struct.pack("<II", 20, 20 * n)  # point_step, row_step
    blob = np.zeros((n, 5), np.float32)
    blob[:, :3] = pts
    blob[:, 4] = times
    raw = blob.astype("<f4").tobytes()
    body = align(body, 4)
    body += struct.pack("<I", len(raw)) + raw
    body += struct.pack("<B", 1)       # is_dense
    return b"\x00\x01\x00\x00" + body


def make_bag(path, imu_msgs, pc_msgs):
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, "
                 "type TEXT, serialization_format TEXT, offered_qos_profiles TEXT)")
    conn.execute("CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER, "
                 "timestamp INTEGER, data BLOB)")
    conn.execute("INSERT INTO topics VALUES (1, '/imu/data', "
                 "'sensor_msgs/msg/Imu', 'cdr', '')")
    conn.execute("INSERT INTO topics VALUES (2, '/velodyne_points', "
                 "'sensor_msgs/msg/PointCloud2', 'cdr', '')")
    for t, blob in imu_msgs:
        conn.execute("INSERT INTO messages(topic_id, timestamp, data) VALUES (1, ?, ?)",
                     (int(t * 1e9), blob))
    for t, blob in pc_msgs:
        conn.execute("INSERT INTO messages(topic_id, timestamp, data) VALUES (2, ?, ?)",
                     (int(t * 1e9), blob))
    conn.commit()
    conn.close()


class TestCdr:
    def test_imu_roundtrip(self):
        gyr = rng.normal(size=3)
        acc = rng.normal(size=3)
        stamp, g, a = rosbag.parse_imu(encode_imu(123.5, gyr, acc))
        assert stamp == pytest.approx(123.5, abs=1e-6)
        np.testing.assert_allclose(g, gyr, atol=1e-12)
        np.testing.assert_allclose(a, acc, atol=1e-12)

    def test_pc2_roundtrip(self):
        pts = rng.uniform(-10, 10, (50, 3)).astype(np.float32)
        times = np.linspace(0, 0.09, 50).astype(np.float32)
        stamp, fields = rosbag.parse_pointcloud2(encode_pc2(7.25, pts, times))
        assert stamp == pytest.approx(7.25, abs=1e-6)
        np.testing.assert_allclose(fields["x"], pts[:, 0], atol=1e-6)
        np.testing.assert_allclose(fields["time"], times, atol=1e-7)


class TestReplay:
    def test_bag_replay_frames(self, tmp_path):
        path = str(tmp_path / "seq.db3")
        imu, pcs = [], []
        for t in np.arange(10.0, 11.5, 0.01):
            imu.append((t, encode_imu(t, np.zeros(3), np.array([0, 0, 1.0]))))
        for t in np.arange(10.0, 11.3, 0.1):
            pts = rng.uniform(2, 10, (200, 3)).astype(np.float32)
            times = np.sort(rng.uniform(0, 0.095, 200)).astype(np.float32)
            pcs.append((t, encode_pc2(t, pts, times)))
        make_bag(path, imu, pcs)

        cfg = SlamConfig()
        cfg.general.lid_topic = "/velodyne_points"
        cfg.general.imu_topic = "/imu/data"
        cfg.general.lidar_type = 1  # velodyne
        cfg.general.blind = 0.0
        cfg.general.point_filter_num = 1
        frames = list(rosbag.replay_rosbag(path, cfg))
        assert len(frames) >= 10
        f = frames[0]
        assert f.scan.pts.shape[0] > 150
        assert f.imu.t.size > 4
        assert (np.diff(f.scan.rel_time) >= 0).all()


class TestBagWriterRoundtrip:
    """platform/rosbag_write (an independent CDR writer implementation) must
    interoperate with platform/rosbag's reader — cross-validation beyond the
    self-built blobs above (PARITY_RUNS protocol path)."""

    def test_velodyne_bag_roundtrip(self, tmp_path):
        from vina_slam_tpu.platform import rosbag_write as rw

        cfg = SlamConfig()
        cfg.general.lidar_type = 1  # velodyne
        cfg.general.lid_topic = "/velodyne_points"
        cfg.general.imu_topic = "/imu/data"
        cfg.general.point_filter_num = 1
        cfg.general.blind = 0.0

        n = 300
        t0 = 100.0
        pts = rng.uniform(1.0, 5.0, (n, 3)).astype(np.float32)
        rel = np.sort(rng.uniform(0.0, 0.09, n)).astype(np.float32)
        scans = [(t0 + 0.1 * k, pts, rel) for k in range(3)]
        imu_t = np.arange(t0 - 0.5, t0 + 0.5, 0.005)
        gyr = [np.array([0.0, 0.0, 0.1])] * len(imu_t)
        acc = [np.array([0.0, 0.0, 1.0])] * len(imu_t)
        path = str(tmp_path / "wr.db3")
        rw.write_sequence_bag(path, cfg, scans, imu_t, gyr, acc)

        frames = list(rosbag.replay_rosbag(path, cfg))
        assert len(frames) >= 2
        f0 = frames[0]
        # decoded scan points survive the CDR roundtrip bit-exactly
        # (postprocess sorts by rel time; ours is presorted)
        np.testing.assert_array_equal(f0.scan.pts, pts)
        np.testing.assert_allclose(f0.scan.rel_time, rel, atol=1e-7)
        assert f0.imu.t.shape[0] >= 5

    def test_ouster_bag_roundtrip(self, tmp_path):
        """Ouster (lidar_type 2): per-point `t` uint32 ns field
        (lidar_pointcloud_decoder.cpp:144-166) through writer -> sqlite bag
        -> CDR parse -> decoder -> FrameAssembler."""
        from vina_slam_tpu.platform import rosbag_write as rw

        cfg = SlamConfig()
        cfg.general.lidar_type = 2  # ouster
        cfg.general.lid_topic = "/os_cloud_node/points"
        cfg.general.imu_topic = "/os_cloud_node/imu"
        cfg.general.point_filter_num = 1
        cfg.general.blind = 0.0

        n = 256
        t0 = 200.0
        pts = rng.uniform(1.0, 6.0, (n, 3)).astype(np.float32)
        rel = np.sort(rng.uniform(0.0, 0.09, n)).astype(np.float32)
        scans = [(t0 + 0.1 * k, pts, rel) for k in range(3)]
        imu_t = np.arange(t0 - 0.5, t0 + 0.5, 0.005)
        gyr = [np.zeros(3)] * len(imu_t)
        acc = [np.array([0.0, 0.0, 1.0])] * len(imu_t)
        path = str(tmp_path / "os.db3")
        rw.write_sequence_bag(path, cfg, scans, imu_t, gyr, acc)

        frames = list(rosbag.replay_rosbag(path, cfg))
        assert len(frames) >= 2
        np.testing.assert_array_equal(frames[0].scan.pts, pts)
        # t quantizes to whole ns on write
        np.testing.assert_allclose(frames[0].scan.rel_time, rel, atol=1e-6)

    def test_tartanair_bag_roundtrip(self, tmp_path):
        """TartanAir (lidar_type 5): xyz-only cloud, no per-point time
        (lidar_pointcloud_decoder.cpp:225-240); the assembler synthesizes
        frame coverage from inter-frame gaps (point_notime mode)."""
        from vina_slam_tpu.platform import rosbag_write as rw

        cfg = SlamConfig()
        cfg.general.lidar_type = 5  # tartanair
        cfg.general.lid_topic = "/tartanair/points"
        cfg.general.imu_topic = "/tartanair/imu"
        cfg.general.point_filter_num = 1
        cfg.general.blind = 0.0
        cfg.odometry.point_notime = 1

        n = 200
        t0 = 300.0
        pts = rng.uniform(1.0, 6.0, (n, 3)).astype(np.float32)
        rel = np.zeros(n, np.float32)
        scans = [(t0 + 0.1 * k, pts, rel) for k in range(4)]
        imu_t = np.arange(t0 - 0.5, t0 + 0.6, 0.005)
        gyr = [np.zeros(3)] * len(imu_t)
        acc = [np.array([0.0, 0.0, 1.0])] * len(imu_t)
        path = str(tmp_path / "ta.db3")
        rw.write_sequence_bag(path, cfg, scans, imu_t, gyr, acc)

        frames = list(rosbag.replay_rosbag(path, cfg))
        assert len(frames) >= 2
        np.testing.assert_array_equal(frames[0].scan.pts, pts)
        # no per-point time: rel_time must come back all-zero
        assert (frames[0].scan.rel_time == 0).all()
        assert frames[0].imu.t.size > 4

    def test_livox_custommsg_roundtrip(self, tmp_path):
        from vina_slam_tpu.platform import rosbag_write as rw

        cfg = SlamConfig()
        cfg.general.lidar_type = 0  # livox
        cfg.general.lid_topic = "/livox/lidar"
        cfg.general.imu_topic = "/livox/imu"
        cfg.general.point_filter_num = 1
        cfg.general.blind = 0.0

        n = 120
        t0 = 50.0
        pts = rng.uniform(1.0, 4.0, (n, 3)).astype(np.float32)
        rel = np.sort(rng.uniform(0.0, 0.09, n)).astype(np.float32)
        scans = [(t0 + 0.1 * k, pts, rel) for k in range(3)]
        imu_t = np.arange(t0 - 0.5, t0 + 0.5, 0.005)
        gyr = [np.zeros(3)] * len(imu_t)
        acc = [np.array([0.0, 0.0, 1.0])] * len(imu_t)
        path = str(tmp_path / "lv.db3")
        rw.write_sequence_bag(path, cfg, scans, imu_t, gyr, acc)

        frames = list(rosbag.replay_rosbag(path, cfg))
        assert len(frames) >= 2
        np.testing.assert_array_equal(frames[0].scan.pts, pts)
        # offset_time quantizes to whole ns
        np.testing.assert_allclose(frames[0].scan.rel_time, rel, atol=1e-6)


def test_livox_cdr_three_way_equivalence():
    """The strided-NumPy CustomMsg parser, the per-point reference parser,
    and the native one-pass CDR decoder (csrc vs_decode_livox_cdr) agree
    bit-exactly on the same payload."""
    from vina_slam_tpu.platform import rosbag_write as rw
    from vina_slam_tpu.sensor import native

    n = 257  # odd size: exercises the missing-final-pad-byte path
    x = rng.uniform(-5, 5, n).astype(np.float32)
    y = rng.uniform(-5, 5, n).astype(np.float32)
    z = rng.uniform(-5, 5, n).astype(np.float32)
    refl = rng.integers(0, 255, n).astype(np.float32)
    offs = np.sort(rng.integers(0, 90_000_000, n)).astype(np.float64)
    msg = rw.encode_livox_custom(42.5, x, y, z, refl, offs)

    s_fast, f_fast = rosbag.parse_livox_custom(msg)
    s_slow, f_slow = rosbag.parse_livox_custom_slow(msg)
    assert s_fast == s_slow
    for k in f_slow:
        np.testing.assert_array_equal(f_fast[k], f_slow[k])

    if native.available():
        scan = native.decode_livox_cdr(msg, filter_num=1, blind=0.0)
        assert scan is not None
        np.testing.assert_array_equal(
            scan.pts, np.stack([x, y, z], axis=1))
        np.testing.assert_array_equal(scan.intensity, refl)
        np.testing.assert_allclose(scan.rel_time, offs * 1e-9, atol=1e-9)
        assert abs(scan.stamp - 42.5) < 1e-9
        # filter/blind semantics match the python decoder chain
        scan2 = native.decode_livox_cdr(msg, filter_num=3, blind=2.0)
        keep = (np.arange(n) % 3 == 0) & (x * x + y * y + z * z > 4.0)
        assert scan2.pts.shape[0] == int(keep.sum())
