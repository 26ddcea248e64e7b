"""rosbag2 (sqlite3 storage) WRITER + CDR encoders.

Counterpart of platform/rosbag.py's reader: produces genuine rosbag2 v5
sqlite bags with little-endian CDR payloads for sensor_msgs/msg/Imu,
sensor_msgs/msg/PointCloud2 (arbitrary vendor field layouts) and
livox_ros_driver2/msg/CustomMsg. Used by the PARITY_RUNS protocol
(scripts/parity_runs.py) to replay every shipped config profile through the
real bag path, and by tests to exercise the reader against independently
constructed messages.

Message layouts follow the ROS 2 common_interfaces definitions the
reference subscribes to (src/platform/ros2/node.cpp:145-167); the CDR
encoding is XCDR1 little-endian with the standard 4-byte encapsulation
header 00 01 00 00.
"""

from __future__ import annotations

import sqlite3
import struct

import numpy as np

IMU_TYPE = "sensor_msgs/msg/Imu"
PC2_TYPE = "sensor_msgs/msg/PointCloud2"
LIVOX_TYPE = "livox_ros_driver2/msg/CustomMsg"

# sensor_msgs/msg/PointField datatype codes
PF_INT8, PF_UINT8, PF_INT16, PF_UINT16 = 1, 2, 3, 4
PF_INT32, PF_UINT32, PF_FLOAT32, PF_FLOAT64 = 5, 6, 7, 8
_PF_NP = {PF_INT8: np.int8, PF_UINT8: np.uint8, PF_INT16: np.int16,
          PF_UINT16: np.uint16, PF_INT32: np.int32, PF_UINT32: np.uint32,
          PF_FLOAT32: np.float32, PF_FLOAT64: np.float64}


class CdrWriter:
    """Little-endian XCDR1 serializer with ROS 2 alignment rules (every
    primitive aligns to its own size relative to the payload start)."""

    def __init__(self):
        self.buf = bytearray(b"\x00\x01\x00\x00")  # encapsulation header

    def _align(self, n: int):
        # alignment is relative to the start of the payload (after the
        # 4-byte encapsulation header)
        r = (len(self.buf) - 4) % n
        if r:
            self.buf += b"\x00" * (n - r)

    def prim(self, fmt: str, *vals):
        self._align(struct.calcsize(fmt))
        self.buf += struct.pack("<" + fmt * len(vals), *vals)

    def u8(self, v): self.prim("B", int(v))
    def u16(self, v): self.prim("H", int(v))
    def u32(self, v): self.prim("I", int(v))
    def i32(self, v): self.prim("i", int(v))
    def u64(self, v): self.prim("Q", int(v))
    def f32(self, v): self.prim("f", float(v))
    def f64(self, v): self.prim("d", float(v))

    def string(self, s: str):
        b = s.encode() + b"\x00"
        self.u32(len(b))
        self.buf += b

    def f64_array(self, vals):
        self._align(8)
        self.buf += np.asarray(vals, "<f8").tobytes()

    def bytes_seq(self, b: bytes):
        self.u32(len(b))
        self.buf += b

    def header(self, stamp: float, frame: str):
        sec = int(stamp)
        self.i32(sec)
        self.u32(int(round((stamp - sec) * 1e9)))
        self.string(frame)

    def data(self) -> bytes:
        return bytes(self.buf)


def encode_imu(stamp: float, gyr, acc, frame: str = "imu") -> bytes:
    w = CdrWriter()
    w.header(stamp, frame)
    w.f64_array([0.0, 0.0, 0.0, 1.0])   # orientation
    w.f64_array([0.0] * 9)              # orientation_covariance
    w.f64_array(np.asarray(gyr, float))  # angular_velocity
    w.f64_array([0.0] * 9)
    w.f64_array(np.asarray(acc, float))  # linear_acceleration
    w.f64_array([0.0] * 9)
    return w.data()


def encode_pointcloud2(stamp: float, fields: list, n: int,
                       frame: str = "lidar") -> bytes:
    """fields: list of (name, datatype_code, np_array). Packs an interleaved
    point_step record per point with natural alignment inside the record."""
    # compute offsets with per-field natural alignment
    offsets, off = [], 0
    for name, code, arr in fields:
        size = np.dtype(_PF_NP[code]).itemsize
        off = (off + size - 1) // size * size
        offsets.append(off)
        off += size
    point_step = (off + 3) // 4 * 4

    raw = np.zeros((n, point_step), np.uint8)
    for (name, code, arr), o in zip(fields, offsets):
        dt = np.dtype(_PF_NP[code]).newbyteorder("<")
        col = np.asarray(arr).astype(dt)
        raw[:, o:o + dt.itemsize] = col.view(np.uint8).reshape(n, dt.itemsize)

    w = CdrWriter()
    w.header(stamp, frame)
    w.u32(1)          # height
    w.u32(n)          # width
    w.u32(len(fields))
    for (name, code, arr), o in zip(fields, offsets):
        w.string(name)
        w.u32(o)
        w.u8(code)
        w.u32(1)      # count
    w.u8(0)           # is_bigendian
    w.u32(point_step)
    w.u32(point_step * n)   # row_step
    w.bytes_seq(raw.tobytes())
    w.u8(1)           # is_dense
    return w.data()


def encode_livox_custom(stamp: float, x, y, z, reflectivity, offset_ns,
                        frame: str = "livox") -> bytes:
    n = len(x)
    w = CdrWriter()
    w.header(stamp, frame)
    w.u64(int(stamp * 1e9))  # timebase
    w.u32(n)                 # point_num
    w.u8(0)                  # lidar_id
    w.u8(0); w.u8(0); w.u8(0)  # rsvd
    w.u32(n)                 # points sequence length
    for i in range(n):
        w.u32(int(offset_ns[i]))
        w.f32(x[i]); w.f32(y[i]); w.f32(z[i])
        w.u8(int(reflectivity[i]) & 0xFF)
        w.u8(0)              # tag
        w.u8(0)              # line
    return w.data()


class BagWriter:
    """Minimal rosbag2 sqlite3 storage writer (schema_version 3 layout:
    topics + messages tables, as read by platform/rosbag.replay_rosbag and
    by the standard rosbag2 sqlite3 storage plugin)."""

    def __init__(self, path: str):
        self.conn = sqlite3.connect(path)
        c = self.conn
        c.execute("CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, "
                  "type TEXT, serialization_format TEXT, "
                  "offered_qos_profiles TEXT)")
        c.execute("CREATE TABLE messages(id INTEGER PRIMARY KEY, "
                  "topic_id INTEGER, timestamp INTEGER, data BLOB)")
        self._topics = {}
        self._mid = 0

    def add_topic(self, name: str, msg_type: str) -> int:
        tid = len(self._topics) + 1
        self.conn.execute("INSERT INTO topics VALUES (?,?,?,?,?)",
                          (tid, name, msg_type, "cdr", ""))
        self._topics[name] = tid
        return tid

    def write(self, topic: str, stamp: float, data: bytes):
        self._mid += 1
        self.conn.execute("INSERT INTO messages VALUES (?,?,?,?)",
                          (self._mid, self._topics[topic], int(stamp * 1e9),
                           data))

    def close(self):
        self.conn.commit()
        self.conn.close()


# ---------------------------------------------------------------- vendors

def scan_to_message(lidar_type: int, pts: np.ndarray, rel_time: np.ndarray,
                    stamp: float, intensity: np.ndarray | None = None):
    """Package a (lidar-frame) scan into the vendor's native message bytes.
    Returns (msg_type, data). Field layouts mirror what each decoder
    consumes (sensor/decoders.py / lidar_pointcloud_decoder.cpp:47-105)."""
    from vina_slam_tpu.core.config import (HESAI, LIVOX, OUSTER, ROBOSENSE,
                                           TARTANAIR, VELODYNE)

    n = pts.shape[0]
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    inten = intensity if intensity is not None else np.zeros(n, np.float32)

    if lidar_type == LIVOX:
        return LIVOX_TYPE, encode_livox_custom(
            stamp, x, y, z, inten, np.round(rel_time * 1e9))
    if lidar_type == VELODYNE:
        fields = [("x", PF_FLOAT32, x), ("y", PF_FLOAT32, y),
                  ("z", PF_FLOAT32, z), ("intensity", PF_FLOAT32, inten),
                  ("time", PF_FLOAT32, rel_time)]
    elif lidar_type == OUSTER:
        fields = [("x", PF_FLOAT32, x), ("y", PF_FLOAT32, y),
                  ("z", PF_FLOAT32, z), ("intensity", PF_FLOAT32, inten),
                  ("t", PF_UINT32, np.round(rel_time * 1e9))]
    elif lidar_type == HESAI:
        fields = [("x", PF_FLOAT32, x), ("y", PF_FLOAT32, y),
                  ("z", PF_FLOAT32, z), ("intensity", PF_FLOAT32, inten),
                  ("timestamp", PF_FLOAT64, stamp + rel_time.astype(np.float64))]
    elif lidar_type == ROBOSENSE:
        fields = [("x", PF_FLOAT32, x), ("y", PF_FLOAT32, y),
                  ("z", PF_FLOAT32, z), ("intensity", PF_FLOAT32, inten),
                  ("timestamp", PF_FLOAT64, stamp + rel_time.astype(np.float64))]
    elif lidar_type == TARTANAIR:
        fields = [("x", PF_FLOAT32, x), ("y", PF_FLOAT32, y),
                  ("z", PF_FLOAT32, z)]
    else:
        raise ValueError(f"unknown lidar type {lidar_type}")
    return PC2_TYPE, encode_pointcloud2(stamp, fields, n)


def write_sequence_bag(path: str, cfg, scans: list, imu_t, imu_gyr, imu_acc):
    """Write a full sequence bag using the config's topics and lidar type.

    scans: list of (stamp, pts (N,3) lidar frame, rel_time (N,)).
    """
    g = cfg.general
    bag = BagWriter(path)
    bag.add_topic(g.imu_topic, IMU_TYPE)
    lid_type_str = LIVOX_TYPE if g.lidar_type == 0 else PC2_TYPE
    bag.add_topic(g.lid_topic, lid_type_str)
    for t, gy, ac in zip(imu_t, imu_gyr, imu_acc):
        bag.write(g.imu_topic, t, encode_imu(t, gy, ac))
    for stamp, pts, rel in scans:
        _, data = scan_to_message(g.lidar_type, pts, rel, stamp)
        bag.write(g.lid_topic, stamp, data)
    bag.close()
