"""rosbag2 (sqlite3 .db3) reader with a minimal CDR deserializer.

The reference consumes live topics from `ros2 bag play` (ReadMe.md:16-22);
this module reads rosbag2 sqlite files directly — no ROS installation —
deserializing sensor_msgs/msg/Imu, sensor_msgs/msg/PointCloud2 and
livox_ros_driver2/msg/CustomMsg from their CDR wire format, and feeding the
same decode + sync path as live operation.

CDR notes: 4-byte representation header (we accept CDR_LE), then fields
aligned to their primitive size relative to the payload start; strings are
u32 length-prefixed including the trailing NUL.
"""

from __future__ import annotations

import sqlite3
import struct
from typing import Iterator

import numpy as np

from vina_slam_tpu.core.config import LIVOX, SlamConfig
from vina_slam_tpu.sensor import decoders
from vina_slam_tpu.sensor.sync import Frame, FrameAssembler

_PF_DTYPE = {1: ("b", 1), 2: ("B", 1), 3: ("h", 2), 4: ("H", 2),
             5: ("i", 4), 6: ("I", 4), 7: ("f", 4), 8: ("d", 8)}
_NP_DTYPE = {1: np.int8, 2: np.uint8, 3: np.int16, 4: np.uint16,
             5: np.int32, 6: np.uint32, 7: np.float32, 8: np.float64}


class Cdr:
    """Little-endian CDR stream reader."""

    def __init__(self, data: bytes):
        if len(data) < 4:
            raise ValueError("short CDR payload")
        # representation header: 0x00 0x01 = CDR_LE
        self.buf = memoryview(data)[4:]
        self.pos = 0

    def align(self, n: int):
        r = self.pos % n
        if r:
            self.pos += n - r

    def u8(self):
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def _prim(self, fmt: str, size: int):
        self.align(size)
        v = struct.unpack_from("<" + fmt, self.buf, self.pos)[0]
        self.pos += size
        return v

    def u16(self):
        return self._prim("H", 2)

    def u32(self):
        return self._prim("I", 4)

    def i32(self):
        return self._prim("i", 4)

    def u64(self):
        return self._prim("Q", 8)

    def f32(self):
        return self._prim("f", 4)

    def f64(self):
        return self._prim("d", 8)

    def string(self) -> str:
        n = self.u32()
        s = bytes(self.buf[self.pos:self.pos + n])
        self.pos += n
        return s.rstrip(b"\x00").decode(errors="replace")

    def f64_array(self, n: int) -> np.ndarray:
        self.align(8)
        out = np.frombuffer(self.buf, np.dtype("<f8"), n, self.pos)
        self.pos += 8 * n
        return out

    def bytes_seq(self) -> memoryview:
        n = self.u32()
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def header(self):
        sec = self.i32()
        nsec = self.u32()
        frame_id = self.string()
        return sec + nsec * 1e-9, frame_id


def parse_imu(data: bytes):
    """sensor_msgs/msg/Imu -> (stamp, gyr(3,), acc(3,))."""
    c = Cdr(data)
    stamp, _ = c.header()
    c.f64_array(4)   # orientation quaternion
    c.f64_array(9)   # orientation covariance
    gyr = np.array(c.f64_array(3))
    c.f64_array(9)
    acc = np.array(c.f64_array(3))
    c.f64_array(9)
    return stamp, gyr, acc


def parse_pointcloud2(data: bytes):
    """sensor_msgs/msg/PointCloud2 -> (stamp, fields dict of np arrays)."""
    c = Cdr(data)
    stamp, _ = c.header()
    height = c.u32()
    width = c.u32()
    nf = c.u32()
    fields = []
    for _ in range(nf):
        name = c.string()
        offset = c.u32()
        datatype = c.u8()
        count = c.u32()
        fields.append((name, offset, datatype, count))
    is_bigendian = c.u8()
    point_step = c.u32()
    row_step = c.u32()
    blob = c.bytes_seq()
    # is_dense follows; not needed

    n = height * width
    raw = np.frombuffer(blob, np.uint8, n * point_step).reshape(n, point_step)
    out = {}
    for name, offset, datatype, count in fields:
        npdt = _NP_DTYPE.get(datatype)
        if npdt is None:
            continue
        size = np.dtype(npdt).itemsize
        col = raw[:, offset:offset + size * count]
        arr = col.reshape(-1).view(npdt if not is_bigendian else np.dtype(npdt).newbyteorder(">"))
        out[name] = arr.reshape(n, count)[:, 0].astype(np.float64)
    return stamp, out


def parse_livox_custom(data: bytes):
    """livox_ros_driver2/msg/CustomMsg -> (stamp, fields dict).

    Vectorized: CustomPoint is a fixed 19-byte record (u32 offset_time,
    3x f32, u8 reflectivity/tag/line) padded to a 20-byte stride by the
    next point's u32 alignment, so the whole sequence decodes as strided
    NumPy views (the per-point Python loop cost ~10^5 interpreter
    iterations per scan — PARITY.md round-2 known gap)."""
    c = Cdr(data)
    stamp, _ = c.header()
    c.u64()          # timebase
    point_num = c.u32()
    c.u8()           # lidar_id
    c.u8(); c.u8(); c.u8()  # rsvd[3]
    n = c.u32()      # points sequence length
    n = min(n, point_num) or n
    c.align(4)       # first point's u32
    start = c.pos
    avail = len(c.buf) - start
    need = 20 * n
    raw = np.frombuffer(c.buf, np.uint8, count=min(need, avail), offset=start)
    if raw.size < need:  # the final record may omit its trailing pad byte
        raw = np.concatenate([raw, np.zeros(need - raw.size, np.uint8)])
    rec = raw.reshape(n, 20)
    offs = rec[:, 0:4].copy().view("<u4")[:, 0].astype(np.float64)
    xs = rec[:, 4:8].copy().view("<f4")[:, 0]
    ys = rec[:, 8:12].copy().view("<f4")[:, 0]
    zs = rec[:, 12:16].copy().view("<f4")[:, 0]
    refl = rec[:, 16].astype(np.float32)
    return stamp, {"x": xs, "y": ys, "z": zs, "reflectivity": refl,
                   "offset_time": offs}


def parse_livox_custom_slow(data: bytes):
    """Per-point reference parser (kept as the equivalence oracle for
    parse_livox_custom's strided decode)."""
    c = Cdr(data)
    stamp, _ = c.header()
    c.u64()
    point_num = c.u32()
    c.u8()
    c.u8(); c.u8(); c.u8()
    n = c.u32()
    n = min(n, point_num) or n
    offs = np.empty(n, np.float64)
    xs = np.empty(n, np.float32)
    ys = np.empty(n, np.float32)
    zs = np.empty(n, np.float32)
    refl = np.empty(n, np.float32)
    for i in range(n):
        offs[i] = c.u32()
        xs[i] = c.f32()
        ys[i] = c.f32()
        zs[i] = c.f32()
        refl[i] = c.u8()
        c.u8()
        c.u8()
    return stamp, {"x": xs, "y": ys, "z": zs, "reflectivity": refl,
                   "offset_time": offs}


def replay_rosbag(db_path: str, cfg: SlamConfig) -> Iterator[Frame]:
    """Stream synchronized frames from a rosbag2 sqlite file using the
    config's topics and lidar type."""
    g = cfg.general
    conn = sqlite3.connect(db_path)
    topics = {name: (tid, typ) for tid, name, typ in
              conn.execute("SELECT id, name, type FROM topics")}
    if g.imu_topic not in topics or g.lid_topic not in topics:
        raise ValueError(
            f"bag topics {list(topics)} missing {g.imu_topic} / {g.lid_topic}")
    imu_id = topics[g.imu_topic][0]
    lid_id, lid_type = topics[g.lid_topic]

    asm = FrameAssembler(point_notime=bool(cfg.odometry.point_notime))
    cur = conn.execute(
        "SELECT topic_id, timestamp, data FROM messages "
        "WHERE topic_id IN (?, ?) ORDER BY timestamp", (imu_id, lid_id))
    for topic_id, _, data in cur:
        if topic_id == imu_id:
            stamp, gyr, acc = parse_imu(data)
            asm.push_imu(stamp, gyr, acc)
        else:
            scan = None
            if g.lidar_type == LIVOX and "CustomMsg" in lid_type:
                # native one-pass CDR fast path (csrc vs_decode_livox_cdr)
                from vina_slam_tpu.sensor import native
                scan = native.decode_livox_cdr(data, g.point_filter_num,
                                               g.blind)
                if scan is None:
                    stamp, fields = parse_livox_custom(data)
            else:
                stamp, fields = parse_pointcloud2(data)
            if scan is None:
                scan = decoders.decode(g.lidar_type, fields, stamp,
                                       g.point_filter_num, g.blind)
            asm.push_scan(decoders.scan_postprocess(scan))
        f = asm.try_assemble()
        if f is not None:
            yield f
    conn.close()
