"""ctypes bindings to the native host decode library (csrc/libvina_host.so).

Falls back silently to the NumPy decoders when the library is not built;
`available()` reports status. Build with `make -C csrc`.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(here, "csrc", "libvina_host.so")
    if not os.path.exists(path):
        # self-build once, best-effort: the Python fallbacks are exact but
        # the Velodyne unwrap is a sequential per-point state machine
        # (~10^5 Python iterations/scan) — production must run native
        import subprocess

        try:
            subprocess.run(["make", "-C", os.path.join(here, "csrc"),
                            "libvina_host.so"],
                           capture_output=True, timeout=300, check=False)
        except Exception:
            pass
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    i64, f32p, f64p, u8p = (
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint8),
    )
    lib.vs_decode_livox.restype = i64
    lib.vs_decode_livox.argtypes = [i64, f32p, f32p, f32p, f32p, f64p,
                                    ctypes.c_int, ctypes.c_float, f32p, f32p, f32p]
    lib.vs_decode_velodyne.restype = i64
    lib.vs_decode_velodyne.argtypes = [i64, f32p, f32p, f32p, f32p, f32p,
                                       ctypes.c_int, ctypes.c_float,
                                       ctypes.c_double, f32p, f32p, f32p]
    lib.vs_decode_stamped.restype = i64
    lib.vs_decode_stamped.argtypes = [i64, f32p, f32p, f32p, f32p, f64p,
                                      ctypes.c_int, ctypes.c_double,
                                      ctypes.c_double, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_float,
                                      f32p, f32p, f32p]
    lib.vs_postprocess.restype = i64
    lib.vs_postprocess.argtypes = [i64, f32p, f32p, f32p]
    lib.vs_pc2_extract.restype = None
    lib.vs_pc2_extract.argtypes = [u8p, i64, i64, i64, ctypes.c_int, f64p]
    if hasattr(lib, "vs_decode_livox_cdr"):
        lib.vs_decode_livox_cdr.restype = i64
        lib.vs_decode_livox_cdr.argtypes = [u8p, i64, ctypes.c_int,
                                            ctypes.c_float, f32p, f32p, f32p,
                                            f64p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def decode_velodyne(x, y, z, inten, time, filter_num, blind_sq, omega=3610.0):
    lib = _load()
    n = len(x)
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    z = np.ascontiguousarray(z, np.float32)
    inten = np.ascontiguousarray(inten, np.float32)
    time = np.ascontiguousarray(time, np.float32)
    oxyz = np.empty((n, 3), np.float32)
    oi = np.empty(n, np.float32)
    ot = np.empty(n, np.float32)
    m = lib.vs_decode_velodyne(n, _fp(x), _fp(y), _fp(z), _fp(inten), _fp(time),
                               int(filter_num), float(blind_sq), float(omega),
                               _fp(oxyz), _fp(oi), _fp(ot))
    return oxyz[:m], oi[:m], ot[:m]


def postprocess(xyz, inten, t):
    lib = _load()
    xyz = np.ascontiguousarray(xyz, np.float32)
    inten = np.ascontiguousarray(inten, np.float32)
    t = np.ascontiguousarray(t, np.float32)
    m = lib.vs_postprocess(len(t), _fp(xyz), _fp(inten), _fp(t))
    return xyz[:m], inten[:m], t[:m]


def pc2_extract(data: bytes, n: int, point_step: int, offset: int, dtype: int):
    """Extract one field column from a packed PointCloud2 blob."""
    lib = _load()
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(n, np.float64)
    lib.vs_pc2_extract(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       n, point_step, offset, dtype, _dp(out))
    return out


def decode_stamped(x, y, z, inten, ts, mode, scale, base, blind_dims,
                   filter_num, blind_sq):
    lib = _load()
    n = len(x)
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    z = np.ascontiguousarray(z, np.float32)
    inten = np.ascontiguousarray(inten, np.float32)
    ts = np.ascontiguousarray(ts, np.float64)
    oxyz = np.empty((n, 3), np.float32)
    oi = np.empty(n, np.float32)
    ot = np.empty(n, np.float32)
    m = lib.vs_decode_stamped(n, _fp(x), _fp(y), _fp(z), _fp(inten), _dp(ts),
                              int(mode), float(scale), float(base),
                              int(blind_dims), int(filter_num),
                              float(blind_sq), _fp(oxyz), _fp(oi), _fp(ot))
    return oxyz[:m], oi[:m], ot[:m]


def decode_livox_cdr(msg: bytes, filter_num: int, blind: float):
    """One-pass CustomMsg CDR body -> DecodedScan (parse + filter + blind +
    ns->s in a single native sweep; fuses rosbag.parse_livox_custom with
    decoders.decode_livox). Returns None when the library is not built or
    lacks the symbol."""
    from vina_slam_tpu.sensor.decoders import DecodedScan

    lib = _load()
    if lib is None or not hasattr(lib, "vs_decode_livox_cdr"):
        return None
    buf = np.frombuffer(msg, np.uint8)
    cap = max(len(msg) // 20 + 1, 1)
    oxyz = np.empty((cap, 3), np.float32)
    oi = np.empty(cap, np.float32)
    ot = np.empty(cap, np.float32)
    stamp = np.zeros(1, np.float64)
    m = lib.vs_decode_livox_cdr(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(msg),
        int(filter_num), float(blind * blind), _fp(oxyz), _fp(oi), _fp(ot),
        _dp(stamp))
    if m < 0:
        return None
    return DecodedScan(oxyz[:m], oi[:m], ot[:m], float(stamp[0]))


def decode(lidar_type: int, fields: dict, stamp: float, filter_num: int,
           blind: float):
    """Vendor dispatcher mirroring decoders.decode on the native fast path.
    Returns a DecodedScan, or None when this type has no native path (or
    the library is not built)."""
    from vina_slam_tpu.core.config import (HESAI, OUSTER, ROBOSENSE,
                                           VELODYNE)
    from vina_slam_tpu.sensor.decoders import DecodedScan

    if not available():
        return None
    blind_sq = blind * blind
    x = np.asarray(fields["x"], np.float32)
    y = np.asarray(fields["y"], np.float32)
    z = np.asarray(fields["z"], np.float32)
    inten = np.asarray(fields.get("intensity", np.zeros_like(x)), np.float32)
    if lidar_type == VELODYNE:
        t = np.asarray(fields.get("time", np.zeros_like(x)), np.float32)
        pts, oi, ot = decode_velodyne(x, y, z, inten, t, filter_num, blind_sq)
        return DecodedScan(pts, oi, ot, stamp)
    if lidar_type == OUSTER:
        ts = np.asarray(fields["t"], np.float64)
        pts, oi, ot = decode_stamped(x, y, z, inten, ts, 0, 1e-9, 0.0, 3,
                                     filter_num, blind_sq)
        return DecodedScan(pts, oi, ot, stamp)
    if lidar_type == HESAI:
        ts = np.asarray(fields["timestamp"], np.float64)
        pts, oi, ot = decode_stamped(x, y, z, inten, ts, 1, 1.0, 0.0, 3,
                                     filter_num, blind_sq)
        return DecodedScan(pts, oi, ot, stamp)
    if lidar_type == ROBOSENSE:
        ts = np.asarray(fields["timestamp"], np.float64)
        pts, oi, ot = decode_stamped(x, y, z, inten, ts, 2, 1.0, stamp, 2,
                                     filter_num, blind_sq)
        return DecodedScan(pts, oi, ot, stamp)
    return None
