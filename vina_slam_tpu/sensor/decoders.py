"""Vendor point-cloud decoders (host side, NumPy).

Re-implements the semantics of the reference decoder
(src/sensor/lidar_pointcloud_decoder.cpp:56-240) for the six supported
sensors — Livox / Velodyne / Ouster / Hesai / Robosense / TartanAir —
including the Velodyne azimuth-unwrap timestamp reconstruction, the
point_filter_num stride and the blind-radius cull, plus the scan-callback
post-processing (src/sensor/lidar_decoder.cpp:7-43): dummy-pad empty scans,
sort by per-point relative time, and drop points later than 0.11 s.

Input is a dict of NumPy field arrays (what a rosbag2/npz reader yields);
output is a DecodedScan of unified arrays. A C++ fast path with identical
semantics lives in csrc/ and is used when the native library is built.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from vina_slam_tpu.core.config import (
    HESAI,
    LIVOX,
    OUSTER,
    ROBOSENSE,
    TARTANAIR,
    VELODYNE,
)


@dataclass
class DecodedScan:
    pts: np.ndarray        # (N, 3) float32, sensor frame
    intensity: np.ndarray  # (N,)  float32
    rel_time: np.ndarray   # (N,)  float32, seconds from scan start ("curvature")
    stamp: float           # header stamp (s)


def _stride_blind(i, r2, filter_num, blind_sq):
    return ((i % max(filter_num, 1)) == 0) & (r2 > blind_sq)


def decode_livox(fields: dict, stamp: float, filter_num: int, blind_sq: float) -> DecodedScan:
    """Livox CustomMsg: offset_time in ns (decoder cpp:56-75)."""
    x, y, z = (np.asarray(fields[k], np.float32) for k in ("x", "y", "z"))
    inten = np.asarray(fields.get("reflectivity", fields.get("intensity", np.zeros_like(x))), np.float32)
    t = np.asarray(fields["offset_time"], np.float64) * 1e-9
    i = np.arange(x.size)
    keep = _stride_blind(i, x * x + y * y + z * z, filter_num, blind_sq)
    return DecodedScan(
        np.stack([x, y, z], -1)[keep], inten[keep], t[keep].astype(np.float32), stamp
    )


def decode_velodyne(
    fields: dict, stamp: float, filter_num: int, blind_sq: float, omega_deg_s: float = 3610.0
) -> DecodedScan:
    """Velodyne: trust per-point `time` if the scan span looks sane,
    else reconstruct timestamps by azimuth unwrap (decoder cpp:77-142)."""
    x, y, z = (np.asarray(fields[k], np.float32) for k in ("x", "y", "z"))
    inten = np.asarray(fields.get("intensity", np.zeros_like(x)), np.float32)
    t = np.asarray(fields.get("time", np.zeros_like(x)), np.float64)
    n = x.size
    if n == 0:
        return DecodedScan(np.zeros((0, 3), np.float32), inten, t.astype(np.float32), stamp)

    if 0.01 < t[-1] < 0.12:
        i = np.arange(n)
        keep = _stride_blind(i, x * x + y * y + z * z, filter_num, blind_sq)
        return DecodedScan(np.stack([x, y, z], -1)[keep], inten[keep], t[keep].astype(np.float32), stamp)

    # azimuth-unwrap reconstruction: the EXACT bias/cool-down state machine
    # of the reference (lidar_pointcloud_decoder.cpp:103-141), bit-matching
    # the native fast path (csrc/decode.cpp:79-108). Sequential by nature
    # (bias/cool/yaw_last thread through every point) — the native .so is
    # the production path; this fallback trades speed for exact parity.
    keep_idx, rels = _velodyne_unwrap_exact(
        x, y, z, filter_num, blind_sq, omega_deg_s)
    return DecodedScan(np.stack([x, y, z], -1)[keep_idx], inten[keep_idx],
                       rels, stamp)


def _velodyne_unwrap_exact(x, y, z, filter_num, blind_sq, omega_deg_s):
    """Timestamp reconstruction state machine (decode.cpp:79-108 /
    lidar_pointcloud_decoder.cpp:103-141): yaw in degrees relative to a
    running 360-degree bias; a forward jump > 180 deg increments the bias
    once per 1000-point cool-down window; residual jumps fold by +360."""
    n = x.size
    raw = np.degrees(np.arctan2(y.astype(np.float64), x.astype(np.float64)))
    r2 = x * x + y * y + z * z
    step = max(int(filter_num), 1)
    keep_idx, rels = [], []
    first = True
    yaw0 = yaw_last = bias = 0.0
    cool = 0
    for i in range(n):
        if abs(x[i]) < 0.1:
            continue
        yaw = raw[i] - bias
        if first:
            yaw0 = yaw_last = yaw
            first = False
        if r2[i] < blind_sq:
            continue
        if yaw - yaw_last > 180.0:
            was = cool          # post-decrement: test old value
            cool -= 1
            if was <= 0:
                bias += 360.0
                yaw -= 360.0
                cool = 1000
        if abs(yaw - yaw_last) > 180.0:
            yaw += 360.0
        rel = (yaw0 - yaw) / omega_deg_s
        yaw_last = yaw
        if 0.0 <= rel < 0.1 and i % step == 0:
            keep_idx.append(i)
            rels.append(rel)
    return (np.asarray(keep_idx, np.int64),
            np.asarray(rels, np.float64).astype(np.float32))


def decode_ouster(fields: dict, stamp: float, filter_num: int, blind_sq: float) -> DecodedScan:
    """Ouster: per-point `t` in ns (decoder cpp:144-166)."""
    x, y, z = (np.asarray(fields[k], np.float32) for k in ("x", "y", "z"))
    inten = np.asarray(fields.get("intensity", np.zeros_like(x)), np.float32)
    t = np.asarray(fields["t"], np.float64) / 1e9
    i = np.arange(x.size)
    keep = _stride_blind(i, x * x + y * y + z * z, filter_num, blind_sq)
    return DecodedScan(np.stack([x, y, z], -1)[keep], inten[keep], t[keep].astype(np.float32), stamp)


def decode_hesai(fields: dict, stamp: float, filter_num: int, blind_sq: float) -> DecodedScan:
    """Hesai XT32: absolute per-point `timestamp`, rebased to the first
    point (decoder cpp:168-195)."""
    x, y, z = (np.asarray(fields[k], np.float32) for k in ("x", "y", "z"))
    inten = np.asarray(fields.get("intensity", np.zeros_like(x)), np.float32)
    ts = np.asarray(fields["timestamp"], np.float64)
    t = ts - (ts[0] if ts.size else 0.0)
    i = np.arange(x.size)
    keep = _stride_blind(i, x * x + y * y + z * z, filter_num, blind_sq)
    return DecodedScan(np.stack([x, y, z], -1)[keep], inten[keep], t[keep].astype(np.float32), stamp)


def decode_robosense(fields: dict, stamp: float, filter_num: int, blind_sq: float) -> DecodedScan:
    """Robosense: absolute per-point `timestamp` rebased to the header stamp;
    NB the blind cull is 2-D (x^2 + y^2) in the reference (cpp:197-223)."""
    x, y, z = (np.asarray(fields[k], np.float32) for k in ("x", "y", "z"))
    inten = np.asarray(fields.get("intensity", np.zeros_like(x)), np.float32)
    t = np.asarray(fields["timestamp"], np.float64) - stamp
    i = np.arange(x.size)
    keep = _stride_blind(i, x * x + y * y, filter_num, blind_sq)
    good = np.isfinite(x) & np.isfinite(y) & np.isfinite(z)
    keep &= good
    return DecodedScan(np.stack([x, y, z], -1)[keep], inten[keep], t[keep].astype(np.float32), stamp)


def decode_tartanair(fields: dict, stamp: float, filter_num: int, blind_sq: float) -> DecodedScan:
    """TartanAir sim: xyz only, no per-point time (decoder cpp:225-240)."""
    x, y, z = (np.asarray(fields[k], np.float32) for k in ("x", "y", "z"))
    return DecodedScan(
        np.stack([x, y, z], -1),
        np.zeros_like(x),
        np.zeros_like(x),
        stamp,
    )


_DECODERS = {
    LIVOX: decode_livox,
    VELODYNE: decode_velodyne,
    OUSTER: decode_ouster,
    HESAI: decode_hesai,
    ROBOSENSE: decode_robosense,
    TARTANAIR: decode_tartanair,
}


def decode(lidar_type: int, fields: dict, stamp: float, filter_num: int, blind: float) -> DecodedScan:
    """Dispatch on lidar type; `blind` is the radius in meters (squared
    internally, matching node.cpp:210)."""
    fn = _DECODERS.get(lidar_type)
    if fn is None:
        raise ValueError(f"Unsupported lidar type: {lidar_type}")
    return fn(fields, stamp, filter_num, blind * blind)


def scan_postprocess(scan: DecodedScan) -> DecodedScan:
    """pcl_handler post-decode steps (src/sensor/lidar_decoder.cpp:7-43):
    pad empty scans with 2 dummy points, sort by relative time, drop points
    with rel_time > 0.11 s."""
    if scan.pts.shape[0] == 0:
        pts = np.zeros((2, 3), np.float32)
        return DecodedScan(pts, np.zeros(2, np.float32), np.zeros(2, np.float32), scan.stamp)
    order = np.argsort(scan.rel_time, kind="stable")
    pts, inten, rel = scan.pts[order], scan.intensity[order], scan.rel_time[order]
    keep = rel <= 0.11
    return DecodedScan(pts[keep], inten[keep], rel[keep], scan.stamp)
