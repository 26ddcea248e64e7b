"""Dataset replay: feeds recorded sequences through the frame assembler.

The reference consumes live ROS 2 topics from rosbag replay (ReadMe.md:16-22).
Here sequences are replayed headlessly from:

  * .npz sequence files — one file holding the whole sequence:
      imu_t (M,), imu_gyr (M,3), imu_acc (M,3),
      scan_stamps (K,), scan_offsets (K+1,),
      pts (sum_N, 3..4+) packed points, plus per-format extra field arrays
      (e.g. time/offset_time/timestamp/t) packed the same way.
  * a directory of per-scan .npz files + imu.npz (same field names).

Vendor decode semantics are applied via sensor/decoders.py keyed by
cfg.general.lidar_type, so a converted bag replays bit-identically to the
live decoders.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

from vina_slam_tpu.core.config import SlamConfig
from vina_slam_tpu.sensor import decoders
from vina_slam_tpu.sensor.sync import Frame, FrameAssembler


def _scan_fields(d: dict, lo: int, hi: int) -> dict:
    """Slice packed per-point field arrays for one scan."""
    out = {}
    pts = d["pts"][lo:hi]
    out["x"], out["y"], out["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
    if pts.shape[1] > 3:
        out["intensity"] = pts[:, 3]
    for k in ("time", "offset_time", "timestamp", "t", "reflectivity", "intensity"):
        if k in d:
            out[k] = d[k][lo:hi]
    return out


def replay_npz(path: str, cfg: SlamConfig) -> Iterator[Frame]:
    """Yield synchronized frames from a sequence .npz (or directory)."""
    g = cfg.general
    asm = FrameAssembler(point_notime=bool(cfg.odometry.point_notime))

    if os.path.isdir(path):
        imu = np.load(os.path.join(path, "imu.npz"))
        scan_files = sorted(
            f for f in os.listdir(path) if f.startswith("scan") and f.endswith(".npz"))
        scans = []
        for fname in scan_files:
            d = dict(np.load(os.path.join(path, fname)))
            scans.append((float(d["stamp"]), d))
    else:
        d = dict(np.load(path))
        imu = d
        offs = d["scan_offsets"]
        scans = [
            (float(d["scan_stamps"][k]),
             {"pts": d["pts"][offs[k]:offs[k + 1]],
              **{key: d[key][offs[k]:offs[k + 1]]
                 for key in ("time", "offset_time", "timestamp", "t")
                 if key in d}})
            for k in range(len(d["scan_stamps"]))
        ]

    events = [(float(t), ("imu", i)) for i, t in enumerate(imu["imu_t"])]
    events += [(stamp, ("scan", k)) for k, (stamp, _) in enumerate(scans)]
    events.sort(key=lambda e: e[0])

    for t, (kind, i) in events:
        if kind == "imu":
            asm.push_imu(t, imu["imu_gyr"][i], imu["imu_acc"][i])
        else:
            stamp, d = scans[i]
            fields = {}
            pts = np.asarray(d["pts"])
            fields["x"], fields["y"], fields["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
            if pts.shape[1] > 3:
                fields["intensity"] = pts[:, 3]
                fields["reflectivity"] = pts[:, 3]
            for key in ("time", "offset_time", "timestamp", "t"):
                if key in d:
                    fields[key] = np.asarray(d[key])
            scan = decoders.decode(g.lidar_type, fields, stamp,
                                   g.point_filter_num, g.blind)
            asm.push_scan(decoders.scan_postprocess(scan))
        f = asm.try_assemble()
        if f is not None:
            yield f


def save_npz_sequence(path: str, scans: list, imu_t, imu_gyr, imu_acc,
                      extra_key: str | None = None):
    """Pack a sequence into the single-file .npz format. `scans` is a list of
    (stamp, pts[, extra]) tuples."""
    offs = np.zeros(len(scans) + 1, np.int64)
    pts_all, extra_all, stamps = [], [], []
    for k, item in enumerate(scans):
        stamp, pts = item[0], item[1]
        pts_all.append(np.asarray(pts, np.float32))
        if extra_key and len(item) > 2:
            extra_all.append(np.asarray(item[2]))
        stamps.append(stamp)
        offs[k + 1] = offs[k] + len(pts)
    out = dict(
        pts=np.concatenate(pts_all), scan_stamps=np.asarray(stamps),
        scan_offsets=offs, imu_t=np.asarray(imu_t),
        imu_gyr=np.asarray(imu_gyr), imu_acc=np.asarray(imu_acc))
    if extra_key and extra_all:
        out[extra_key] = np.concatenate(extra_all)
    np.savez_compressed(path, **out)
