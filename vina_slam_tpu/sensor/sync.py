"""Scan/IMU frame assembler — the sync_packages analog.

Reference: src/sensor/sync.cpp:18-96. Pairs one decoded scan with the IMU
samples covering [scan_begin, scan_end]; refuses frames until the IMU stream
covers the scan end; requires >4 IMU samples; supports the point_notime mode
that synthesizes frame times from inter-frame gaps. Instead of the
reference's hard exit() on IMU underflow it raises ImuStreamDry, which the
runner surfaces as a fault (SURVEY.md section 5.3).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

import numpy as np

from vina_slam_tpu.sensor.decoders import DecodedScan


class ImuStreamDry(RuntimeError):
    """IMU buffer drained while a scan was pending (reference sync.cpp:80-83
    exits the process; we surface a recoverable fault instead)."""


@dataclass
class ImuBlock:
    t: np.ndarray    # (M,) float64 absolute timestamps
    gyr: np.ndarray  # (M, 3) float64 rad/s
    acc: np.ndarray  # (M, 3) float64 (g units or m/s^2; EKF auto-scales)


@dataclass
class Frame:
    scan: DecodedScan
    beg_time: float
    end_time: float
    imu: ImuBlock


class FrameAssembler:
    def __init__(self, point_notime: bool = False):
        self.point_notime = point_notime
        self._imu = deque()
        self._scans = deque()
        self._imu_last_time = -1.0
        self._last_pcl_time = -1.0
        self._pending = None  # (scan, beg, end) awaiting IMU coverage

    def push_imu(self, t: float, gyr, acc):
        self._imu.append((float(t), np.asarray(gyr, np.float64), np.asarray(acc, np.float64)))
        self._imu_last_time = float(t)

    def push_scan(self, scan: DecodedScan):
        self._scans.append(scan)

    def try_assemble(self) -> Frame | None:
        """Returns the next synchronized frame or None if not ready."""
        if self._pending is None:
            if not self._scans:
                return None
            scan = self._scans.popleft()
            beg = scan.stamp
            end = beg + (float(scan.rel_time[-1]) if scan.rel_time.size else 0.0)
            if self.point_notime:
                # simulate frame times from inter-frame gaps (sync.cpp:43-56)
                if self._last_pcl_time < 0:
                    self._last_pcl_time = beg
                    return None
                end = beg
                beg = self._last_pcl_time
                self._last_pcl_time = end
            self._pending = (scan, beg, end)

        scan, beg, end = self._pending
        if self._imu_last_time <= end:
            return None

        # extract IMU samples with t <= scan end (sync.cpp:67-77)
        ts, gs, accs = [], [], []
        while self._imu and self._imu[0][0] <= end:
            t, g, a = self._imu.popleft()
            ts.append(t)
            gs.append(g)
            accs.append(a)

        if not self._imu:
            raise ImuStreamDry("IMU stream drained while assembling a frame")

        self._pending = None
        if len(ts) <= 4:  # need >4 IMU msgs (sync.cpp:87-95)
            return None
        return Frame(
            scan=scan,
            beg_time=beg,
            end_time=end,
            imu=ImuBlock(np.asarray(ts), np.stack(gs), np.stack(accs)),
        )
