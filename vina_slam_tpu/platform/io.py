"""Result output: TUM trajectory and PCD files.

Reference: src/platform/ros2/io.cpp (FileReaderWriter). The TUM format is
identical (`t x y z qx qy qz qw` @ 9 decimals, io.cpp:67-77); the PCD writer
emits binary PCD v0.7 without PCL.
"""

from __future__ import annotations

import struct

import numpy as np


def rot_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), Eigen convention."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    return np.array([x, y, z, w])


class TumWriter:
    """init_pose_file / save_pose_tum (io.cpp:54-77)."""

    def __init__(self, path: str):
        self._f = open(path, "w")

    def write(self, t: float, R: np.ndarray, p: np.ndarray):
        q = rot_to_quat(np.asarray(R))
        self._f.write(
            f"{t:.9f} {p[0]:.9f} {p[1]:.9f} {p[2]:.9f} "
            f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}\n"
        )

    def close(self):
        self._f.close()


def save_pcd(path: str, pts: np.ndarray, intensity: np.ndarray | None = None):
    """Binary PCD v0.7 writer (save_pcd analog, io.cpp:25-41)."""
    pts = np.asarray(pts, np.float32)
    n = pts.shape[0]
    if intensity is None:
        intensity = np.zeros(n, np.float32)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        "FIELDS x y z intensity\n"
        "SIZE 4 4 4 4\n"
        "TYPE F F F F\n"
        "COUNT 1 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\nDATA binary\n"
    )
    data = np.concatenate([pts, np.asarray(intensity, np.float32)[:, None]], axis=1)
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(data.astype("<f4").tobytes())


def load_tum(path: str) -> np.ndarray:
    """Read a TUM trajectory into (N, 8) [t x y z qx qy qz qw]."""
    return np.loadtxt(path).reshape(-1, 8)


class SessionDirExists(RuntimeError):
    """is_save_map=1 refuses to overwrite an existing session directory
    (node.cpp:269-279: the reference prints an overwrite warning and
    exit(1)s; here it is a catchable error)."""


def prepare_session_dir(save_path: str, bagname: str, is_save_map: int) -> str:
    """Session output-directory lifecycle (node.cpp:267-287):
    `save_path/bagname/`. With is_save_map=1 an EXISTING directory is a
    hard error — saving would overwrite a previous session's map; delete
    or rename it, or change `bagname`. Otherwise the directory is created
    on demand."""
    import os

    session_dir = os.path.join(save_path or ".", bagname)
    if is_save_map == 1:
        if os.path.exists(session_dir):
            raise SessionDirExists(
                f"session directory already exists: {session_dir!r} — "
                "is_save_map=1 would overwrite existing data; delete or "
                "rename it, or change 'bagname' in the config "
                "(node.cpp:269-279)")
        os.makedirs(session_dir)
    else:
        os.makedirs(session_dir, exist_ok=True)
    return session_dir
