"""Keyframes and global-map accumulation.

Reference: include/vina_slam/mapping/keyframe.hpp + the marginalized-cloud
output path (pub_localmap, publishers.cpp:99-131, every 3rd point) and
per-keyframe PCD saving (io.cpp:25-41, "10 scans merge into a keyframe",
keyframe.hpp:6). The reference's Keyframe class exists but is not wired into
its pipeline; here keyframing IS the map-saving path: marginalized frames
accumulate into keyframes of `scans_per_keyframe` scans, optionally saved as
PCD and merged into a voxel-downsampled global map.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class Keyframe:
    """Pose + accumulated world cloud + id (keyframe.hpp:7-20)."""
    kid: int
    R: np.ndarray
    p: np.ndarray
    pts: np.ndarray  # (N, 3) world frame

    def generate(self, rot: np.ndarray, tra: np.ndarray) -> np.ndarray:
        """Re-transform the keyframe cloud (Keyframe::generate,
        octree.cpp:100-112)."""
        return self.pts @ rot.T + tra


@dataclass
class GlobalMapAccumulator:
    """Collects marginalized scans into keyframes and a downsampled global
    map (the is_save_map=1 behavior, node.cpp:267-287 + io.cpp:25-41)."""
    save_dir: str = ""
    scans_per_keyframe: int = 10
    stride: int = 3                  # every 3rd point (publishers.cpp:118)
    full_map_voxel_size: float = 0.1

    keyframes: list = field(default_factory=list)
    _cur_pts: list = field(default_factory=list)
    _cur_pose: tuple | None = None
    _count: int = 0

    def push_marginalized(self, world_pts: np.ndarray, R: np.ndarray, p: np.ndarray):
        self._cur_pts.append(np.asarray(world_pts[:: self.stride], np.float32))
        self._cur_pose = (np.asarray(R), np.asarray(p))
        self._count += 1
        if self._count % self.scans_per_keyframe == 0:
            self._flush()

    def _flush(self):
        if not self._cur_pts:
            return
        kf = Keyframe(
            kid=len(self.keyframes),
            R=self._cur_pose[0], p=self._cur_pose[1],
            pts=np.concatenate(self._cur_pts),
        )
        self.keyframes.append(kf)
        self._cur_pts = []
        if self.save_dir:
            from vina_slam_tpu.platform.io import save_pcd
            os.makedirs(self.save_dir, exist_ok=True)
            save_pcd(os.path.join(self.save_dir, f"{kf.kid}.pcd"), kf.pts)

    def global_map(self) -> np.ndarray:
        """Voxel-mean downsampled union of all keyframe clouds."""
        self._flush()
        if not self.keyframes:
            return np.zeros((0, 3), np.float32)
        pts = np.concatenate([k.pts for k in self.keyframes])
        vs = self.full_map_voxel_size
        keys = np.floor(pts / vs).astype(np.int64)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        out = np.zeros((len(uniq), 3), np.float64)
        cnt = np.zeros(len(uniq))
        np.add.at(out, inv, pts)
        np.add.at(cnt, inv, 1)
        return (out / cnt[:, None]).astype(np.float32)
