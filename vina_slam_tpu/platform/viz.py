"""Visualization export — the RViz MarkerArray analog.

Reference: OctoTree::collect_plane_markers / collect_normal_markers
(octree.cpp:758-949): jet-colored plane cylinders scaled by 3*sqrt(lambda)
and normal arrows, with stable per-voxel ids. Without ROS we export the
same content as JSON records (consumable by rerun/three.js viewers) and
keep the jet colormap + scaling conventions.
"""

from __future__ import annotations

import json

import numpy as np

from vina_slam_tpu.mapping import voxel_hash as vh


def map_jet(v: np.ndarray):
    """The reference's jet colormap (octree.cpp:22-63), vectorized."""
    v = np.clip(v, 0.0, 1.0)
    r = np.ones_like(v)
    g = np.ones_like(v)
    b = np.ones_like(v)

    m1 = v < 0.1242
    m2 = (v >= 0.1242) & (v < 0.3747)
    m3 = (v >= 0.3747) & (v < 0.6253)
    m4 = (v >= 0.6253) & (v < 0.8758)
    m5 = v >= 0.8758

    b = np.where(m1, 0.504 + ((1.0 - 0.504) / 0.1242) * v, b)
    g = np.where(m1, 0.0, g)
    r = np.where(m1, 0.0, r)

    b = np.where(m2, 1.0, b)
    r = np.where(m2, 0.0, r)
    g = np.where(m2, (v - 0.1242) / (0.3747 - 0.1242), g)

    b = np.where(m3, (0.6253 - v) / (0.6253 - 0.3747), b)
    g = np.where(m3, 1.0, g)
    r = np.where(m3, (v - 0.3747) / (0.6253 - 0.3747), r)

    b = np.where(m4, 0.0, b)
    r = np.where(m4, 1.0, r)
    g = np.where(m4, (0.8758 - v) / (0.8758 - 0.6253), g)

    b = np.where(m5, 0.0, b)
    g = np.where(m5, 0.0, g)
    r = np.where(m5, 1.0 - (v - 0.8758) * ((1.0 - 0.504) / (1.0 - 0.8758)), r)
    return np.stack([r, g, b], -1)


def collect_plane_markers(m, params, max_trace: float = 0.25,
                          pow_num: float = 0.2, max_out: int = 20000) -> list:
    """Plane cylinder records for all planar leaves: center, quaternion-free
    normal, scale = (3*sqrt(l2), 3*sqrt(l1), 2*sqrt(l0)), jet color by
    plane-covariance trace (octree.cpp:782-829)."""
    keys = np.asarray(m.keys)
    is_plane = np.asarray(m.is_plane) & (keys != int(vh.EMPTY_KEY)) & (np.asarray(m.state) == 0)
    idx = np.nonzero(is_plane)[0][:max_out]
    # marker ids are the VOXEL KEYS (level+coords), not table slots: stable
    # across hash rebuilds/evictions, like the reference's deterministic
    # voxel-id hash (octree.cpp:11-20)
    vid = keys[idx]
    center = np.asarray(m.plane_center)[idx]
    normal = np.asarray(m.plane_normal)[idx]
    eig = np.clip(np.asarray(m.eig_val)[idx], 0.0, None)
    # plane_var rows are SYM6-packed: normal-block diagonals at 0, 6, 11
    pvar = np.asarray(m.plane_var)[idx]
    trace = np.clip(pvar[:, 0] + pvar[:, 6] + pvar[:, 11], 0, max_trace)
    color = map_jet((trace / max_trace) ** pow_num)
    out = []
    for k in range(len(idx)):
        out.append({
            "id": int(vid[k]),
            "center": center[k].tolist(),
            "normal": normal[k].tolist(),
            "scale": [3.0 * float(np.sqrt(eig[k, 2])),
                      3.0 * float(np.sqrt(eig[k, 1])),
                      2.0 * float(np.sqrt(eig[k, 0]))],
            "color": color[k].tolist(),
        })
    return out


def collect_normal_markers(m, params, max_trace: float = 0.25,
                           pow_num: float = 0.2, max_out: int = 20000) -> list:
    """Normal ARROW records for all planar leaves
    (collect_normal_markers, octree.cpp:853-949): start = plane center,
    end = center + unit normal * length with length = 2 * quarter_edge
    (= half the voxel edge at the leaf's level), shaft/head widths
    0.1/0.2 * length, jet color by plane-covariance trace."""
    keys = np.asarray(m.keys)
    is_plane = (np.asarray(m.is_plane) & (keys != int(vh.EMPTY_KEY))
                & (np.asarray(m.state) == 0))
    idx = np.nonzero(is_plane)[0][:max_out]
    vid = keys[idx]  # stable voxel-key ids (see collect_plane_markers)
    center = np.asarray(m.plane_center)[idx]
    normal = np.asarray(m.plane_normal)[idx]
    normal = normal / np.maximum(
        np.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
    lv = np.asarray(vh.decode(np.asarray(m.keys)[idx])[0])
    edge = float(params.voxel_size) / (2.0 ** lv)
    length = edge / 2.0  # 2 * quater_length, octree.cpp:900
    pvar = np.asarray(m.plane_var)[idx]
    trace = np.clip(pvar[:, 0] + pvar[:, 6] + pvar[:, 11], 0, max_trace)
    color = map_jet((trace / max_trace) ** pow_num)
    out = []
    for k in range(len(idx)):
        out.append({
            "id": int(vid[k]),
            "start": center[k].tolist(),
            "end": (center[k] + normal[k] * length[k]).tolist(),
            "shaft": 0.1 * float(length[k]),
            "head": 0.2 * float(length[k]),
            "color": color[k].tolist(),
        })
    return out


def save_markers_json(path: str, m, params):
    with open(path, "w") as f:
        json.dump({"planes": collect_plane_markers(m, params),
                   "normals": collect_normal_markers(m, params)}, f)


class MarkerDiffer:
    """Incremental marker protocol — the reference's add/delete MarkerArray
    scheme (octree.cpp:758-949): voxels publish stable per-voxel ids, the
    viewer keeps the scene, and each tick ships only markers that
    appeared/changed plus DELETE actions for ids that vanished — O(changed)
    records instead of the full 20k-marker snapshot.

    diff(markers, rebase=True) returns {"add": [...], "delete": [ids]}
    relative to the stored baseline. rebase=False keeps the baseline (the
    live streamer diffs every tick against the last FULL snapshot, so a
    viewer that missed ticks stays consistent: base scene + latest update
    is always the complete current state)."""

    def __init__(self):
        self._base: dict = {}

    def rebase(self, markers: list) -> None:
        self._base = {rec["id"]: json.dumps(rec, sort_keys=True)
                      for rec in markers}

    def diff(self, markers: list, rebase: bool = True) -> dict:
        cur = {rec["id"]: json.dumps(rec, sort_keys=True) for rec in markers}
        add = [m_ for m_ in markers
               if self._base.get(m_["id"]) != cur[m_["id"]]]
        delete = [i for i in self._base if i not in cur]
        if rebase:
            self._base = cur
        return {"add": add, "delete": delete}


def save_marker_update_json(path: str, m, params, differ_planes: MarkerDiffer,
                            differ_normals: MarkerDiffer):
    """One incremental tick: write only the marker deltas since the last
    call on these differs (the publish-cadence analog of pub_voxel_plane /
    pub_voxel_normal with add/delete actions)."""
    upd = {"planes": differ_planes.diff(collect_plane_markers(m, params)),
           "normals": differ_normals.diff(collect_normal_markers(m, params))}
    with open(path, "w") as f:
        json.dump(upd, f)
    return upd
