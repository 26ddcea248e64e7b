"""Configuration system.

Mirrors the reference's three ROS-parameter namespaces (General / Odometry /
LocalBA, src/platform/ros2/node.cpp:57-254) as dataclasses, and reads the
same YAML layout (vina_slam: ros__parameters: {General: ..., ...}) so the six
shipped sensor profiles port over unchanged. Adds a Tpu section for the
padding/precision policy which has no reference analog.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Sequence

import numpy as np

LIVOX, VELODYNE, OUSTER, HESAI, ROBOSENSE, TARTANAIR = range(6)


@dataclass
class GeneralConfig:
    bagname: str = "noNameBag"
    save_path: str = ""
    lid_topic: str = "/rslidar_points"
    imu_topic: str = "/imu"
    lidar_type: int = 0
    blind: float = 0.1                 # blind radius (m); squared internally
    point_filter_num: int = 3
    extrinsic_tran: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    extrinsic_rota: List[float] = field(
        default_factory=lambda: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
    )
    is_save_map: int = 0
    is_save_pose: int = 0
    pose_save_path: str = ""
    pose_filename: str = "trajectory.txt"
    if_BA: int = 1
    enable_visualization: int = 0
    full_map_voxel_size: float = 0.05


@dataclass
class OdometryConfig:
    cov_gyr: float = 0.1
    cov_acc: float = 0.1
    rdw_gyr: float = 1e-4
    rdw_acc: float = 1e-4
    down_size: float = 0.1
    dept_err: float = 0.02
    beam_err: float = 0.05
    voxel_size: float = 1.0
    min_eigen_value: float = 0.0025
    degrade_bound: int = 10
    point_notime: int = 0
    # IEKF flavor: 1 = VNC odometry (4 iterations, scan-plane normal
    # residuals), 0 = plain point-to-plane IEKF (20 iterations). The
    # reference exposes both via LioStateEstimation(pptr, use_vnc) with
    # iteration budgets at src/pipeline/odometry.cpp:64-68.
    use_vnc: int = 1
    # 0 = reference budgets (4 VNC / 20 plain, odometry.cpp:64-68); >0
    # forces that many IEKF iterations — the equal-budget A/B knob for the
    # VNC-vs-plain separation study (scripts/vnc_ab.py)
    iekf_max_iter: int = 0


@dataclass
class LocalBAConfig:
    win_size: int = 10
    max_layer: int = 2
    cov_gyr: float = 0.1
    cov_acc: float = 0.1
    rdw_gyr: float = 1e-4
    rdw_acc: float = 1e-4
    min_ba_point: int = 20
    # per-layer lambda0/lambda2 ratio thresholds; stored INVERTED like the
    # reference (node.cpp:256-259): yaml value 4.0 -> threshold 0.25
    plane_eigen_value_thre: List[float] = field(default_factory=lambda: [1.0, 1.0, 1.0, 1.0])
    imu_coef: float = 1e-4
    thread_num: int = 5
    # select the 3-factor BA overload (lidar + NORMAL + IMU,
    # optimizers.cpp:519-594); the reference builds the normal factors every
    # recut but its shipped loop only calls the 2-factor overload
    # (SURVEY.md section 3.2: "Build both; wire selection behind config").
    # When enabled, max_iter drops to 3 like the reference overload.
    use_normal: int = 0


@dataclass
class TpuConfig:
    """TPU-side policy (no reference analog)."""
    map_capacity: int = 1 << 18        # voxel hash table slots
    fix_pool_capacity: int = 1 << 18   # raw fixed-point pool size
    max_voxels_ba: int = 4096          # padded voxel count per BA extract
    max_new_voxels: int = 4096         # new hash insertions per step
    probe_len: int = 8                 # linear-probe window
    # compaction caps for the recut/margi hot path: refit/redistribution work
    # is gathered to these sizes, so they bound per-wave cost. Size them to
    # the leaves one window actually touches (~2-3k at default densities) —
    # oversizing directly multiplies recut/margi time (eigh3 etc. run on the
    # padded compacted arrays). Overflow degrades gracefully (stragglers
    # caught next wave / next scan).
    active_cap: int = 4096             # leaves refit per recut/margi wave
    refind_cap: int = 4096             # cache-miss points re-descended/wave
    pool_move_cap: int = 2048          # pool points redistributed per wave
    evict_dist: float = 700.0          # map release distance (reference
                                       # hardcodes 700 m, local_mapping.cpp:323)
    # fused steady path: 1 = one recut wave per scan, split cascades heal on
    # the NEXT scan (an XLA while_loop at map scale costs ~10 ms/scan in
    # loop-state copies even at zero iterations — voxel_map.recut "defer");
    # 0 = full same-scan cascade via the while_loop (reference-exact timing)
    recut_defer: int = 1
    scan_dtype: str = "float32"
    solve_dtype: str = "float64"


@dataclass
class SlamConfig:
    general: GeneralConfig = field(default_factory=GeneralConfig)
    odometry: OdometryConfig = field(default_factory=OdometryConfig)
    local_ba: LocalBAConfig = field(default_factory=LocalBAConfig)
    tpu: TpuConfig = field(default_factory=TpuConfig)

    # ---- derived quantities (reference node.cpp:210-265) ----
    @property
    def blind_sq(self) -> float:
        return self.general.blind * self.general.blind

    @property
    def plane_thre_inv(self) -> np.ndarray:
        return 1.0 / np.asarray(self.local_ba.plane_eigen_value_thre, np.float64)

    @property
    def ext_R(self) -> np.ndarray:
        return np.asarray(self.general.extrinsic_rota, np.float64).reshape(3, 3)

    @property
    def ext_p(self) -> np.ndarray:
        return np.asarray(self.general.extrinsic_tran, np.float64)

    @property
    def min_point(self) -> np.ndarray:
        """Per-layer minimum point counts to attempt a plane
        (reference node.cpp:219: min_point << 20, 20, 15, 10)."""
        return np.array([20, 20, 15, 10], np.int32)

    @property
    def n_levels(self) -> int:
        return self.local_ba.max_layer + 1


def _apply(dc, d: dict):
    names = {f.name for f in dataclasses.fields(dc)}
    for k, v in d.items():
        if k in names:
            setattr(dc, k, v)
    return dc


def load_config(path: str) -> SlamConfig:
    """Load a reference-format YAML profile (configs/*.yaml)."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    # unwrap the ROS node wrapper if present
    if "vina_slam" in raw:
        raw = raw["vina_slam"]
    if "ros__parameters" in raw:
        raw = raw["ros__parameters"]

    cfg = SlamConfig()
    _apply(cfg.general, raw.get("General", {}))
    _apply(cfg.odometry, raw.get("Odometry", {}))
    _apply(cfg.local_ba, raw.get("LocalBA", {}))
    _apply(cfg.tpu, raw.get("Tpu", {}))
    return cfg
