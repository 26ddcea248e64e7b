"""vina_slam_tpu — a TPU-native LiDAR-inertial SLAM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of VINA-SLAM
(Voxel-based Inertial and Normal-Aligned LiDAR-IMU SLAM): sensor decode,
motion deskew, iterated error-state Kalman odometry with Vector Normal
Consistency (VNC) residuals, a global probabilistic voxel map, and
sliding-window LiDAR-inertial bundle adjustment with eigenvalue planar
factors — all expressed as fixed-shape batched device programs.

Layer map (mirrors reference /root/reference layering, re-designed TPU-first):
  core/        SO(3) math, state pytrees, point-cluster algebra, 3x3 eigh
  sensor/      vendor point decode + scan/IMU frame assembly (host)
  estimation/  EKF propagation + deskew, IMU preintegration (lax.scan)
  mapping/     flat multi-level voxel hash map, BA factors, LM optimizers
  pipeline/    IEKF odometry, initialization, the per-scan runner
  parallel/    jax.sharding mesh helpers, multi-chip sharded steps
  platform/    TUM/PCD output, marker export
  ops/         Pallas TPU kernels for the hot paths
"""

__version__ = "0.1.0"

from vina_slam_tpu.core import config as config  # noqa: F401
