"""Global constants of the SLAM framework.

Mirrors reference include/vina_slam/core/constants.hpp:7-15 where the values
are part of the algorithm (state dimension, gravity, kNN count); adds the
TPU-side padding/bucketing policy which has no reference analog.
"""

import numpy as np

# --- algorithmic constants (reference core/constants.hpp:7-15) ---
DIM = 15          # error-state dimension: [dtheta, dp, dv, dbg, dba]
DVEL = 6          # pose-only sub-block used by the lidar BA factor
G_M_S2 = 9.8      # gravity magnitude used for g-unit IMUs
NMATCH = 5        # kNN count of the bootstrap (kdtree) odometry

# --- spatial hash (reference core/types.hpp:28-41, re-mixed for open addressing) ---
HASH_P = 1000033

# --- dtypes ---
# Point-heavy kernels run in f32 (moments are voxel-centered so f32 is safe);
# small dense filter/optimizer algebra runs in f64 (emulated on TPU, tiny data).
F32 = np.float32
F64 = np.float64
I32 = np.int32

# --- padding / bucketing policy (TPU static shapes) ---
# Every scan is padded up to one of these sizes so each bucket hits exactly one
# compiled XLA program (BASELINE.md "compile stability" target). 3072/6144
# are half-step buckets: the common indoor scan shapes (~2.2k and ~5k pts)
# sat just above a power of two and paid ~45% pad slack in every per-point
# stage (deskew, downsample, IEKF match, window push).
SCAN_BUCKETS = (2048, 3072, 4096, 6144, 8192, 12288, 16384, 24576, 32768,
                65536, 131072)
IMU_BUCKET = 128         # max IMU samples per scan interval (10 Hz scan, up to 1 kHz IMU)
IMU_BUCKETS = (32, IMU_BUCKET)  # pad-to-bucket sizes: a 200 Hz IMU yields ~21
                                # samples/scan; the log-depth scans over the
                                # bucket cost ~linearly in bucket width

EMPTY_SLOT = -1          # sentinel for unoccupied hash slots / invalid indices
