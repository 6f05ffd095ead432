"""slam_sensor_fusion_tpu — a TPU-native state-estimation engine.

A brand-new JAX/XLA/Pallas rebuild of the capabilities of the ROS 2
LiDAR/GPS/compass SLAM stack `viniciusvidal2/slam-sensor-fusion`
(reference mounted at /root/reference): raw registered LiDAR scans,
odometry, GPS fixes and compass headings in; map-frame poses and an
accumulated downsampled voxel map out.

Instead of ROS pub/sub, PCL kd-trees and per-point CPU loops, the whole
per-scan inner loop — uniform subsample, radius crop, correspondence
search, SVD/ICP solve, covariance-weighted GPS/odometry fusion and
stochastic gating — runs as fixed-shape XLA programs under `lax.scan`
with no host round-trips. Nearest-neighbour search is a tiled
streaming argmin-distance kernel on the MXU rather than a kd-tree.

Layout (mirrors SURVEY.md §7):
  ops/      device kernels: geometry, cloud ops, NN search, ICP,
            brute-force alignment, voxel grid, stochastic filter
  models/   pipelines: parity localization scan-step + lax.scan driver,
            mapping/map-manager, native-mode EKF
  parallel/ jax.sharding mesh helpers, sharded candidate grids and
            batched multi-sequence localization
  utils/    config tree, host IO (PCD, pose logs), time sync, synthetic
            data, native C++ loader bindings
"""

__version__ = "0.1.0"

import jax as _jax

# State estimation composes hundreds of small rigid transforms; the platform
# default of bf16-pass matmuls would accumulate metre-level pose error over a
# trajectory. Pin full f32 matmul precision engine-wide — the throughput-
# critical kernels (NN distance sweeps) already request their precision
# explicitly, and anything wanting bf16 must opt in per-op.
_jax.config.update("jax_default_matmul_precision", "highest")

from slam_sensor_fusion_tpu.utils.config import (  # noqa: F401
    ICPConfig,
    BruteForceConfig,
    StochasticFilterConfig,
    LocalizationConfig,
    MappingConfig,
)
