"""scaloam_tpu — a TPU-native LiDAR SLAM engine.

A ground-up reimplementation of the capabilities of SC-A-LOAM (A-LOAM
odometry/mapping front-end + ScanContext place recognition + pose-graph
backend) designed for TPU hardware:

- fixed-shape range-image tensors instead of dynamic point vectors,
- brute-force tiled MXU matmul nearest-neighbor search instead of KD-trees,
- batched analytic-Jacobian Gauss-Newton instead of Ceres autodiff,
- dense-matmul ScanContext retrieval instead of nanoflann,
- batch (optionally distributed, shard_map) Gauss-Newton pose-graph
  optimization instead of GTSAM iSAM2.

Reference behavior: swoonge/SC-A-LOAM (see SURVEY.md at repo root).
"""

from scaloam_tpu import config
from scaloam_tpu.types import LidarScan, FeatureCloud, Pose

__version__ = "0.1.0"

__all__ = ["config", "LidarScan", "FeatureCloud", "Pose", "__version__"]
