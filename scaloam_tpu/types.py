"""Core pytree types (reference: include/aloam_velodyne/common.h:43-62).

The reference's `pcl::PointCloud<pcl::PointXYZI>` (dynamic) becomes a padded
fixed-shape array + validity mask; `Pose6D` (x,y,z,roll,pitch,yaw) becomes an
SE(3) `Pose` carried as (quat wxyz, translation). RPY conversion lives in
ops/se3.py and is used only at artifact boundaries, removing the reference's
quaternion/Euler convention mixing (src/laserPosegraphOptimization.cpp:312-336).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Pose(NamedTuple):
    """SE(3) pose: unit quaternion (w, x, y, z) + translation (x, y, z)."""

    quat: jax.Array  # [..., 4] wxyz
    trans: jax.Array  # [..., 3]

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "Pose":
        q = jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype), batch_shape + (4,)
        )
        t = jnp.zeros(batch_shape + (3,), dtype=dtype)
        return Pose(q, t)


class LidarScan(NamedTuple):
    """One padded raw scan.

    xyz:  [N, 3] float32 (padding rows are zero)
    mask: [N] bool, True where the point is real
    """

    xyz: jax.Array
    mask: jax.Array

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    @staticmethod
    def from_numpy(points: np.ndarray, capacity: int) -> "LidarScan":
        """Pad/truncate an [n, 3+] float array into a fixed-capacity scan."""
        n = min(points.shape[0], capacity)
        xyz = np.zeros((capacity, 3), dtype=np.float32)
        xyz[:n] = points[:n, :3]
        mask = np.zeros((capacity,), dtype=bool)
        mask[:n] = True
        return LidarScan(jnp.asarray(xyz), jnp.asarray(mask))


class RangeImage(NamedTuple):
    """Ring-structured scan: the TPU-native layout for feature extraction.

    Points are bucketed by ring (vertical channel) and sorted by azimuth,
    mirroring the reference's per-ring concatenated cloud
    (src/scanRegistration.cpp:259-265) but as a dense [n_scans, width] grid.

    xyz:     [n_scans, width, 3]
    mask:    [n_scans, width] bool
    rel_time: [n_scans, width] float32 in [0, 1) — azimuth-relative scan time
              (the reference packs this into `intensity = scanID + 0.1*relTime`,
              src/scanRegistration.cpp:251)
    count:   [n_scans] int32 — valid points per ring (prefix-packed)
    """

    xyz: jax.Array
    mask: jax.Array
    rel_time: jax.Array
    count: jax.Array


class FeatureCloud(NamedTuple):
    """One padded feature set with per-point ring id + relative time.

    The ring id replaces the reference's `int(intensity)` scan-line lookup and
    rel_time its fractional part (src/laserOdometry.cpp:118,320).
    """

    xyz: jax.Array  # [M, 3]
    ring: jax.Array  # [M] float32 (ring id; padding = -1)
    rel_time: jax.Array  # [M] float32
    mask: jax.Array  # [M] bool

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    @staticmethod
    def empty(capacity: int) -> "FeatureCloud":
        return FeatureCloud(
            xyz=jnp.zeros((capacity, 3), jnp.float32),
            ring=-jnp.ones((capacity,), jnp.float32),
            rel_time=jnp.zeros((capacity,), jnp.float32),
            mask=jnp.zeros((capacity,), bool),
        )


class ScanFeatures(NamedTuple):
    """Output of feature extraction: the five published clouds of the
    reference (src/scanRegistration.cpp:426-455)."""

    sharp: FeatureCloud  # /laser_cloud_sharp
    less_sharp: FeatureCloud  # /laser_cloud_less_sharp
    flat: FeatureCloud  # /laser_cloud_flat
    less_flat: FeatureCloud  # /laser_cloud_less_flat
    full: RangeImage  # /velodyne_cloud_2 (ring-ordered full cloud)
    # Valid feature rows lost to capacity truncation this scan (int32
    # scalar; 0 when the configured capacities fit the environment). A
    # loud runtime signal for undersized caps — see config.py capacity
    # notes and ADVICE r1.
    overflow: jax.Array
