"""Mesh helpers for single- and multi-host runs."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


KF_AXIS = "kf"  # keyframe/factor/map-point sharding axis ("data parallel")


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (KF_AXIS,))


def pad_to_shards(n: int, n_shards: int) -> int:
    return -(-n // n_shards) * n_shards
