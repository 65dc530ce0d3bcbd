"""Mesh helpers for single- and multi-host runs."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


KF_AXIS = "kf"  # keyframe/factor/map-point sharding axis ("data parallel")
SEQ_AXIS = "seq"  # sequence axis for the multi-sequence front-end


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (KF_AXIS,))


def make_mesh2d(n_seq: int, n_kf: Optional[int] = None) -> Mesh:
    """2D mesh (seq, kf): the multi-sequence data-parallel front-end
    shards over SEQ_AXIS while the backend growth axes (keyframes, SC
    descriptors, pose-graph factors) shard over KF_AXIS — both coexist on
    one mesh (the combined multi-sequence + shared-backend layout)."""
    devs = jax.devices()
    if n_kf is None:
        n_kf = len(devs) // n_seq
    if n_kf < 1:
        raise ValueError(
            f"make_mesh2d: {n_seq} sequences over {len(devs)} devices "
            f"leaves no room for the kf axis (need n_seq <= device count)"
        )
    if n_seq * n_kf > len(devs):
        raise ValueError(
            f"make_mesh2d: requested {n_seq}x{n_kf} mesh exceeds the "
            f"{len(devs)} available devices"
        )
    devs = np.array(devs[: n_seq * n_kf]).reshape(n_seq, n_kf)
    return Mesh(devs, (SEQ_AXIS, KF_AXIS))


def pad_to_shards(n: int, n_shards: int) -> int:
    return -(-n // n_shards) * n_shards
