"""Data-parallel multi-sequence front-end: N devices process N lidar
sequences simultaneously.

The reference is a live single-robot ROS stack with no batch story at all;
offline evaluation (e.g. all 11 KITTI odometry sequences) replays bags one
at a time. Here the whole front-end step (features -> scan-to-scan
odometry -> scan-to-map) is vmapped over a leading sequence axis and
sharded over the mesh with shard_map, so a pod processes one sequence per
device at full per-chip throughput — the SLAM state chain is sequential in
time, so batch data-parallelism across sequences is the correct scale-out
axis for the front-end (the backend's growth axes — keyframes, SC
descriptors, pose-graph factors — shard separately: parallel/sc_retrieval,
parallel/pgo, parallel/gridmap).

No cross-sequence collectives are needed; shard_map keeps every per-frame
tensor device-local (check_vma=False would also work, but the explicit
P(SEQ_AXIS) in/out specs document the layout and let pjit place host
transfers per shard).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from scaloam_tpu.config import SlamConfig
from scaloam_tpu.models import mapping as mapping_mod
from scaloam_tpu.models import odometry as odometry_mod
from scaloam_tpu.ops import features
from scaloam_tpu.types import LidarScan

SEQ_AXIS = "seq"  # preferred axis name; 1D meshes fall back to their axis


def _seq_axis(mesh: Mesh) -> str:
    """The mesh axis sequences shard over: "seq" on a 2D (seq, kf) mesh
    (mesh.make_mesh2d — front-end and sharded backend coexist), else the
    mesh's only axis (back-compat with the 1D "kf" mesh)."""
    if SEQ_AXIS in mesh.axis_names:
        return SEQ_AXIS
    assert len(mesh.axis_names) == 1, mesh.axis_names
    return mesh.axis_names[0]


def init_states(n_seq: int, cfg: SlamConfig):
    """Per-sequence odometry+mapping states, stacked on a leading axis."""
    o = odometry_mod.init_state(cfg)
    m = mapping_mod.init_state(cfg)
    stack = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_seq,) + x.shape), t
    )
    return stack(o), stack(m)


def shard_states(states, mesh: Mesh):
    """Place stacked states with the leading axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(_seq_axis(mesh)))
    return jax.tree.map(lambda x: jax.device_put(x, sh), states)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
def _frame_batch(o_states, m_states, xyz, mask, cfg: SlamConfig):
    def one(o_state, m_state, sxyz, smask):
        feats = features.extract_features(LidarScan(sxyz, smask), cfg)
        o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
        m_state, m_out = mapping_mod.mapping_step(
            m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
        )
        return o_state, m_state, o_out.world, m_out.pose

    return jax.vmap(one)(o_states, m_states, xyz, mask)


def frame_batch(o_states, m_states, scans_xyz, scans_mask, cfg: SlamConfig,
                mesh: Mesh = None):
    """Advance every sequence by one frame.

    Args:
      o_states, m_states: stacked per-sequence states (leading axis n_seq,
        sharded over the mesh by shard_states).
      scans_xyz: [n_seq, max_points, 3]; scans_mask: [n_seq, max_points].
      mesh: optional — when given, inputs are placed sharded before the
        call so XLA never materializes the batch on one device.

    Returns (o_states, m_states, odom_poses, map_poses) with the same
    leading axis. Under jit with sharded operands, XLA partitions the
    vmapped program over the mesh: one sequence per device, zero
    collectives.
    """
    if mesh is not None:
        sh = NamedSharding(mesh, P(_seq_axis(mesh)))
        scans_xyz = jax.device_put(scans_xyz, sh)
        scans_mask = jax.device_put(scans_mask, sh)
    return _frame_batch(o_states, m_states, scans_xyz, scans_mask, cfg)
