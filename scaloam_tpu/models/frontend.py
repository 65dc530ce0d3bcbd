"""Fused front-end: features + odometry + mapping + keyframe gate — and,
on keyframe frames only, the keyframe-cloud voxel filter — as ONE jitted
step per scan.

The three-executable split (ops/features.py -> models/odometry.py ->
models/mapping.py) mirrors the reference's process-per-stage topology
(launch/aloam_mulran.launch:30-33) and remains the unit of ablation, but
on this runtime each jit CALL costs ~1.0-1.3 ms of host dispatch nearly
independent of argument count (CLAUDE.md, tools/micro_gn.py), and the
async pipeline paid it four times per frame (features, odometry, mapping,
gate) across three GIL-sharing threads. Device-side, fusing the stages
changes throughput by only ~1% (tools/fused_frame_experiment.py) — the
win is the host path: one dispatch, one worker thread, no inter-stage
queue handoffs. The per-keyframe cloud prep (_prepare_keyframe's 0.4 m
voxel filter, reference src/laserMapping.cpp:629-639) rides the same
step under a `lax.cond` on the gate flag, so keyframe frames pay its
~6 ms device cost and ordinary frames skip it entirely — the backend
ingest thread then needs zero per-keyframe device dispatches for prep.

Equivalence with the separate stages is pinned by
tests/test_runtime.py::test_fused_frontend_matches_separate_stages.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scaloam_tpu.config import SlamConfig
from scaloam_tpu.models import mapping as mapping_mod
from scaloam_tpu.models import odometry as odometry_mod
from scaloam_tpu.models import pipeline as pipeline_mod
from scaloam_tpu.ops import features
from scaloam_tpu.types import LidarScan, Pose


class FrontendState(NamedTuple):
    o: odometry_mod.OdometryState
    m: mapping_mod.MappingState
    gate: pipeline_mod.GateState


class FrontendOutput(NamedTuple):
    odom_world: Pose  # /laser_odom_to_init
    mapped_pose: Pose  # /aft_mapped_to_init
    fire: jax.Array  # bool scalar: keyframe gate fired
    degenerate: jax.Array  # bool scalar (odometry correspondence guard)
    # Keyframe cloud (0.4 m-filtered local cloud + intensity payload,
    # reference :629-639) — real data only when fire; zeros otherwise
    # (the cond's skip branch). The backend consumes these directly.
    kf_xyz: jax.Array  # [C, 3]
    kf_mask: jax.Array  # [C]
    kf_ext: jax.Array  # [C, 1]


def init_state(cfg: SlamConfig) -> FrontendState:
    return FrontendState(
        o=odometry_mod.init_state(cfg),
        m=mapping_mod.init_state(cfg),
        gate=pipeline_mod.init_gate_state(),
    )


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def frontend_step(state: FrontendState, scan: LidarScan, cfg: SlamConfig):
    """Process one raw scan end-to-end through the front-end.

    Returns (new_state, FrontendOutput). Mapping runs every frame (the
    async runtime's drop-oldest input queue is the real-time policy; the
    sync driver's skip_frame cadence keeps the separate-stage path)."""
    feats = features.extract_features(scan, cfg)
    o_state, o_out = odometry_mod.odometry_step(state.o, feats, cfg)
    # Mapping consumes odometry's republished clouds (post-step last_*,
    # de-skewed to sweep end under DISTORTION; == feats.less_* otherwise).
    m_state, m_out = mapping_mod.mapping_step(
        state.m, o_out.world, o_state.last_corner, o_state.last_surf, cfg
    )
    gate, fire = pipeline_mod.gate_step(
        state.gate, m_out.pose.quat, m_out.pose.trans,
        float(cfg.pgo.keyframe_meter_gap), float(cfg.pgo.keyframe_deg_gap),
    )

    full = feats.full

    def prep(args):
        xyz, mask, rel = args
        return pipeline_mod._prepare_keyframe(xyz, mask, rel, cfg)

    # The prep's output capacity is input-bounded (voxel_downsample_packed
    # clamps to the flattened range-image size) — derive the skip branch's
    # zero shapes from the prep itself so they always agree.
    prep_shapes = jax.eval_shape(prep, (full.xyz, full.mask, full.rel_time))

    def skip(args):
        return tuple(jnp.zeros(s.shape, s.dtype) for s in prep_shapes)

    kf_xyz, kf_mask, kf_ext = jax.lax.cond(
        fire, prep, skip, (full.xyz, full.mask, full.rel_time)
    )

    new_state = FrontendState(o=o_state, m=m_state, gate=gate)
    return new_state, FrontendOutput(
        odom_world=o_out.world,
        mapped_pose=m_out.pose,
        fire=fire,
        degenerate=o_out.degenerate,
        kf_xyz=kf_xyz, kf_mask=kf_mask, kf_ext=kf_ext,
    )
