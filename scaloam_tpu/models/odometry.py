"""Scan-to-scan odometry — the laserOdometry stage as one jitted step.

Reference: src/laserOdometry.cpp (601 LoC). Per frame:
  - 2 outer data-association passes (:278), each building a problem from
    edge correspondences (1-NN corner + companion on a nearby ring,
    gate dist^2 < 25, :299-384) and plane correspondences (1-NN surf +
    same-ring + nearby-ring companions, :387-483),
  - solved by Ceres DENSE_QR with Huber(0.1), <=4 iterations (:284-291,
    :493-499) on the frame-to-frame pose (q_last_curr, t_last_curr),
  - warm-started from the previous frame's solution (para_q/para_t are
    process-global), i.e. a constant-motion prior,
  - world pose integration t_w += q_w * t_rel; q_w *= q_rel (:504-505),
  - "last" clouds swap to the current less-sharp / less-flat (:554-568).

TPU design: KD-trees -> tiled brute-force NN (ops.voxel.knn) + a
ring-constrained second pass (ops.correspond); Ceres -> analytic-Jacobian
GN (ops.gn); the whole step is a single jit with fixed shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scaloam_tpu.config import SlamConfig
from scaloam_tpu.ops import correspond, gn, residuals, se3, voxel
from scaloam_tpu.types import FeatureCloud, Pose, ScanFeatures


class OdometryState(NamedTuple):
    last_corner: FeatureCloud  # previous less-sharp
    last_surf: FeatureCloud  # previous less-flat
    rel: Pose  # frame-to-frame estimate (warm start)
    world: Pose  # accumulated odometry ("/laser_odom_to_init")
    initialized: jax.Array  # bool
    frame_idx: jax.Array  # int32
    feat_overflow: jax.Array  # int32 running max of ScanFeatures.overflow
    degenerate_count: jax.Array  # int32 frames below min_correspondences


class OdometryOutput(NamedTuple):
    world: Pose
    rel: Pose
    n_corner_corr: jax.Array
    n_surf_corr: jax.Array
    degenerate: jax.Array  # bool: fewer than min_correspondences total
    # (the reference's "less correspondence!" warning,
    # src/laserOdometry.cpp:488-491)


def init_state(cfg: SlamConfig) -> OdometryState:
    feat = cfg.features
    return OdometryState(
        last_corner=FeatureCloud.empty(feat.max_less_sharp),
        last_surf=FeatureCloud.empty(feat.max_less_flat),
        rel=Pose.identity(),
        world=Pose.identity(),
        initialized=jnp.array(False),
        frame_idx=jnp.array(0, jnp.int32),
        feat_overflow=jnp.array(0, jnp.int32),
        degenerate_count=jnp.array(0, jnp.int32),
    )


def _sweep_candidates(rel: Pose, feats: ScanFeatures, state: OdometryState,
                      cfg: SlamConfig):
    """Full-cloud correspondence sweeps at the current rel estimate, kept
    2-deep per class. Runs ONCE per frame; each outer association pass
    re-ranks these candidates at its refined pose (_rerank_*) instead of
    re-sweeping — the reference re-searches its KD-trees per pass
    (src/laserOdometry.cpp:278-299), but the pose moves ~mm between passes
    so the cached top-2 contains the new top-1 (deviation ATE-validated;
    same design as mapping's candidate cache). The 1-NN's ring (the
    same/other class boundary) is frozen at the sweep pose.

    Returns per feature type the candidate points [Q, 2, 3] per class
    (any / same-ring / other-ring; corners have no same class). Candidate
    points, rings, and indices ride the NN scans as one-hot-matmul
    payloads — no target[idx] gathers anywhere (tools/profile_ringpass.py)."""
    ocfg = cfg.odometry

    # Tile sizes: measured on v5e, the scans are per-iteration-overhead
    # bound — 8192-wide tiles halve nn1, 4096 is the ring-pass sweet spot.
    def sweep(q_cloud, t_cloud, want_same):
        # TransformToStart; with DISTORTION on, de-skew by the per-point
        # sweep fraction (src/laserOdometry.cpp:111-129).
        s = q_cloud.rel_time if ocfg.distortion else None
        q = residuals.transform_points(rel, q_cloud.xyz, s=s)
        iota = jnp.arange(t_cloud.xyz.shape[0], dtype=jnp.float32)
        pl = jnp.concatenate(
            [t_cloud.xyz, t_cloud.ring[:, None], iota[:, None]], axis=1
        )
        _, P = voxel.knn2_payload(
            q, q_cloud.mask, t_cloud.xyz, t_cloud.mask, pl, tile=8192
        )
        any_pts = P[:, :, :3]
        ring_j = P[:, 0, 3]
        excl = P[:, 0, 4].astype(jnp.int32)  # exact: index < 2^24
        _, p_same, _, p_other = correspond.ring_constrained_nn2_pts(
            q, q_cloud.mask, ring_j, excl, t_cloud.xyz, t_cloud.mask,
            t_cloud.ring, ocfg.nearby_scan, tile=4096,
            want_same=want_same,  # corners need only the other-ring pt
        )
        return (any_pts, p_same, p_other) if want_same else (any_pts, p_other)

    corner_cand = sweep(feats.sharp, state.last_corner, want_same=False)
    surf_cand = sweep(feats.flat, state.last_surf, want_same=True)
    return corner_cand, surf_cand


def _pick1(q: jax.Array, cand: jax.Array):
    """Nearest of the two cached candidates at the current pose.
    q [Q, 3], cand [Q, 2, 3] -> (d [Q], pt [Q, 3])."""
    d = jnp.sum((cand - q[:, None, :]) ** 2, axis=-1)  # [Q, 2]
    take2 = d[:, 1] < d[:, 0]
    pt = jnp.where(take2[:, None], cand[:, 1], cand[:, 0])
    return jnp.minimum(d[:, 0], d[:, 1]), pt


def _associate(rel: Pose, feats: ScanFeatures, corner_cand, surf_cand,
               cfg: SlamConfig):
    """One data-association pass: re-rank the cached candidates at the
    current rel estimate. Returns the fixed correspondence data for the GN
    inner loop (validity gates :299-384, :387-483)."""
    thr = cfg.odometry.distance_sq_threshold
    dk = cfg.odometry.distortion

    sharp = feats.sharp
    q_pts = residuals.transform_points(
        rel, sharp.xyz, s=sharp.rel_time if dk else None
    )
    dj, a = _pick1(q_pts, corner_cand[0])
    do, b = _pick1(q_pts, corner_cand[1])
    corner_valid = sharp.mask & (dj < thr) & (do < thr)
    corner_data = (sharp.xyz, a, b, corner_valid, sharp.rel_time)

    flat = feats.flat
    qs_pts = residuals.transform_points(
        rel, flat.xyz, s=flat.rel_time if dk else None
    )
    sdj, j = _pick1(qs_pts, surf_cand[0])
    ds, l = _pick1(qs_pts, surf_cand[1])
    do2, m = _pick1(qs_pts, surf_cand[2])
    surf_valid = flat.mask & (sdj < thr) & (ds < thr) & (do2 < thr)
    surf_data = (flat.xyz, j, l, m, surf_valid, flat.rel_time)
    return corner_data, surf_data


def _solve(rel: Pose, corner_data, surf_data, cfg: SlamConfig) -> Pose:
    # SoA ([3, n]) factor data: transposed once, reused by all GN iterations
    # (lane-efficient — see residuals.py FactorSetT). The pose-independent
    # factor halves (edge line geometry + translation Jacobian block, plane
    # normals) are PREPARED once here; the GN loop only relinearizes
    # (tools/profile_odometry2.py: the solves were 2.2 ms of the 4.1 ms
    # step, half of it re-deriving frozen quantities).
    p_c, a, b, v_c, s_c = corner_data
    p_s, j, l, m, v_s, s_s = surf_data
    pcT, aT, bT = p_c.T, a.T, b.T
    psT, jT, lT, mT = p_s.T, j.T, l.T, m.T
    if not cfg.odometry.distortion:
        prep_e = residuals.edge_prep_T(pcT, aT, bT, v_c)
        nrmT, neg_d = residuals.plane3_prep_T(jT, lT, mT)

        def build(pose):
            return [
                residuals.edge_factors_from_prep(pose, prep_e),
                residuals.plane_norm_factors_T(pose, psT, nrmT, neg_d, v_s),
            ]
    else:

        def build(pose):
            return [
                residuals.edge_factors_T(pose, pcT, aT, bT, v_c, s=s_c),
                residuals.plane3_factors_T(pose, psT, jT, lT, mT, v_s, s=s_s),
            ]

    return gn.gauss_newton(
        rel, build, cfg.odometry.gn_iterations, cfg.odometry.huber_delta
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def odometry_step(
    state: OdometryState, feats: ScanFeatures, cfg: SlamConfig
):
    """Process one feature frame; returns (new_state, OdometryOutput)."""

    ocfg = cfg.odometry
    use_kernel = not ocfg.distortion and (
        ocfg.fused_gn_kernel == "on"
        or (ocfg.fused_gn_kernel == "auto" and jax.default_backend() == "tpu")
    )

    def solve_branch(rel):
        corner_cand, surf_cand = _sweep_candidates(rel, feats, state, cfg)
        if use_kernel:
            # Whole associate+GN chain in one Pallas program
            # (ops/pallas/gn_odometry.py; equivalence vs the XLA path
            # below pinned by tests/test_pallas_gn.py).
            from scaloam_tpu.ops.pallas import gn_odometry as gnk

            cpack = gnk.pack_corner(
                feats.sharp.xyz, corner_cand[0], corner_cand[1],
                feats.sharp.mask,
            )
            spack = gnk.pack_surf(
                feats.flat.xyz, surf_cand[0], surf_cand[1], surf_cand[2],
                feats.flat.mask,
            )
            q, t, n_c, n_s = gnk.associate_and_solve(
                cpack, spack, rel.quat, rel.trans,
                outer_iterations=ocfg.outer_iterations,
                gn_iterations=ocfg.gn_iterations,
                thr=ocfg.distance_sq_threshold,
                huber_delta=ocfg.huber_delta,
            )
            return Pose(q, t), n_c, n_s
        n_c = jnp.zeros((), jnp.int32)
        n_s = jnp.zeros((), jnp.int32)
        for _ in range(cfg.odometry.outer_iterations):
            corner_data, surf_data = _associate(
                rel, feats, corner_cand, surf_cand, cfg
            )
            rel = _solve(rel, corner_data, surf_data, cfg)
            n_c = jnp.sum(corner_data[3].astype(jnp.int32))  # corner_valid
            n_s = jnp.sum(surf_data[4].astype(jnp.int32))  # surf_valid
        return rel, n_c, n_s

    def skip_branch(rel):
        return Pose.identity(), jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)

    rel, n_c, n_s = jax.lax.cond(
        state.initialized, solve_branch, skip_branch, state.rel
    )

    # Degenerate-frame guard (the reference warns when the solve had fewer
    # than 10 total correspondences, src/laserOdometry.cpp:488-491). The
    # solve still proceeds (as in the reference); the flag + running count
    # surface the condition without a per-frame D2H fetch.
    degenerate = state.initialized & (
        (n_c + n_s) < cfg.odometry.min_correspondences
    )

    world = se3.compose(state.world, rel)  # :504-505

    # With DISTORTION on, the republished "last" clouds are de-skewed to the
    # END of the sweep (TransformToEnd, src/laserOdometry.cpp:131-146,
    # 554-568) so the next frame matches against a motion-consistent target.
    less_sharp, less_flat = feats.less_sharp, feats.less_flat
    if cfg.odometry.distortion:
        inv = se3.inverse(rel)

        def to_end(fc):
            p_start = residuals.transform_points(rel, fc.xyz, s=fc.rel_time)
            return fc._replace(xyz=se3.apply(inv, p_start))

        less_sharp = to_end(less_sharp)
        less_flat = to_end(less_flat)

    new_state = OdometryState(
        last_corner=less_sharp,
        last_surf=less_flat,
        rel=rel,
        world=world,
        initialized=jnp.array(True),
        frame_idx=state.frame_idx + 1,
        feat_overflow=jnp.maximum(state.feat_overflow, feats.overflow),
        degenerate_count=state.degenerate_count + degenerate.astype(jnp.int32),
    )
    return new_state, OdometryOutput(
        world=world, rel=rel, n_corner_corr=n_c, n_surf_corr=n_s,
        degenerate=degenerate,
    )
