"""Scan-to-map refinement — the laserMapping stage as one jitted step.

Reference: src/laserMapping.cpp (952 LoC). Per frame:
  - transformAssociateToMap: prior = map_correction o odom_pose (:143-147)
  - the 21x21x11 50 m cube array is recentered around the pose and the
    5x5x3 neighborhood gathered as the matching target (:313-538)
  - inputs downsampled 0.4 m corners / 0.8 m surfs (:543-551)
  - if the map has >10 corners & >50 surfs (:555): 2 outer passes of
      corners: 5-NN, covariance eigendecomposition, edge accepted if
        lambda_max > 3*lambda_mid, synthetic line points at +-0.1*dir
        (:578-622)
      surfs: 5-NN plane fit A n = -1, accepted if all |n.p+d| <= 0.2
        (:649-686)
    each followed by Ceres DENSE_QR <=4 iters, Huber(0.1) (:713-721)
  - transformUpdate: map_correction = refined o odom^-1 (:149-153,735)
  - inputs inserted at the refined pose; touched cubes re-voxel-filtered
    (:737-802)

TPU design (SURVEY.md §7): the cube array becomes a fixed-capacity
voxel-deduplicated point map windowed around the pose — functionally the
5x5x3 gather (recentering is an index no-op: eviction by coordinate mask).
Matching targets are additionally pre-compacted to the sensor-range
neighborhood so the brute-force 5-NN distance work stays proportional to
what a KD-tree would touch. Eigen/QR per-point solves become batched
closed-form fits (ops.fit).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scaloam_tpu.config import SlamConfig
from scaloam_tpu.ops import fit, gn, residuals, se3, voxel
from scaloam_tpu.types import FeatureCloud, Pose


class MapCloud(NamedTuple):
    xyz: jax.Array  # [C, 3]
    mask: jax.Array  # [C]


class MappingState(NamedTuple):
    corner_map: MapCloud
    surf_map: MapCloud
    correction: Pose  # wmap_T_wodom (transformIncremental)
    pose: Pose  # last refined map pose (aft_mapped)
    frame_idx: jax.Array


class MappingOutput(NamedTuple):
    pose: Pose  # refined world pose ("/aft_mapped_to_init")
    correction: Pose
    n_corner_corr: jax.Array
    n_surf_corr: jax.Array
    map_corner_count: jax.Array
    map_surf_count: jax.Array


def init_state(cfg: SlamConfig) -> MappingState:
    m = cfg.mapping
    return MappingState(
        corner_map=MapCloud(
            jnp.zeros((m.max_corner_map, 3), jnp.float32),
            jnp.zeros((m.max_corner_map,), bool),
        ),
        surf_map=MapCloud(
            jnp.zeros((m.max_surf_map, 3), jnp.float32),
            jnp.zeros((m.max_surf_map,), bool),
        ),
        correction=Pose.identity(),
        pose=Pose.identity(),
        frame_idx=jnp.array(0, jnp.int32),
    )


def _active_window(cloud: MapCloud, center: jax.Array, radius: float, cap: int) -> MapCloud:
    """Compact map points within `radius` (xy, chebyshev) of the pose —
    the brute-force equivalent of touching only nearby cubes."""
    d = jnp.abs(cloud.xyz[:, :2] - center[None, :2])
    near = cloud.mask & jnp.all(d <= radius, axis=-1)
    m, x = voxel.compact(near, cap, cloud.xyz)
    return MapCloud(xyz=x, mask=m)


def _corner_correspond(pose: Pose, pts: jax.Array, pmask: jax.Array,
                       target: MapCloud, mcfg):
    """5-NN -> covariance eigendecomposition -> synthetic line endpoints
    (:578-622). Returns (a, b, valid)."""
    pw = se3.apply(pose, pts)  # pointAssociateToMap
    d, idx = voxel.knn(pw, pmask, target.xyz, target.mask, k=mcfg.knn)
    nb = target.xyz[idx]  # [N, 5, 3]
    ok_nn = pmask & (d[:, -1] < mcfg.corner_nn_max_dist)  # sqDis[4] < 1.0
    mean, cov = fit.neighborhood_cov(nb)
    vals, vdir = fit.eigh3x3(cov)
    is_edge = vals[:, 2] > mcfg.edge_eig_ratio * vals[:, 1]
    a = mean + 0.1 * vdir
    b = mean - 0.1 * vdir
    return a, b, ok_nn & is_edge


def _surf_correspond(pose: Pose, pts: jax.Array, pmask: jax.Array,
                     target: MapCloud, mcfg):
    """5-NN -> least-squares plane fit -> validity gate (:649-686).
    Returns (unit_norm, neg_d, valid)."""
    pw = se3.apply(pose, pts)
    d, idx = voxel.knn(pw, pmask, target.xyz, target.mask, k=mcfg.knn)
    nb = target.xyz[idx]
    ok_nn = pmask & (d[:, -1] < mcfg.surf_nn_max_dist_sq)
    unit_n, neg_d, ok_fit = fit.fit_plane(nb)
    # plane validity: every neighbor within plane_fit_tol of the plane (:670-680)
    resid = jnp.abs(jnp.einsum("ni,nki->nk", unit_n, nb) + neg_d[:, None])
    planar = jnp.all(resid <= mcfg.plane_fit_tol, axis=-1)
    return unit_n, neg_d, ok_nn & ok_fit & planar


def _merge_into_map(cloud: MapCloud, new_xyz: jax.Array, new_mask: jax.Array,
                    center: jax.Array, res: float, keep_xy: float, keep_z: float,
                    cap: int) -> MapCloud:
    """Insert registered points, evict outside the sliding window, and
    voxel-dedupe at map resolution (the per-cube re-filter, :788-802)."""
    dxy = jnp.abs(cloud.xyz[:, :2] - center[None, :2])
    dz = jnp.abs(cloud.xyz[:, 2] - center[2])
    keep = cloud.mask & jnp.all(dxy <= keep_xy, axis=-1) & (dz <= keep_z)
    allx = jnp.concatenate([cloud.xyz, new_xyz], axis=0)
    allm = jnp.concatenate([keep, new_mask], axis=0)
    # Retain nearest-to-pose voxels first if capacity overflows.
    x, m, _ = voxel.voxel_downsample(allx, allm, res, cap, priority_center=center)
    return MapCloud(xyz=x, mask=m)


@functools.partial(jax.jit, static_argnames=("cfg",))
def mapping_step(
    state: MappingState,
    odom_pose: Pose,
    corner_cloud: FeatureCloud,  # odometry's republished less-sharp
    surf_cloud: FeatureCloud,  # odometry's republished less-flat
    cfg: SlamConfig,
):
    m = cfg.mapping

    # transformAssociateToMap (:143-147)
    prior = se3.compose(state.correction, odom_pose)

    # Downsample inputs (:543-551).
    cin_xyz, cin_mask, _ = voxel.voxel_downsample(
        corner_cloud.xyz, corner_cloud.mask, m.line_resolution, m.max_corner_input
    )
    sin_xyz, sin_mask, _ = voxel.voxel_downsample(
        surf_cloud.xyz, surf_cloud.mask, m.plane_resolution, m.max_surf_input
    )

    # Matching targets: map windows near the pose (sensor range + gate).
    corner_tgt = _active_window(
        state.corner_map, prior.trans, m.match_radius, m.max_corner_match
    )
    surf_tgt = _active_window(
        state.surf_map, prior.trans, m.match_radius, m.max_surf_match
    )

    dense_enough = (
        (jnp.sum(corner_tgt.mask.astype(jnp.int32)) > m.min_corner_map)
        & (jnp.sum(surf_tgt.mask.astype(jnp.int32)) > m.min_surf_map)
    )

    pose = prior
    n_c = jnp.zeros((), jnp.int32)
    n_s = jnp.zeros((), jnp.int32)
    for _ in range(m.outer_iterations):
        a, b, cv = _corner_correspond(
            pose, cin_xyz, cin_mask & dense_enough, corner_tgt, m
        )
        un, nd, sv = _surf_correspond(
            pose, sin_xyz, sin_mask & dense_enough, surf_tgt, m
        )
        n_c = jnp.sum(cv.astype(jnp.int32))
        n_s = jnp.sum(sv.astype(jnp.int32))

        def build(p, a=a, b=b, cv=cv, un=un, nd=nd, sv=sv):
            # Relinearize at p with frozen correspondences (Ceres inner loop).
            return [
                residuals.edge_factors(p, cin_xyz, a, b, cv),
                residuals.plane_norm_factors(p, sin_xyz, un, nd, sv),
            ]

        pose = gn.gauss_newton(pose, build, m.gn_iterations, m.huber_delta)

    # Degenerate guard: with a sparse map keep the prior.
    pose = jax.tree.map(
        lambda a, b: jnp.where(dense_enough, a, b), pose, prior
    )

    # transformUpdate (:149-153)
    correction = se3.compose(pose, se3.inverse(odom_pose))

    # Insert registered inputs (:737-784) + window eviction + re-filter.
    corner_map = _merge_into_map(
        state.corner_map, se3.apply(pose, cin_xyz), cin_mask,
        pose.trans, m.line_resolution, m.window_radius_xy, m.window_radius_z,
        m.max_corner_map,
    )
    surf_map = _merge_into_map(
        state.surf_map, se3.apply(pose, sin_xyz), sin_mask,
        pose.trans, m.plane_resolution, m.window_radius_xy, m.window_radius_z,
        m.max_surf_map,
    )

    new_state = MappingState(
        corner_map=corner_map,
        surf_map=surf_map,
        correction=correction,
        pose=pose,
        frame_idx=state.frame_idx + 1,
    )
    return new_state, MappingOutput(
        pose=pose,
        correction=correction,
        n_corner_corr=n_c,
        n_surf_corr=n_s,
        map_corner_count=jnp.sum(corner_map.mask.astype(jnp.int32)),
        map_surf_count=jnp.sum(surf_map.mask.astype(jnp.int32)),
    )
