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

TPU design (SURVEY.md §7): the cube array becomes a torus-addressed
voxel-grid map (ops/gridmap.py) — O(1) insert, lazy eviction, and 5-NN as
an 8-neighbor-cell gather, so per-frame cost is O(inputs), independent of
map size. Recentering is an index no-op. Eigen/QR per-point solves are
batched closed-form fits (ops.fit). Density is bounded by occupancy-gated
insertion at the map resolutions (the re-voxel-filter equivalent; keeps
first point per resolution ball instead of the centroid — documented
deviation).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scaloam_tpu.config import SlamConfig
from scaloam_tpu.ops import fit, gn, gridmap, residuals, se3, voxel
from scaloam_tpu.types import FeatureCloud, Pose


class MappingState(NamedTuple):
    corner_grid: gridmap.GridMap
    surf_grid: gridmap.GridMap
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
    n_cells = m.grid_xy * m.grid_xy * m.grid_z
    return MappingState(
        corner_grid=gridmap.init_grid(n_cells, m.corner_cell_cap),
        surf_grid=gridmap.init_grid(n_cells, m.surf_cell_cap),
        correction=Pose.identity(),
        pose=Pose.identity(),
        frame_idx=jnp.array(0, jnp.int32),
    )


_CAND_K = 8  # cached candidate superset per query (re-ranked each pass)


def _candidates(pose: Pose, pts: jax.Array, pmask: jax.Array,
                grid: gridmap.GridMap, mcfg) -> jax.Array:
    """One grid k-NN gather at the given pose, returning a top-8 candidate
    superset [Q, 8, 3]. The expensive cell gather + distance sweep runs ONCE
    per frame; each outer association pass re-ranks these 8 at its updated
    pose (_rerank). The pose moves millimeters between passes, so the top-8
    at the prior pose contains the top-5 at the refined pose in all but
    pathological cases (deviation from the reference's full kd-tree
    re-search per pass, src/laserMapping.cpp:563-728; ATE-validated)."""
    pw = se3.apply(pose, pts)  # pointAssociateToMap
    _, nb = gridmap.knn_grid(
        grid, pw, pmask, mcfg.grid_xy, mcfg.grid_xy, mcfg.grid_z,
        mcfg.cell_size, reach=1.0, k=max(_CAND_K, mcfg.knn),
    )
    return nb


def _rerank(pose: Pose, pts: jax.Array, nb8: jax.Array, k: int):
    """Exact k-NN among the cached candidates at the current pose.
    Empty/stale candidate slots sit at the far sentinel (ops/gridmap.py),
    so they rank last with no masks. Returns (d [Q,k] ascending, nb [Q,k,3])."""
    pw = se3.apply(pose, pts)
    d8 = jnp.sum((nb8 - pw[:, None, :]) ** 2, axis=-1)  # [Q, 8]
    return voxel.argmin_topk(d8, k, nb8)


def _corner_correspond(pose: Pose, pts: jax.Array, pmask: jax.Array,
                       nb8: jax.Array, mcfg):
    """5-NN -> covariance eigendecomposition -> synthetic line endpoints
    (:578-622). Returns (a, b, valid)."""
    d, nb = _rerank(pose, pts, nb8, mcfg.knn)
    ok_nn = pmask & (d[:, -1] < mcfg.corner_nn_max_dist)  # sqDis[4] < 1.0
    mean, cov = fit.neighborhood_cov(nb)
    vals, vdir = fit.eigh3x3(cov)
    is_edge = vals[:, 2] > mcfg.edge_eig_ratio * vals[:, 1]
    a = mean + 0.1 * vdir
    b = mean - 0.1 * vdir
    return a, b, ok_nn & is_edge


def _surf_correspond(pose: Pose, pts: jax.Array, pmask: jax.Array,
                     nb8: jax.Array, mcfg):
    """5-NN -> least-squares plane fit -> validity gate (:649-686).
    Returns (unit_norm, neg_d, valid)."""
    d, nb = _rerank(pose, pts, nb8, mcfg.knn)
    ok_nn = pmask & (d[:, -1] < mcfg.surf_nn_max_dist_sq)
    unit_n, neg_d, ok_fit = fit.fit_plane(nb)
    # plane validity: every neighbor within plane_fit_tol of the plane (:670-680)
    resid = jnp.abs(jnp.einsum("ni,nki->nk", unit_n, nb) + neg_d[:, None])
    planar = jnp.all(resid <= mcfg.plane_fit_tol, axis=-1)
    return unit_n, neg_d, ok_nn & ok_fit & planar


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
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

    # Downsample inputs (:543-551). Packed single-sort fast path; inputs are
    # sensor-local clouds so +-2^9 cells cover them at these resolutions.
    cin_xyz, cin_mask, _ = voxel.voxel_downsample_packed(
        corner_cloud.xyz, corner_cloud.mask, m.line_resolution,
        m.max_corner_input, xy_bits=10, z_bits=9,
    )
    sin_xyz, sin_mask, _ = voxel.voxel_downsample_packed(
        surf_cloud.xyz, surf_cloud.mask, m.plane_resolution,
        m.max_surf_input, xy_bits=10, z_bits=9,
    )

    dense_enough = (
        (state.corner_grid.total > m.min_corner_map)
        & (state.surf_grid.total > m.min_surf_map)
    )

    pose = prior
    n_c = jnp.zeros((), jnp.int32)
    n_s = jnp.zeros((), jnp.int32)
    cin_T, sin_T = cin_xyz.T, sin_xyz.T
    nb8_c = _candidates(prior, cin_xyz, cin_mask & dense_enough,
                        state.corner_grid, m)
    nb8_s = _candidates(prior, sin_xyz, sin_mask & dense_enough,
                        state.surf_grid, m)
    for _ in range(m.outer_iterations):
        a, b, cv = _corner_correspond(
            pose, cin_xyz, cin_mask & dense_enough, nb8_c, m
        )
        un, nd, sv = _surf_correspond(
            pose, sin_xyz, sin_mask & dense_enough, nb8_s, m
        )
        n_c = jnp.sum(cv.astype(jnp.int32))
        n_s = jnp.sum(sv.astype(jnp.int32))

        # SoA ([3, n]) factor data: transposed once per pass, reused by all
        # GN iterations (lane-efficient — see residuals.py FactorSetT); the
        # pose-independent edge half is prepared once per pass.
        aT, bT, unT = a.T, b.T, un.T
        prep_e = residuals.edge_prep_T(cin_T, aT, bT, cv)

        def build(p, prep_e=prep_e, unT=unT, nd=nd, sv=sv):
            # Relinearize at p with frozen correspondences (Ceres inner loop).
            return [
                residuals.edge_factors_from_prep(p, prep_e),
                residuals.plane_norm_factors_T(p, sin_T, unT, nd, sv),
            ]

        pose = gn.gauss_newton(pose, build, m.gn_iterations, m.huber_delta)

    # Degenerate guard: with a sparse map keep the prior.
    pose = jax.tree.map(
        lambda a_, b_: jnp.where(dense_enough, a_, b_), pose, prior
    )

    # transformUpdate (:149-153)
    correction = se3.compose(pose, se3.inverse(odom_pose))

    # Insert registered inputs (:737-784); occupancy dedup is the per-cube
    # re-voxel-filter; torus staleness is the recenter/evict.
    corner_grid = gridmap.insert(
        state.corner_grid, se3.apply(pose, cin_xyz), cin_mask,
        m.grid_xy, m.grid_xy, m.grid_z, m.cell_size, m.line_resolution,
    )
    surf_grid = gridmap.insert(
        state.surf_grid, se3.apply(pose, sin_xyz), sin_mask,
        m.grid_xy, m.grid_xy, m.grid_z, m.cell_size, m.plane_resolution,
    )

    new_state = MappingState(
        corner_grid=corner_grid,
        surf_grid=surf_grid,
        correction=correction,
        pose=pose,
        frame_idx=state.frame_idx + 1,
    )
    return new_state, MappingOutput(
        pose=pose,
        correction=correction,
        n_corner_corr=n_c,
        n_surf_corr=n_s,
        map_corner_count=corner_grid.total,
        map_surf_count=surf_grid.total,
    )


def map_points(state: MappingState, cfg: SlamConfig):
    """Flattened (corner, surf) map clouds for viz/artifacts
    (the /laser_cloud_surround and /laser_cloud_map publications,
    src/laserMapping.cpp:805-838)."""
    m = cfg.mapping
    cx, cm = gridmap.extract_points(state.corner_grid, m.max_corner_map)
    sx, sm = gridmap.extract_points(state.surf_grid, m.max_surf_map)
    return (cx, cm), (sx, sm)
