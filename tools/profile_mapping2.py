"""Mapping sub-stage attribution by IN-JIT ablation (replaces the noisy
prefix-variant harness in profile_mapping.py, whose per-call dispatch
overhead on the big state pytree swamped the sub-stage deltas).

Each variant is the REAL mapping_step with one piece disabled, chained
over never-repeated frames exactly like bench.py; the piece's cost is the
delta from the full step. All variants keep the same signature and return
a chainable state (CLAUDE.md measurement traps apply: distinct inputs,
np.asarray-drained timed regions, best-of-3).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

from scaloam_tpu import config
from scaloam_tpu.models import mapping as mapping_mod
from scaloam_tpu.models.mapping import (
    MappingState, MappingOutput, _candidates, _corner_correspond,
    _surf_correspond,
)
from scaloam_tpu.models import odometry as odometry_mod
from scaloam_tpu.ops import features, gn, gridmap, residuals, se3, voxel
from scaloam_tpu.types import LidarScan
from scaloam_tpu.utils import synthetic

cfg = config.kitti_hdl64()
m = cfg.mapping
N = 30
n_frames = 3 + 12 * N

from tools.scan_cache import get_scans

scans = get_scans(n_frames)
ds_scans = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]
for d in ds_scans:
    jax.block_until_ready(d.xyz)

# Pre-compute odometry outputs (mapping inputs) for every frame.
o_state = odometry_mod.init_state(cfg)
inputs = []
m_warm = mapping_mod.init_state(cfg)
for s in ds_scans:
    feats = features.extract_features(s, cfg)
    o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
    inputs.append((o_out.world, feats.less_sharp, feats.less_flat))
for w, c, s_ in inputs[:3]:
    m_warm, m_out = mapping_mod.mapping_step(m_warm, w, c, s_, cfg)
_ = np.asarray(m_out.pose.trans)
warm_template = m_warm  # a populated map to start every variant from


def make_step(skip=()):  # pieces: "ds", "cand", "gn", "insert"
    @functools.partial(jax.jit, static_argnames=(), donate_argnums=())
    def step(state, odom_pose, corner_cloud, surf_cloud):
        prior = se3.compose(state.correction, odom_pose)
        if "ds" in skip:
            cin_xyz = corner_cloud.xyz[: m.max_corner_input]
            cin_mask = corner_cloud.mask[: m.max_corner_input]
            sin_xyz = surf_cloud.xyz[: m.max_surf_input]
            sin_mask = surf_cloud.mask[: m.max_surf_input]
        else:
            cin_xyz, cin_mask, _ = voxel.voxel_downsample_packed(
                corner_cloud.xyz, corner_cloud.mask, m.line_resolution,
                m.max_corner_input, xy_bits=10, z_bits=9,
            )
            sin_xyz, sin_mask, _ = voxel.voxel_downsample_packed(
                surf_cloud.xyz, surf_cloud.mask, m.plane_resolution,
                m.max_surf_input, xy_bits=10, z_bits=9,
            )
        dense = (
            (state.corner_grid.total > m.min_corner_map)
            & (state.surf_grid.total > m.min_surf_map)
        )
        pose = prior
        if "cand" not in skip:
            nb8_c = _candidates(prior, cin_xyz, cin_mask & dense,
                                state.corner_grid, m)
            nb8_s = _candidates(prior, sin_xyz, sin_mask & dense,
                                state.surf_grid, m)
            if "gn" not in skip:
                cin_T, sin_T = cin_xyz.T, sin_xyz.T
                for _ in range(m.outer_iterations):
                    a, b, cv = _corner_correspond(
                        pose, cin_xyz, cin_mask & dense, nb8_c, m)
                    un, nd, sv = _surf_correspond(
                        pose, sin_xyz, sin_mask & dense, nb8_s, m)
                    aT, bT, unT = a.T, b.T, un.T

                    def build(p, aT=aT, bT=bT, cv=cv, unT=unT, nd=nd, sv=sv,
                              cin_T=cin_T, sin_T=sin_T):
                        return [
                            residuals.edge_factors_T(p, cin_T, aT, bT, cv),
                            residuals.plane_norm_factors_T(p, sin_T, unT, nd, sv),
                        ]

                    pose = gn.gauss_newton(pose, build, m.gn_iterations,
                                           m.huber_delta)
            else:
                # consume the candidates so they aren't DCE'd
                pose = pose._replace(
                    trans=pose.trans + 0.0 * (nb8_c[0, 0] + nb8_s[0, 0])
                )
        pose = jax.tree.map(
            lambda a_, b_: jnp.where(dense, a_, b_), pose, prior
        )
        correction = se3.compose(pose, se3.inverse(odom_pose))
        if "insert" in skip:
            cg, sg = state.corner_grid, state.surf_grid
        else:
            cg = gridmap.insert(
                state.corner_grid, se3.apply(pose, cin_xyz), cin_mask,
                m.grid_xy, m.grid_xy, m.grid_z, m.cell_size, m.line_resolution,
            )
            sg = gridmap.insert(
                state.surf_grid, se3.apply(pose, sin_xyz), sin_mask,
                m.grid_xy, m.grid_xy, m.grid_z, m.cell_size, m.plane_resolution,
            )
        return MappingState(cg, sg, correction, pose, state.frame_idx + 1)

    return step


VARIANTS = [
    ("full", ()),
    ("-insert", ("insert",)),
    ("-gn", ("gn",)),
    ("-cand-gn", ("cand", "gn")),
    ("-ds(all)", ("ds", "cand", "gn", "insert")),
    ("null", ("noop",)),
]

_next = [3]


def take(n):
    i = _next[0]
    _next[0] = i + n
    return inputs[i : i + n]


results = {}
for name, skip in VARIANTS:
    if "noop" in skip:
        @jax.jit
        def step(state, odom_pose, corner_cloud, surf_cloud):
            return state._replace(
                pose=odom_pose, frame_idx=state.frame_idx + 1
            )
    else:
        step = make_step(skip)
    best = float("inf")
    for p in range(2):
        st = warm_template
        batch = take(N)
        # warm/compile on the first input of the batch
        st = step(st, *batch[0])
        _ = np.asarray(st.pose.trans)
        t0 = time.time()
        for w, c, s_ in batch[1:]:
            st = step(st, w, c, s_)
        _ = np.asarray(st.pose.trans)
        best = min(best, (time.time() - t0) / (N - 1) * 1e3)
    results[name] = best
    print(f"{name:10s}: {best:6.2f} ms/frame", flush=True)

full = results["full"]
print("\ndeltas (cost of each piece):")
print(f"  insert           : {full - results['-insert']:.2f} ms")
print(f"  correspond+GN    : {full - results['-gn']:.2f} ms")
print(f"  candidate gather : {results['-gn'] - results['-cand-gn']:.2f} ms")
print(f"  downsample       : {results['-cand-gn'] - results['-ds(all)']:.2f} ms")
print(f"  base (dispatch)  : {results['null']:.2f} ms")
