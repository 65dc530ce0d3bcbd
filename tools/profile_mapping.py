"""Sub-stage attribution inside mapping_step: downsample -> candidate
gather (knn_grid) -> correspond+GN passes -> insert. Each prefix jitted
separately and timed over per-frame varying inputs against a fixed warmed
map state (np.asarray drains around every timed region; unique inputs
within each variant's timing pass — reuse across variants is fine, the
result-dedup path is per-executable).
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

from scaloam_tpu import config
from scaloam_tpu.models import mapping as mapping_mod
from scaloam_tpu.models.mapping import _candidates, _corner_correspond, _surf_correspond
from scaloam_tpu.models import odometry as odometry_mod
from scaloam_tpu.ops import features, gn, gridmap, residuals, se3, voxel
from scaloam_tpu.types import LidarScan
from scaloam_tpu.utils import synthetic

cfg = config.kitti_hdl64()
m = cfg.mapping
N = 40
n_frames = 3 + N
from tools.scan_cache import get_scans

scans = get_scans(n_frames)
ds_scans = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]
for d in ds_scans:
    jax.block_until_ready(d.xyz)

o_state = odometry_mod.init_state(cfg)
m_state = mapping_mod.init_state(cfg)
inputs = []  # (odom_pose, corner_cloud, surf_cloud)
for s in ds_scans:
    feats = features.extract_features(s, cfg)
    o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
    inputs.append((o_out.world, feats.less_sharp, feats.less_flat))
    m_state, m_out = mapping_mod.mapping_step(
        m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
    )
_ = np.asarray(m_out.pose.trans)
state = m_state


def _ds_corner(corner_cloud):
    return voxel.voxel_downsample_packed(
        corner_cloud.xyz, corner_cloud.mask, m.line_resolution,
        m.max_corner_input, xy_bits=10, z_bits=9,
    )


def _ds_surf(surf_cloud):
    return voxel.voxel_downsample_packed(
        surf_cloud.xyz, surf_cloud.mask, m.plane_resolution,
        m.max_surf_input, xy_bits=10, z_bits=9,
    )


@jax.jit
def v_null(state, odom_pose, corner_cloud, surf_cloud):
    return odom_pose.trans[0] + corner_cloud.xyz[0, 0] + surf_cloud.xyz[0, 0]


@jax.jit
def v_ds_c(state, odom_pose, corner_cloud, surf_cloud):
    cx, cmk, _ = _ds_corner(corner_cloud)
    return jnp.sum(cx)


@jax.jit
def v_ds_s(state, odom_pose, corner_cloud, surf_cloud):
    sx, smk, _ = _ds_surf(surf_cloud)
    return jnp.sum(sx)


@jax.jit
def v_ds(state, odom_pose, corner_cloud, surf_cloud):
    cx, cmk, _ = _ds_corner(corner_cloud)
    sx, smk, _ = _ds_surf(surf_cloud)
    return jnp.sum(cx) + jnp.sum(sx)


@jax.jit
def v_cand(state, odom_pose, corner_cloud, surf_cloud):
    prior = se3.compose(state.correction, odom_pose)
    cx, cmk, _ = _ds_corner(corner_cloud)
    sx, smk, _ = _ds_surf(surf_cloud)
    nb8_c = _candidates(prior, cx, cmk, state.corner_grid, m)
    nb8_s = _candidates(prior, sx, smk, state.surf_grid, m)
    return jnp.sum(nb8_c) + jnp.sum(nb8_s)


@jax.jit
def v_corr(state, odom_pose, corner_cloud, surf_cloud):
    prior = se3.compose(state.correction, odom_pose)
    cx, cmk, _ = _ds_corner(corner_cloud)
    sx, smk, _ = _ds_surf(surf_cloud)
    nb8_c = _candidates(prior, cx, cmk, state.corner_grid, m)
    nb8_s = _candidates(prior, sx, smk, state.surf_grid, m)
    pose = prior
    cin_T, sin_T = cx.T, sx.T
    for _ in range(m.outer_iterations):
        a, b, cv = _corner_correspond(pose, cx, cmk, nb8_c, m)
        un, nd, sv = _surf_correspond(pose, sx, smk, nb8_s, m)
        aT, bT, unT = a.T, b.T, un.T

        def build(p, aT=aT, bT=bT, cv=cv, unT=unT, nd=nd, sv=sv):
            return [
                residuals.edge_factors_T(p, cin_T, aT, bT, cv),
                residuals.plane_norm_factors_T(p, sin_T, unT, nd, sv),
            ]

        pose = gn.gauss_newton(pose, build, m.gn_iterations, m.huber_delta)
    return pose.trans[0]


@jax.jit
def v_ins(state, odom_pose, corner_cloud, surf_cloud):
    prior = se3.compose(state.correction, odom_pose)
    cx, cmk, _ = _ds_corner(corner_cloud)
    sx, smk, _ = _ds_surf(surf_cloud)
    cg = gridmap.insert(
        state.corner_grid, se3.apply(prior, cx), cmk,
        m.grid_xy, m.grid_xy, m.grid_z, m.cell_size, m.line_resolution,
    )
    sg = gridmap.insert(
        state.surf_grid, se3.apply(prior, sx), smk,
        m.grid_xy, m.grid_xy, m.grid_z, m.cell_size, m.plane_resolution,
    )
    return cg.total + sg.total


def timeit(name, fn):
    out = fn(state, *inputs[3])
    _ = np.asarray(out)
    res = []
    half = (N - 1) // 2
    for lo, hi in ((4, 4 + half), (4 + half, 3 + N)):
        t0 = time.time()
        for i in range(lo, hi):
            out = fn(state, *inputs[i])
        _ = np.asarray(out)
        res.append((time.time() - t0) / (hi - lo) * 1000)
    print(f"{name:10s}: {res[0]:6.2f} / {res[1]:6.2f} ms")


timeit("null", v_null)
timeit("ds corner", v_ds_c)
timeit("ds surf", v_ds_s)
timeit("ds both", v_ds)
timeit("+cand", v_cand)
timeit("+corr+gn", v_corr)
timeit("ds+insert", v_ins)
