"""knn_grid internals: where do the candidate-stage 2.45 ms go, and which
top-k formulation is fastest on this TPU?

Variants (all on the real warmed grids + real downsampled inputs):
  gather   — 8-cell candidate gather only
  topk     — current: gather + lax.top_k + take_along_axis payload gather
  sortk    — gather + one multi-operand lax.sort carrying (x, y, z)
  argmin8  — gather + k iterated argmin + one-hot einsum payload gather
Also dispatch-overhead probes: null with/without the grid state as an arg.
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
from scaloam_tpu.models import odometry as odometry_mod
from scaloam_tpu.ops import features, gridmap, se3, voxel
from scaloam_tpu.ops.gridmap import _flat_idx
from scaloam_tpu.types import LidarScan
from scaloam_tpu.utils import synthetic

cfg = config.kitti_hdl64()
m = cfg.mapping
N = 40
n_frames = 3 + N
world = synthetic.make_world(seed=3, n_boxes=60, extent=70.0)
scans, _ = synthetic.simulate_trajectory(
    world, n_frames=n_frames, speed=1.2, radius=40.0,
    n_scans=64, n_azimuth=2048, seed=7,
)
ds_scans = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]
for d in ds_scans:
    jax.block_until_ready(d.xyz)

o_state = odometry_mod.init_state(cfg)
m_state = mapping_mod.init_state(cfg)


@jax.jit
def prep(state, odom_pose, corner_cloud, surf_cloud):
    prior = se3.compose(state.correction, odom_pose)
    cx, cmk, _ = voxel.voxel_downsample_packed(
        corner_cloud.xyz, corner_cloud.mask, m.line_resolution,
        m.max_corner_input, xy_bits=10, z_bits=9,
    )
    sx, smk, _ = voxel.voxel_downsample_packed(
        surf_cloud.xyz, surf_cloud.mask, m.plane_resolution,
        m.max_surf_input, xy_bits=10, z_bits=9,
    )
    return prior, se3.apply(prior, cx), cmk, se3.apply(prior, sx), smk


inputs = []  # (cw [Qc,3], cmk, sw [Qs,3], smk) world-frame queries
for s in ds_scans:
    feats = features.extract_features(s, cfg)
    o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
    prior, cw, cmk, sw, smk = prep(
        m_state, o_out.world, feats.less_sharp, feats.less_flat
    )
    inputs.append((cw, cmk, sw, smk))
    m_state, m_out = mapping_mod.mapping_step(
        m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
    )
_ = np.asarray(m_out.pose.trans)
cgrid, sgrid = m_state.corner_grid, m_state.surf_grid

K = 8  # candidate superset size (mapping._CAND_K)


def _cells(grid, q):
    reach = 1.0
    lo = jnp.floor((q - reach) / m.cell_size).astype(jnp.int32)
    hi = jnp.floor((q + reach) / m.cell_size).astype(jnp.int32)
    combos = np.array([[a, b, c] for a in (0, 1) for b in (0, 1) for c in (0, 1)])
    cc8 = jnp.where(combos[None, :, :] > 0, hi[:, None, :], lo[:, None, :])
    idx8 = _flat_idx(cc8, m.grid_xy, m.grid_xy, m.grid_z)
    cand = grid.pts[idx8]  # [Q, 8, cap, 3]
    return cand.reshape(q.shape[0], -1, 3)


def _one(fn_c, fn_s, cg, sg, cw, cmk, sw, smk):
    a = fn_c(cg, cw, cmk)
    b = fn_s(sg, sw, smk)
    return jnp.sum(a[0]) + jnp.sum(a[1]) + jnp.sum(b[0]) + jnp.sum(b[1])


def gather_only(grid, q, qm):
    cand = _cells(grid, q)
    d2 = jnp.sum((cand - q[:, None, :]) ** 2, axis=-1)
    return jnp.min(d2, axis=1, keepdims=True), cand[:, :1]


def topk_cur(grid, q, qm):
    cand = _cells(grid, q)
    d2 = jnp.sum((cand - q[:, None, :]) ** 2, axis=-1)
    negd, j = jax.lax.top_k(-d2, K)
    nn = jnp.take_along_axis(cand, j[:, :, None], axis=1)
    return -negd, nn


def sortk(grid, q, qm):
    cand = _cells(grid, q)
    d2 = jnp.sum((cand - q[:, None, :]) ** 2, axis=-1)
    s = jax.lax.sort(
        [d2, cand[..., 0], cand[..., 1], cand[..., 2]], num_keys=1
    )
    nn = jnp.stack([s[1][:, :K], s[2][:, :K], s[3][:, :K]], axis=-1)
    return s[0][:, :K], nn


def argmin8(grid, q, qm):
    cand = _cells(grid, q)
    d2 = jnp.sum((cand - q[:, None, :]) ** 2, axis=-1)  # [Q, M]
    cols = jnp.arange(d2.shape[1])[None, :]
    ds_, nns = [], []
    dd = d2
    for _ in range(K):
        j = jnp.argmin(dd, axis=1)
        hot = cols == j[:, None]
        v = jnp.min(dd, axis=1)
        nb = jnp.einsum(
            "qm,qmc->qc", hot.astype(jnp.float32), cand,
            preferred_element_type=jnp.float32,
        )
        ds_.append(v)
        nns.append(nb)
        dd = jnp.where(hot, np.float32(1e30), dd)
    return jnp.stack(ds_, 1), jnp.stack(nns, 1)


variants = {
    "gather": jax.jit(functools.partial(_one, gather_only, gather_only)),
    "topk": jax.jit(functools.partial(_one, topk_cur, topk_cur)),
    "sortk": jax.jit(functools.partial(_one, sortk, sortk)),
    "argmin8": jax.jit(functools.partial(_one, argmin8, argmin8)),
}


@jax.jit
def null_state(cg, sg, cw, cmk, sw, smk):
    return cw[0, 0] + sw[0, 0] + cg.pts[0, 0, 0] + sg.pts[0, 0, 0]


@jax.jit
def null_nostate(cw, cmk, sw, smk):
    return cw[0, 0] + sw[0, 0]


def timeit(name, call):
    out = call(3)
    _ = np.asarray(out)
    res = []
    half = (N - 1) // 2
    for lo, hi in ((4, 4 + half), (4 + half, 3 + N)):
        t0 = time.time()
        for i in range(lo, hi):
            out = call(i)
        _ = np.asarray(out)
        res.append((time.time() - t0) / (hi - lo) * 1000)
    print(f"{name:10s}: {res[0]:6.2f} / {res[1]:6.2f} ms")


timeit("null+grid", lambda i: null_state(cgrid, sgrid, *inputs[i]))
timeit("null", lambda i: null_nostate(*inputs[i]))
for name, fn in variants.items():
    timeit(name, lambda i, fn=fn: fn(cgrid, sgrid, *inputs[i]))
