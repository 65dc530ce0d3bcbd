"""In-kernel attribution for odometry_step via prefix variants (same
method as profile_features3): knn sweeps, ring-constrained passes,
re-rank+GN. Honest methodology per CLAUDE.md.
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
from scaloam_tpu.models import odometry as odometry_mod
from scaloam_tpu.models.odometry import _associate, _solve, _sweep_candidates
from scaloam_tpu.ops import correspond, features, residuals, voxel
from scaloam_tpu.types import LidarScan
from scaloam_tpu.utils import synthetic

cfg = config.kitti_hdl64()
ocfg = cfg.odometry
N = 24
n_frames = 3 + N
from tools.scan_cache import get_scans

scans = get_scans(n_frames)
ds = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]
for d in ds:
    jax.block_until_ready(d.xyz)

o_state = odometry_mod.init_state(cfg)
inputs = []  # (state_snapshot, feats)
for s in ds:
    feats = features.extract_features(s, cfg)
    inputs.append((o_state, feats))
    o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
_ = np.asarray(o_out.world.trans)


@jax.jit
def v_null(state, feats):
    return state.rel.trans[0] + feats.sharp.xyz[0, 0]


@jax.jit
def v_knn_c(state, feats):
    sharp = feats.sharp
    q = residuals.transform_points(state.rel, sharp.xyz)
    tc = state.last_corner
    dj2, ij2 = voxel.knn(q, sharp.mask, tc.xyz, tc.mask, k=2, tile=8192)
    return jnp.sum(dj2) + jnp.sum(ij2)


@jax.jit
def v_knn_s(state, feats):
    flat = feats.flat
    q = residuals.transform_points(state.rel, flat.xyz)
    ts = state.last_surf
    dj2, ij2 = voxel.knn(q, flat.mask, ts.xyz, ts.mask, k=2, tile=8192)
    return jnp.sum(dj2) + jnp.sum(ij2)


@jax.jit
def v_ring_c(state, feats):
    sharp = feats.sharp
    q = residuals.transform_points(state.rel, sharp.xyz)
    tc = state.last_corner
    dj2, ij2 = voxel.knn(q, sharp.mask, tc.xyz, tc.mask, k=2, tile=8192)
    ring_j = tc.ring[ij2[:, 0]]
    a, b, c, io2 = correspond.ring_constrained_nn2(
        q, sharp.mask, ring_j, ij2[:, 0], tc.xyz, tc.mask, tc.ring,
        ocfg.nearby_scan, tile=4096,
    )
    return jnp.sum(a) + jnp.sum(io2)


@jax.jit
def v_ring_s(state, feats):
    flat = feats.flat
    q = residuals.transform_points(state.rel, flat.xyz)
    ts = state.last_surf
    dj2, ij2 = voxel.knn(q, flat.mask, ts.xyz, ts.mask, k=2, tile=8192)
    ring_j = ts.ring[ij2[:, 0]]
    a, b, c, io2 = correspond.ring_constrained_nn2(
        q, flat.mask, ring_j, ij2[:, 0], ts.xyz, ts.mask, ts.ring,
        ocfg.nearby_scan, tile=4096,
    )
    return jnp.sum(a) + jnp.sum(io2)


@jax.jit
def v_sweep(state, feats):
    cc, sc = _sweep_candidates(state.rel, feats, state, cfg)
    return sum(jnp.sum(x) for x in cc) + sum(jnp.sum(x) for x in sc)


@jax.jit
def v_full_solve(state, feats):
    rel = state.rel
    cc, sc = _sweep_candidates(rel, feats, state, cfg)
    for _ in range(ocfg.outer_iterations):
        cd, sd = _associate(rel, feats, cc, sc, cfg)
        rel = _solve(rel, cd, sd, cfg)
    return rel.trans[0]


def timeit(name, fn):
    out = fn(*inputs[3])
    _ = np.asarray(out)
    half = (N - 1) // 2
    for lo, hi in ((4, 4 + half), (4 + half, 3 + N)):
        t0 = time.time()
        for i in range(lo, hi):
            out = fn(*inputs[i])
        _ = np.asarray(out)
        dt = (time.time() - t0) / (hi - lo) * 1000
    print(f"{name:12s}: {dt:6.2f} ms")


timeit("null", v_null)
timeit("knn corner", v_knn_c)
timeit("knn surf", v_knn_s)
timeit("+ring corner", v_ring_c)
timeit("+ring surf", v_ring_s)
timeit("sweep all", v_sweep)
timeit("full solve", v_full_solve)
