"""Tile-width sweep for the ring-constrained surf pass (the odometry
hotspot) and the k=2 knn, plus a variant that carries candidate POINTS
through the scan via one-hot MXU matmuls (no post-scan index gathers)."""

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
from scaloam_tpu.models import odometry as odometry_mod
from scaloam_tpu.ops import correspond, features, residuals, voxel
from scaloam_tpu.types import LidarScan
from scaloam_tpu.utils import synthetic

cfg = config.kitti_hdl64()
ocfg = cfg.odometry
N = 24
n_frames = 3 + N
world = synthetic.make_world(seed=3, n_boxes=60, extent=70.0)
scans, _ = synthetic.simulate_trajectory(
    world, n_frames=n_frames, speed=1.2, radius=40.0,
    n_scans=64, n_azimuth=2048, seed=7,
)
ds = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]
for d in ds:
    jax.block_until_ready(d.xyz)

o_state = odometry_mod.init_state(cfg)
inputs = []
for s in ds:
    feats = features.extract_features(s, cfg)
    inputs.append((o_state, feats))
    o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
_ = np.asarray(o_out.world.trans)

_BIG = np.float32(1e30)


def ring_pass(state, feats, tile):
    flat = feats.flat
    q = residuals.transform_points(state.rel, flat.xyz)
    ts = state.last_surf
    dj2, ij2 = voxel.knn(q, flat.mask, ts.xyz, ts.mask, k=2, tile=8192)
    ring_j = ts.ring[ij2[:, 0]]
    a, b, c, io2 = correspond.ring_constrained_nn2(
        q, flat.mask, ring_j, ij2[:, 0], ts.xyz, ts.mask, ts.ring,
        ocfg.nearby_scan, tile=tile,
    )
    return jnp.sum(a) + jnp.sum(io2)


def ring_pass_pts(state, feats, tile):
    """Point-carrying variant: top-2 same/other POINTS via one-hot matmul
    inside the scan; no indices, no post-scan gathers."""
    flat = feats.flat
    q = residuals.transform_points(state.rel, flat.xyz)
    ts = state.last_surf
    dj2, ij2 = voxel.knn(q, flat.mask, ts.xyz, ts.mask, k=2, tile=8192)
    ring_j = ts.ring[ij2[:, 0]]
    target, tmask, tring = ts.xyz, ts.mask, ts.ring
    exclude_idx = ij2[:, 0]
    n_tiles = target.shape[0] // tile
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    qn = q.shape[0]
    cols = jnp.arange(tile)[None, :]

    def top2pts(d, tgt):
        j1 = jnp.argmin(d, axis=1)
        v1 = jnp.min(d, axis=1)
        h1 = (cols == j1[:, None]).astype(jnp.float32)
        p1 = jnp.dot(h1, tgt, preferred_element_type=jnp.float32)
        dd = jnp.where(cols == j1[:, None], _BIG, d)
        j2 = jnp.argmin(dd, axis=1)
        v2 = jnp.min(dd, axis=1)
        h2 = (cols == j2[:, None]).astype(jnp.float32)
        p2 = jnp.dot(h2, tgt, preferred_element_type=jnp.float32)
        return v1, p1, v2, p2

    def merge(b, v):
        b1d, b1p, b2d, b2p = b
        v1d, v1p, v2d, v2p = v
        t = v1d < b1d
        f1d = jnp.where(t, v1d, b1d)
        f1p = jnp.where(t[:, None], v1p, b1p)
        l1d = jnp.where(t, b1d, v1d)
        l1p = jnp.where(t[:, None], b1p, v1p)
        o2d = jnp.where(t, v2d, b2d)
        o2p = jnp.where(t[:, None], v2p, b2p)
        s = l1d < o2d
        return (
            f1d, f1p, jnp.where(s, l1d, o2d), jnp.where(s[:, None], l1p, o2p)
        )

    def body(carry, i):
        s_, o_ = carry[:4], carry[4:]
        tgt = jax.lax.dynamic_slice_in_dim(target, i * tile, tile, axis=0)
        tm = jax.lax.dynamic_slice_in_dim(tmask, i * tile, tile, axis=0)
        tr = jax.lax.dynamic_slice_in_dim(tring, i * tile, tile, axis=0)
        t2 = jnp.sum(tgt * tgt, axis=-1)[None, :]
        cross = jnp.dot(q, tgt.T, preferred_element_type=jnp.float32)
        d = q2 + t2 - 2.0 * cross
        gidx = i * tile + cols
        dr = tr[None, :] - ring_j[:, None]
        same = (jnp.abs(dr) < 0.5) & (gidx != exclude_idx[:, None])
        other = (jnp.abs(dr) >= 0.5) & (jnp.abs(dr) <= ocfg.nearby_scan)
        base = tm[None, :]
        vs = top2pts(jnp.where(base & same, d, _BIG), tgt)
        vo = top2pts(jnp.where(base & other, d, _BIG), tgt)
        return merge(s_, vs) + merge(o_, vo), None

    z_d = jnp.full((qn,), _BIG)
    z_p = jnp.zeros((qn, 3))
    init = (z_d, z_p, z_d, z_p, z_d, z_p, z_d, z_p)
    out, _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
    return jnp.sum(out[0]) + jnp.sum(out[1]) + jnp.sum(out[5])


variants = {}
for t in (4096, 8192, 16384, 32768):
    variants[f"idx t{t}"] = jax.jit(functools.partial(ring_pass, tile=t))
for t in (4096, 8192, 16384):
    variants[f"pts t{t}"] = jax.jit(functools.partial(ring_pass_pts, tile=t))


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
    print(f"{name:10s}: {dt:6.2f} ms")


for name, fn in variants.items():
    timeit(name, fn)
