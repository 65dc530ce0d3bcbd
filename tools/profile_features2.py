"""Per-sub-stage timing of extract_features with VARYING inputs (repeated
identical calls get deduplicated somewhere in the remote-execution path and
time as pure dispatch — bogus). Every timed call gets a NEVER-seen input,
and timed regions are entered/exited via real np.asarray fetches
(block_until_ready does not drain the execution queue — CLAUDE.md)."""

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
from scaloam_tpu.ops import features as F
from scaloam_tpu.ops import voxel
from scaloam_tpu.types import LidarScan
from scaloam_tpu.utils import synthetic

cfg = config.kitti_hdl64()
sensor, feat = cfg.sensor, cfg.features
S, W = sensor.n_scans, sensor.max_points_per_ring
world = synthetic.make_world(seed=3, n_boxes=60, extent=70.0)
scans, _ = synthetic.simulate_trajectory(
    world, n_frames=25, speed=1.2, radius=40.0, n_scans=64, n_azimuth=2048, seed=7
)
dscans = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]
for d in dscans:
    jax.block_until_ready(d.xyz)
NS = len(dscans)
jj = np.arange(W)[None, :]
NSUB = feat.n_subregions


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.ravel()[0])


def timecycle(fn, inputs):
    # warmup on frame 0; two timed passes over disjoint unique frames,
    # report the second.
    out = fn(*inputs[0])
    _fetch(out)
    half = (NS - 1) // 2
    for lo, hi in ((1, 1 + half), (1 + half, NS)):
        t0 = time.time()
        for i in range(lo, hi):
            out = fn(*inputs[i])
        _fetch(out)
        dt = (time.time() - t0) / (hi - lo) * 1000.0
    return dt


t = timecycle(lambda s: F.extract_features(s, cfg), [(s,) for s in dscans])
print("full extract_features: %.3f ms" % t)


@jax.jit
def stage1(xyz, mask):
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    rng_sq = jnp.sum(xyz * xyz, axis=-1)
    valid = mask & finite & (rng_sq >= sensor.minimum_range**2)
    ring, ring_ok = F._ring_id(xyz, sensor.lidar_type, S)
    rel = F._azimuth_scalars(xyz, valid, valid & ring_ok)  # scalars (r4 API)
    return ring, rel, valid & ring_ok


in1 = [(s.xyz, s.mask) for s in dscans]
print("1 ring+reltime:       %.3f ms" % timecycle(stage1, in1))
r1 = [stage1(*a) for a in in1]


@jax.jit
def stage2(xyz, ring, rel, valid):
    return F.build_range_image(xyz, ring, valid, S, W, rel)


in2 = [(s.xyz, r[0], r[1], r[2]) for s, r in zip(dscans, r1)]
print("2 build_range_image:  %.3f ms" % timecycle(stage2, in2))
r2 = [stage2(*a) for a in in2]


@jax.jit
def stage3(img, count):
    curv = F._curvature(img)
    left_ext, right_ext = F._suppression_reach(
        img, count, feat.neighbor_suppress_radius, feat.neighbor_suppress_gap_sq
    )
    return curv, left_ext, right_ext


in3 = [(ri.xyz, ri.count) for ri in r2]
print("3 curvature+reach:    %.3f ms" % timecycle(stage3, in3))
r3 = [stage3(*a) for a in in3]


@jax.jit
def stage4(curv, left_ext, right_ext, count):
    L = count - 11
    j_sub = jnp.arange(NSUB)
    sp = 5 + (L[:, None] * j_sub[None, :]) // NSUB
    ep = 5 + (L[:, None] * (j_sub[None, :] + 1)) // NSUB - 1
    ring_sel_ok = L >= NSUB
    eligible = (jj >= 5) & (jj <= (4 + L)[:, None]) & ring_sel_ok[:, None]
    from scaloam_tpu.ops.pallas import selection as psel
    return psel.select_features(
        curv, left_ext, right_ext, eligible,
        sp.astype(jnp.int32), ep.astype(jnp.int32),
        n_sub=NSUB, n_corner=feat.less_sharp_per_subregion,
        n_flat=feat.flat_per_subregion, curv_thr=feat.curvature_threshold,
    )


in4 = [(c, l, r, ri.count) for (c, l, r), ri in zip(r3, r2)]
print("4 pallas selection:   %.3f ms" % timecycle(stage4, in4))
r4 = [stage4(*a) for a in in4]


@jax.jit
def stage5(ri, corner_idx, corner_ok, flat_idx, flat_ok, labels, count):
    L = count - 11
    ring_sel_ok = L >= NSUB
    return F._assemble_outputs(
        cfg, ri, ri.xyz, count, corner_idx, corner_ok, flat_idx, flat_ok,
        labels, ring_sel_ok, jnp.asarray(jj), feat.sharp_per_subregion,
    )


in5 = [(ri, a[0], a[1], a[2], a[3], a[4], ri.count) for ri, a in zip(r2, r4)]
print("5 assemble outputs:   %.3f ms" % timecycle(stage5, in5))


@jax.jit
def stage5a(ri, labels, count):
    img = ri.xyz
    L = count - 11
    ring_sel_ok = L >= NSUB
    sub_range = (jj >= 5) & (jj <= (count[:, None] - 7)) & ring_sel_ok[:, None]
    lf_mask = sub_range & ~labels & ri.mask
    return voxel.voxel_downsample_rows(
        img, lf_mask, feat.less_flat_voxel_size, feat.max_less_flat,
        extra=ri.rel_time[:, :, None],
    )


in5a = [(ri, a[4], ri.count) for ri, a in zip(r2, r4)]
print("5a less-flat rows:    %.3f ms" % timecycle(stage5a, in5a))


@jax.jit
def stage5b(ri, corner_idx, corner_ok):
    rows3 = jnp.arange(S)[:, None, None]
    img = ri.xyz
    g_xyz = img[rows3, corner_idx].reshape(-1, 3)
    g_ring = jnp.broadcast_to(
        jnp.asarray(np.arange(S, dtype=np.float32))[:, None, None],
        corner_idx.shape,
    ).reshape(-1)
    g_rt = ri.rel_time[rows3, corner_idx].reshape(-1)
    m, x, r, t = voxel.compact(
        corner_ok.reshape(-1), feat.max_less_sharp, g_xyz, g_ring, g_rt
    )
    return m, x, r, t


in5b = [(ri, a[0], a[1]) for ri, a in zip(r2, r4)]
print("5b less-sharp compact:%.3f ms" % timecycle(stage5b, in5b))
