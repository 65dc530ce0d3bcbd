"""IN-KERNEL attribution for extract_features: compile prefixes of the full
kernel (later stages dropped, tiny checksum outputs) and read stage costs
from the deltas. Avoids the per-executable call-overhead distortion of
profile_features2 (each standalone sub-stage pays ~1.4 ms of dispatch/sync
floor; prefix deltas cancel it).
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
from scaloam_tpu.ops import features as F
from scaloam_tpu.ops import voxel
from scaloam_tpu.types import LidarScan
from scaloam_tpu.utils import synthetic

cfg = config.kitti_hdl64()
sensor, feat = cfg.sensor, cfg.features
S, W = sensor.n_scans, sensor.max_points_per_ring
NSUB = feat.n_subregions
world = synthetic.make_world(seed=3, n_boxes=60, extent=70.0)
scans, _ = synthetic.simulate_trajectory(
    world, n_frames=25, speed=1.2, radius=40.0, n_scans=64, n_azimuth=2048,
    seed=7,
)
dscans = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]
for d in dscans:
    jax.block_until_ready(d.xyz)
NS = len(dscans)
jj = np.arange(W)[None, :]


def _stage123(xyz, mask):
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    rng_sq = jnp.sum(xyz * xyz, axis=-1)
    valid = mask & finite & (rng_sq >= sensor.minimum_range**2)
    ring, ring_ok = F._ring_id(xyz, sensor.lidar_type, S)
    rel = F._azimuth_scalars(xyz, valid, valid & ring_ok)  # scalars (r4 API)
    return ring, rel, valid & ring_ok


def _sel(ri):
    img, count = ri.xyz, ri.count
    curv = F._curvature(img)
    left_ext, right_ext = F._suppression_reach(
        img, count, feat.neighbor_suppress_radius, feat.neighbor_suppress_gap_sq
    )
    L = count - 11
    j_sub = jnp.arange(NSUB)
    sp = 5 + (L[:, None] * j_sub[None, :]) // NSUB
    ep = 5 + (L[:, None] * (j_sub[None, :] + 1)) // NSUB - 1
    ring_sel_ok = L >= NSUB
    eligible = (jj >= 5) & (jj <= (4 + L)[:, None]) & ring_sel_ok[:, None]
    from scaloam_tpu.ops.pallas import selection as psel
    out = psel.select_features(
        curv, left_ext, right_ext, eligible,
        sp.astype(jnp.int32), ep.astype(jnp.int32),
        n_sub=NSUB, n_corner=feat.less_sharp_per_subregion,
        n_flat=feat.flat_per_subregion, curv_thr=feat.curvature_threshold,
    )
    return out, curv, left_ext, right_ext, ring_sel_ok


@jax.jit
def p1_ring(xyz, mask):
    ring, rel, valid = _stage123(xyz, mask)
    return jnp.sum(ring) + jnp.sum(rel) + jnp.sum(valid)


@jax.jit
def p2_image(xyz, mask):
    ring, rel, valid = _stage123(xyz, mask)
    ri = F.build_range_image(xyz, ring, valid, S, W, rel)
    return jnp.sum(ri.count) + ri.xyz[0, 0, 0] + ri.rel_time[0, 0]


@jax.jit
def p3_curv(xyz, mask):
    ring, rel, valid = _stage123(xyz, mask)
    ri = F.build_range_image(xyz, ring, valid, S, W, rel)
    curv = F._curvature(ri.xyz)
    le, re_ = F._suppression_reach(
        ri.xyz, ri.count, feat.neighbor_suppress_radius,
        feat.neighbor_suppress_gap_sq,
    )
    return jnp.sum(curv) + jnp.sum(le) + jnp.sum(re_)


@jax.jit
def p4_select(xyz, mask):
    ring, rel, valid = _stage123(xyz, mask)
    ri = F.build_range_image(xyz, ring, valid, S, W, rel)
    (ci, co, fi, fo, labels), *_ = _sel(ri)
    return jnp.sum(ci) + jnp.sum(co) + jnp.sum(fi) + jnp.sum(fo) + jnp.sum(labels)


@jax.jit
def p5_full(xyz, mask):
    out = F.extract_features(LidarScan(xyz, mask), cfg)
    return (
        out.sharp.xyz[0, 0] + out.less_sharp.xyz[0, 0] + out.flat.xyz[0, 0]
        + out.less_flat.xyz[0, 0] + jnp.sum(out.less_flat.mask)
    )


# assemble minus the less-flat row filter: gate which piece of stage 5 costs
@jax.jit
def p5a_noflat(xyz, mask):
    ring, rel, valid = _stage123(xyz, mask)
    ri = F.build_range_image(xyz, ring, valid, S, W, rel)
    (ci, co, fi, fo, labels), curv, le, re_, ring_sel_ok = _sel(ri)
    img = ri.xyz
    rows3 = jnp.arange(S)[:, None, None]

    def to_cloud(idx, ok, capacity, first_k=None):
        if first_k is not None:
            idx, ok = idx[:, :, :first_k], ok[:, :, :first_k]
        g_xyz = img[rows3, idx].reshape(-1, 3)
        g_ring = jnp.broadcast_to(
            jnp.asarray(np.arange(S, dtype=np.float32))[:, None, None], idx.shape
        ).reshape(-1)
        g_rt = ri.rel_time[rows3, idx].reshape(-1)
        m, x, r, t = voxel.compact(ok.reshape(-1), capacity, g_xyz, g_ring, g_rt)
        return x[0, 0] + r[0] + t[0]

    a = to_cloud(ci, co, feat.max_sharp, first_k=feat.sharp_per_subregion)
    b = to_cloud(ci, co, feat.max_less_sharp)
    c = to_cloud(fi, fo, feat.max_flat)
    return a + b + c


def timecycle(name, fn):
    out = fn(dscans[0].xyz, dscans[0].mask)
    _ = np.asarray(out)
    half = (NS - 1) // 2
    for lo, hi in ((1, 1 + half), (1 + half, NS)):
        t0 = time.time()
        for i in range(lo, hi):
            out = fn(dscans[i].xyz, dscans[i].mask)
        _ = np.asarray(out)
        dt = (time.time() - t0) / (hi - lo) * 1000.0
    print(f"{name:12s}: {dt:6.2f} ms")


timecycle("p1 ring", p1_ring)
timecycle("p2 +image", p2_image)
timecycle("p3 +curv", p3_curv)
timecycle("p4 +select", p4_select)
timecycle("p5a +3clouds", p5a_noflat)
timecycle("p5 full", p5_full)
