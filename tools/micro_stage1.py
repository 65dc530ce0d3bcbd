"""Stage-1 (ring id + relative time) layout experiment: [n,3] AoS math as
written vs one transpose to [3,n] SoA rows. Honest timing (unique inputs,
np.asarray drains)."""

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
from scaloam_tpu.types import LidarScan
from scaloam_tpu.utils import synthetic

cfg = config.kitti_hdl64()
sensor = cfg.sensor
S = sensor.n_scans
world = synthetic.make_world(seed=3, n_boxes=60, extent=70.0)
scans, _ = synthetic.simulate_trajectory(
    world, n_frames=25, speed=1.2, radius=40.0, n_scans=64, n_azimuth=2048,
    seed=7,
)
dscans = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]
for d in dscans:
    jax.block_until_ready(d.xyz)
NS = len(dscans)


@jax.jit
def cur(xyz, mask):
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    rng_sq = jnp.sum(xyz * xyz, axis=-1)
    valid = mask & finite & (rng_sq >= sensor.minimum_range**2)
    ring, ring_ok = F._ring_id(xyz, sensor.lidar_type, S)
    rel = F._azimuth_scalars(xyz, valid, valid & ring_ok)  # scalars (r4 API)
    return jnp.sum(ring) + jnp.sum(rel) + jnp.sum(valid)


def _ring_id_T(x, y, z, n_scans):
    angle = jnp.degrees(jnp.arctan2(z, jnp.sqrt(x * x + y * y)))
    trunc = lambda v: jnp.trunc(v).astype(jnp.int32)
    upper = trunc((2.0 - angle) * 3.0 + 0.5)
    lower = n_scans // 2 + trunc((-8.83 - angle) * 2.0 + 0.5)
    sid = jnp.where(angle >= -8.83, upper, lower)
    ok = (angle <= 2.0) & (angle >= -24.33) & (sid >= 0) & (sid <= 50)
    return jnp.clip(sid, 0, n_scans - 1), ok


def _relative_time_T(x, y, valid, flip_valid):
    n = x.shape[0]
    pi = jnp.pi
    ori_raw = -jnp.arctan2(y, x)
    first = jnp.argmax(valid)
    last = n - 1 - jnp.argmax(valid[::-1])
    start_ori = ori_raw[first]
    end_ori = ori_raw[last] + 2 * pi
    d = end_ori - start_ori
    end_ori = jnp.where(
        d > 3 * pi, end_ori - 2 * pi, jnp.where(d < pi, end_ori + 2 * pi, end_ori)
    )
    o1 = ori_raw
    o1 = jnp.where(o1 < start_ori - pi / 2, o1 + 2 * pi, o1)
    o1 = jnp.where(o1 > start_ori + 3 * pi / 2, o1 - 2 * pi, o1)
    flip = (o1 - start_ori > pi) & flip_valid
    first_flip = jnp.argmax(flip)
    half_passed = (jnp.arange(n) > first_flip) & jnp.any(flip)
    o2 = ori_raw + 2 * pi
    o2 = jnp.where(o2 < end_ori - 3 * pi / 2, o2 + 2 * pi, o2)
    o2 = jnp.where(o2 > end_ori + pi / 2, o2 - 2 * pi, o2)
    ori = jnp.where(half_passed, o2, o1)
    return (ori - start_ori) / (end_ori - start_ori)


@jax.jit
def soa(xyz, mask):
    xT = xyz.T  # [3, n]
    x, y, z = xT[0], xT[1], xT[2]
    finite = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z)
    rng_sq = x * x + y * y + z * z
    valid = mask & finite & (rng_sq >= sensor.minimum_range**2)
    ring, ring_ok = _ring_id_T(x, y, z, S)
    rel = _relative_time_T(x, y, valid, valid & ring_ok)
    return jnp.sum(ring) + jnp.sum(rel) + jnp.sum(valid)


def timeit(name, fn):
    out = fn(dscans[0].xyz, dscans[0].mask)
    _ = np.asarray(out)
    for lo, hi in ((1, 13), (13, 25)):
        t0 = time.time()
        for i in range(lo, hi):
            out = fn(dscans[i].xyz, dscans[i].mask)
        _ = np.asarray(out)
        dt = (time.time() - t0) / (hi - lo) * 1000
    print(f"{name:6s}: {dt:6.2f} ms")


# cross-check equality first
a = np.asarray(cur(dscans[1].xyz, dscans[1].mask))
b = np.asarray(soa(dscans[1].xyz, dscans[1].mask))
print("checksums:", a, b)
timeit("cur", cur)
timeit("soa", soa)
