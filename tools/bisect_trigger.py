"""Bisect which action permanently degrades later device work.
Usage: python tools/bisect_trigger.py {none,alloc,init,odo,map,odo_uninit}
Times a features-only loop before and after the trigger."""

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
from scaloam_tpu.models import odometry as odometry_mod
from scaloam_tpu.ops import features
from scaloam_tpu.types import LidarScan
from scaloam_tpu.utils import synthetic

mode = sys.argv[1]
cfg = config.kitti_hdl64()
world = synthetic.make_world(seed=3, n_boxes=60, extent=70.0)
scans, _ = synthetic.simulate_trajectory(
    world, n_frames=24, speed=1.2, radius=40.0, n_scans=64, n_azimuth=2048,
    seed=7,
)
ds = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]


def time_feat(scan_slice, label):
    t0 = time.time()
    for s in scan_slice:
        out = features.extract_features(s, cfg)
    jax.block_until_ready(out.sharp.xyz)
    print("%s: %.3f ms/frame" % (label, (time.time() - t0) / len(scan_slice) * 1000))


for s in ds[:3]:
    out = features.extract_features(s, cfg)
jax.block_until_ready(out.sharp.xyz)
time_feat(ds[3:11], "before")

keep = []
if mode == "alloc":
    keep.append(jnp.zeros((294912, 16, 3), jnp.float32) + 1)
    keep.append(jnp.zeros((294912, 8, 3), jnp.float32) + 1)
    jax.block_until_ready(keep[0])
elif mode == "init":
    keep.append(odometry_mod.init_state(cfg))
    keep.append(mapping_mod.init_state(cfg))
    jax.block_until_ready(keep[1].surf_grid.pts)
elif mode == "odo":
    o = odometry_mod.init_state(cfg)
    for s in ds[11:14]:
        f = features.extract_features(s, cfg)
        o, oo = odometry_mod.odometry_step(o, f, cfg)
    jax.block_until_ready(oo.world.trans)
    keep.append(o)
elif mode == "odo_uninit":
    # only the skip branch of the cond executes
    o = odometry_mod.init_state(cfg)
    f = features.extract_features(ds[11], cfg)
    o2, oo = odometry_mod.odometry_step(o, f, cfg)
    jax.block_until_ready(oo.world.trans)
    keep.append(o)  # keep the UNUSED init state; o2 dropped
elif mode == "map":
    from scaloam_tpu.types import Pose
    m = mapping_mod.init_state(cfg)
    for s in ds[11:14]:
        f = features.extract_features(s, cfg)
        m, mo = mapping_mod.mapping_step(
            m, Pose.identity(), f.less_sharp, f.less_flat, cfg
        )
    jax.block_until_ready(mo.pose.trans)
    keep.append(m)

time_feat(ds[14:22], "after " + mode)
