"""Honest per-stage attribution by ablation on the REAL chained frame loop
(bench-style): full loop, then loops with stages removed. One process,
nothing else on the TPU."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scaloam_tpu import config
from scaloam_tpu.models import mapping as mapping_mod
from scaloam_tpu.models import odometry as odometry_mod
from scaloam_tpu.ops import features
from scaloam_tpu.types import LidarScan
from scaloam_tpu.utils import synthetic

cfg = config.kitti_hdl64()
n_frames = 12
world = synthetic.make_world(seed=3, n_boxes=60, extent=70.0)
scans, _ = synthetic.simulate_trajectory(
    world, n_frames=n_frames, speed=1.2, radius=40.0,
    n_scans=64, n_azimuth=2048, seed=7,
)
device_scans = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]

o_state = odometry_mod.init_state(cfg)
m_state = mapping_mod.init_state(cfg)
for s in device_scans[:3]:
    feats = features.extract_features(s, cfg)
    o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
    m_state, m_out = mapping_mod.mapping_step(
        m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
    )
jax.block_until_ready(m_out.pose.trans)

N = 30


def loop_full():
    global o_state, m_state
    t0 = time.time()
    for i in range(N):
        s = device_scans[3 + i % (n_frames - 3)]
        feats = features.extract_features(s, cfg)
        o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
        m_state, m_out = mapping_mod.mapping_step(
            m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
        )
    jax.block_until_ready(m_out.pose.trans)
    return (time.time() - t0) / N * 1000


def loop_feat_odo():
    global o_state
    t0 = time.time()
    for i in range(N):
        s = device_scans[3 + i % (n_frames - 3)]
        feats = features.extract_features(s, cfg)
        o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
    jax.block_until_ready(o_out.world.trans)
    return (time.time() - t0) / N * 1000


def loop_feat():
    t0 = time.time()
    for i in range(N):
        s = device_scans[3 + i % (n_frames - 3)]
        feats = features.extract_features(s, cfg)
    jax.block_until_ready(feats.sharp.xyz)
    return (time.time() - t0) / N * 1000


def loop_odo_map():
    # fixed feats; odometry+mapping chained
    global o_state, m_state
    feats = features.extract_features(device_scans[3], cfg)
    jax.block_until_ready(feats.sharp.xyz)
    t0 = time.time()
    for i in range(N):
        o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
        m_state, m_out = mapping_mod.mapping_step(
            m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
        )
    jax.block_until_ready(m_out.pose.trans)
    return (time.time() - t0) / N * 1000


# Run each twice; report the second (steady).
for name, fn in [
    ("full (f+o+m)", loop_full),
    ("feat+odo", loop_feat_odo),
    ("feat only", loop_feat),
    ("odo+map", loop_odo_map),
]:
    fn()
    print(f"{name:14s}: {fn():6.2f} ms/frame")
