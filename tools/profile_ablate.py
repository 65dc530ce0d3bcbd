"""Honest per-stage attribution by ablation on the REAL chained frame loop
(bench-style): full loop, then loops with stages removed. One process,
nothing else on the TPU.

Methodology (CLAUDE.md): every timed frame consumes a NEVER-REPEATED scan
(identical input buffers are deduplicated by the remote-execution path),
and every timed region is entered and exited via a real np.asarray fetch
(block_until_ready does not drain the execution queue).
"""

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
N = 30            # frames per timed loop
n_frames = 3 + 8 * N  # warmup + (4 ablations x 2 passes) x N unique scans
from tools.scan_cache import get_scans

scans = get_scans(n_frames)
device_scans = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]
for d in device_scans:
    jax.block_until_ready(d.xyz)

o_state = odometry_mod.init_state(cfg)
m_state = mapping_mod.init_state(cfg)
for s in device_scans[:3]:
    feats = features.extract_features(s, cfg)
    o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
    m_state, m_out = mapping_mod.mapping_step(
        m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
    )
_ = np.asarray(m_out.pose.trans)

_next = [3]


def take(n):
    i = _next[0]
    _next[0] = i + n
    return device_scans[i : i + n]


def loop_full():
    global o_state, m_state
    ds = take(N)
    t0 = time.time()
    for s in ds:
        feats = features.extract_features(s, cfg)
        o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
        m_state, m_out = mapping_mod.mapping_step(
            m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
        )
    _ = np.asarray(m_out.pose.trans)
    return (time.time() - t0) / N * 1000


def loop_feat_odo():
    global o_state
    ds = take(N)
    t0 = time.time()
    for s in ds:
        feats = features.extract_features(s, cfg)
        o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
    _ = np.asarray(o_out.world.trans)
    return (time.time() - t0) / N * 1000


def loop_feat():
    ds = take(N)
    t0 = time.time()
    for s in ds:
        feats = features.extract_features(s, cfg)
    _ = np.asarray(feats.sharp.xyz[0])
    return (time.time() - t0) / N * 1000


def loop_odo_map():
    # fixed feats; odometry+mapping chained (state varies every frame, so
    # repeated feats do not hit the result-dedup path)
    global o_state, m_state
    feats = features.extract_features(take(1)[0], cfg)
    _ = np.asarray(feats.sharp.xyz[0])
    t0 = time.time()
    for i in range(N):
        o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
        m_state, m_out = mapping_mod.mapping_step(
            m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
        )
    _ = np.asarray(m_out.pose.trans)
    return (time.time() - t0) / N * 1000


# Run each twice on fresh scans; report the second (steady).
for name, fn in [
    ("full (f+o+m)", loop_full),
    ("feat+odo", loop_feat_odo),
    ("feat only", loop_feat),
    ("odo+map", loop_odo_map),
]:
    fn()
    print(f"{name:14s}: {fn():6.2f} ms/frame")
