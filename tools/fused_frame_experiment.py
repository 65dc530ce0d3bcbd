"""Measure per-dispatch overhead on the tunneled TPU and compare the
3-executable front-end (features / odometry / mapping) against one fused
jitted frame function."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import functools

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

    # 1. dispatch overhead
    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8, 128))
    tiny(x).block_until_ready()
    t0 = time.time()
    for _ in range(50):
        x = tiny(x)
    x.block_until_ready()
    print(f"tiny dispatch: {(time.time()-t0)/50*1000:.2f} ms/call")

    cfg = config.kitti_hdl64()
    world = synthetic.make_world(seed=3, n_boxes=60, extent=70.0)
    scans, _ = synthetic.simulate_trajectory(
        world, n_frames=6, speed=1.2, radius=40.0,
        n_scans=64, n_azimuth=2048, seed=7,
    )
    device_scans = [
        LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans
    ]

    @functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
    def fused_frame(o_state, m_state, scan, cfg):
        feats = features.extract_features(scan, cfg)
        o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
        m_state, m_out = mapping_mod.mapping_step(
            m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
        )
        return o_state, m_state, m_out.pose

    o_state = odometry_mod.init_state(cfg)
    m_state = mapping_mod.init_state(cfg)
    t0 = time.time()
    for s in device_scans[:3]:
        o_state, m_state, pose = fused_frame(o_state, m_state, s, cfg)
    jax.block_until_ready(pose.trans)
    print(f"fused warmup+compile: {time.time()-t0:.1f}s")

    n = 30
    t0 = time.time()
    for i in range(n):
        s = device_scans[3 + i % 3]
        o_state, m_state, pose = fused_frame(o_state, m_state, s, cfg)
    jax.block_until_ready(pose.trans)
    dt = time.time() - t0
    print(f"FUSED: {1000*dt/n:.1f} ms/frame ({n/dt:.1f} scans/s)")

    # separate (same as bench.py) for comparison
    o_state = odometry_mod.init_state(cfg)
    m_state = mapping_mod.init_state(cfg)

    def frame(o_state, m_state, scan):
        feats = features.extract_features(scan, cfg)
        o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
        m_state, m_out = mapping_mod.mapping_step(
            m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
        )
        return o_state, m_state, m_out.pose

    for s in device_scans[:3]:
        o_state, m_state, pose = frame(o_state, m_state, s)
    jax.block_until_ready(pose.trans)
    t0 = time.time()
    for i in range(n):
        s = device_scans[3 + i % 3]
        o_state, m_state, pose = frame(o_state, m_state, s)
    jax.block_until_ready(pose.trans)
    dt = time.time() - t0
    print(f"SEPARATE: {1000*dt/n:.1f} ms/frame ({n/dt:.1f} scans/s)")


if __name__ == "__main__":
    main()
