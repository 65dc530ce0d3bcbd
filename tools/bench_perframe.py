"""Per-frame wall-clock for the front-end with (a) all H2D done and blocked
before timing, (b) a D2H fetch after EVERY frame (defeats async pipelining
and result dedup — every scan is unique). Prints the per-frame series.
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


def main():
    cfg = config.kitti_hdl64()
    n_frames = 33
    world = synthetic.make_world(seed=3, n_boxes=60, extent=70.0)
    scans, _ = synthetic.simulate_trajectory(
        world, n_frames=n_frames, speed=1.2, radius=40.0,
        n_scans=64, n_azimuth=2048, seed=7,
    )
    t0 = time.time()
    ds = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]
    for d in ds:
        jax.block_until_ready(d.xyz)
    print(f"H2D all scans: {time.time() - t0:.2f}s", file=sys.stderr)

    o_state = odometry_mod.init_state(cfg)
    m_state = mapping_mod.init_state(cfg)

    def frame(o_state, m_state, scan):
        feats = features.extract_features(scan, cfg)
        o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
        m_state, m_out = mapping_mod.mapping_step(
            m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
        )
        return o_state, m_state, m_out.pose

    t0 = time.time()
    for s in ds[:3]:
        o_state, m_state, pose = frame(o_state, m_state, s)
    _ = np.asarray(pose.trans)
    print(f"warmup+compile: {time.time() - t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(3, n_frames):
        t0 = time.time()
        o_state, m_state, pose = frame(o_state, m_state, ds[i])
        _ = np.asarray(pose.trans)
        times.append((time.time() - t0) * 1000)
    arr = np.array(times)
    print("per-frame ms:", " ".join(f"{t:.1f}" for t in times))
    print(
        f"median {np.median(arr):.1f}  mean {arr.mean():.1f}  "
        f"min {arr.min():.1f}  max {arr.max():.1f}"
    )


if __name__ == "__main__":
    main()
