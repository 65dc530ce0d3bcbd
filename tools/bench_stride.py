"""Front-end ms/frame vs D2H sync stride. Unique scan per frame, one
process. Separates device compute from tunnel sync latency: stride-1 pays
one D2H RTT per frame; larger strides amortize it. The asymptote is the
true device-side frame time.
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
    n_frames = 123  # 3 warmup + 4 strided runs x 30 unique scans
    world = synthetic.make_world(seed=3, n_boxes=60, extent=70.0)
    scans, _ = synthetic.simulate_trajectory(
        world, n_frames=n_frames, speed=1.2, radius=40.0,
        n_scans=64, n_azimuth=2048, seed=7,
    )
    ds = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]
    for d in ds:
        jax.block_until_ready(d.xyz)

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

    idx = 3
    for stride in (1, 3, 10, 30):
        n = 30
        t0 = time.time()
        for i in range(n):
            o_state, m_state, pose = frame(o_state, m_state, ds[idx])
            idx += 1
            if (i + 1) % stride == 0:
                _ = np.asarray(pose.trans)
        _ = np.asarray(pose.trans)
        dt = (time.time() - t0) / n * 1000
        print(f"stride {stride:2d}: {dt:6.1f} ms/frame")


if __name__ == "__main__":
    main()
