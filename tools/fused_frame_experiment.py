"""Compare the 3-executable front-end (features / odometry / mapping)
against one fused jitted frame function, with honest methodology
(CLAUDE.md): unique scan per timed frame, np.asarray drains around every
timed region.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import functools

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
    N = 30
    n_frames = 2 * (3 + 2 * N)
    world = synthetic.make_world(seed=3, n_boxes=60, extent=70.0)
    scans, _ = synthetic.simulate_trajectory(
        world, n_frames=n_frames, speed=1.2, radius=40.0,
        n_scans=64, n_azimuth=2048, seed=7,
    )
    ds = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]
    for d in ds:
        jax.block_until_ready(d.xyz)
    nxt = [0]

    def take(n):
        i = nxt[0]
        nxt[0] = i + n
        return ds[i : i + n]

    @functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
    def fused_frame(o_state, m_state, scan, cfg):
        feats = features.extract_features(scan, cfg)
        o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
        m_state, m_out = mapping_mod.mapping_step(
            m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
        )
        return o_state, m_state, m_out.pose

    def sep_frame(o_state, m_state, scan):
        feats = features.extract_features(scan, cfg)
        o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
        m_state, m_out = mapping_mod.mapping_step(
            m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
        )
        return o_state, m_state, m_out.pose

    for name, frame in (
        ("FUSED", lambda o, m_, s: fused_frame(o, m_, s, cfg)),
        ("SEPARATE", sep_frame),
    ):
        o_state = odometry_mod.init_state(cfg)
        m_state = mapping_mod.init_state(cfg)
        t0 = time.time()
        for s in take(3):
            o_state, m_state, pose = frame(o_state, m_state, s)
        _ = np.asarray(pose.trans)
        print(f"{name} warmup+compile: {time.time()-t0:.1f}s", file=sys.stderr)
        for rep in range(2):
            t0 = time.time()
            for s in take(N):
                o_state, m_state, pose = frame(o_state, m_state, s)
            _ = np.asarray(pose.trans)
            dt = (time.time() - t0) / N * 1000
        print(f"{name}: {dt:.2f} ms/frame (second pass)")


if __name__ == "__main__":
    main()
