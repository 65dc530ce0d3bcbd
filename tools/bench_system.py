"""Full-SYSTEM throughput on TPU: the async threaded pipeline (features ->
odometry -> mapping -> keyframes/SC/ICP/PGO) fed with pre-generated
HDL-64-density scans as fast as it will take them. Reports end-to-end
scans/s including the backend — the production real-time number (bench.py
is the front-end kernel number).
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
from scaloam_tpu.runtime.pipeline import AsyncSlamPipeline
from scaloam_tpu.utils import synthetic


def main():
    cfg = config.kitti_hdl64()
    n_frames = 80
    world = synthetic.make_world(seed=3, n_boxes=60, extent=70.0)
    scans, _ = synthetic.simulate_trajectory(
        world, n_frames=n_frames, speed=1.2, radius=40.0,
        n_scans=64, n_azimuth=2048, seed=7,
    )

    # Warm compile caches with a tiny run first (compiles must not ride the
    # timed window).
    warm = AsyncSlamPipeline(cfg)
    warm.start()
    for f in range(3):
        warm.feed(0.1 * f, scans[f])
    warm.finish()

    pipe = AsyncSlamPipeline(cfg)
    pipe.start()
    t0 = time.time()
    for f in range(n_frames):
        pipe.feed(0.1 * f, scans[f])
    pipe.finish()
    dt = time.time() - t0
    n_done = len(pipe.mapped_results)
    print(
        f"system: {n_frames} scans fed, {n_done} mapped, "
        f"{pipe.dropped_frames} dropped, {dt:.2f}s "
        f"({n_frames / dt:.1f} scans/s end-to-end)"
    )
    print(f"keyframes: {len(pipe.sys.keyframes)}")


if __name__ == "__main__":
    main()
