"""Dispatch-poison canary. On the axon/tunnel stack, executing any jit that
CLOSES OVER a pre-existing device array (e.g. a module-level
`jnp.float32(1e30)` sentinel) permanently degrades every subsequent
dispatch in the process from ~0.03 ms to ~0.7-7 ms (scaling with the
program's buffer count). Trace-time-created constants and explicit eager
args are safe; only closure-captured constvars poison.

This runs 3 full pipeline frames, then times a trivial jit loop. Passes if
the post-pipeline dispatch overhead stays at the fast-path floor.
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
from scaloam_tpu.models import mapping as mapping_mod
from scaloam_tpu.models import odometry as odometry_mod
from scaloam_tpu.ops import features
from scaloam_tpu.types import LidarScan
from scaloam_tpu.utils import synthetic

rng = np.random.default_rng(0)


@jax.jit
def _triv(x):
    return x * 1.000001 + 0.5


_xs = [jnp.asarray(rng.uniform(-1, 1, (1024,)).astype(np.float32)) for _ in range(16)]


def time_triv(label, n=48):
    for x in _xs[:4]:
        out = _triv(x)
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(n):
        out = _triv(_xs[i % 16])
    jax.block_until_ready(out)
    ms = (time.time() - t0) / n * 1000
    print("%s: %.3f ms/call" % (label, ms))
    return ms


def main():
    cfg = config.kitti_hdl64()
    world = synthetic.make_world(seed=3, n_boxes=60, extent=70.0)
    scans, _ = synthetic.simulate_trajectory(
        world, n_frames=4, speed=1.2, radius=40.0, n_scans=64,
        n_azimuth=2048, seed=7,
    )
    ds = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]
    before = time_triv("dispatch before pipeline")
    o_state = odometry_mod.init_state(cfg)
    m_state = mapping_mod.init_state(cfg)
    for s in ds[1:4]:
        f = features.extract_features(s, cfg)
        o_state, o_out = odometry_mod.odometry_step(o_state, f, cfg)
        m_state, m_out = mapping_mod.mapping_step(
            m_state, o_out.world, f.less_sharp, f.less_flat, cfg
        )
    jax.block_until_ready(m_out.pose.trans)
    after = time_triv("dispatch after pipeline")
    limit = max(0.15, 5 * before)
    if after > limit:
        print(f"FAIL: dispatch degraded ({after:.3f} ms > {limit:.3f} ms) — "
              "some jit closes over a device array (see CLAUDE.md)")
        sys.exit(1)
    print("PASS")


if __name__ == "__main__":
    main()
