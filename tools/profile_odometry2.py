"""Odometry sub-stage attribution by IN-JIT ablation (same methodology as
profile_mapping2.py; the prefix-variant harness in profile_odometry.py was
dispatch-noise-bound). Variants chain real state over never-repeated
feature frames; each piece's cost is the delta between adjacent variants.
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
from scaloam_tpu.models import odometry as odometry_mod
from scaloam_tpu.models.odometry import (
    OdometryState, _sweep_candidates, _associate, _solve,
)
from scaloam_tpu.ops import correspond, features, residuals, se3, voxel
from scaloam_tpu.types import LidarScan

cfg = config.kitti_hdl64()
ocfg = cfg.odometry
N = 30
n_frames = 3 + 12 * N

from tools.scan_cache import get_scans

scans = get_scans(n_frames)
ds_scans = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]
for d in ds_scans:
    jax.block_until_ready(d.xyz)

feats_list = [features.extract_features(s, cfg) for s in ds_scans]
jax.block_until_ready(feats_list[-1].sharp.xyz)

o0 = odometry_mod.init_state(cfg)
o0, _ = odometry_mod.odometry_step(o0, feats_list[0], cfg)
o0, _ = odometry_mod.odometry_step(o0, feats_list[1], cfg)
jax.block_until_ready(o0.world.trans)


def make_step(mode):
    # mode: "full" | "nogn" | "noassoc" | "nn1only" | "nosweep" | "null"
    @jax.jit
    def step(state, feats):
        rel = state.rel
        if mode != "null" and mode != "nosweep":
            if mode == "nn1only":
                # only the global 2-NN payload sweeps, no ring passes
                for q_cloud, t_cloud in (
                    (feats.sharp, state.last_corner),
                    (feats.flat, state.last_surf),
                ):
                    q = residuals.transform_points(rel, q_cloud.xyz)
                    iota = jnp.arange(
                        t_cloud.xyz.shape[0], dtype=jnp.float32
                    )
                    pl = jnp.concatenate(
                        [t_cloud.xyz, t_cloud.ring[:, None], iota[:, None]],
                        axis=1,
                    )
                    d, P = voxel.knn2_payload(
                        q, q_cloud.mask, t_cloud.xyz, t_cloud.mask, pl,
                        tile=8192,
                    )
                    rel = rel._replace(
                        trans=rel.trans + 0.0 * (d[0, 0] + P[0, 0, 0])
                    )
            else:
                corner_cand, surf_cand = _sweep_candidates(
                    rel, feats, state, cfg
                )
                if mode == "noassoc":
                    rel = rel._replace(
                        trans=rel.trans
                        + 0.0 * (corner_cand[0][0, 0, 0] + surf_cand[0][0, 0, 0])
                    )
                else:
                    for _ in range(ocfg.outer_iterations):
                        corner_data, surf_data = _associate(
                            rel, feats, corner_cand, surf_cand, cfg
                        )
                        if mode == "nogn":
                            rel = rel._replace(
                                trans=rel.trans
                                + 0.0 * (corner_data[1][0, 0] + surf_data[1][0, 0])
                            )
                        else:
                            rel = _solve(rel, corner_data, surf_data, cfg)
        world = se3.compose(state.world, rel)
        return OdometryState(
            last_corner=feats.less_sharp,
            last_surf=feats.less_flat,
            rel=rel,
            world=world,
            initialized=state.initialized,
            frame_idx=state.frame_idx + 1,
            feat_overflow=state.feat_overflow,
            degenerate_count=state.degenerate_count,
        )

    return step


_next = [3]


def take(n):
    i = _next[0]
    _next[0] = i + n
    return feats_list[i : i + n]


results = {}
for mode in ("full", "nogn", "noassoc", "nn1only", "nosweep", "null"):
    step = make_step(mode)
    best = float("inf")
    for p in range(2):
        st = o0
        batch = take(N)
        st = step(st, batch[0])
        _ = np.asarray(st.world.trans)
        t0 = time.time()
        for f in batch[1:]:
            st = step(st, f)
        _ = np.asarray(st.world.trans)
        best = min(best, (time.time() - t0) / (N - 1) * 1e3)
    results[mode] = best
    print(f"{mode:9s}: {best:6.2f} ms/frame", flush=True)

print("\ndeltas:")
print(f"  GN solves (2x4)   : {results['full'] - results['nogn']:.2f} ms")
print(f"  associate (2x)    : {results['nogn'] - results['noassoc']:.2f} ms")
print(f"  ring passes       : {results['noassoc'] - results['nn1only']:.2f} ms")
print(f"  global 2-NN sweeps: {results['nn1only'] - results['nosweep']:.2f} ms")
print(f"  base (swap+state) : {results['nosweep']:.2f} ms (null {results['null']:.2f})")
