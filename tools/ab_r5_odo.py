"""Same-session A/B: odometry_step with the fused Pallas GN kernel vs the
XLA associate/solve chain (PERF A/B RULE, CLAUDE.md: only back-to-back
same-session comparisons are trustworthy on this tunnel).

Methodology: real synthetic HDL-64 frames, state chained through
never-repeated inputs, one fetch per timed window, best of 3.
"""

import os
import sys
import time
import dataclasses

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scaloam_tpu import config
from scaloam_tpu.models import odometry as odometry_mod
from scaloam_tpu.ops import features
from scaloam_tpu.types import LidarScan

N = 30
base = config.kitti_hdl64()
from tools.scan_cache import get_scans

scans = get_scans(3 + 2 * (N + 1))  # 2 reps per mode, never-repeated
ds = [LidarScan.from_numpy(s, base.sensor.max_points) for s in scans]
feats_list = [features.extract_features(s, base) for s in ds]
jax.block_until_ready(feats_list[-1].sharp.xyz)

_next = [3]


def take(n):
    i = _next[0]
    _next[0] = i + n
    return feats_list[i : i + n]


results = {}
for mode in ("off", "on"):
    _next[0] = 3  # both modes see the SAME frame sets (finals comparable);
    # within a mode no input repeats (the dedup trap is per-executable)
    cfg = base.replace(
        odometry=dataclasses.replace(base.odometry, fused_gn_kernel=mode)
    )
    o0 = odometry_mod.init_state(cfg)
    o0, _ = odometry_mod.odometry_step(o0, feats_list[0], cfg)
    o0, _ = odometry_mod.odometry_step(o0, feats_list[1], cfg)
    jax.block_until_ready(o0.world.trans)
    best = float("inf")
    finals = None
    for _ in range(2):
        st = o0
        batch = take(N + 1)
        st = odometry_mod.odometry_step(st, batch[0], cfg)[0]
        np.asarray(st.world.trans)
        t0 = time.time()
        for f in batch[1:]:
            st, out = odometry_mod.odometry_step(st, f, cfg)
        finals = np.asarray(st.world.trans)
        best = min(best, (time.time() - t0) / N * 1e3)
    results[mode] = (best, finals)
    print(f"fused_gn_kernel={mode}: {best:6.3f} ms/frame  "
          f"final={np.round(finals, 3)}", flush=True)

off_ms, off_t = results["off"]
on_ms, on_t = results["on"]
print(f"\nkernel speedup: {off_ms - on_ms:+.3f} ms/frame "
      f"({off_ms:.3f} -> {on_ms:.3f})")
print(f"trajectory agreement: {np.abs(off_t - on_t).max():.4f} m "
      f"(chained {2 * N} frames)")
