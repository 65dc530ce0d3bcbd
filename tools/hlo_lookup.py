"""Compile (cache-hit) the three stage programs on TPU, dump optimized HLO,
and print the source metadata of named ops (e.g. fusion.40) so trace-hot
ops map back to Python lines.

Usage: python tools/hlo_lookup.py <stage> <op-name> [<op-name> ...]
  stage in {features, odometry, mapping}
"""

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
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
    world = synthetic.make_world(seed=3, n_boxes=60, extent=70.0)
    scans, _ = synthetic.simulate_trajectory(
        world, n_frames=1, speed=1.2, radius=40.0,
        n_scans=64, n_azimuth=2048, seed=7,
    )
    scan = LidarScan.from_numpy(scans[0], cfg.sensor.max_points)
    o_state = odometry_mod.init_state(cfg)
    m_state = mapping_mod.init_state(cfg)

    stage = sys.argv[1]
    names = sys.argv[2:]

    if stage == "features":
        lowered = jax.jit(
            features.extract_features, static_argnames=("cfg",)
        ).lower(scan, cfg)
    elif stage == "odometry":
        feats = features.extract_features(scan, cfg)
        lowered = jax.jit(
            odometry_mod.odometry_step, static_argnames=("cfg",)
        ).lower(o_state, feats, cfg)
    elif stage == "mapping":
        feats = features.extract_features(scan, cfg)
        from scaloam_tpu.types import Pose
        lowered = jax.jit(
            mapping_mod.mapping_step, static_argnames=("cfg",),
            donate_argnums=(0,),
        ).lower(m_state, Pose.identity(), feats.less_sharp, feats.less_flat, cfg)
    else:
        raise SystemExit("stage?")

    txt = lowered.compile().as_text()
    out = f"/tmp/hlo_{stage}.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out} ({len(txt)} bytes)")

    for nm in names:
        # find op definition lines: "%fusion.40 = ..." or " fusion.40 = ..."
        pat = re.compile(
            rf"^\s*(?:%|)({re.escape(nm)})\s*=\s*(.*)$", re.M
        )
        for m in pat.finditer(txt):
            line = m.group(2)
            meta = re.search(r'metadata=\{([^}]*)\}', line)
            print(f"\n--- {nm} ---")
            print(line[:300])
            if meta:
                print("   ", meta.group(1)[:400])


if __name__ == "__main__":
    main()
