"""Capture a jax.profiler device trace of the steady-state front-end and
print the top ops by device self-time (parsed from the xplane proto)."""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TRACE_DIR = "/tmp/scaloam_trace"


def run_frames():
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
        world, n_frames=6, speed=1.2, radius=40.0,
        n_scans=64, n_azimuth=2048, seed=7,
    )
    device_scans = [
        LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans
    ]
    o_state = odometry_mod.init_state(cfg)
    m_state = mapping_mod.init_state(cfg)

    def frame(o_state, m_state, scan):
        feats = features.extract_features(scan, cfg)
        o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
        m_state, m_out = mapping_mod.mapping_step(
            m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
        )
        return o_state, m_state, m_out.pose

    for s in device_scans[:4]:
        o_state, m_state, pose = frame(o_state, m_state, s)
    jax.block_until_ready(pose.trans)

    with jax.profiler.trace(TRACE_DIR):
        for i in range(5):
            s = device_scans[4 + i % 2]
            o_state, m_state, pose = frame(o_state, m_state, s)
        jax.block_until_ready(pose.trans)


def parse_trace():
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    xplanes = glob.glob(
        os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True
    )
    assert xplanes, "no xplane captured"
    xp = max(xplanes, key=os.path.getmtime)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xp], "framework_op_stats^", {}
    )
    # data is CSV text for op stats
    out = os.path.join(TRACE_DIR, "op_stats.csv")
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(out, mode) as f:
        f.write(data)
    print("wrote", out)

    import csv
    import io

    text = data.decode() if isinstance(data, bytes) else data
    rows = list(csv.DictReader(io.StringIO(text)))
    if not rows:
        print(text[:2000])
        return
    key_time = None
    for cand in ("total_self_time", "self_time_us", "avg_self_time_us",
                 "total_self_time_us", "occurrences"):
        if cand in rows[0]:
            key_time = cand
    print("columns:", list(rows[0].keys()))
    def fval(r):
        try:
            return float(r.get("total_self_time_us") or r.get("total_self_time") or 0)
        except Exception:
            return 0.0
    rows.sort(key=fval, reverse=True)
    for r in rows[:40]:
        print({k: r[k] for k in list(r.keys())[:8]})


if __name__ == "__main__":
    if "--parse-only" not in sys.argv:
        run_frames()
    parse_trace()
