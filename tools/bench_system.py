"""Full-SYSTEM throughput on TPU: the async threaded pipeline (fused
front-end -> keyframes/SC/ICP/PGO) fed with pre-generated HDL-64-density
scans as fast as it will take them. Reports end-to-end scans/s including
the backend — the production real-time number (bench.py is the front-end
kernel number) — plus per-keyframe backend latency and loop-closure
activity (VERDICT r1 item 3).

Methodology (VERDICT r4 item 8): the HEADLINE is the MEDIAN of N
identical async runs (default 7; the tunneled single-chip environment
adds large run-to-run variance), with the full spread reported. The
queue depth is sized to the course so every fed frame is processed
(drop-oldest would otherwise skip work and flatter the number).

The course is a closing circle (like run.py --synthetic) so ScanContext
retrieval, ICP verification and PGO genuinely fire during the timed window.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scaloam_tpu import config
from scaloam_tpu.models.pipeline import SlamSystem
from scaloam_tpu.runtime.pipeline import AsyncSlamPipeline
from scaloam_tpu.utils import synthetic


def make_course(n_frames=160, radius=22.0):
    # 2*pi*22 ~ 138 frames closes the circle at 1 m/frame: loops fire in
    # the last ~20 frames.
    from tools.scan_cache import get_scans

    return get_scans(n_frames, seed_world=0, speed=1.0, radius=radius)


def async_run(cfg, scans):
    pipe = AsyncSlamPipeline(cfg)
    pipe.start()
    t0 = time.time()
    for f, pts in enumerate(scans):
        pipe.feed(0.1 * f, pts)
    pipe.finish()
    dt = time.time() - t0
    return pipe, dt


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_runs = int(args[0]) if args else 7
    separate = "--separate" in sys.argv  # r4 topology (3 stage threads)
    drop = "--drop" in sys.argv  # r4 real-time policy (drop-backlog)
    cfg = config.kitti_hdl64()
    n_frames = 160
    import dataclasses
    if "--nokernel" in sys.argv:  # odometry GN kernel ablation
        cfg = cfg.replace(odometry=dataclasses.replace(
            cfg.odometry, fused_gn_kernel="off"
        ))
    if drop:
        # r4-comparable semantics: bounded queues, mapping drops backlog —
        # the reference's real-time policy (laserMapping.cpp:300-304).
        cfg = cfg.replace(runtime=dataclasses.replace(
            cfg.runtime, fused_frontend=not separate
        ))
    else:
        # Hold the whole course: every fed frame is processed (FIFO), so
        # scans/s = real work done per wall second, not survivors-of-drops.
        cfg = cfg.replace(runtime=dataclasses.replace(
            cfg.runtime, queue_depth=n_frames + 8,
            fused_frontend=not separate,
        ))
    scans = make_course(n_frames=n_frames)

    # Warm every executable (compiles must not ride the timed window):
    # run the full course once through the synchronous system.
    t0 = time.time()
    warm = SlamSystem(cfg)
    for i, pts in enumerate(scans):
        warm.process_scan(pts, time=0.1 * i)
    warm_s = time.time() - t0
    print(f"warmup+compile pass: {warm_s:.1f}s, "
          f"keyframes={len(warm.keyframes)} loops={len(warm.loops_found)}")

    # --- async end-to-end runs -------------------------------------------
    rates, last_pipe = [], None
    for r in range(n_runs):
        pipe, dt = async_run(cfg, scans)
        rates.append(n_frames / dt)
        last_pipe = pipe
        print(
            f"run {r}: {n_frames} scans in {dt:.2f}s "
            f"({rates[-1]:.1f} scans/s), dropped={pipe.dropped_frames}, "
            f"keyframes={len(pipe.sys.keyframes)} "
            f"loops={len(pipe.sys.loops_found)}"
        )
    rates_sorted = sorted(rates)
    median = float(np.median(rates))
    pipe = last_pipe
    for k in pipe.stage_busy:
        n = max(pipe.stage_frames.get(k, 0), 1)
        if pipe.stage_frames.get(k, 0):
            print(f"  stage {k}: busy {pipe.stage_busy[k]:.2f}s over "
                  f"{pipe.stage_frames.get(k, 0)} frames "
                  f"({1e3 * pipe.stage_busy[k] / n:.1f} ms/frame)")

    if "--nosync" in sys.argv:
        print(json.dumps({
            "end_to_end_scans_per_sec_median": round(median, 1),
            "runs_scans_per_sec": [round(r, 1) for r in rates],
            "spread": [round(rates_sorted[0], 1), round(rates_sorted[-1], 1)],
            "fused_frontend": bool(pipe.fused),
            "dropped_last_run": pipe.dropped_frames,
            "mapped_frames_last_run": len(pipe.mapped_results),
        }))
        return

    # --- per-keyframe backend attribution (synchronous, timed blocks) -----
    sys_ = SlamSystem(cfg)
    add_ms, lcd_ms, icp_ms, opt_ms = [], [], [], []
    from scaloam_tpu.models import posegraph as pg

    for i, pts in enumerate(scans):
        scan_np = pts
        # front-end via process_scan internals, backend timed piecewise
        from scaloam_tpu.models import mapping as mapping_mod
        from scaloam_tpu.models import odometry as odometry_mod
        from scaloam_tpu.ops import features as feat_ops, se3
        from scaloam_tpu.types import LidarScan

        scan = LidarScan.from_numpy(scan_np, cfg.sensor.max_points)
        feats = feat_ops.extract_features(scan, cfg)
        sys_.o_state, o_out = odometry_mod.odometry_step(sys_.o_state, feats, cfg)
        sys_.m_state, m_out = mapping_mod.mapping_step(
            sys_.m_state, o_out.world,
            sys_.o_state.last_corner, sys_.o_state.last_surf, cfg,
        )
        mapped_pose = m_out.pose
        if sys_._keyframe_gate(mapped_pose):  # includes the per-frame D2H
            t0 = time.time()
            sys_._add_keyframe(feats, mapped_pose, 0.1 * i)
            add_ms.append(1e3 * (time.time() - t0))
            t0 = time.time()
            idx, yaw, dist = sys_.sc.detect_loop_closure_id()
            lcd_ms.append(1e3 * (time.time() - t0))
            if idx >= 0:
                t0 = time.time()
                z = sys_._icp_verify(len(sys_.keyframes) - 1, idx, yaw)
                icp_ms.append(1e3 * (time.time() - t0))
                if z is not None:
                    sys_.graph = pg.add_loop(
                        sys_.graph, np.int32(len(sys_.keyframes) - 1),
                        np.int32(idx), z, n_loops=len(sys_.loops_found))
                    sys_.loops_found.append((len(sys_.keyframes) - 1, idx))
            if (len(sys_.keyframes) % cfg.pgo.optimize_every_n_keyframes) == 0:
                t0 = time.time()
                sys_.graph = pg.optimize(sys_.graph, cfg.pgo)
                jax.block_until_ready(sys_.graph.poses.trans)
                opt_ms.append(1e3 * (time.time() - t0))
        sys_.frame_idx += 1

    def stat(x):
        return (
            {"mean": round(float(np.mean(x)), 1),
             "p50": round(float(np.median(x)), 1),
             "max": round(float(np.max(x)), 1), "n": len(x)}
            if x else {"n": 0}
        )

    summary = {
        "end_to_end_scans_per_sec_median": round(median, 1),
        "runs_scans_per_sec": [round(r, 1) for r in rates],
        "spread": [round(rates_sorted[0], 1), round(rates_sorted[-1], 1)],
        "frames": n_frames,
        "fused_frontend": bool(pipe.fused),
        "keyframes": len(sys_.keyframes),
        "loops_accepted": len(sys_.loops_found),
        "backend_ms_per_keyframe": {
            "add_keyframe": stat(add_ms),
            "sc_detect": stat(lcd_ms),
            "icp_verify": stat(icp_ms),
            "pgo_optimize": stat(opt_ms),
        },
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
