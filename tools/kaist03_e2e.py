"""Full-pipeline e2e on the REAL KAIST03 sample clouds (VERDICT r2 task 2).

Feeds the reference's 21 shipped keyframe clouds
(/root/reference/utils/sample_data/KAIST03/Scans/*.pcd, ~37k pts each,
~1.2 m apart, already 0.4 m-downsampled — makeMergedMap.py:28,50-57) as a
scan SEQUENCE through the whole pipeline: features -> odometry -> mapping
-> keyframes -> SC -> ICP -> PGO, and scores ATE against the matching rows
of the shipped optimized_poses.txt.

This is the first time the FRONT-END consumes real LiDAR returns (all
front-end validation before r3 was synthetic). Run on CPU (tests) or TPU:

    python tools/kaist03_e2e.py          # prints one JSON line
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SAMPLE = "/root/reference/utils/sample_data/KAIST03"
N_SCANS = 21


def make_cfg():
    from scaloam_tpu import config as cfg_mod

    cfg = cfg_mod.mulran_os1_64()
    return cfg.replace(
        # 37k-pt downsampled clouds: half the raw-scan capacity suffices
        sensor=dataclasses.replace(
            cfg.sensor, max_points=49152, max_points_per_ring=2048
        ),
        mapping=dataclasses.replace(
            cfg.mapping,
            cell_size=4.0, grid_xy=32, grid_z=8,
            corner_cell_cap=32, surf_cell_cap=64,
            max_corner_input=2048, max_surf_input=8192,
        ),
        scancontext=dataclasses.replace(
            cfg.scancontext, max_keyframes=64, max_input_points=32768,
        ),
        loop=dataclasses.replace(
            cfg.loop, max_submap_points=32768, max_source_points=4096,
            coarse_source_points=1024, coarse_target_points=4096,
            icp_grid_xy=64, icp_grid_z=16, icp_cell_cap=16,
        ),
        pgo=dataclasses.replace(
            cfg.pgo, max_keyframes=64, max_loops=8, gn_iterations=6
        ),
    )


def run(verbose: bool = True):
    from scaloam_tpu.io import artifacts, pcd
    from scaloam_tpu.models.pipeline import SlamSystem
    from scaloam_tpu.utils.evaluation import ate_rmse

    clouds = [
        pcd.read_pcd(os.path.join(SAMPLE, "Scans", f"{k:06d}.pcd"))[:, :3]
        for k in range(N_SCANS)
    ]
    gt = artifacts.load_kitti_poses(
        os.path.join(SAMPLE, "optimized_poses.txt")
    )[:N_SCANS]
    gt0_inv = np.linalg.inv(gt[0])
    gt_rel = np.stack([gt0_inv @ g for g in gt])

    cfg = make_cfg()
    sys_ = SlamSystem(cfg)
    mapped = []
    for k, c in enumerate(clouds):
        r = sys_.process_scan(np.asarray(c, np.float32), time=float(k))
        import jax

        q, t = jax.device_get((r.mapped_pose.quat, r.mapped_pose.trans))
        mapped.append(np.asarray(t))
        if verbose:
            gt_t = gt_rel[k, :3, 3]
            err = np.linalg.norm(mapped[-1] - gt_t)
            print(
                f"frame {k:2d}: kf={r.is_keyframe} est={np.round(mapped[-1], 2)}"
                f" gt={np.round(gt_t, 2)} err={err:.3f} m",
                file=sys.stderr,
            )

    # per-frame mapped-pose ATE (no alignment beyond the shared origin)
    per_frame = np.linalg.norm(np.stack(mapped) - gt_rel[:, :3, 3], axis=-1)

    # keyframe ATE vs the matching shipped rows (keyframes are gated at
    # 1 m; with 1.2 m spacing every frame keyframes, so kf k <-> row k)
    est = sys_.optimized_poses()
    n_kf = len(sys_.keyframes)
    kf_rows = [sys_.keyframes[k].frame for k in range(n_kf)]
    gt_kf = gt_rel[kf_rows]
    ate = ate_rmse(est, gt_kf)

    path_len = float(
        np.sum(np.linalg.norm(np.diff(gt_rel[:, :3, 3], axis=0), axis=-1))
    )
    return {
        "frames": N_SCANS,
        "keyframes": n_kf,
        "loops": len(sys_.loops_found),
        "path_len_m": round(path_len, 2),
        "ate_rmse_m": round(float(ate), 4),
        "final_err_m": round(float(per_frame[-1]), 4),
        "max_frame_err_m": round(float(per_frame.max()), 4),
    }


if __name__ == "__main__":
    import jax

    if "--cpu" in sys.argv:
        # the axon plugin force-sets jax_platforms; env alone won't stick
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    out = run()
    print(json.dumps(out))
