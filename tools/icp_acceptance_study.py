"""ICP acceptance-parity study on the reference's real KAIST03 keyframes
(VERDICT r1 item 6 / next-round task 6).

The reference accepts a loop iff ICP converges with fitness < 0.3 after
aligning clouds pre-transformed by (drifted) graph estimates, searching
correspondences to 150 m (laserPosegraphOptimization.cpp:517-537). This
repo's two-stage verify seeds from BOTH the graph-estimated relative pose
and the ScanContext yaw, limits the fine stage to a 2 m reach, and adds a
0.5 matched-fraction gate. This study sweeps real revisit pairs x injected
graph drift and records accept/measurement error — the table in PARITY.md.

Run: python tools/icp_acceptance_study.py   (CPU, ~minutes warm)
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from scaloam_tpu import config as cfg_mod
from scaloam_tpu.io import artifacts, pcd
from scaloam_tpu.models import pipeline as pl
from scaloam_tpu.models import posegraph as pg
from scaloam_tpu.ops import scancontext as sc_ops
from scaloam_tpu.ops import se3
from scaloam_tpu.types import Pose

SAMPLE = "/root/reference/utils/sample_data/KAIST03"
N = 21


def _np_pose(T):
    return Pose(
        se3.mat_to_quat(jnp.asarray(T[:3, :3], jnp.float32)),
        jnp.asarray(T[:3, 3], jnp.float32),
    )


def _loop_cfg():
    return dataclasses.replace(
        cfg_mod.LoopClosureConfig(),
        max_submap_points=16384, max_source_points=4096,
        coarse_source_points=1024, coarse_target_points=4096,
        icp_grid_xy=64, icp_grid_z=16, icp_cell_cap=16,
    )


def main():
    clouds = [
        pcd.read_pcd(os.path.join(SAMPLE, "Scans", f"{k:06d}.pcd"))
        for k in range(N)
    ]
    poses = artifacts.load_kitti_poses(
        os.path.join(SAMPLE, "optimized_poses.txt")
    )

    cfg = cfg_mod.mulran_os1_64()
    cfg = cfg.replace(
        loop=_loop_cfg(),
        pgo=dataclasses.replace(cfg.pgo, max_keyframes=64, max_loops=8),
        scancontext=dataclasses.replace(cfg.scancontext, max_keyframes=64),
    )

    def make_system():
        s = pl.SlamSystem(cfg)
        for k in range(N):
            s.keyframes.append(
                pl.Keyframe(cloud=clouds[k][:, :3].copy(), time=float(k))
            )
            s.graph = pg.ensure_node_slot(s.graph, k)
            s.graph = pg.add_keyframe(
                s.graph, _np_pose(poses[k]), np.float32(0), np.bool_(False)
            )
        return s

    def sc_yaw(curr, loop):
        def desc(xyz, cap=65536):
            p = np.zeros((cap, 3), np.float32)
            m = np.zeros(cap, bool)
            n = min(len(xyz), cap)
            p[:n] = xyz[:n]
            m[:n] = True
            return sc_ops.make_descriptor(jnp.asarray(p), jnp.asarray(m))

        _, shift = sc_ops.sc_distance(
            desc(clouds[curr][:, :3]), desc(clouds[loop][:, :3])
        )
        return float(shift) * 2.0 * np.pi / 60

    # revisit pairs: all (curr, loop) with GT separation < 12 m, gap >= 2
    pairs = []
    for c in range(N):
        for l in range(c - 2):
            d = np.linalg.norm(poses[c][:3, 3] - poses[l][:3, 3])
            if d < 12.0:
                pairs.append((c, l, d))
    print(f"{len(pairs)} genuine revisit pairs (sep < 12 m)")

    rng = np.random.default_rng(0)
    print(f"{'drift':>8} | {'accept':>8} | {'t_err p50/max (m)':>18} | "
          f"{'r_err p50/max (deg)':>19}")
    for drift_t, drift_r in ((0.0, 0.0), (1.0, 2.0), (2.0, 5.0),
                             (4.0, 10.0), (8.0, 15.0)):
        acc, terrs, rerrs = 0, [], []
        for c, l, d in pairs:
            s = make_system()
            if drift_t > 0:
                v = rng.normal(0, 1, 3)
                v[2] *= 0.1
                v = v / np.linalg.norm(v) * drift_t
                ang = np.deg2rad(drift_r)
                Rz = np.array(
                    [[np.cos(ang), -np.sin(ang), 0],
                     [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
                )
                P = poses[c].copy()
                P[:3, :3] = Rz @ P[:3, :3]
                P[:3, 3] += v
                pz = _np_pose(P)
                s.graph = s.graph._replace(
                    poses=Pose(
                        s.graph.poses.quat.at[c].set(pz.quat),
                        s.graph.poses.trans.at[c].set(pz.trans),
                    )
                )
            z = s._icp_verify(c, l, sc_yaw(c, l))
            if z is None:
                continue
            acc += 1
            T_gt = np.linalg.inv(poses[c]) @ poses[l]
            T_z = np.asarray(se3.pose_to_matrix(z))
            terrs.append(np.linalg.norm(T_z[:3, 3] - T_gt[:3, 3]))
            cos_r = (np.trace(T_gt[:3, :3].T @ T_z[:3, :3]) - 1) / 2
            rerrs.append(np.degrees(np.arccos(np.clip(cos_r, -1, 1))))
        te = (f"{np.median(terrs):.2f}/{np.max(terrs):.2f}"
              if terrs else "-")
        re = (f"{np.median(rerrs):.1f}/{np.max(rerrs):.1f}"
              if rerrs else "-")
        print(f"{drift_t:4.0f}m/{drift_r:2.0f}d | {acc:3d}/{len(pairs):3d} |"
              f" {te:>18} | {re:>19}")

    # Negatives. The 21-scan sample spans < 24 m, so every pair genuinely
    # overlaps (the reference, searching to 150 m, would accept them too) —
    # spatial negatives don't exist here. Structural negatives instead:
    # the claimed pair's source cloud is replaced with a structureless
    # random cloud; the fitness/matched-fraction gates must reject.
    rng2 = np.random.default_rng(7)
    rej = 0
    trials = 20
    for i in range(trials):
        c, l, _ = pairs[rng2.integers(len(pairs))]
        s = make_system()
        fake = rng2.uniform(-40, 40, size=(4096, 3)).astype(np.float32)
        s.keyframes[c] = pl.Keyframe(cloud=fake, time=float(c))
        z = s._icp_verify(c, l, 0.0)
        rej += z is None
    print(f"negatives (garbage source on real pairs): {rej}/{trials} rejected")


if __name__ == "__main__":
    main()
