"""Real-data parity harness on the reference's shipped KAIST03 sample data.

The reference validates on real datasets (README.md:40-67); this environment
has no KITTI/MulRan download, but the reference ships 21 REAL keyframe
clouds (~37k pts each, PointXYZI) plus the full 3179-keyframe optimized
pose log (utils/sample_data/KAIST03, consumed by
utils/python/makeMergedMap.py:28,50-57). These tests run the loop-closure
stack — ScanContext descriptors/retrieval, two-stage ICP verification, and
pose-graph optimization — on that real data (VERDICT r1, next-round task 1):

  (a) SC descriptors on real clouds: occupancy/statistics, .scd roundtrip,
      yaw-invariant retrieval with correct yaw recovery
      (Scancontext.cpp:151-195,336-427);
  (b) ICP verification accepts genuine overlapping keyframe pairs with the
      relative pose matching the shipped optimized poses, and rejects
      garbage sources (laserPosegraphOptimization.cpp:497-548);
  (c) PGO over the real 3179-pose chain with real revisit loop factors
      recovers injected odometric drift back toward the shipped trajectory.
"""

import dataclasses
import os

import numpy as np
import pytest
import jax.numpy as jnp

from scaloam_tpu import config as cfg_mod
from scaloam_tpu.io import artifacts, pcd
from scaloam_tpu.models import pipeline as pl
from scaloam_tpu.models import posegraph as pg
from scaloam_tpu.ops import scancontext as sc_ops
from scaloam_tpu.ops import se3
from scaloam_tpu.types import Pose

SAMPLE = "/root/reference/utils/sample_data/KAIST03"
pytestmark = pytest.mark.skipif(
    not os.path.exists(SAMPLE), reason="reference sample data absent"
)

_N_SCANS = 21


@pytest.fixture(scope="module")
def kaist():
    clouds = [
        pcd.read_pcd(os.path.join(SAMPLE, "Scans", f"{k:06d}.pcd"))
        for k in range(_N_SCANS)
    ]
    poses = artifacts.load_kitti_poses(
        os.path.join(SAMPLE, "optimized_poses.txt")
    )
    return clouds, poses


def _pad_cloud(xyz: np.ndarray, cap: int):
    out = np.zeros((cap, 3), np.float32)
    m = np.zeros(cap, bool)
    n = min(len(xyz), cap)
    out[:n] = xyz[:n]
    m[:n] = True
    return jnp.asarray(out), jnp.asarray(m)


def _descriptor(xyz: np.ndarray, cap: int = 65536) -> np.ndarray:
    p, m = _pad_cloud(xyz, cap)
    return np.asarray(sc_ops.make_descriptor(p, m))


def _np_pose(T: np.ndarray) -> Pose:
    return Pose(
        se3.mat_to_quat(jnp.asarray(T[:3, :3], jnp.float32)),
        jnp.asarray(T[:3, 3], jnp.float32),
    )


# ---------------------------------------------------------------------------
# (a) ScanContext on real clouds
# ---------------------------------------------------------------------------


def test_sc_descriptor_real_statistics(kaist, tmp_path):
    """Descriptors of real urban clouds: sane occupancy, plausible max-z
    bins, exact .scd roundtrip (Scancontext.cpp:151-195)."""
    clouds, _ = kaist
    for k in (0, 10, 20):
        d = _descriptor(clouds[k][:, :3])
        assert d.shape == (20, 60)
        occ = float((d != 0).mean())
        # A 37k-pt urban scan fills most of the nearby polar bins.
        assert 0.35 < occ <= 1.0, occ
        # max-z bins: z + 2 m sensor height; buildings but no 80 m towers
        assert 0.0 < d.max() < 80.0
        # near rings (< 30 m) mostly occupied (building shadows leave gaps)
        assert (d[:7] != 0).mean() > 0.5

    d0 = _descriptor(clouds[0][:, :3])
    p = str(tmp_path / "000000.scd")
    artifacts.save_scd(p, d0)
    got = artifacts.load_scd(p)
    # the format is precision-3 like the reference's saveSCD
    np.testing.assert_allclose(got, d0, rtol=5e-3, atol=1e-3)


def test_sc_self_similarity_structure(kaist):
    """Adjacent real keyframes (~1.2 m apart) are close in SC distance;
    distant ones (>20 m) are farther — the monotonic structure retrieval
    relies on."""
    clouds, _ = kaist
    descs = [_descriptor(c[:, :3]) for c in clouds]
    adj = [
        float(sc_ops.sc_distance(jnp.asarray(descs[k]), jnp.asarray(descs[k + 1]))[0])
        for k in range(0, 20, 4)
    ]
    far = float(
        sc_ops.sc_distance(jnp.asarray(descs[0]), jnp.asarray(descs[20]))[0]
    )
    assert np.mean(adj) < 0.25, adj  # genuine neighbors look similar
    assert far > np.mean(adj), (far, adj)


def test_sc_retrieval_real_yaw_recovery(kaist):
    """Rotating a real cloud about z must retrieve the original index with
    the applied yaw recovered through the shift search — the revisit
    mechanism ScanContext exists for (detectLoopClosureID + shift search,
    Scancontext.cpp:69-148,336-427)."""
    clouds, _ = kaist
    cfg = cfg_mod.ScanContextConfig(num_exclude_recent=0, max_keyframes=32)
    from scaloam_tpu.models import scancontext as scm

    mgr = scm.SCManager(cfg)
    for c in clouds:
        p, m = _pad_cloud(c[:, :3], cfg.max_input_points)
        mgr.make_and_save(p, m)

    sector = 2.0 * np.pi / cfg.num_sector
    for k, n_sectors in ((4, 5), (13, 55), (19, 12)):
        yaw_true = n_sectors * sector
        c, s = np.cos(yaw_true), np.sin(yaw_true)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        rot = clouds[k][:, :3] @ R.T
        p, m = _pad_cloud(rot, cfg.max_input_points)
        q_sc = sc_ops.make_descriptor(p, m)
        idx, yaw, dist = scm.detect(mgr.db, q_sc, cfg, exclude_recent=False)
        assert int(idx) == k, (k, int(idx), float(dist))
        assert float(dist) < 0.15, float(dist)
        # shift-recovered yaw matches the applied rotation (mod 2pi), to
        # within one sector of quantization
        err = abs((float(yaw) - yaw_true + np.pi) % (2 * np.pi) - np.pi)
        assert err <= sector + 1e-6, (float(yaw), yaw_true)


# ---------------------------------------------------------------------------
# (b) two-stage ICP verification on real pairs
# ---------------------------------------------------------------------------


def _small_loop_cfg():
    """CPU-sized capacities; geometry parameters unchanged."""
    return dataclasses.replace(
        cfg_mod.LoopClosureConfig(),
        max_submap_points=16384,
        max_source_points=4096,
        coarse_source_points=1024,
        coarse_target_points=4096,
        icp_grid_xy=64,
        icp_grid_z=16,
        icp_cell_cap=16,
    )


def _make_system(kaist, n=_N_SCANS):
    clouds, poses = kaist
    cfg = cfg_mod.mulran_os1_64()
    cfg = cfg.replace(
        loop=_small_loop_cfg(),
        pgo=dataclasses.replace(cfg.pgo, max_keyframes=64, max_loops=8),
        scancontext=dataclasses.replace(cfg.scancontext, max_keyframes=64),
    )
    sys_ = pl.SlamSystem(cfg)
    for k in range(n):
        sys_.keyframes.append(
            pl.Keyframe(cloud=clouds[k][:, :3].copy(), time=float(k))
        )
        sys_.graph = pg.ensure_node_slot(sys_.graph, k)
        sys_.graph = pg.add_keyframe(
            sys_.graph, _np_pose(poses[k]), jnp.float32(0), jnp.array(False)
        )
    return sys_


def _pose_err(z, poses, curr, loop):
    """Errors of the accepted loop measurement vs the shipped GT
    Z = X_curr^-1 X_loop."""
    T_gt = np.linalg.inv(poses[curr]) @ poses[loop]
    T_z = np.asarray(se3.pose_to_matrix(z))
    t_err = np.linalg.norm(T_z[:3, 3] - T_gt[:3, 3])
    cos_r = (np.trace(T_gt[:3, :3].T @ T_z[:3, :3]) - 1.0) / 2.0
    r_err = np.degrees(np.arccos(np.clip(cos_r, -1, 1)))
    return t_err, r_err


def _sc_yaw(clouds, curr, loop):
    d_c = _descriptor(clouds[curr][:, :3])
    d_l = _descriptor(clouds[loop][:, :3])
    _, shift = sc_ops.sc_distance(jnp.asarray(d_c), jnp.asarray(d_l))
    return float(shift) * 2.0 * np.pi / 60


def test_icp_verify_accepts_real_overlap(kaist):
    """The production _icp_verify path on genuine overlapping pairs of
    real keyframes must accept and return the relative pose the shipped
    optimized_poses.txt implies (laserPosegraphOptimization.cpp:497-548).
    The SC yaw seed is computed from the real descriptors, exactly as the
    pipeline does."""
    clouds, poses = kaist
    sys_ = _make_system(kaist)
    for curr, loop in ((2, 0), (8, 0)):  # 2.0 m and 9.1 m separations
        z = sys_._icp_verify(curr, loop, _sc_yaw(clouds, curr, loop))
        assert z is not None, f"genuine overlap ({curr},{loop}) rejected"
        t_err, r_err = _pose_err(z, poses, curr, loop)
        assert t_err < 0.5, (curr, loop, t_err)
        assert r_err < 3.0, (curr, loop, r_err)


def test_icp_verify_tolerates_graph_drift(kaist):
    """In production the graph estimate seeding ICP is DRIFTED — perturb
    the stored pose of the query keyframe by 2 m / 5 deg and require the
    verification to still accept with an accurate measurement (the
    reference's ICP faces exactly this: its clouds are pre-transformed by
    drifted estimates, :473-494)."""
    clouds, poses = kaist
    sys_ = _make_system(kaist)
    curr, loop = 8, 0

    ang = np.deg2rad(5.0)
    Rz = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]]
    )
    P = poses[curr].copy()
    P[:3, :3] = Rz @ P[:3, :3]
    P[:3, 3] += np.array([1.4, -1.4, 0.1])
    sys_.graph = sys_.graph._replace(
        poses=Pose(
            sys_.graph.poses.quat.at[curr].set(_np_pose(P).quat),
            sys_.graph.poses.trans.at[curr].set(_np_pose(P).trans),
        )
    )
    z = sys_._icp_verify(curr, loop, _sc_yaw(clouds, curr, loop))
    assert z is not None, "drifted genuine overlap rejected"
    t_err, r_err = _pose_err(z, poses, curr, loop)
    assert t_err < 0.5, t_err
    assert r_err < 3.0, r_err


def test_icp_verify_rejects_garbage_source(kaist):
    """A structureless random source must fail the fitness/matched-fraction
    gates — the reference's 0.3 fitness rejection (:531)."""
    rng = np.random.default_rng(7)
    sys_ = _make_system(kaist)
    curr = 8
    fake = rng.uniform(-35, 35, size=(8000, 3)).astype(np.float32)
    fake[:, 2] = rng.uniform(-2, 6, size=8000)
    sys_.keyframes[curr] = pl.Keyframe(cloud=fake, time=float(curr))
    z = sys_._icp_verify(curr, 0, 0.0)
    assert z is None


# ---------------------------------------------------------------------------
# (b2) FULL pipeline on the real scan sequence (front-end on real returns)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_full_pipeline_real_scan_sequence():
    """The 21 real KAIST03 clouds fed as a SCAN SEQUENCE through the whole
    pipeline: features -> odometry -> mapping -> keyframes -> SC -> PGO,
    scored against the shipped optimized_poses.txt rows (VERDICT r2 task 2
    — the front-end's first real-data evidence; before this every
    feature/odometry/mapping validation was synthetic).

    The clouds are ~1.2 m apart (keyframe-scale motion — the reference's
    2-outer-pass GN handles it) and already 0.4 m-downsampled. Calibrated
    on CPU (tools/kaist03_e2e.py): ATE 0.031 m, final error 0.26 m over
    the 23.6 m course (~1.1% drift, dominated by slow z-drift)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "kaist03_e2e",
        os.path.join(os.path.dirname(__file__), "..", "tools", "kaist03_e2e.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.run(verbose=False)
    assert out["keyframes"] >= 19  # ~1.2 m spacing vs the 1 m gate
    assert out["ate_rmse_m"] < 0.1, out
    assert out["final_err_m"] < 0.6, out
    assert out["max_frame_err_m"] < 0.6, out


@pytest.mark.slow
def test_virtual_drive_continuous_full_rate():
    """CONTINUOUS full-rate sequence over REAL KAIST03 structure (VERDICT
    r4 task 6): the merged keyframe map re-rendered with the OS1-64 beam
    pattern at 8 interpolated poses per ~1.2 m keyframe segment (~0.15 m
    per frame — full 10 Hz scan rate at 1.5 m/s), driven through the whole
    pipeline and scored against the interpolated trajectory."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "virtual_kaist_drive",
        os.path.join(
            os.path.dirname(__file__), "..", "tools", "virtual_kaist_drive.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.run(substeps=8, verbose=False)
    assert out["frames"] == 161
    assert out["keyframes"] >= 19
    assert out["ate_rmse_all_frames_m"] < 0.1, out
    assert out["max_frame_err_m"] < 0.5, out


# ---------------------------------------------------------------------------
# (c) PGO over the real pose chain
# ---------------------------------------------------------------------------


def test_pgo_real_chain_drift_recovery(kaist):
    """Build the real KAIST03 keyframe chain (subsampled) with a systematic
    odometric yaw drift injected, close it with loop factors at the real
    revisit pairs (relative poses from the shipped optimized log, i.e.
    as-if-ICP-verified), optimize, and require the trajectory to recover
    toward the shipped poses (the reference's runISAM2opt + updatePoses,
    laserPosegraphOptimization.cpp:791-808,408-431)."""
    _, poses = kaist
    step = 8
    T = poses[::step]  # ~398 nodes over the full 7 km course
    n = len(T)

    # odometry relatives from the shipped chain, with a small yaw bias
    # injected per step (the classic accumulating heading drift)
    # 0.0004 rad/step accumulates to ~28 m RMSE over the course (~0.4% of
    # 7 km — typical LOAM-class odometric drift). Much beyond that (e.g.
    # 84 m) exceeds the Cauchy(k=1) robust basin and loops are suppressed
    # as outliers — gtsam with the reference's noise model stalls the
    # same way; robust loop closure is not global convergence.
    bias = 0.0004  # rad/step
    Rz = np.array(
        [
            [np.cos(bias), -np.sin(bias), 0],
            [np.sin(bias), np.cos(bias), 0],
            [0, 0, 1],
        ]
    )
    cfg = cfg_mod.PGOConfig(
        max_keyframes=512, max_loops=128, gn_iterations=6
    )

    # real revisit pairs: spatially close (<3 m), temporally far (>40 nodes)
    t_all = np.stack([x[:3, 3] for x in T])
    loop_at = {}
    for i in range(n):
        d = np.linalg.norm(t_all - t_all[i], axis=1)
        js = np.where((d < 3.0) & (np.arange(n) < i - 40))[0]
        if len(js) and (not loop_at or i - max(loop_at) >= 4):
            loop_at[i] = int(js[np.argmin(d[js])])
        if len(loop_at) >= 96:
            break
    assert len(loop_at) >= 10, f"expected real revisits, got {len(loop_at)}"

    # Incremental protocol, exactly as the production pipeline: append
    # keyframes as they arrive (drifted odometry increments), add each
    # loop when its keyframe arrives, and re-optimize at that cadence —
    # iSAM2's incremental behavior means Cauchy always sees loops while
    # the local drift is still in-basin (:791-808).
    graph = pg.init_graph(cfg)
    drifted = [T[0]]
    drift_only = [T[0]]
    for k in range(n):
        if k > 0:
            rel = np.linalg.inv(T[k - 1]) @ T[k]
            rel = rel.copy()
            rel[:3, :3] = Rz @ rel[:3, :3]
            drift_only.append(drift_only[-1] @ rel)
            # odometry pose fed to the graph continues from the graph's
            # current (possibly loop-corrected) estimate
            drifted.append(drifted[-1] @ rel)
        graph = pg.add_keyframe(
            graph, _np_pose(drifted[k]), jnp.float32(0), jnp.array(False)
        )
        if k in loop_at:
            Z = np.linalg.inv(T[k]) @ T[loop_at[k]]
            graph = pg.add_loop(
                graph, jnp.int32(k), jnp.int32(loop_at[k]), _np_pose(Z)
            )
            graph = pg.optimize(graph, cfg, cg_iters=64)

    drift_rmse = np.sqrt(
        np.mean(np.sum((np.stack(drift_only)[:, :3, 3] - t_all) ** 2, axis=1))
    )
    assert drift_rmse > 5.0  # the injected drift is substantial

    graph = pg.optimize(graph, cfg, cg_iters=128)
    opt_t = np.asarray(graph.poses.trans)[:n]
    opt_rmse = np.sqrt(np.mean(np.sum((opt_t - t_all) ** 2, axis=1)))
    # The optimum is NOT the GT chain: the biased odometry factors (info
    # 1e4-1e6) still pull between loop anchors, so a few meters of
    # residual over the 7 km course is the true MAP. What matters is the
    # order-of-magnitude recovery the loops buy.
    assert opt_rmse < 0.15 * drift_rmse, (opt_rmse, drift_rmse)
    assert opt_rmse < 4.0, opt_rmse
