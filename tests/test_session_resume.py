"""Session save + resume on the SlamSystem (the checkpoint/resume feature
the reference lacks — SURVEY.md §5)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from scaloam_tpu import config
from scaloam_tpu.models import posegraph as pg
from scaloam_tpu.models.pipeline import Keyframe, SlamSystem
from scaloam_tpu.types import Pose
from scaloam_tpu.utils import synthetic


def _small_backend_cfg():
    cfg = config.kitti_hdl64()
    return cfg.replace(
        mapping=dataclasses.replace(
            cfg.mapping, cell_size=4.0, grid_xy=32, grid_z=8,
            corner_cell_cap=32, surf_cell_cap=64,
            max_corner_input=2048, max_surf_input=8192,
        ),
        pgo=dataclasses.replace(cfg.pgo, max_keyframes=64, max_loops=8),
        scancontext=dataclasses.replace(cfg.scancontext, max_keyframes=64),
    )


def test_flush_crash_resume_restores_loops(tmp_path):
    """Kill-and-resume: the periodic flush (reference's per-cycle dump,
    laserPosegraphOptimization.cpp:803-805) alone must leave a session that
    resumes to an EQUIVALENT graph — including accepted loop factors
    (VERDICT r2 missing #2/#3)."""
    cfg = _small_backend_cfg()
    d = str(tmp_path / "sess")
    rng = np.random.default_rng(7)

    s1 = SlamSystem(cfg)
    s1.attach_session_writer(d)
    cap = cfg.scancontext.max_input_points
    pose_t = np.zeros(3, np.float32)
    n = 6
    for k in range(n):
        cloud = rng.uniform(-8, 8, (300, 3)).astype(np.float32)
        s1.keyframes.append(Keyframe(cloud=cloud, time=0.1 * k, frame=k))
        s1.kf_times.append(0.1 * k)
        xyz = np.zeros((cap, 3), np.float32)
        m = np.zeros(cap, bool)
        xyz[: len(cloud)] = cloud
        m[: len(cloud)] = True
        s1.sc.make_and_save(jnp.asarray(xyz), jnp.asarray(m))
        pose_t = pose_t + np.array([2.0, 0.1 * k, 0.0], np.float32)
        pose = Pose(jnp.array([1.0, 0, 0, 0], jnp.float32), jnp.asarray(pose_t))
        s1.graph = pg.add_keyframe(
            s1.graph, pose, np.float32(0.0), np.bool_(False), n_nodes=k
        )
    rel = Pose(
        jnp.array([1.0, 0, 0, 0], jnp.float32),
        jnp.array([0.5, 0.0, 0.0], jnp.float32),
    )
    s1.graph = pg.add_loop(s1.graph, jnp.int32(n - 1), jnp.int32(0), rel,
                           n_loops=0)
    s1.loops_found.append((n - 1, 0))

    # the periodic flush is all that ran before the "crash" — no
    # save_session
    s1.flush_artifacts()

    s2 = SlamSystem.resume(d, cfg)
    assert len(s2.keyframes) == n
    assert int(s2.graph.n_nodes) == n
    # loop factors restored, not just the odometry chain
    assert s2.loops_found == [(n - 1, 0)]
    assert int(s2.graph.n_loops) == 1
    np.testing.assert_array_equal(np.asarray(s2.graph.loop_i)[:1], [n - 1])
    np.testing.assert_array_equal(np.asarray(s2.graph.loop_j)[:1], [0])
    np.testing.assert_allclose(
        np.asarray(s2.graph.loop_rel.trans)[0], [0.5, 0.0, 0.0], atol=1e-5
    )
    # graph equivalence: both graphs optimize to the same trajectory
    g1 = pg.optimize(s1.graph, cfg.pgo, cg_iters=32)
    g2 = pg.optimize(s2.graph, cfg.pgo, cg_iters=32)
    np.testing.assert_allclose(
        np.asarray(g2.poses.trans)[:n], np.asarray(g1.poses.trans)[:n],
        atol=1e-3,
    )
    # re-attaching the writer to the same directory continues, not clobbers
    s2.attach_session_writer(d)
    assert s2._writer.n_written == n


@pytest.mark.slow
def test_save_and_resume(tmp_path):
    cfg = config.kitti_hdl64()
    cfg = cfg.replace(
        sensor=dataclasses.replace(cfg.sensor, minimum_range=1.0),
        mapping=dataclasses.replace(
            cfg.mapping, cell_size=4.0, grid_xy=32, grid_z=8,
            corner_cell_cap=32, surf_cell_cap=64,
            max_corner_input=2048, max_surf_input=8192,
        ),
        pgo=dataclasses.replace(cfg.pgo, keyframe_meter_gap=1.0,
                                max_keyframes=64, max_loops=8),
        scancontext=dataclasses.replace(cfg.scancontext, max_keyframes=64),
    )
    world = synthetic.make_world(seed=9)
    scans, _ = synthetic.simulate_trajectory(
        world, n_frames=5, speed=1.0, radius=25.0, n_azimuth=720, seed=50
    )
    s1 = SlamSystem(cfg)
    for i, s in enumerate(scans):
        s1.process_scan(s, time=0.1 * i)
    n_kf = len(s1.keyframes)
    assert n_kf >= 3

    d = str(tmp_path / "sess")
    s1.save_session(d)

    s2 = SlamSystem.resume(d, cfg)
    assert len(s2.keyframes) == n_kf
    assert int(s2.graph.n_nodes) == n_kf
    assert int(s2.sc.db.count) == n_kf
    np.testing.assert_allclose(
        s2.optimized_poses()[:, :3, 3],
        s1.optimized_poses()[:, :3, 3],
        atol=1e-4,
    )
    # resumed descriptors match (precision-3 SCD roundtrip)
    np.testing.assert_allclose(
        np.asarray(s2.sc.db.descriptors[0]),
        np.asarray(s1.sc.db.descriptors[0]),
        rtol=6e-3, atol=1e-3,
    )
    # intensity channel (ring + scan_period*relTime, scanRegistration.cpp:252)
    # survives keyframe storage, Scans/*.pcd, and resume
    for s in (s1, s2):
        kf = s.keyframes[0]
        assert kf.intensity is not None and len(kf.intensity) == len(kf.cloud)
        assert kf.intensity.min() >= 0.0
        assert kf.intensity.max() < cfg.sensor.n_scans + 0.2
    np.testing.assert_allclose(
        s2.keyframes[0].intensity, s1.keyframes[0].intensity, atol=1e-5
    )
