"""Session save + resume on the SlamSystem (the checkpoint/resume feature
the reference lacks — SURVEY.md §5)."""

import dataclasses

import numpy as np
import pytest

from scaloam_tpu import config
from scaloam_tpu.models.pipeline import SlamSystem
from scaloam_tpu.utils import synthetic


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
