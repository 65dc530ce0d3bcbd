"""Scan-to-map stage: drift correction on synthetic frames."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from scaloam_tpu import config
from scaloam_tpu.models import mapping, odometry
from scaloam_tpu.ops import features, se3
from scaloam_tpu.types import LidarScan, Pose
from scaloam_tpu.utils import synthetic


def _small_cfg():
    cfg = config.kitti_hdl64()
    return cfg.replace(
        mapping=dataclasses.replace(
            cfg.mapping,
            cell_size=4.0, grid_xy=32, corner_cell_cap=32, surf_cell_cap=64,
            grid_z=8,
            max_corner_input=2048,
            max_surf_input=8192,
        )
    )


def test_mapping_tracks_and_corrects():
    cfg = _small_cfg()
    world = synthetic.make_world(seed=5)
    scans, gt = synthetic.simulate_trajectory(
        world, n_frames=5, speed=0.9, radius=28.0, n_azimuth=900, seed=20
    )

    o_state = odometry.init_state(cfg)
    m_state = mapping.init_state(cfg)
    gt0_inv = np.linalg.inv(gt[0])
    errs = []
    for i, s in enumerate(scans):
        feats = features.extract_features(
            LidarScan.from_numpy(s, cfg.sensor.max_points), cfg
        )
        o_state, o_out = odometry.odometry_step(o_state, feats, cfg)
        m_state, m_out = mapping.mapping_step(
            m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
        )
        T = gt0_inv @ gt[i]
        err = np.linalg.norm(np.asarray(m_out.pose.trans) - T[:3, 3])
        errs.append(err)

    assert int(m_out.map_corner_count) > 50
    assert int(m_out.map_surf_count) > 500
    assert int(m_out.n_surf_corr) > 200
    assert max(errs) < 0.15, errs


def test_mapping_corrects_noisy_odometry():
    """Inject odometry drift; mapping against the map should pull it back."""
    cfg = _small_cfg()
    world = synthetic.make_world(seed=6)
    scans, gt = synthetic.simulate_trajectory(
        world, n_frames=4, speed=0.8, radius=30.0, n_azimuth=900, seed=30
    )
    gt0_inv = np.linalg.inv(gt[0])

    m_state = mapping.init_state(cfg)
    rng = np.random.default_rng(1)
    drift_err, raw_err = [], []
    for i, s in enumerate(scans):
        feats = features.extract_features(
            LidarScan.from_numpy(s, cfg.sensor.max_points), cfg
        )
        T = gt0_inv @ gt[i]
        noise = rng.normal(0, 0.12, size=3) if i > 0 else np.zeros(3)
        odom_pose = Pose(
            se3.mat_to_quat(jnp.array(T[:3, :3], jnp.float32)),
            jnp.array(T[:3, 3] + noise, jnp.float32),
        )
        m_state, m_out = mapping.mapping_step(
            m_state, odom_pose, feats.less_sharp, feats.less_flat, cfg
        )
        drift_err.append(np.linalg.norm(np.asarray(m_out.pose.trans) - T[:3, 3]))
        raw_err.append(np.linalg.norm(noise))

    # refined pose error beats the injected odometry error on noisy frames
    assert np.mean(drift_err[1:]) < np.mean(raw_err[1:])
    assert max(drift_err) < 0.15, drift_err
