"""Every sensor preset runs the front-end end-to-end.

The reference ships one launch file per sensor (launch/*.launch); parity
means each preset — ring-id map, range-image geometry, capacities — feeds
the same pipeline. Each case simulates the matching beam ladder and checks
feature extraction, two odometry steps, and one mapping step produce sane,
finite outputs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scaloam_tpu import config
from scaloam_tpu.models import mapping as mapping_mod
from scaloam_tpu.models import odometry as odometry_mod
from scaloam_tpu.ops import features
from scaloam_tpu.types import LidarScan
from scaloam_tpu.utils import synthetic


@pytest.mark.parametrize("preset", ["vlp16", "hdl32", "mulran_os1_64",
                                    "kitti_hdl64"])
def test_preset_frontend_end_to_end(preset):
    cfg = config.PRESETS[preset]()
    world = synthetic.make_world(seed=4, n_boxes=40, extent=50.0)
    scans, _ = synthetic.simulate_trajectory(
        world, n_frames=3, speed=0.8, radius=30.0,
        n_scans=cfg.sensor.n_scans, n_azimuth=512,
        lidar_type=cfg.sensor.lidar_type, seed=11,
    )
    o_state = odometry_mod.init_state(cfg)
    m_state = mapping_mod.init_state(cfg)
    for raw in scans:
        assert len(raw) > 1000, "simulator produced too few points"
        scan = LidarScan.from_numpy(raw, cfg.sensor.max_points)
        feats = features.extract_features(scan, cfg)
        n_ls = int(jnp.sum(feats.less_sharp.mask))
        n_lf = int(jnp.sum(feats.less_flat.mask))
        assert n_lf > 100, f"{preset}: no surf features"
        o_state, o_out = odometry_mod.odometry_step(o_state, feats, cfg)
        m_state, m_out = mapping_mod.mapping_step(
            m_state, o_out.world, feats.less_sharp, feats.less_flat, cfg
        )
    # Poses stay finite and bounded (3 frames at 0.8 m/frame).
    t = np.asarray(m_out.pose.trans)
    assert np.all(np.isfinite(t))
    assert np.linalg.norm(t) < 10.0
    assert int(m_out.map_surf_count) > 100
