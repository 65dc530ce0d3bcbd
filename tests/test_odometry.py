"""Scan-to-scan odometry: known-motion recovery on synthetic scans."""

import numpy as np
import jax.numpy as jnp

from scaloam_tpu import config
from scaloam_tpu.models import odometry
from scaloam_tpu.ops import features, se3
from scaloam_tpu.types import LidarScan, Pose


def _pose_from_T(T):
    return Pose(
        se3.mat_to_quat(jnp.array(T[:3, :3], jnp.float32)),
        jnp.array(T[:3, 3], jnp.float32),
    )


def test_odometry_recovers_motion():
    from scaloam_tpu.utils import synthetic

    cfg = config.kitti_hdl64()
    world = synthetic.make_world(seed=3)
    scans, gt = synthetic.simulate_trajectory(
        world, n_frames=3, speed=0.8, radius=30.0, n_azimuth=900, seed=10
    )

    state = odometry.init_state(cfg)
    outs = []
    for s in scans:
        feats = features.extract_features(
            LidarScan.from_numpy(s, cfg.sensor.max_points), cfg
        )
        state, out = odometry.odometry_step(state, feats, cfg)
        outs.append(out)

    for i in (1, 2):
        T_rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        est = outs[i].rel
        t_err = np.linalg.norm(np.asarray(est.trans) - T_rel[:3, 3])
        gt_q = np.asarray(_pose_from_T(T_rel).quat)
        dq = np.asarray(se3.quat_mul(se3.quat_conj(est.quat), jnp.array(gt_q)))
        rot_err = 2 * np.arccos(min(1.0, abs(dq[0])))
        assert int(outs[i].n_corner_corr) > 20
        assert int(outs[i].n_surf_corr) > 100
        assert t_err < 0.1, f"frame {i}: trans err {t_err}"
        assert rot_err < 0.02, f"frame {i}: rot err {rot_err}"

    # world pose accumulates
    w2 = np.asarray(outs[2].world.trans)
    gt_w2 = (np.linalg.inv(gt[0]) @ gt[2])[:3, 3]
    assert np.linalg.norm(w2 - gt_w2) < 0.2
