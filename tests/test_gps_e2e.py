"""GPS altitude factors through the FULL SlamSystem (VERDICT r4 item 7).

The reference ingests GPS in its own handler thread, associates each new
keyframe with the nearest-in-time GPS fix, and adds an altitude-only
robust factor (src/laserPosegraphOptimization.cpp:265-282,302-308,581-594).
Unit coverage existed (tests/test_posegraph.py::test_gps_pins_altitude);
this drives the whole path end-to-end: streamed 4 Hz GPS events ->
_match_gps association at keyframe time -> graph factors -> optimize,
on a course whose odometry climbs while GPS insists the altitude is
constant — the optimized trajectory must follow GPS.

Also pins two fixes this test exposed/enforces:
  - the first-fix altitude offset (`gpsAltitudeInitOffset`, reference
    :619-622,675): GPS events here carry the ABSOLUTE course altitude
    (1.8 m), and the factors must land in the graph's odometry frame;
  - `_pending_gps` must stay BOUNDED (the r4 list grew one entry per GPS
    event for the whole run and was scanned linearly per keyframe).
"""

import dataclasses

import numpy as np

from scaloam_tpu import config
from scaloam_tpu.models.pipeline import SlamSystem
from scaloam_tpu.utils import synthetic


def _gps_cfg():
    cfg = config.vlp16()
    return cfg.replace(
        sensor=dataclasses.replace(
            cfg.sensor, max_points=16384, max_points_per_ring=1024,
            minimum_range=1.0, n_scans=16,
        ),
        mapping=dataclasses.replace(
            cfg.mapping,
            cell_size=4.0, grid_xy=24, grid_z=8,
            corner_cell_cap=16, surf_cell_cap=32,
            max_corner_input=1024, max_surf_input=4096,
        ),
        scancontext=dataclasses.replace(
            cfg.scancontext, max_keyframes=64, max_input_points=16384,
        ),
        pgo=dataclasses.replace(
            cfg.pgo,
            keyframe_meter_gap=1.0, max_keyframes=64, max_loops=8,
            keyframe_cloud_capacity=16384,
            # Altitude-recovery weighting: relax the odometry z stiffness
            # (default sigma 1 cm/edge would out-vote GPS on a short chain)
            # and trust GPS tightly; large cauchy_k = effectively Gaussian
            # (mechanism test, same convention as test_gps_pins_altitude).
            odom_trans_variance=1e-2, gps_z_variance=0.01, cauchy_k=100.0,
            gn_iterations=8, optimize_every_n_keyframes=2,
        ),
    )


def test_gps_altitude_recovery_e2e():
    cfg = _gps_cfg()
    world = synthetic.make_world(seed=5, n_boxes=40, extent=30.0)
    n_frames = 30
    climb = 0.06  # m/frame: ~1.7 m ascent the GPS contradicts
    scans, gt = synthetic.simulate_trajectory(
        world, n_frames=n_frames, speed=1.0, radius=40.0,
        n_scans=16, n_azimuth=720, seed=21, lidar_type="VLP16",
        climb=climb,
    )

    sys_ = SlamSystem(cfg)
    gps_t = 0.0
    z0 = float(gt[0, 2, 3])
    for i, s in enumerate(scans):
        t = 0.1 * i
        # 4 Hz GPS stream insisting altitude never changed (the climb is
        # "drift" from GPS's point of view).
        while gps_t <= t:
            sys_.add_gps(gps_t, z0)
            gps_t += 0.25
        sys_.process_scan(s, time=t)

    n_kf = len(sys_.keyframes)
    assert n_kf >= 10

    # The association window is gps_time_tolerance=0.1 s around a 4 Hz
    # stream: roughly every other keyframe gets a factor.
    n_gps = int(np.asarray(sys_.graph.gps_valid).sum())
    assert n_gps >= n_kf // 3, (n_gps, n_kf)

    odom_z = sys_.odometry_keyframe_poses()[:, 2, 3]
    opt_z = sys_.optimized_poses()[:, 2, 3]
    assert odom_z[-1] - odom_z[0] > 1.0, "course did not climb in odometry"
    # GPS pulls the tail back to the constant altitude; odometry keeps the
    # climb. Compare drift-from-start.
    assert abs(opt_z[-1] - opt_z[0]) < 0.4 * (odom_z[-1] - odom_z[0]), (
        opt_z[-1] - opt_z[0], odom_z[-1] - odom_z[0]
    )

    # Bounded buffer: everything older than the last keyframe's window has
    # been pruned; only the most recent in-window events may remain.
    assert len(sys_._pending_gps) <= 4, len(sys_._pending_gps)
