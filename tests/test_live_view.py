"""Live observability: the headless analog of the reference's rviz topics
(`/aft_pgo_path`, `/odom_path`, loop-pair markers,
src/laserPosegraphOptimization.cpp:497-515,902-908) — an auto-refreshing
live.html rewritten on every artifact-flush cycle."""

import numpy as np

from scaloam_tpu.utils import live


def _poses_from_xy(xy):
    n = len(xy)
    T = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    T[:, 0, 3] = [p[0] for p in xy]
    T[:, 1, 3] = [p[1] for p in xy]
    return T


def test_write_live_view_contents(tmp_path):
    opt = _poses_from_xy([(0, 0), (10, 0), (10, 10), (0, 10)])
    odom = _poses_from_xy([(0, 0), (10.2, 0.1), (10.3, 10.2), (0.4, 10.3)])
    path = live.write_live_view(
        str(tmp_path), opt, odom, loop_pairs=[(3, 0)], extra="ATE 0.02 m"
    )
    html = open(path).read()
    # auto-refresh + both series + the loop chord + legend + stats
    assert "http-equiv='refresh'" in html
    assert html.count("<polyline") == 2
    assert "loop 3" in html
    assert "optimized (PGO)" in html and "odometry" in html
    assert "keyframes 4" in html and "loop closures 1" in html
    assert "ATE 0.02 m" in html
    # atomic write: no torn temp file left behind
    assert not (tmp_path / "live.html.tmp").exists()


def test_write_live_view_empty_and_single(tmp_path):
    # must not crash before the first keyframe or with one pose
    live.write_live_view(str(tmp_path), np.zeros((0, 4, 4)),
                         np.zeros((0, 4, 4)), [])
    live.write_live_view(str(tmp_path), _poses_from_xy([(1, 2)]),
                         _poses_from_xy([(1, 2)]), [])
    assert (tmp_path / "live.html").exists()


def test_flush_writes_live_view(tmp_path):
    """flush_artifacts with an attached writer (live on by default) must
    leave live.html next to the session artifacts."""
    import dataclasses

    import jax.numpy as jnp

    from scaloam_tpu import config
    from scaloam_tpu.models import posegraph as pg
    from scaloam_tpu.models.pipeline import Keyframe, SlamSystem
    from scaloam_tpu.types import Pose

    cfg = config.kitti_hdl64()
    cfg = cfg.replace(
        pgo=dataclasses.replace(cfg.pgo, max_keyframes=64, max_loops=8),
        scancontext=dataclasses.replace(cfg.scancontext, max_keyframes=64),
    )
    d = str(tmp_path / "sess")
    s = SlamSystem(cfg)
    s.attach_session_writer(d)
    rng = np.random.default_rng(0)
    cap = cfg.scancontext.max_input_points
    for k in range(3):
        cloud = rng.uniform(-8, 8, (300, 3)).astype(np.float32)
        s.keyframes.append(Keyframe(cloud=cloud, time=0.1 * k, frame=k))
        s.kf_times.append(0.1 * k)
        xyz = np.zeros((cap, 3), np.float32)
        m = np.zeros(cap, bool)
        xyz[: len(cloud)] = cloud
        m[: len(cloud)] = True
        s.sc.make_and_save(jnp.asarray(xyz), jnp.asarray(m))
        pose = Pose(jnp.array([1.0, 0, 0, 0], jnp.float32),
                    jnp.array([2.0 * k, 0, 0], jnp.float32))
        s.graph = pg.add_keyframe(
            s.graph, pose, np.float32(0.0), np.bool_(False), n_nodes=k
        )
    s.flush_artifacts()
    html = open(str(tmp_path / "sess" / "live.html")).read()
    assert "keyframes 3" in html
    # --no-live path: attach with live=False must not rewrite it
    s.attach_session_writer(str(tmp_path / "sess2"), live=False)
    s.flush_artifacts()
    assert not (tmp_path / "sess2" / "live.html").exists()
