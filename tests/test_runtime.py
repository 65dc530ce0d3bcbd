"""Async pipelined runtime: queues behave like the reference's; the
threaded pipeline produces the same odometry as the sync driver."""

import dataclasses
import time

import numpy as np
import pytest

from scaloam_tpu import config
from scaloam_tpu.runtime.queues import BoundedQueue


@pytest.fixture
def no_persistent_compile_cache():
    """XLA:CPU segfaults/aborts when compiling this file's BIG fresh
    executables (vlp16@8192 feature/odometry/mapping kernels) late in a
    process that has accumulated the whole suite's executables —
    reproduced 5x at the same suite position with the cache on, off, from
    worker threads AND from the main thread, while either half of the
    suite alone passes (JIT code-memory exhaustion class). Mitigate by
    dropping all accumulated executables first, and keep the persistent
    cache out of the picture for these tests (its read/write paths were
    implicated in earlier crashes too)."""
    import jax
    from jax._src import compilation_cache as cc

    jax.clear_caches()
    # Changing the cache DIR is not enough: the cache object and the
    # is_cache_used verdict are cached globally once initialized —
    # disable the feature flag AND reset so the next check re-evaluates.
    jax.config.update("jax_enable_compilation_cache", False)
    cc.reset_cache()
    yield
    jax.config.update("jax_enable_compilation_cache", True)
    cc.reset_cache()


def test_bounded_queue_drop_oldest():
    q = BoundedQueue(maxlen=3)
    for i in range(5):
        q.put(i)
    assert q.dropped == 2
    assert q.get() == 2


def test_bounded_queue_get_latest():
    q = BoundedQueue(maxlen=10)
    for i in range(5):
        q.put(i)
    assert q.get_latest() == 4
    assert q.dropped == 4
    assert len(q) == 0


def test_bounded_queue_close_unblocks():
    q = BoundedQueue()
    t0 = time.time()
    q.close()
    assert q.get(timeout=5.0) is None
    assert time.time() - t0 < 1.0


@pytest.mark.slow
@pytest.mark.parametrize("fused", [True, False])
def test_async_pipeline_matches_sync_odometry(no_persistent_compile_cache,
                                              fused):
    """The async runtime (fused single-thread front-end AND the separate
    3-stage-thread topology) must produce the sync driver's odometry —
    this doubles as the fused-vs-separate-stages equivalence test
    (models/frontend.py): the sync driver runs the separate executables."""
    from scaloam_tpu.models.pipeline import SlamSystem
    from scaloam_tpu.runtime.pipeline import AsyncSlamPipeline
    from scaloam_tpu.utils import synthetic

    cfg = config.kitti_hdl64()
    cfg = cfg.replace(
        sensor=dataclasses.replace(cfg.sensor, minimum_range=1.0),
        mapping=dataclasses.replace(
            cfg.mapping,
            cell_size=4.0, grid_xy=32, grid_z=8,
            corner_cell_cap=32, surf_cell_cap=64,
            max_corner_input=2048, max_surf_input=8192,
        ),
        runtime=dataclasses.replace(cfg.runtime, fused_frontend=fused),
    )
    world = synthetic.make_world(seed=8)
    scans, _ = synthetic.simulate_trajectory(
        world, n_frames=6, speed=0.8, radius=25.0, n_azimuth=720, seed=40
    )

    sync = SlamSystem(cfg)
    sync_t = []
    for i, s in enumerate(scans):
        r = sync.process_scan(s, time=0.1 * i)
        sync_t.append(np.asarray(r.odom_pose.trans))

    pipe = AsyncSlamPipeline(cfg, drop_backlog=False)
    assert pipe.fused == fused
    pipe.start()
    for i, s in enumerate(scans):
        pipe.feed(0.1 * i, s)
    pipe.finish()

    assert len(pipe.odom_results) == len(scans)
    assert pipe.dropped_frames == 0
    for (t, got), want in zip(pipe.odom_results, sync_t):
        np.testing.assert_allclose(got, want, atol=1e-4)
    # keyframe count parity with the sync driver (the fused path routes
    # keyframe prep through the step's lax.cond + _add_keyframe_prepared)
    assert len(pipe.sys.keyframes) == len(sync.keyframes)


@pytest.mark.parametrize("fused", [True, False])
def test_async_pipeline_drains_backlog_on_finish(no_persistent_compile_cache,
                                                 fused):
    """finish() right after feeding must DRAIN, not kill, the stages: exit
    conditions are closed-and-empty input queues, never a stop flag checked
    against a momentarily-empty queue (that races with a slow upstream and
    used to shut every stage down mid-stream)."""
    from scaloam_tpu.runtime.pipeline import AsyncSlamPipeline
    from scaloam_tpu.utils import synthetic

    cfg = config.vlp16()
    cfg = cfg.replace(
        sensor=dataclasses.replace(
            cfg.sensor, max_points=8192, max_points_per_ring=512
        ),
        runtime=dataclasses.replace(cfg.runtime, fused_frontend=fused),
    )
    world = synthetic.make_world(seed=2, n_boxes=20, extent=40.0)
    scans, _ = synthetic.simulate_trajectory(
        world, n_frames=3, speed=0.8, radius=20.0,
        n_scans=cfg.sensor.n_scans, n_azimuth=450, seed=11,
    )
    pipe = AsyncSlamPipeline(cfg, drop_backlog=False)
    pipe.start()
    for f, s in enumerate(scans):
        pipe.feed(0.1 * f, s)
    pipe.finish(timeout=300.0)  # immediately: backlog must still drain
    assert len(pipe.odom_results) == len(scans)
    assert len(pipe.mapped_results) == len(scans)
    assert pipe.dropped_frames == 0


def test_backend_device_placement_equivalence():
    """Pipeline parallelism over chips: with `backend_device` set, the
    backend state (pose graph, SC DB) and its solves live on a SECOND
    device — the reference's process-per-stage topology mapped to devices
    (launch/aloam_mulran.launch:30-33) — and the trajectory matches the
    single-device system exactly. Validated on the virtual CPU mesh; on
    real hardware the keyframe hop rides the ICI."""
    import jax

    from scaloam_tpu.models.pipeline import SlamSystem
    from scaloam_tpu.utils import synthetic

    assert len(jax.devices()) >= 2
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
        scancontext=dataclasses.replace(
            cfg.scancontext, max_keyframes=64, max_input_points=32768
        ),
    )
    world = synthetic.make_world(seed=4, n_boxes=30, extent=40.0)
    scans, _ = synthetic.simulate_trajectory(
        world, n_frames=4, speed=1.0, radius=20.0, n_azimuth=720, seed=21
    )

    s0 = SlamSystem(cfg)
    s1 = SlamSystem(cfg, backend_device=jax.devices()[1])
    for i, s in enumerate(scans):
        s0.process_scan(s, time=0.1 * i)
        s1.process_scan(s, time=0.1 * i)

    assert len(s1.keyframes) == len(s0.keyframes) >= 2
    # backend state genuinely lives on device 1
    assert jax.devices()[1] in s1.graph.poses.trans.devices()
    assert jax.devices()[1] in s1.sc.db.descriptors.devices()
    # front-end state stays on device 0
    assert jax.devices()[0] in s1.m_state.corner_grid.pts.devices()
    np.testing.assert_allclose(
        s1.optimized_poses()[:, :3, 3], s0.optimized_poses()[:, :3, 3],
        atol=1e-5,
    )
