"""Asynchronous pipelined runtime — the 4-node ROS graph as host threads.

Reference topology (launch/aloam_mulran.launch:30-33): four OS processes
communicate over TCPROS; stages overlap so odometry holds 10 Hz while
mapping/PGO lag and self-throttle. Here: one thread per stage with
BoundedQueue links; device stages stay jitted, the GIL is released while
XLA executes, so stages genuinely overlap on host+device.

  ingest -> [registration] -> featq -> [odometry] -> mapq(drop-oldest)
         -> [mapping] -> kfq -> [backend: keyframes/SC/ICP/PGO]

The backend thread mirrors the PGO node's worker threads
(src/laserPosegraphOptimization.cpp:910-916) collapsed to one consumer at
keyframe rate plus periodic loop detection/optimization, preserving the
1 Hz cadences (:732-742,:791-808) in wall-clock terms.
"""

from __future__ import annotations

import threading
import time
from typing import List, Optional

import jax
import numpy as np

from scaloam_tpu.config import SlamConfig
from scaloam_tpu.models import mapping as mapping_mod
from scaloam_tpu.models import odometry as odometry_mod
from scaloam_tpu.models.pipeline import SlamSystem
from scaloam_tpu.ops import features
from scaloam_tpu.runtime.queues import BoundedQueue
from scaloam_tpu.types import LidarScan


def _materialize_ready(results, ptr, keep=128):
    """Advance `ptr` over `results`, converting long-COMPLETED async-copied
    device scalars to numpy — bounds the live device-buffer count on long
    runs (live buffers degrade dispatch on this stack, CLAUDE.md) without
    blocking: entries must be BOTH `keep` frames old AND is_ready().

    keep is deliberately large: is_ready() means computed, NOT host-copied
    — an np.asarray issued right at compute completion still pays the
    ~23 ms tunnel RTT for the in-flight copy, which serialized the whole
    pipeline to ~10 scans/s at keep=8 (e2e ablation bs_abl_*: mat_off 21.6
    vs 10.4 with). At 128 frames (~1.5 s) the async copy has long landed
    and the conversion is a host-cache read."""
    while ptr < len(results) - keep:
        t, x = results[ptr]
        if isinstance(x, np.ndarray):
            ptr += 1
            continue
        if not x.is_ready():
            break
        results[ptr] = (t, np.asarray(x))
        ptr += 1
    return ptr


class AsyncSlamPipeline:
    """Threaded wrapper over SlamSystem's stages with real-time semantics.

    The mapping stage uses get_latest() (drop-backlog), so under overload
    the odometry rate is preserved and mapping processes the freshest frame,
    exactly like the reference's real-time policy."""

    def __init__(self, cfg: SlamConfig, drop_backlog: Optional[bool] = None,
                 backend_device=None, system: Optional[SlamSystem] = None):
        """`system` lets a pre-built SlamSystem (e.g. SlamSystem.resume)
        run under the async runtime; by default a fresh one is created."""
        self.cfg = cfg
        self.drop_backlog = (
            cfg.runtime.drop_backlog if drop_backlog is None else drop_backlog
        )
        # Fused mode: one front-end thread, one jit per frame
        # (models/frontend.py). The fused step maps every frame, so a
        # skip_frame cadence falls back to the separate-stage threads.
        self.fused = (
            cfg.runtime.fused_frontend and cfg.odometry.skip_frame == 1
        )
        self.sys = system if system is not None else SlamSystem(
            cfg, backend_device=backend_device
        )
        qd = cfg.runtime.queue_depth
        self.scan_q = BoundedQueue(qd, "scans")
        self.feat_q = BoundedQueue(qd, "features")
        self.map_q = BoundedQueue(qd, "mapping")
        self.kf_q = BoundedQueue(qd, "keyframes")
        self.odom_results: List = []
        self.mapped_results: List = []
        self._o_mat = 0  # materialization pointers (_materialize_ready)
        self._m_mat = 0
        self._threads: List[threading.Thread] = []
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._ingest_done = threading.Event()
        self._kf_flag = threading.Event()  # keyframe(s) since last detect
        # Per-stage host busy-time (seconds outside queue waits) + frame
        # counts — the e2e bottleneck diagnostic (scans/s is wall-bound by
        # the busiest stage when the device is not saturated).
        self.stage_busy = {
            "registration": 0.0, "odometry": 0.0, "mapping": 0.0,
            "frontend": 0.0, "backend": 0.0, "loop": 0.0,
            # diagnostic splits: the backend's blocking gate-flag wait vs
            # its actual keyframe-add work, and the loop thread's
            # detect/ICP/optimize blocks (e2e bottleneck attribution).
            "gate_wait": 0.0, "loop_detect": 0.0, "loop_icp": 0.0,
            "loop_opt": 0.0,
        }
        self.stage_frames = dict.fromkeys(self.stage_busy, 0)
        # Serializes each stage's FIRST frame (= its jit compiles): jax's
        # persistent compilation cache segfaults under concurrent
        # compile+cache access from multiple threads (observed 3x in this
        # environment: SIGSEGV/SIGABRT in _cache_read /
        # backend_compile_and_load when all four stage threads compile
        # simultaneously on the first frames). Steady state is lock-free.
        self._compile_lock = threading.Lock()

    # -- stages ---------------------------------------------------------------

    def _first_frame_guard(self, done: list):
        """Context for a stage's first processed frame: hold the compile
        lock so stage compiles never run concurrently (see _compile_lock).
        `done` is a single-element mutable flag owned by the caller."""
        import contextlib

        if done[0]:
            return contextlib.nullcontext()
        done[0] = True
        return self._compile_lock

    def _registration_worker(self):
        from collections import deque

        inflight = deque(maxlen=max(self.cfg.runtime.max_dispatch_ahead, 1))
        first = [False]
        while True:
            item = self.scan_q.get(timeout=0.2)
            if item is None:
                # Exit on closed-and-drained input (checking a stop flag
                # against a momentarily-empty queue races with a slow
                # upstream and shuts the stage down mid-stream) — or on
                # abort(), which deliberately discards in-flight work.
                if self._stop.is_set() or (
                    self.scan_q.closed and len(self.scan_q) == 0
                ):
                    self.feat_q.close()
                    return
                continue
            t, pts = item
            t0 = time.perf_counter()
            self._throttle(inflight)
            with self._first_frame_guard(first):
                scan = LidarScan.from_numpy(pts, self.cfg.sensor.max_points)
                feats = features.extract_features(scan, self.cfg)
            inflight.append(feats.sharp.xyz)
            self.feat_q.put((t, feats))
            self.stage_busy["registration"] += time.perf_counter() - t0
            self.stage_frames["registration"] += 1

    def _odometry_worker(self):
        first = [False]
        while True:
            item = self.feat_q.get(timeout=0.2)
            if item is None:
                if self._stop.is_set() or (
                    self.feat_q.closed and len(self.feat_q) == 0
                ):
                    self.map_q.close()
                    return
                continue
            t, feats = item
            t0 = time.perf_counter()
            with self._first_frame_guard(first):
                self.sys.o_state, o_out = odometry_mod.odometry_step(
                    self.sys.o_state, feats, self.cfg
                )
            # Start the D2H copy but do NOT block: a per-frame np.asarray
            # here is a ~23 ms tunnel RTT that serializes this worker at
            # ~40 scans/s (the r2 front-end-vs-e2e gap). finish()
            # materializes from the completed async copies.
            o_out.world.trans.copy_to_host_async()
            self.odom_results.append((t, o_out.world.trans))
            self._o_mat = _materialize_ready(self.odom_results, self._o_mat)
            # Republished clouds for mapping: the post-step last_* (de-skewed
            # to sweep end under DISTORTION; == feats.less_* otherwise).
            # Captured here, not in the mapping worker — o_state advances.
            self.map_q.put((
                t, o_out.world, feats,
                self.sys.o_state.last_corner, self.sys.o_state.last_surf,
            ))
            self.stage_busy["odometry"] += time.perf_counter() - t0
            self.stage_frames["odometry"] += 1

    def _throttle(self, inflight) -> None:
        """Bound dispatch-ahead: block until the (k - max_dispatch_ahead)th
        frame's output is computed before dispatching frame k. is_ready()
        is a cheap local poll (~3-8 us, no tunnel RPC); an unbounded
        dispatch queue makes every downstream synchronous fetch wait out
        SECONDS of backlog (see RuntimeConfig.max_dispatch_ahead)."""
        w = self.cfg.runtime.max_dispatch_ahead
        if w and len(inflight) == inflight.maxlen:
            h = inflight[0]
            while not h.is_ready() and not self._stop.is_set():
                time.sleep(0.0005)

    def _fused_frontend_worker(self):
        """Single-thread fused front-end (models/frontend.py): one jit
        dispatch per frame covering features+odometry+mapping+gate and —
        on keyframe frames, under the step's lax.cond — the keyframe cloud
        prep. Pushes (t, mapped_pose, kf buffers, fire) to the backend."""
        from collections import deque

        from scaloam_tpu.models import frontend as frontend_mod

        inflight = deque(maxlen=max(self.cfg.runtime.max_dispatch_ahead, 1))
        first = [False]
        while True:
            item = self.scan_q.get(timeout=0.2)
            if item is None:
                if self._stop.is_set() or (
                    self.scan_q.closed and len(self.scan_q) == 0
                ):
                    self.kf_q.close()
                    return
                continue
            t, pts = item
            t0 = time.perf_counter()
            self._throttle(inflight)
            with self._first_frame_guard(first):
                scan = LidarScan.from_numpy(pts, self.cfg.sensor.max_points)
                fe = frontend_mod.FrontendState(
                    self.sys.o_state, self.sys.m_state, self.sys.gate_state
                )
                fe, out = frontend_mod.frontend_step(fe, scan, self.cfg)
                self.sys.o_state = fe.o
                self.sys.m_state = fe.m
                self.sys.gate_state = fe.gate
            inflight.append(out.fire)
            # Async D2H only (blocking per-frame fetches serialize the
            # pipeline at one ~23 ms tunnel RTT each — see the separate-
            # stage workers). The backend materializes the gate flag a
            # lag-window later; finish() materializes the results.
            out.odom_world.trans.copy_to_host_async()
            out.fire.copy_to_host_async()
            out.mapped_pose.quat.copy_to_host_async()
            out.mapped_pose.trans.copy_to_host_async()
            self.odom_results.append((t, out.odom_world.trans))
            self._o_mat = _materialize_ready(self.odom_results, self._o_mat)
            self.mapped_results.append((t, out.mapped_pose.trans))
            self._m_mat = _materialize_ready(self.mapped_results, self._m_mat)
            self.kf_q.put((
                t, out.mapped_pose, (out.kf_xyz, out.kf_mask, out.kf_ext),
                out.fire,
            ))
            self.stage_busy["frontend"] += time.perf_counter() - t0
            self.stage_frames["frontend"] += 1

    def _mapping_worker(self):
        first = [False]
        get = self.map_q.get_latest if self.drop_backlog else self.map_q.get
        while True:
            item = get(timeout=0.2)
            if item is None:
                if self._stop.is_set() or (
                    self.map_q.closed and len(self.map_q) == 0
                ):
                    self.kf_q.close()
                    return
                continue
            t, odom_pose, feats, reg_corner, reg_surf = item
            t0 = time.perf_counter()
            with self._first_frame_guard(first):
                self.sys.m_state, m_out = mapping_mod.mapping_step(
                    self.sys.m_state, odom_pose, reg_corner, reg_surf,
                    self.cfg,
                )
            # Keyframe gate ON DEVICE (models/pipeline.py gate_step): the
            # backend then needs only a 1-byte flag per frame, not a pose
            # fetch. This worker owns the gate state (single writer).
            fire = self.sys.gate_step(m_out.pose)
            # Async D2H: blocking here (jax.device_get) serialized this
            # worker at one ~23 ms tunnel RTT per frame — the dominant
            # share of the r2 93.6-front-end vs 23.3-e2e gap. The copies
            # complete in the background; the backend materializes the
            # gate flag a few frames later (see _backend_worker's lag
            # window), by which point the frame's compute AND the copy
            # have landed, so the np.asarray is served from the host cache.
            fire.copy_to_host_async()
            m_out.pose.quat.copy_to_host_async()
            m_out.pose.trans.copy_to_host_async()
            self.mapped_results.append((t, m_out.pose.trans))
            self._m_mat = _materialize_ready(self.mapped_results, self._m_mat)
            self.kf_q.put((t, m_out.pose, feats, fire))
            self.stage_busy["mapping"] += time.perf_counter() - t0
            self.stage_frames["mapping"] += 1

    # The backend gate-checks a frame only once it is LAG frames old: by
    # then the mapping worker's async D2H copy of the 1-byte gate flag has
    # landed, so materializing it costs ~0 instead of a blocking ~23 ms
    # tunnel RTT per frame (which rate-limited the whole r3 pipeline to
    # ~29 scans/s: the fetch couldn't even start until the frame's device
    # compute finished). Keyframe decisions lag ~LAG frame periods, which
    # is inert: the gate is accumulated-motion-based and everything
    # downstream (SC detect, PGO) is 1 Hz-cadenced anyway.
    _BACKEND_LAG = 6

    def _backend_worker(self):
        """Keyframe INGEST only (process_pg analog): gate check +
        _add_keyframe. Loop detection / ICP / PGO live in _loop_worker —
        splitting them off the ingest path mirrors the reference's
        process_lcd/process_icp/process_isam threads
        (src/laserPosegraphOptimization.cpp:910-916) and stops a ~1 s ICP
        verification from stalling keyframe ingestion."""
        from collections import deque

        first = [False]
        pending = deque()

        def process(item):
            t, mapped_pose, payload, fire = item
            t0 = time.perf_counter()
            with self._lock:
                fire_val = bool(np.asarray(fire))
                self.stage_busy["gate_wait"] += time.perf_counter() - t0
                self.stage_frames["gate_wait"] += 1
                if fire_val:
                    with self._first_frame_guard(first):
                        if self.fused:
                            # payload = prepared keyframe buffers (the
                            # fused step's cond already ran the prep)
                            kf_xyz, kf_mask, kf_ext = payload
                            self.sys._add_keyframe_prepared(
                                kf_xyz, kf_mask, kf_ext, mapped_pose, t
                            )
                        else:
                            self.sys._add_keyframe(payload, mapped_pose, t)
                    self._kf_flag.set()
            self.stage_busy["backend"] += time.perf_counter() - t0
            self.stage_frames["backend"] += 1

        while True:
            item = self.kf_q.get(timeout=0.2)
            if item is not None:
                pending.append(item)
            drained = self._stop.is_set() or (
                self.kf_q.closed and len(self.kf_q) == 0
            )
            # Process everything older than the lag window; only at
            # end-of-stream is the whole backlog processed regardless of
            # age (a mid-stream stall must NOT force-process fresh entries
            # whose gate-flag copies are still in flight — the np.asarray
            # would block on the device).
            target = 0 if drained else self._BACKEND_LAG
            while len(pending) > target:
                process(pending.popleft())
            if item is None and drained:
                self._ingest_done.set()
                return

    def _loop_worker(self):
        """Cadenced loop-closure + PGO thread (process_lcd + process_icp +
        process_isam, src/laserPosegraphOptimization.cpp:732-808). The
        long ICP verification runs OUTSIDE the system lock on numpy
        snapshots (graph buffers are donated away by concurrent ingest —
        fetch_pose_tables snapshots under the lock); detection, the loop
        commit, and the optimize dispatch hold it briefly."""
        from scaloam_tpu.models import posegraph as pg

        last_opt = time.time()
        last_lcd = 0.0
        lcd_period = 1.0 / max(self.cfg.runtime.loop_detection_hz, 1e-6)
        opt_period = 1.0 / max(self.cfg.runtime.pgo_hz, 1e-6)
        first_lcd = [False]  # compile-serialization guards (_compile_lock):
        first_icp = [False]  # this thread's first detect/ICP/optimize can
        first_opt = [False]  # now compile CONCURRENTLY with ingest's
        # _add_keyframe compile — the documented cache-crash hazard.
        while True:
            done = self._ingest_done.is_set() or self._stop.is_set()
            now = time.time()
            if self._kf_flag.is_set() and (
                done or now - last_lcd >= lcd_period
            ) and not self._stop.is_set():
                # Detect on the LATEST keyframe at the cadence: keyframes
                # arriving faster than the cadence are not individually
                # queried (reference :732-742).
                self._kf_flag.clear()
                t0 = time.perf_counter()
                # Dispatch under the lock (no concurrent DB append mid-
                # trace), FETCH outside it: the fetch waits out whatever
                # front-end backlog is queued on the shared chip, and
                # holding the lock through that wait starved keyframe
                # ingestion (gate_wait ~= wall in the r5 e2e diagnostic).
                with self._lock:
                    with self._first_frame_guard(first_lcd):
                        out = self.sys.sc.detect_loop_closure_dispatch()
                    curr = len(self.sys.keyframes) - 1
                if out is None:
                    idx = -1
                    yaw = 0.0
                else:
                    import jax as _jax

                    idx_d, yaw_d, _ = _jax.device_get(out)
                    idx, yaw = int(idx_d), float(yaw_d)
                poses = None
                if idx >= 0:
                    with self._lock:
                        # detect's fetch just drained the queue: this
                        # lock-held pose fetch is ~one RTT, not a backlog.
                        poses = self.sys.fetch_pose_tables()
                self.stage_busy["loop_detect"] += time.perf_counter() - t0
                self.stage_frames["loop_detect"] += 1
                if idx >= 0:
                    t0 = time.perf_counter()
                    with self._first_frame_guard(first_icp):
                        z = self.sys._icp_verify(curr, idx, yaw, poses=poses)
                    if z is not None:
                        with self._lock:
                            self.sys.commit_loop(curr, idx, z)
                    self.stage_busy["loop_icp"] += time.perf_counter() - t0
                    self.stage_frames["loop_icp"] += 1
                last_lcd = now
            if (
                done or now - last_opt >= opt_period
            ) and not self._stop.is_set():
                t0 = time.perf_counter()
                with self._lock:
                    if len(self.sys.keyframes) > 1:
                        with self._first_frame_guard(first_opt):
                            self.sys.graph = pg.optimize(
                                self.sys.graph, self.cfg.pgo
                            )
                    # per-cycle artifact dump (reference :803-805)
                    if self.sys._writer is not None:
                        self.sys.flush_artifacts()
                self.stage_busy["loop_opt"] += time.perf_counter() - t0
                self.stage_frames["loop_opt"] += 1
                last_opt = now
            if done:
                # Final pass ran above (cadences forced by `done`): a loop
                # edge found at drain time — or keyframes landed after the
                # last tick — reaches the trajectory (ADVICE r2).
                return
            time.sleep(0.02)

    # -- lifecycle ------------------------------------------------------------

    def _precompile_stages(self) -> None:
        """Compile the front-end stage executables on the CALLING thread
        (throwaway states, one dummy frame) so the worker threads never
        compile them. XLA:CPU compilation aborted/segfaulted repeatedly
        when the mapping worker thread compiled mapping_step late in a
        long-running process (fixed 8 MB pthread stacks vs the main
        thread's growable stack is the prime suspect); on TPU this also
        front-loads the remote compiles before the pipeline overlaps."""
        cfg = self.cfg
        scan = LidarScan.from_numpy(
            np.zeros((16, 3), np.float32), cfg.sensor.max_points
        )
        if self.fused:
            from scaloam_tpu.models import frontend as frontend_mod

            fe_tmp = frontend_mod.init_state(cfg)
            fe_tmp, out = frontend_mod.frontend_step(fe_tmp, scan, cfg)
            jax.block_until_ready(out.mapped_pose.trans)
            return
        feats = features.extract_features(scan, cfg)
        o_tmp = odometry_mod.init_state(cfg)
        o_tmp, o_out = odometry_mod.odometry_step(o_tmp, feats, cfg)
        m_tmp = mapping_mod.init_state(cfg)
        m_tmp, m_out = mapping_mod.mapping_step(
            m_tmp, o_out.world, o_tmp.last_corner, o_tmp.last_surf, cfg
        )
        jax.block_until_ready(m_out.pose.trans)

    def start(self, precompile: bool = True) -> None:
        if precompile:
            self._precompile_stages()
        # Generous worker stacks: XLA:CPU/LLVM compilation recurses deeply
        # and a worker with the default fixed-size pthread stack crashed
        # where the (growable-stack) main thread compiles fine.
        old_stack = threading.stack_size(64 * 1024 * 1024)
        workers = (
            (
                self._fused_frontend_worker,
                self._backend_worker,
                self._loop_worker,
            )
            if self.fused
            else (
                self._registration_worker,
                self._odometry_worker,
                self._mapping_worker,
                self._backend_worker,
                self._loop_worker,
            )
        )
        try:
            for fn in workers:
                th = threading.Thread(target=fn, daemon=True)
                th.start()
                self._threads.append(th)
        finally:
            threading.stack_size(old_stack)

    def feed(self, time_s: float, points: np.ndarray) -> None:
        self.scan_q.put((time_s, points))

    def finish(self, timeout: float = 300.0) -> None:
        """Graceful shutdown: close the inlet and drain every stage."""
        self.scan_q.close()
        deadline = time.time() + timeout
        for th in self._threads:
            th.join(max(0.1, deadline - time.time()))
        # Materialize the per-frame results from the async D2H copies the
        # workers started (cheap: served from the completed host cache).
        self.odom_results = [
            (t, np.asarray(x)) for t, x in self.odom_results
        ]
        self.mapped_results = [
            (t, np.asarray(x)) for t, x in self.mapped_results
        ]

    def abort(self, timeout: float = 30.0) -> None:
        """Hard shutdown: stages exit at the next queue poll, dropping any
        backlog (the _stop event is the abort signal; finish() drains)."""
        self._stop.set()
        for q in (self.scan_q, self.feat_q, self.map_q, self.kf_q):
            q.close()
            q.clear()
        deadline = time.time() + timeout
        for th in self._threads:
            th.join(max(0.1, deadline - time.time()))
        # Same result contract as finish(): numpy entries, no retained
        # device buffers (ADVICE r3). The dispatched computations complete
        # regardless of the abort, so materializing is bounded.
        self.odom_results = [
            (t, np.asarray(x)) for t, x in self.odom_results
        ]
        self.mapped_results = [
            (t, np.asarray(x)) for t, x in self.mapped_results
        ]

    @property
    def dropped_frames(self) -> int:
        return (
            self.scan_q.dropped + self.feat_q.dropped
            + self.map_q.dropped + self.kf_q.dropped
        )
