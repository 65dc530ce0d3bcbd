"""Multi-session localization on REAL data (VERDICT r3 task 5).

Reference semantics: a new session localizes against a prior session's
saved SCD database via `saveScancontextAndKeys` +
`detectLoopClosureIDBetweenSession` (one-shot batch tree over the loaded
descriptors, include/scancontext/Scancontext.cpp:236-246,272-333); the
README's "long-term mapping" workflow then joins sessions in one graph.

Here, with the reference's own shipped sample data:
  - KAIST03's 21 real keyframes split into two interleaved "sessions"
    (two passes along the same street): session B localizes against
    session A's descriptor DB (`detect_between_session`);
  - the two sessions join ONE pose graph via `chain_break`
    (new_sequence=True), anchored by ICP-verified between-session loop
    factors, and optimization pulls session B's drifted chain back onto
    the shipped trajectory;
  - Seosan01 (a DIFFERENT city, also shipped by the reference) is the
    cross-city negative: none of its clouds may produce an accepted loop
    against the KAIST03 database (SC threshold + ICP verification, the
    production acceptance chain).
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
from scaloam_tpu.models import scancontext as scm
from scaloam_tpu.ops import scancontext as sc_ops
from scaloam_tpu.ops import se3
from scaloam_tpu.types import Pose

KAIST = "/root/reference/utils/sample_data/KAIST03"
SEOSAN = "/root/reference/utils/sample_data/Seosan01"
pytestmark = pytest.mark.skipif(
    not (os.path.exists(KAIST) and os.path.exists(SEOSAN)),
    reason="reference sample data absent",
)


@pytest.fixture(autouse=True, scope="module")
def _shed_accumulated_executables():
    """XLA:CPU segfaults in backend_compile_and_load when compiling this
    module's BIG fresh executables (ICP verify, 65k-point SC descriptors)
    late in a process that has accumulated the whole suite's executables —
    the JIT code-memory exhaustion class documented in
    tests/test_runtime.py. Shed everything compiled so far first."""
    import jax

    jax.clear_caches()
    yield

_N = 21


@pytest.fixture(scope="module")
def kaist():
    clouds = [
        pcd.read_pcd(os.path.join(KAIST, "Scans", f"{k:06d}.pcd"))[:, :3]
        for k in range(_N)
    ]
    poses = artifacts.load_kitti_poses(os.path.join(KAIST, "optimized_poses.txt"))
    return clouds, poses


@pytest.fixture(scope="module")
def seosan():
    return [
        pcd.read_pcd(os.path.join(SEOSAN, "Scans", f"{k:06d}.pcd"))[:, :3]
        for k in range(0, _N, 3)
    ]


def _pad(xyz, cap=65536):
    out = np.zeros((cap, 3), np.float32)
    m = np.zeros(cap, bool)
    n = min(len(xyz), cap)
    out[:n] = xyz[:n]
    m[:n] = True
    return jnp.asarray(out), jnp.asarray(m)


def _descriptor(xyz):
    p, m = _pad(xyz)
    return sc_ops.make_descriptor(p, m)


def _np_pose(T):
    return Pose(
        se3.mat_to_quat(jnp.asarray(T[:3, :3], jnp.float32)),
        jnp.asarray(T[:3, 3], jnp.float32),
    )


SC_CFG = cfg_mod.ScanContextConfig(
    num_exclude_recent=0, max_keyframes=32, dist_threshold=0.2
)


def _session_a_db(clouds, idxs):
    mgr = scm.SCManager(SC_CFG)
    for k in idxs:
        p, m = _pad(clouds[k], SC_CFG.max_input_points)
        mgr.make_and_save(p, m)
    return mgr


# ---------------------------------------------------------------------------
# (1) between-session localization: B queries against A's DB
# ---------------------------------------------------------------------------


def test_between_session_localization_real(kaist):
    """Each session-B keyframe (odd indices) must localize to a spatially
    adjacent session-A keyframe (even indices; ~1.2 m away on either side)
    through detect_between_session — Scancontext.cpp:272-333 semantics on
    real clouds."""
    clouds, poses = kaist
    a_idx = list(range(0, _N, 2))  # session A: even keyframes
    b_idx = list(range(1, _N, 2))  # session B: odd keyframes
    mgr = _session_a_db(clouds, a_idx)

    hits = 0
    for k in b_idx:
        q = _descriptor(clouds[k])
        ridx, yaw, dist = mgr.detect_between_session(q)
        assert 0 <= ridx < len(a_idx)
        matched = a_idx[ridx]
        sep = np.linalg.norm(poses[matched][:3, 3] - poses[k][:3, 3])
        if dist < SC_CFG.dist_threshold and sep < 3.0:
            hits += 1
    # real-world bar: the overwhelming majority of revisit queries localize
    # to a genuine neighbor under the reference's 0.2 threshold
    assert hits >= len(b_idx) - 2, f"{hits}/{len(b_idx)} localized"


# ---------------------------------------------------------------------------
# (2) joint graph: chain_break + ICP-verified between-session anchors
# ---------------------------------------------------------------------------


def _small_loop_cfg():
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


def _icp_between(clouds, poses, a_idx, curr_k, est_T, yaw):
    """ICP-verify session-B keyframe `curr_k` (graph estimate `est_T`,
    possibly drifted) against session A's keyframe submap — the
    doICPVirtualRelative path with only A's keyframes as the map, exactly
    the between-session setting (the central session provides the submap).
    Returns (a_node, Z) or None."""
    cfg = cfg_mod.mulran_os1_64()
    cfg = cfg.replace(
        loop=_small_loop_cfg(),
        pgo=dataclasses.replace(cfg.pgo, max_keyframes=64, max_loops=8),
        scancontext=dataclasses.replace(cfg.scancontext, max_keyframes=64),
    )
    sys_ = pl.SlamSystem(cfg)
    for k in a_idx:
        sys_.keyframes.append(pl.Keyframe(cloud=clouds[k].copy(), time=float(k)))
        sys_.graph = pg.add_keyframe(
            sys_.graph, _np_pose(poses[k]), jnp.float32(0), jnp.array(False)
        )
    # nearest A node by the (drifted) estimate — what production would seed
    d = [np.linalg.norm(poses[k][:3, 3] - est_T[:3, 3]) for k in a_idx]
    a_node = int(np.argmin(d))
    sys_.keyframes.append(pl.Keyframe(cloud=clouds[curr_k].copy(), time=99.0))
    sys_.graph = pg.add_keyframe(
        sys_.graph, _np_pose(est_T), jnp.float32(0), jnp.array(False)
    )
    z = sys_._icp_verify(len(a_idx), a_node, yaw)
    if z is None:
        return None
    return a_node, z


@pytest.mark.slow
def test_joint_graph_between_sessions_real(kaist):
    """Session A (even keyframes, shipped poses) and session B (odd
    keyframes, odometry chain with injected yaw drift) join one graph via
    chain_break; ICP-verified between-session loops anchor B back onto the
    shipped trajectory (the reference's multi-session workflow:
    Scancontext.cpp:272-333 retrieval + laserPosegraphOptimization.cpp
    loop factors on one graph)."""
    clouds, poses = kaist
    a_idx = list(range(0, _N, 2))
    b_idx = list(range(1, _N, 2))
    nA, nB = len(a_idx), len(b_idx)

    # Session B odometry: shipped relatives with a yaw bias per step.
    bias = 0.012  # rad/step -> meters of drift over the 10-step chain
    Rz = np.array(
        [[np.cos(bias), -np.sin(bias), 0], [np.sin(bias), np.cos(bias), 0],
         [0, 0, 1]]
    )
    b_odom = [poses[b_idx[0]]]
    for i in range(1, nB):
        rel = np.linalg.inv(poses[b_idx[i - 1]]) @ poses[b_idx[i]]
        rel = rel.copy()
        rel[:3, :3] = Rz @ rel[:3, :3]
        b_odom.append(b_odom[-1] @ rel)
    drift = [
        np.linalg.norm(b_odom[i][:3, 3] - poses[b_idx[i]][:3, 3])
        for i in range(nB)
    ]
    assert max(drift) > 0.6, drift  # the injected drift is visible

    cfg = cfg_mod.PGOConfig(max_keyframes=64, max_loops=16, gn_iterations=6)
    graph = pg.init_graph(cfg, initial_nodes=64)
    for k in a_idx:
        graph = pg.add_keyframe(
            graph, _np_pose(poses[k]), jnp.float32(0), jnp.array(False)
        )
    for i in range(nB):
        graph = pg.add_keyframe(
            graph, _np_pose(b_odom[i]), jnp.float32(0), jnp.array(False),
            new_sequence=(i == 0),
        )

    # Between-session anchors at three B keyframes (SC yaw seed from the
    # real descriptors, ICP against A's submap only).
    n_loops = 0
    for bi in (1, 5, 9):
        q = _descriptor(clouds[b_idx[bi]])
        mgr = _session_a_db(clouds, a_idx)
        ridx, yaw, dist = mgr.detect_between_session(q)
        got = _icp_between(clouds, poses, a_idx, b_idx[bi], b_odom[bi], yaw)
        assert got is not None, f"between-session ICP rejected B[{bi}]"
        a_node, z = got
        graph = pg.add_loop(
            graph, jnp.int32(nA + bi), jnp.int32(a_node), z, n_loops=n_loops
        )
        n_loops += 1

    graph = pg.optimize(graph, cfg, cg_iters=128)
    opt = np.asarray(graph.poses.trans)
    b_err = [
        np.linalg.norm(opt[nA + i] - poses[b_idx[i]][:3, 3]) for i in range(nB)
    ]
    # anchored chain lands on the shipped trajectory; the unanchored drift
    # peaked at max(drift)
    assert np.max(b_err) < 0.5 * max(drift), (b_err, drift)
    assert np.median(b_err) < 0.35, b_err
    # session A (prior map) stays put
    a_err = [
        np.linalg.norm(opt[i] - poses[a_idx[i]][:3, 3]) for i in range(nA)
    ]
    assert np.max(a_err) < 0.2, a_err


# ---------------------------------------------------------------------------
# (3) cross-city negative: Seosan01 vs the KAIST03 database
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_seosan_cross_city_no_false_loops(kaist, seosan):
    """No Seosan01 cloud may produce an ACCEPTED loop against KAIST03:
    either the SC distance exceeds the 0.2 threshold, or the ICP
    verification gate rejects the aliased candidate — the production
    acceptance chain (SC_DIST_THRES Scancontext.h:99 + fitness gate
    laserPosegraphOptimization.cpp:531-537)."""
    clouds, poses = kaist
    mgr = _session_a_db(clouds, list(range(_N)))

    accepted = 0
    sc_dists = []
    for cloud in seosan:
        q = _descriptor(cloud)
        ridx, yaw, dist = mgr.detect_between_session(q)
        sc_dists.append(dist)
        if dist >= SC_CFG.dist_threshold:
            continue  # correctly rejected by the SC gate
        # SC passed (cross-city aliasing): ICP must reject. Build the
        # verification with the Seosan cloud as the query source.
        cfg = cfg_mod.mulran_os1_64()
        cfg = cfg.replace(
            loop=_small_loop_cfg(),
            pgo=dataclasses.replace(cfg.pgo, max_keyframes=64, max_loops=8),
            scancontext=dataclasses.replace(cfg.scancontext, max_keyframes=64),
        )
        sys_ = pl.SlamSystem(cfg)
        for k in range(_N):
            sys_.keyframes.append(
                pl.Keyframe(cloud=clouds[k].copy(), time=float(k))
            )
            sys_.graph = pg.add_keyframe(
                sys_.graph, _np_pose(poses[k]), jnp.float32(0), jnp.array(False)
            )
        sys_.keyframes.append(pl.Keyframe(cloud=cloud.copy(), time=99.0))
        sys_.graph = pg.add_keyframe(
            sys_.graph, _np_pose(poses[ridx]), jnp.float32(0), jnp.array(False)
        )
        z = sys_._icp_verify(_N, int(ridx), yaw)
        if z is not None:
            accepted += 1
    assert accepted == 0, f"false cross-city loops accepted: {accepted}"
    # structure check: cross-city distances are clearly worse than genuine
    # adjacent-keyframe distances (~0.1 on this course)
    assert np.median(sc_dists) > 0.15, sc_dists
