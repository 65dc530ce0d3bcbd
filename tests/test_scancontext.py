"""ScanContext: numpy golden parity + loop detection behavior."""

import numpy as np
import jax.numpy as jnp

from scaloam_tpu.config import ScanContextConfig
from scaloam_tpu.models import scancontext as scm
from scaloam_tpu.ops import scancontext as sc_ops
from scaloam_tpu.utils import synthetic


# ---------------------------------------------------------------------------
# numpy golden (sequential, mirrors Scancontext.cpp semantics)
# ---------------------------------------------------------------------------

def golden_descriptor(pts, num_ring=20, num_sector=60, max_radius=80.0, height=2.0):
    desc = np.zeros((num_ring, num_sector))
    filled = np.zeros((num_ring, num_sector), bool)
    for x, y, z in pts:
        z = z + height
        r = np.hypot(x, y)
        if r > max_radius:
            continue
        theta = np.degrees(np.arctan2(y, x)) % 360.0
        ring = max(min(num_ring, int(np.ceil(r / max_radius * num_ring))), 1) - 1
        sec = max(min(num_sector, int(np.ceil(theta / 360.0 * num_sector))), 1) - 1
        if not filled[ring, sec] or desc[ring, sec] < z:
            desc[ring, sec] = z
            filled[ring, sec] = True
    return desc


def golden_distance(sc1, sc2, search_ratio=0.1):
    S = sc1.shape[1]

    def circshift(m, s):
        out = np.zeros_like(m)
        for c in range(S):
            out[:, (c + s) % S] = m[:, c]
        return out

    def dist_direct(a, b):
        tot, n = 0.0, 0
        for c in range(S):
            ca, cb = a[:, c], b[:, c]
            na, nb = np.linalg.norm(ca), np.linalg.norm(cb)
            if na == 0 or nb == 0:
                continue
            tot += ca @ cb / (na * nb)
            n += 1
        return 1.0 - tot / n

    vk1 = sc1.mean(axis=0)
    vk2 = sc2.mean(axis=0)
    diffs = [np.linalg.norm(vk1 - np.roll(vk2, s)) for s in range(S)]
    align = int(np.argmin(diffs))
    radius = round(0.5 * search_ratio * S)
    cands = {align} | {(align + i) % S for i in range(1, radius + 1)} | {
        (align - i) % S for i in range(1, radius + 1)
    }
    best = min((dist_direct(sc1, circshift(sc2, s)), s) for s in sorted(cands))
    return best


def _scan(seed, pos, yaw):
    world = synthetic.make_world(seed=7)
    return synthetic.simulate_scan(
        world, np.array(pos), yaw, n_azimuth=600, seed=seed
    )


def test_descriptor_matches_golden():
    pts = _scan(1, [0.0, 0.0, 1.8], 0.2)
    got = np.asarray(
        sc_ops.make_descriptor(jnp.array(pts), jnp.ones(len(pts), bool))
    )
    want = golden_descriptor(pts)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sector_key_roll_equals_circshift():
    pts = _scan(1, [0.0, 0.0, 1.8], 0.2)
    sc = np.asarray(
        sc_ops.make_descriptor(jnp.array(pts), jnp.ones(len(pts), bool))
    )
    shifted = np.asarray(sc_ops._all_shifts(jnp.array(sc)))
    for s in [0, 1, 7, 59]:
        want = np.zeros_like(sc)
        for c in range(60):
            want[:, (c + s) % 60] = sc[:, c]
        np.testing.assert_allclose(shifted[s], want)


def test_distance_matches_golden():
    p1 = _scan(1, [0.0, 0.0, 1.8], 0.0)
    p2 = _scan(2, [1.5, 0.5, 1.8], 0.6)
    sc1 = sc_ops.make_descriptor(jnp.array(p1), jnp.ones(len(p1), bool))
    sc2 = sc_ops.make_descriptor(jnp.array(p2), jnp.ones(len(p2), bool))
    d, s = sc_ops.sc_distance(sc1, sc2)
    want_d, want_s = golden_distance(np.asarray(sc1), np.asarray(sc2))
    assert abs(float(d) - want_d) < 1e-4
    assert int(s) == want_s


def test_rotation_invariance():
    """Same place, rotated sensor: distance small, yaw recovered."""
    p1 = _scan(1, [0.0, 0.0, 1.8], 0.0)
    p2 = _scan(5, [0.0, 0.0, 1.8], np.deg2rad(60))
    sc1 = sc_ops.make_descriptor(jnp.array(p1), jnp.ones(len(p1), bool))
    sc2 = sc_ops.make_descriptor(jnp.array(p2), jnp.ones(len(p2), bool))
    d, s = sc_ops.sc_distance(sc1, sc2)
    assert float(d) < 0.15
    yaw = int(s) * 6.0
    assert min(abs(yaw - 60), abs(yaw - 60 + 360), abs(yaw - 60 - 360)) <= 12.0


def test_loop_detection_end_to_end():
    cfg = ScanContextConfig(
        num_exclude_recent=3, num_candidates=3, max_keyframes=64,
        dist_threshold=0.4,  # the KITTI preset value
    )
    mgr = scm.SCManager(cfg)
    # drive a loop: places 0..9, then revisit place 0
    poses = [([3.0 * i, 0.0, 1.8], 0.1 * i) for i in range(10)]
    for i, (pos, yaw) in enumerate(poses):
        pts = _scan(i, pos, yaw)
        mgr.make_and_save(jnp.array(pts), jnp.ones(len(pts), bool))
        idx, _, _ = mgr.detect_loop_closure_id()
        assert idx == -1  # no revisit yet
    # revisit place 0 (slightly offset, rotated)
    pts = _scan(99, [0.3, 0.1, 1.8], 0.8)
    mgr.make_and_save(jnp.array(pts), jnp.ones(len(pts), bool))
    idx, yaw, dist = mgr.detect_loop_closure_id()
    assert idx == 0, (idx, dist)
    assert dist < cfg.dist_threshold


def test_between_session_detection():
    cfg = ScanContextConfig(num_exclude_recent=3, num_candidates=3, max_keyframes=64)
    mgr = scm.SCManager(cfg)
    for i in range(6):
        pts = _scan(i, [4.0 * i, 0.0, 1.8], 0.2 * i)
        mgr.make_and_save(jnp.array(pts), jnp.ones(len(pts), bool))
    # a "new session" query at place 2
    pts = _scan(50, [8.0, 0.2, 1.8], 1.0)
    qsc = sc_ops.make_descriptor(jnp.array(pts), jnp.ones(len(pts), bool))
    idx, _, dist = mgr.detect_between_session(qsc)
    assert idx == 2, (idx, dist)
