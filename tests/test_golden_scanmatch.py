"""Golden-model validation of the odometry + mapping correspondence
selection and the Huber-GN solves (VERDICT r1 item 5: the same sequential-
numpy oracle treatment tests/golden_features.py gives scanRegistration).

Quantifies the two documented deviations directly instead of via
end-to-end ATE:
  - odometry's cached top-2 re-rank across outer passes
    (models/odometry.py:_sweep_candidates) vs the reference's per-pass
    KD-tree re-search,
  - mapping's top-8 candidate re-rank (models/mapping.py:_candidates)
    vs the reference's per-pass exact 5-NN.

Reference: src/laserOdometry.cpp:299-483, src/laserMapping.cpp:578-686.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from scaloam_tpu import config
from scaloam_tpu.models import mapping as mapping_mod
from scaloam_tpu.models import odometry
from scaloam_tpu.ops import features, gn, residuals, se3, voxel
from scaloam_tpu.types import LidarScan, Pose

from tests import golden_scanmatch as G


def _cfg():
    cfg = config.kitti_hdl64()
    return cfg.replace(
        mapping=dataclasses.replace(
            cfg.mapping,
            cell_size=4.0, grid_xy=32, grid_z=8,
            corner_cell_cap=32, surf_cell_cap=64,
            max_corner_input=2048, max_surf_input=8192,
        )
    )


@pytest.fixture(scope="module")
def frames():
    """Three frames; the odometry state is advanced through frames 0-1 so
    tests run on frame 2 with a realistic constant-velocity WARM START —
    the regime the cached top-2 re-rank is designed for (on a cold first
    frame the pose moves ~1 m between passes and the cache is stale; in
    steady state it moves millimeters)."""
    from scaloam_tpu.utils import synthetic

    cfg = _cfg()
    world = synthetic.make_world(seed=3)
    scans, gt = synthetic.simulate_trajectory(
        world, n_frames=3, speed=0.8, radius=30.0, n_azimuth=900, seed=10
    )
    feats = [
        features.extract_features(
            LidarScan.from_numpy(s, cfg.sensor.max_points), cfg
        )
        for s in scans
    ]
    state = odometry.init_state(cfg)
    state, _ = odometry.odometry_step(state, feats[0], cfg)  # fills last_*
    state, _ = odometry.odometry_step(state, feats[1], cfg)  # warm start
    return cfg, feats, state


def _np(x):
    return np.asarray(x)


def _pt_match(p_repo, p_gold, valid, q=None, tie_tol=1e-3):
    """Fraction of rows (among valid) whose selected points coincide.

    With q given, a differing pick whose query distance matches golden's
    within tie_tol also counts: the matmul distance form carries ~|p|^2*eps
    ~ 2e-5 absolute f32 error, so near-equidistant candidates legitimately
    swap order between the f32 kernel and the f64 oracle."""
    pr = _np(p_repo).astype(np.float64)
    same = np.all(np.abs(pr - p_gold) < 1e-4, axis=-1)
    if q is not None:
        qd = np.asarray(q, np.float64)
        d_r = np.sum((pr - qd) ** 2, axis=-1)
        d_g = np.sum((p_gold - qd) ** 2, axis=-1)
        same = same | (np.abs(d_r - d_g) < tie_tol)
    return float(np.mean(same[valid])) if valid.any() else 1.0


def _corr_sets(cfg, feats1, state, rel):
    corner_cand, surf_cand = odometry._sweep_candidates(
        rel, feats1, state, cfg
    )
    return odometry._associate(rel, feats1, corner_cand, surf_cand, cfg)


def _golden_odo(cfg, feats1, state, rel_q, rel_t):
    o = cfg.odometry
    sharp, flat = feats1.sharp, feats1.flat
    lc, ls = state.last_corner, state.last_surf
    a_g, b_g, cv_g = G.odometry_correspond(
        rel_q, rel_t, _np(sharp.xyz), _np(sharp.mask), _np(sharp.ring),
        _np(lc.xyz), _np(lc.mask), _np(lc.ring),
        "corner", o.distance_sq_threshold, o.nearby_scan,
    )
    j_g, l_g, m_g, sv_g = G.odometry_correspond(
        rel_q, rel_t, _np(flat.xyz), _np(flat.mask), _np(flat.ring),
        _np(ls.xyz), _np(ls.mask), _np(ls.ring),
        "surf", o.distance_sq_threshold, o.nearby_scan,
    )
    return (a_g, b_g, cv_g), (j_g, l_g, m_g, sv_g)


def test_odometry_correspondences_match_golden_pass1(frames):
    """Pass 1 (sweep pose == associate pose): the TPU selection must agree
    with the reference semantics near-exactly (numerical ties only)."""
    cfg, feats, state = frames
    rel = state.rel  # constant-velocity warm start, like the reference
    rq = _np(rel.quat).astype(np.float64)
    rt = _np(rel.trans).astype(np.float64)
    corner_data, surf_data = _corr_sets(cfg, feats[2], state, rel)
    (a_g, b_g, cv_g), (j_g, l_g, m_g, sv_g) = _golden_odo(
        cfg, feats[2], state, rq, rt
    )

    cv = _np(corner_data[3]).astype(bool)
    sv = _np(surf_data[4]).astype(bool)
    # validity agreement
    assert np.mean(cv == cv_g) > 0.995, (cv.sum(), cv_g.sum())
    assert np.mean(sv == sv_g) > 0.995, (sv.sum(), sv_g.sum())
    both_c = cv & cv_g
    both_s = sv & sv_g
    assert both_c.sum() > 50 and both_s.sum() > 300
    # selected points agreement (a=1-NN, b=other-ring; j, l=same, m=other)
    qc = G.transform(rq, rt, _np(feats[2].sharp.xyz).astype(np.float64))
    qs = G.transform(rq, rt, _np(feats[2].flat.xyz).astype(np.float64))
    assert _pt_match(corner_data[1], a_g, both_c, q=qc) > 0.99
    assert _pt_match(corner_data[2], b_g, both_c, q=qc) > 0.99
    assert _pt_match(surf_data[1], j_g, both_s, q=qs) > 0.99
    assert _pt_match(surf_data[2], l_g, both_s, q=qs) > 0.99
    assert _pt_match(surf_data[3], m_g, both_s, q=qs) > 0.99


def test_odometry_pass2_rerank_deviation_quantified(frames):
    """Pass 2: the repo re-ranks CACHED top-2 candidates at the refined
    pose; the reference re-searches. Quantify the deviation directly."""
    cfg, feats, state = frames
    rel = state.rel
    corner_cand, surf_cand = odometry._sweep_candidates(
        rel, feats[2], state, cfg
    )
    cd, sd = odometry._associate(rel, feats[2], corner_cand, surf_cand, cfg)
    rel1 = odometry._solve(rel, cd, sd, cfg)
    # repo pass 2: cached candidates at the refined pose
    cd2, sd2 = odometry._associate(rel1, feats[2], corner_cand, surf_cand, cfg)
    # golden pass 2: fresh full re-search at the refined pose
    (a_g, b_g, cv_g), (j_g, l_g, m_g, sv_g) = _golden_odo(
        cfg, feats[2], state, _np(rel1.quat).astype(np.float64),
        _np(rel1.trans).astype(np.float64),
    )
    cv = _np(cd2[3]).astype(bool)
    sv = _np(sd2[4]).astype(bool)
    q1, t1 = _np(rel1.quat).astype(np.float64), _np(rel1.trans).astype(np.float64)
    qc = G.transform(q1, t1, _np(feats[2].sharp.xyz).astype(np.float64))
    qs = G.transform(q1, t1, _np(feats[2].flat.xyz).astype(np.float64))
    stats = {
        "corner_valid_agree": float(np.mean(cv == cv_g)),
        "surf_valid_agree": float(np.mean(sv == sv_g)),
        "a": _pt_match(cd2[1], a_g, cv & cv_g, q=qc),
        "b": _pt_match(cd2[2], b_g, cv & cv_g, q=qc),
        "j": _pt_match(sd2[1], j_g, sv & sv_g, q=qs),
        "l": _pt_match(sd2[2], l_g, sv & sv_g, q=qs),
        "m": _pt_match(sd2[3], m_g, sv & sv_g, q=qs),
    }
    print("pass-2 cached-top-2 vs full re-search:", stats)
    # Measured on this scene: valid/a = 1.0, b = 0.994, j = 0.982,
    # m = 0.949, l = 0.880 (l differs most: the cached same-ring pair
    # excludes the SWEEP-pose 1-NN, the re-search excludes the refined-pose
    # 1-NN). The companions that differ are near-ties, so what matters is
    # the solved pose, asserted below.
    assert stats["corner_valid_agree"] > 0.99 and stats["surf_valid_agree"] > 0.99
    assert stats["a"] > 0.99 and stats["b"] > 0.97
    assert stats["j"] > 0.95 and stats["m"] > 0.9 and stats["l"] > 0.8

    # Pose-level effect of the deviation: solve pass 2 from both
    # correspondence sets — the difference must be sub-millimeter.
    rel2_repo = odometry._solve(rel1, cd2, sd2, cfg)
    cd2_g = (
        feats[2].sharp.xyz, jnp.asarray(a_g, jnp.float32),
        jnp.asarray(b_g, jnp.float32), jnp.asarray(cv_g),
        feats[2].sharp.rel_time,
    )
    sd2_g = (
        feats[2].flat.xyz, jnp.asarray(j_g, jnp.float32),
        jnp.asarray(l_g, jnp.float32), jnp.asarray(m_g, jnp.float32),
        jnp.asarray(sv_g), feats[2].flat.rel_time,
    )
    rel2_gold = odometry._solve(rel1, cd2_g, sd2_g, cfg)
    dt = float(np.linalg.norm(_np(rel2_repo.trans) - _np(rel2_gold.trans)))
    dq = G.quat_mul(
        _np(rel2_repo.quat).astype(np.float64) * [1, -1, -1, -1],
        _np(rel2_gold.quat).astype(np.float64),
    )
    drot = 2 * np.arccos(min(1.0, abs(dq[0])))
    print(f"pass-2 pose effect: dt={dt:.2e} m, drot={drot:.2e} rad")
    # measured: 1.6 mm on a 0.8 m inter-frame motion (0.2%), 0 rad
    assert dt < 3e-3, dt
    assert drot < 2e-4, drot


def test_odometry_gn_matches_golden(frames):
    """The f32 analytic-Jacobian GN chain (factors, Huber, normal eqs,
    6x6 Cholesky, delta update) vs an independent f64 numeric-Jacobian GN
    on identical correspondences."""
    cfg, feats, state = frames
    o = cfg.odometry
    rel = state.rel
    rq = _np(rel.quat).astype(np.float64)
    rt = _np(rel.trans).astype(np.float64)
    (a_g, b_g, cv_g), (j_g, l_g, m_g, sv_g) = _golden_odo(
        cfg, feats[2], state, rq, rt
    )
    sharp_xyz = _np(feats[2].sharp.xyz).astype(np.float64)
    flat_xyz = _np(feats[2].flat.xyz).astype(np.float64)

    corner_data = (
        feats[2].sharp.xyz, jnp.asarray(a_g, jnp.float32),
        jnp.asarray(b_g, jnp.float32), jnp.asarray(cv_g),
        feats[2].sharp.rel_time,
    )
    surf_data = (
        feats[2].flat.xyz, jnp.asarray(j_g, jnp.float32),
        jnp.asarray(l_g, jnp.float32), jnp.asarray(m_g, jnp.float32),
        jnp.asarray(sv_g), feats[2].flat.rel_time,
    )
    rel_repo = odometry._solve(rel, corner_data, surf_data, cfg)

    pc, ac, bc = sharp_xyz[cv_g], a_g[cv_g], b_g[cv_g]
    ps, js, ls_, ms = flat_xyz[sv_g], j_g[sv_g], l_g[sv_g], m_g[sv_g]
    q_gold, t_gold = G.golden_gn(
        rq, rt,
        [
            lambda q, t: G.edge_residual(q, t, pc, ac, bc),
            lambda q, t: G.plane3_residual(q, t, ps, js, ls_, ms),
        ],
        o.gn_iterations, o.huber_delta,
    )
    t_err = np.linalg.norm(_np(rel_repo.trans) - t_gold)
    dq = G.quat_mul(
        _np(rel_repo.quat).astype(np.float64) * [1, -1, -1, -1], q_gold
    )
    rot_err = 2 * np.arccos(min(1.0, abs(dq[0])))
    assert t_err < 2e-3, (t_err, _np(rel_repo.trans), t_gold)
    assert rot_err < 2e-4, rot_err


@pytest.fixture(scope="module")
def map_setup(frames):
    """Insert frames 0-1 into the map at their odometry poses, then stage
    frame 2 exactly as mapping_step does."""
    cfg, feats, _ = frames
    m = cfg.mapping
    o_state = odometry.init_state(cfg)
    m_state = mapping_mod.init_state(cfg)
    for f in (feats[0], feats[1]):
        o_state, o_out = odometry.odometry_step(o_state, f, cfg)
        m_state, _ = mapping_mod.mapping_step(
            m_state, o_out.world, f.less_sharp, f.less_flat, cfg,
        )
    o_state, o_out = odometry.odometry_step(o_state, feats[2], cfg)
    prior = se3.compose(m_state.correction, o_out.world)
    cin_xyz, cin_mask, _ = voxel.voxel_downsample_packed(
        feats[2].less_sharp.xyz, feats[2].less_sharp.mask,
        m.line_resolution, m.max_corner_input, xy_bits=10, z_bits=9,
    )
    sin_xyz, sin_mask, _ = voxel.voxel_downsample_packed(
        feats[2].less_flat.xyz, feats[2].less_flat.mask,
        m.plane_resolution, m.max_surf_input, xy_bits=10, z_bits=9,
    )
    (cx, cm), (sx, sm) = mapping_mod.map_points(m_state, cfg)
    return (
        cfg, m_state, prior,
        (cin_xyz, cin_mask), (sin_xyz, sin_mask),
        _np(cx)[_np(cm)], _np(sx)[_np(sm)],
    )


def test_mapping_correspondences_match_golden(map_setup):
    """Grid 5-NN + closed-form eigen/plane fits vs exact numpy 5-NN +
    np.linalg.eigh / lstsq over the full extracted map cloud."""
    cfg, m_state, prior, (cin, cin_m), (sin, sin_m), cmap, smap = map_setup
    m = cfg.mapping
    q, t = _np(prior.quat).astype(np.float64), _np(prior.trans).astype(np.float64)

    nb8_c = mapping_mod._candidates(prior, cin, cin_m, m_state.corner_grid, m)
    a_r, b_r, cv_r = mapping_mod._corner_correspond(prior, cin, cin_m, nb8_c, m)
    a_g, b_g, cv_g = G.mapping_correspond(
        q, t, _np(cin), _np(cin_m), cmap, "corner",
        k=m.knn, nn_max=m.corner_nn_max_dist, eig_ratio=m.edge_eig_ratio,
    )
    cv = _np(cv_r).astype(bool)
    agree_v = float(np.mean(cv == cv_g))
    both = cv & cv_g
    assert both.sum() > 100
    # endpoints: eigvec sign is arbitrary — compare the unordered pair
    ar, br = _np(a_r).astype(np.float64), _np(b_r).astype(np.float64)
    d_direct = np.linalg.norm(ar - a_g, axis=1) + np.linalg.norm(br - b_g, axis=1)
    d_swap = np.linalg.norm(ar - b_g, axis=1) + np.linalg.norm(br - a_g, axis=1)
    pt_agree = float(np.mean(np.minimum(d_direct, d_swap)[both] < 1e-2))
    print("mapping corner: valid agree", agree_v, "pts", pt_agree)
    assert agree_v > 0.9
    assert pt_agree > 0.95

    nb8_s = mapping_mod._candidates(prior, sin, sin_m, m_state.surf_grid, m)
    n_r, d_r, sv_r = mapping_mod._surf_correspond(prior, sin, sin_m, nb8_s, m)
    n_g, d_g, sv_g = G.mapping_correspond(
        q, t, _np(sin), _np(sin_m), smap, "surf",
        k=m.knn, nn_max=m.surf_nn_max_dist_sq, plane_tol=m.plane_fit_tol,
    )
    sv = _np(sv_r).astype(bool)
    agree_v = float(np.mean(sv == sv_g))
    both = sv & sv_g
    assert both.sum() > 500
    nr = _np(n_r).astype(np.float64)
    # normal sign is fixed by the A n = -1 fit in both
    n_agree = float(
        np.mean(np.linalg.norm(nr[both] - n_g[both], axis=1) < 5e-3)
    )
    print("mapping surf: valid agree", agree_v, "normals", n_agree)
    assert agree_v > 0.9
    assert n_agree > 0.95


def test_mapping_gn_matches_golden(map_setup):
    """Mapping's edge + plane-norm GN vs the f64 numeric-Jacobian GN on
    identical (golden) correspondences."""
    cfg, m_state, prior, (cin, cin_m), (sin, sin_m), cmap, smap = map_setup
    m = cfg.mapping
    q0 = _np(prior.quat).astype(np.float64)
    t0 = _np(prior.trans).astype(np.float64)

    a_g, b_g, cv_g = G.mapping_correspond(
        q0, t0, _np(cin), _np(cin_m), cmap, "corner",
        k=m.knn, nn_max=m.corner_nn_max_dist, eig_ratio=m.edge_eig_ratio,
    )
    n_g, d_g, sv_g = G.mapping_correspond(
        q0, t0, _np(sin), _np(sin_m), smap, "surf",
        k=m.knn, nn_max=m.surf_nn_max_dist_sq, plane_tol=m.plane_fit_tol,
    )

    cinT, sinT = cin.T, sin.T
    aT = jnp.asarray(a_g.T, jnp.float32)
    bT = jnp.asarray(b_g.T, jnp.float32)
    nT = jnp.asarray(n_g.T, jnp.float32)
    nd = jnp.asarray(d_g, jnp.float32)

    def build(p):
        return [
            residuals.edge_factors_T(p, cinT, aT, bT, jnp.asarray(cv_g)),
            residuals.plane_norm_factors_T(p, sinT, nT, nd, jnp.asarray(sv_g)),
        ]

    pose_repo = gn.gauss_newton(prior, build, m.gn_iterations, m.huber_delta)

    pc = _np(cin).astype(np.float64)[cv_g]
    ps = _np(sin).astype(np.float64)[sv_g]
    q_gold, t_gold = G.golden_gn(
        q0, t0,
        [
            lambda q, t: G.edge_residual(q, t, pc, a_g[cv_g], b_g[cv_g]),
            lambda q, t: G.plane_norm_residual(
                q, t, ps, n_g[sv_g], d_g[sv_g]
            ),
        ],
        m.gn_iterations, m.huber_delta,
    )
    t_err = np.linalg.norm(_np(pose_repo.trans) - t_gold)
    dq = G.quat_mul(
        _np(pose_repo.quat).astype(np.float64) * [1, -1, -1, -1], q_gold
    )
    rot_err = 2 * np.arccos(min(1.0, abs(dq[0])))
    assert t_err < 2e-3, (t_err, _np(pose_repo.trans), t_gold)
    assert rot_err < 2e-4, rot_err
