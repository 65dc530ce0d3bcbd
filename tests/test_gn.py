"""Gauss-Newton core + residual Jacobian correctness."""

import numpy as np
import jax
import jax.numpy as jnp

from scaloam_tpu.ops import gn, residuals, se3
from scaloam_tpu.types import Pose


def _rand_pose(rng, rot_scale=0.2, t_scale=0.5):
    w = rng.normal(size=3) * rot_scale
    t = rng.normal(size=3) * t_scale
    return Pose(se3.exp_so3(jnp.array(w, jnp.float32)), jnp.array(t, jnp.float32))


def test_jacobians_match_autodiff(rng):
    """Analytic Jacobians vs jax.jacfwd through the tangent parameterization."""
    pose = _rand_pose(rng)
    p = jnp.array(rng.normal(size=(5, 3)), jnp.float32)
    a = jnp.array(rng.normal(size=(5, 3)), jnp.float32)
    b = jnp.array(rng.normal(size=(5, 3)), jnp.float32)
    valid = jnp.ones(5, bool)

    def edge_r(delta):
        pd = gn.apply_delta(pose, delta)
        return residuals.edge_factors(pd, p, a, b, valid).r

    J_auto = jax.jacfwd(edge_r)(jnp.zeros(6))
    J_analytic = residuals.edge_factors(pose, p, a, b, valid).J
    np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_analytic), atol=1e-4)

    c = jnp.array(rng.normal(size=(5, 3)), jnp.float32)

    def dist_r(delta):
        pd = gn.apply_delta(pose, delta)
        return residuals.distance_factors(pd, p, c, valid).r

    J_auto = jax.jacfwd(dist_r)(jnp.zeros(6))
    J_analytic = residuals.distance_factors(pose, p, c, valid).J
    np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_analytic), atol=1e-4)

    l = jnp.array(rng.normal(size=(5, 3)), jnp.float32)
    m = jnp.array(rng.normal(size=(5, 3)), jnp.float32)

    def plane_r(delta):
        pd = gn.apply_delta(pose, delta)
        return residuals.plane3_factors(pd, p, a, l, m, valid).r

    J_auto = jax.jacfwd(plane_r)(jnp.zeros(6))
    J_analytic = residuals.plane3_factors(pose, p, a, l, m, valid).J
    np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_analytic), atol=1e-4)


def test_gn_recovers_transform_point_to_point(rng):
    """Known rigid transform recovered from point-to-point factors."""
    tgt = jnp.array(rng.uniform(-5, 5, size=(200, 3)), jnp.float32)
    true = _rand_pose(rng, rot_scale=0.3, t_scale=1.0)
    # source points: p such that true*p = tgt -> p = true^-1 tgt
    src = se3.apply(se3.inverse(true), tgt)
    valid = jnp.ones(200, bool)

    def build(pose):
        return [residuals.distance_factors(pose, src, tgt, valid)]

    est = gn.gauss_newton(Pose.identity(), build, iterations=8, huber_delta=None)
    np.testing.assert_allclose(np.asarray(est.trans), np.asarray(true.trans), atol=1e-3)
    dq = se3.quat_mul(se3.quat_conj(est.quat), true.quat)
    assert abs(float(dq[0])) > 1.0 - 1e-5


def test_gn_recovers_transform_mixed_factors(rng):
    """Edges + planes together constrain all 6 dof."""
    true = _rand_pose(rng, rot_scale=0.1, t_scale=0.3)
    # plane targets: 3 orthogonal planes via (n, d)
    n_pts = 120
    pts_w = []
    norms = []
    for axis in range(3):
        n = np.zeros(3)
        n[axis] = 1.0
        coords = rng.uniform(-4, 4, size=(n_pts // 3, 3))
        coords[:, axis] = 1.5  # on plane x_axis = 1.5
        pts_w.append(coords)
        norms.append(np.tile(n, (n_pts // 3, 1)))
    pts_w = jnp.array(np.concatenate(pts_w), jnp.float32)
    norms = jnp.array(np.concatenate(norms), jnp.float32)
    d = -jnp.sum(norms * pts_w, axis=-1)
    src = se3.apply(se3.inverse(true), pts_w)
    valid = jnp.ones(n_pts, bool)

    def build(pose):
        return [residuals.plane_norm_factors(pose, src, norms, d, valid)]

    est = gn.gauss_newton(Pose.identity(), build, iterations=10, huber_delta=None)
    # plane factors leave in-plane translation free per plane, but 3
    # orthogonal planes pin everything
    np.testing.assert_allclose(np.asarray(est.trans), np.asarray(true.trans), atol=5e-3)


def test_huber_downweights_outliers(rng):
    tgt = jnp.array(rng.uniform(-5, 5, size=(100, 3)), jnp.float32)
    true = _rand_pose(rng, rot_scale=0.05, t_scale=0.2)
    src = np.asarray(se3.apply(se3.inverse(true), tgt))
    tgt_np = np.asarray(tgt).copy()
    tgt_np[:10] += rng.normal(size=(10, 3)) * 20.0  # gross outliers
    tgt_o = jnp.array(tgt_np)
    valid = jnp.ones(100, bool)

    def build(pose):
        return [residuals.distance_factors(pose, jnp.array(src), tgt_o, valid)]

    est_robust = gn.gauss_newton(Pose.identity(), build, 10, huber_delta=0.1)
    err_robust = np.linalg.norm(np.asarray(est_robust.trans) - np.asarray(true.trans))
    est_plain = gn.gauss_newton(Pose.identity(), build, 10, huber_delta=None)
    err_plain = np.linalg.norm(np.asarray(est_plain.trans) - np.asarray(true.trans))
    assert err_robust < 0.05
    assert err_robust < err_plain


def test_soa_factor_builders_match_aos():
    """FactorSetT builders must produce the same normal equations as the
    autodiff-verified AoS builders."""
    import numpy as np
    from scaloam_tpu.ops import gn, residuals, se3
    from scaloam_tpu.types import Pose

    rng = np.random.default_rng(11)
    n = 257
    pose = Pose(
        se3.quat_normalize(jnp.asarray(rng.normal(size=4), jnp.float32)),
        jnp.asarray(rng.normal(size=3), jnp.float32),
    )
    p = jnp.asarray(rng.normal(size=(n, 3)) * 5, jnp.float32)
    a = jnp.asarray(rng.normal(size=(n, 3)) * 5, jnp.float32)
    b = jnp.asarray(rng.normal(size=(n, 3)) * 5, jnp.float32)
    c = jnp.asarray(rng.normal(size=(n, 3)) * 5, jnp.float32)
    v = jnp.asarray(rng.uniform(size=n) > 0.3)
    un = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    nd = jnp.asarray(rng.normal(size=n), jnp.float32)

    pairs = [
        (
            residuals.edge_factors(pose, p, a, b, v),
            residuals.edge_factors_T(pose, p.T, a.T, b.T, v),
        ),
        (
            residuals.plane3_factors(pose, p, a, b, c, v),
            residuals.plane3_factors_T(pose, p.T, a.T, b.T, c.T, v),
        ),
        (
            residuals.plane_norm_factors(pose, p, un, nd, v),
            residuals.plane_norm_factors_T(pose, p.T, un.T, nd, v),
        ),
    ]
    for aos, soa in pairs:
        JtJ_a, Jtr_a, cost_a = gn.normal_equations([aos], 0.1)
        JtJ_s, Jtr_s, cost_s = gn.normal_equations([soa], 0.1)
        np.testing.assert_allclose(np.asarray(JtJ_a), np.asarray(JtJ_s), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(Jtr_a), np.asarray(Jtr_s), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(cost_a), np.asarray(cost_s), rtol=2e-4)
