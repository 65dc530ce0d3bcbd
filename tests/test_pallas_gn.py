"""Fused associate+GN Pallas kernel vs the XLA formulation.

The kernel (ops/pallas/gn_odometry.py) must reproduce the exact chain the
XLA path runs in models/odometry.odometry_step's solve branch: candidate
re-ranking (_associate), edge/plane factor relinearization, Huber-weighted
damped GN (_solve), across 2 outer x 4 inner iterations. Run in interpret
mode on CPU against the same random correspondence scenario."""

import types

import numpy as np
import pytest
import jax.numpy as jnp

from scaloam_tpu import config
from scaloam_tpu.models import odometry as om
from scaloam_tpu.ops import se3
from scaloam_tpu.ops.pallas import gn_odometry as gnk
from scaloam_tpu.types import FeatureCloud, Pose


def _scenario(rng, n_c=256, n_s=512, frac_valid=0.8):
    """Random but convergent problem: candidates are the ground-truth
    transformed points plus small class-consistent offsets, so both paths
    iterate toward the same optimum through identical math."""
    q_gt = se3.exp_so3(jnp.asarray(rng.normal(0, 0.02, 3), jnp.float32))
    t_gt = jnp.asarray(rng.normal(0, 0.3, 3), jnp.float32)
    gt = Pose(q_gt, t_gt)

    def cloud(n):
        xyz = jnp.asarray(
            rng.uniform(-20, 20, size=(n, 3)), jnp.float32
        )
        mask = jnp.asarray(rng.uniform(size=n) < frac_valid)
        return xyz, mask

    c_xyz, c_mask = cloud(n_c)
    s_xyz, s_mask = cloud(n_s)
    cw = se3.apply(gt, c_xyz)
    sw = se3.apply(gt, s_xyz)

    def cands(base, spread):
        off = jnp.asarray(rng.normal(0, spread, size=(base.shape[0], 2, 3)),
                          jnp.float32)
        return base[:, None, :] + off

    corner_cand = (cands(cw, 0.05), cands(cw, 0.3))
    surf_cand = (cands(sw, 0.05), cands(sw, 0.2), cands(sw, 0.3))

    feats = types.SimpleNamespace(
        sharp=FeatureCloud(
            xyz=c_xyz, ring=jnp.zeros(n_c), rel_time=jnp.zeros(n_c),
            mask=c_mask,
        ),
        flat=FeatureCloud(
            xyz=s_xyz, ring=jnp.zeros(n_s), rel_time=jnp.zeros(n_s),
            mask=s_mask,
        ),
    )
    return feats, corner_cand, surf_cand


def _xla_path(rel, feats, corner_cand, surf_cand, cfg):
    n_c = n_s = None
    for _ in range(cfg.odometry.outer_iterations):
        corner_data, surf_data = om._associate(
            rel, feats, corner_cand, surf_cand, cfg
        )
        rel = om._solve(rel, corner_data, surf_data, cfg)
        n_c = int(jnp.sum(corner_data[3].astype(jnp.int32)))
        n_s = int(jnp.sum(surf_data[4].astype(jnp.int32)))
    return rel, n_c, n_s


@pytest.mark.parametrize("seed", [0, 3])
def test_kernel_matches_xla_path(seed):
    rng = np.random.default_rng(seed)
    cfg = config.kitti_hdl64()
    feats, corner_cand, surf_cand = _scenario(rng)
    rel0 = Pose.identity()

    ref, n_c_ref, n_s_ref = _xla_path(
        rel0, feats, corner_cand, surf_cand, cfg
    )

    cpack = gnk.pack_corner(
        feats.sharp.xyz, corner_cand[0], corner_cand[1], feats.sharp.mask
    )
    spack = gnk.pack_surf(
        feats.flat.xyz, surf_cand[0], surf_cand[1], surf_cand[2],
        feats.flat.mask,
    )
    q, t, n_c, n_s = gnk.associate_and_solve(
        cpack, spack, rel0.quat, rel0.trans,
        outer_iterations=cfg.odometry.outer_iterations,
        gn_iterations=cfg.odometry.gn_iterations,
        thr=cfg.odometry.distance_sq_threshold,
        huber_delta=cfg.odometry.huber_delta,
        interpret=True,
    )

    assert int(n_c) == n_c_ref
    assert int(n_s) == n_s_ref
    # identical math modulo f32 accumulation order
    qr = np.asarray(ref.quat)
    qk = np.asarray(q)
    if np.dot(qr, qk) < 0:
        qk = -qk
    np.testing.assert_allclose(qk, qr, atol=2e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(ref.trans),
                               atol=2e-3)


def test_kernel_all_invalid_is_identity_step():
    """With every correspondence masked out the damped solve must return
    the initial pose unchanged (and finite)."""
    n_c, n_s = 64, 128
    z3 = jnp.zeros((n_c, 3), jnp.float32)
    cpack = gnk.pack_corner(
        z3, jnp.zeros((n_c, 2, 3)), jnp.zeros((n_c, 2, 3)),
        jnp.zeros(n_c, bool),
    )
    spack = gnk.pack_surf(
        jnp.zeros((n_s, 3)), jnp.zeros((n_s, 2, 3)), jnp.zeros((n_s, 2, 3)),
        jnp.zeros((n_s, 2, 3)), jnp.zeros(n_s, bool),
    )
    q0 = jnp.array([1.0, 0, 0, 0], jnp.float32)
    t0 = jnp.array([0.5, -0.25, 1.0], jnp.float32)
    q, t, n_c_out, n_s_out = gnk.associate_and_solve(
        cpack, spack, q0, t0,
        outer_iterations=2, gn_iterations=4, thr=25.0, huber_delta=0.1,
        interpret=True,
    )
    assert int(n_c_out) == 0 and int(n_s_out) == 0
    np.testing.assert_allclose(np.asarray(q), np.asarray(q0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t0), atol=1e-5)
