"""Lidar residuals with analytic Jacobians — the Ceres autodiff replacement.

Reference: src/lidarFactor.hpp defines four autodiff cost functors
(LidarEdgeFactor :12-55, LidarPlaneFactor :57-104, LidarPlaneNormFactor
:106-138, LidarDistanceFactor :141-172), each differentiated by Ceres at
runtime. Here each residual is a pure jnp function with a hand-derived
Jacobian w.r.t. a right-multiplicative se(3) perturbation, batched over all
correspondences at once, so a whole Gauss-Newton normal-equation build is
a couple of einsums (SURVEY.md §7 "Replace Ceres autodiff").

Convention: pose (q, t) maps a point p into the target frame as
p' = R(q) p + t. The 6-dof perturbation delta = (dtheta, dt) acts as
q <- q * Exp(dtheta), t <- t + dt, giving
    d p' / d dtheta = -R [p]x        d p' / d dt = I.

Each builder returns a FactorSet: r [n, R] residuals, J [n, R, 6] Jacobians,
valid [n] gate (0 weight for padding / failed correspondences).

With the reference's DISTORTION=0 the slerp factor s == 1
(src/laserOdometry.cpp:59,84), so the interpolated pose is the full pose.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from scaloam_tpu.ops import se3
from scaloam_tpu.types import Pose

_EPS = 1e-9


class FactorSet(NamedTuple):
    r: jax.Array  # [n, R]
    J: jax.Array  # [n, R, 6]
    valid: jax.Array  # [n] bool


def _point_jacobian(q: jax.Array, p: jax.Array):
    """R p and d(Rp)/d(dtheta) = -R [p]x for each point."""
    Rp = se3.quat_rotate(q, p)
    R = se3.quat_to_mat(q)
    J_theta = -jnp.matmul(R, se3.hat(p), precision=jax.lax.Precision.HIGHEST)
    return Rp, J_theta


def transform_points(pose: Pose, pts: jax.Array, s=None) -> jax.Array:
    """TransformToStart (src/laserOdometry.cpp:111-129): de-skew by the
    slerp-interpolated pose; s=None (DISTORTION off) applies the full pose."""
    if s is None:
        return se3.apply(pose, pts)
    q = jnp.broadcast_to(pose.quat, pts.shape[:-1] + (4,))
    ident = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0], pose.quat.dtype), q.shape)
    q_s = se3.quat_slerp(ident, q, s[..., None])
    return se3.quat_rotate(q_s, pts) + s[..., None] * pose.trans


def edge_factors(
    pose: Pose, p: jax.Array, a: jax.Array, b: jax.Array, valid: jax.Array
) -> FactorSet:
    """Point-to-line: r = (p' - a) x (p' - b) / |a - b| (3-dim).

    LidarEdgeFactor (src/lidarFactor.hpp:12-55). Using
    (p'-a) x (p'-b) = p' x (a-b) + a x b, dr/dp' = -[a-b]x / |a-b|."""
    n = p.shape[0]
    Rp, J_theta = _point_jacobian(jnp.broadcast_to(pose.quat, (n, 4)), p)
    pw = Rp + pose.trans
    d = a - b
    dn = jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), _EPS)
    r = jnp.cross(pw - a, pw - b) / dn
    dr_dpw = -se3.hat(d) / dn[..., None]
    J_rot = jnp.matmul(dr_dpw, J_theta, precision=jax.lax.Precision.HIGHEST)
    J = jnp.concatenate([J_rot, dr_dpw], axis=-1)
    return FactorSet(r=r, J=J, valid=valid)


def plane3_factors(
    pose: Pose, p: jax.Array, j: jax.Array, l: jax.Array, m: jax.Array,
    valid: jax.Array,
) -> FactorSet:
    """Point-to-plane via 3 points: r = (p' - j) . normalize((j-l)x(j-m)).

    LidarPlaneFactor (src/lidarFactor.hpp:57-104)."""
    n = p.shape[0]
    Rp, J_theta = _point_jacobian(jnp.broadcast_to(pose.quat, (n, 4)), p)
    pw = Rp + pose.trans
    nrm = jnp.cross(j - l, j - m)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), _EPS)
    r = jnp.sum((pw - j) * nrm, axis=-1, keepdims=True)
    J_rot = jnp.einsum("ni,nij->nj", nrm, J_theta)
    J = jnp.concatenate([J_rot, nrm], axis=-1)[:, None, :]
    return FactorSet(r=r, J=J, valid=valid)


def plane_norm_factors(
    pose: Pose, p: jax.Array, unit_norm: jax.Array, neg_oa_dot: jax.Array,
    valid: jax.Array,
) -> FactorSet:
    """Point-to-plane via (n, d): r = n . p' + d.

    LidarPlaneNormFactor (src/lidarFactor.hpp:106-138); the scan-to-map
    surf factor (src/laserMapping.cpp:684-686)."""
    n = p.shape[0]
    Rp, J_theta = _point_jacobian(jnp.broadcast_to(pose.quat, (n, 4)), p)
    pw = Rp + pose.trans
    r = (jnp.sum(unit_norm * pw, axis=-1) + neg_oa_dot)[:, None]
    J_rot = jnp.einsum("ni,nij->nj", unit_norm, J_theta)
    J = jnp.concatenate([J_rot, unit_norm], axis=-1)[:, None, :]
    return FactorSet(r=r, J=J, valid=valid)


# ---------------------------------------------------------------------------
# SoA ([3, n]) factor builders — the hot-path variants.
#
# [n, 3] arrays tile on TPU as (8, 128) blocks with only 3 of 128 lanes
# used (a 42x physical inflation), and the AoS builders construct per-point
# 3x3 matrices. These variants keep everything as [3, n] rows (n in lanes)
# and use the rotation identities
#     col_k(-R [p]x) = R[:,k] x (R p)          (R(a x b) = Ra x Rb)
#     v^T (-R [p]x)  = (p x R^T v)^T
# so J is built from elementwise cross products + ONE 3x3 matmul.
# ---------------------------------------------------------------------------


class FactorSetT(NamedTuple):
    r: jax.Array  # [R, n]
    J: jax.Array  # [R, 6, n]
    valid: jax.Array  # [n] bool


def _cross_rows(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cross product of [3, n] column-vector bundles."""
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]
    )


def _slerp_cols(pose: Pose, pT: jax.Array, s: jax.Array):
    """Per-point slerp-s pose pieces for the de-skew factors
    (LidarEdgeFactor/LidarPlaneFactor with s != 1, src/lidarFactor.hpp:26-34):
    returns (q_s [n,4], w [3,n] = R_s p, R_cols 3x[3,n] = columns of R_s).

    The per-point rotation breaks the shared-R one-matmul trick of the s=1
    path, so the s path is opt-in (cfg.odometry.distortion, default off like
    the reference's DISTORTION)."""
    n = pT.shape[1]
    ident = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0], pose.quat.dtype), (n, 4))
    q_s = se3.quat_slerp(ident, jnp.broadcast_to(pose.quat, (n, 4)), s[:, None])
    w = se3.quat_rotate(q_s, pT.T).T
    eye = jnp.eye(3, dtype=pT.dtype)
    R_cols = [
        se3.quat_rotate(q_s, jnp.broadcast_to(eye[k], (n, 3))).T
        for k in range(3)
    ]
    return q_s, w, R_cols


class EdgePrepT(NamedTuple):
    """Pose-INDEPENDENT half of the SoA edge factor build, computed once
    per outer association pass and reused by every GN relinearization
    (the translation Jacobian block (e_k x d)/dn and the line geometry
    never change while correspondences are frozen — rebuilding them per
    iteration was ~40% of the edge build, tools/profile_odometry2.py)."""

    pT: jax.Array  # [3, n]
    aT: jax.Array
    bT: jax.Array
    d: jax.Array  # aT - bT
    dn: jax.Array  # [1, n]
    J_t: jax.Array  # [3, 3, n] translation block
    valid: jax.Array


def edge_prep_T(
    pT: jax.Array, aT: jax.Array, bT: jax.Array, valid: jax.Array
) -> EdgePrepT:
    d = aT - bT
    dn = jnp.maximum(jnp.sqrt(jnp.sum(d * d, axis=0)), _EPS)[None, :]
    e = jnp.eye(3, dtype=pT.dtype)
    J_t = jnp.stack(
        [
            _cross_rows(jnp.broadcast_to(e[:, k : k + 1], d.shape), d) / dn
            for k in range(3)
        ],
        axis=1,
    )
    return EdgePrepT(pT=pT, aT=aT, bT=bT, d=d, dn=dn, J_t=J_t, valid=valid)


def edge_factors_from_prep(pose: Pose, prep: EdgePrepT) -> FactorSetT:
    """Relinearize the s=1 edge factors at `pose` (the per-iteration half)."""
    R = se3.quat_to_mat(pose.quat)
    w = jnp.matmul(R, prep.pT, precision=jax.lax.Precision.HIGHEST)  # R p
    pw = w + pose.trans[:, None]
    R_cols = [jnp.broadcast_to(R[:, k : k + 1], w.shape) for k in range(3)]
    r = _cross_rows(pw - prep.aT, pw - prep.bT) / prep.dn
    # J_theta columns: col_k = R[:,k] x w ; then dr_dpw col = (col_k x d)/dn.
    J_rot = jnp.stack(
        [
            _cross_rows(_cross_rows(R_cols[k], w), prep.d) / prep.dn
            for k in range(3)
        ],
        axis=1,
    )
    J = jnp.concatenate([J_rot, prep.J_t], axis=1)  # [3, 6, n]
    return FactorSetT(r=r, J=J, valid=prep.valid)


def edge_factors_T(
    pose: Pose, pT: jax.Array, aT: jax.Array, bT: jax.Array, valid: jax.Array,
    s: Optional[jax.Array] = None,
) -> FactorSetT:
    """SoA LidarEdgeFactor: r = (p'-a) x (p'-b) / |a-b| (3-dim).

    With s (de-skew fractions in [0,1], DISTORTION on): p' = R_s p + s t
    where R_s = slerp(I, q, s), and the Jacobian uses the first-order
    identity slerp(I, q exp(delta), s) ~= R_s exp(s delta) — exact at q = I
    and O(|log q| |delta|) otherwise (|log q| ~ 1e-2 rad scan-to-scan, so
    the GN fixed-point shift is negligible; the reference differentiates
    the slerp exactly via ceres Jets, src/lidarFactor.hpp:26-55)."""
    if s is None:
        return edge_factors_from_prep(pose, edge_prep_T(pT, aT, bT, valid))
    d = aT - bT
    dn = jnp.maximum(jnp.sqrt(jnp.sum(d * d, axis=0)), _EPS)[None, :]
    e = jnp.eye(3, dtype=pT.dtype)
    _, w, R_cols = _slerp_cols(pose, pT, s)
    pw = w + s[None, :] * pose.trans[:, None]
    sc = s[None, :]
    r = _cross_rows(pw - aT, pw - bT) / dn
    J_rot = [sc * _cross_rows(_cross_rows(R_cols[k], w), d) / dn for k in range(3)]
    J_t = [
        sc * _cross_rows(jnp.broadcast_to(e[:, k : k + 1], d.shape), d) / dn
        for k in range(3)
    ]
    J = jnp.stack(J_rot + J_t, axis=1)  # [3, 6, n]
    return FactorSetT(r=r, J=J, valid=valid)


def plane3_prep_T(jT: jax.Array, lT: jax.Array, mT: jax.Array):
    """Pose-independent half of the 3-point plane factor: the unit normal
    and offset of the correspondence plane (frozen with the association;
    hoist out of the GN iteration like edge_prep_T)."""
    nrm = _cross_rows(jT - lT, jT - mT)
    nrm = nrm / jnp.maximum(jnp.sqrt(jnp.sum(nrm * nrm, axis=0)), _EPS)[None, :]
    return nrm, -jnp.sum(jT * nrm, axis=0)


def plane3_factors_T(
    pose: Pose, pT: jax.Array, jT: jax.Array, lT: jax.Array, mT: jax.Array,
    valid: jax.Array, s: Optional[jax.Array] = None,
) -> FactorSetT:
    """SoA LidarPlaneFactor: r = (p' - j) . normalize((j-l)x(j-m)).
    s: optional de-skew fractions (see edge_factors_T)."""
    nrm, neg_d = plane3_prep_T(jT, lT, mT)
    return _plane_T(pose, pT, nrm, neg_d, valid, s=s)


def plane_norm_factors_T(
    pose: Pose, pT: jax.Array, unit_normT: jax.Array, neg_oa_dot: jax.Array,
    valid: jax.Array,
) -> FactorSetT:
    """SoA LidarPlaneNormFactor: r = n . p' + d."""
    return _plane_T(pose, pT, unit_normT, neg_oa_dot, valid)


def _plane_T(pose, pT, nT, neg_d, valid, s=None) -> FactorSetT:
    if s is None:
        R = se3.quat_to_mat(pose.quat)
        pw = jnp.matmul(R, pT, precision=jax.lax.Precision.HIGHEST) + pose.trans[:, None]
        u = jnp.matmul(R.T, nT, precision=jax.lax.Precision.HIGHEST)  # R^T n
        sc = 1.0
        J_n = nT
    else:
        q_s, w, _ = _slerp_cols(pose, pT, s)
        pw = w + s[None, :] * pose.trans[:, None]
        u = se3.quat_rotate(se3.quat_conj(q_s), nT.T).T  # R_s^T n per point
        sc = s[None, :]
        J_n = s[None, :] * nT
    r = (jnp.sum(nT * pw, axis=0) + neg_d)[None, :]
    J_rot = sc * _cross_rows(pT, u)  # s (p x R_s^T n)^T
    J = jnp.concatenate([J_rot, J_n], axis=0)[None, :, :]  # [1, 6, n]
    return FactorSetT(r=r, J=J, valid=valid)


def distance_factors(
    pose: Pose, p: jax.Array, closed: jax.Array, valid: jax.Array
) -> FactorSet:
    """Point-to-point: r = p' - c (3-dim).

    LidarDistanceFactor (src/lidarFactor.hpp:141-172); also the loop-ICP
    residual (pcl ICP is point-to-point, laserPosegraphOptimization.cpp:517)."""
    n = p.shape[0]
    Rp, J_theta = _point_jacobian(jnp.broadcast_to(pose.quat, (n, 4)), p)
    pw = Rp + pose.trans
    r = pw - closed
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), (n, 3, 3))
    J = jnp.concatenate([J_theta, eye], axis=-1)
    return FactorSet(r=r, J=J, valid=valid)
