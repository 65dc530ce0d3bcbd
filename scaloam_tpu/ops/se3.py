"""SO(3)/SE(3) operations on (wxyz quaternion, translation) pairs.

Replaces the reference's Eigen::Quaterniond arithmetic (front-end,
src/laserOdometry.cpp:504-505, src/laserMapping.cpp:143-153), gtsam::Pose3
(backend), and the RPY Euler convention used by Pose6D
(src/laserPosegraphOptimization.cpp:312-336 — R = Rz(yaw)·Ry(pitch)·Rx(roll)).

Everything is batched: all functions broadcast over leading axes and are
vmap/jit friendly. Quaternions are (w, x, y, z), matching Eigen's storage
semantics of the reference only in meaning (Eigen stores xyzw internally).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scaloam_tpu.types import Pose

_EPS = 1e-12


def _mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """3x3 matmul at full f32 precision.

    TPU matmuls default to bf16 accumulation; these tiny Jacobian products
    are precision-critical (pose tangent roundtrips), so force HIGHEST."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Quaternion core
# ---------------------------------------------------------------------------


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, both wxyz."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4].

    Uses the 2-cross-product expansion (cheaper than forming R)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion [..., 4] -> rotation matrix [..., 3, 3]."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] wxyz.

    Branch-free Shepperd's method: compute all four candidate forms, pick the
    numerically largest pivot (vmap/jit friendly)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by its own 4*q_i^2 pivot.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    case = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4cases, 4comps]
    q = jnp.take_along_axis(cands, case[..., None, None], axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_slerp(q0: jax.Array, q1: jax.Array, s) -> jax.Array:
    """Spherical interpolation from q0 towards q1 by fraction s.

    Matches Eigen's slerp used for motion de-skew
    (src/laserOdometry.cpp:122, src/lidarFactor.hpp:29)."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    w0 = jnp.where(small, 1.0 - s, jnp.sin((1.0 - s) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, s, jnp.sin(s * theta) / jnp.where(small, 1.0, sin_theta))
    return quat_normalize(w0 * q0 + w1 * q1)


# ---------------------------------------------------------------------------
# so(3)/se(3) exp & log
# ---------------------------------------------------------------------------


def hat(v: jax.Array) -> jax.Array:
    """[..., 3] -> skew-symmetric [..., 3, 3]."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def exp_so3(w: jax.Array) -> jax.Array:
    """Rotation vector [..., 3] -> unit quaternion (wxyz).

    Differentiable at w=0 (double-where guards the sqrt singularity so
    jacfwd/jacrev at the origin stay finite — needed by solvers that
    autodiff through apply_delta)."""
    t2 = jnp.sum(w * w, axis=-1, keepdims=True)
    small = t2 < 1e-12
    t2_safe = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2_safe)
    half = 0.5 * theta
    # sin(x/2)/x -> 1/2 - x^2/48; cos(x/2) -> 1 - x^2/8 for small x.
    k = jnp.where(small, 0.5 - t2 / 48.0, jnp.sin(half) / theta)
    cw = jnp.where(small, 1.0 - t2 / 8.0, jnp.cos(half))
    return jnp.concatenate([cw, k * w], axis=-1)


def log_so3(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation vector [..., 3]. Differentiable at the
    identity (double-where guards the sqrt/0 singularity)."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)  # w >= 0 branch
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vn2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = vn2 < 1e-12
    vn = jnp.sqrt(jnp.where(small, 1.0, vn2))
    theta = 2.0 * jnp.arctan2(vn, w)
    k = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), theta / vn)
    return k * v


def _so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian J_l of SO(3) at rotation vector w [..., 3] -> [..., 3, 3].
    Differentiable at w=0 (double-where)."""
    t2_raw = jnp.sum(w * w, axis=-1)[..., None, None]
    small = t2_raw < 1e-10
    t2 = jnp.where(small, 1.0, t2_raw)
    theta = jnp.sqrt(t2)
    W = hat(w)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    a = jnp.where(small, 0.5 - t2_raw / 24.0, (1.0 - jnp.cos(theta)) / t2)
    b = jnp.where(small, 1.0 / 6.0 - t2_raw / 120.0,
                  (theta - jnp.sin(theta)) / (t2 * theta))
    return eye + a * W + b * W2


def _so3_left_jacobian_inv(w: jax.Array) -> jax.Array:
    t2_raw = jnp.sum(w * w, axis=-1)[..., None, None]
    small = t2_raw < 1e-10
    t2 = jnp.where(small, 1.0, t2_raw)
    theta = jnp.sqrt(t2)
    W = hat(w)
    W2 = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    half = 0.5 * theta
    cot = jnp.where(small, 1.0 / 12.0 + t2_raw / 720.0,
                    (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS))
                    / t2)
    return eye - 0.5 * W + cot * W2


def exp_se3(xi: jax.Array) -> Pose:
    """se(3) tangent [..., 6] (omega, v) -> Pose. GTSAM Logmap ordering (rot first)."""
    w, v = xi[..., :3], xi[..., 3:]
    q = exp_so3(w)
    t = (_mm(_so3_left_jacobian(w), v[..., None]))[..., 0]
    return Pose(q, t)


def log_se3(p: Pose) -> jax.Array:
    """Pose -> se(3) tangent [..., 6] (omega, v)."""
    w = log_so3(p.quat)
    v = (_mm(_so3_left_jacobian_inv(w), p.trans[..., None]))[..., 0]
    return jnp.concatenate([w, v], axis=-1)


# ---------------------------------------------------------------------------
# Pose algebra
# ---------------------------------------------------------------------------


def compose(a: Pose, b: Pose) -> Pose:
    """a then b applied in a's frame: T_a * T_b."""
    return Pose(
        quat_normalize(quat_mul(a.quat, b.quat)),
        quat_rotate(a.quat, b.trans) + a.trans,
    )


def inverse(p: Pose) -> Pose:
    qi = quat_conj(p.quat)
    return Pose(qi, -quat_rotate(qi, p.trans))


def apply(p: Pose, pts: jax.Array) -> jax.Array:
    """Transform points [..., 3] by pose."""
    return quat_rotate(p.quat, pts) + p.trans


def relative(a: Pose, b: Pose) -> Pose:
    """T_a^-1 * T_b — the between-pose used by BetweenFactor."""
    return compose(inverse(a), b)


# ---------------------------------------------------------------------------
# RPY (Pose6D) conversions — artifact-boundary only
# ---------------------------------------------------------------------------


def rpy_to_quat(roll, pitch, yaw) -> jax.Array:
    """R = Rz(yaw) Ry(pitch) Rx(roll), the tf/gtsam RzRyRx convention
    (src/laserPosegraphOptimization.cpp:336)."""
    hr, hp, hy = roll * 0.5, pitch * 0.5, yaw * 0.5
    cr, sr = jnp.cos(hr), jnp.sin(hr)
    cp, sp = jnp.cos(hp), jnp.sin(hp)
    cy, sy = jnp.cos(hy), jnp.sin(hy)
    return jnp.stack(
        [
            cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
        ],
        axis=-1,
    )


def quat_to_rpy(q: jax.Array):
    """Inverse of rpy_to_quat. Returns (roll, pitch, yaw)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    sinp = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def pose_to_matrix(p: Pose) -> jax.Array:
    """Pose -> homogeneous [..., 4, 4]."""
    R = quat_to_mat(p.quat)
    top = jnp.concatenate([R, p.trans[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_pose(m: jax.Array) -> Pose:
    return Pose(mat_to_quat(m[..., :3, :3]), m[..., :3, 3])
