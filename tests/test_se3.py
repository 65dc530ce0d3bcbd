"""SE(3)/quaternion ops vs scipy.spatial.transform golden."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation, Slerp

import jax.numpy as jnp

from scaloam_tpu.ops import se3
from scaloam_tpu.types import Pose


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def to_scipy(q_wxyz):
    return Rotation.from_quat(np.roll(np.asarray(q_wxyz), -1, axis=-1))


def test_quat_mul_matches_scipy(rng):
    a, b = random_quats(rng, 16), random_quats(rng, 16)
    got = np.asarray(se3.quat_mul(jnp.array(a), jnp.array(b)))
    want = (to_scipy(a) * to_scipy(b)).as_quat()  # xyzw
    want = np.roll(want, 1, axis=-1)
    # sign-insensitive comparison
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = random_quats(rng, 16)
    v = rng.normal(size=(16, 3))
    got = np.asarray(se3.quat_rotate(jnp.array(q), jnp.array(v)))
    want = np.einsum("nij,nj->ni", to_scipy(q).as_matrix(), v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_mat_roundtrip(rng):
    q = random_quats(rng, 32)
    m = se3.quat_to_mat(jnp.array(q, dtype=jnp.float32))
    q2 = np.asarray(se3.mat_to_quat(m))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2, q * sign, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m), to_scipy(q).as_matrix(), atol=1e-5
    )


def test_exp_log_so3_roundtrip(rng):
    w = rng.normal(size=(32, 3))
    q = se3.exp_so3(jnp.array(w, jnp.float32))
    want = Rotation.from_rotvec(w).as_quat()
    want = np.roll(want, 1, axis=-1)
    got = np.asarray(q)
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-5)
    w2 = np.asarray(se3.log_so3(q))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_exp_log_so3_small_angle():
    w = jnp.array([[0.0, 0.0, 0.0], [1e-8, 0.0, 0.0]], jnp.float32)
    q = se3.exp_so3(w)
    np.testing.assert_allclose(np.asarray(q[0]), [1, 0, 0, 0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(se3.log_so3(q)), np.asarray(w), atol=1e-7)


def test_exp_log_se3_roundtrip(rng):
    xi = rng.normal(size=(16, 6)).astype(np.float32)
    p = se3.exp_se3(jnp.array(xi))
    xi2 = np.asarray(se3.log_se3(p))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_compose_inverse_apply(rng):
    qa, qb = random_quats(rng, 8), random_quats(rng, 8)
    ta, tb = rng.normal(size=(8, 3)), rng.normal(size=(8, 3))
    a = Pose(jnp.array(qa, jnp.float32), jnp.array(ta, jnp.float32))
    b = Pose(jnp.array(qb, jnp.float32), jnp.array(tb, jnp.float32))
    ab = se3.compose(a, b)
    pts = rng.normal(size=(8, 3)).astype(np.float32)
    got = np.asarray(se3.apply(ab, jnp.array(pts)))
    want = np.asarray(se3.apply(a, se3.apply(b, jnp.array(pts))))
    np.testing.assert_allclose(got, want, atol=1e-5)

    ident = se3.compose(a, se3.inverse(a))
    np.testing.assert_allclose(np.abs(np.asarray(ident.quat[..., 0])), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ident.trans), 0.0, atol=1e-5)


def test_relative_consistency(rng):
    qa, qb = random_quats(rng, 4), random_quats(rng, 4)
    ta, tb = rng.normal(size=(4, 3)), rng.normal(size=(4, 3))
    a = Pose(jnp.array(qa, jnp.float32), jnp.array(ta, jnp.float32))
    b = Pose(jnp.array(qb, jnp.float32), jnp.array(tb, jnp.float32))
    rel = se3.relative(a, b)
    b2 = se3.compose(a, rel)
    np.testing.assert_allclose(np.asarray(b2.trans), tb, atol=1e-5)


def test_slerp_matches_scipy(rng):
    q0, q1 = random_quats(rng, 1)[0], random_quats(rng, 1)[0]
    s = 0.37
    got = np.asarray(se3.quat_slerp(jnp.array(q0, jnp.float32), jnp.array(q1, jnp.float32), s))
    key_rots = Rotation.from_quat(
        np.roll(np.stack([q0, q1]), -1, axis=-1)
    )
    want = np.roll(Slerp([0, 1], key_rots)([s]).as_quat()[0], 1)
    sign = np.sign(np.sum(got * want))
    np.testing.assert_allclose(got, want * sign, atol=1e-5)


def test_rpy_roundtrip_matches_scipy(rng):
    rpy = rng.uniform(-1.2, 1.2, size=(16, 3))
    q = se3.rpy_to_quat(
        jnp.array(rpy[:, 0], jnp.float32),
        jnp.array(rpy[:, 1], jnp.float32),
        jnp.array(rpy[:, 2], jnp.float32),
    )
    # scipy: extrinsic xyz == Rz(yaw)Ry(pitch)Rx(roll)
    want = Rotation.from_euler("xyz", rpy).as_quat()
    want = np.roll(want, 1, axis=-1)
    got = np.asarray(q)
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-5)
    r, p, y = se3.quat_to_rpy(q)
    np.testing.assert_allclose(np.stack([r, p, y], -1), rpy, atol=1e-4)


def test_pose_matrix_roundtrip(rng):
    q = random_quats(rng, 8)
    t = rng.normal(size=(8, 3))
    p = Pose(jnp.array(q, jnp.float32), jnp.array(t, jnp.float32))
    m = se3.pose_to_matrix(p)
    p2 = se3.matrix_to_pose(m)
    np.testing.assert_allclose(np.asarray(p2.trans), t, atol=1e-5)
    sign = np.sign(np.sum(np.asarray(p2.quat) * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(p2.quat), q * sign, atol=1e-5)
