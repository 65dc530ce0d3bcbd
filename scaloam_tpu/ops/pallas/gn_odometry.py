"""Pallas kernel: the odometry associate+GN chain in one fused program.

The scan-to-scan solve (models/odometry.py) re-ranks cached candidates and
runs 2 outer x 4 Gauss-Newton iterations over TINY factor sets (768 sharp /
1536 flat points, config.py:54-57). In XLA that is ~300 sequential fusion
groups of [6,128]-class tensors — pure launch overhead (roofline: odometry
4.06 ms at 0.35% MXU / 11% HBM, "fewer, wider fused kernels" was the named
cure, VERDICT r4 weak #3). Here the WHOLE chain — candidate re-ranking,
edge/plane factor relinearization, Huber-weighted normal equations, the
6x6 Cholesky solve and the quaternion update — runs inside ONE Pallas
program with every array resident in VMEM, all in exact f32 on the VPU
(no bf16 operand rounding anywhere, unlike the einsum path that needed
Precision.HIGHEST).

Math parity (same formulas, same guards):
  - candidate re-rank: ops from models/odometry._pick1/_associate
    (reference data association, src/laserOdometry.cpp:278-483);
  - edge factors r = (p'-a)x(p'-b)/|a-b| with the cross-product-identity
    Jacobians (ops/residuals.edge_prep_T/edge_factors_from_prep,
    src/lidarFactor.hpp:12-55);
  - 3-point plane factors (ops/residuals.plane3_factors_T, :57-104);
  - Huber reweight + damped normal equations + unrolled Cholesky
    (ops/gn.normal_equations/solve_step/cholesky_solve6, Ceres
    Solve(DENSE_QR) with HuberLoss(0.1), src/laserOdometry.cpp:284-291);
  - right-multiplicative quaternion update (ops/gn.apply_delta).

The de-skew (DISTORTION=1) path keeps the XLA formulation — per-point
slerp breaks the shared-rotation scalar trick (cfg gates the kernel off).

Equivalence vs the XLA path: tests/test_pallas_gn.py (interpret mode).

Packs:
  corner_pack [16, Nc]: rows 0-2 p, 3-5 cand_any0, 6-8 cand_any1,
    9-11 cand_other0, 12-14 cand_other1, 15 mask
  surf_pack [24, Ns]: rows 0-2 p, 3-5 any0, 6-8 any1, 9-11 same0,
    12-14 same1, 15-17 other0, 18-20 other1, 21 mask, 22-23 pad
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-9  # residuals._EPS


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _rot_entries(q):
    """Scalar rotation-matrix entries from a wxyz quaternion (se3.quat_to_mat)."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return (
        (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
        (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
        (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)),
    )


def _apply_R(R, v):
    return (
        R[0][0] * v[0] + R[0][1] * v[1] + R[0][2] * v[2],
        R[1][0] * v[0] + R[1][1] * v[1] + R[1][2] * v[2],
        R[2][0] * v[0] + R[2][1] * v[1] + R[2][2] * v[2],
    )


def _apply_RT(R, v):
    return (
        R[0][0] * v[0] + R[1][0] * v[1] + R[2][0] * v[2],
        R[0][1] * v[0] + R[1][1] * v[1] + R[2][1] * v[2],
        R[0][2] * v[0] + R[1][2] * v[1] + R[2][2] * v[2],
    )


def _pick_nearer(pw, c0, c1):
    """Nearer of two cached candidates at the current pose (odometry._pick1)."""
    d0 = _dot(_sub(pw, c0), _sub(pw, c0))
    d1 = _dot(_sub(pw, c1), _sub(pw, c1))
    take1 = d1 < d0
    pt = tuple(jnp.where(take1, c1[k], c0[k]) for k in range(3))
    return jnp.minimum(d0, d1), pt


def _huber_w(s, delta):
    """gn.huber_weight: 1 for s <= delta^2, delta/sqrt(s) beyond."""
    return jnp.where(
        s <= delta * delta, 1.0, delta / jnp.sqrt(jnp.maximum(s, 1e-20))
    )


def _chol6_solve(A, b):
    """gn.cholesky_solve6 on scalar entries: A 6x6 list-of-lists, b [6]."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(jnp.maximum(s, 1e-20))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, n):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _exp_so3_quat(w):
    """se3.exp_so3 on scalars: rotation vector -> wxyz quaternion."""
    t2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    small = t2 < 1e-12
    t2_safe = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2_safe)
    half = 0.5 * theta
    k = jnp.where(small, 0.5 - t2 / 48.0, jnp.sin(half) / theta)
    cw = jnp.where(small, 1.0 - t2 / 8.0, jnp.cos(half))
    return (cw, k * w[0], k * w[1], k * w[2])


def _quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def _make_kernel(outer_iterations: int, gn_iterations: int, thr: float,
                 huber_delta: float, damping: float):
    def kernel(cp_ref, sp_ref, pose_ref, out_pose_ref, counts_ref):
        q = tuple(pose_ref[0, i] for i in range(4))
        t = tuple(pose_ref[0, 4 + i] for i in range(3))

        cp = tuple(cp_ref[i, :] for i in range(3))
        c_any0 = tuple(cp_ref[3 + i, :] for i in range(3))
        c_any1 = tuple(cp_ref[6 + i, :] for i in range(3))
        c_oth0 = tuple(cp_ref[9 + i, :] for i in range(3))
        c_oth1 = tuple(cp_ref[12 + i, :] for i in range(3))
        c_mask = cp_ref[15, :] > 0.5

        sp = tuple(sp_ref[i, :] for i in range(3))
        s_any0 = tuple(sp_ref[3 + i, :] for i in range(3))
        s_any1 = tuple(sp_ref[6 + i, :] for i in range(3))
        s_sam0 = tuple(sp_ref[9 + i, :] for i in range(3))
        s_sam1 = tuple(sp_ref[12 + i, :] for i in range(3))
        s_oth0 = tuple(sp_ref[15 + i, :] for i in range(3))
        s_oth1 = tuple(sp_ref[18 + i, :] for i in range(3))
        s_mask = sp_ref[21, :] > 0.5

        n_c = jnp.float32(0.0)
        n_s = jnp.float32(0.0)

        for _ in range(outer_iterations):
            # ---- data association at the current pose (odometry._associate)
            R = _rot_entries(q)
            cpw = tuple(v + ti for v, ti in zip(_apply_R(R, cp), t))
            dj, a = _pick_nearer(cpw, c_any0, c_any1)
            do, b = _pick_nearer(cpw, c_oth0, c_oth1)
            cvalid = c_mask & (dj < thr) & (do < thr)

            spw = tuple(v + ti for v, ti in zip(_apply_R(R, sp), t))
            sdj, pj = _pick_nearer(spw, s_any0, s_any1)
            ds, plq = _pick_nearer(spw, s_sam0, s_sam1)
            do2, pm = _pick_nearer(spw, s_oth0, s_oth1)
            svalid = s_mask & (sdj < thr) & (ds < thr) & (do2 < thr)
            n_c = jnp.sum(cvalid.astype(jnp.float32))
            n_s = jnp.sum(svalid.astype(jnp.float32))

            # ---- pose-independent preps (edge_prep_T / plane3_prep_T)
            d = _sub(a, b)
            dn = jnp.maximum(jnp.sqrt(_dot(d, d)), _EPS)
            # J_t columns: (e_k x d)/dn
            zero = jnp.zeros_like(dn)
            Jt = (
                (zero, -d[2] / dn, d[1] / dn),
                (d[2] / dn, zero, -d[0] / dn),
                (-d[1] / dn, d[0] / dn, zero),
            )
            nrm = _cross(_sub(pj, plq), _sub(pj, pm))
            nn = jnp.maximum(jnp.sqrt(_dot(nrm, nrm)), _EPS)
            nrm = (nrm[0] / nn, nrm[1] / nn, nrm[2] / nn)
            neg_d = -_dot(pj, nrm)

            zf = jnp.float32(0.0)

            def cmask_(v):
                # where, not multiply: degenerate candidate rows can carry
                # inf/NaN intermediates and 0*inf = NaN (same reason
                # gn.normal_equations sanitizes with jnp.where).
                return jnp.where(cvalid, v, zf)

            def smask_(v):
                return jnp.where(svalid, v, zf)

            # ---- 4 GN relinearizations with frozen correspondences
            for _ in range(gn_iterations):
                R = _rot_entries(q)
                # edge factors
                w3 = _apply_R(R, cp)
                pw = tuple(v + ti for v, ti in zip(w3, t))
                r_e = _cross(_sub(pw, a), _sub(pw, b))
                r_e = tuple(cmask_(v / dn) for v in r_e)
                Jcols = []
                for k in range(3):
                    Rk = (R[0][k], R[1][k], R[2][k])
                    ck = _cross(Rk, w3)
                    jr = _cross(ck, d)
                    Jcols.append(tuple(cmask_(v / dn) for v in jr))
                for k in range(3):
                    Jcols.append(tuple(cmask_(v) for v in Jt[k]))
                s_e = _dot(r_e, r_e)  # == sum over rows of r^2 (masked)
                wgt_e = jnp.where(cvalid, _huber_w(s_e, huber_delta), zf)

                # plane factors
                w3s = _apply_R(R, sp)
                pws = tuple(v + ti for v, ti in zip(w3s, t))
                r_s = smask_(_dot(nrm, pws) + neg_d)
                u = _apply_RT(R, nrm)
                jrot_s = _cross(sp, u)
                Js = [
                    smask_(jrot_s[0]), smask_(jrot_s[1]), smask_(jrot_s[2]),
                    smask_(nrm[0]), smask_(nrm[1]), smask_(nrm[2]),
                ]
                wgt_s = jnp.where(svalid, _huber_w(r_s * r_s, huber_delta), zf)

                # normal equations: stack all products, ONE lane reduction
                # per class per iteration instead of 54 scalar reductions.
                prods_e, prods_s = [], []
                for i in range(6):
                    for j in range(i, 6):
                        prods_e.append(wgt_e * _dot(Jcols[i], Jcols[j]))
                        prods_s.append(wgt_s * Js[i] * Js[j])
                for i in range(6):
                    prods_e.append(wgt_e * _dot(Jcols[i], r_e))
                    prods_s.append(wgt_s * Js[i] * r_s)
                sums = jnp.sum(jnp.stack(prods_e), axis=1) + jnp.sum(
                    jnp.stack(prods_s), axis=1
                )
                A = [[None] * 6 for _ in range(6)]
                idx = 0
                for i in range(6):
                    for j in range(i, 6):
                        A[i][j] = sums[idx]
                        A[j][i] = sums[idx]
                        idx += 1
                g6 = [sums[idx + i] for i in range(6)]
                # damped solve (gn.solve_step)
                for i in range(6):
                    A[i][i] = A[i][i] + damping * jnp.maximum(A[i][i], 1e-8)
                delta = _chol6_solve(A, [-v for v in g6])
                dq = _exp_so3_quat(delta[:3])
                q = _quat_mul(q, dq)
                qn = jnp.maximum(
                    jnp.sqrt(q[0] ** 2 + q[1] ** 2 + q[2] ** 2 + q[3] ** 2),
                    _EPS,
                )
                q = tuple(v / qn for v in q)
                t = (t[0] + delta[3], t[1] + delta[4], t[2] + delta[5])

        for i in range(4):
            out_pose_ref[0, i] = q[i]
        for i in range(3):
            out_pose_ref[0, 4 + i] = t[i]
        out_pose_ref[0, 7] = jnp.float32(0.0)
        counts_ref[0, 0] = n_c
        counts_ref[0, 1] = n_s

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "outer_iterations", "gn_iterations", "thr", "huber_delta", "damping",
        "interpret",
    ),
)
def associate_and_solve(
    corner_pack: jax.Array,  # [16, Nc] f32
    surf_pack: jax.Array,  # [24, Ns] f32
    quat0: jax.Array,  # [4]
    trans0: jax.Array,  # [3]
    *,
    outer_iterations: int,
    gn_iterations: int,
    thr: float,
    huber_delta: float,
    damping: float = 1e-6,
    interpret: bool = False,
):
    """Returns (quat [4], trans [3], n_corner int32, n_surf int32)."""
    pose_in = jnp.concatenate(
        [quat0, trans0, jnp.zeros((1,), jnp.float32)]
    )[None, :]
    kernel = _make_kernel(
        outer_iterations, gn_iterations, thr, huber_delta, damping
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    pose_out, counts = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ),
        # pose in/out + counts are SCALAR data: SMEM (Mosaic rejects
        # scalar stores to VMEM refs).
        in_specs=[vmem, vmem, smem],
        out_specs=(smem, smem),
        interpret=interpret,
    )(corner_pack, surf_pack, pose_in)
    return (
        pose_out[0, :4], pose_out[0, 4:7],
        counts[0, 0].astype(jnp.int32), counts[0, 1].astype(jnp.int32),
    )


def pack_corner(xyz, cand_any, cand_other, mask):
    """[Q,3] xyz + [Q,2,3] candidate pairs + [Q] mask -> [16, Q] pack."""
    rows = [
        xyz.T,
        cand_any[:, 0, :].T, cand_any[:, 1, :].T,
        cand_other[:, 0, :].T, cand_other[:, 1, :].T,
        mask.astype(jnp.float32)[None, :],
    ]
    return jnp.concatenate(rows, axis=0)


def pack_surf(xyz, cand_any, cand_same, cand_other, mask):
    """-> [24, Q] pack (2 zero pad rows keep the sublane count 8-aligned)."""
    Q = xyz.shape[0]
    rows = [
        xyz.T,
        cand_any[:, 0, :].T, cand_any[:, 1, :].T,
        cand_same[:, 0, :].T, cand_same[:, 1, :].T,
        cand_other[:, 0, :].T, cand_other[:, 1, :].T,
        mask.astype(jnp.float32)[None, :],
        jnp.zeros((2, Q), jnp.float32),
    ]
    return jnp.concatenate(rows, axis=0)
