"""Sequential numpy golden models of the laserOdometry correspondence
selection, the laserMapping 5-NN line/plane correspondence, and the
Huber-GN inner solve.

Written from the behavioral spec (src/laserOdometry.cpp:299-483,
src/laserMapping.cpp:578-686, src/lidarFactor.hpp) as straight-line numpy,
the same treatment tests/golden_features.py gives scanRegistration. The
reference's index-window walks over the ring-sorted republished clouds are
expressed as their set semantics, which they equal on ring-sorted input:

  corner:  a = 1-NN (gate d^2 < 25);
           b = nearest point on a DIFFERENT ring within +-NEARBY_SCAN
               rings of a's ring (gate d^2 < 25)
  surf:    j = 1-NN (gate d^2 < 25);
           l = nearest SAME-ring point, j itself excluded (gate d^2 < 25);
           m = nearest different-ring point within +-NEARBY_SCAN (gate 25)
  map corner: 5-NN with sqrDist[4] < 1.0; covariance eigendecomposition;
           edge iff lambda_max > 3 * lambda_mid; endpoints mean +- 0.1*dir
  map surf: 5-NN with sqrDist[4] < 1.0; LS plane A n = -1; valid iff all
           5 residuals |n.p + d| <= 0.2

The golden GN runs in float64 with NUMERIC (central-difference) Jacobians
on the residuals defined independently here — validating the repo's
analytic factor Jacobians, Huber weighting, normal equations, and 6x6
solve end-to-end, not just reproducing them.
"""

import numpy as np


# ---------------------------------------------------------------- SE(3) ----

def quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def quat_to_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def exp_so3(v):
    th = np.linalg.norm(v)
    if th < 1e-12:
        return np.array([1.0, 0.5 * v[0], 0.5 * v[1], 0.5 * v[2]])
    u = v / th
    return np.concatenate([[np.cos(th / 2)], np.sin(th / 2) * u])


def transform(q, t, pts):
    return pts @ quat_to_mat(q).T + t


# --------------------------------------- odometry correspondences ----------

def odometry_correspond(
    rel_q, rel_t, q_xyz, q_mask, q_ring,
    tgt_xyz, tgt_mask, tgt_ring,
    kind, dist_sq_thr=25.0, nearby=2.5,
):
    """Per-query correspondence selection at the pose (rel_q, rel_t).

    kind='corner' returns (a, b, valid); kind='surf' returns (j, l, m,
    valid). Point arrays are [Q, 3] with garbage rows where ~valid."""
    Q = len(q_xyz)
    pw = transform(rel_q, rel_t, q_xyz)  # TransformToStart, s = 1
    t_ok = tgt_mask.astype(bool)
    t2 = np.sum(tgt_xyz * tgt_xyz, axis=1)

    j_idx = np.zeros(Q, np.int64)
    j_d = np.zeros(Q)
    l_idx = np.zeros(Q, np.int64)
    l_d = np.zeros(Q)
    o_idx = np.zeros(Q, np.int64)
    o_d = np.zeros(Q)
    for lo in range(0, Q, 512):  # chunked: [512, T] distance tiles
        sl = slice(lo, min(lo + 512, Q))
        n = sl.stop - sl.start
        d2 = (
            np.sum(pw[sl] * pw[sl], axis=1)[:, None]
            + t2[None, :]
            - 2.0 * pw[sl] @ tgt_xyz.T
        )
        d2[:, ~t_ok] = np.inf
        ji = np.argmin(d2, axis=1)
        j_idx[sl] = ji
        j_d[sl] = d2[np.arange(n), ji]
        ring_j = tgt_ring[ji]
        dr = np.abs(tgt_ring[None, :] - ring_j[:, None])
        d2_other = np.where((dr >= 0.5) & (dr <= nearby), d2, np.inf)
        oi = np.argmin(d2_other, axis=1)
        o_idx[sl] = oi
        o_d[sl] = d2_other[np.arange(n), oi]
        if kind != "corner":
            same = dr < 0.5
            same[np.arange(n), ji] = False  # the 1-NN itself is excluded
            d2_same = np.where(same, d2, np.inf)
            li = np.argmin(d2_same, axis=1)
            l_idx[sl] = li
            l_d[sl] = d2_same[np.arange(n), li]

    got1 = q_mask.astype(bool) & (j_d < dist_sq_thr)
    if kind == "corner":
        valid = got1 & (o_d < dist_sq_thr)
        return tgt_xyz[j_idx], tgt_xyz[o_idx], valid
    valid = got1 & (l_d < dist_sq_thr) & (o_d < dist_sq_thr)
    return tgt_xyz[j_idx], tgt_xyz[l_idx], tgt_xyz[o_idx], valid


# ---------------------------------------- mapping correspondences ----------

def mapping_correspond(pose_q, pose_t, q_xyz, q_mask, map_xyz, kind,
                       k=5, nn_max=1.0, eig_ratio=3.0, plane_tol=0.2):
    """Exact k-NN over the full map cloud + the line/plane fits.

    kind='corner' -> (a, b, valid); kind='surf' -> (unit_n, neg_d, valid)."""
    Q = len(q_xyz)
    pw = transform(pose_q, pose_t, q_xyz)
    m2 = np.sum(map_xyz * map_xyz, axis=1)
    nn = np.zeros((Q, k), np.int64)
    dk = np.zeros((Q, k))
    for lo in range(0, Q, 512):  # chunked: [512, M] distance tiles
        sl = slice(lo, min(lo + 512, Q))
        d2 = (
            np.sum(pw[sl] * pw[sl], axis=1)[:, None]
            + m2[None, :]
            - 2.0 * pw[sl] @ map_xyz.T
        )
        part = np.argpartition(d2, k - 1, axis=1)[:, :k]
        dpart = np.take_along_axis(d2, part, axis=1)
        order = np.argsort(dpart, axis=1)
        nn[sl] = np.take_along_axis(part, order, axis=1)
        dk[sl] = np.take_along_axis(dpart, order, axis=1)
    ok = q_mask.astype(bool) & (dk[:, -1] < nn_max) & (len(map_xyz) >= k)
    nb = map_xyz[nn]  # [Q, k, 3]

    if kind == "corner":
        mean = nb.mean(axis=1)
        ctr = nb - mean[:, None, :]
        a_out = np.zeros((Q, 3))
        b_out = np.zeros((Q, 3))
        valid = np.zeros(Q, bool)
        for i in range(Q):  # sequential, like the reference's per-point loop
            if not ok[i]:
                continue
            cov = ctr[i].T @ ctr[i] / k
            vals, vecs = np.linalg.eigh(cov)
            if vals[2] > eig_ratio * vals[1]:
                d = vecs[:, 2]
                a_out[i] = mean[i] + 0.1 * d
                b_out[i] = mean[i] - 0.1 * d
                valid[i] = True
        return a_out, b_out, valid

    n_out = np.zeros((Q, 3))
    d_out = np.zeros(Q)
    valid = np.zeros(Q, bool)
    for i in range(Q):
        if not ok[i]:
            continue
        A = nb[i]
        rhs = -np.ones(k)
        sol, *_ = np.linalg.lstsq(A, rhs, rcond=None)
        nrm = np.linalg.norm(sol)
        if nrm < 1e-12:
            continue
        neg_d = 1.0 / nrm
        unit = sol / nrm
        if np.all(np.abs(A @ unit + neg_d) <= plane_tol):
            n_out[i] = unit
            d_out[i] = neg_d
            valid[i] = True
    return n_out, d_out, valid


# ------------------------------------------------- residuals + golden GN ---

def edge_residual(q, t, p, a, b):
    pw = transform(q, t, p)
    num = np.cross(pw - a, pw - b)
    return num / np.maximum(np.linalg.norm(a - b, axis=1), 1e-9)[:, None]


def plane3_residual(q, t, p, j, l, m):
    n = np.cross(j - l, j - m)
    n = n / np.maximum(np.linalg.norm(n, axis=1), 1e-9)[:, None]
    pw = transform(q, t, p)
    return np.sum(n * (pw - j), axis=1)[:, None]


def plane_norm_residual(q, t, p, unit_n, neg_d):
    pw = transform(q, t, p)
    return (np.sum(unit_n * pw, axis=1) + neg_d)[:, None]


def _apply_delta(q, t, delta):
    return quat_mul(q, exp_so3(delta[:3])), t + delta[3:]


def huber_w(sq, delta):
    if delta is None:
        return np.ones_like(sq)
    return np.where(sq <= delta * delta, 1.0, delta / np.sqrt(np.maximum(sq, 1e-20)))


def golden_gn(q0, t0, factor_fns, iterations, huber_delta, damping=1e-6,
              eps=1e-6):
    """Fixed-count GN with numeric (central-difference) Jacobians in f64.

    factor_fns: list of (residual_fn(q, t) -> [n, R]) with the validity
    already applied by the caller (pass only valid rows)."""
    q, t = np.asarray(q0, np.float64), np.asarray(t0, np.float64)
    for _ in range(iterations):
        JtJ = np.zeros((6, 6))
        Jtr = np.zeros(6)
        for fn in factor_fns:
            r = fn(q, t)  # [n, R]
            n, R = r.shape
            J = np.zeros((n, R, 6))
            for kdim in range(6):
                dp = np.zeros(6)
                dp[kdim] = eps
                qp, tp = _apply_delta(q, t, dp)
                qm, tm = _apply_delta(q, t, -dp)
                J[:, :, kdim] = (fn(qp, tp) - fn(qm, tm)) / (2 * eps)
            w = huber_w(np.sum(r * r, axis=1), huber_delta)  # [n]
            Jw = J * w[:, None, None]
            JtJ += np.einsum("nri,nrj->ij", Jw, J)
            Jtr += np.einsum("nri,nr->i", Jw, r)
        A = JtJ + damping * np.diag(np.maximum(np.diagonal(JtJ), 1e-8))
        delta = np.linalg.solve(A, -Jtr)
        q, t = _apply_delta(q, t, delta)
        q = q / np.linalg.norm(q)
    return q, t
