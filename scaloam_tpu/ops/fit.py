"""Batched closed-form 3x3 eigendecomposition and plane fitting.

Replaces the per-point Eigen calls of the scan-to-map stage:
SelfAdjointEigenSolver over 5-NN covariance for edge direction
(src/laserMapping.cpp:599-610) and colPivHouseholderQr plane fit
(src/laserMapping.cpp:651-666). Both are closed-form here so thousands of
fits run as one fused batch on the VPU — no LAPACK loops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def eigh3x3(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Eigenvalues (ascending) of symmetric [..., 3, 3] via the trigonometric
    closed form, plus the eigenvector of the LARGEST eigenvalue.

    Returns (eigvals [..., 3], v_max [..., 3]). Accurate when the largest
    eigenvalue is separated — exactly the regime the edge test
    (lambda_max > 3 * lambda_mid) accepts."""
    a00 = A[..., 0, 0]; a01 = A[..., 0, 1]; a02 = A[..., 0, 2]
    a11 = A[..., 1, 1]; a12 = A[..., 1, 2]; a22 = A[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (
        a01 * a01 + a02 * a02 + a12 * a12
    )
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    # det(B)/2 with B = (A - qI)/p
    inv_p = 1.0 / p
    c00, c11, c22 = b00 * inv_p, b11 * inv_p, b22 * inv_p
    c01, c02, c12 = a01 * inv_p, a02 * inv_p, a12 * inv_p
    det_b = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    r = jnp.clip(det_b / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_max = q + 2.0 * p * jnp.cos(phi)
    e_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_max - e_min
    vals = jnp.stack([e_min, e_mid, e_max], axis=-1)

    # Eigenvector of e_max: column of (A - e_min I)(A - e_mid I) with max norm.
    eye = jnp.eye(3, dtype=A.dtype)
    M = jnp.matmul(
        A - e_min[..., None, None] * eye,
        A - e_mid[..., None, None] * eye,
        precision=_HI,
    )
    norms = jnp.sum(M * M, axis=-2)  # column squared norms [..., 3]
    col = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(M, col[..., None, None], axis=-1)[..., 0]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v / jnp.maximum(vn, 1e-20)
    return vals, v


def neighborhood_cov(pts: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Mean + covariance over the K-neighbor axis: pts [..., K, 3] ->
    (mean [..., 3], cov [..., 3, 3]). Matches the 1/K covariance of the
    reference (src/laserMapping.cpp:599-608)."""
    mean = jnp.mean(pts, axis=-2)
    d = pts - mean[..., None, :]
    cov = jnp.einsum("...ki,...kj->...ij", d, d, precision=_HI) / pts.shape[-2]
    return mean, cov


def fit_plane(pts: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Least-squares plane through pts [..., K, 3]: solve A n = -1, then
    normalize to (unit normal, d) with n.p + d ~= 0.

    Matches the colPivHouseholderQr fit of the reference
    (src/laserMapping.cpp:651-666). Returns (unit_norm [..., 3], d [...],
    ok [...]) where ok flags a well-conditioned solve."""
    K = pts.shape[-2]
    AtA = jnp.einsum("...ki,...kj->...ij", pts, pts, precision=_HI)
    Atb = -jnp.sum(pts, axis=-2)
    # Closed-form symmetric 3x3 solve (Cramer/adjugate): batched LU
    # (jnp.linalg.solve) is far slower on TPU than these VPU formulas.
    a = AtA[..., 0, 0]; b = AtA[..., 0, 1]; c = AtA[..., 0, 2]
    d = AtA[..., 1, 1]; e = AtA[..., 1, 2]; f = AtA[..., 2, 2]
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    ok = jnp.abs(det) > 1e-12
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    bx, by, bz = Atb[..., 0], Atb[..., 1], Atb[..., 2]
    n = jnp.stack(
        [
            (co00 * bx + co01 * by + co02 * bz) * inv_det,
            (co01 * bx + co11 * by + co12 * bz) * inv_det,
            (co02 * bx + co12 * by + co22 * bz) * inv_det,
        ],
        axis=-1,
    )
    norm = jnp.linalg.norm(n, axis=-1)
    # Ill-conditioned solves overflow rather than trip the det gate; treat
    # non-finite or exploded solutions as failed fits.
    ok = ok & (norm > 1e-10) & (norm < 1e8) & jnp.all(jnp.isfinite(n), axis=-1)
    norm_safe = jnp.where(ok, norm, 1.0)
    n = jnp.where(ok[..., None], n, 0.0)
    inv = jnp.where(ok, 1.0 / norm_safe, 0.0)
    return n * inv[..., None], inv, ok
