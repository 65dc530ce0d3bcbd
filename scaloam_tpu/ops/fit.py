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
    """Plane through pts [..., K, 3] as (unit_norm, neg_d, ok) with
    n.p + neg_d ~= 0, sign convention n.centroid < 0 (the reference's
    A n = -1 orientation).

    The reference solves A n = -1 by QR in f64 on RAW coordinates
    (src/laserMapping.cpp:651-666). In f32 that system is hopeless:
    cond(AtA) ~ (range/thickness)^2 (~1e7 at 20 m), measured as ~2 deg
    normal error vs the f64 oracle (tests/test_golden_scanmatch.py).
    Centered TLS instead: the smallest eigenvector of the CENTERED
    covariance — equal to the A n = -1 normal up to
    O(lambda_min/lambda_mid) mixing, far below the f32 error of the raw
    solve, and the covariance entries are O(extent^2) so f32 is ample.
    eigh3x3 returns the top eigenvector, so flip the spectrum with
    (trace I - cov); its top separation is lambda_mid - lambda_min,
    exactly the planar regime the validity gate accepts."""
    mean, cov = neighborhood_cov(pts)
    tr = cov[..., 0, 0] + cov[..., 1, 1] + cov[..., 2, 2]
    eye = jnp.eye(3, dtype=pts.dtype)
    vals_f, v = eigh3x3(tr[..., None, None] * eye - cov)
    # flipped spectrum ascending = (tr - l_max, tr - l_mid, tr - l_min)
    lam_min = tr - vals_f[..., 2]
    lam_mid = tr - vals_f[..., 1]
    # orientation: A n = -1 gives n.p ~ -1, i.e. unit n with n.mean < 0
    s = jnp.where(jnp.sum(v * mean, axis=-1) > 0, -1.0, 1.0)
    n = v * s[..., None]
    neg_d = -jnp.sum(n * mean, axis=-1)
    # degenerate neighborhoods (coincident/collinear points) have no
    # separated smallest eigenvalue; the eigenvector is meaningless there
    ok = (lam_mid > jnp.maximum(1e-12, 4.0 * lam_min)) & jnp.all(
        jnp.isfinite(n), axis=-1
    )
    n = jnp.where(ok[..., None], n, 0.0)
    neg_d = jnp.where(ok, neg_d, 0.0)
    return n, neg_d, ok
