"""Batched Gauss-Newton on SE(3) — the Ceres Solve(DENSE_QR) replacement.

Reference solves each registration problem with Ceres (Huber loss 0.1,
EigenQuaternionParameterization, DENSE_QR, max 4 iterations —
src/laserOdometry.cpp:284-291,493-499; src/laserMapping.cpp:565-572,713-721).
Here: normal equations accumulated by einsum over all factors at once
(JtJ [6,6], Jtr [6]), robust Huber reweighting per factor block, fixed
iteration count, tiny LM damping for degenerate guard. Everything stays on
device; the solve is a 6x6 linear system.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from scaloam_tpu.ops import residuals as res_mod
from scaloam_tpu.ops import se3
from scaloam_tpu.types import Pose

_HI = jax.lax.Precision.HIGHEST


def huber_weight(sq_norm: jax.Array, delta: float) -> jax.Array:
    """Ceres HuberLoss derivative rho'(s) at s = ||r||^2:
    1 for s <= delta^2, delta/sqrt(s) beyond."""
    d2 = delta * delta
    safe = jnp.maximum(sq_norm, 1e-20)
    return jnp.where(sq_norm <= d2, 1.0, delta / jnp.sqrt(safe))


def normal_equations(
    factor_sets: Sequence[res_mod.FactorSet], huber_delta: float | None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Accumulate JtJ [6,6], Jtr [6] and total weighted cost over factor sets."""
    JtJ = jnp.zeros((6, 6), jnp.float32)
    Jtr = jnp.zeros((6,), jnp.float32)
    cost = jnp.zeros((), jnp.float32)
    for fs in factor_sets:
        if isinstance(fs, res_mod.FactorSetT):
            # SoA layout: r [R, n], J [R, 6, n] — n rides the lanes.
            vm = fs.valid[None, :]
            r = jnp.where(vm, fs.r, 0.0)
            J = jnp.where(vm[:, None, :], fs.J, 0.0)
            s = jnp.sum(r * r, axis=0)  # [n]
            w = fs.valid.astype(jnp.float32)
            if huber_delta is not None:
                w = w * huber_weight(s, huber_delta)
            Jw = J * w[None, None, :]
            JtJ = JtJ + jnp.einsum("rin,rjn->ij", Jw, J, precision=_HI)
            Jtr = Jtr + jnp.einsum("rin,rn->i", Jw, r, precision=_HI)
            cost = cost + jnp.sum(w * s)
            continue
        # Sanitize invalid rows: zero weight is not enough, since degenerate
        # correspondences (e.g. singular plane fits) can carry NaN/inf data
        # and 0 * NaN poisons the reduction.
        vm = fs.valid[:, None]
        r = jnp.where(vm, fs.r, 0.0)
        J = jnp.where(vm[..., None], fs.J, 0.0)
        s = jnp.sum(r * r, axis=-1)
        w = fs.valid.astype(jnp.float32)
        if huber_delta is not None:
            w = w * huber_weight(s, huber_delta)
        Jw = J * w[:, None, None]
        JtJ = JtJ + jnp.einsum("nri,nrj->ij", Jw, J, precision=_HI)
        Jtr = Jtr + jnp.einsum("nri,nr->i", Jw, r, precision=_HI)
        cost = cost + jnp.sum(w * s)
    return JtJ, Jtr, cost


def cholesky_solve6(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b for a 6x6 SPD system with an unrolled Cholesky.

    jnp.linalg.solve lowers to an LU custom call on TPU (~50 us per call —
    the 16 solves/frame showed up as the hottest custom-calls in the stage
    trace); the unrolled scalar form fuses into the surrounding kernel."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(jnp.maximum(s, 1e-20))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, n):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    # Forward substitution: L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # Back substitution: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def solve_step(JtJ: jax.Array, Jtr: jax.Array, damping: float = 1e-6) -> jax.Array:
    """One GN step: (JtJ + lambda*diag(JtJ)) delta = -Jtr."""
    diag = jnp.diagonal(JtJ)
    A = JtJ + damping * jnp.diag(jnp.maximum(diag, 1e-8))
    return cholesky_solve6(A, -Jtr)


def apply_delta(pose: Pose, delta: jax.Array) -> Pose:
    """Right-multiplicative update matching the residual Jacobians."""
    dq = se3.exp_so3(delta[:3])
    return Pose(
        se3.quat_normalize(se3.quat_mul(pose.quat, dq)),
        pose.trans + delta[3:],
    )


def gauss_newton(
    pose0: Pose,
    build_factors,
    iterations: int,
    huber_delta: float | None,
    damping: float = 1e-6,
) -> Pose:
    """Run fixed-count GN: factors are rebuilt (residuals relinearized) each
    iteration from the current pose, correspondences stay fixed — exactly
    Ceres' inner loop with frozen data association.

    Unrolled (not fori_loop): the body is a handful of cheap batched ops and
    the while-loop form pays carried-buffer copies around each tiny
    dot_general (visible as the hot copy/fusion pairs in the stage trace)."""

    pose = pose0
    for _ in range(iterations):
        sets = build_factors(pose)
        JtJ, Jtr, _ = normal_equations(sets, huber_delta)
        delta = solve_step(JtJ, Jtr, damping)
        pose = apply_delta(pose, delta)
    return pose
