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


def solve_step(JtJ: jax.Array, Jtr: jax.Array, damping: float = 1e-6) -> jax.Array:
    """One GN step: (JtJ + lambda*diag(JtJ)) delta = -Jtr."""
    diag = jnp.diagonal(JtJ)
    A = JtJ + damping * jnp.diag(jnp.maximum(diag, 1e-8))
    return jnp.linalg.solve(A, -Jtr)


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
    Ceres' inner loop with frozen data association."""

    def body(_, pose):
        sets = build_factors(pose)
        JtJ, Jtr, _ = normal_equations(sets, huber_delta)
        delta = solve_step(JtJ, Jtr, damping)
        return apply_delta(pose, delta)

    return jax.lax.fori_loop(0, iterations, body, pose0)
