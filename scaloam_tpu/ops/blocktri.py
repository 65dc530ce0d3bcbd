"""Block-tridiagonal SPD solver by cyclic reduction — the pose-chain
preconditioner.

A pose graph's odometry chain makes the Gauss-Newton Hessian block
tridiagonal plus a few loop-closure off-band blocks. Block-Jacobi
preconditioned CG cannot solve that system in practice: the loop-correction
("bend the whole chain") modes have preconditioned eigenvalues ~1e-12
relative to the stiff odometry blocks (variance 1e-6 rot / 1e-4 trans,
src/laserPosegraphOptimization.cpp:284-310), so f32 CG never converges on
them and loop closures silently do nothing on long chains. Solving the
CHAIN part exactly as the preconditioner turns the preconditioned system
into identity + a rank-O(loops) correction, and CG converges in ~#loops
iterations regardless of the stiffness ratio.

TPU design: cyclic reduction, not the sequential Thomas algorithm — log2(N)
levels, each a BATCHED set of 6x6 Cholesky solves and matmuls over the
remaining blocks (vmapped `gn.cholesky_solve6`; no LAPACK lowering, see
ops/gn.py). A 4096-node chain factors in 12 batched levels. The reference's
equivalent is gtsam's sequential sparse elimination inside iSAM2.

System: H x = b with H[i,i] = D[i] (6x6 SPD), H[i,i+1] = B[i],
H[i+1,i] = B[i]^T. N is padded to a power of two with identity diagonal /
zero coupling (decoupled dummy equations).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp

from scaloam_tpu.ops import gn

_HI = jax.lax.Precision.HIGHEST

# Solve A X = B for a batch of 6x6 SPD A against 6-column RHS.
_solve66 = jax.vmap(  # over batch
    jax.vmap(gn.cholesky_solve6, in_axes=(None, 1), out_axes=1)
)
_solve6 = jax.vmap(gn.cholesky_solve6)  # batch, single RHS


def _mm(a, b):
    return jnp.einsum("nij,njk->nik", a, b, precision=_HI)


def _mv(a, v):
    return jnp.einsum("nij,nj->ni", a, v, precision=_HI)


def _mvm(a, v):
    """Multi-RHS block matvec: a [n,6,6] @ v [n,6,R] -> [n,6,R]."""
    return jnp.einsum("nij,njr->nir", a, v, precision=_HI)


def factor(
    D: jax.Array, B: jax.Array, reg: float = 1e-5
) -> List[Tuple[jax.Array, ...]]:
    """Cyclic-reduction factorization.

    Args:
      D: [N, 6, 6] diagonal blocks (SPD).
      B: [N, 6, 6] super-diagonal blocks; B[i] couples (i, i+1). B[N-1]
         is ignored (must be zero).
      reg: per-level relative Tikhonov floor. The Schur updates cancel
        catastrophically in f32 on long stiff chains (the bend-mode
        eigenvalue shrinks ~N^2 below the block scale; one negative pivot
        NaNs the whole solve — observed at ~4096 nodes with the 1e-6
        odometry variances). Adding reg*mean(diag)*I after each level
        caps the factorization's conditioning at ~1/reg; as a CG
        PRECONDITIONER the bias is harmless (a few extra iterations)
        where a NaN is fatal. Set 0.0 for an exact direct solve on
        well-conditioned systems.

    Returns a list of per-level tuples consumed by `solve`. Shapes are
    static: N is padded to the next power of two internally.
    """
    n = D.shape[0]
    size = 1
    while size < n:
        size *= 2
    if size != n:
        pad = size - n
        eye = jnp.broadcast_to(jnp.eye(6, dtype=D.dtype), (pad, 6, 6))
        D = jnp.concatenate([D, eye])
        B = jnp.concatenate([B, jnp.zeros((pad, 6, 6), B.dtype)])
    # Decouple the last (possibly padded) block from the padding region.
    B = B.at[n - 1 :].set(0.0) if n < size else B.at[size - 1].set(0.0)

    levels = []
    while D.shape[0] > 1:
        m = D.shape[0]
        Do, Bo = D[1::2], B[1::2]  # odd blocks (eliminated this level)
        De, Be = D[0::2], B[0::2]  # even blocks (survive)
        # For each odd index i = 2k+1: left neighbor 2k, right neighbor
        # 2k+2. Couplings: L[k] = B[2k] (even->odd), R[k] = B[2k+1]
        # (odd->even-right).
        L = Be  # [m/2, 6, 6]
        R = Bo
        Dinv_L_T = _solve66(Do, jnp.swapaxes(L, 1, 2))  # Do^-1 L^T
        Dinv_R = _solve66(Do, R)  # Do^-1 R
        # Even diagonal updates:
        #   D'[k]   -= L[k] Do[k]^-1 L[k]^T      (from the right neighbor)
        #   D'[k+1] -= R[k]^T Do[k]^-1 R[k]      (from the left neighbor)
        upd_right = _mm(L, Dinv_L_T)  # contributes to even k
        upd_left = _mm(jnp.swapaxes(R, 1, 2), Dinv_R)  # to even k+1
        D_new = De - upd_right
        D_new = D_new.at[1:].add(-upd_left[:-1])
        if reg:
            tr = jnp.einsum("nii->n", D_new) * (reg / 6.0)
            D_new = D_new + tr[:, None, None] * jnp.eye(6, dtype=D.dtype)
        # New coupling between consecutive even blocks k and k+1 (through
        # the eliminated odd block between them): B'[k] = -L[k] Do^-1 R[k].
        B_new = -_mm(L, Dinv_R)
        B_new = B_new.at[-1].set(0.0)  # last even block has no right nbr
        levels.append((Do, L, R))
        D, B = D_new, B_new
    levels.append((D,))  # final 1-block system
    return levels


def solve(levels: List[Tuple[jax.Array, ...]], b: jax.Array) -> jax.Array:
    """Solve H x = b given `factor`'s output.

    b: [N, 6] -> x: [N, 6], or multi-RHS [N, 6, R] -> [N, 6, R] (the
    Woodbury loop-closure solver applies the chain inverse to all 6L
    low-rank columns at once — the per-level batched solves/matmuls just
    get an extra trailing R axis, turning them into MXU-wide work)."""
    n = b.shape[0]
    mv = _mv if b.ndim == 2 else _mvm
    tail = b.shape[2:]
    # Padded size = 2 * (first level's odd-block count), or 1 if no levels.
    total = levels[0][0].shape[0] * 2 if len(levels) > 1 else 1
    if total != n:
        b = jnp.concatenate(
            [b, jnp.zeros((total - n, 6) + tail, b.dtype)]
        )

    # Forward reduction of the RHS.
    rhs_stack = []
    for lev in levels[:-1]:
        Do, L, R = lev
        bo, be = b[1::2], b[0::2]
        Dinv_bo = _solve6(Do, bo)
        b_new = be - mv(L, Dinv_bo)
        b_new = b_new.at[1:].add(-mv(jnp.swapaxes(R, 1, 2), Dinv_bo)[:-1])
        rhs_stack.append(bo)
        b = b_new

    # Solve the root system.
    (D_root,) = levels[-1]
    x = _solve6(D_root, b)

    # Back substitution.
    for lev, bo in zip(reversed(levels[:-1]), reversed(rhs_stack)):
        Do, L, R = lev
        m2 = x.shape[0]
        # odd x: x_o[k] = Do^-1 (bo[k] - L[k]^T x_e[k] - R[k] x_e[k+1])
        rhs = bo - mv(jnp.swapaxes(L, 1, 2), x)
        rhs = rhs.at[:-1].add(-mv(R[:-1], x[1:]))
        xo = _solve6(Do, rhs)
        out = jnp.zeros((2 * m2, 6) + tail, x.dtype)
        out = out.at[0::2].set(x).at[1::2].set(xo)
        x = out
    return x[:n]


@functools.partial(jax.jit)
def solve_tridiag(D: jax.Array, B: jax.Array, b: jax.Array) -> jax.Array:
    """One-shot convenience: factor + solve."""
    return solve(factor(D, B), b)
