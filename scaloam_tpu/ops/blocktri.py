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
levels, each a BATCHED set of 6x6 eliminations over the remaining blocks.
r5 layout rewrite: everything runs in SoA — each 6x6 block operand is a
6x6 python list of [m]-vectors (m rides the LANES) and every block op is
explicit mul-adds on those vectors, exact f32 on the VPU. The previous
[m, 6, 6] layout put m on sublanes and 6 on lanes (6/128 used) and lowered
the per-level solves as either unrolled scalar chains broadcast over the
RHS or tiny-batched matmuls — one 384-RHS chain solve measured 2337 ms at
N=4096 (tools/micro_wb.py) vs the SoA form's pure lane-parallel madds.
Diagonal blocks are INVERTED at factor time (narrow work, reused by every
solve — the chain is refactored once per optimize, applied ~20x).

System: H x = b with H[i,i] = D[i] (6x6 SPD), H[i,i+1] = B[i],
H[i+1,i] = B[i]^T. N is padded to a power of two with identity diagonal /
zero coupling (decoupled dummy equations). As of r5 every caller uses this
as a PRECONDITIONER (models/posegraph.py, parallel/pgo.py), so the
invert-then-multiply double rounding and the per-level `reg` floor are
bias the outer CG corrects, never the returned answer.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp


# -- 6x6-block helpers on SoA lists (each entry an [m] or [m, R] vector) ----


def _t66(A: jax.Array):
    """[m, 6, 6] -> 6x6 nested list of [m] vectors."""
    return [[A[:, i, j] for j in range(6)] for i in range(6)]


def _mm66(a, b):
    """c[i][j] = sum_k a[i][k] b[k][j] — 216 lane-parallel mul-adds."""
    return [
        [sum(a[i][k] * b[k][j] for k in range(6)) for j in range(6)]
        for i in range(6)
    ]


def _mT(a):
    return [[a[j][i] for j in range(6)] for i in range(6)]


def _msub(a, b):
    return [[a[i][j] - b[i][j] for j in range(6)] for i in range(6)]


def _mv66(a, x):
    """y[i] = sum_j a[i][j] * x[j]; x entries [m] or [m, R] (a entries [m]
    broadcast over R via a trailing-axis expand)."""
    if x[0].ndim == 2:
        return [
            sum(a[i][j][:, None] * x[j] for j in range(6)) for i in range(6)
        ]
    return [sum(a[i][j] * x[j] for j in range(6)) for i in range(6)]


def _chol66(A):
    """Batched 6x6 Cholesky on SoA lists (entries [m])."""
    L = [[None] * 6 for _ in range(6)]
    for j in range(6):
        s = A[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(jnp.maximum(s, 1e-20))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, 6):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    return L

def _chol_solve_cols(L, cols):
    """Solve L L^T X = B for each column list in `cols` (entries [m] or
    python scalars for unit RHS)."""
    out = []
    for b in cols:
        y = [None] * 6
        for i in range(6):
            s = b[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        x = [None] * 6
        for i in reversed(range(6)):
            s = y[i]
            for k in range(i + 1, 6):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        out.append(x)
    return out


def _inv66(A):
    """Inverse of batched SPD 6x6 SoA blocks (Cholesky vs unit columns)."""
    L = _chol66(A)
    zero = jnp.zeros_like(A[0][0])
    one = jnp.ones_like(A[0][0])
    cols = [[one if i == j else zero for i in range(6)] for j in range(6)]
    X = _chol_solve_cols(L, cols)  # X[j] = column j
    return [[X[j][i] for j in range(6)] for i in range(6)]


def _even(v):
    return [[x[0::2] for x in row] for row in v]


def _odd(v):
    return [[x[1::2] for x in row] for row in v]


def factor(
    D: jax.Array, B: jax.Array, reg: float = 1e-5
) -> List[Tuple[list, ...]]:
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
        where a NaN is fatal.

    Returns per-level tuples (Do_inv, L, R) — each a 6x6 SoA list — plus
    the root inverse, consumed by `solve`. Shapes are static: N is padded
    to the next power of two internally."""
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

    Dt, Bt = _t66(D), _t66(B)
    levels = []
    m = size
    while m > 1:
        Do, De = _odd(Dt), _even(Dt)
        L, R = _even(Bt), _odd(Bt)  # L[k] = B[2k], R[k] = B[2k+1]
        Do_inv = _inv66(Do)
        # Even diagonal updates:
        #   D'[k]   -= L[k] Do[k]^-1 L[k]^T      (from the right neighbor)
        #   D'[k+1] -= R[k]^T Do[k]^-1 R[k]      (from the left neighbor)
        upd_right = _mm66(L, _mm66(Do_inv, _mT(L)))
        upd_left = _mm66(_mT(R), _mm66(Do_inv, R))
        D_new = _msub(De, upd_right)
        for i in range(6):
            for j in range(6):
                D_new[i][j] = D_new[i][j].at[1:].add(-upd_left[i][j][:-1])
        if reg:
            tr = sum(D_new[i][i] for i in range(6)) * (reg / 6.0)
            for i in range(6):
                D_new[i][i] = D_new[i][i] + tr
        # New coupling between consecutive even blocks k and k+1 (through
        # the eliminated odd block between them): B'[k] = -L[k] Do^-1 R[k].
        B_new = _mm66(L, _mm66(Do_inv, R))
        B_new = [[-v for v in row] for row in B_new]
        for i in range(6):
            for j in range(6):
                B_new[i][j] = B_new[i][j].at[-1].set(0.0)
        levels.append((Do_inv, L, R))
        Dt, Bt = D_new, B_new
        m //= 2
    levels.append((_inv66(Dt),))
    return levels


def solve(levels: List[Tuple[list, ...]], b: jax.Array) -> jax.Array:
    """Solve H x = b given `factor`'s output.

    b: [N, 6] -> x: [N, 6], or multi-RHS [N, 6, R] -> [N, 6, R] (the
    Woodbury loop-closure solver applies the chain inverse to all 6L
    low-rank columns at once; in SoA form the wide solve is the same
    lane-parallel madd chain with an extra trailing axis)."""
    n = b.shape[0]
    tail = b.shape[2:]
    total = levels[0][0][0][0].shape[0] * 2 if len(levels) > 1 else 1
    if total != n:
        b = jnp.concatenate([b, jnp.zeros((total - n, 6) + tail, b.dtype)])
    bl = [b[:, i] for i in range(6)]

    # Forward reduction of the RHS.
    rhs_stack = []
    for lev in levels[:-1]:
        Do_inv, L, R = lev
        bo = [v[1::2] for v in bl]
        be = [v[0::2] for v in bl]
        Dinv_bo = _mv66(Do_inv, bo)
        t1 = _mv66(L, Dinv_bo)
        t2 = _mv66(_mT(R), Dinv_bo)
        b_new = [be[i] - t1[i] for i in range(6)]
        b_new = [v.at[1:].add(-t2[i][:-1]) for i, v in enumerate(b_new)]
        rhs_stack.append(bo)
        bl = b_new

    # Solve the root system.
    (root_inv,) = levels[-1]
    x = _mv66(root_inv, bl)

    # Back substitution.
    for lev, bo in zip(reversed(levels[:-1]), reversed(rhs_stack)):
        Do_inv, L, R = lev
        # odd x: x_o[k] = Do^-1 (bo[k] - L[k]^T x_e[k] - R[k] x_e[k+1])
        t1 = _mv66(_mT(L), x)
        rhs = [bo[i] - t1[i] for i in range(6)]
        if x[0].ndim == 2:
            t2 = [
                sum(R[i][j][:-1, None] * x[j][1:] for j in range(6))
                for i in range(6)
            ]
        else:
            t2 = [
                sum(R[i][j][:-1] * x[j][1:] for j in range(6))
                for i in range(6)
            ]
        rhs = [v.at[:-1].add(-t2[i]) for i, v in enumerate(rhs)]
        xo = _mv66(Do_inv, rhs)
        m2 = x[0].shape[0]
        out = []
        for i in range(6):
            o = jnp.zeros((2 * m2,) + tail, x[i].dtype)
            out.append(o.at[0::2].set(x[i]).at[1::2].set(xo[i]))
        x = out
    return jnp.stack(x, axis=1)[:n]


@functools.partial(jax.jit)
def solve_tridiag(D: jax.Array, B: jax.Array, b: jax.Array) -> jax.Array:
    """One-shot convenience: factor + solve."""
    return solve(factor(D, B), b)
