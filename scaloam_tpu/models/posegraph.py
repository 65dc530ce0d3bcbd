"""Pose-graph backend: batch Gauss-Newton replacing GTSAM iSAM2.

Reference: src/laserPosegraphOptimization.cpp.
  Graph content (:646-690): prior on node 0 (sigma^2=1e-12, effectively a
  gauge freeze), odometry BetweenFactors (variances rot 1e-6 / trans 1e-4),
  SC-loop BetweenFactors with robust Cauchy(k=1) noise (sigma^2=0.5), and
  altitude-only GPS factors (variances xy 1e9 / z 250, Cauchy) (:284-310).
  iSAM2 runs at 1 Hz with relinearizeThreshold 0.01 (:791-808,881-884);
  updatePoses then rewrites every keyframe pose (:408-431).

TPU design (SURVEY.md §7): instead of incremental Bayes-tree updates, the
WHOLE graph is re-solved each tick by damped Gauss-Newton — the 1 Hz budget
is enormous on TPU and batch GN from the warm start converges in a few
iterations. The normal equations are never materialized: the CG matvec
evaluates H v = sum_f A_f^T W_f A_f v factor-wise with segment-sum
scatter (two 6x6 blocks per factor), preconditioned by the inverted
block diagonal. Node 0 is frozen (the reference's 1e-12-variance prior,
f32-safely). This factor-sharded matvec is also the unit of distribution
for multi-host PGO (parallel/pgo.py): shard factors, psum the scatter.

All per-factor Jacobians are exact: jax.jacrev of the tangent residual,
vmapped over factors.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from scaloam_tpu.config import PGOConfig
from scaloam_tpu.ops import blocktri, se3
from scaloam_tpu.types import Pose

# All Hessian/gradient einsums run at HIGHEST precision: at DEFAULT the
# TPU MXU rounds operands to bf16, and the resulting ~0.4% block errors
# can make the (mathematically SPD) diagonal blocks indefinite — the
# chain preconditioner's Cholesky then clamps a negative pivot and the
# solve explodes to ~1e13, NaN-ing the whole optimize. Latent since r3
# (masked by a stale compiled-executable cache); reproduced + isolated on
# the real chip r4 (CPU f32 vs fresh TPU compile on the same graph).
_HI = jax.lax.Precision.HIGHEST


class PoseGraph(NamedTuple):
    # Nodes.
    poses: Pose  # [N] current estimates
    odom_poses: Pose  # [N] raw odometry poses (for odom_poses artifact)
    n_nodes: jax.Array  # int32
    # Odometry chain factors: factor k connects (k, k+1), k < n_nodes-1.
    odom_rel: Pose  # [N]
    # Loop factors.
    loop_i: jax.Array  # [L] int32 (curr)
    loop_j: jax.Array  # [L] int32 (loop target)
    loop_rel: Pose  # [L] Z with X_i^-1 X_j ~= Z
    n_loops: jax.Array  # int32
    # GPS altitude factors.
    gps_z: jax.Array  # [N]
    gps_valid: jax.Array  # [N] bool
    # Multi-sequence support: node k starting a NEW sequence (multi-robot /
    # multi-session SLAM — N front-ends feeding one shared backend) breaks
    # the odometry chain: factor (k-1 -> k) is invalid and the
    # preconditioner's chain coupling is zero there. Sequences are tied
    # together only by inter-sequence loop factors (the reference's
    # multi-session localization, Scancontext.cpp:272-333, has no joint
    # graph at all — this is strictly more).
    chain_break: jax.Array  # [N] bool


def init_graph(cfg: PGOConfig, initial_nodes: int = 256,
               initial_loops: int = 64) -> PoseGraph:
    """Capacity = cost on TPU (every solve pays the PADDED node/loop count:
    CG matvecs, the block-tridiagonal preconditioner factorization), so the
    graph starts at a small tier and ensure_node_slot/ensure_loop_slot
    double it on demand — one re-jit per tier instead of paying the
    4096-node ceiling from keyframe #1 (266 ms/optimize measured at cap
    4096 vs a ~60-node live graph, tools/bench_system.py)."""
    N = min(cfg.max_keyframes, initial_nodes)
    L = min(cfg.max_loops, initial_loops)
    return PoseGraph(
        poses=Pose.identity((N,)),
        odom_poses=Pose.identity((N,)),
        n_nodes=jnp.array(0, jnp.int32),
        odom_rel=Pose.identity((N,)),
        loop_i=jnp.zeros((L,), jnp.int32),
        loop_j=jnp.zeros((L,), jnp.int32),
        loop_rel=Pose.identity((L,)),
        n_loops=jnp.array(0, jnp.int32),
        gps_z=jnp.zeros((N,), jnp.float32),
        gps_valid=jnp.zeros((N,), bool),
        chain_break=jnp.zeros((N,), bool),
    )


def node_capacity(graph: PoseGraph) -> int:
    return graph.gps_z.shape[0]


def loop_capacity(graph: PoseGraph) -> int:
    return graph.loop_i.shape[0]


def grow(
    graph: PoseGraph,
    node_capacity_new: int | None = None,
    loop_capacity_new: int | None = None,
) -> PoseGraph:
    """Return a graph with enlarged static capacities (contents preserved).

    The reference's gtsam vectors grow unboundedly
    (src/laserPosegraphOptimization.cpp:89-93); static TPU shapes instead
    grow in tiers — the host wrappers double capacity when n_nodes/n_loops
    reach it, paying one re-jit per tier instead of silently clobbering the
    last slot (VERDICT r1 weak #1). Shapes stay static within a tier."""
    N, L = node_capacity(graph), loop_capacity(graph)
    nN = N if node_capacity_new is None else node_capacity_new
    nL = L if loop_capacity_new is None else loop_capacity_new
    if nN < N or nL < L:
        raise ValueError(f"grow cannot shrink: ({N},{L}) -> ({nN},{nL})")
    if nN == N and nL == L:
        return graph

    def pad_pose(p: Pose, extra: int) -> Pose:
        if extra == 0:
            return p
        ident = Pose.identity((extra,))
        return Pose(
            jnp.concatenate([p.quat, ident.quat]),
            jnp.concatenate([p.trans, ident.trans]),
        )

    def pad(a: jax.Array, extra: int) -> jax.Array:
        if extra == 0:
            return a
        return jnp.concatenate([a, jnp.zeros((extra,) + a.shape[1:], a.dtype)])

    dN, dL = nN - N, nL - L
    return graph._replace(
        poses=pad_pose(graph.poses, dN),
        odom_poses=pad_pose(graph.odom_poses, dN),
        odom_rel=pad_pose(graph.odom_rel, dN),
        gps_z=pad(graph.gps_z, dN),
        gps_valid=pad(graph.gps_valid, dN),
        chain_break=pad(graph.chain_break, dN),
        loop_i=pad(graph.loop_i, dL),
        loop_j=pad(graph.loop_j, dL),
        loop_rel=pad_pose(graph.loop_rel, dL),
    )


def ensure_node_slot(graph: PoseGraph, n_nodes_host: int) -> PoseGraph:
    """Grow (2x) if appending node #n_nodes_host would exceed capacity.
    n_nodes_host is the HOST-tracked node count (no D2H fetch)."""
    cap = node_capacity(graph)
    if n_nodes_host >= cap:
        return grow(graph, node_capacity_new=max(2 * cap, n_nodes_host + 1))
    return graph


def ensure_loop_slot(graph: PoseGraph, n_loops_host: int) -> PoseGraph:
    cap = loop_capacity(graph)
    if n_loops_host >= cap:
        return grow(graph, loop_capacity_new=max(2 * cap, n_loops_host + 1))
    return graph


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("new_sequence",))
def add_keyframe_jit(
    graph: PoseGraph, odom_pose: Pose, gps_z: jax.Array, gps_valid: jax.Array,
    new_sequence: bool = False,
) -> PoseGraph:
    """Append a node; the between factor to the previous node comes from the
    odometry increment (:663-690). New estimate = prev_estimate o rel (warm
    start, like gtsam initialEstimate insertion).

    RAW jit path: clamps at capacity — callers MUST reserve a slot first
    (ensure_node_slot with a host-tracked count). Use `add_keyframe` (the
    host wrapper below) unless you manage capacity yourself; VERDICT r2
    weak #2 was exactly a direct caller silently clobbering slot cap-1.

    graph is DONATED (in-place .at[].set updates instead of whole-table
    copies per keyframe); callers rebind, which all do."""
    i = jnp.minimum(graph.n_nodes, graph.gps_z.shape[0] - 1)
    # A sequence-starting node anchors at its own odom pose (there is no
    # valid increment from another sequence's last node).
    first = (graph.n_nodes == 0) | new_sequence
    prev = jnp.maximum(i - 1, 0)
    prev_odom = jax.tree.map(lambda a: a[prev], graph.odom_poses)
    rel = se3.relative(prev_odom, odom_pose)
    prev_est = jax.tree.map(lambda a: a[prev], graph.poses)
    est = jax.tree.map(
        lambda a, b: jnp.where(first, a, b),
        odom_pose, se3.compose(prev_est, rel),
    )

    def set_at(arr, idx, val):
        return arr.at[idx].set(val)

    graph = graph._replace(
        chain_break=graph.chain_break.at[i].set(bool(new_sequence))
    )
    return graph._replace(
        poses=Pose(
            set_at(graph.poses.quat, i, est.quat),
            set_at(graph.poses.trans, i, est.trans),
        ),
        odom_poses=Pose(
            set_at(graph.odom_poses.quat, i, odom_pose.quat),
            set_at(graph.odom_poses.trans, i, odom_pose.trans),
        ),
        odom_rel=Pose(  # factor (i-1 -> i) stored at slot i-1
            set_at(graph.odom_rel.quat, prev, rel.quat),
            set_at(graph.odom_rel.trans, prev, rel.trans),
        ),
        gps_z=set_at(graph.gps_z, i, gps_z),
        gps_valid=set_at(graph.gps_valid, i, gps_valid),
        n_nodes=graph.n_nodes + 1,
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def add_loop_jit(graph: PoseGraph, i: jax.Array, j: jax.Array, rel: Pose) -> PoseGraph:
    """RAW jit path: clamps at capacity — reserve with ensure_loop_slot
    first, or use the `add_loop` host wrapper."""
    k = jnp.minimum(graph.n_loops, graph.loop_i.shape[0] - 1)
    return graph._replace(
        loop_i=graph.loop_i.at[k].set(i),
        loop_j=graph.loop_j.at[k].set(j),
        loop_rel=Pose(
            graph.loop_rel.quat.at[k].set(rel.quat),
            graph.loop_rel.trans.at[k].set(rel.trans),
        ),
        n_loops=graph.n_loops + 1,
    )


def add_keyframe(
    graph: PoseGraph,
    odom_pose: Pose,
    gps_z: jax.Array,
    gps_valid: jax.Array,
    *,
    n_nodes: int | None = None,
    new_sequence: bool = False,
) -> PoseGraph:
    """Host wrapper: grows the graph tier on demand, then appends.

    Matches the reference's unbounded keyframe vectors
    (laserPosegraphOptimization.cpp:89-93) without the raw jit's silent
    clamp. Pass `n_nodes` (the HOST-tracked node count) on hot paths to
    skip the D2H fetch of graph.n_nodes (~23 ms RTT on the tunneled TPU);
    tests/tools can omit it. `new_sequence=True` starts a new odometry
    chain (multi-robot/multi-session: see PoseGraph.chain_break)."""
    n = int(graph.n_nodes) if n_nodes is None else n_nodes
    graph = ensure_node_slot(graph, n)
    return add_keyframe_jit(graph, odom_pose, gps_z, gps_valid,
                            new_sequence=new_sequence)


def add_loop(
    graph: PoseGraph,
    i: jax.Array,
    j: jax.Array,
    rel: Pose,
    *,
    n_loops: int | None = None,
) -> PoseGraph:
    """Host wrapper: grows loop capacity on demand, then appends."""
    n = int(graph.n_loops) if n_loops is None else n_loops
    graph = ensure_loop_slot(graph, n)
    return add_loop_jit(graph, i, j, rel)


# ---------------------------------------------------------------------------
# Residuals + Jacobians
# ---------------------------------------------------------------------------


def _between_residual(xi: Pose, xj: Pose, z: Pose) -> jax.Array:
    """r = Log(Z^-1 (X_i^-1 X_j)) in (omega, v) ordering (gtsam Logmap)."""
    return se3.log_se3(se3.compose(se3.inverse(z), se3.relative(xi, xj)))


def _between_res_jac(xi: Pose, xj: Pose, z: Pose):
    """Residual + exact Jacobians wrt right perturbations of X_i and X_j."""

    def f(di, dj):
        return _between_residual(
            se3.compose(xi, se3.exp_se3(di)),
            se3.compose(xj, se3.exp_se3(dj)),
            z,
        )

    r = f(jnp.zeros(6), jnp.zeros(6))
    Ji, Jj = jax.jacrev(f, argnums=(0, 1))(jnp.zeros(6), jnp.zeros(6))
    return r, Ji, Jj


_between_batch = jax.vmap(_between_res_jac, in_axes=(0, 0, 0))


def _gps_res_jac(x: Pose, z: jax.Array):
    """Altitude residual r = t_z - z with Jacobian wrt right perturbation."""

    def f(d):
        return se3.compose(x, se3.exp_se3(d)).trans[2:3] - z[None]

    r = f(jnp.zeros(6))
    J = jax.jacrev(f)(jnp.zeros(6))
    return r, J


_gps_batch = jax.vmap(_gps_res_jac, in_axes=(0, 0))


def cauchy_weight(sq_whitened: jax.Array, k: float) -> jax.Array:
    """gtsam mEstimator::Cauchy(k): w = k^2 / (k^2 + ||whitened r||^2)."""
    k2 = k * k
    return k2 / (k2 + sq_whitened)


# ---------------------------------------------------------------------------
# The solver
# ---------------------------------------------------------------------------


class _FactorData(NamedTuple):
    i: jax.Array  # [F]
    j: jax.Array  # [F]
    r: jax.Array  # [F, 6]
    Ji: jax.Array  # [F, 6, 6]
    Jj: jax.Array  # [F, 6, 6]
    W: jax.Array  # [F, 6] effective diagonal information (robust-reweighted)
    valid: jax.Array  # [F]


def _linearize(graph: PoseGraph, cfg: PGOConfig):
    N = graph.gps_z.shape[0]
    n = graph.n_nodes
    nodes = graph.poses

    def take(p: Pose, idx):
        return Pose(p.quat[idx], p.trans[idx])

    # Odometry chain. Factor k connects (k, k+1); it is invalid past the
    # node count and across sequence boundaries (chain_break[k+1]).
    ks = jnp.arange(N)
    odom_valid = (ks < n - 1) & ~graph.chain_break[jnp.minimum(ks + 1, N - 1)]
    xi = take(nodes, ks)
    xj = take(nodes, jnp.minimum(ks + 1, N - 1))
    r_o, Ji_o, Jj_o = _between_batch(xi, xj, graph.odom_rel)
    w_odom = jnp.concatenate(
        [
            jnp.full((3,), 1.0 / cfg.odom_rot_variance, jnp.float32),
            jnp.full((3,), 1.0 / cfg.odom_trans_variance, jnp.float32),
        ]
    )
    odom = _FactorData(
        i=ks, j=jnp.minimum(ks + 1, N - 1), r=r_o, Ji=Ji_o, Jj=Jj_o,
        W=jnp.broadcast_to(w_odom, (N, 6)), valid=odom_valid,
    )

    # Loops (robust Cauchy).
    L = graph.loop_i.shape[0]
    loop_valid = jnp.arange(L) < graph.n_loops
    xi_l = take(nodes, graph.loop_i)
    xj_l = take(nodes, graph.loop_j)
    r_l, Ji_l, Jj_l = _between_batch(xi_l, xj_l, graph.loop_rel)
    w_loop_base = 1.0 / cfg.loop_variance
    sq_white = jnp.sum(r_l * r_l, axis=-1) * w_loop_base
    w_rob = cauchy_weight(sq_white, cfg.cauchy_k)
    loops = _FactorData(
        i=graph.loop_i, j=graph.loop_j, r=r_l, Ji=Ji_l, Jj=Jj_l,
        W=w_loop_base * w_rob[:, None] * jnp.ones((L, 6)),
        valid=loop_valid,
    )

    # GPS altitude (1-dim, robust Cauchy) — stored padded to 6 dims.
    r_g, J_g = _gps_batch(take(nodes, ks), graph.gps_z)
    w_g_base = 1.0 / cfg.gps_z_variance
    sq_g = (r_g[:, 0] ** 2) * w_g_base
    w_g = w_g_base * cauchy_weight(sq_g, cfg.cauchy_k)
    r_g6 = jnp.concatenate([r_g, jnp.zeros((N, 5))], axis=-1)
    J_g6 = jnp.concatenate([J_g, jnp.zeros((N, 5, 6))], axis=-2)
    gps = _FactorData(
        i=ks, j=ks, r=r_g6, Ji=J_g6, Jj=jnp.zeros_like(J_g6),
        W=jnp.concatenate([w_g[:, None], jnp.zeros((N, 5))], axis=-1),
        valid=graph.gps_valid & (ks < n),
    )
    return [odom, loops, gps]


def _sanitize(f: _FactorData) -> _FactorData:
    vm = f.valid[:, None]
    return f._replace(
        r=jnp.where(vm, f.r, 0.0),
        Ji=jnp.where(vm[..., None], f.Ji, 0.0),
        Jj=jnp.where(vm[..., None], f.Jj, 0.0),
        W=jnp.where(vm, f.W, 0.0),
    )


def _shift_down(x: jax.Array) -> jax.Array:
    """out[k+1] = x[k] (factor k's j-side lands on node k+1). Chain
    scatter without a scatter — duplicate-index scatter-adds serialize
    on TPU, but the odometry chain's indices are structured."""
    return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)


def _shift_up(x: jax.Array) -> jax.Array:
    """out[k] = x[k+1] (gather node k+1's value into factor k's slot)."""
    return jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)


def _gradient_and_diag(factors, N: int):
    """g = sum A^T W r, chain-only block diagonal D_base (odom + gps), and
    the loop factors' block-diagonal contribution D_loop, per node.

    factors = [odom (chain k->k+1, slot k), loops (arbitrary, few), gps
    (diagonal, slot k)] — only the loops need a true scatter. D_base and
    D_loop are returned SEPARATELY: the Woodbury solver's chain operator C
    must exclude the loop blocks (they live in the low-rank V V^T term),
    while the fallback chain-preconditioned CG wants the full diagonal
    D_base + D_loop."""
    odom, loops, gps = factors
    Wr_o = odom.W * odom.r
    g = jnp.einsum("frc,fr->fc", odom.Ji, Wr_o, precision=_HI)
    g = g + _shift_down(jnp.einsum("frc,fr->fc", odom.Jj, Wr_o, precision=_HI))
    D = jnp.einsum("fri,fr,frj->fij", odom.Ji, odom.W, odom.Ji, precision=_HI)
    D = D + _shift_down(jnp.einsum("fri,fr,frj->fij", odom.Jj, odom.W, odom.Jj, precision=_HI))

    Wr_g = gps.W * gps.r
    g = g + jnp.einsum("frc,fr->fc", gps.Ji, Wr_g, precision=_HI)
    D = D + jnp.einsum("fri,fr,frj->fij", gps.Ji, gps.W, gps.Ji, precision=_HI)

    Wr_l = loops.W * loops.r
    g = g.at[loops.i].add(jnp.einsum("frc,fr->fc", loops.Ji, Wr_l, precision=_HI))
    g = g.at[loops.j].add(jnp.einsum("frc,fr->fc", loops.Jj, Wr_l, precision=_HI))
    D_loop = jnp.zeros_like(D)
    D_loop = D_loop.at[loops.i].add(jnp.einsum("fri,fr,frj->fij", loops.Ji, loops.W, loops.Ji, precision=_HI))
    D_loop = D_loop.at[loops.j].add(jnp.einsum("fri,fr,frj->fij", loops.Jj, loops.W, loops.Jj, precision=_HI))
    return g, D, D_loop


def _hess_matvec(factors, v: jax.Array, damping_diag: jax.Array) -> jax.Array:
    """H v without materializing H. Chain/diagonal factors use shift-adds;
    only loop factors scatter (few hundred rows)."""
    odom, loops, gps = factors
    out = damping_diag * v

    Av = jnp.einsum("frc,fc->fr", odom.Ji, v, precision=_HI) + jnp.einsum(
        "frc,fc->fr", odom.Jj, _shift_up(v), precision=_HI
    )
    WAv = odom.W * Av
    out = out + jnp.einsum("frc,fr->fc", odom.Ji, WAv, precision=_HI)
    out = out + _shift_down(jnp.einsum("frc,fr->fc", odom.Jj, WAv, precision=_HI))

    Avg = jnp.einsum("frc,fc->fr", gps.Ji, v, precision=_HI)
    out = out + jnp.einsum("frc,fr->fc", gps.Ji, gps.W * Avg, precision=_HI)

    Avl = jnp.einsum("frc,fc->fr", loops.Ji, v[loops.i], precision=_HI) + jnp.einsum(
        "frc,fc->fr", loops.Jj, v[loops.j], precision=_HI
    )
    WAvl = loops.W * Avl
    out = out.at[loops.i].add(jnp.einsum("frc,fr->fc", loops.Ji, WAvl, precision=_HI))
    out = out.at[loops.j].add(jnp.einsum("frc,fr->fc", loops.Jj, WAvl, precision=_HI))
    return out


def _chain_factor(odom, D_blocks, damp, free_mask):
    """Block-tridiagonal factorization of the chain operator: the given
    diagonal blocks + damping, odometry couplings off-diagonal.
    Frozen/padding nodes decouple to identity."""
    fm = free_mask[:, None]
    eye6 = jnp.eye(6, dtype=D_blocks.dtype)
    D_chain = D_blocks + damp[:, :, None] * eye6[None] + 1e-6 * eye6[None]
    D_chain = jnp.where(fm[:, :, None], D_chain, eye6[None])
    # coupling (k, k+1) from chain factor k: Ji_k^T W_k Jj_k
    B_chain = jnp.einsum(
        "fri,fr,frj->fij", odom.Ji, odom.W, odom.Jj,
        precision=jax.lax.Precision.HIGHEST,
    )
    pair_free = free_mask & jnp.roll(free_mask, -1)
    pair_free = pair_free.at[-1].set(False)
    B_chain = jnp.where(pair_free[:, None, None], B_chain, 0.0)
    return blocktri.factor(D_chain, B_chain)


def _run_pcg(factors, g, damp, free_mask, precond, iters: int):
    """Preconditioned CG for H d = -g on the free nodes; `precond` is the
    (SPD) approximate-inverse application."""
    fm = free_mask[:, None]

    def mv(v):
        v = jnp.where(fm, v, 0.0)
        return jnp.where(fm, _hess_matvec(factors, v, damp), 0.0)

    b = jnp.where(fm, -g, 0.0)
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)

    def body(_, carry):
        x, r, z, p, rz = carry
        Ap = mv(p)
        denom = jnp.maximum(jnp.sum(p * Ap), 1e-20)
        alpha = rz / denom
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-20)
        p = z + beta * p
        return x, r, z, p, rz_new

    x, *_ = jax.lax.fori_loop(0, iters, body, (x, r, z, p, rz))
    return x


def _solve_cg(factors, g, D, D_loop, free_mask, damping: float, iters: int):
    """CG for H d = -g on the free nodes, preconditioned by the EXACT
    chain Hessian (block-tridiagonal cyclic reduction, ops/blocktri.py).

    Block-Jacobi preconditioning cannot close loops on long chains: the
    global bend modes a loop correction excites have preconditioned
    eigenvalues ~1e-12 against the stiff odometry blocks, beyond f32 CG.
    With the chain solved exactly, the preconditioned system is identity
    plus a rank-O(n_loops) correction and CG converges in ~#loops
    iterations (measured: a 398-node KAIST03 chain with 28 m drift went
    from 'loops do nothing at 2048 CG iters' to full recovery at 64)."""
    odom, loops, gps = factors
    D_full = D + D_loop
    diag = jnp.diagonal(D_full, axis1=-2, axis2=-1)  # [N, 6]
    damp = damping * jnp.maximum(diag, 1e-6) + 1e-8
    fm = free_mask[:, None]
    chain = _chain_factor(odom, D_full, damp, free_mask)

    def precond(v):
        return jnp.where(fm, blocktri.solve(chain, jnp.where(fm, v, 0.0)), 0.0)

    return _run_pcg(factors, g, damp, free_mask, precond, iters)


def _woodbury_setup(factors, D, D_loop, free_mask, damping: float):
    """Build the Woodbury preconditioner state from a linearization point:
    the chain factorization, the V blocks, and the materialized S^-1.

    Hoisted OUT of the GN loop (one setup per optimize, not one per GN
    iteration): the preconditioner only steers CG convergence, so using
    the FIRST iteration's linearization for all GN iterations is harmless
    — poses move millimeters between warm-started iterations — while the
    setup (the 6L-wide chain solve + the S Cholesky/inverse) is the
    dominant Woodbury cost on this stack."""
    odom, loops, gps = factors
    N = D.shape[0]
    L = loops.i.shape[0]
    D_full = D + D_loop
    diag = jnp.diagonal(D_full, axis1=-2, axis2=-1)  # [N, 6]
    damp = damping * jnp.maximum(diag, 1e-6) + 1e-8
    # Chain operator EXCLUDES the loop blocks (they live in V V^T).
    chain = _chain_factor(odom, D, damp, free_mask)

    # V blocks [L, 6(node), 6(residual)]; frozen-node rows zeroed (loops
    # touching node 0 must not move it), invalid loops are zero already
    # (_sanitize zeroes W -> sqrt(W) = 0).
    sw = jnp.sqrt(loops.W)  # [L, 6]
    ViT = jnp.swapaxes(loops.Ji, 1, 2) * sw[:, None, :]
    VjT = jnp.swapaxes(loops.Jj, 1, 2) * sw[:, None, :]
    ViT = jnp.where(free_mask[loops.i][:, None, None], ViT, 0.0)
    VjT = jnp.where(free_mask[loops.j][:, None, None], VjT, 0.0)

    # Dense V as a [N, 6, 6L] RHS block: (node, l) scatter indices are
    # unique by construction (each loop owns its own 6-column block).
    lidx = jnp.arange(L)
    Vd = jnp.zeros((N, L, 6, 6), jnp.float32)
    Vd = Vd.at[loops.i, lidx].set(ViT, unique_indices=True)
    Vd = Vd.at[loops.j, lidx].set(VjT, unique_indices=True)
    V6 = Vd.transpose(0, 2, 1, 3).reshape(N, 6, 6 * L)
    Z = blocktri.solve(chain, V6)  # C^{-1} V, [N, 6, 6L]

    # S = I + V^T Z, assembled through V's sparsity (only rows i/j of Z
    # contribute) — [L,6,6L] gathers + batched small matmuls, not a dense
    # [6N, 6L] contraction.
    S_lr = (
        jnp.einsum("lnc,lnK->lcK", ViT, Z[loops.i], precision=_HI)
        + jnp.einsum("lnc,lnK->lcK", VjT, Z[loops.j], precision=_HI)
    ).reshape(6 * L, 6 * L)
    S = 0.5 * (S_lr + S_lr.T) + jnp.eye(6 * L, dtype=jnp.float32)
    # Jacobi-scale to unit diagonal before the Cholesky: S's loop-stiffness
    # vs chain-softness ratio can reach ~1e4-1e5, and the TPU Cholesky
    # expansion's internal matmuls round operands to bf16 at DEFAULT
    # precision — the same failure class as the r4 PGO NaN. Scaling plus
    # HIGHEST keeps the factorization clean; the identity floor guarantees
    # diag(S) >= 1.
    sd = jnp.sqrt(jnp.diagonal(S))
    S_scaled = S / (sd[:, None] * sd[None, :])
    # Materialize S^-1 by NEWTON-SCHULZ iteration — pure MXU matmuls.
    # jnp.linalg.cholesky + triangular solves lower to loop-expanded
    # blocked custom sequences on TPU (sequential column sweeps — the
    # same class of cost as the cho_solve-per-iteration pitfall), while
    # X <- X (2I - S X) is two [6L,6L] dense matmuls per step. With the
    # Jacobi-scaled S (unit diagonal, identity floor) and the classic
    # safe init X0 = S^T/(||S||_1 ||S||_inf), convergence is monotone and
    # quadratic; 24 steps covers kappa up to ~1e6 to preconditioner-grade
    # accuracy (M only steers CG — the outer iteration corrects any
    # residual bias). This also removes the Cholesky negative-pivot NaN
    # surface from the S path entirely.
    n1 = jnp.max(jnp.sum(jnp.abs(S_scaled), axis=0))
    X = S_scaled.T / jnp.maximum(n1 * n1, 1e-12)  # ||.||_1 = ||.||_inf (sym)
    eye2 = 2.0 * jnp.eye(6 * L, dtype=jnp.float32)
    for _ in range(24):
        SX = jnp.matmul(S_scaled, X, precision=_HI)
        X = jnp.matmul(X, eye2 - SX, precision=_HI)
    Sinv = 0.5 * (X + X.T) / (sd[:, None] * sd[None, :])  # unscale, re-sym
    return chain, ViT, VjT, Sinv, Z


def _wb_precond(wb, loops, free_mask):
    """Preconditioner application from _woodbury_setup state:

        M^{-1} v = C^{-1} v - Z S^{-1} (V^T C^{-1} v)

    ONE chain solve per application: the correction term's chain inverse
    is already materialized in Z = C^{-1} V (Z w == C^{-1} V w), so the
    second chain solve of the textbook form is a dense [N,6,6L] matvec
    instead (HBM-cheap, and the chain solve is the expensive op on this
    stack — tools/micro_wb.py)."""
    chain, ViT, VjT, Sinv, Z = wb
    L = ViT.shape[0]
    fm = free_mask[:, None]

    def precond(v):
        y = blocktri.solve(chain, jnp.where(fm, v, 0.0))
        t = (
            jnp.einsum("lnc,ln->lc", ViT, y[loops.i])
            + jnp.einsum("lnc,ln->lc", VjT, y[loops.j])
        ).reshape(6 * L)
        w = jnp.einsum("rq,q->r", Sinv, t, precision=_HI)
        y2 = jnp.einsum("ncr,r->nc", Z, w, precision=_HI)
        return jnp.where(fm, y - y2, 0.0)

    return precond


def _solve_woodbury(factors, g, D, D_loop, free_mask, damping: float,
                    iters: int, wb=None):
    """CG preconditioned by the WOODBURY inverse of the full Hessian.

    The damped Hessian splits exactly as H = C + V V^T: C is the
    block-tridiagonal chain operator (odometry couplings + odom/gps/damping
    diagonal blocks) and each loop factor l contributes the rank-6 term
    V_l V_l^T with V_l carrying Ji_l^T W_l^{1/2} at node rows i(l) and
    Jj_l^T W_l^{1/2} at j(l). With Z = C^{-1} V (ONE multi-RHS cyclic-
    reduction solve over all 6L columns, ops/blocktri.py) and the
    materialized inverse of S = I + V^T Z (_woodbury_setup), applying

        M^{-1} v = C^{-1} v - C^{-1} V S^{-1} V^T C^{-1} v

    costs two chain solves + O(L) small ops. M^{-1} ~= H^{-1} INCLUDING
    the loops, so CG converges in a handful of iterations INDEPENDENT of
    the loop count — unlike the chain-only preconditioner, whose CG
    iteration count scales with #loops (the r4 8192-tier cadence killer).
    M is a preconditioner, not a direct solve: the chain solve's per-level
    f32 regularization (ops/blocktri.py factor(reg)) cannot resolve the
    chain's softest bend modes (relative size ~1/N^2, below f32 on an
    8192 chain), and the outer CG is what corrects that bias — a direct
    f32 Woodbury step would silently under-correct loop closures.

    `wb` is the optional precomputed _woodbury_setup state (the optimize
    loop hoists it: one setup per optimize, not per GN iteration)."""
    odom, loops, gps = factors
    D_full = D + D_loop
    diag = jnp.diagonal(D_full, axis1=-2, axis2=-1)  # [N, 6]
    damp = damping * jnp.maximum(diag, 1e-6) + 1e-8
    if wb is None:
        wb = _woodbury_setup(factors, D, D_loop, free_mask, damping)
    precond = _wb_precond(wb, loops, free_mask)
    return _run_pcg(factors, g, damp, free_mask, precond, iters)


@functools.partial(jax.jit, static_argnames=("cfg", "cg_iters"))
def optimize(graph: PoseGraph, cfg: PGOConfig, cg_iters: int = 64) -> PoseGraph:
    """runISAM2opt equivalent: batch damped GN over the whole graph, warm
    started from current estimates; node 0 frozen (the 1e-12 prior).

    Solver selection is static (padded capacities are static shapes):
    large graphs use the Woodbury-preconditioned CG (_solve_woodbury,
    iteration count independent of #loops); small graphs keep the r4
    chain-preconditioned CG whose per-optimize cost is already well under
    cadence at those tiers. `cg_iters` applies to the chain-CG path only
    (the Woodbury path uses cfg.wb_cg_iters)."""
    N = graph.gps_z.shape[0]
    L = graph.loop_i.shape[0]
    ks = jnp.arange(N)
    free = (ks > 0) & (ks < graph.n_nodes)
    use_wb = (
        cfg.solver == "woodbury"
        and cfg.wb_min_nodes <= N <= cfg.wb_max_nodes
        and N * 6 * 6 * L * 4 <= cfg.wb_max_z_bytes
    )
    # Beyond the Woodbury tier, run chain-CG with the reduced large-tier
    # iteration counts: partial per-tick solves + the 1 Hz warm start act
    # as incremental refinement (see PGOConfig.cg_iters_large) — measured
    # 14.7 ms per CG iteration at the 8192 tier (tools/micro_wb.py), so
    # 2 GN x 24 CG holds the reference's 1 Hz cadence.
    gn_iters = cfg.gn_iterations
    if N > cfg.wb_max_nodes:
        cg_iters = min(cg_iters, cfg.cg_iters_large)
        gn_iters = min(gn_iters, cfg.gn_iterations_large)

    # Woodbury preconditioner setup HOISTED out of the GN loop: built once
    # from the warm-start linearization (the poses move millimeters between
    # warm-started GN iterations, so the stale preconditioner still takes
    # CG to convergence in ~wb_cg_iters) — the setup (6L-wide chain solve +
    # S Cholesky/inverse) is the dominant Woodbury cost per optimize.
    wb = None
    if use_wb:
        factors0 = [_sanitize(f) for f in _linearize(graph, cfg)]
        _, D0, D_loop0 = _gradient_and_diag(factors0, N)
        wb = _woodbury_setup(factors0, D0, D_loop0, free, cfg.lm_damping)

    def gn_iter(_, g_):
        factors = [_sanitize(f) for f in _linearize(g_, cfg)]
        grad, D, D_loop = _gradient_and_diag(factors, N)
        if use_wb:
            delta = _solve_woodbury(
                factors, grad, D, D_loop, free, cfg.lm_damping,
                cfg.wb_cg_iters, wb=wb,
            )
        else:
            delta = _solve_cg(
                factors, grad, D, D_loop, free, cfg.lm_damping, cg_iters
            )
        dpose = se3.exp_se3(delta)
        new_poses = se3.compose(g_.poses, dpose)
        new_poses = jax.tree.map(
            lambda new, old: jnp.where(free[:, None], new, old),
            new_poses, g_.poses,
        )
        return g_._replace(poses=new_poses)

    return jax.lax.fori_loop(0, gn_iters, gn_iter, graph)
