"""Distributed pose-graph Gauss-Newton: factors sharded over the mesh.

The single-chip backend (models/posegraph.py) already evaluates the CG
matvec factor-wise; distribution shards the factor arrays over the `kf`
mesh axis and psums the per-node scatter results — poses stay replicated
(6N floats is tiny; the O(F) Jacobian work and matvec FLOPs dominate and
scale linearly with devices). This is the "distributed Gauss-Newton with
ICI collectives" of BASELINE.json's north star; the per-iteration
communication is one psum of [N, 6] (+[N, 6, 6] once per linearization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from scaloam_tpu.config import PGOConfig
from scaloam_tpu.models.posegraph import (
    PoseGraph, _between_batch, _gps_batch, cauchy_weight,
)
from scaloam_tpu.ops import blocktri, se3
from scaloam_tpu.parallel.mesh import KF_AXIS
from scaloam_tpu.types import Pose

# HIGHEST: bf16-rounded Hessian blocks can go indefinite and explode the
# chain preconditioner (see models/posegraph.py _HI note).
_HI = jax.lax.Precision.HIGHEST


def _take(p: Pose, idx):
    return Pose(p.quat[idx], p.trans[idx])


def optimize_sharded(graph: PoseGraph, cfg: PGOConfig, mesh, cg_iters: int = 64) -> PoseGraph:
    """Drop-in replacement for models.posegraph.optimize on a device mesh."""
    N = graph.gps_z.shape[0]
    L = graph.loop_i.shape[0]
    n_dev = mesh.shape[KF_AXIS]
    assert N % n_dev == 0 and L % n_dev == 0, "caps must divide the mesh"

    ks = jnp.arange(N)
    odom_j = jnp.minimum(ks + 1, N - 1)

    w_odom = jnp.concatenate(
        [
            jnp.full((3,), 1.0 / cfg.odom_rot_variance, jnp.float32),
            jnp.full((3,), 1.0 / cfg.odom_trans_variance, jnp.float32),
        ]
    )

    def shard_fn(
        poses_q, poses_t, n_nodes, n_loops, chain_break,
        o_i, o_j, o_zq, o_zt,  # odometry factor slice
        l_i, l_j, l_zq, l_zt, l_slot,  # loop factor slice
        g_i, g_z, g_valid,  # gps slice
    ):
        free = (ks > 0) & (ks < n_nodes)
        fm = free[:, None]

        def linearize(poses: Pose):
            xi, xj = _take(poses, o_i), _take(poses, o_j)
            r_o, Ji_o, Jj_o = _between_batch(xi, xj, Pose(o_zq, o_zt))
            # invalid past the node count and across sequence boundaries
            v_o = (o_i < n_nodes - 1) & ~chain_break[o_j]
            W_o = jnp.broadcast_to(w_odom, r_o.shape)

            xi_l, xj_l = _take(poses, l_i), _take(poses, l_j)
            r_l, Ji_l, Jj_l = _between_batch(xi_l, xj_l, Pose(l_zq, l_zt))
            v_l = l_slot < n_loops
            wl = 1.0 / cfg.loop_variance
            sqw = jnp.sum(r_l * r_l, axis=-1) * wl
            W_l = (wl * cauchy_weight(sqw, cfg.cauchy_k))[:, None] * jnp.ones_like(r_l)

            r_g, J_g = _gps_batch(_take(poses, g_i), g_z)
            v_g = g_valid & (g_i < n_nodes)
            wg = 1.0 / cfg.gps_z_variance
            sqg = (r_g[:, 0] ** 2) * wg
            W_g1 = wg * cauchy_weight(sqg, cfg.cauchy_k)
            r_g6 = jnp.concatenate([r_g, jnp.zeros((r_g.shape[0], 5))], -1)
            J_g6 = jnp.concatenate([J_g, jnp.zeros((J_g.shape[0], 5, 6))], -2)
            W_g = jnp.concatenate([W_g1[:, None], jnp.zeros((r_g.shape[0], 5))], -1)

            out = []
            for (i, j, r, Ji, Jj, W, v) in [
                (o_i, o_j, r_o, Ji_o, Jj_o, W_o, v_o),
                (l_i, l_j, r_l, Ji_l, Jj_l, W_l, v_l),
                (g_i, g_i, r_g6, J_g6, jnp.zeros_like(J_g6), W_g, v_g),
            ]:
                vm = v[:, None]
                out.append((
                    i, j,
                    jnp.where(vm, r, 0.0),
                    jnp.where(vm[..., None], Ji, 0.0),
                    jnp.where(vm[..., None], Jj, 0.0),
                    jnp.where(vm, W, 0.0),
                ))
            return out

        def grad_diag(factors):
            g = jnp.zeros((N, 6))
            D = jnp.zeros((N, 6, 6))
            for (i, j, r, Ji, Jj, W) in factors:
                Wr = W * r
                g = g.at[i].add(jnp.einsum("frc,fr->fc", Ji, Wr, precision=_HI))
                g = g.at[j].add(jnp.einsum("frc,fr->fc", Jj, Wr, precision=_HI))
                D = D.at[i].add(jnp.einsum("fri,fr,frj->fij", Ji, W, Ji, precision=_HI))
                D = D.at[j].add(jnp.einsum("fri,fr,frj->fij", Jj, W, Jj, precision=_HI))
            g = jax.lax.psum(g, KF_AXIS)
            D = jax.lax.psum(D, KF_AXIS)
            return g, D

        def matvec(factors, v, damp):
            out = damp * v
            for (i, j, r, Ji, Jj, W) in factors:
                Av = jnp.einsum("frc,fc->fr", Ji, v[i], precision=_HI) + jnp.einsum(
                    "frc,fc->fr", Jj, v[j], precision=_HI
                )
                WAv = W * Av
                out = out.at[i].add(jnp.einsum("frc,fr->fc", Ji, WAv, precision=_HI))
                out = out.at[j].add(jnp.einsum("frc,fr->fc", Jj, WAv, precision=_HI))
            return jax.lax.psum(out - damp * v, KF_AXIS) + damp * v

        def gn_iter(_, poses_qt):
            poses = Pose(*poses_qt)
            factors = linearize(poses)
            g, D = grad_diag(factors)
            diag = jnp.diagonal(D, axis1=-2, axis2=-1)
            damp = cfg.lm_damping * jnp.maximum(diag, 1e-6) + 1e-8
            eye = jnp.eye(6, dtype=D.dtype)[None]

            # Chain preconditioner (see models/posegraph._solve_cg): the
            # odometry coupling blocks are scattered from this shard's
            # factor slice and psum'd (each chain factor lives on exactly
            # one device); the log-depth cyclic-reduction factor/solve then
            # runs replicated — N*6x6 is tiny next to the factor work.
            o_fi, _, _, Ji_o, Jj_o, W_o = factors[0]
            B_loc = jnp.zeros((N, 6, 6)).at[o_fi].add(
                jnp.einsum(
                    "fri,fr,frj->fij", Ji_o, W_o, Jj_o,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
            B_full = jax.lax.psum(B_loc, KF_AXIS)
            pair_free = free & jnp.roll(free, -1)
            pair_free = pair_free.at[-1].set(False)
            B_chain = jnp.where(pair_free[:, None, None], B_full, 0.0)
            D_chain = D + damp[:, :, None] * eye + 1e-6 * eye
            D_chain = jnp.where(fm[:, :, None], D_chain, jnp.eye(6)[None])
            chain = blocktri.factor(D_chain, B_chain)

            def mv(v):
                v = jnp.where(fm, v, 0.0)
                return jnp.where(fm, matvec(factors, v, damp), 0.0)

            def precond(v):
                return jnp.where(
                    fm, blocktri.solve(chain, jnp.where(fm, v, 0.0)), 0.0
                )

            b = jnp.where(fm, -g, 0.0)
            x = jnp.zeros_like(b)
            r = b
            z = precond(r)
            p = z
            rz = jnp.sum(r * z)

            def body(_, carry):
                x, r, z, p, rz = carry
                Ap = mv(p)
                alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-20)
                x = x + alpha * p
                r = r - alpha * Ap
                z = precond(r)
                rz_new = jnp.sum(r * z)
                beta = rz_new / jnp.maximum(rz, 1e-20)
                return x, r, z, p * beta + z, rz_new

            delta, *_ = jax.lax.fori_loop(0, cg_iters, body, (x, r, z, p, rz))
            dpose = se3.exp_se3(delta)
            newp = se3.compose(poses, dpose)
            return (
                jnp.where(fm, newp.quat, poses.quat),
                jnp.where(fm, newp.trans, poses.trans),
            )

        q, t = jax.lax.fori_loop(
            0, cfg.gn_iterations, gn_iter, (poses_q, poses_t)
        )
        return q, t

    spec_rep = P()
    spec_shard = P(KF_AXIS)
    q, t = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                spec_rep, spec_rep, spec_rep, spec_rep, spec_rep,
                spec_shard, spec_shard, spec_shard, spec_shard,
                spec_shard, spec_shard, spec_shard, spec_shard, spec_shard,
                spec_shard, spec_shard, spec_shard,
            ),
            out_specs=(spec_rep, spec_rep),
            check_vma=False,
        )
    )(
        graph.poses.quat, graph.poses.trans, graph.n_nodes, graph.n_loops,
        graph.chain_break,
        ks, odom_j, graph.odom_rel.quat, graph.odom_rel.trans,
        graph.loop_i, graph.loop_j, graph.loop_rel.quat, graph.loop_rel.trans,
        jnp.arange(L),
        ks, graph.gps_z, graph.gps_valid,
    )
    return graph._replace(poses=Pose(q, t))
