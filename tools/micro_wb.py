"""Micro-timings of the Woodbury-solver pieces on the real chip: which of
(chain factor, 1-RHS solve, wide-Z solve, S cholesky+inverse, matvec,
whole _solve_woodbury, whole _solve_cg) owns the 4096-tier cost.

Methodology: varying inputs (distinct RHS per call), np.asarray-drained
timed regions, best of 3 (CLAUDE.md traps).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

from scaloam_tpu import config
from scaloam_tpu.models import posegraph as pg
from scaloam_tpu.ops import blocktri
from scaloam_tpu.types import Pose

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
L = int(sys.argv[2]) if len(sys.argv) > 2 else 64
R = 6 * L
rng = np.random.default_rng(0)
REPS = 10

# SPD-ish chain blocks
base = rng.normal(size=(N, 6, 6)).astype(np.float32)
D = jnp.asarray(base @ base.transpose(0, 2, 1) + 10 * np.eye(6, dtype=np.float32))
B = jnp.asarray(0.1 * rng.normal(size=(N, 6, 6)).astype(np.float32))
B = B.at[-1].set(0.0)

bs = [jnp.asarray(rng.normal(size=(N, 6)).astype(np.float32)) for _ in range(REPS + 1)]
Vs = [jnp.asarray(rng.normal(size=(N, 6, R)).astype(np.float32) * 0.01) for _ in range(3)]
Ss = [jnp.asarray((lambda a: a @ a.T + np.eye(R, dtype=np.float32))(
    rng.normal(size=(R, R)).astype(np.float32) * 0.1)) for _ in range(3)]


def timed(name, fn, inputs):
    out = fn(inputs[0])
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        t0 = time.time()
        for x in inputs[1:]:
            out = fn(x)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, (time.time() - t0) / (len(inputs) - 1))
    print(f"{name:24s}: {best * 1e3:8.2f} ms", flush=True)
    return best


@jax.jit
def j_factor(b):
    lev = blocktri.factor(D, B)
    return jax.tree.leaves(lev)[0].ravel()[0] + b[0, 0]


@jax.jit
def j_solve1(b):
    lev = blocktri.factor(D, B)
    return blocktri.solve(lev, b)


@jax.jit
def j_solve_wide(V):
    lev = blocktri.factor(D, B)
    return blocktri.solve(lev, V)


@jax.jit
def j_chol_inv(S):
    sd = jnp.sqrt(jnp.diagonal(S))
    Ss_ = S / (sd[:, None] * sd[None, :])
    from jax.scipy.linalg import cho_solve
    with jax.default_matmul_precision("highest"):
        c = jnp.linalg.cholesky(Ss_)
        Sinv = cho_solve((c, True), jnp.eye(R, dtype=jnp.float32))
    return Sinv


@jax.jit
def j_ns_inv(S):
    sd = jnp.sqrt(jnp.diagonal(S))
    Ss_ = S / (sd[:, None] * sd[None, :])
    n1 = jnp.max(jnp.sum(jnp.abs(Ss_), axis=0))
    X = Ss_.T / jnp.maximum(n1 * n1, 1e-12)
    eye2 = 2.0 * jnp.eye(R, dtype=jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    for _ in range(24):
        SX = jnp.matmul(Ss_, X, precision=hi)
        X = jnp.matmul(X, eye2 - SX, precision=hi)
    return 0.5 * (X + X.T) / (sd[:, None] * sd[None, :])


timed("factor", j_factor, bs)
timed("factor+solve 1rhs", j_solve1, bs)
timed(f"factor+solve {R}rhs", j_solve_wide, Vs)
timed(f"chol+inv {R}", j_chol_inv, Ss)
timed(f"newton-schulz inv {R}", j_ns_inv, Ss)

# Whole-solver comparison on a real graph
cfg = config.PGOConfig(max_keyframes=N, max_loops=L)
graph = pg.init_graph(cfg, initial_nodes=N, initial_loops=L)
q = np.zeros((N, 4), np.float32); q[:, 0] = 1
t = np.cumsum(rng.normal(0, 0.5, size=(N, 3)).astype(np.float32), axis=0)
graph = graph._replace(
    poses=Pose(jnp.asarray(q), jnp.asarray(t)),
    odom_poses=Pose(jnp.asarray(q), jnp.asarray(t)),
    n_nodes=jnp.array(N - 8, jnp.int32),
)
for k in range(8):
    graph = pg.add_loop(graph, jnp.int32(N - 9 - k), jnp.int32(k),
                        Pose.identity(), n_loops=k)

cfg_wb = config.PGOConfig(max_keyframes=N, max_loops=L, wb_min_nodes=1)
cfg_cg = config.PGOConfig(max_keyframes=N, max_loops=L, solver="chain_cg")

graphs = [graph._replace(gps_z=graph.gps_z + 1e-6 * i) for i in range(4)]


@functools.partial(jax.jit, static_argnames=("c",))
def one_opt(g, c):
    return pg.optimize(g, c)


for name, c in (("optimize woodbury", cfg_wb), ("optimize chain_cg", cfg_cg)):
    out = one_opt(graphs[0], c)
    jax.block_until_ready(out.poses.trans)
    best = float("inf")
    for _ in range(3):
        np.asarray(out.poses.trans)[:1]
        t0 = time.time()
        for g in graphs[1:]:
            out = one_opt(g, c)
        np.asarray(out.poses.trans)[:1]
        best = min(best, (time.time() - t0) / (len(graphs) - 1))
    print(f"{name:24s}: {best * 1e3:8.2f} ms", flush=True)
