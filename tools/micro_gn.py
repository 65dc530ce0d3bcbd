"""Where do the GN solves' 2.2 ms/frame actually go? Three isolated probes
(same-session, chained, drained):

  A. the sequential SCALAR chain: 8x (cholesky_solve6 + apply_delta) with
     fixed [6,6]/[6] inputs — no factor work at all;
  B. the factor relinearize + normal-equations reduction alone, 8x, at
     odometry sizes (edge [3,6,768] + plane [1,6,1536]);
  C. B at mapping sizes (edge 2048 + plane 6656).
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

from scaloam_tpu.ops import gn, residuals, se3
from scaloam_tpu.types import Pose

rng = np.random.default_rng(0)
N_T = 20


def timed(drive, warm):
    best = float("inf")
    for _ in range(3):
        np.asarray(warm())
        t0 = time.time()
        out = drive()
        np.asarray(out)
        best = min(best, (time.time() - t0) / N_T * 1e3)
    return best


# --- A: scalar chain --------------------------------------------------------
As = [jnp.asarray((np.eye(6) * (4 + i) + 0.1).astype(np.float32)) for i in range(N_T + 1)]
bs = [jnp.asarray(rng.normal(0, 1, 6).astype(np.float32)) for _ in range(N_T + 1)]
jax.block_until_ready(As[-1])


@jax.jit
def chain_scalar(A, b):
    pose = Pose.identity()
    for _ in range(8):
        delta = gn.solve_step(A + pose.trans[0] * 0.0, b, 1e-6)
        pose = gn.apply_delta(pose, delta)
        b = b * 0.99 + jnp.concatenate([pose.trans, delta[:3]]) * 0.01
    return pose.trans


o0 = chain_scalar(As[0], bs[0])


def drive_a():
    o = None
    for i in range(1, N_T + 1):
        o = chain_scalar(As[i], bs[i])
    return o


print(f"A scalar chain (8x solve+apply): {timed(drive_a, lambda: o0):.3f} ms",
      flush=True)


@jax.jit
def chain_lapack(A, b):
    pose = Pose.identity()
    for _ in range(8):
        diag = jnp.diagonal(A)
        M = A + 1e-6 * jnp.diag(jnp.maximum(diag, 1e-8)) + pose.trans[0] * 0.0
        delta = jnp.linalg.solve(M, -b)
        pose = gn.apply_delta(pose, delta)
        b = b * 0.99 + jnp.concatenate([pose.trans, delta[:3]]) * 0.01
    return pose.trans


o0b = chain_lapack(As[0], bs[0])


def drive_a2():
    o = None
    for i in range(1, N_T + 1):
        o = chain_lapack(As[i], bs[i])
    return o


print(f"A2 lapack chain (8x solve+apply): {timed(drive_a2, lambda: o0b):.3f} ms",
      flush=True)


def cholesky_solve6_vec(A, b):
    """Column-vectorized Cholesky: ~70 [6]-wide tensor ops instead of ~170
    scalar ops (candidate replacement for the scalar chain)."""
    eye = jnp.eye(6, dtype=A.dtype)
    idx = jnp.arange(6)
    L = jnp.zeros_like(A)
    for j in range(6):
        s = A[:, j] - L @ L[j]
        d = jnp.sqrt(jnp.maximum(s[j], 1e-20))
        col = jnp.where(idx >= j, s / d, 0.0)
        L = L + jnp.outer(col, eye[j])
    y = jnp.zeros(6, A.dtype)
    for j in range(6):
        y = y + ((b[j] - L[j] @ y) / L[j, j]) * eye[j]
    x = jnp.zeros(6, A.dtype)
    for j in reversed(range(6)):
        x = x + ((y[j] - L[:, j] @ x) / L[j, j]) * eye[j]
    return x


@jax.jit
def chain_vec(A, b):
    pose = Pose.identity()
    for _ in range(8):
        diag = jnp.diagonal(A)
        M = A + 1e-6 * jnp.diag(jnp.maximum(diag, 1e-8)) + pose.trans[0] * 0.0
        delta = cholesky_solve6_vec(M, -b)
        pose = gn.apply_delta(pose, delta)
        b = b * 0.99 + jnp.concatenate([pose.trans, delta[:3]]) * 0.01
    return pose.trans


o0c = chain_vec(As[0], bs[0])


def drive_a3():
    o = None
    for i in range(1, N_T + 1):
        o = chain_vec(As[i], bs[i])
    return o


print(f"A3 vec-chol chain (8x solve+apply): {timed(drive_a3, lambda: o0c):.3f} ms",
      flush=True)


@jax.jit
def chain_apply_only(A, b):
    pose = Pose.identity()
    for _ in range(8):
        delta = b * 0.01 + A[0] * 1e-6
        pose = gn.apply_delta(pose, delta)
        b = b * 0.99 + jnp.concatenate([pose.trans, delta[:3]]) * 0.01
    return pose.trans


o0d = chain_apply_only(As[0], bs[0])


def drive_a4():
    o = None
    for i in range(1, N_T + 1):
        o = chain_apply_only(As[i], bs[i])
    return o


print(f"A4 apply-only chain (8x): {timed(drive_a4, lambda: o0d):.3f} ms",
      flush=True)


# --- B/C: relinearize + reduce ---------------------------------------------
def make_probe(n_e, n_p):
    pT = jnp.asarray(rng.uniform(-40, 40, (3, n_e)).astype(np.float32))
    aT = pT + jnp.asarray(rng.normal(0, 0.3, (3, n_e)).astype(np.float32))
    bT = pT + jnp.asarray(rng.normal(0, 0.3, (3, n_e)).astype(np.float32))
    ve = jnp.asarray(rng.random(n_e) < 0.8)
    sT = jnp.asarray(rng.uniform(-40, 40, (3, n_p)).astype(np.float32))
    nT = jnp.asarray(rng.normal(0, 1, (3, n_p)).astype(np.float32))
    nT = nT / jnp.linalg.norm(nT, axis=0, keepdims=True)
    nd = jnp.asarray(rng.normal(0, 1, n_p).astype(np.float32))
    vp = jnp.asarray(rng.random(n_p) < 0.8)

    @jax.jit
    def probe(q, t):
        pose = Pose(q, t)
        prep = residuals.edge_prep_T(pT, aT, bT, ve)
        out = jnp.zeros(())
        for _ in range(8):
            sets = [
                residuals.edge_factors_from_prep(pose, prep),
                residuals.plane_norm_factors_T(pose, sT, nT, nd, vp),
            ]
            JtJ, Jtr, _ = gn.normal_equations(sets, 0.1)
            out = out + JtJ[0, 0] + Jtr[0]
            pose = Pose(pose.quat, pose.trans + 1e-6 * Jtr[:3])
        return out

    return probe


qs = [jnp.asarray(np.array([1.0, 0, 0, 0], np.float32)) for _ in range(N_T + 1)]
ts = [jnp.asarray(rng.normal(0, 0.1, 3).astype(np.float32)) for _ in range(N_T + 1)]

for name, (ne, npl) in (("B odo-size", (768, 1536)), ("C map-size", (2048, 6656))):
    probe = make_probe(ne, npl)
    o0 = probe(qs[0], ts[0])

    def drive(probe=probe):
        o = None
        for i in range(1, N_T + 1):
            o = probe(qs[i], ts[i])
        return o

    print(f"{name} (8x relin+reduce): {timed(drive, lambda o0=o0: o0):.3f} ms",
          flush=True)
