"""Micro-bench the insert scatter pattern on row-major committed arrays:
is the 2D-index scatter into [C,K,3] fast when layouts are row-major, or
does XLA's (2,1,0) layout preference for mapping_step have a real basis?"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.time() - t0) / n * 1000.0


C = 96 * 96 * 32
K = 16
N = 8192
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.uniform(-50, 50, (C, K, 3)).astype(np.float32))
coord = jnp.asarray(rng.integers(-100, 100, (C, 3)).astype(np.int32))
idx = jnp.asarray(rng.integers(0, C, (N,)).astype(np.int32))
pos = jnp.asarray(rng.integers(0, K, (N,)).astype(np.int32))
xyz = jnp.asarray(rng.uniform(-50, 50, (N, 3)).astype(np.float32))
reset = jnp.asarray(rng.random(C) < 0.01)
cc = jnp.asarray(rng.integers(-100, 100, (N, 3)).astype(np.int32))


@jax.jit
def scatter2d(pts, idx, pos, xyz):
    return pts.at[idx, pos].set(xyz, mode="drop")


@jax.jit
def scatter_flat(pts, idx, pos, xyz):
    flat = pts.reshape(C * K, 3)
    out = flat.at[idx * K + pos].set(xyz, mode="drop")
    return out.reshape(C, K, 3)


@jax.jit
def reset_where(pts, reset):
    return jnp.where(reset[:, None, None], 1e9, pts)


@jax.jit
def full_insert_pattern(pts, coord, idx, pos, xyz, reset, cc):
    base = jnp.where(reset[:, None, None], 1e9, pts)
    out = base.at[idx, pos].set(xyz, mode="drop")
    coord2 = coord.at[idx].set(cc, mode="drop")
    return out, coord2


print("scatter2d [N=8192 -> C,K,3]: %.3f ms" % timeit(scatter2d, pts, idx, pos, xyz))
print("scatter flat:                %.3f ms" % timeit(scatter_flat, pts, idx, pos, xyz))
print("reset where (full grid):     %.3f ms" % timeit(reset_where, pts, reset))
print("full insert pattern:         %.3f ms" % timeit(full_insert_pattern, pts, coord, idx, pos, xyz, reset, cc))
print("layout out:", jax.jit(scatter2d)(pts, idx, pos, xyz).format.layout)
