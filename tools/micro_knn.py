"""Micro-bench: knn_grid internals (gather vs top_k) and insert segment ops
vs sorted-run alternatives. Run on the real chip."""

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
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000.0


Q = 8192
C = 96 * 96 * 32
K = 16

rng = np.random.default_rng(0)
pts = jnp.asarray(rng.uniform(-50, 50, (C, K, 3)).astype(np.float32))
idx8 = jnp.asarray(rng.integers(0, C, (Q, 8)).astype(np.int32))
query = jnp.asarray(rng.uniform(-50, 50, (Q, 3)).astype(np.float32))


@jax.jit
def gather_only(pts, idx8, query):
    cand = pts[idx8]  # [Q, 8, K, 3]
    d2 = jnp.sum((cand - query[:, None, None, :]) ** 2, axis=-1)
    return d2.reshape(Q, -1)


@jax.jit
def full_topk(pts, idx8, query):
    cand = pts[idx8]
    d2 = jnp.sum((cand - query[:, None, None, :]) ** 2, axis=-1).reshape(Q, -1)
    negd, j = jax.lax.top_k(-d2, 8)
    nn = jnp.take_along_axis(cand.reshape(Q, -1, 3), j[:, :, None], axis=1)
    return -negd, nn


@jax.jit
def argmin_iter8(pts, idx8, query):
    cand = pts[idx8]
    d2 = jnp.sum((cand - query[:, None, None, :]) ** 2, axis=-1).reshape(Q, -1)
    flat = cand.reshape(Q, -1, 3)
    ds = []
    nns = []
    for _ in range(8):
        j = jnp.argmin(d2, axis=1)
        ds.append(jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0])
        nns.append(jnp.take_along_axis(flat, j[:, None, None], axis=1)[:, 0])
        d2 = d2.at[jnp.arange(Q), j].set(1e30)
    return jnp.stack(ds, 1), jnp.stack(nns, 1)


@jax.jit
def sort_payload(pts, idx8, query):
    cand = pts[idx8]
    d2 = jnp.sum((cand - query[:, None, None, :]) ** 2, axis=-1).reshape(Q, -1)
    flat = cand.reshape(Q, -1, 3)
    d_s, x_s, y_s, z_s = jax.lax.sort(
        (d2, flat[..., 0], flat[..., 1], flat[..., 2]), num_keys=1
    )
    return d_s[:, :8], jnp.stack([x_s[:, :8], y_s[:, :8], z_s[:, :8]], -1)


print("gather+d2 only:     %.3f ms" % timeit(gather_only, pts, idx8, query))
print("gather+topk8:       %.3f ms" % timeit(full_topk, pts, idx8, query))
print("gather+argmin x8:   %.3f ms" % timeit(argmin_iter8, pts, idx8, query))
print("gather+sortpayload: %.3f ms" % timeit(sort_payload, pts, idx8, query))

# --- insert segment ops --------------------------------------------------
N = 8192
idx = jnp.asarray(rng.integers(0, C, (N,)).astype(np.int32))
ok = jnp.asarray(rng.random(N) < 0.7)


@jax.jit
def seg_ops(idx, ok):
    touched = jax.ops.segment_sum(ok.astype(jnp.int32), idx, num_segments=C + 1)
    reset = jax.ops.segment_max(ok.astype(jnp.int32), idx, num_segments=C + 1)
    return touched, reset


@jax.jit
def sorted_boundary(idx, ok):
    # sort by idx carrying ok; run-boundary counts; scatter at run starts
    idx_s, ok_s = jax.lax.sort((idx, ok.astype(jnp.int32)), num_keys=1)
    csum = jnp.cumsum(ok_s)
    is_end = jnp.concatenate([idx_s[1:] != idx_s[:-1], jnp.array([True])])
    is_start = jnp.concatenate([jnp.array([True]), idx_s[1:] != idx_s[:-1]])
    start_excl = jnp.where(is_start, csum - ok_s, 0)
    # count per run at its end position: csum_end - csum_before_start
    run_start_excl = jax.lax.cummax(start_excl)
    counts_at_end = csum - run_start_excl
    touched = jnp.zeros((C + 1,), jnp.int32).at[
        jnp.where(is_end, idx_s, C)
    ].set(jnp.where(is_end, counts_at_end, 0), mode="drop")
    reset = jnp.zeros((C + 1,), jnp.int32).at[
        jnp.where(is_end, idx_s, C)
    ].set(jnp.where(is_end, 1, 0), mode="drop")
    return touched, reset


print("insert seg ops:     %.3f ms" % timeit(seg_ops, idx, ok))
print("insert sorted:      %.3f ms" % timeit(sorted_boundary, idx, ok))
t, r = seg_ops(idx, ok)
t2, r2 = sorted_boundary(idx, ok)
print("touched match:", bool(jnp.all(t[:-1] == t2[:-1])))
