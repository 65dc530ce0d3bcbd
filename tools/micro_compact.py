"""Micro-bench: run-start compaction at the features-stage shape
(n = 64*2340 = 149760 -> capacity 32768, 8 payload cols):
(a) unique-index scatter (current voxel_downsample_rows tail)
(b) argsort-of-positions + row gather (the packed-variant trick)
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


def timeit(fn, *args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.time() - t0) / n * 1000.0


n = 64 * 2340
cap = 32768
C = 8
rng = np.random.default_rng(0)
payload = jnp.asarray(rng.uniform(-50, 50, (n, C)).astype(np.float32))
# ~12k run starts scattered through the array (realistic density)
nr_np = rng.random(n) < 0.08
nr = jnp.asarray(nr_np)


@jax.jit
def compact_scatter(nr, payload):
    run_id = jnp.cumsum(nr.astype(jnp.int32)) - 1
    oidx = jnp.where(nr & (run_id < cap), run_id, cap)
    out = jnp.zeros((cap, C), jnp.float32).at[oidx].set(payload, mode="drop")
    got = jnp.zeros((cap,), bool).at[oidx].set(nr, mode="drop")
    return out, got


@jax.jit
def compact_sortgather(nr, payload):
    pos = np.arange(n, dtype=np.int32)
    start_pos = jnp.argsort(jnp.where(nr, pos, n + pos))[:cap]
    sp_c = jnp.minimum(start_pos, n - 1)
    got = nr[sp_c] & (start_pos < n)
    out = payload[sp_c]
    return out, got


print("scatter:      %.3f ms" % timeit(compact_scatter, nr, payload))
print("sort+gather:  %.3f ms" % timeit(compact_sortgather, nr, payload))
o1, g1 = compact_scatter(nr, payload)
o2, g2 = compact_sortgather(nr, payload)
print("match:", bool(jnp.all(g1 == g2)),
      bool(jnp.all(jnp.where(g1[:, None], o1, 0) == jnp.where(g2[:, None], o2, 0))))
