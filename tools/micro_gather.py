"""Is the 8-cell candidate gather row-bound or element-bound?
Gather R rows of width Wd from [C, Wd] at the mapping shapes:
  rows = 8192*8 = 65536 (surf), widths 48 (cap16 xyz), 24 (packed/cap8),
  12; plus row-count scaling at fixed width.
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

C = 294912
rng = np.random.default_rng(0)
NIDX = 25


def make_idx(seed, rows):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.integers(0, C, rows).astype(np.int32))


import functools


@functools.partial(jax.jit, static_argnames=("wd",))
def g(idx, tbl, wd):
    return jnp.sum(tbl[idx], dtype=jnp.float32)


def timeit(name, rows, wd):
    tbl = jnp.asarray(rng.uniform(size=(C, wd)).astype(np.float32))
    jax.block_until_ready(tbl)
    idxs = [make_idx(1000 * wd + i, rows) for i in range(NIDX)]
    for i in idxs:
        jax.block_until_ready(i)
    out = g(idxs[0], tbl, wd)
    _ = np.asarray(out)
    for lo, hi in ((1, 13), (13, 25)):
        t0 = time.time()
        for i in range(lo, hi):
            out = g(idxs[i], tbl, wd)
        _ = np.asarray(out)
        dt = (time.time() - t0) / (hi - lo) * 1000
    gels = rows * wd / dt / 1e6
    print(f"{name:22s}: {dt:6.2f} ms  ({gels:7.2f} G elem/s x1e-3)")


timeit("rows 65536 x w48", 65536, 48)
timeit("rows 65536 x w24", 65536, 24)
timeit("rows 65536 x w12", 65536, 12)
timeit("rows 32768 x w48", 32768, 48)
timeit("rows 16384 x w48", 16384, 48)
