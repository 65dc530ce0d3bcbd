"""Micro-bench: big 1-D cumsum lowerings on this TPU.

  cs1d     — jnp.cumsum over [N] int32
  cs2d     — blocked scan: reshape [R,128], cumsum axis=1, add exclusive
             row offsets (row sums cumsummed — a small [R] cumsum)
  flip1d   — sticky-flip via cumsum (features._relative_time pattern)
  flipam   — sticky-flip via argmax(first True) + iota compare
Each timed over unique inputs with np.asarray drains.
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

N = 131072
R = N // 128
rng = np.random.default_rng(0)
xs = [jnp.asarray(rng.integers(0, 2, N).astype(np.int32)) for _ in range(41)]
for x in xs:
    jax.block_until_ready(x)


@jax.jit
def cs1d(v):
    return jnp.cumsum(v)[-1] + jnp.sum(jnp.cumsum(v))


@jax.jit
def cs2d(v):
    m = v.reshape(R, 128)
    within = jnp.cumsum(m, axis=1)
    rows = within[:, -1]
    offs = jnp.cumsum(rows) - rows
    full = within + offs[:, None]
    return full[-1, -1] + jnp.sum(full)


@jax.jit
def flip1d(v):
    flip = v > 0
    hp = jnp.concatenate([jnp.array([False]), jnp.cumsum(flip)[:-1] > 0])
    return jnp.sum(hp)


@jax.jit
def flipam(v):
    flip = v > 0
    fi = jnp.argmax(flip)
    hp = (jnp.arange(N) > fi) & jnp.any(flip)
    return jnp.sum(hp)


def timeit(name, fn):
    out = fn(xs[0])
    _ = np.asarray(out)
    for lo, hi in ((1, 21), (21, 41)):
        t0 = time.time()
        for i in range(lo, hi):
            out = fn(xs[i])
        _ = np.asarray(out)
        dt = (time.time() - t0) / (hi - lo) * 1000
    print(f"{name:8s}: {dt:6.3f} ms")


timeit("cs1d", cs1d)
timeit("cs2d", cs2d)
timeit("flip1d", flip1d)
timeit("flipam", flipam)
