"""Isolate the per-keyframe backend device ops: which one hides ~80 ms?

Times each op separately, chained over varying inputs with np.asarray
drains (CLAUDE.md): _prepare_keyframe, make_and_append, detect_latest,
pg.add_keyframe, and the voxel filter inside prep at its real shape.
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

from scaloam_tpu import config
from scaloam_tpu.models import pipeline as pl
from scaloam_tpu.models import posegraph as pg
from scaloam_tpu.models import scancontext as scm
from scaloam_tpu.types import Pose

cfg = config.kitti_hdl64()
rng = np.random.default_rng(0)
N_T = 15

S, W = cfg.sensor.n_scans, cfg.sensor.max_points_per_ring


def timed(drive, warm):
    best = float("inf")
    for _ in range(3):
        np.asarray(warm())
        t0 = time.time()
        out = drive()
        np.asarray(out)
        best = min(best, (time.time() - t0) / N_T * 1e3)
    return best


# range-image-like inputs
ris = []
for i in range(N_T + 1):
    xyz = rng.uniform(-60, 60, (S, W, 3)).astype(np.float32)
    mask = rng.random((S, W)) < 0.8
    rel = rng.random((S, W)).astype(np.float32)
    ris.append((jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(rel)))
jax.block_until_ready(ris[-1][0])

out0 = pl._prepare_keyframe(*ris[0], cfg)
jax.block_until_ready(out0[0])


def drive_prep():
    o = None
    for a in ris[1:]:
        o = pl._prepare_keyframe(*a, cfg)
    return o[0]


print(f"_prepare_keyframe: {timed(drive_prep, lambda: out0[0]):.2f} ms",
      flush=True)

# make_and_append at the real input cap
sc_cfg = cfg.scancontext
cap = sc_cfg.max_input_points
clouds = []
for i in range(N_T + 1):
    xyz = rng.uniform(-90, 90, (cap, 3)).astype(np.float32)
    m = rng.random(cap) < 0.9
    clouds.append((jnp.asarray(xyz), jnp.asarray(m)))
jax.block_until_ready(clouds[-1][0])
db = scm.init_db(sc_cfg)
db, sc0 = scm.make_and_append(db, *clouds[0], sc_cfg)
jax.block_until_ready(sc0)


def drive_make():
    global db
    o = None
    for a in clouds[1:]:
        db2, o = scm.make_and_append(
            db._replace(count=jnp.minimum(db.count, 250)), *a, sc_cfg
        )
        globals()["db"] = db2
    return o


print(f"make_and_append@{cap}: {timed(drive_make, lambda: sc0):.2f} ms",
      flush=True)

# detect_latest at the 256 tier
d0 = scm.detect_latest(db, sc_cfg)
jax.block_until_ready(d0[2])


def drive_det():
    o = None
    for a in clouds[1:]:
        db2, _ = scm.make_and_append(
            db._replace(count=jnp.minimum(db.count, 250)), *a, sc_cfg
        )
        globals()["db"] = db2
        o = scm.detect_latest(db2, sc_cfg)
    return o[2]


print(f"make+detect:       {timed(drive_det, lambda: d0[2]):.2f} ms",
      flush=True)

# pg.add_keyframe
graph = pg.init_graph(cfg.pgo)
poses = [
    Pose(jnp.asarray(np.array([1, 0, 0, 0], np.float32)),
         jnp.asarray(rng.normal(0, 5, 3).astype(np.float32)))
    for _ in range(N_T + 1)
]
graph = pg.add_keyframe(graph, poses[0], jnp.float32(0), jnp.asarray(False),
                        n_nodes=0)
jax.block_until_ready(graph.poses.trans)


def drive_add():
    global graph
    g = graph
    for i, p in enumerate(poses[1:]):
        g = pg.add_keyframe(g, p, jnp.float32(0), jnp.asarray(False),
                            n_nodes=1 + i)
    globals()["graph"] = g
    return g.poses.trans[0]


print(f"pg.add_keyframe:   {timed(drive_add, lambda: graph.poses.trans[0]):.2f} ms",
      flush=True)
