"""Same-session A/B of the three r4 kernel changes (tunnel drift makes
cross-session comparisons useless; both variants run here back-to-back):

  1. argmin_topk payload select: per-k einsums (r3) vs one batched matmul
  2. gridmap.insert: segment_sum/segment_max (r3) vs run-logic + unique
     scatters
  3. build_range_image: 5-operand stable sort + pre-sort rel (r3) vs
     4-operand unique-key sort + post-sort rel

Each timed with varying inputs, np.asarray-drained regions, best-of-3.
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

from scaloam_tpu.ops import features as F
from scaloam_tpu.ops import gridmap, voxel
from scaloam_tpu.ops.voxel import _BIG, split3_f32

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


# ---------------------------------------------------------------------- 1
Q, M = 6656, 128
k = 8
ds = [jnp.asarray(rng.uniform(0, 9, (Q, M)).astype(np.float32)) for _ in range(N_T + 1)]
payloads = [jnp.asarray(rng.uniform(-50, 50, (Q, M, 3)).astype(np.float32)) for _ in range(N_T + 1)]
jax.block_until_ready(payloads[-1])


@jax.jit
def topk_new(d, p):
    v, r = voxel.argmin_topk(d, k, p)
    return v[0, 0] + r[0, 0, 0]


@jax.jit
def topk_old(d, p):
    cols = jnp.arange(d.shape[1])[None, :]
    vals, rows = [], []
    dd = d
    p123 = split3_f32(p)
    for _ in range(k):
        j = jnp.argmin(dd, axis=1)
        hot = cols == j[:, None]
        vals.append(jnp.min(dd, axis=1))
        h = hot.astype(jnp.float32)
        terms = [
            jnp.einsum("qm,qmc->qc", h, pp, preferred_element_type=jnp.float32)
            for pp in p123
        ]
        rows.append((terms[0] + terms[1]) + terms[2])
        dd = jnp.where(hot, _BIG, dd)
    return jnp.stack(vals, 1)[0, 0] + jnp.stack(rows, 1)[0, 0, 0]


for name, fn in (("topk_old", topk_old), ("topk_new", topk_new)):
    out0 = fn(ds[0], payloads[0])

    def drive(fn=fn):
        o = None
        for i in range(1, N_T + 1):
            o = fn(ds[i], payloads[i])
        return o

    print(f"{name}: {timed(drive, lambda out0=out0: out0):.3f} ms", flush=True)

# ---------------------------------------------------------------------- 2
GX, GY, GZ, K = 96, 96, 32, 16
CELL, RES = 2.0, 0.8
g0 = gridmap.init_grid(GX * GY * GZ, K)
batches = [
    (
        jnp.asarray(
            (rng.uniform(-60, 60, (6656, 3)) + np.array([i * 1.0, 0, 0])).astype(np.float32)
        ),
        jnp.asarray(rng.random(6656) < 0.95),
    )
    for i in range(2 * (N_T + 2))
]
jax.block_until_ready(batches[-1][0])
# warm a populated grid
for i in range(4):
    g0 = gridmap.insert(g0, batches[i][0], batches[i][1], GX, GY, GZ, CELL, RES)
jax.block_until_ready(g0.pts)


def insert_old(grid, xyz, mask, gx, gy, gz, cell_size, dedup_radius):
    from scaloam_tpu.ops.gridmap import _flat_idx, _FAR

    N = xyz.shape[0]
    K_ = grid.pts.shape[1]
    cc = jnp.floor(xyz / cell_size).astype(jnp.int32)
    idx = _flat_idx(cc, gx, gy, gz)
    idx = jnp.where(mask, idx, grid.pts.shape[0])
    stored_cc = grid.cell_coord[jnp.minimum(idx, grid.pts.shape[0] - 1)]
    fresh = jnp.all(stored_cc == cc, axis=-1)
    base = jnp.where(fresh, grid.count[jnp.minimum(idx, grid.pts.shape[0] - 1)], 0)
    cell_pts = grid.pts[jnp.minimum(idx, grid.pts.shape[0] - 1)]
    d2 = jnp.sum((cell_pts - xyz[:, None, :]) ** 2, axis=-1)
    occ = np.arange(K_)[None, :] < base[:, None]
    near = jnp.any(occ & (d2 < dedup_radius * dedup_radius), axis=-1) & fresh
    want = mask & ~near
    order = jnp.argsort(jnp.where(want, idx, 2**30))
    idx_s = idx[order]
    want_s = want[order]
    newseg = jnp.concatenate([jnp.array([True]), idx_s[1:] != idx_s[:-1]])
    seg_start = voxel.cummax_blocked(jnp.where(newseg, np.arange(N), 0))
    pos_in_seg = np.arange(N) - seg_start
    rank = jnp.zeros((N,), jnp.int32).at[order].set(pos_in_seg.astype(jnp.int32))
    pos = base + rank
    ok = want & (pos < K_)
    write_idx = jnp.where(ok, idx, grid.pts.shape[0])
    touched_add = jax.ops.segment_sum(
        ok.astype(jnp.int32), write_idx, num_segments=grid.pts.shape[0] + 1
    )[:-1]
    reset = jax.ops.segment_max(
        (mask & ~fresh).astype(jnp.int32), jnp.where(mask, idx, grid.pts.shape[0]),
        num_segments=grid.pts.shape[0] + 1,
    )[:-1]
    base_pts = jnp.where((reset > 0)[:, None, None], _FAR, grid.pts)
    pts = base_pts.at[write_idx, jnp.where(ok, pos, 0)].set(xyz, mode="drop")
    new_count = jnp.minimum(
        jnp.where(reset > 0, touched_add, grid.count + touched_add), K_
    )
    coord_new = grid.cell_coord.at[write_idx].set(cc, mode="drop")
    cell_coord = jnp.where((reset > 0)[:, None] | (touched_add > 0)[:, None],
                           coord_new, grid.cell_coord)
    total = jnp.sum(new_count)
    return gridmap.GridMap(pts=pts, count=new_count, cell_coord=cell_coord, total=total)


insert_old_j = jax.jit(insert_old, static_argnames=("gx", "gy", "gz", "cell_size", "dedup_radius"))

for name, fn in (("insert_old", insert_old_j), ("insert_new", gridmap.insert)):
    g = gridmap.GridMap(*[jnp.array(a) for a in g0])
    g = fn(g, batches[5][0], batches[5][1], GX, GY, GZ, CELL, RES)
    jax.block_until_ready(g.pts)

    def drive(fn=fn, g=g):
        gg = g
        for i in range(6, 6 + N_T):
            gg = fn(gg, batches[i][0], batches[i][1], GX, GY, GZ, CELL, RES)
        return gg.count[0]

    print(f"{name}: {timed(drive, lambda g=g: g.count[0]):.3f} ms", flush=True)

# ---------------------------------------------------------------------- 3
n, S, W = 131072, 64, 2304
scans_xyz = [
    jnp.asarray(rng.uniform(-60, 60, (n, 3)).astype(np.float32))
    for _ in range(N_T + 1)
]
rings = [
    jnp.asarray(rng.integers(0, S, (n,)).astype(np.int32)) for _ in range(N_T + 1)
]
valids = [jnp.asarray(rng.random(n) < 0.94) for _ in range(N_T + 1)]
jax.block_until_ready(scans_xyz[-1])


@jax.jit
def ri_old(xyz, ring, valid):
    # r3: pre-sort rel + 5-operand stable sort
    rel = F._relative_time_at(
        xyz[:, 0], xyz[:, 1], jnp.arange(n, dtype=jnp.int32),
        *F._azimuth_scalars(xyz, valid, valid)
    )
    key = jnp.where(valid, ring, S)
    ops = jax.lax.sort(
        [key, xyz[:, 0], xyz[:, 1], xyz[:, 2], rel], num_keys=1, is_stable=True
    )
    ring_s = ops[0]
    bounds = jnp.searchsorted(ring_s, jnp.arange(S + 1, dtype=jnp.int32))
    counts = jnp.minimum((bounds[1:] - bounds[:-1]).astype(jnp.int32), W)
    packed = jnp.stack([ops[1], ops[2], ops[3], ops[4]], axis=-1)
    padded = jnp.concatenate([packed, jnp.zeros((W, 4), jnp.float32)], axis=0)
    grid = jax.vmap(
        lambda b: jax.lax.dynamic_slice(padded, (b, 0), (W, 4))
    )(bounds[:S])
    mask = jnp.arange(W, dtype=jnp.int32)[None, :] < counts[:, None]
    grid = jnp.where(mask[:, :, None], grid, 0.0)
    return grid[0, 0, 0] + counts[0]


@jax.jit
def ri_new(xyz, ring, valid):
    ri = F.build_range_image(
        xyz, ring, valid, S, W, F._azimuth_scalars(xyz, valid, valid)
    )
    return ri.xyz[0, 0, 0] + ri.count[0]


for name, fn in (("ri_old", ri_old), ("ri_new", ri_new)):
    out0 = fn(scans_xyz[0], rings[0], valids[0])

    def drive(fn=fn):
        o = None
        for i in range(1, N_T + 1):
            o = fn(scans_xyz[i], rings[i], valids[i])
        return o

    print(f"{name}: {timed(drive, lambda out0=out0: out0):.3f} ms", flush=True)
