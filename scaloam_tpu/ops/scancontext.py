"""ScanContext descriptor + retrieval as dense TPU kernels.

Reference: include/scancontext/Scancontext.{h,cpp}.
  - Descriptor: 20 rings x 60 sectors polar grid, cell = max z (+2 m sensor
    height), radius 80 m (Scancontext.cpp:151-195).
  - Ring key = row means (:198-211); sector key = column means (:214-227).
  - Distance: best circular column shift of the candidate, cosine distance
    averaged over non-empty column pairs (distDirectSC :69-90), shift
    search seeded by sector-key alignment +-10% of 60 (:93-148).
  - Retrieval: ring-key KNN (nanoflann KD-tree, top 3) then per-candidate
    distance (:336-427).

TPU design (SURVEY.md C6/C7): scatter-max via segment_max builds the grid;
the KD-tree is replaced by one [K,20]x[20] matmul + top_k (exact — the
reference's tree is rebuilt only every 30 calls and so searches a stale DB;
we search the live one); the shift scan evaluates ALL 60 shifts as one
batched gather + einsum and then masks to the reference's search window.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scaloam_tpu.config import ScanContextConfig

_BIG = np.float32(1e10)


@functools.partial(jax.jit, static_argnames=("num_ring", "num_sector", "max_radius", "lidar_height"))
def make_descriptor(
    xyz: jax.Array,
    mask: jax.Array,
    num_ring: int = 20,
    num_sector: int = 60,
    max_radius: float = 80.0,
    lidar_height: float = 2.0,
) -> jax.Array:
    """Polar max-z grid [num_ring, num_sector] (makeScancontext, :151-195)."""
    x, y = xyz[:, 0], xyz[:, 1]
    z = xyz[:, 2] + lidar_height
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.degrees(jnp.arctan2(y, x)) % 360.0

    ring = jnp.clip(jnp.ceil(r / max_radius * num_ring), 1, num_ring) - 1
    sector = jnp.clip(jnp.ceil(theta / 360.0 * num_sector), 1, num_sector) - 1
    ok = mask & (r <= max_radius)
    n_bins = num_ring * num_sector
    bins = (ring * num_sector + sector).astype(jnp.int32)
    bins = jnp.where(ok, bins, n_bins)

    # Per-bin max WITHOUT segment_max: a duplicate-index scatter-max of a
    # 131k-point cloud into 1200 bins (~100 duplicates per bin) serializes
    # to ~100 ms of device time on this TPU — it was the real cost behind
    # the "SC detect p50 126 ms" misattribution in BENCH_SYSTEM_r03 (the
    # un-fetched make_and_append landed on the next fetch). Instead: one
    # two-key sort by (bin, z); each bin's EXACT max-z sits at its run's
    # last element, placed by a unique-index scatter.
    bin_s, z_s = jax.lax.sort([bins, jnp.where(ok, z, -jnp.inf)], num_keys=2)
    last = jnp.concatenate(
        [bin_s[1:] != bin_s[:-1], jnp.ones((1,), bool)]
    )
    scat = jnp.where(last & (bin_s < n_bins), bin_s, n_bins)
    grid = (
        jnp.zeros((n_bins,), jnp.float32)
        .at[scat]
        .set(z_s, mode="drop")
    )
    grid = jnp.where(jnp.isfinite(grid), grid, 0.0)  # NO_POINT -> 0
    return grid.reshape(num_ring, num_sector)


def ring_key(sc: jax.Array) -> jax.Array:
    """Rotation-invariant key: row means (:198-211). sc [..., R, S] -> [..., R]."""
    return jnp.mean(sc, axis=-1)


def sector_key(sc: jax.Array) -> jax.Array:
    """Variant key: column means (:214-227). sc [..., R, S] -> [..., S]."""
    return jnp.mean(sc, axis=-2)


def _all_shifts(sc: jax.Array) -> jax.Array:
    """[R, S] -> [S, R, S] where out[s] = circshift(sc, s) (cols moved right)."""
    S = sc.shape[-1]
    cols = jnp.arange(S)
    # circshift by s: out[:, (c + s) % S] = sc[:, c]  <=>  out[:, c] = sc[:, (c - s) % S]
    src = (cols[None, :] - cols[:, None]) % S  # [S_shift, S_col]
    return sc[:, src].transpose(1, 0, 2)


def sc_distance(sc1: jax.Array, sc2: jax.Array, search_ratio: float = 0.1
                ) -> Tuple[jax.Array, jax.Array]:
    """(min cosine distance, argmin shift) over the sector-key-seeded shift
    window (distanceBtnScanContext, :116-148)."""
    S = sc1.shape[-1]
    shifted = _all_shifts(sc2)  # [S, R, S]

    # Sector-key alignment over all shifts (fastAlignUsingVkey, :93-113).
    vk1 = sector_key(sc1)  # [S]
    vk2_shifted = sector_key(shifted)  # [S, S]
    vkey_diff = jnp.sum((vk1[None, :] - vk2_shifted) ** 2, axis=-1)
    align = jnp.argmin(vkey_diff)

    # Column-wise cosine distance for every shift (distDirectSC, :69-90).
    n1 = jnp.linalg.norm(sc1, axis=-2)  # [S] column norms
    n2 = jnp.linalg.norm(shifted, axis=-2)  # [S, S]
    dots = jnp.einsum("rc,src->sc", sc1, shifted)
    eff = (n1[None, :] > 0) & (n2 > 0)
    cossim = jnp.where(eff, dots / jnp.maximum(n1[None, :] * n2, 1e-20), 0.0)
    n_eff = jnp.maximum(jnp.sum(eff, axis=-1), 1)
    dist = 1.0 - jnp.sum(cossim, axis=-1) / n_eff  # [S]
    dist = jnp.where(jnp.sum(eff, axis=-1) > 0, dist, _BIG)

    # Restrict to +- round(0.5 * search_ratio * S) around the alignment.
    radius = round(0.5 * search_ratio * S)
    offs = jnp.arange(S)
    circ = jnp.minimum((offs - align) % S, (align - offs) % S)
    window = circ <= radius
    dist_w = jnp.where(window, dist, _BIG)
    best = jnp.argmin(dist_w)
    return dist_w[best], best


sc_distance_batch = jax.vmap(sc_distance, in_axes=(None, 0, None))


@functools.partial(jax.jit, static_argnames=("num_candidates",))
def ring_key_knn(
    query_key: jax.Array,  # [R]
    db_keys: jax.Array,  # [K, R]
    db_valid: jax.Array,  # [K] bool (counts exclude-recent etc.)
    num_candidates: int,
) -> Tuple[jax.Array, jax.Array]:
    """Exact ring-key KNN by brute-force L2 (replaces nanoflann)."""
    d = jnp.sum((db_keys - query_key[None, :]) ** 2, axis=-1)
    d = jnp.where(db_valid, d, _BIG)
    neg, idx = jax.lax.top_k(-d, num_candidates)
    return -neg, idx


@functools.partial(jax.jit, static_argnames=("cfg", "exclude_recent"))
def detect_loop(
    query_sc: jax.Array,  # [R, S]
    query_key: jax.Array,  # [R]
    db_sc: jax.Array,  # [K, R, S]
    db_keys: jax.Array,  # [K, R]
    db_count: jax.Array,  # scalar int: number of stored descriptors
    cfg: ScanContextConfig,
    exclude_recent: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full retrieval (detectLoopClosureID, :336-427).

    Returns (loop_idx [int32, -1 if none], yaw_rad, min_dist)."""
    K = db_sc.shape[0]
    idxs = jnp.arange(K)
    limit = db_count - (cfg.num_exclude_recent if exclude_recent else 0)
    valid = idxs < limit
    _, cand = ring_key_knn(query_key, db_keys, valid, cfg.num_candidates)
    cand_valid = cand < limit  # top_k pads with invalid when K small

    dists, shifts = sc_distance_batch(query_sc, db_sc[cand], cfg.search_ratio)
    dists = jnp.where(cand_valid, dists, _BIG)
    j = jnp.argmin(dists)
    min_dist = dists[j]
    nn_idx = cand[j]
    nn_shift = shifts[j]
    found = min_dist < cfg.dist_threshold
    loop_idx = jnp.where(found, nn_idx, -1)
    yaw = nn_shift.astype(jnp.float32) * (2.0 * jnp.pi / cfg.num_sector)
    return loop_idx, yaw, min_dist
