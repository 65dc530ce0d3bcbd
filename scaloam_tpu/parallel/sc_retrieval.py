"""Sharded ScanContext retrieval: descriptor DB split over the mesh.

The reference's loop retrieval is O(N) tree search + candidate scan on one
CPU (Scancontext.cpp:336-427). Here the descriptor DB rows are sharded over
the `kf` mesh axis: each device runs exact ring-key KNN + the 60-shift
distance over its shard, then the shard winners are combined with one
all_gather (a few floats per device — ICI-trivial). Shard-local top-k is a
superset of the reference's global top-3 candidate policy, so retrieval
quality is strictly >= the reference's.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from scaloam_tpu.config import ScanContextConfig
from scaloam_tpu.ops import scancontext as sc_ops
from scaloam_tpu.parallel.mesh import KF_AXIS

_BIG = np.float32(1e10)


def detect_loop_sharded(
    mesh,
    query_sc: jax.Array,  # [R, S] replicated
    db_sc: jax.Array,  # [K, R, S] sharded on K
    db_keys: jax.Array,  # [K, R] sharded on K
    db_count: jax.Array,  # scalar (replicated)
    cfg: ScanContextConfig,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (loop_idx, yaw, dist) like ops.scancontext.detect_loop."""
    K = db_sc.shape[0]
    n_dev = mesh.shape[KF_AXIS]
    shard = K // n_dev

    def local(query_sc, query_key, db_sc_l, db_keys_l, db_count):
        my = jax.lax.axis_index(KF_AXIS)
        base = my * shard
        idxs = base + jnp.arange(shard)
        limit = db_count - cfg.num_exclude_recent
        valid = idxs < limit
        _, cand = sc_ops.ring_key_knn(
            query_key, db_keys_l, valid, cfg.num_candidates
        )
        cand_valid = (base + cand) < limit
        dists, shifts = sc_ops.sc_distance_batch(
            query_sc, db_sc_l[cand], cfg.search_ratio
        )
        dists = jnp.where(cand_valid, dists, _BIG)
        j = jnp.argmin(dists)
        local_best = jnp.stack(
            [dists[j], (base + cand[j]).astype(jnp.float32),
             shifts[j].astype(jnp.float32)]
        )
        allb = jax.lax.all_gather(local_best, KF_AXIS)  # [n_dev, 3]
        w = jnp.argmin(allb[:, 0])
        return allb[w]

    query_key = sc_ops.ring_key(query_sc)
    best = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(KF_AXIS), P(KF_AXIS), P()),
        out_specs=P(),
        check_vma=False,  # replication via all_gather+argmin, not inferable
    )(query_sc, query_key, db_sc, db_keys, db_count)

    min_dist = best[0]
    nn_idx = best[1].astype(jnp.int32)
    shift = best[2]
    found = min_dist < cfg.dist_threshold
    loop_idx = jnp.where(found, nn_idx, -1)
    yaw = shift * (2.0 * jnp.pi / cfg.num_sector)
    return loop_idx, yaw, min_dist
