"""Scaling-efficiency measurement for the sharded subsystems (BASELINE.md
target: >= 70% at N >= 2).

Runs the three sharded kernels — ScanContext retrieval, pose-graph GN,
grid-map k-NN — on meshes of 1, 2, 4, ... devices with PER-DEVICE problem
size held constant (weak scaling: the growth axes in SLAM are the keyframe
DB / factor count, which shard). Efficiency = T(1) / T(N) for N-times the
total problem.

On real multi-chip hardware run as-is. Without it, the 8-device virtual CPU
mesh exercises the same programs (collectives over shared memory), which
validates the harness but NOT ICI bandwidth — numbers from the CPU mesh are
for plumbing sanity only, and the tool labels them as such.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(fn, block, n=10, warmup=2):
    for _ in range(warmup):
        out = fn()
    block(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    block(out)
    return (time.time() - t0) / n * 1000.0


def main():
    import jax

    # Scaling needs MULTIPLE devices; a single (possibly tunneled) TPU chip
    # can't measure it — fall back to the virtual CPU mesh rather than
    # contending with whatever else uses the one chip.
    on_tpu = jax.default_backend() == "tpu" and len(jax.devices()) >= 2
    if not on_tpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            print("re-run with XLA_FLAGS=--xla_force_host_platform_device_count=8",
                  file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp

    from scaloam_tpu.config import PGOConfig, ScanContextConfig
    from scaloam_tpu.models import posegraph as pg
    from scaloam_tpu.ops import gridmap, scancontext as sc_ops, se3
    from scaloam_tpu.parallel import gridmap as pgrid
    from scaloam_tpu.parallel import pgo as ppgo
    from scaloam_tpu.parallel import sc_retrieval
    from scaloam_tpu.parallel.mesh import make_mesh
    from scaloam_tpu.types import Pose

    rng = np.random.default_rng(0)
    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    blk = lambda o: jax.block_until_ready(jax.tree.leaves(o)[0])

    PER_DEV_KF = 1024  # keyframes per device (weak scaling)
    results = {"backend": jax.default_backend(), "devices": n_avail,
               "meaningful_for_ici": on_tpu, "per_device_keyframes": PER_DEV_KF}

    for subsystem in ("sc_retrieval", "pgo", "gridmap_knn"):
        rows = []
        for n_dev in sizes:
            mesh = make_mesh(n_dev)
            K = PER_DEV_KF * n_dev
            if subsystem == "sc_retrieval":
                cfg = ScanContextConfig(max_keyframes=K)
                db = jnp.asarray(
                    rng.uniform(0, 10, size=(K, cfg.num_ring, cfg.num_sector))
                    .astype(np.float32))
                keys = sc_ops.ring_key(db)
                q = db[K // 2]
                cnt = jnp.array(K, jnp.int32)
                fn = lambda: sc_retrieval.detect_loop_sharded(
                    mesh, q, db, keys, cnt, cfg)
            elif subsystem == "pgo":
                cfg = PGOConfig(max_keyframes=K, max_loops=max(64, K // 16))
                graph = pg.init_graph(cfg)
                t = np.cumsum(rng.normal(0, 1, size=(K, 3)), 0).astype(np.float32)
                poses = Pose(
                    jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (K, 4)),
                    jnp.asarray(t))
                graph = graph._replace(
                    poses=poses, odom_poses=poses,
                    odom_rel=Pose(
                        jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (K, 4)),
                        jnp.asarray(np.diff(t, axis=0, append=t[-1:]))),
                    n_nodes=jnp.array(K, jnp.int32),
                )
                fn = lambda: ppgo.optimize_sharded(graph, cfg, mesh)
            else:
                GX = GY = 32
                GZ = 16
                n_cells = GX * GY * GZ
                grid = gridmap.init_grid(n_cells, 8)
                pts = rng.uniform(-30, 30, size=(PER_DEV_KF * n_dev * 4, 3)
                                  ).astype(np.float32)
                grid = gridmap.insert(
                    grid, jnp.asarray(pts), jnp.ones(len(pts), bool),
                    GX, GY, GZ, 2.0, 0.4)
                q = jnp.asarray(
                    rng.uniform(-25, 25, size=(8192, 3)).astype(np.float32))
                qm = jnp.ones(8192, bool)
                fn = lambda: pgrid.knn_grid_sharded(
                    mesh, grid, q, qm, GX, GY, GZ, 2.0, 1.0, 5)
            ms = bench(fn, blk)
            rows.append({"n_dev": n_dev, "total_kf": K, "ms": round(ms, 3)})
        base = rows[0]["ms"]
        for r in rows:
            r["weak_scaling_eff"] = round(base / r["ms"], 3)
        results[subsystem] = rows

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
