"""Subprocess worker for the real multi-process distributed test.

Each process (spawned by tests/test_distributed.py) initializes
jax.distributed against a shared coordinator, builds the SAME seeded pose
graph + ScanContext DB, runs the factor-sharded PGO solve and the sharded
SC retrieval over the GLOBAL mesh (devices of every process; collectives
cross the process boundary via the CPU gloo backend — the DCN stand-in for
this environment), and asserts the results match its own single-device
reference. Exit code 0 = match.

Reference analog: the 4-process ROS graph crosses process boundaries on
every hop (launch/aloam_mulran.launch:30-33); here the cross-process hop is
the psum/all_gather inside the sharded backend solves.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    import jax

    # The axon plugin's sitecustomize force-sets jax_platforms; env alone
    # does not stick (CLAUDE.md). Must run on CPU before distributed init.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scaloam_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    n_dev = len(jax.devices())
    assert n_dev == nproc * len(jax.local_devices()), (
        n_dev, len(jax.local_devices())
    )

    import numpy as np
    import jax.numpy as jnp

    # Gloo's context handshake has a FIXED ~30 s GetKeyValue deadline that
    # starts when the first process EXECUTES its first collective. Cold
    # imports/compiles skew the two processes by more than that on this
    # 2-core host (observed: DEADLINE_EXCEEDED on cpu:gloo/0,1/...), so
    # (a) rendezvous at the coordinator with a generous timeout, then
    # (b) establish the gloo context with one tiny same-cost collective
    # while the processes are aligned.
    from jax._src import distributed as _dist_state

    _dist_state.global_state.client.wait_at_barrier(
        "worker_imports_done", timeout_in_ms=600_000
    )
    from jax.sharding import Mesh, PartitionSpec as P

    warm_mesh = Mesh(np.array(jax.devices()), ("w",))
    tiny = jax.shard_map(
        lambda x: jax.lax.psum(x, "w"),
        mesh=warm_mesh, in_specs=P("w"), out_specs=P(),
    )(jnp.ones((len(jax.devices()),), jnp.float32))
    assert float(np.asarray(tiny)[0]) == len(jax.devices())

    from scaloam_tpu.config import PGOConfig, ScanContextConfig
    from scaloam_tpu.models import posegraph as pg
    from scaloam_tpu.models import scancontext as scm
    from scaloam_tpu.ops import scancontext as sc_ops, se3
    from scaloam_tpu.parallel import pgo as pgo_par
    from scaloam_tpu.parallel import sc_retrieval
    from scaloam_tpu.types import Pose

    mesh = distributed.global_mesh()

    # --- distributed PGO: same seeded graph on every process ---------------
    rng = np.random.default_rng(1234)
    cfg = PGOConfig(max_keyframes=64, max_loops=8, gn_iterations=5)
    graph = pg.init_graph(cfg)
    n = 30
    pose = Pose.identity()
    poses = []
    for k in range(n):
        dq = se3.exp_so3(jnp.array(rng.normal(0, 0.05, 3), jnp.float32))
        dt = jnp.array(rng.normal(0, 0.5, 3), jnp.float32)
        pose = Pose(se3.quat_mul(pose.quat, dq), pose.trans + dt)
        poses.append(pose)
        graph = pg.add_keyframe(
            graph, pose, jnp.float32(0.1), jnp.array(k % 3 == 0)
        )
    z = se3.relative(poses[-1], poses[0])
    z = Pose(z.quat, z.trans + 0.3)
    graph = pg.add_loop(graph, jnp.int32(n - 1), jnp.int32(0), z)

    g1 = pg.optimize(graph, cfg, cg_iters=48)  # single-device reference
    g2 = pgo_par.optimize_sharded(graph, cfg, mesh, cg_iters=48)

    t1 = np.asarray(g1.poses.trans)[:n]
    t2 = np.asarray(g2.poses.trans)[:n]
    np.testing.assert_allclose(t2, t1, atol=5e-3)
    q1 = np.asarray(g1.poses.quat)[:n]
    q2 = np.asarray(g2.poses.quat)[:n]
    np.testing.assert_allclose(np.abs(np.sum(q1 * q2, axis=-1)), 1.0, atol=1e-4)
    print(f"[proc {pid}] sharded PGO matches single-device", flush=True)

    # --- sharded SC retrieval ----------------------------------------------
    rng = np.random.default_rng(77)
    sc_cfg = ScanContextConfig(
        num_exclude_recent=4, num_candidates=3, max_keyframes=64,
        dist_threshold=0.5,
    )
    db = scm.init_db(sc_cfg)
    for k in range(40):
        base = np.zeros((20, 60))
        base[:, (3 * k) % 60] = 5.0 + k * 0.1
        base += rng.uniform(0, 0.5, size=(20, 60))
        db = scm.append_descriptor(db, jnp.array(base, jnp.float32))
    q = np.zeros((20, 60))
    q[:, 21] = 5.7
    q = jnp.array(q + rng.uniform(0, 0.3, size=(20, 60)), jnp.float32)

    cfg_single = dataclasses.replace(sc_cfg, num_candidates=64)
    cfg_shard = dataclasses.replace(sc_cfg, num_candidates=64 // n_dev)
    idx1, yaw1, d1 = sc_ops.detect_loop(
        q, sc_ops.ring_key(q), db.descriptors, db.ring_keys, db.count,
        cfg_single,
    )
    idx2, yaw2, d2 = sc_retrieval.detect_loop_sharded(
        mesh, q, db.descriptors, db.ring_keys, db.count, cfg_shard
    )
    assert int(idx1) == int(idx2), (int(idx1), int(idx2))
    assert abs(float(d1) - float(d2)) < 1e-5
    assert abs(float(yaw1) - float(yaw2)) < 1e-5
    print(f"[proc {pid}] sharded SC retrieval matches single-device", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
