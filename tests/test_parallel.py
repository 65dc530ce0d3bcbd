"""Sharded SC retrieval + distributed PGO on the 8-device virtual CPU mesh:
results must match the single-device implementations."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scaloam_tpu.config import PGOConfig, ScanContextConfig
from scaloam_tpu.models import posegraph as pg
from scaloam_tpu.models import scancontext as scm
from scaloam_tpu.ops import scancontext as sc_ops, se3
from scaloam_tpu.parallel import mesh as mesh_mod
from scaloam_tpu.parallel import pgo as pgo_par
from scaloam_tpu.parallel import sc_retrieval
from scaloam_tpu.types import Pose


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return mesh_mod.make_mesh(8)


def test_sharded_sc_retrieval_matches_single(mesh8, rng):
    cfg = ScanContextConfig(
        num_exclude_recent=4, num_candidates=3, max_keyframes=64,
        dist_threshold=0.5,
    )
    db = scm.init_db(cfg)
    # synthetic descriptors: structured + noise so distances are distinct
    for k in range(40):
        base = np.zeros((20, 60))
        base[:, (3 * k) % 60] = 5.0 + k * 0.1
        base += rng.uniform(0, 0.5, size=(20, 60))
        db = scm.append_descriptor(db, jnp.array(base, jnp.float32))
    # query resembling keyframe 7
    q = np.zeros((20, 60))
    q[:, 21] = 5.7
    q = jnp.array(q + rng.uniform(0, 0.3, size=(20, 60)), jnp.float32)

    # Full candidate coverage on both sides (single: all 64 slots; sharded:
    # all 8 slots per shard) so results must agree exactly. With fewer
    # candidates the sharded version evaluates a superset (8 shards x k) and
    # can only find a better-or-equal match.
    cfg_single = dataclasses.replace(cfg, num_candidates=64)
    cfg_shard = dataclasses.replace(cfg, num_candidates=8)
    idx1, yaw1, d1 = sc_ops.detect_loop(
        q, sc_ops.ring_key(q), db.descriptors, db.ring_keys, db.count, cfg_single
    )
    idx2, yaw2, d2 = sc_retrieval.detect_loop_sharded(
        mesh8, q, db.descriptors, db.ring_keys, db.count, cfg_shard
    )
    assert int(idx1) == int(idx2)
    assert abs(float(d1) - float(d2)) < 1e-5
    assert abs(float(yaw1) - float(yaw2)) < 1e-5

    # default settings: sharded is never worse
    _, _, d3 = sc_ops.detect_loop(
        q, sc_ops.ring_key(q), db.descriptors, db.ring_keys, db.count, cfg
    )
    _, _, d4 = sc_retrieval.detect_loop_sharded(
        mesh8, q, db.descriptors, db.ring_keys, db.count, cfg
    )
    assert float(d4) <= float(d3) + 1e-6


def test_sharded_pgo_matches_single(mesh8, rng):
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
        graph = pg.add_keyframe(graph, pose, jnp.float32(0.1), jnp.array(k % 3 == 0))
    z = se3.relative(poses[-1], poses[0])
    # perturb so the loop actually does work
    z = Pose(z.quat, z.trans + 0.3)
    graph = pg.add_loop(graph, jnp.int32(n - 1), jnp.int32(0), z)

    g1 = pg.optimize(graph, cfg, cg_iters=48)
    g2 = pgo_par.optimize_sharded(graph, cfg, mesh8, cg_iters=48)

    t1 = np.asarray(g1.poses.trans)[:n]
    t2 = np.asarray(g2.poses.trans)[:n]
    np.testing.assert_allclose(t2, t1, atol=5e-3)
    q1 = np.asarray(g1.poses.quat)[:n]
    q2 = np.asarray(g2.poses.quat)[:n]
    np.testing.assert_allclose(np.abs(np.sum(q1 * q2, axis=-1)), 1.0, atol=1e-4)
