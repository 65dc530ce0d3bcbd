"""Backend cost vs database/graph size on the REAL chip (VERDICT r3 task 4;
r5 extends to the 8192 tier the MulRan preset ships, VERDICT r4 item 2).

Measures, per capacity tier N in {256, 512, 2048, 4096, 8192}:
  - sc_detect ms: full retrieval (ring-key KNN over the PADDED N-slot
    table + 60-shift distance on the 10 candidates) — the per-keyframe
    1 Hz-cadenced query (detectLoopClosureID, Scancontext.cpp:336-427);
  - sc_append ms: descriptor append (donated in-place update);
  - pgo_optimize ms: whole-graph damped GN with chain-preconditioned CG at
    an N-node padded graph (the reference's 1 Hz iSAM2 tick).

Methodology: varying inputs chained through state, timed regions entered/
exited via real np.asarray fetches, best of 3 (CLAUDE.md traps). The 1 Hz
cadence verdict: each tier's (detect + optimize) must fit well inside
1000 ms — the reference's multi-km regime is ~2-4k keyframes
(laserPosegraphOptimization.cpp:89-93 growth; Riverside01 ~7 km at 1 m
gap).

Writes /tmp/backend_tiers_r4.json and prints a markdown table.
"""

import json
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
from scaloam_tpu.models import posegraph as pg
from scaloam_tpu.models import scancontext as scm
from scaloam_tpu.ops import se3
from scaloam_tpu.types import Pose

cfg = config.kitti_hdl64()
N_TIMED = 20
rng = np.random.default_rng(0)

TIERS = [256, 512, 2048, 4096, 8192]
if len(sys.argv) > 1:
    TIERS = [int(t) for t in sys.argv[1].split(",")]
rows = []


def timed(drive, warm):
    best = float("inf")
    for _ in range(3):
        np.asarray(warm())
        t0 = time.time()
        out = drive()
        np.asarray(out)
        best = min(best, (time.time() - t0) / N_TIMED)
    return best * 1e3


for tier in TIERS:
    sc_cfg = cfg.scancontext
    # --- SC DB at this tier, filled to ~tier ------------------------------
    db = scm.init_db(sc_cfg, initial=tier)
    descs = jnp.asarray(
        rng.uniform(0, 5, size=(tier, sc_cfg.num_ring, sc_cfg.num_sector)),
        jnp.float32,
    )
    # bulk-fill (one jit) instead of `tier` appends
    from scaloam_tpu.ops import scancontext as sc_ops

    db = scm.SCDatabase(
        descriptors=descs,
        ring_keys=jax.jit(sc_ops.ring_key)(descs),
        count=jnp.array(tier, jnp.int32),
    )
    queries = [
        jnp.asarray(
            rng.uniform(0, 5, size=(sc_cfg.num_ring, sc_cfg.num_sector)),
            jnp.float32,
        )
        for _ in range(N_TIMED + 1)
    ]
    jax.block_until_ready(queries[-1])
    out0 = scm.detect(db, queries[0], sc_cfg, True)
    jax.block_until_ready(out0[2])

    def drive_detect(db=db, queries=queries):
        out = None
        for q in queries[1:]:
            out = scm.detect(db, q, sc_cfg, True)
        return out[2]

    det_ms = timed(drive_detect, lambda out0=out0: out0[2])

    # --- append at this tier ---------------------------------------------
    # append_descriptor_jit DONATES its db: chain on a throwaway COPY so
    # the shared tier DB survives for the PGO section.
    def drive_append(db=db, queries=queries):
        d = scm.SCDatabase(
            jnp.array(db.descriptors), jnp.array(db.ring_keys),
            jnp.array(db.count),
        )
        for q in queries[1:]:
            d = scm.append_descriptor_jit(
                d._replace(count=jnp.minimum(d.count, tier - 1)), q
            )
        return d.ring_keys[0]

    app_ms = timed(drive_append, lambda db=db: jnp.array(db.ring_keys[0]))

    # --- PGO at this tier -------------------------------------------------
    pgo_cfg = config.PGOConfig(max_keyframes=tier, max_loops=max(64, tier // 8))
    graph = pg.init_graph(pgo_cfg, initial_nodes=tier)
    pose = Pose.identity()
    n_fill = tier - 8  # nearly full graph
    quats, transs = [pose.quat], [pose.trans]
    # random-walk chain built host-side, then loaded in one shot
    q_np = np.zeros((tier, 4), np.float32)
    t_np = np.zeros((tier, 3), np.float32)
    q_np[:, 0] = 1.0
    cur_q = np.array([1.0, 0, 0, 0])
    cur_t = np.zeros(3)
    for k in range(n_fill):
        dq = rng.normal(0, 0.02, 3)
        ang = np.linalg.norm(dq)
        axis = dq / max(ang, 1e-9)
        dquat = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
        w, x, y, z = cur_q
        a, b, c, d = dquat
        cur_q = np.array([
            w * a - x * b - y * c - z * d,
            w * b + x * a + y * d - z * c,
            w * c - x * d + y * a + z * b,
            w * d + x * c - y * b + z * a,
        ])
        cur_q /= np.linalg.norm(cur_q)
        cur_t = cur_t + rng.normal(0, 0.5, 3)
        q_np[k] = cur_q
        t_np[k] = cur_t
    # feed through add_keyframe_jit in a scan-free way: set tables directly
    poses_dev = Pose(jnp.asarray(q_np), jnp.asarray(t_np))
    rels_q = np.zeros((tier, 4), np.float32)
    rels_q[:, 0] = 1.0
    rels_t = np.zeros((tier, 3), np.float32)
    for k in range(1, n_fill):
        # rel = inv(T_{k-1}) T_k
        def qconj(q):
            return q * np.array([1, -1, -1, -1.0])

        def qmul(a, b):
            w1, x1, y1, z1 = a
            w2, x2, y2, z2 = b
            return np.array([
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            ])

        def qrot(q, v):
            qv = np.concatenate([[0.0], v])
            return qmul(qmul(q, qv), qconj(q))[1:]

        rq = qmul(qconj(q_np[k - 1]), q_np[k])
        rt = qrot(qconj(q_np[k - 1]), t_np[k] - t_np[k - 1])
        rels_q[k - 1] = rq
        rels_t[k - 1] = rt
    graph = graph._replace(
        poses=poses_dev,
        odom_poses=Pose(jnp.asarray(q_np), jnp.asarray(t_np)),
        odom_rel=Pose(jnp.asarray(rels_q), jnp.asarray(rels_t)),
        n_nodes=jnp.array(n_fill, jnp.int32),
    )
    # a few loops so the loop path is live
    for li in range(8):
        i = int(rng.integers(n_fill // 2, n_fill - 1))
        j = int(rng.integers(0, n_fill // 4))
        rel = se3.relative(
            Pose(jnp.asarray(q_np[i]), jnp.asarray(t_np[i])),
            Pose(jnp.asarray(q_np[j]), jnp.asarray(t_np[j])),
        )
        graph = pg.add_loop(graph, jnp.int32(i), jnp.int32(j), rel, n_loops=li)

    g0 = pg.optimize(graph, pgo_cfg)
    jax.block_until_ready(g0.poses.trans)

    # Big tiers: fewer chained optimizes per rep (a 8192-tier optimize can
    # approach ~1 s; 20x3 chained would dominate the tool's wall clock).
    n_opt = N_TIMED if tier <= 2048 else 6

    def drive_opt(graph=graph, pgo_cfg=pgo_cfg, n_opt=n_opt):
        g = graph
        for _ in range(n_opt):
            g = pg.optimize(g, pgo_cfg)
        return g.poses.trans

    def timed_opt(drive, warm, n):
        best = float("inf")
        for _ in range(3):
            np.asarray(warm())
            t0 = time.time()
            out = drive()
            np.asarray(out)
            best = min(best, (time.time() - t0) / n)
        return best * 1e3

    opt_ms = timed_opt(drive_opt, lambda g0=g0: g0.poses.trans, n_opt)

    cadence_ok = det_ms + opt_ms < 900.0
    rows.append(dict(tier=tier, sc_detect_ms=round(det_ms, 2),
                     sc_append_ms=round(app_ms, 2),
                     pgo_optimize_ms=round(opt_ms, 2),
                     one_hz_cadence_ok=bool(cadence_ok)))
    print(f"tier {tier}: detect {det_ms:.2f} ms  append {app_ms:.2f} ms  "
          f"optimize {opt_ms:.2f} ms  1Hz ok={cadence_ok}", file=sys.stderr)

print("\n| tier (keyframes) | SC detect ms | SC append ms | PGO optimize ms | 1 Hz cadence |")
print("|---|---|---|---|---|")
for r in rows:
    print(f"| {r['tier']} | {r['sc_detect_ms']} | {r['sc_append_ms']} | "
          f"{r['pgo_optimize_ms']} | {'ok' if r['one_hz_cadence_ok'] else 'EXCEEDED'} |")
with open("/tmp/backend_tiers_r5.json", "w") as f:
    json.dump(rows, f, indent=1)
print("wrote /tmp/backend_tiers_r5.json", file=sys.stderr)
