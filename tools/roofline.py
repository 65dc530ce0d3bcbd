"""Roofline / MFU accounting for every headline stage (VERDICT r3 task 3).

Per jitted stage (features, odometry, mapping, SC detect, PGO optimize):
  - FLOPs + HBM bytes from XLA's compiled cost analysis,
  - measured ms/call on the real chip (chained loops over NEVER-repeated
    inputs; timed regions entered/exited via real np.asarray fetches —
    CLAUDE.md measurement traps),
  - implied TFLOP/s and GB/s, and the % of v5e peak for whichever bound
    binds (MXU f32 vs HBM bandwidth).

v5e (TPU v5 lite) single-chip peaks used:
  - MXU: 197 TFLOP/s bf16; f32 accumulate via 1 bf16 pass ~= same rate for
    DEFAULT-precision matmuls (operands rounded). We report vs the bf16
    peak — the FLOPs the MXU could do.
  - HBM: 819 GB/s.
(Public v5e specs; the point is the ORDER of the gap, not 2 decimal places.)

Output: a markdown table (stdout) for PARITY.md plus /tmp/roofline_r4.json.
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
from scaloam_tpu.models import mapping as mapping_mod
from scaloam_tpu.models import odometry as odometry_mod
from scaloam_tpu.models import posegraph as pg
from scaloam_tpu.ops import features, scancontext as sc_ops, se3
from scaloam_tpu.types import LidarScan, Pose

PEAK_FLOPS = 197e12  # bf16 MXU
PEAK_BYTES = 819e9  # HBM

cfg = config.kitti_hdl64()
N = 30

from tools.scan_cache import get_scans

scans = get_scans(3 + N)
device_scans = [LidarScan.from_numpy(s, cfg.sensor.max_points) for s in scans]
for d in device_scans:
    jax.block_until_ready(d.xyz)


def cost_of(jitted, *args):
    """(flops, bytes) from the compiled executable's cost analysis."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", -1)), float(
            ca.get("bytes accessed", -1)
        )
    except Exception as e:  # noqa: BLE001
        print(f"  cost_analysis failed: {e}", file=sys.stderr)
        return -1.0, -1.0


def timed(fn_drive, warm_fetch):
    """Best-of-3 chained loops of N calls over distinct inputs."""
    best = float("inf")
    for _ in range(3):
        np.asarray(warm_fetch())  # drain queue with a real fetch
        t0 = time.time()
        out = fn_drive()
        np.asarray(out)
        best = min(best, (time.time() - t0) / N)
    return best * 1e3  # ms


rows = []


def report(name, ms, flops, bts, note=""):
    tf = flops / (ms * 1e-3) / 1e12 if flops > 0 else float("nan")
    gb = bts / (ms * 1e-3) / 1e9 if bts > 0 else float("nan")
    pf = 100 * tf * 1e12 / PEAK_FLOPS
    pb = 100 * gb * 1e9 / PEAK_BYTES
    bound = "HBM" if pb >= pf else "MXU"
    rows.append(
        dict(stage=name, ms=round(ms, 3), gflops=round(flops / 1e9, 2),
             mbytes=round(bts / 1e6, 1), tflops_s=round(tf, 3),
             gb_s=round(gb, 1), pct_mxu=round(pf, 2), pct_hbm=round(pb, 2),
             bound=bound, note=note)
    )
    print(
        f"{name:14s} {ms:7.3f} ms  {flops / 1e9:8.2f} GF {bts / 1e6:8.1f} MB"
        f"  -> {tf:7.3f} TF/s ({pf:5.2f}% MXU)  {gb:6.1f} GB/s ({pb:5.2f}% HBM)"
        f"  bound={bound}",
        file=sys.stderr,
    )


# --- features ---------------------------------------------------------------
feat_j = features.extract_features  # already jitted
f0 = feat_j(device_scans[0], cfg)
jax.block_until_ready(f0.sharp.xyz)
fl, by = cost_of(feat_j, device_scans[0], cfg)


def drive_features():
    out = None
    for s in device_scans[3 : 3 + N]:
        out = feat_j(s, cfg)
    return out.sharp.xyz[0]


report("features", timed(drive_features, lambda: f0.sharp.xyz[0]), fl, by)

# --- odometry ---------------------------------------------------------------
feats_list = [feat_j(s, cfg) for s in device_scans]
jax.block_until_ready(feats_list[-1].sharp.xyz)
o_state = odometry_mod.init_state(cfg)
o_state, o_out = odometry_mod.odometry_step(o_state, feats_list[0], cfg)
fl, by = cost_of(odometry_mod.odometry_step, o_state, feats_list[0], cfg)


def drive_odo():
    global o_state
    out = None
    for f in feats_list[3 : 3 + N]:
        o_state, out = odometry_mod.odometry_step(o_state, f, cfg)
    return out.world.trans


report(
    "odometry", timed(drive_odo, lambda: o_out.world.trans), fl, by
)

# --- mapping ----------------------------------------------------------------
m_state = mapping_mod.init_state(cfg)
o2 = odometry_mod.init_state(cfg)
inputs = []
for f in feats_list:
    o2, oo = odometry_mod.odometry_step(o2, f, cfg)
    inputs.append((oo.world, f.less_sharp, f.less_flat))
m_state, m_out = mapping_mod.mapping_step(m_state, *inputs[0], cfg)
fl, by = cost_of(mapping_mod.mapping_step, m_state, *inputs[0], cfg)


def drive_map():
    global m_state
    out = None
    for w, c, s in inputs[3 : 3 + N]:
        m_state, out = mapping_mod.mapping_step(m_state, w, c, s, cfg)
    return out.pose.trans


report("mapping", timed(drive_map, lambda: m_out.pose.trans), fl, by)

# --- SC detect (batched 60-shift distance over the DB) ----------------------
from scaloam_tpu.models import scancontext as scm

sc_cfg = cfg.scancontext
mgr = scm.SCManager(sc_cfg)
rng = np.random.default_rng(0)
for k in range(64):
    d = jnp.asarray(
        rng.uniform(0, 5, size=(sc_cfg.num_ring, sc_cfg.num_sector)),
        jnp.float32,
    )
    mgr.save_descriptor(d)
# drive the jitted detect kernel directly with varying query descriptors
descs = [
    jnp.asarray(rng.uniform(0, 5, size=(sc_cfg.num_ring, sc_cfg.num_sector)),
                jnp.float32)
    for _ in range(N + 1)
]
jax.block_until_ready(descs[-1])
sc_out0 = scm.detect(mgr.db, descs[0], sc_cfg, True)
jax.block_until_ready(sc_out0[0])
fl, by = cost_of(scm.detect, mgr.db, descs[0], sc_cfg, True)


def drive_sc():
    out = None
    for q in descs[1:]:
        out = scm.detect(mgr.db, q, sc_cfg, True)
    return out[2]


report(
    f"sc_detect@{mgr.db.descriptors.shape[0]}",
    timed(drive_sc, lambda: sc_out0[2]), fl, by,
    note="256-tier DB",
)

# --- PGO optimize -----------------------------------------------------------
pgo_cfg = cfg.pgo
graph = pg.init_graph(pgo_cfg)
pose = Pose.identity()
for k in range(200):
    dq = se3.exp_so3(jnp.asarray(rng.normal(0, 0.02, 3), jnp.float32))
    dt = jnp.asarray(rng.normal(0, 0.5, 3), jnp.float32)
    pose = Pose(se3.quat_mul(pose.quat, dq), pose.trans + dt)
    graph = pg.add_keyframe(
        graph, pose, jnp.float32(0.0), jnp.asarray(False), n_nodes=k
    )
g0 = pg.optimize(graph, pgo_cfg)
jax.block_until_ready(g0.poses.trans)
fl, by = cost_of(pg.optimize, graph, pgo_cfg)


def drive_pgo():
    g = graph
    out = None
    for _ in range(N):
        g = pg.optimize(g, pgo_cfg)
        out = g
    return out.poses.trans


report(
    f"pgo_optimize@{graph.poses.trans.shape[0]}",
    timed(drive_pgo, lambda: g0.poses.trans), fl, by,
    note="chained warm-started solves; 256-node tier",
)

# --- output -----------------------------------------------------------------
print("\n| stage | ms | GFLOPs | MB | TFLOP/s | %MXU | GB/s | %HBM | bound |")
print("|---|---|---|---|---|---|---|---|---|")
for r in rows:
    print(
        f"| {r['stage']} | {r['ms']} | {r['gflops']} | {r['mbytes']} | "
        f"{r['tflops_s']} | {r['pct_mxu']} | {r['gb_s']} | {r['pct_hbm']} | "
        f"{r['bound']} |"
    )
with open("/tmp/roofline_r4.json", "w") as f:
    json.dump(rows, f, indent=1)
print("wrote /tmp/roofline_r4.json", file=sys.stderr)
