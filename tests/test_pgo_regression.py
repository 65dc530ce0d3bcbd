"""Regression: optimize() on a REAL captured mid-run graph must stay
finite and near-fixed-point.

The fixture (tests/data_pgo_regression_graph.npz) is the exact 18-node
graph state captured on the TPU when a freshly compiled optimize() NaN'd
the whole trajectory (r4): at DEFAULT matmul precision the MXU rounds the
Hessian-block einsum operands to bf16, the mathematically-SPD diagonal
blocks go slightly indefinite, the chain preconditioner's Cholesky clamps
a negative pivot and the solve explodes ~1e13. All PGO einsums now run at
Precision.HIGHEST (models/posegraph.py, parallel/pgo.py). On CPU this
test is a plain fixed-point sanity check (CPU DEFAULT is already f32);
run on a TPU backend it reproduces the original failure without the fix.
"""

import os

import numpy as np
import jax.numpy as jnp

from scaloam_tpu import config
from scaloam_tpu.models import posegraph as pg
from scaloam_tpu.types import Pose

FIXTURE = os.path.join(os.path.dirname(__file__), "..",
                       "tests", "data_pgo_regression_graph.npz")


def test_optimize_finite_on_captured_graph():
    z = np.load(FIXTURE)
    g = pg.PoseGraph(
        poses=Pose(jnp.asarray(z["poses_q"]), jnp.asarray(z["poses_t"])),
        odom_poses=Pose(jnp.asarray(z["odom_q"]), jnp.asarray(z["odom_t"])),
        n_nodes=jnp.asarray(z["n_nodes"]),
        odom_rel=Pose(jnp.asarray(z["rel_q"]), jnp.asarray(z["rel_t"])),
        loop_i=jnp.asarray(z["loop_i"]),
        loop_j=jnp.asarray(z["loop_j"]),
        loop_rel=Pose(jnp.asarray(z["loopr_q"]), jnp.asarray(z["loopr_t"])),
        n_loops=jnp.asarray(z["n_loops"]),
        gps_z=jnp.asarray(z["gps_z"]),
        gps_valid=jnp.asarray(z["gps_valid"]),
        chain_break=jnp.asarray(z["chain_break"]),
    )
    n = int(z["n_nodes"])
    before = np.asarray(g.poses.trans[:n]).copy()
    out = pg.optimize(g, config.kitti_hdl64().pgo)
    t = np.asarray(out.poses.trans[:n])
    q = np.asarray(out.poses.quat[:n])
    assert np.isfinite(t).all() and np.isfinite(q).all()
    # the captured chain is warm-started near its optimum: the correction
    # must be tiny, not a 1e13 explosion
    assert np.abs(t - before).max() < 0.05
