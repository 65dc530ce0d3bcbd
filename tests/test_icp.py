"""Grid-accelerated ICP equivalence + recovery."""

import numpy as np
import jax.numpy as jnp

from scaloam_tpu.ops import gridmap, icp, se3
from scaloam_tpu.types import Pose


def test_grid_icp_recovers_transform(rng):
    tgt = rng.uniform(-20, 20, size=(4096, 3)).astype(np.float32)
    w = np.array([0.0, 0.0, 0.08])
    t = np.array([0.8, -0.5, 0.2])
    C = Pose(se3.exp_so3(jnp.array(w, jnp.float32)), jnp.array(t, jnp.float32))
    src = np.asarray(se3.apply(se3.inverse(C), jnp.array(tgt)))

    GX = GY = 16
    GZ = 16
    grid = gridmap.init_grid(GX * GY * GZ, 32)
    grid = gridmap.insert(
        grid, jnp.array(tgt), jnp.ones(4096, bool), GX, GY, GZ, 4.0, 0.05
    )
    res = icp.icp_point2point_grid(
        jnp.array(src), jnp.ones(4096, bool), grid,
        GX, GY, GZ, 4.0, 4.0, Pose.identity(), iterations=15,
    )
    assert float(res.fitness) < 0.05, float(res.fitness)
    np.testing.assert_allclose(np.asarray(res.transform.trans), t, atol=0.05)
