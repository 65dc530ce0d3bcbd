"""Cell-sharded grid map k-NN matches the single-device version."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scaloam_tpu.ops import gridmap
from scaloam_tpu.parallel import gridmap as pgrid
from scaloam_tpu.parallel import mesh as mesh_mod

GX = GY = 16
GZ = 8
CS = 4.0


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return mesh_mod.make_mesh(8)


def test_sharded_knn_grid_matches(mesh8, rng):
    grid = gridmap.init_grid(GX * GY * GZ, 16)
    pts = rng.uniform(-25, 25, size=(4096, 3)).astype(np.float32)
    grid = gridmap.insert(
        grid, jnp.asarray(pts), jnp.ones(4096, bool), GX, GY, GZ, CS, 0.2
    )
    q = rng.uniform(-20, 20, size=(256, 3)).astype(np.float32)
    qm = jnp.ones(256, bool)

    d1, nn1 = gridmap.knn_grid(
        grid, jnp.asarray(q), qm, GX, GY, GZ, CS, reach=1.0, k=5
    )
    d2, nn2 = pgrid.knn_grid_sharded(
        mesh8, grid, jnp.asarray(q), qm, GX, GY, GZ, CS, reach=1.0, k=5
    )
    # rtol 3e-7: XLA fuses the (cand - q)^2 sums differently inside vs
    # outside shard_map — last-ulp f32 reassociation on large (beyond-
    # reach) distances, not a semantic difference.
    np.testing.assert_allclose(
        np.asarray(d2), np.asarray(d1), atol=1e-5, rtol=3e-7
    )
    # neighbor sets agree where distances are within reach
    close = np.asarray(d1) < 1.0
    np.testing.assert_allclose(
        np.sort(np.asarray(nn2)[close], axis=-1),
        np.sort(np.asarray(nn1)[close], axis=-1),
        atol=1e-5,
    )


def test_gridmap_insert_dedup(rng):
    grid = gridmap.init_grid(GX * GY * GZ, 16)
    pts = np.array([[1.0, 1.0, 1.0], [1.05, 1.0, 1.0], [3.0, 1.0, 1.0]],
                   np.float32)
    grid = gridmap.insert(
        grid, jnp.asarray(pts), jnp.ones(3, bool), GX, GY, GZ, CS, 0.2
    )
    # batch-internal dedup is the input voxel-downsample's job; all 3 land
    assert int(grid.total) == 3
    # re-inserting against existing content adds nothing (occupancy gate)
    grid = gridmap.insert(
        grid, jnp.asarray(pts), jnp.ones(3, bool), GX, GY, GZ, CS, 0.2
    )
    assert int(grid.total) == 3
    # a genuinely new point still inserts
    p_new = np.array([[10.0, 1.0, 1.0]], np.float32)
    grid = gridmap.insert(grid, jnp.asarray(p_new), jnp.ones(1, bool),
                          GX, GY, GZ, CS, 0.2)
    assert int(grid.total) == 4


def test_gridmap_staleness_eviction(rng):
    """A far-away insert claiming the same torus cell evicts stale content."""
    grid = gridmap.init_grid(GX * GY * GZ, 16)
    p1 = np.array([[1.0, 1.0, 1.0]], np.float32)
    grid = gridmap.insert(grid, jnp.asarray(p1), jnp.ones(1, bool),
                          GX, GY, GZ, CS, 0.2)
    # same torus cell: offset by GX * CS in x
    p2 = p1 + np.array([[GX * CS, 0.0, 0.0]], np.float32)
    grid = gridmap.insert(grid, jnp.asarray(p2), jnp.ones(1, bool),
                          GX, GY, GZ, CS, 0.2)
    # old content evicted, new stored
    d, nn = gridmap.knn_grid(
        grid, jnp.asarray(p2), jnp.ones(1, bool), GX, GY, GZ, CS,
        reach=1.0, k=1,
    )
    assert float(d[0, 0]) < 1e-6
    d_old, _ = gridmap.knn_grid(
        grid, jnp.asarray(p1), jnp.ones(1, bool), GX, GY, GZ, CS,
        reach=1.0, k=1,
    )
    # Stale content is excluded by distance (>= one torus period away —
    # the far-sentinel contract), far beyond any reach gate.
    assert float(d_old[0, 0]) >= (0.9 * GX * CS) ** 2


def test_gridmap_no_resurrection_after_reset(rng):
    """A cell reset by an eviction must CLEAR its leftover slots: when the
    trajectory later revisits the first region (loop closure), the
    pre-eviction points must not reappear in k-NN results."""
    grid = gridmap.init_grid(GX * GY * GZ, 16)
    # Two points in one cell at region A.
    pa = np.array([[1.0, 1.0, 1.0], [1.5, 1.0, 1.0]], np.float32)
    grid = gridmap.insert(grid, jnp.asarray(pa), jnp.ones(2, bool),
                          GX, GY, GZ, CS, 0.2)
    # Region B (one torus period away) claims the same cell with ONE point:
    # slot 1 would keep pa[1] without the reset-clear.
    pb = pa[:1] + np.array([[GX * CS, 0.0, 0.0]], np.float32)
    grid = gridmap.insert(grid, jnp.asarray(pb), jnp.ones(1, bool),
                          GX, GY, GZ, CS, 0.2)
    # Revisit region A: no stored point may be within reach.
    d, _ = gridmap.knn_grid(
        grid, jnp.asarray(pa), jnp.ones(2, bool), GX, GY, GZ, CS,
        reach=1.0, k=2,
    )
    assert float(np.min(np.asarray(d))) > 1.0  # nothing within reach^2
