"""gridmap.knn_grid unit tests: brute-force equivalence within reach and
the duplicate-cell regression (the 8-cell path used to collapse lo==hi
axes onto the same cell, returning the same map point k times — degenerate
covariance/plane fits downstream; caught by the golden scan-match oracle).
"""

import numpy as np
import jax.numpy as jnp

from scaloam_tpu.ops import gridmap


def _build(pts, gx=16, gy=16, gz=8, cell=2.0, cap=16, res=0.05):
    g = gridmap.init_grid(gx * gy * gz, cap)
    xyz = jnp.asarray(pts, jnp.float32)
    mask = jnp.ones(len(pts), bool)
    g = gridmap.insert(g, xyz, mask, gx, gy, gz, cell, res)
    return g, (gx, gy, gz, cell)


def _check_vs_brute(pts, queries, reach, k, cell):
    g, (gx, gy, gz, cell) = _build(pts, cell=cell)
    q = jnp.asarray(queries, jnp.float32)
    d, nb = gridmap.knn_grid(
        g, q, jnp.ones(len(queries), bool), gx, gy, gz, cell, reach, k
    )
    d = np.asarray(d)
    nb = np.asarray(nb)
    for i, qi in enumerate(queries):
        bd = np.sort(np.sum((pts - qi) ** 2, axis=1))
        within = bd[bd < reach * reach]
        m = min(k, len(within))
        # distances agree with brute force for every in-reach neighbor
        np.testing.assert_allclose(d[i, :m], within[:m], rtol=1e-5, atol=1e-5)
        # and the returned points are DISTINCT (duplicate-cell regression)
        got = nb[i, :m]
        uniq = np.unique(np.round(got, 6), axis=0)
        assert len(uniq) == m, (i, got)
        # slots past the real neighbors sit at the far sentinel
        if m < k:
            assert np.all(d[i, m:] > reach * reach)


def test_knn_grid_8cell_path_matches_brute_force():
    """2*reach <= cell_size: the 8-cell path (production mapping layout:
    cell 2.0, reach 1.0)."""
    rng = np.random.default_rng(0)
    pts = rng.uniform(2.0, 12.0, size=(300, 3)).astype(np.float32)
    queries = rng.uniform(3.0, 11.0, size=(40, 3)).astype(np.float32)
    _check_vs_brute(pts, queries, reach=1.0, k=5, cell=2.0)


def test_knn_grid_8cell_sparse_neighborhoods_no_duplicates():
    """Isolated points: with fewer than k in-reach neighbors the old code
    returned the same point k times with small distances, falsely passing
    the d5 < reach^2 gates."""
    pts = np.array(
        [[5.0, 5.0, 5.0], [5.3, 5.0, 5.0], [20.0, 20.0, 9.0]], np.float32
    )
    queries = np.array([[5.1, 5.05, 5.0]], np.float32)
    g, (gx, gy, gz, cell) = _build(pts, cell=2.0)
    d, nb = gridmap.knn_grid(
        g, jnp.asarray(queries), jnp.ones(1, bool), gx, gy, gz, cell,
        reach=1.0, k=5,
    )
    d = np.asarray(d)[0]
    assert d[0] < 1.0 and d[1] < 1.0
    # only TWO real neighbors exist: slots 2+ must be far sentinels,
    # so the sqDis[4] < 1.0 mapping gate correctly rejects this query
    assert np.all(d[2:] > 1.0)


def test_knn_grid_27cell_path_matches_brute_force():
    """cell_size < 2*reach <= 2*cell_size: the 27-cell path (ICP layout:
    cell 2.0, reach 2.0)."""
    rng = np.random.default_rng(1)
    pts = rng.uniform(2.0, 12.0, size=(300, 3)).astype(np.float32)
    queries = rng.uniform(4.0, 10.0, size=(30, 3)).astype(np.float32)
    _check_vs_brute(pts, queries, reach=2.0, k=5, cell=2.0)


def test_insert_count_matches_occupancy_under_aliasing():
    """Count/slot consistency invariant, including the torus-aliasing case:
    one batch carrying points of two absolute cells that alias to the same
    torus slot (z span beyond the grid period). The run's first point's
    cell wins the batch; count must equal the actually-written slots (the
    pre-r4 mixed-write path counted skipped positions)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    g = gridmap.init_grid(16 * 16 * 8, 4)
    for it in range(8):
        pts = rng.uniform(-14, 14, (256, 3)).astype(np.float32)
        if it >= 4:
            pts += np.array([40.0, 0, 0], np.float32)  # wrap the torus
        m = rng.random(256) < 0.9
        g = gridmap.insert(
            g, jnp.asarray(pts), jnp.asarray(m), 16, 16, 8, 2.0, 0.4
        )
        cnt = np.asarray(g.count)
        occupied = (np.abs(np.asarray(g.pts)) < 1e8).all(-1)
        for c in range(cnt.shape[0]):
            assert occupied[c, : cnt[c]].all(), (it, c)
        assert int(np.asarray(g.total)) == cnt.sum()
