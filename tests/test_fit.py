"""Closed-form 3x3 eigensolver + plane fit vs numpy."""

import numpy as np
import jax.numpy as jnp

from scaloam_tpu.ops import fit


def test_eigh3x3_matches_numpy(rng):
    B = rng.normal(size=(64, 3, 3))
    A = (B @ B.transpose(0, 2, 1)).astype(np.float32)  # SPD
    vals, vmax = fit.eigh3x3(jnp.array(A))
    want_vals, want_vecs = np.linalg.eigh(A)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=2e-3, atol=1e-3)
    # eigenvector: compare up to sign, only when the top eigenvalue separated
    sep = want_vals[:, 2] > 1.5 * want_vals[:, 1]
    got = np.asarray(vmax)[sep]
    want = want_vecs[sep][:, :, 2]
    cos = np.abs(np.sum(got * want, axis=-1))
    assert np.all(cos > 0.999)


def test_eigh3x3_edge_detection():
    # points along a line -> lambda_max >> lambda_mid
    t = np.linspace(-1, 1, 5)
    d = np.array([0.6, 0.8, 0.0])
    pts = (t[:, None] * d[None, :]).astype(np.float32)[None]
    mean, cov = fit.neighborhood_cov(jnp.array(pts))
    vals, vmax = fit.eigh3x3(cov)
    vals = np.asarray(vals)[0]
    assert vals[2] > 3 * max(vals[1], 1e-9)
    assert abs(abs(np.asarray(vmax)[0] @ d) - 1.0) < 1e-3


def test_fit_plane(rng):
    n = np.array([0.0, 0.6, 0.8])
    d0 = -2.0
    # points on plane n.p + d0 = 0
    u = rng.normal(size=(8, 5, 3)).astype(np.float32)
    u -= (u @ n + d0)[..., None] * n  # project
    # ensure exact: p.n = -d0
    u -= ((u @ n + d0) / (n @ n))[..., None] * n
    un, nd, ok = fit.fit_plane(jnp.array(u))
    assert np.all(np.asarray(ok))
    got_n = np.asarray(un)
    sign = np.sign(got_n @ n)[:, None]
    np.testing.assert_allclose(got_n * sign, np.tile(n, (8, 1)), atol=1e-3)
    np.testing.assert_allclose(np.asarray(nd) * sign[:, 0], d0, rtol=1e-3)
