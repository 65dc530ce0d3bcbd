"""voxel_downsample + brute-force knn vs plain numpy references."""

import numpy as np
import jax
import jax.numpy as jnp

from scaloam_tpu.ops import voxel


def test_voxel_downsample_centroids(rng):
    pts = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    mask = np.ones(500, bool)
    mask[450:] = False
    vs = 1.0
    out_xyz, out_mask, _ = voxel.voxel_downsample(
        jnp.array(pts), jnp.array(mask), vs, capacity=1024
    )
    # numpy reference: centroid per occupied voxel
    keys = {}
    for p in pts[:450]:
        k = tuple(np.floor(p / vs).astype(int))
        keys.setdefault(k, []).append(p)
    want = np.array([np.mean(v, axis=0) for v in keys.values()])
    got = np.asarray(out_xyz)[np.asarray(out_mask)]
    assert got.shape[0] == want.shape[0]
    got_s = got[np.lexsort(got.T)]
    want_s = want[np.lexsort(want.T)]
    np.testing.assert_allclose(got_s, want_s, atol=1e-5)


def test_voxel_downsample_group_key(rng):
    pts = np.zeros((10, 3), np.float32)  # all in one voxel
    groups = np.array([0] * 5 + [1] * 5, np.int32)
    mask = np.ones(10, bool)
    _, out_mask, _ = voxel.voxel_downsample(
        jnp.array(pts), jnp.array(mask), 1.0, capacity=16,
        group_key=jnp.array(groups),
    )
    assert int(np.asarray(out_mask).sum()) == 2  # one voxel per group


def test_knn_exact(rng):
    q = rng.normal(size=(100, 3)).astype(np.float32)
    t = rng.normal(size=(4096, 3)).astype(np.float32)
    tmask = np.ones(4096, bool)
    tmask[4000:] = False
    d, i = voxel.knn(
        jnp.array(q), jnp.ones(100, bool), jnp.array(t), jnp.array(tmask),
        k=5, tile=1024,
    )
    d, i = np.asarray(d), np.asarray(i)
    full = ((q[:, None, :] - t[None, :4000, :]) ** 2).sum(-1)
    want_i = np.argsort(full, axis=1)[:, :5]
    want_d = np.take_along_axis(full, want_i, axis=1)
    np.testing.assert_allclose(np.sort(d, axis=1), np.sort(want_d, axis=1), rtol=1e-3, atol=1e-4)
    # indices match where distances are distinct
    np.testing.assert_array_equal(np.sort(i, axis=1), np.sort(want_i, axis=1))


def test_knn_respects_masks(rng):
    q = rng.normal(size=(8, 3)).astype(np.float32)
    t = rng.normal(size=(64, 3)).astype(np.float32)
    d, _ = voxel.knn(
        jnp.array(q), jnp.zeros(8, bool), jnp.array(t), jnp.ones(64, bool),
        k=3, tile=64,
    )
    assert np.all(np.asarray(d) >= 1e29)  # masked queries get no neighbors


def test_compact(rng):
    mask = np.array([False, True, False, True, True, False])
    vals = np.arange(6, dtype=np.float32)[:, None]
    m, v = voxel.compact(jnp.array(mask), 4, jnp.array(vals))
    assert np.asarray(m).tolist() == [True, True, True, False]
    assert np.asarray(v)[:3, 0].tolist() == [1.0, 3.0, 4.0]


def test_packed_voxel_matches_generic(rng):
    pts = rng.uniform(-50, 50, size=(5000, 3)).astype(np.float32)
    mask = np.ones(5000, bool)
    mask[4800:] = False
    g_xyz, g_mask, _ = voxel.voxel_downsample(
        jnp.array(pts), jnp.array(mask), 0.5, capacity=8192
    )
    p_xyz, p_mask, _ = voxel.voxel_downsample_packed(
        jnp.array(pts), jnp.array(mask), 0.5, capacity=8192,
        xy_bits=10, z_bits=9,
    )
    a = np.asarray(g_xyz)[np.asarray(g_mask)]
    b = np.asarray(p_xyz)[np.asarray(p_mask)]
    assert len(a) == len(b)
    np.testing.assert_allclose(
        a[np.lexsort(a.T)], b[np.lexsort(b.T)], atol=1e-5
    )


def test_rows_voxel_matches_numpy_runs(rng):
    """voxel_downsample_rows vs a direct numpy run-grouping reference."""
    S, W = 4, 512
    # smooth-ish per-row curves so runs of same-voxel points actually occur
    t = np.linspace(0, 2 * np.pi, W, dtype=np.float32)
    img = np.stack(
        [
            np.stack([(5 + 0.02 * s) * np.cos(t), (5 + 0.02 * s) * np.sin(t),
                      0.1 * s * np.ones_like(t)], axis=-1)
            for s in range(S)
        ]
    ).astype(np.float32)
    img += rng.normal(0, 0.01, img.shape).astype(np.float32)
    mask = rng.uniform(size=(S, W)) > 0.1
    rel = rng.uniform(size=(S, W)).astype(np.float32)

    leaf, capacity, window = 0.2, 4096, 8
    xyz, m, ring, extra, _drop = voxel.voxel_downsample_rows(
        jnp.array(img), jnp.array(mask), leaf, capacity,
        extra=jnp.array(rel)[:, :, None], mean_window=window,
    )
    xyz, m, ring, extra = map(np.asarray, (xyz, m, ring, extra))

    # numpy reference: per row, split into runs of equal (x,y) voxel among
    # consecutive valid points; output mean of first <= window members.
    exp = []
    for s in range(S):
        j = 0
        while j < W:
            if not mask[s, j]:
                j += 1
                continue
            c0 = np.floor(img[s, j, :2] / leaf).astype(np.int64)
            k = j
            while (
                k + 1 < W and mask[s, k + 1]
                and np.all(np.floor(img[s, k + 1, :2] / leaf).astype(np.int64) == c0)
            ):
                k += 1
            members = img[s, j : min(j + window, k + 1)]
            mrel = rel[s, j : min(j + window, k + 1)]
            exp.append((s, members.mean(0), mrel.mean()))
            j = k + 1

    assert int(m.sum()) == len(exp)
    got = xyz[m]
    got_ring = ring[m]
    got_rel = extra[m][:, 0]
    for i, (s, e_xyz, e_rel) in enumerate(exp):
        assert got_ring[i] == s
        np.testing.assert_allclose(got[i], e_xyz, atol=1e-5)
        np.testing.assert_allclose(got_rel[i], e_rel, atol=1e-5)


def test_knn2_matches_general_path(rng):
    """The k=2 double-argmin path must agree with the general top-k path."""
    q = rng.normal(size=(128, 3)).astype(np.float32)
    t = rng.normal(size=(2048, 3)).astype(np.float32)
    tmask = rng.uniform(size=2048) > 0.1
    d2, i2 = voxel.knn(
        jnp.array(q), jnp.ones(128, bool), jnp.array(t), jnp.array(tmask),
        k=2, tile=512,
    )
    full = ((q[:, None, :] - t[None, :, :]) ** 2).sum(-1)
    full[:, ~tmask] = 1e30
    want_i = np.argsort(full, axis=1)[:, :2]
    want_d = np.take_along_axis(full, want_i, axis=1)
    np.testing.assert_allclose(np.asarray(d2), want_d, rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i2), want_i)


def test_ring_constrained_nn2(rng):
    """Top-2 per class vs a numpy reference, and column 0 vs the top-1 op."""
    from scaloam_tpu.ops import correspond

    Q, T = 64, 1024
    q = rng.normal(size=(Q, 3)).astype(np.float32) * 3
    t = rng.normal(size=(T, 3)).astype(np.float32) * 3
    tring = rng.integers(0, 8, size=T).astype(np.float32)
    tmask = rng.uniform(size=T) > 0.1
    qmask = rng.uniform(size=Q) > 0.1
    ring_ref = rng.integers(0, 8, size=Q).astype(np.float32)
    excl = rng.integers(0, T, size=Q).astype(np.int32)
    nearby = 2.5

    ds2, is2, do2, io2 = correspond.ring_constrained_nn2(
        jnp.array(q), jnp.array(qmask), jnp.array(ring_ref), jnp.array(excl),
        jnp.array(t), jnp.array(tmask), jnp.array(tring), nearby, tile=256,
    )
    ds1, is1, do1, io1 = correspond.ring_constrained_nn(
        jnp.array(q), jnp.array(qmask), jnp.array(ring_ref), jnp.array(excl),
        jnp.array(t), jnp.array(tmask), jnp.array(tring), nearby, tile=256,
    )
    np.testing.assert_allclose(np.asarray(ds2)[:, 0], np.asarray(ds1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(do2)[:, 0], np.asarray(do1), rtol=1e-4)

    full = ((q[:, None, :] - t[None, :, :]) ** 2).sum(-1)
    dr = tring[None, :] - ring_ref[:, None]
    same = (np.abs(dr) < 0.5) & (np.arange(T)[None, :] != excl[:, None]) & tmask
    other = (np.abs(dr) >= 0.5) & (np.abs(dr) <= nearby) & tmask
    for got_d, got_i, cls in ((ds2, is2, same), (do2, io2, other)):
        want = np.where(cls, full, 1e30)
        wi = np.argsort(want, axis=1)[:, :2]
        wd = np.take_along_axis(want, wi, axis=1)
        wd[~qmask] = 1e30
        np.testing.assert_allclose(np.asarray(got_d), wd, rtol=1e-3, atol=1e-4)
        ok = np.asarray(got_d) < 1e29
        np.testing.assert_array_equal(np.asarray(got_i)[ok], wi[ok])


def test_rows_voxel_overflow_decimates_proportionally(rng):
    """When runs exceed capacity, every ring keeps a budget proportional to
    its run count, decimated uniformly in azimuth — no ring is dropped
    wholesale (the failure mode of a plain first-capacity cut)."""
    S, W = 8, 512
    # every point its own voxel -> runs = valid points
    x = np.arange(W, dtype=np.float32) * 1.0
    img = np.stack(
        [np.stack([x, np.full(W, s, np.float32), np.zeros(W, np.float32)],
                  axis=-1) for s in range(S)]
    )
    mask = np.ones((S, W), bool)
    capacity = 1024  # 4096 runs -> 4x over budget
    xyz, m, ring, _, _drop = voxel.voxel_downsample_rows(
        jnp.array(img), jnp.array(mask), 0.5, capacity,
    )
    xyz, m, ring = map(np.asarray, (xyz, m, ring))
    kept_ring = ring[m].astype(int)
    # every ring survives with ~equal share
    counts = np.bincount(kept_ring, minlength=S)
    assert np.all(counts > 0)
    assert counts.max() - counts.min() <= 1
    # kept points are azimuth-uniform: consecutive kept x's step by ~4
    for s in range(S):
        xs = np.sort(xyz[m][kept_ring == s][:, 0])
        steps = np.diff(xs)
        assert np.all(steps >= 3.0) and np.all(steps <= 5.0)


def test_rows_voxel_under_capacity_keeps_everything(rng):
    S, W = 4, 128
    x = np.arange(W, dtype=np.float32)
    img = np.stack(
        [np.stack([x, np.full(W, s, np.float32), np.zeros(W, np.float32)],
                  axis=-1) for s in range(S)]
    )
    mask = np.ones((S, W), bool)
    xyz, m, ring, _, _drop = voxel.voxel_downsample_rows(
        jnp.array(img), jnp.array(mask), 0.5, 1024,
    )
    assert int(np.asarray(m).sum()) == S * W


def test_rows_voxel_pads_to_capacity_when_small():
    """ADVICE r1 (medium): when S*W < capacity the outputs must still be
    [capacity]-shaped (padded + masked), or downstream pytree shapes
    (OdometryState.last_surf) silently retrace."""
    S, W, capacity = 2, 64, 1024
    x = np.arange(W, dtype=np.float32)
    img = np.stack(
        [np.stack([x, np.full(W, s, np.float32), np.zeros(W, np.float32)],
                  axis=-1) for s in range(S)]
    )
    mask = np.ones((S, W), bool)
    xyz, m, ring, _, drop = voxel.voxel_downsample_rows(
        jnp.array(img), jnp.array(mask), 0.5, capacity,
    )
    assert xyz.shape == (capacity, 3)
    assert m.shape == (capacity,)
    assert ring.shape == (capacity,)
    assert int(np.asarray(m).sum()) == S * W
    assert not bool(np.asarray(m)[S * W:].any())
    assert int(drop) == 0


def test_rows_voxel_overflow_sparse_ring_keeps_a_slot():
    """ADVICE r1 (low): a ring with runs < total/capacity must not be
    dropped wholesale under overflow — every nonzero ring gets >= 1 slot."""
    S, W, capacity = 8, 512, 256
    x = np.arange(W, dtype=np.float32)
    img = np.stack(
        [np.stack([x, np.full(W, s, np.float32), np.zeros(W, np.float32)],
                  axis=-1) for s in range(S)]
    )
    mask = np.ones((S, W), bool)
    # ring 0 has a single valid point (1 run); the rest are dense.
    mask[0, 1:] = False
    xyz, m, ring, _, drop = voxel.voxel_downsample_rows(
        jnp.array(img), jnp.array(mask), 0.5, capacity,
    )
    m, ring = np.asarray(m), np.asarray(ring)
    kept = np.bincount(ring[m].astype(int), minlength=S)
    assert kept[0] >= 1  # sparse ring survives
    assert kept.sum() <= capacity
    total_runs = 1 + 7 * W
    assert int(drop) == total_runs - int(kept.sum())


def test_rows_voxel_dropped_count():
    S, W, capacity = 4, 512, 256
    x = np.arange(W, dtype=np.float32)
    img = np.stack(
        [np.stack([x, np.full(W, s, np.float32), np.zeros(W, np.float32)],
                  axis=-1) for s in range(S)]
    )
    mask = np.ones((S, W), bool)
    _, m, _, _, drop = voxel.voxel_downsample_rows(
        jnp.array(img), jnp.array(mask), 0.5, capacity,
    )
    assert int(drop) == S * W - int(np.asarray(m).sum())
    assert int(drop) > 0


def test_payload_matmuls_lower_exact():
    """ADVICE r1 (high), reworked in r3: the one-hot payload selections
    must carry coordinates/float-index channels bit-exactly through TPU
    matmuls. r2 used precision=HIGHEST (6 bf16 passes); r3 uses the
    bit-masked 3-way split (split3_f32 + exact_onehot_select, 3 passes,
    verified bit-exact on the real chip — CLAUDE.md r3 notes). CPU runs
    can't observe bf16 quantization, so pin the mechanism in the lowered
    HLO: the split's optimization_barrier must be present (it is also
    what keeps XLA from folding the three dots back into one bf16 pass)."""
    from scaloam_tpu.ops import correspond

    q = jnp.zeros((8, 3))
    t = jnp.zeros((64, 3))
    pl = jnp.zeros((64, 5))
    txt = jax.jit(
        lambda *a: voxel.knn2_payload(*a, tile=64)
    ).lower(q, jnp.ones(8, bool), t, jnp.ones(64, bool), pl).as_text()
    assert "optimization_barrier" in txt

    txt = jax.jit(
        lambda d, p: voxel.argmin_topk(d, 2, p)
    ).lower(jnp.zeros((8, 64)), jnp.zeros((8, 64, 3))).as_text()
    assert "optimization_barrier" in txt

    txt = jax.jit(
        lambda *a: correspond.ring_constrained_nn2_pts(*a, tile=64)
    ).lower(
        q, jnp.ones(8, bool), jnp.zeros(8), jnp.zeros(8, jnp.int32),
        t, jnp.ones(64, bool), jnp.zeros(64), 2.5,
    ).as_text()
    assert "optimization_barrier" in txt


def test_knn2_payload_float_index_roundtrip():
    """Float-encoded indices up to the production capacity (32768) must
    round-trip bit-exactly through the one-hot payload select."""
    rng = np.random.default_rng(3)
    T = 256
    t = rng.normal(size=(T, 3)).astype(np.float32) * 5
    q = t[rng.integers(0, T, size=32)] + 0.01
    # encode large index-like floats in the payload
    big = (np.arange(T, dtype=np.float32) + 32512.0)[:, None]
    pl = np.concatenate([t, big], axis=1).astype(np.float32)
    _, P = voxel.knn2_payload(
        jnp.array(q), jnp.ones(32, bool), jnp.array(t),
        jnp.ones(T, bool), jnp.array(pl), tile=128,
    )
    got = np.asarray(P[:, 0, 3])
    assert np.all(got == np.round(got))  # exact integers, no bf16 rounding


def test_split3_exact_onehot_select(rng):
    """split3_f32 must reconstruct f32 bit-exactly and exact_onehot_select
    must return payload rows unchanged — coords and float-encoded indices
    (up to 2^24) ride one-hot matmuls through bf16 MXU passes (the r2
    precision bug class: DEFAULT bf16 rounded them; HIGHEST fixed it at 6
    passes; the 3-way split is exact at 3)."""
    pay = np.concatenate(
        [
            rng.uniform(-120, 120, (512, 4)).astype(np.float32),
            rng.integers(0, 2**24, (512, 1)).astype(np.float32),
        ],
        axis=1,
    )
    x1, x2, x3 = voxel.split3_f32(jnp.asarray(pay))
    np.testing.assert_array_equal(
        np.asarray(x1) + np.asarray(x2) + np.asarray(x3), pay
    )
    hot = np.zeros((64, 512), bool)
    hot[np.arange(64), rng.integers(0, 512, 64)] = True
    sel = voxel.exact_onehot_select(
        "qm,mc->qc", jnp.asarray(hot), jnp.asarray(pay)
    )
    np.testing.assert_array_equal(np.asarray(sel), pay[np.argmax(hot, 1)])


def test_packed_downsample_shell_priority_truncation():
    """shell_bits: overflow beyond capacity drops the FARTHEST voxels
    first (the plain packed key is lexicographic in x, so truncation
    would otherwise cut an arbitrary x-band); under capacity the voxel
    set is unchanged."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    pts = rng.uniform(-80, 80, (20000, 3)).astype(np.float32)
    m = jnp.ones(20000, bool)
    x, ok, _ = voxel.voxel_downsample_packed(
        jnp.asarray(pts), m, 0.4, 4096, xy_bits=10, z_bits=9, shell_bits=2
    )
    kept = np.asarray(x)[np.asarray(ok)]
    assert len(kept) == 4096
    # the near ball survives: everything within the first two shells
    # (~51 m Chebyshev around the centroid) is kept preferentially
    cheb = np.abs(kept - pts.mean(0)).max(axis=1)
    assert np.median(cheb) < 45.0
    x2, ok2, _ = voxel.voxel_downsample_packed(
        jnp.asarray(pts), m, 0.4, 4096, xy_bits=10, z_bits=9
    )
    kept2 = np.asarray(x2)[np.asarray(ok2)]
    # plain key keeps an x-band instead (spatially biased drop)
    assert kept2[:, 0].max() < 0.0 < kept[:, 0].max()

    # no overflow -> identical voxel sets
    p2 = rng.uniform(-10, 10, (3000, 3)).astype(np.float32)
    m2 = jnp.ones(3000, bool)
    a, am, _ = voxel.voxel_downsample_packed(
        jnp.asarray(p2), m2, 0.4, 4096, shell_bits=2
    )
    b, bm, _ = voxel.voxel_downsample_packed(jnp.asarray(p2), m2, 0.4, 4096)
    sa = set(map(tuple, np.asarray(a)[np.asarray(am)].round(3).tolist()))
    sb = set(map(tuple, np.asarray(b)[np.asarray(bm)].round(3).tolist()))
    assert sa == sb
