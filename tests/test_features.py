"""Feature extraction kernel vs the sequential numpy golden model."""

import numpy as np
import jax.numpy as jnp

from scaloam_tpu import config
from scaloam_tpu.ops import features
from scaloam_tpu.types import LidarScan
from scaloam_tpu.utils import synthetic

from golden_features import golden_extract


def _cloud_to_np(fc):
    m = np.asarray(fc.mask)
    return np.asarray(fc.xyz)[m]


def _sorted(pts):
    pts = np.asarray(pts, dtype=np.float64)
    return pts[np.lexsort((pts[:, 2], pts[:, 1], pts[:, 0]))]


def _match_fraction(a, b, tol=1e-4):
    """Fraction of rows of a that appear in b (within tol)."""
    if len(a) == 0:
        return 1.0
    d = np.abs(a[:, None, :] - b[None, :, :]).max(-1).min(1) if len(b) else np.ones(len(a))
    return float((d < tol).mean())


def setup_module():
    global SCAN, CFG
    world = synthetic.make_world(seed=1)
    SCAN = synthetic.simulate_scan(world, np.array([0.0, 0.0, 1.8]), 0.3, seed=2)
    CFG = config.kitti_hdl64()


def test_feature_parity_with_golden():
    g_sharp, g_lsharp, g_flat, g_lflat = golden_extract(SCAN)
    scan = LidarScan.from_numpy(SCAN, CFG.sensor.max_points)
    out = features.extract_features(scan, CFG)

    k_sharp = _cloud_to_np(out.sharp)
    k_lsharp = _cloud_to_np(out.less_sharp)
    k_flat = _cloud_to_np(out.flat)

    assert abs(len(k_sharp) - len(g_sharp)) <= 0.02 * max(len(g_sharp), 1)
    assert abs(len(k_lsharp) - len(g_lsharp)) <= 0.02 * max(len(g_lsharp), 1)
    assert abs(len(k_flat) - len(g_flat)) <= 0.02 * max(len(g_flat), 1)

    # Element-wise agreement. Ties tolerate more: near-equal curvatures flip
    # pick order between the kernel's parallel-subregion picks and the
    # golden's sequential scan (the documented boundary-only deviation),
    # cascading through suppression; f32-vs-f64 summation order adds to it.
    # The exact-HDL-64 ladder (1/3 deg upper block) produces more such ties
    # than a uniform ladder; measured agreement is ~0.978 sharp / 0.995
    # less-sharp with identical pick counts.
    assert _match_fraction(_sorted(k_sharp), _sorted(g_sharp[:, :3])) > 0.97
    assert _match_fraction(_sorted(k_lsharp), _sorted(g_lsharp[:, :3])) > 0.98
    assert _match_fraction(_sorted(k_flat), _sorted(g_flat[:, :3])) > 0.95


def test_less_flat_near_golden():
    *_, g_lflat = golden_extract(SCAN)
    scan = LidarScan.from_numpy(SCAN, CFG.sensor.max_points)
    out = features.extract_features(scan, CFG)
    k_lflat = _cloud_to_np(out.less_flat)
    assert len(k_lflat) > 0
    # sample: voxel centroids lie within half a voxel diagonal of a golden pt
    sample = k_lflat[:: max(1, len(k_lflat) // 1000)]
    d = np.sqrt(
        ((sample[:, None, :] - g_lflat[None, :, :3].astype(np.float32)) ** 2)
        .sum(-1)
        .min(1)
    )
    assert np.quantile(d, 0.99) < 0.2 * np.sqrt(3)


def test_feature_counts_sane():
    scan = LidarScan.from_numpy(SCAN, CFG.sensor.max_points)
    out = features.extract_features(scan, CFG)
    n_sharp = int(np.asarray(out.sharp.mask).sum())
    n_flat = int(np.asarray(out.flat.mask).sum())
    n_ls = int(np.asarray(out.less_sharp.mask).sum())
    assert 0 < n_sharp <= 2 * 6 * 64
    assert 0 < n_flat <= 4 * 6 * 64
    assert n_sharp <= n_ls
    # rings recorded
    rings = np.asarray(out.sharp.ring)[np.asarray(out.sharp.mask)]
    assert rings.min() >= 0 and rings.max() < 64


def test_rel_time_monotone_in_azimuth():
    scan = LidarScan.from_numpy(SCAN, CFG.sensor.max_points)
    out = features.extract_features(scan, CFG)
    ri = out.full
    m = np.asarray(ri.mask)
    rt = np.asarray(ri.rel_time)
    # within each ring, relative time increases with column (azimuth order)
    for r in [0, 20, 40]:
        vals = rt[r][m[r]]
        if len(vals) > 10:
            assert (np.diff(vals) > -1e-3).mean() > 0.99
            assert vals.min() > -0.1 and vals.max() < 1.1
