"""Curvature feature extraction — the scanRegistration stage as one jitted kernel.

Reference: src/scanRegistration.cpp (517 LoC). Per scan:
  1. NaN / near-range removal                      (:88-114,135-139)
  2. vertical angle -> ring id per lidar model     (:171-218)
  3. azimuth unwrap -> relative scan time          (:143-155,221-253)
  4. 11-point curvature                            (:269-279)
  5. per (ring, 6 azimuth subregions): greedy top-k by curvature with
     +-5-point neighbor suppression: 2 sharp + 20 less-sharp corners
     (curv > 0.1), 4 flat surf (curv < 0.1)        (:290-412)
  6. less-flat = all non-corner subregion points, voxel-filtered 0.2 m
     per ring                                      (:359-420)

TPU-native design (SURVEY.md §7): the dynamic per-ring vectors become a
dense range image [n_scans, W]; the greedy sorted-scan-with-suppression
becomes an equivalent iterated masked argmax/argmin (picking the best
unsuppressed candidate k times IS the greedy scan over a sorted list);
the per-point sequential `halfPassed` azimuth unwrap becomes an exclusive
cumulative-max, which is exactly the sticky one-way flip of the reference.

Deviation (documented): curvature windows and neighbor suppression are
clamped within each ring, where the reference computes them on the
ring-concatenated cloud so windows can straddle ring boundaries. Straddling
points are excluded from feature selection in the reference anyway
(selection range [start+5, end-6]), so selected features are unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from scaloam_tpu.config import SlamConfig
from scaloam_tpu.types import FeatureCloud, LidarScan, RangeImage, ScanFeatures
from scaloam_tpu.ops import voxel

_NEG = np.float32(-1e30)
_POS = np.float32(1e30)


# ---------------------------------------------------------------------------
# Ring id per lidar model (src/scanRegistration.cpp:171-218)
# ---------------------------------------------------------------------------


def _ring_id(xyz: jax.Array, lidar_type: str, n_scans: int):
    """Vertical angle -> (ring id, valid). C++ int() truncates toward zero."""
    angle = jnp.degrees(
        jnp.arctan2(xyz[:, 2], jnp.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2))
    )
    trunc = lambda v: jnp.trunc(v).astype(jnp.int32)
    if lidar_type == "VLP16":
        sid = trunc((angle + 15.0) / 2.0 + 0.5)
        ok = (sid >= 0) & (sid <= n_scans - 1)
    elif lidar_type == "HDL32":
        sid = trunc((angle + 92.0 / 3.0) * 3.0 / 4.0)
        ok = (sid >= 0) & (sid <= n_scans - 1)
    elif lidar_type == "HDL64":
        upper = trunc((2.0 - angle) * 3.0 + 0.5)
        lower = n_scans // 2 + trunc((-8.83 - angle) * 2.0 + 0.5)
        sid = jnp.where(angle >= -8.83, upper, lower)
        ok = (angle <= 2.0) & (angle >= -24.33) & (sid >= 0) & (sid <= 50)
    elif lidar_type == "OS1-64":
        sid = trunc((angle + 22.5) / 2.0 + 0.5)
        ok = (sid >= 0) & (sid <= n_scans - 1)
    else:
        raise ValueError(f"unknown lidar_type {lidar_type}")
    return jnp.clip(sid, 0, n_scans - 1), ok


# ---------------------------------------------------------------------------
# Azimuth unwrap -> relative time (src/scanRegistration.cpp:141-253)
# ---------------------------------------------------------------------------


def _azimuth_scalars(xyz: jax.Array, valid: jax.Array, flip_valid: jax.Array):
    """Scalar side of the sequential halfPassed unwrap: sweep start/end
    azimuths and the index of the first flip (all SCALARS, so the per-point
    part can be re-evaluated after the range-image sort and rel_time need
    not ride the sort as a payload operand — the sort is the feature
    stage's HBM cost center, tools/roofline.py).

    `valid` (range-filtered) picks start/end azimuths; `flip_valid`
    (also ring-filtered) gates the halfPassed flip, matching the
    reference's `continue` ordering."""
    n = xyz.shape[0]
    pi = jnp.pi
    ori_raw = -jnp.arctan2(xyz[:, 1], xyz[:, 0])

    first = jnp.argmax(valid)
    last = n - 1 - jnp.argmax(valid[::-1])
    start_ori = ori_raw[first]
    end_ori = ori_raw[last] + 2 * pi
    d = end_ori - start_ori
    end_ori = jnp.where(d > 3 * pi, end_ori - 2 * pi, jnp.where(d < pi, end_ori + 2 * pi, end_ori))

    o1 = ori_raw
    o1 = jnp.where(o1 < start_ori - pi / 2, o1 + 2 * pi, o1)
    o1 = jnp.where(o1 > start_ori + 3 * pi / 2, o1 - 2 * pi, o1)
    flip = (o1 - start_ori > pi) & flip_valid
    # Sticky flip, exclusive (the flipping point itself still uses
    # first-half): i is past the flip iff i > first flipped index.
    first_flip = jnp.argmax(flip)
    return start_ori, end_ori, first_flip, jnp.any(flip)


def _relative_time_at(x, y, idx, start_ori, end_ori, first_flip, any_flip):
    """Per-point half of the unwrap, evaluable in ANY order (idx is the
    original stream position, deciding halfPassed)."""
    pi = jnp.pi
    ori_raw = -jnp.arctan2(y, x)
    o1 = ori_raw
    o1 = jnp.where(o1 < start_ori - pi / 2, o1 + 2 * pi, o1)
    o1 = jnp.where(o1 > start_ori + 3 * pi / 2, o1 - 2 * pi, o1)
    o2 = ori_raw + 2 * pi
    o2 = jnp.where(o2 < end_ori - 3 * pi / 2, o2 + 2 * pi, o2)
    o2 = jnp.where(o2 > end_ori + pi / 2, o2 - 2 * pi, o2)
    half_passed = (idx > first_flip) & any_flip
    ori = jnp.where(half_passed, o2, o1)
    return (ori - start_ori) / (end_ori - start_ori)


# ---------------------------------------------------------------------------
# Range image build
# ---------------------------------------------------------------------------


def build_range_image(
    xyz: jax.Array, ring: jax.Array, valid: jax.Array,
    n_scans: int, width: int, rel_scalars,
) -> RangeImage:
    """Bucket stream-ordered points into [n_scans, width], preserving order
    (the reference's per-ring push_back, src/scanRegistration.cpp:253).

    TPU shape: ONE multi-operand sort on a UNIQUE packed key
    (ring << 17 | stream index) carrying only xyz (argsort + permutation
    gathers each re-lower to another sort on TPU). Unique keys make the
    sort order-preserving without is_stable, and rel_time is re-derived
    POST-sort from (x, y, stream index) + the azimuth scalars instead of
    riding the sort as a fifth operand — the sort's payload traffic is the
    feature stage's HBM cost center (tools/roofline.py). The sorted stream
    is ring-grouped and azimuth-ordered, so each image row is a CONTIGUOUS
    slice of it: placement is 65 dynamic row-slices (contiguous gathers run
    ~40x faster than irregular ones here) — no scatter at all. Ring
    boundaries come from a 65-query binary search on the sorted keys."""
    n = xyz.shape[0]
    assert n <= (1 << 17), "packed sort key holds 17 index bits"
    iota = jnp.arange(n, dtype=jnp.int32)
    key = (jnp.where(valid, ring, n_scans) << 17) | iota
    ops = jax.lax.sort(
        [key, xyz[:, 0], xyz[:, 1], xyz[:, 2]], num_keys=1
    )
    ring_s = (ops[0] >> 17).astype(jnp.int32)
    idx_s = ops[0] & jnp.int32((1 << 17) - 1)
    rel_s = _relative_time_at(ops[1], ops[2], idx_s, *rel_scalars)

    bounds = jnp.searchsorted(ring_s, jnp.arange(n_scans + 1, dtype=jnp.int32))
    counts = jnp.minimum((bounds[1:] - bounds[:-1]).astype(jnp.int32), width)

    packed = jnp.stack([ops[1], ops[2], ops[3], rel_s], axis=-1)  # [n, 4]
    padded = jnp.concatenate(
        [packed, jnp.zeros((width, 4), jnp.float32)], axis=0
    )  # slice past n lands in zeros
    grid = jax.vmap(
        lambda b: jax.lax.dynamic_slice(padded, (b, 0), (width, 4))
    )(bounds[:n_scans])  # [n_scans, width, 4]
    mask = jnp.arange(width, dtype=jnp.int32)[None, :] < counts[:, None]
    grid = jnp.where(mask[:, :, None], grid, 0.0)
    return RangeImage(
        xyz=grid[:, :, :3],
        mask=mask,
        rel_time=grid[:, :, 3],
        count=counts,
    )


# ---------------------------------------------------------------------------
# Curvature + suppression reach
# ---------------------------------------------------------------------------


def _curvature(img: jax.Array, radius: int = 5) -> jax.Array:
    """curv[r,j] = | sum_{|l|<=R} x[r,j+l] - (2R+1)*x[r,j] |^2 (the
    reference's 11-point stencil is R=5, src/scanRegistration.cpp:269-279;
    R = FeatureConfig.curvature_window). Edges are masked by the caller."""
    w = img.shape[1]
    wl = 2 * radius + 1
    csum = jnp.cumsum(jnp.pad(img, ((0, 0), (1, 0), (0, 0))), axis=1)
    # window sum over [j-R, j+R]: pad by R on both sides of csum index space
    padded = jnp.pad(csum, ((0, 0), (radius, radius), (0, 0)), mode="edge")
    win = padded[:, wl:] - padded[:, :-wl]  # [r, w+?] -> [r, w]
    win = win[:, :w]
    diff = win - float(wl) * img
    return jnp.sum(diff * diff, axis=-1)


def _suppression_reach(img: jax.Array, count: jax.Array, radius: int, gap_sq: float):
    """For each point, how far neighbor suppression extends right/left before
    hitting a range discontinuity (src/scanRegistration.cpp:332-355)."""
    w = img.shape[1]
    d = img[:, 1:] - img[:, :-1]
    g = jnp.sum(d * d, axis=-1)  # gap between j and j+1
    in_ring = jnp.arange(w - 1)[None, :] < (count[:, None] - 1)
    ok = (g <= gap_sq) & in_ring  # may suppress across gap j<->j+1
    okp = jnp.pad(ok, ((0, 0), (0, radius)))  # right lookahead
    right = jnp.zeros(img.shape[:2], jnp.int32)
    run = jnp.ones(img.shape[:2], bool)
    for l in range(radius):
        run = run & okp[:, l : l + w]
        right = right + run.astype(jnp.int32)
    okp2 = jnp.pad(ok, ((0, 0), (radius, 0)))
    left = jnp.zeros(img.shape[:2], jnp.int32)
    run = jnp.ones(img.shape[:2], bool)
    for l in range(radius):
        run = run & okp2[:, radius - 1 - l : radius - 1 - l + w]
        left = left + run.astype(jnp.int32)
    return left, right


# ---------------------------------------------------------------------------
# Main kernel
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract_features(scan: LidarScan, cfg: SlamConfig) -> ScanFeatures:
    sensor, feat = cfg.sensor, cfg.features
    S, W = sensor.n_scans, sensor.max_points_per_ring
    xyz, mask = scan.xyz, scan.mask

    # 1. NaN + near-range removal (removeClosedPointCloud, :88-114).
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    rng_sq = jnp.sum(xyz * xyz, axis=-1)
    valid = mask & finite & (rng_sq >= sensor.minimum_range**2)

    # 2-3. Ring id + azimuth-unwrap scalars on the stream.
    ring, ring_ok = _ring_id(xyz, sensor.lidar_type, S)
    rel_scalars = _azimuth_scalars(xyz, valid, valid & ring_ok)
    valid = valid & ring_ok

    # 4. Range image (rel_time re-derived post-sort from rel_scalars).
    ri = build_range_image(xyz, ring, valid, S, W, rel_scalars)
    img, count = ri.xyz, ri.count

    R = feat.curvature_window  # stencil radius (reference hardcodes 5)
    curv = _curvature(img, R)
    jj = np.arange(W)[None, :]

    left_ext, right_ext = _suppression_reach(
        img, count, feat.neighbor_suppress_radius, feat.neighbor_suppress_gap_sq
    )

    # Subregion boundaries (ring-local; :290-296).
    NSUB = feat.n_subregions
    L = count - (2 * R + 1)  # selectable span length
    j_sub = jnp.arange(NSUB)
    sp = R + (L[:, None] * j_sub[None, :]) // NSUB  # [S, NSUB]
    ep = R + (L[:, None] * (j_sub[None, :] + 1)) // NSUB - 1
    ring_sel_ok = L >= NSUB  # `if scanEnd - scanStart < 6 continue` (:292)

    n_sharp = feat.sharp_per_subregion
    n_corner = feat.less_sharp_per_subregion
    n_flat = feat.flat_per_subregion

    # Selection runs directly on the [S, W] grid: subregion membership is an
    # arithmetic comparison against the sp boundaries (NO gathers — TPU
    # irregular gathers are the former bottleneck here). All 6 subregions
    # pick in PARALLEL (the reference iterates them sequentially; the only
    # semantic difference is that a pick's +-5 suppression band reaches an
    # adjacent subregion one pick-step later — a boundary-only effect).
    eligible = (jj >= R) & (jj <= (R - 1 + L)[:, None]) & ring_sel_ok[:, None]

    use_pallas = feat.use_pallas_selection == "on" or (
        feat.use_pallas_selection == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from scaloam_tpu.ops.pallas import selection as psel

        corner_idx, corner_ok, flat_idx, flat_ok, labels = psel.select_features(
            curv, left_ext, right_ext, eligible,
            sp.astype(jnp.int32), ep.astype(jnp.int32),
            n_sub=NSUB,
            n_corner=feat.less_sharp_per_subregion,
            n_flat=feat.flat_per_subregion,
            curv_thr=feat.curvature_threshold,
        )
        n_sharp = feat.sharp_per_subregion
        n_corner = feat.less_sharp_per_subregion
        n_flat = feat.flat_per_subregion
        return _assemble_outputs(
            cfg, ri, img, count, corner_idx, corner_ok, flat_idx, flat_ok,
            labels, ring_sel_ok, jj, n_sharp,
        )

    # membership masks per subregion: sp_s <= j <= ep_s
    sub_masks = [
        (jj >= sp[:, s, None]) & (jj <= ep[:, s, None]) for s in range(NSUB)
    ]

    def one_pick(state, is_corner, p):
        suppressed, corner_idx, corner_ok, flat_idx, flat_ok = state
        if is_corner:
            cand = eligible & ~suppressed & (curv > feat.curvature_threshold)
            val = jnp.where(cand, curv, _NEG)
        else:
            cand = eligible & ~suppressed & (curv < feat.curvature_threshold)
            val = jnp.where(cand, -curv, _NEG)  # argmin via negated argmax
        js, fs_ = [], []
        for s in range(NSUB):
            v = jnp.where(sub_masks[s], val, _NEG)
            js.append(jnp.argmax(v, axis=-1))
            fs_.append(jnp.max(v, axis=-1) > _NEG)
        jstar = jnp.stack(js, axis=1)  # [S, NSUB]
        found = jnp.stack(fs_, axis=1)
        rows = np.arange(S)[:, None]
        lext = left_ext[rows, jstar]
        rext = right_ext[rows, jstar]
        lo = jnp.where(found, jstar - lext, -1)
        hi = jnp.where(found, jstar + rext, -1)
        # Reference quirk: the last flat pick of a subregion breaks out
        # BEFORE suppressing its neighborhood (src/scanRegistration.cpp:
        # 367-371), so its band must not be applied.
        if is_corner or p < n_flat - 1:
            band = jnp.zeros((S, W), bool)
            for s in range(NSUB):
                band = band | (
                    (jj >= lo[:, s, None]) & (jj <= hi[:, s, None])
                )
            suppressed = suppressed | band
        if is_corner:
            corner_idx = corner_idx.at[:, :, p].set(jstar)
            corner_ok = corner_ok.at[:, :, p].set(found)
        else:
            flat_idx = flat_idx.at[:, :, p].set(jstar)
            flat_ok = flat_ok.at[:, :, p].set(found)
        return suppressed, corner_idx, corner_ok, flat_idx, flat_ok

    state = (
        jnp.zeros((S, W), bool),  # cloudNeighborPicked
        jnp.zeros((S, NSUB, n_corner), jnp.int32),
        jnp.zeros((S, NSUB, n_corner), bool),
        jnp.zeros((S, NSUB, n_flat), jnp.int32),
        jnp.zeros((S, NSUB, n_flat), bool),
    )
    state = jax.lax.fori_loop(
        0, n_corner, lambda p, st: one_pick(st, True, p), state
    )
    for p in range(n_flat):  # n_flat is tiny; unroll to allow the p gate
        state = one_pick(state, False, p)
    _, corner_idx, corner_ok, flat_idx, flat_ok = state

    # Corner labels on the ring grid (for the less-flat exclusion), built
    # once from all picks (one small scatter).
    rows_flat = np.repeat(np.arange(S), NSUB * n_corner)
    labels = (
        jnp.zeros((S, W), bool)
        .at[rows_flat, corner_idx.reshape(-1)]
        .max(corner_ok.reshape(-1))
    )

    return _assemble_outputs(
        cfg, ri, img, count, corner_idx, corner_ok, flat_idx, flat_ok,
        labels, ring_sel_ok, jj, n_sharp,
    )


def _assemble_outputs(cfg, ri, img, count, corner_idx, corner_ok,
                      flat_idx, flat_ok, labels, ring_sel_ok, jj, n_sharp):
    feat = cfg.features
    S, W = img.shape[0], img.shape[1]
    rows3 = jnp.arange(S)[:, None, None]

    dropped = []  # valid rows lost to capacity truncation (ADVICE r1: the
    # stable-truncating compact silently drops the last elevation rings in
    # denser-than-sized environments — surface a loud runtime count).

    def to_cloud(idx, ok, capacity, first_k=None):
        if first_k is not None:
            idx, ok = idx[:, :, :first_k], ok[:, :, :first_k]
        g_xyz = img[rows3, idx].reshape(-1, 3)
        g_ring = jnp.broadcast_to(
            jnp.asarray(np.arange(S, dtype=np.float32))[:, None, None], idx.shape
        ).reshape(-1)
        g_rt = ri.rel_time[rows3, idx].reshape(-1)
        n_ok = jnp.sum(ok.reshape(-1).astype(jnp.int32))
        dropped.append(jnp.maximum(n_ok - capacity, 0))
        m, x, r, t = voxel.compact(ok.reshape(-1), capacity, g_xyz, g_ring, g_rt)
        return FeatureCloud(xyz=x, ring=jnp.where(m, r, -1.0), rel_time=t, mask=m)

    sharp = to_cloud(corner_idx, corner_ok, feat.max_sharp, first_k=n_sharp)
    less_sharp = to_cloud(corner_idx, corner_ok, feat.max_less_sharp)
    flat = to_cloud(flat_idx, flat_ok, feat.max_flat)

    # Less-flat: subregion points not labeled corner (label <= 0, :404-408),
    # voxel-filtered per ring at 0.2 m (:414-419). Grid-native run filter:
    # azimuth ordering makes same-voxel points consecutive along a row, so
    # no sort is needed at all (voxel_downsample_rows).
    R = feat.curvature_window
    sub_range = (
        (jj >= R) & (jj <= (count[:, None] - (R + 2))) & ring_sel_ok[:, None]
    )
    lf_mask = sub_range & ~labels & ri.mask
    dx, dm, dring, de, lf_dropped = voxel.voxel_downsample_rows(
        img, lf_mask, feat.less_flat_voxel_size, feat.max_less_flat,
        extra=ri.rel_time[:, :, None],
    )
    less_flat = FeatureCloud(
        xyz=dx, ring=jnp.where(dm, dring, -1.0), rel_time=de[:, 0], mask=dm
    )

    overflow = sum(dropped) + lf_dropped
    return ScanFeatures(
        sharp=sharp, less_sharp=less_sharp, flat=flat, less_flat=less_flat,
        full=ri, overflow=overflow,
    )
