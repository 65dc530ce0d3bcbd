"""Voxel-grid downsampling and brute-force K-nearest-neighbor search.

TPU-native replacements for the reference's PCL VoxelGrid filters
(src/scanRegistration.cpp:414-418, src/laserMapping.cpp:129-130,788-802,
src/laserPosegraphOptimization.cpp:106-116) and its KD-trees
(pcl::KdTreeFLANN at src/laserOdometry.cpp:77-78, src/laserMapping.cpp:107-108;
nanoflann at include/scancontext/nanoflann.hpp).

Design notes (SURVEY.md §7):
- VoxelGrid -> lexsort on integer voxel coords + segment-mean (centroid
  semantics, like PCL). Fixed output capacity, masked.
- KD-tree K-NN -> tiled brute-force distance computation on the MXU
  (`dist^2 = |q|^2 + |t|^2 - 2 q.t`), with a running top-k merged across
  target tiles so the full [Q, T] distance matrix is never materialized.
  For the point counts in this workload (10^3-10^5) this is faster than any
  tree on TPU and exact, unlike voxel-hash approximations.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp

_BIG = np.float32(1e30)


# ---------------------------------------------------------------------------
# Voxel-grid downsample
# ---------------------------------------------------------------------------


def voxel_downsample(
    xyz: jax.Array,
    mask: jax.Array,
    voxel_size: float,
    capacity: int,
    extra: Optional[jax.Array] = None,
    group_key: Optional[jax.Array] = None,
    priority_center: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Centroid voxel filter with fixed output capacity.

    Args:
      xyz: [N, 3] points.
      mask: [N] validity.
      voxel_size: leaf size (PCL setLeafSize equivalent).
      capacity: max output points; overflow voxels are dropped (masked).
      extra: optional [N, E] per-point payload, centroid-averaged alongside.
      group_key: optional [N] int32; voxels are additionally keyed by this
        (used for the reference's per-ring less-flat filtering,
        src/scanRegistration.cpp:404-419).
      priority_center: optional [3]; when the occupied-voxel count exceeds
        `capacity`, retain voxels nearest this point first (instead of in
        arbitrary lexicographic order, which spatially biases the drop).

    Returns (xyz_out [capacity,3], mask_out [capacity], extra_out or None).
    """
    n = xyz.shape[0]
    coords = jnp.floor(xyz / voxel_size).astype(jnp.int32)
    # Push invalid points to a sentinel bucket sorted last.
    sentinel = jnp.int32(2**30)
    coords = jnp.where(mask[:, None], coords, sentinel)
    gk = (
        jnp.where(mask, group_key.astype(jnp.int32), sentinel)
        if group_key is not None
        else jnp.zeros((n,), jnp.int32)
    )

    if priority_center is not None:
        cc = jnp.floor(priority_center / voxel_size).astype(jnp.int32)
        dist = jnp.max(jnp.abs(coords - cc[None, :]), axis=-1)
        dist = jnp.where(mask, dist, sentinel)
        order = jnp.lexsort((coords[:, 2], coords[:, 1], coords[:, 0], dist, gk))
    else:
        order = jnp.lexsort((coords[:, 2], coords[:, 1], coords[:, 0], gk))
    coords_s = coords[order]
    gk_s = gk[order]
    xyz_s = xyz[order]
    mask_s = mask[order]

    prev_same = jnp.concatenate(
        [
            jnp.array([False]),
            jnp.all(coords_s[1:] == coords_s[:-1], axis=-1) & (gk_s[1:] == gk_s[:-1]),
        ]
    )
    new_voxel = (~prev_same) & mask_s
    seg_id = cumsum_blocked(new_voxel.astype(jnp.int32)) - 1  # first voxel -> 0
    seg_id = jnp.where(mask_s, seg_id, capacity)  # invalid -> overflow bin
    seg_id = jnp.minimum(seg_id, capacity)

    ones = mask_s.astype(jnp.float32)
    counts = jax.ops.segment_sum(ones, seg_id, num_segments=capacity + 1)[:capacity]
    sums = jax.ops.segment_sum(
        xyz_s * ones[:, None], seg_id, num_segments=capacity + 1
    )[:capacity]
    denom = jnp.maximum(counts, 1.0)[:, None]
    out_xyz = sums / denom
    out_mask = counts > 0

    out_extra = None
    if extra is not None:
        extra_s = extra[order]
        esums = jax.ops.segment_sum(
            extra_s * ones[:, None], seg_id, num_segments=capacity + 1
        )[:capacity]
        out_extra = esums / denom
    return out_xyz, out_mask, out_extra


def voxel_downsample_packed(
    xyz: jax.Array,
    mask: jax.Array,
    voxel_size: float,
    capacity: int,
    extra: Optional[jax.Array] = None,
    group_key: Optional[jax.Array] = None,
    group_bits: int = 0,
    xy_bits: int = 10,
    z_bits: int = 9,
    shell_bits: int = 0,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Fast-path centroid voxel filter: one packed int32 key, one sort.

    The generic voxel_downsample lexsorts four keys (four chained sorts);
    here the voxel coords are packed into a single int32 —
    [group | cx | cy | cz] with the given bit widths — so the sort runs
    once. Coords are centered on the masked centroid and CLIPPED to the bit
    range, so points beyond +-2^(bits-1) cells merge into border cells
    (callers use spans comfortably above the sensor range). z_bits=0 drops
    z from the key — exact for per-ring lidar geometry where a (ring, x, y)
    column holds a single surface sample (the less-flat filter).

    shell_bits > 0 prefixes the key with a Chebyshev-distance shell index
    (doubling radius per shell, from 1/8 of the clip range), so when the
    occupied-voxel count exceeds `capacity` the FARTHEST cells are dropped
    first instead of an arbitrary x-band (the key is lexicographic in
    x). Used by the keyframe-cloud filter, whose consumers (ScanContext at
    80 m, loop ICP cropped at 40 m) only care about near content.
    """
    n = xyz.shape[0]
    coords = jnp.floor(xyz / voxel_size).astype(jnp.int32)
    denom = jnp.maximum(jnp.sum(mask), 1)
    center = (
        jnp.sum(jnp.where(mask[:, None], coords, 0), axis=0) // denom
    )
    c = coords - center[None, :]

    def clipb(v, bits):
        half = 1 << (bits - 1)
        return jnp.clip(v + half, 0, (1 << bits) - 1)

    key = clipb(c[:, 0], xy_bits)
    key = (key << xy_bits) | clipb(c[:, 1], xy_bits)
    if z_bits > 0:
        key = (key << z_bits) | clipb(c[:, 2], z_bits)
    used_bits = xy_bits * 2 + z_bits
    if shell_bits > 0:
        cheb = jnp.max(jnp.abs(c), axis=-1)
        base = 1 << (xy_bits - 4)  # first shell radius: 1/8 of half-range
        shell = jnp.clip(
            jnp.ceil(jnp.log2(jnp.maximum(cheb, 1).astype(jnp.float32)
                              / base) + 1.0).astype(jnp.int32),
            0, (1 << shell_bits) - 1,
        )
        key = (shell << used_bits) | key
        used_bits += shell_bits
    if group_bits > 0:
        gk = jnp.clip(group_key.astype(jnp.int32), 0, (1 << group_bits) - 1)
        key = (gk << used_bits) | key
    key = jnp.where(mask, key, jnp.int32(2**31 - 1))

    # One multi-operand sort carrying the payloads (no post-sort random
    # gathers — irregular gathers and duplicate-index scatters are the slow
    # primitives on TPU). Per-voxel centroid = mean of (up to) the first 8
    # sorted entries, computed with a LOG-STEP segmented window scan
    # (3 shifted adds for window 8, not 7) and a single unique-index gather
    # at the segment starts. Voxels holding >8 points average their first 8
    # (rare at sane leafs; bias << leaf size).
    MEAN_WINDOW = 8
    # Validity rides the KEY when the packed range provably stays below
    # the invalid sentinel (no shell/group prefix: max key = 2^(2*xy+z)-1
    # < 2^31-1), dropping one sort operand — the sort is this filter's
    # cost center (same diet as build_range_image, tools/roofline.py).
    mask_in_key = shell_bits == 0 and group_bits == 0 and (
        2 * xy_bits + z_bits < 31
    )
    operands = [key, xyz[:, 0], xyz[:, 1], xyz[:, 2]]
    if not mask_in_key:
        operands.insert(1, mask.astype(jnp.int32))
    n_extra = 0
    if extra is not None:
        n_extra = extra.shape[1]
        operands += [extra[:, i] for i in range(n_extra)]
    sorted_ops = jax.lax.sort(operands, num_keys=1)
    key_s = sorted_ops[0]
    if mask_in_key:
        mask_s = key_s != jnp.int32(2**31 - 1)
    else:
        mask_s = sorted_ops[1].astype(bool)
        sorted_ops = [sorted_ops[0], *sorted_ops[2:]]

    prev_same = jnp.concatenate([jnp.array([False]), key_s[1:] == key_s[:-1]])
    new_voxel = (~prev_same) & mask_s

    # Segmented window sum, log-step doubling: after step k,
    # acc[i] = sum over [i, i+2^k) clipped to i's segment, f[i] = "the whole
    # [i, i+2^k) window continues i's segment". 3 steps give the
    # min(segment length, 8)-element window exactly.
    vals = jnp.stack(sorted_ops[1 : 4 + n_extra], axis=-1)
    vals = jnp.where(mask_s[:, None], vals, 0.0)
    sn = jnp.concatenate(
        [(key_s[1:] == key_s[:-1]) & mask_s[1:], jnp.zeros((1,), bool)]
    )  # sn[i]: i+1 continues i's segment

    def shift_up(a, w, fill=0):
        pad_shape = (w,) + a.shape[1:]
        return jnp.concatenate([a[w:], jnp.full(pad_shape, fill, a.dtype)])

    acc = vals
    cnt = jnp.ones((n,), jnp.float32)
    f = sn
    step = 1
    while step < MEAN_WINDOW:
        acc = acc + jnp.where(f[:, None], shift_up(acc, step), 0.0)
        cnt = cnt + jnp.where(f, shift_up(cnt, step), 0.0)
        if 2 * step < MEAN_WINDOW:
            f = f & shift_up(f, step, fill=False)
        step *= 2

    # Compact voxel starts: argsort for the start positions, then gather
    # only `capacity` rows. (A multi-operand sort carrying the window sums
    # measured SLOWER here — the capacity-row gather moves far less data
    # than payload-carrying the full array through a sort.)
    pos = np.arange(n, dtype=np.int32)
    start_pos = jnp.argsort(jnp.where(new_voxel, pos, n + pos))[:capacity]
    sp_c = jnp.minimum(start_pos, n - 1)
    is_real = new_voxel[sp_c] & (start_pos < n)
    cnt_g = jnp.maximum(cnt[sp_c], 1.0)[:, None]
    out = acc[sp_c] / cnt_g
    out_xyz = out[:, :3]
    out_extra = out[:, 3:] if extra is not None else None
    return out_xyz, is_real, out_extra


def voxel_downsample_rows(
    img: jax.Array,  # [S, W, 3] range-image points (azimuth-ordered rows)
    mask: jax.Array,  # [S, W]
    voxel_size: float,
    capacity: int,
    extra: Optional[jax.Array] = None,  # [S, W, E]
    mean_window: int = 8,
) -> Tuple[jax.Array, jax.Array, jax.Array, Optional[jax.Array]]:
    """Per-ring voxel filter exploiting range-image ordering — NO sorts.

    Points along a lidar ring are azimuth-ordered, so points sharing an
    (x, y) voxel form consecutive RUNS along the row: grouping is a
    neighbor-compare instead of a global sort, window means are log-step
    shifted adds along the row, and compaction is a unique-index scatter at
    positions from a cumsum. Replaces the reference's per-ring PCL
    VoxelGrid on the less-flat cloud (src/scanRegistration.cpp:404-419).

    Deviation (documented): a ring that leaves a voxel and re-enters it
    later emits one point per run rather than one per voxel — measured
    <0.2% of outputs on HDL-64 scans (runs/distinct = 1613/1611 per ring).

    Overflow policy: when the total run count exceeds `capacity`, each ring
    gets a slot budget proportional to its run count and decimates its runs
    uniformly in azimuth (keep every ceil(runs/budget)-th). Under capacity
    nothing is dropped. (A plain first-`capacity` cut would silently drop
    the LAST rings wholesale — a whole elevation band.)

    Returns (xyz [capacity, 3], mask [capacity], ring [capacity] float,
    extra [capacity, E] or None, dropped [] int32 — valid runs lost to
    overflow decimation, 0 when total <= capacity); outputs are ring-major
    ordered.
    """
    S, W = mask.shape
    n = S * W
    c = jnp.floor(img[:, :, :2] / voxel_size).astype(jnp.int32)
    same_as_prev = jnp.concatenate(
        [
            jnp.zeros((S, 1), bool),
            jnp.all(c[:, 1:] == c[:, :-1], axis=-1) & mask[:, 1:] & mask[:, :-1],
        ],
        axis=1,
    )
    new_run = mask & ~same_as_prev

    # Segmented window mean over the next <= mean_window run members
    # (log-step doubling; see voxel_downsample_packed).
    vals = img if extra is None else jnp.concatenate([img, extra], axis=-1)
    vals = jnp.where(mask[:, :, None], vals, 0.0)
    sn = jnp.concatenate([same_as_prev[:, 1:], jnp.zeros((S, 1), bool)], axis=1)

    def shift_up(a, w, fill=0):
        pad = jnp.full(a.shape[:1] + (w,) + a.shape[2:], fill, a.dtype)
        return jnp.concatenate([a[:, w:], pad], axis=1)

    acc = vals
    cnt = jnp.ones((S, W), jnp.float32)
    f = sn
    step = 1
    while step < mean_window:
        acc = acc + jnp.where(f[:, :, None], shift_up(acc, step), 0.0)
        cnt = cnt + jnp.where(f, shift_up(cnt, step), 0.0)
        if 2 * step < mean_window:
            f = f & shift_up(f, step, fill=False)
        step *= 2

    # Compact run starts (ring-major order) by per-ring cumsum position +
    # one unique-index scatter — no sort, no permutation gather. Slots are
    # budgeted per ring proportionally to its run count; over-budget rings
    # decimate uniformly in azimuth (see docstring).
    rwr = jnp.cumsum(new_run.astype(jnp.int32), axis=1) - 1  # run# within ring
    runs_r = jnp.sum(new_run.astype(jnp.int32), axis=1)  # [S]
    total = jnp.maximum(jnp.sum(runs_r), 1)
    # Slot budgets: under capacity every ring keeps all its runs. Under
    # overflow every nonzero ring gets >= 1 slot (a plain proportional
    # floor starves rings with runs_r < total/capacity — dropping a whole
    # elevation band, the exact failure this policy exists to avoid); the
    # remaining capacity - nnz slots split proportionally, so
    # sum(budget) <= nnz + (capacity - nnz) = capacity.
    nnz = jnp.sum((runs_r > 0).astype(jnp.int32))
    prop = 1 + ((capacity - nnz) * runs_r) // total
    budget = jnp.where(
        total <= capacity, runs_r, jnp.where(runs_r > 0, prop, 0)
    )
    dec = jnp.where(budget > 0, -(-runs_r // jnp.maximum(budget, 1)), 1)
    offs = jnp.cumsum(budget) - budget  # exclusive ring slot offsets
    keep = new_run & (budget > 0)[:, None] & (rwr % dec[:, None] == 0)
    slot = offs[:, None] + rwr // dec[:, None]  # < offs + budget by constr.
    oidx = jnp.where(keep, slot, capacity).reshape(-1)
    ring_ch = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.float32)[:, None], (S, W)
    ).reshape(-1)
    # Compact by ONE multi-operand sort on the slot key (dropped rows sort
    # last behind the `capacity` sentinel) — ~5x cheaper than the
    # equivalent [n -> capacity] row scatter on this TPU
    # (tools/micro_lessflat.py: 1.1 ms -> 0.2 ms at the HDL-64 shape).
    # Slots are unique and ascending ring-major, so sorted order preserves
    # the ring-major output ordering; unassigned slots compact away.
    av = acc.reshape(n, -1)
    ops = (
        [oidx]
        + [av[:, i] for i in range(av.shape[1])]
        + [cnt.reshape(-1), ring_ch]
    )
    s = jax.lax.sort(ops, num_keys=1)
    if n < capacity:
        # Keep the documented [capacity]-shaped contract when the input is
        # smaller than the output budget (pad rows are masked off).
        s = [jnp.pad(o, (0, capacity - n),
                     constant_values=capacity if i == 0 else 0)
             for i, o in enumerate(s)]
    got = s[0][:capacity] < capacity
    cols = [o[:capacity] for o in s[1:]]
    cnt_o = jnp.maximum(cols[-2], 1.0)[:, None]
    mean_o = jnp.stack(cols[:-2], axis=-1) / cnt_o
    out_xyz = mean_o[:, :3]
    out_extra = mean_o[:, 3:] if extra is not None else None
    dropped = jnp.sum(runs_r) - jnp.sum(keep.astype(jnp.int32))
    return out_xyz, got, cols[-1][:capacity], out_extra, dropped


def cumsum_blocked(v: jax.Array) -> jax.Array:
    """1-D inclusive cumsum via a blocked 2-D scan: rows of 128 lanes scan
    independently, then exclusive row offsets are added. ~3x cheaper than
    the direct 1-D cumsum lowering at 10^5 elements on this TPU
    (tools/micro_cumsum.py)."""
    n = v.shape[0]
    lanes = 128
    pad = (-n) % lanes
    vp = jnp.pad(v, (0, pad)) if pad else v
    m = vp.reshape(-1, lanes)
    within = jnp.cumsum(m, axis=1)
    rows = within[:, -1]
    offs = jnp.cumsum(rows) - rows
    return (within + offs[:, None]).reshape(-1)[:n]


def cummax_blocked(v: jax.Array) -> jax.Array:
    """1-D inclusive cummax via the same blocked 2-D scan as
    cumsum_blocked (row-wise cummax + exclusive row-offset max)."""
    n = v.shape[0]
    lanes = 128
    pad = (-n) % lanes
    lowest = (
        jnp.iinfo(v.dtype).min
        if jnp.issubdtype(v.dtype, jnp.integer)
        else -jnp.inf
    )
    vp = jnp.pad(v, (0, pad), constant_values=lowest) if pad else v
    m = vp.reshape(-1, lanes)
    within = jax.lax.cummax(m, axis=1)
    rows = within[:, -1]
    offs = jnp.concatenate(
        [jnp.full((1,), lowest, v.dtype), jax.lax.cummax(rows)[:-1]]
    )
    return jnp.maximum(within, offs[:, None]).reshape(-1)[:n]


def split3_f32(x: jax.Array):
    """Split f32 x into three bf16-exact f32 terms with x == x1 + x2 + x3
    bit-exactly (8+8+8 mantissa bits cover f32's 24; each residual is
    Sterbenz-exact). Used to make one-hot payload selects exact at DEFAULT
    (single-pass bf16) matmul cost x3 — HIGHEST costs 6 passes, and the
    one-hot side needs no splitting (0/1 is bf16-exact), so this halves the
    exact-select MXU work (the r2 precision fix cost ~0.45 ms/frame,
    tools/profile_ablate.py r3)."""
    # The split MUST be built with integer bit-masking, not convert pairs:
    # XLA's excess-precision pass (on by default) folds
    # convert(convert(x, bf16), f32) so `x - f32(bf16(x))` collapses to
    # zero and the whole split degenerates to ONE bf16 pass — measured on
    # this TPU as exactly the single-pass error (maxerr 2^24*2^-9), with
    # optimization barriers making no difference. Masking the low 16 bits
    # keeps the top 8 significand bits (= truncation to bf16, exactly
    # representable); each residual then holds the next 8, so three terms
    # cover f32's 24. Integer ops are opaque to the precision folding.
    def bf16_trunc(v):
        u = jax.lax.bitcast_convert_type(v, jnp.uint32)
        return jax.lax.bitcast_convert_type(
            u & np.uint32(0xFFFF0000), jnp.float32
        )

    x1 = bf16_trunc(x)
    r = x - x1  # exact: <= 16 significant bits remain
    x2 = bf16_trunc(r)
    x3 = r - x2  # exact and bf16-exact: <= 8 significant bits remain
    # Belt-and-braces: keep the three terms opaque so the algebraic
    # simplifier cannot fold dot(h,x1)+dot(h,x2)+dot(h,x3) into
    # dot(h, x1+x2+x3) (= one bf16 pass of x) either.
    return jax.lax.optimization_barrier((x1, x2, x3))


def exact_onehot_select(eq: str, hot: jax.Array, payload: jax.Array) -> jax.Array:
    """einsum(eq, hot, payload) that round-trips f32 payload values
    bit-exactly: the payload is 3-way bf16-split (see split3_f32) and the
    three DEFAULT matmuls' f32 partial sums reassemble exactly (each term
    lands on disjoint mantissa bits; exactly one hot entry per output)."""
    p1, p2, p3 = split3_f32(payload)
    h = hot.astype(jnp.float32)

    def mm(p):
        return jnp.einsum(eq, h, p, preferred_element_type=jnp.float32)

    return (mm(p1) + mm(p2)) + mm(p3)


def argmin_topk(
    d: jax.Array, k: int, payload: Optional[jax.Array] = None
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Ascending top-k by k iterated argmin compare-updates, with the
    payload rows selected via one-hot matmul instead of take_along_axis.

    On this TPU `lax.top_k` lowers to a sort and `take_along_axis` re-lowers
    the permutation gather to ANOTHER sort (CLAUDE.md); k argmin passes +
    one-hot einsums are measurably cheaper for small k over wide rows
    (tools/profile_gridknn.py: 4.05 -> 3.47 ms on the mapping candidate
    stage). Ties resolve to the lowest index, same as top_k.

    Args: d [Q, M] values; payload optional [Q, M, C] rows to carry.
    Returns (vals [Q, k], rows [Q, k, C] or None).
    """
    cols = jnp.arange(d.shape[1])[None, :]
    vals, rows = [], []
    dd = d
    # The payload is split ONCE outside the k-iteration (the split is the
    # VPU part; the per-iteration work is the three small matmuls).
    # NOTE (r4): batching the k selects into one [Q,k,M]x[Q,M,C] einsum to
    # cut payload re-reads measured 20% SLOWER on the real chip
    # (tools/ab_r4.py topk_old 1.59 vs topk_new 1.90 ms) — the per-k
    # skinny matmuls fuse with the argmin rounds; keep the per-k form.
    if payload is not None:
        p123 = split3_f32(payload)
    for _ in range(k):
        j = jnp.argmin(dd, axis=1)
        hot = cols == j[:, None]
        vals.append(jnp.min(dd, axis=1))
        if payload is not None:
            # exact select (coords + float index channels must round-trip
            # bit-exactly): 3 single-pass bf16 matmuls, see split3_f32.
            h = hot.astype(jnp.float32)
            terms = [
                jnp.einsum("qm,qmc->qc", h, p,
                           preferred_element_type=jnp.float32)
                for p in p123
            ]
            rows.append((terms[0] + terms[1]) + terms[2])
        dd = jnp.where(hot, _BIG, dd)
    return (
        jnp.stack(vals, axis=1),
        jnp.stack(rows, axis=1) if payload is not None else None,
    )


# ---------------------------------------------------------------------------
# Brute-force K-NN (the KD-tree replacement)
# ---------------------------------------------------------------------------


def _tile_top2(d: jax.Array, base: jax.Array):
    """Smallest two entries per row of d [Q, tile] by double argmin
    (cheaper than any sort/top_k lowering on TPU). Returns
    (d1, i1, d2, i2) with global indices offset by `base`."""
    j1 = jnp.argmin(d, axis=1)
    v1 = jnp.take_along_axis(d, j1[:, None], 1)[:, 0]
    cols = jnp.arange(d.shape[1])[None, :]
    d_wo = jnp.where(cols == j1[:, None], _BIG, d)
    j2 = jnp.argmin(d_wo, axis=1)
    v2 = jnp.take_along_axis(d_wo, j2[:, None], 1)[:, 0]
    return v1, base + j1, v2, base + j2


def _merge_top2(b1d, b1i, b2d, b2i, v1d, v1i, v2d, v2i):
    """Merge two per-row sorted pairs into the overall smallest two."""
    t = v1d < b1d
    f1d = jnp.where(t, v1d, b1d)
    f1i = jnp.where(t, v1i, b1i)
    # Runner-up candidates: the loser head and the winner's second.
    l1d = jnp.where(t, b1d, v1d)
    l1i = jnp.where(t, b1i, v1i)
    o2d = jnp.where(t, v2d, b2d)
    o2i = jnp.where(t, v2i, b2i)
    s = l1d < o2d
    return f1d, f1i, jnp.where(s, l1d, o2d), jnp.where(s, l1i, o2i)


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def knn(
    query: jax.Array,
    query_mask: jax.Array,
    target: jax.Array,
    target_mask: jax.Array,
    k: int,
    tile: int = 2048,
) -> Tuple[jax.Array, jax.Array]:
    """Exact k-nearest-neighbors by tiled brute force.

    Args:
      query: [Q, 3]; query_mask: [Q].
      target: [T, 3]; target_mask: [T]. T must be a multiple of `tile`
        (pad with masked points).
      k: neighbors per query.
      tile: target tile width (columns of the distance block).

    Returns:
      dists: [Q, k] squared distances (1e30 for missing neighbors),
      idx:   [Q, k] target indices.

    Replaces pcl::KdTreeFLANN nearestKSearch (src/laserOdometry.cpp:302,
    src/laserMapping.cpp:583,649). The distance block rides the MXU via
    the -2*q.t matmul; the running top-k keeps memory at O(Q*(tile+k)).
    """
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)  # [Q, 1]
    qn = jnp.shape(query)[0]
    tn = jnp.shape(target)[0]
    # Shrink the requested tile to fit (callers tune tile for the big
    # production capacities; small configs just use fewer/narrower tiles).
    while target.shape[0] % tile != 0:
        tile //= 2
    n_tiles = target.shape[0] // tile

    if k == 1:
        # top_k lowers to a sort-flavored custom call even for k=1; a plain
        # min/argmin compare-update per tile is much cheaper on the VPU.
        def body1(carry, i):
            best_d, best_i = carry
            tgt = jax.lax.dynamic_slice_in_dim(target, i * tile, tile, axis=0)
            tm = jax.lax.dynamic_slice_in_dim(target_mask, i * tile, tile, axis=0)
            t2 = jnp.sum(tgt * tgt, axis=-1)[None, :]
            cross = jnp.dot(query, tgt.T, preferred_element_type=jnp.float32)
            d = jnp.where(tm[None, :], q2 + t2 - 2.0 * cross, _BIG)
            j = jnp.argmin(d, axis=1)
            v = jnp.take_along_axis(d, j[:, None], 1)[:, 0]
            upd = v < best_d
            return (
                jnp.where(upd, v, best_d),
                jnp.where(upd, i * tile + j, best_i),
            ), None

        init1 = (jnp.full((qn,), _BIG, jnp.float32), jnp.zeros((qn,), jnp.int32))
        (bd, bi), _ = jax.lax.scan(body1, init1, jnp.arange(n_tiles))
        bd = jnp.where(query_mask, jnp.maximum(bd, 0.0), _BIG)
        return bd[:, None], bi[:, None]

    if k == 2:
        # Double argmin compare-update (no sorts; see k == 1 note).
        def body2(carry, i):
            b1d, b1i, b2d, b2i = carry
            tgt = jax.lax.dynamic_slice_in_dim(target, i * tile, tile, axis=0)
            tm = jax.lax.dynamic_slice_in_dim(target_mask, i * tile, tile, axis=0)
            t2 = jnp.sum(tgt * tgt, axis=-1)[None, :]
            cross = jnp.dot(query, tgt.T, preferred_element_type=jnp.float32)
            d = jnp.where(tm[None, :], q2 + t2 - 2.0 * cross, _BIG)
            v1d, v1i, v2d, v2i = _tile_top2(d, i * tile)
            carry = _merge_top2(b1d, b1i, b2d, b2i, v1d, v1i, v2d, v2i)
            return carry, None

        init2 = (
            jnp.full((qn,), _BIG, jnp.float32), jnp.zeros((qn,), jnp.int32),
            jnp.full((qn,), _BIG, jnp.float32), jnp.zeros((qn,), jnp.int32),
        )
        (b1d, b1i, b2d, b2i), _ = jax.lax.scan(body2, init2, jnp.arange(n_tiles))
        bd = jnp.stack([b1d, b2d], axis=1)
        bi = jnp.stack([b1i, b2i], axis=1)
        bd = jnp.where(query_mask[:, None], jnp.maximum(bd, 0.0), _BIG)
        return bd, bi

    def body(carry, i):
        best_d, best_i = carry
        tgt = jax.lax.dynamic_slice_in_dim(target, i * tile, tile, axis=0)
        tm = jax.lax.dynamic_slice_in_dim(target_mask, i * tile, tile, axis=0)
        t2 = jnp.sum(tgt * tgt, axis=-1)[None, :]  # [1, tile]
        cross = jnp.dot(query, tgt.T, preferred_element_type=jnp.float32)
        d = q2 + t2 - 2.0 * cross  # [Q, tile]
        d = jnp.where(tm[None, :], d, _BIG)
        # Merge tile's top-k with running top-k.
        tile_d, tile_j = jax.lax.top_k(-d, k)
        tile_d = -tile_d
        tile_i = tile_j + i * tile
        cat_d = jnp.concatenate([best_d, tile_d], axis=1)  # [Q, 2k]
        cat_i = jnp.concatenate([best_i, tile_i], axis=1)
        nd, nj = jax.lax.top_k(-cat_d, k)
        return (-nd, jnp.take_along_axis(cat_i, nj, axis=1)), None

    init = (
        jnp.full((qn, k), _BIG, jnp.float32),
        jnp.zeros((qn, k), jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
    best_d = jnp.where(query_mask[:, None], best_d, _BIG)
    best_d = jnp.maximum(best_d, 0.0)  # clamp catastrophic-cancellation negatives
    return best_d, best_i


def _tile_top2_payload(d: jax.Array, tgt_payload: jax.Array, cols: jax.Array):
    """Smallest two entries per row of d [Q, tile] by double argmin, with
    the winner ROWS of tgt_payload [tile, C] selected via one-hot matmul
    (MXU) instead of index bookkeeping + post-scan gathers. Returns
    (v1, p1 [Q, C], v2, p2).

    The payload rows carry exact coordinates and float-encoded indices (up
    to 2^24) that must round-trip bit-exactly through the one-hot select —
    exact_onehot_select (3-way bf16 split, 3 single-pass matmuls) gives
    that at half the MXU passes of Precision.HIGHEST. The distance
    cross-terms elsewhere stay DEFAULT (they only rank).

    The bit-mask split runs ONCE per tile, shared by the j1 and j2 selects
    (mirroring the argmin_topk hoist — the split is the VPU part)."""
    p123 = split3_f32(tgt_payload)

    def sel(hot):
        h = hot.astype(jnp.float32)
        terms = [
            jnp.einsum("qm,mc->qc", h, p, preferred_element_type=jnp.float32)
            for p in p123
        ]
        return (terms[0] + terms[1]) + terms[2]

    j1 = jnp.argmin(d, axis=1)
    v1 = jnp.min(d, axis=1)
    p1 = sel(cols == j1[:, None])
    dd = jnp.where(cols == j1[:, None], _BIG, d)
    j2 = jnp.argmin(dd, axis=1)
    v2 = jnp.min(dd, axis=1)
    p2 = sel(cols == j2[:, None])
    return v1, p1, v2, p2


def _merge_top2_payload(b, v):
    """Merge two per-row ascending (d, payload) pairs into the overall
    smallest two."""
    b1d, b1p, b2d, b2p = b
    v1d, v1p, v2d, v2p = v
    t = v1d < b1d
    f1d = jnp.where(t, v1d, b1d)
    f1p = jnp.where(t[:, None], v1p, b1p)
    l1d = jnp.where(t, b1d, v1d)
    l1p = jnp.where(t[:, None], b1p, v1p)
    o2d = jnp.where(t, v2d, b2d)
    o2p = jnp.where(t[:, None], v2p, b2p)
    s = l1d < o2d
    return f1d, f1p, jnp.where(s, l1d, o2d), jnp.where(s[:, None], l1p, o2p)


@functools.partial(jax.jit, static_argnames=("tile",))
def knn2_payload(
    query: jax.Array,  # [Q, 3]
    query_mask: jax.Array,  # [Q]
    target: jax.Array,  # [T, 3]
    target_mask: jax.Array,  # [T]
    payload: jax.Array,  # [T, C] rows carried with the winners
    tile: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """2-NN that returns the winners' PAYLOAD ROWS instead of indices.

    The index variant forces callers into post-scan `target[idx]` gathers
    (irregular gathers are slow here) and in-scan take_along_axis; carrying
    payload rows through one-hot MXU matmuls is ~20% faster end-to-end on
    the odometry sweeps (tools/profile_ringpass.py). Carry float payloads
    only (indices fit exactly as floats up to 2^24).

    Returns (d [Q, 2] ascending squared distances, P [Q, 2, C])."""
    while target.shape[0] % tile != 0:
        tile //= 2
    n_tiles = target.shape[0] // tile
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)
    qn = query.shape[0]
    C = payload.shape[1]
    cols = jnp.arange(tile)[None, :]

    def body(carry, i):
        tgt = jax.lax.dynamic_slice_in_dim(target, i * tile, tile, axis=0)
        tm = jax.lax.dynamic_slice_in_dim(target_mask, i * tile, tile, axis=0)
        pl = jax.lax.dynamic_slice_in_dim(payload, i * tile, tile, axis=0)
        t2 = jnp.sum(tgt * tgt, axis=-1)[None, :]
        cross = jnp.dot(query, tgt.T, preferred_element_type=jnp.float32)
        d = jnp.where(tm[None, :], q2 + t2 - 2.0 * cross, _BIG)
        v = _tile_top2_payload(d, pl, cols)
        return _merge_top2_payload(carry, v), None

    init = (
        jnp.full((qn,), _BIG), jnp.zeros((qn, C)),
        jnp.full((qn,), _BIG), jnp.zeros((qn, C)),
    )
    (d1, p1, d2, p2), _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
    d = jnp.stack([d1, d2], axis=1)
    d = jnp.where(query_mask[:, None], jnp.maximum(d, 0.0), _BIG)
    return d, jnp.stack([p1, p2], axis=1)


def nn1(
    query: jax.Array,
    query_mask: jax.Array,
    target: jax.Array,
    target_mask: jax.Array,
    tile: int = 2048,
) -> Tuple[jax.Array, jax.Array]:
    """1-NN convenience wrapper: returns ([Q] squared dist, [Q] index)."""
    d, i = knn(query, query_mask, target, target_mask, k=1, tile=tile)
    return d[:, 0], i[:, 0]


def pad_to_multiple(
    xyz: jax.Array, mask: jax.Array, multiple: int
) -> Tuple[jax.Array, jax.Array]:
    """Pad the point dim up to a multiple (masked padding)."""
    n = xyz.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return xyz, mask
    return (
        jnp.concatenate([xyz, jnp.zeros((pad, xyz.shape[1]), xyz.dtype)]),
        jnp.concatenate([mask, jnp.zeros((pad,), bool)]),
    )


def compact(
    mask: jax.Array, capacity: int, *arrays: jax.Array
) -> Tuple[jax.Array, ...]:
    """Stable-compact valid rows to the front, truncated/padded to capacity.

    Returns (new_mask, *compacted_arrays). The reference's dynamic
    push_back clouds become this. ONE multi-operand sort carries every
    payload column (argsort + each gather-by-permutation re-lowers to
    another sort on this TPU)."""
    n = mask.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    # Stable order: valid first, preserving index order.
    key = jnp.where(mask, iota, n + iota)
    cols = []
    layout = []  # (ndim, ncols, dtype) per array
    for a in arrays:
        if a.ndim == 1:
            cols.append(a)
            layout.append((1, 1, a.dtype))
        else:
            cols.extend(a[:, i] for i in range(a.shape[1]))
            layout.append((2, a.shape[1], a.dtype))
    s = jax.lax.sort([key] + cols, num_keys=1)
    pad = max(0, capacity - n)
    new_mask = s[0][:capacity] < n
    if pad:
        new_mask = jnp.pad(new_mask, (0, pad))
    outs = []
    i = 1
    for nd, nc, _ in layout:
        got = [
            jnp.pad(s[i + c][:capacity], (0, pad)) if pad else s[i + c][:capacity]
            for c in range(nc)
        ]
        i += nc
        out = got[0] if nd == 1 else jnp.stack(got, axis=-1)
        outs.append(jnp.where(_bcast(new_mask, out.ndim), out, 0))
    return (new_mask,) + tuple(outs)


def _bcast(mask: jax.Array, ndim: int) -> jax.Array:
    return mask.reshape(mask.shape + (1,) * (ndim - 1))
