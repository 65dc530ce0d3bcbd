"""Pallas kernel: the greedy feature-selection loop in one fused program.

The XLA formulation of the per-(ring, subregion) greedy pick loop
(ops/features.py) issues ~24 sequential fusion groups, each paying
launch/HBM-roundtrip overhead on small [64, 2048] tensors. Here the whole
greedy selection runs inside a single Pallas program with all state
(curvature, suppression mask, suppression reach) resident in VMEM —
24 picks x 6 subregions of pure VPU work with zero HBM traffic between
steps.

Per-row dynamic gathers (left/right suppression reach at the picked index)
are expressed as one-hot masked reductions, which Mosaic vectorizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # python literal: jnp constants get captured by pallas kernels


def _make_kernel(S: int, W: int, NSUB: int, n_corner: int, n_flat: int,
                 curv_thr: float):
    def kernel(curv_ref, left_ref, right_ref, elig_ref, sp_ref, ep_ref,
               corner_idx_ref, corner_ok_ref, flat_idx_ref, flat_ok_ref,
               labels_ref, sup_ref):
        jj = jax.lax.broadcasted_iota(jnp.int32, (S, W), 1)
        curv = curv_ref[:]
        left = left_ref[:]
        right = right_ref[:]
        elig = elig_ref[:] > 0
        sup_ref[:] = jnp.zeros((S, W), jnp.int32)
        labels_ref[:] = jnp.zeros((S, W), jnp.int32)

        def pick(s, val):
            """One masked argmax in subregion s; returns (jstar [S], found [S])
            and applies the suppression band."""
            sub = (jj >= sp_ref[:, s][:, None]) & (jj <= ep_ref[:, s][:, None])
            v = jnp.where(sub, val, NEG)
            m = jnp.max(v, axis=1)
            found = m > NEG
            # first index attaining the max (match argmax semantics)
            is_max = (v == m[:, None]) & found[:, None]
            big = jnp.where(is_max, jj, W)
            jstar = jnp.min(big, axis=1)
            jstar_c = jnp.where(found, jstar, 0)
            onehot = jj == jstar_c[:, None]
            lext = jnp.max(jnp.where(onehot, left, 0), axis=1)
            rext = jnp.max(jnp.where(onehot, right, 0), axis=1)
            lo = jnp.where(found, jstar_c - lext, -1)
            hi = jnp.where(found, jstar_c + rext, -1)
            band = (jj >= lo[:, None]) & (jj <= hi[:, None])
            return jstar_c, found, band

        # Unrolled (Mosaic requires static store indices on the lane dim).
        for p in range(n_corner):
            avail = elig & (sup_ref[:] == 0) & (curv > curv_thr)
            val = jnp.where(avail, curv, NEG)
            for s in range(NSUB):
                jstar, found, band = pick(s, val)
                sup_ref[:] = jnp.maximum(sup_ref[:], band.astype(jnp.int32))
                onehot = (jj == jstar[:, None]) & found[:, None]
                labels_ref[:] = jnp.maximum(
                    labels_ref[:], onehot.astype(jnp.int32)
                )
                corner_idx_ref[:, s, p] = jstar
                corner_ok_ref[:, s, p] = found.astype(jnp.int32)
                # freshly suppressed points leave the pool for later s too
                val = jnp.where(band, NEG, val)

        for p in range(n_flat):
            avail = elig & (sup_ref[:] == 0) & (curv < curv_thr)
            val = jnp.where(avail, -curv, NEG)  # argmin via negated argmax
            for s in range(NSUB):
                jstar, found, band = pick(s, val)
                if p < n_flat - 1:
                    # last flat pick breaks before suppressing
                    # (src/scanRegistration.cpp:367-371)
                    sup_ref[:] = jnp.maximum(sup_ref[:], band.astype(jnp.int32))
                    val = jnp.where(band, NEG, val)
                flat_idx_ref[:, s, p] = jstar
                flat_ok_ref[:, s, p] = found.astype(jnp.int32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_sub", "n_corner", "n_flat", "curv_thr", "interpret"),
)
def select_features(
    curv: jax.Array,  # [S, W] f32
    left_ext: jax.Array,  # [S, W] int32
    right_ext: jax.Array,  # [S, W] int32
    eligible: jax.Array,  # [S, W] bool
    sp: jax.Array,  # [S, NSUB] int32
    ep: jax.Array,  # [S, NSUB] int32
    n_sub: int,
    n_corner: int,
    n_flat: int,
    curv_thr: float,
    interpret: bool = False,
):
    """Returns (corner_idx [S,NSUB,n_corner], corner_ok, flat_idx
    [S,NSUB,n_flat], flat_ok, labels [S,W] bool)."""
    S, W = curv.shape
    kernel = _make_kernel(S, W, n_sub, n_corner, n_flat, curv_thr)
    out_shapes = (
        jax.ShapeDtypeStruct((S, n_sub, n_corner), jnp.int32),
        jax.ShapeDtypeStruct((S, n_sub, n_corner), jnp.int32),
        jax.ShapeDtypeStruct((S, n_sub, n_flat), jnp.int32),
        jax.ShapeDtypeStruct((S, n_sub, n_flat), jnp.int32),
        jax.ShapeDtypeStruct((S, W), jnp.int32),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    ci, co, fi, fo, labels = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[vmem] * 6,
        out_specs=(vmem,) * 5,
        scratch_shapes=[pltpu.VMEM((S, W), jnp.int32)],
        interpret=interpret,
    )(
        curv, left_ext, right_ext, eligible.astype(jnp.int32), sp, ep
    )
    return ci, co > 0, fi, fo > 0, labels > 0
