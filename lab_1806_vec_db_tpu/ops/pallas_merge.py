"""Pallas sorted-beam merge: bitonic compare-exchange on lane rotates.

The lock-step beam search (ops/beam.py) merges a sorted (B, ef) beam with
an unsorted (B, EL) fresh-candidate tile every iteration.  As
`lax.top_k(-concat, ef)` that merge measured ~2.4 ms of the ~5 ms
iteration at B=1000/ef=120/EL=128 (v5e) — the XLA TPU sort materializes
every compare-exchange stage through HBM.  A pure-XLA bitonic network is
no better (~10.6 ms standalone: the (B, n/2j, 2, j) reshapes are lane
relayouts).  Here the whole merge runs inside one Pallas kernel on
in-register lane rotates (`pltpu.roll`):

1. bitonic-sort the fresh tile DESCENDING by (d, rank) — descending ⇒ no
   reverse step is needed before the merge;
2. pad both sides to W = max(EFP, ELP) lanes and run ONE elementwise
   compare-exchange between the ascending beam and the descending tile
   (the j=W stage of a 2W bitonic merge, with no roll: the halves are
   separate arrays).  By the bitonic property every element of the
   resulting low half <= every element of the high half, so the ef best
   live entirely in the low half;
3. finish with an ascending bitonic merge of the low half (log2(W) roll
   stages) and emit the first ef lanes.

Keys compare lexicographically on (distance, original position), which
reproduces `lax.top_k`'s stable tie order exactly (ties break toward the
existing beam) — the output is bit-identical to the top_k formulation for
all finite entries (the inf/-1 tail is normalized by the caller either
way).  Position ranks double as tie-breakers and make every key strictly
distinct, so the compare-exchange needs no equal-case handling; the
expanded flag rides in the rank's LOW BIT (rank << 1 | e — ranks stay
distinct and order-preserving), so only THREE lanes of state (d, i, re)
move through the exchanges.

Distances stay exact f32 (no bit-packing of the sort key — low mantissa
bits are result data here, unlike the scan kernel's packed survivors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BQ = 128  # query rows per grid block


def _lane_iota(n: int) -> jax.Array:
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)


def _cmpx(vals, j: int, keep_hi, roll=pltpu.roll):
    """One compare-exchange stage: partner lane = lane ^ j.

    vals = (d, i, re); keys (d, re) strict total order (ranks distinct).
    keep_hi: (1, n) bool — lanes that keep the larger key.  `roll` is
    `pltpu.roll` inside kernels and `jnp.roll` in the pure-XLA twins
    (ops/pallas_beam.py) — identical semantics, out[i] = x[(i - s) mod n]."""
    d, i, re = vals
    n = d.shape[1]
    bit = (_lane_iota(n) & j) != 0

    def partner(x):
        # roll shifts are non-negative: out[i] = x[(i - s) mod n]
        fwd = roll(x, n - j, axis=1)  # value from lane i + j
        bwd = roll(x, j, axis=1)  # value from lane i - j
        return jnp.where(bit, bwd, fwd)

    pd, pi, pre = partner(d), partner(i), partner(re)
    gt = (d > pd) | ((d == pd) & (re > pre))
    take = gt ^ keep_hi
    return (
        jnp.where(take, pd, d),
        jnp.where(take, pi, i),
        jnp.where(take, pre, re),
    )


def _bitonic_sort_desc(vals, roll=pltpu.roll):
    """Full bitonic sort, DESCENDING by (d, re), over the lane axis."""
    n = vals[0].shape[1]
    lane = _lane_iota(n)
    k = 2
    while k <= n:
        desc_here = (lane & k) == 0
        j = k // 2
        while j >= 1:
            bit = (lane & j) != 0
            # descending block: the low lane (bit=0) keeps the larger key
            keep_hi = bit ^ desc_here
            vals = _cmpx(vals, j, keep_hi, roll)
            j //= 2
        k *= 2
    return vals


def _merge_kernel(bd_ref, bi_ref, bre_ref, nd_ref, ni_ref, nre_ref, od_ref, oi_ref, ore_ref):
    d1, i1, re1 = bd_ref[:], bi_ref[:], bre_ref[:]
    d2, i2, re2 = nd_ref[:], ni_ref[:], nre_ref[:]

    # 1) sort the fresh tile descending
    d2, i2, re2 = _bitonic_sort_desc((d2, i2, re2))

    # 2) the j=W stage of the 2W bitonic merge, elementwise across the two
    # arrays (both are W wide; the low half keeps the smaller key)
    gt = (d1 > d2) | ((d1 == d2) & (re1 > re2))
    d = jnp.where(gt, d2, d1)
    i = jnp.where(gt, i2, i1)
    re = jnp.where(gt, re2, re1)

    # 3) ascending bitonic merge of the low half
    vals = (d, i, re)
    n = d.shape[1]
    lane = _lane_iota(n)
    j = n // 2
    while j >= 1:
        keep_hi = (lane & j) != 0
        vals = _cmpx(vals, j, keep_hi)
        j //= 2
    d, i, re = vals
    od_ref[:] = d
    oi_ref[:] = i
    ore_ref[:] = re


@functools.partial(jax.jit, static_argnames=("interpret",))
def merge_sorted(beam_d, beam_i, beam_e, nd, nids, interpret: bool = False):
    """Merge a sorted beam with an unsorted candidate tile.

    beam_d/(i/e): (B, ef) ascending, inf/-1/False padded.  nd/nids:
    (B, EL) unsorted (inf/-1 on stale lanes).  Returns the ef best of the
    union as (d, i, e) — identical to the stable-top_k formulation in
    ops/beam.py:_sorted_merge for every finite entry (the inf tail's
    id/flag lanes are normalized by the beam loop either way).
    """
    B, ef = beam_d.shape
    EL = nd.shape[1]
    efp = ((ef + 127) // 128) * 128
    elp = ((EL + 127) // 128) * 128
    W = max(efp, elp)
    if W & (W - 1):
        m = 1
        while m < W:
            m *= 2
        W = m
    bp = ((B + _BQ - 1) // _BQ) * _BQ

    def padq(x, cval):
        return jnp.pad(
            x, ((0, bp - B), (0, W - x.shape[1])), constant_values=cval
        )

    # rank << 1 | expanded; beam ranks precede tile ranks (top_k tie order)
    bre = (
        jax.lax.broadcasted_iota(jnp.int32, (bp, W), 1) << 1
    ) + padq(beam_e.astype(jnp.int32), 0)
    nre = (jax.lax.broadcasted_iota(jnp.int32, (bp, W), 1) + W) << 1

    bd = padq(beam_d, jnp.inf)
    bi = padq(beam_i, -1)
    nd_p = padq(nd, jnp.inf)
    ni_p = padq(nids, -1)

    grid = bp // _BQ
    spec = pl.BlockSpec((_BQ, W), lambda g: (g, 0), memory_space=pltpu.VMEM)
    od, oi, ore = pl.pallas_call(
        _merge_kernel,
        grid=(grid,),
        in_specs=[spec] * 6,
        out_specs=[spec] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((bp, W), jnp.float32),
            jax.ShapeDtypeStruct((bp, W), jnp.int32),
            jax.ShapeDtypeStruct((bp, W), jnp.int32),
        ],
        interpret=interpret,
    )(bd, bi, bre, nd_p, ni_p, nre)
    return od[:B, :ef], oi[:B, :ef], (ore[:B, :ef] & 1).astype(bool)
