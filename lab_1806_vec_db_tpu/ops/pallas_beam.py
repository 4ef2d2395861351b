"""Fused lock-step beam-body kernels (the HNSW graph-route hot path).

Round-4 measurement (DESIGN.md 9c): the batched graph traversal ran at
4-5x its own DMA floor because ~80% of each ~2.7 ms lock-step iteration
was the beam BODY — a chain of ~30 narrow (B, 128-250)-lane XLA VPU ops
(ring/beam/tile dedup, one-hot compaction, expansion select, bitonic
merge) each materializing its (B, EL, ef)-sized intermediates through
HBM.  Here the body is two Pallas kernels sandwiching the existing
DMA-gather distance kernel (ops/pallas_gather.py), so per iteration only
(B, ~128) int32/f32 state arrays cross HBM:

- `beam_pre`: neighbor dedup against beam membership, the visited ring
  and within-tile duplicates, novel-first compaction (fresh ids to the
  tile front so the gather kernel's trailing-wave skip prices the tile
  at its NOVEL row count), fresh-count emission and the ring update.
- `beam_post`: the bitonic beam merge (ops/pallas_merge.py's
  compare-exchange machinery on in-register lane rotates, identical
  (distance, rank) tie order to `lax.top_k`) FUSED with the next
  iteration's expansion select (cumsum-rank one-hot over the merged
  beam), emitting the selected frontier ids so the while-loop body
  starts at the links gather.

Reference behavior: the sequential best-first search loop
`search_on_level_fn` (src/index_algorithm/hnsw_index.rs:258-291) with
its `check_candidate` termination (candidate_pair.rs:55-57); the
lock-step reformulation itself is documented in ops/beam.py.

One deliberate divergence from ops/beam.py's XLA body: the visited ring
is a SHIFT REGISTER (every iteration shifts E lanes and writes the
selected ids at the front) instead of a position-tracked circular
buffer, so no scalar ring position crosses the kernel boundary.  When a
query selects fewer than E valid expansions (only near convergence) the
holes shift -1s in, slightly shrinking effective ring history — the
ring is already an approximate visited structure (a miss only re-scores
a node; DESIGN.md §2), and near convergence fresh tiles are empty, so
the trade is noise.  The pure-XLA twins (`beam_pre_ref`,
`beam_post_ref`) implement the SAME semantics and are the CPU path and
the kernels' bit-exactness oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_merge import _bitonic_sort_desc, _cmpx, _lane_iota

_BQ_POST = 128  # query rows per POST grid block


def _pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _bq_pre(el: int) -> int:
    # PRE's dedup/compaction transients are (BQ, EL, EL)-ish int32; keep
    # them ~2 MB
    return max(8, 4096 // el)


def _lane_cumsum(x: jax.Array, roll=pltpu.roll) -> jax.Array:
    """Inclusive cumsum along the lane axis via a log-step shift chain
    (Hillis-Steele on lane rolls; jnp.cumsum is not guaranteed in
    Mosaic).  `roll` is pltpu.roll in-kernel, jnp.roll in the XLA twins
    (same semantics: out[i] = x[(i - s) mod n])."""
    n = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    s = 1
    while s < n:
        shifted = roll(x, s, axis=x.ndim - 1)  # out[i] = x[i - s]
        x = x + jnp.where(lane >= s, shifted, 0)
        s *= 2
    return x


def _dedup_compact(nbrs, beam_i, ring, EL: int, W: int, roll=pltpu.roll):
    """Shared PRE body (kernel and XLA twin are the same trace on
    different backends): returns (comp (BQ, W), count (BQ, 1))."""
    BQ = nbrs.shape[0]
    valid = nbrs >= 0
    # membership tests chunked at 128 lanes (keeps each compare a clean
    # (BQ, EL, 128) tile op)
    in_prev = jnp.zeros(nbrs.shape, bool)
    for arr in (beam_i, ring):
        n = arr.shape[1]
        for c in range(0, n, 128):
            seg = arr[:, c : c + 128]
            in_prev = in_prev | jnp.any(
                nbrs[:, :, None] == seg[:, None, :], axis=2
            )
    # within-tile dup: an earlier equal occurrence wins
    tri = jax.lax.broadcasted_iota(jnp.int32, (EL, EL), 1) < jax.lax.broadcasted_iota(
        jnp.int32, (EL, EL), 0
    )  # tri[i, j] = j < i
    dup = jnp.any(
        (nbrs[:, :, None] == nbrs[:, None, :]) & tri[None, :, :], axis=2
    )
    fresh32 = (valid & ~in_prev & ~dup).astype(jnp.int32)
    crank = _lane_cumsum(fresh32, roll)  # (BQ, EL) 1-based
    count = jnp.max(crank, axis=1, keepdims=True)  # (BQ, 1)
    # novel-first compaction: fresh id with running rank j+1 -> dst lane j.
    # The fresh mask rides as int32 through the minor-dim insert: Mosaic
    # only supports non-no-op minor-dim reshapes for 32-bit types (an i1
    # `fresh[:, :, None]` fails to compile).
    dst = jax.lax.broadcasted_iota(jnp.int32, (EL, EL), 1)  # dst lane per column
    hit = (crank[:, :, None] == dst[None, :, :] + 1) & (fresh32[:, :, None] > 0)
    comp_el = jnp.max(
        jnp.where(hit, nbrs[:, :, None], jnp.int32(-1)), axis=1
    )  # (BQ, EL)
    if W > EL:
        comp = jnp.concatenate(
            [comp_el, jnp.full((BQ, W - EL), -1, jnp.int32)], axis=1
        )
    else:
        comp = comp_el
    return comp, count


def _ring_shift(ring, selq, E: int, roll=pltpu.roll):
    """Shift-register ring update: shift by E lanes, write the selected
    ids (selq lanes 0..E-1, -1 where unselected) at the front."""
    out = roll(ring, E, axis=1)  # out[i] = ring[i - E]
    lane = jax.lax.broadcasted_iota(jnp.int32, ring.shape, 1)
    for r in range(E):
        cand_r = selq[:, r : r + 1]  # (BQ, 1)
        out = jnp.where(lane == r, cand_r, out)
    return out


def _pre_kernel(beam_i_ref, ring_ref, selq_ref, nbrs_ref,
                comp_ref, ring_out_ref, cnt_ref, *, E: int, EL: int, W: int):
    comp, count = _dedup_compact(
        nbrs_ref[:], beam_i_ref[:], ring_ref[:], EL, W
    )
    comp_ref[:] = comp
    cnt_ref[:] = jnp.broadcast_to(count, cnt_ref.shape)
    ring_out_ref[:] = _ring_shift(ring_ref[:], selq_ref[:], E)


@functools.partial(jax.jit, static_argnames=("E", "interpret"))
def beam_pre(beam_i, ring, selq, nbrs, E: int, interpret: bool = False):
    """Dedup + compact the freshly gathered neighbor tile; update the ring.

    beam_i: (B, W) int32 sorted beam ids (-1 padded; W = pow2).
    ring: (B, R) int32 recently-expanded ring (R a multiple of 128).
    selq: (B, 128) int32 — this iteration's selected ids in lanes 0..E-1.
    nbrs: (B, EL) int32 gathered neighbor ids, -1 for invalid (EL a
    multiple of 128).
    Returns (comp (B, W) novel ids compacted to the front -1 tail,
    ring' (B, R), cnt (B, 128) with the per-query fresh count in every
    lane)."""
    B, W = beam_i.shape
    EL = nbrs.shape[1]
    R = ring.shape[1]
    BQ = _bq_pre(EL)
    bp = ((B + BQ - 1) // BQ) * BQ
    if bp != B:
        beam_i = jnp.pad(beam_i, ((0, bp - B), (0, 0)), constant_values=-1)
        ring = jnp.pad(ring, ((0, bp - B), (0, 0)), constant_values=-1)
        selq = jnp.pad(selq, ((0, bp - B), (0, 0)), constant_values=-1)
        nbrs = jnp.pad(nbrs, ((0, bp - B), (0, 0)), constant_values=-1)
    kernel = functools.partial(_pre_kernel, E=E, EL=EL, W=W)

    def spec(w):
        return pl.BlockSpec((BQ, w), lambda g: (g, 0), memory_space=pltpu.VMEM)

    comp, ring_out, cnt = pl.pallas_call(
        kernel,
        grid=(bp // BQ,),
        in_specs=[spec(W), spec(R), spec(128), spec(EL)],
        out_specs=[spec(W), spec(R), spec(128)],
        out_shape=[
            jax.ShapeDtypeStruct((bp, W), jnp.int32),
            jax.ShapeDtypeStruct((bp, R), jnp.int32),
            jax.ShapeDtypeStruct((bp, 128), jnp.int32),
        ],
        interpret=interpret,
    )(beam_i, ring, selq, nbrs)
    return comp[:B], ring_out[:B], cnt[:B]


def beam_pre_ref(beam_i, ring, selq, nbrs, E: int):
    """Pure-XLA twin of `beam_pre` (CPU path + kernel oracle)."""
    W = beam_i.shape[1]
    EL = nbrs.shape[1]
    comp, count = _dedup_compact(nbrs, beam_i, ring, EL, W, roll=jnp.roll)
    ring_out = _ring_shift(ring, selq, E, roll=jnp.roll)
    cnt = jnp.broadcast_to(count, (beam_i.shape[0], 128))
    return comp, ring_out, cnt


def _merge_select(d1, i1, e1, d2, i2, *, ef: int, E: int, W: int,
                  roll=pltpu.roll):
    """Shared POST body: bitonic merge (pallas_merge's network, identical
    tie order to stable lax.top_k) + ef re-mask + expansion select."""
    lane = jax.lax.broadcasted_iota(jnp.int32, d1.shape, 1)
    re1 = (lane << 1) + e1
    re2 = (lane + W) << 1
    # 1) sort the fresh tile descending by (d, rank)
    d2, i2, re2 = _bitonic_sort_desc((d2, i2, re2), roll)
    # 2) elementwise low-half exchange (the j=W stage of a 2W merge)
    gt = (d1 > d2) | ((d1 == d2) & (re1 > re2))
    d = jnp.where(gt, d2, d1)
    i = jnp.where(gt, i2, i1)
    re = jnp.where(gt, re2, re1)
    # 3) ascending bitonic merge of the low half
    vals = (d, i, re)
    j = W // 2
    while j >= 1:
        keep_hi = (lane & j) != 0
        vals = _cmpx(vals, j, keep_hi, roll)
        j //= 2
    d, i, re = vals
    e = re & 1
    # ef re-mask: the beam is logically ef wide; merged lanes >= ef are
    # discarded (ops/beam.py slices the merge back to ef the same way)
    alive = (lane < ef) & jnp.isfinite(d) & (i >= 0)
    d = jnp.where(alive, d, jnp.inf)
    i = jnp.where(alive, i, -1)
    e = jnp.where(alive, e, 0)
    # expansion select: the E best (lowest-lane) unexpanded entries
    unexp = (e == 0) & (i >= 0)
    rank = _lane_cumsum(unexp.astype(jnp.int32), roll)
    selm = unexp & (rank <= E)
    e = e | selm.astype(jnp.int32)
    sel = jnp.full((d.shape[0], 128), -1, jnp.int32)
    sel_lane = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 1)
    for r in range(E):
        cand_r = jnp.max(
            jnp.where(selm & (rank == r + 1), i, jnp.int32(-1)),
            axis=1, keepdims=True,
        )  # (BQ, 1)
        sel = jnp.where(sel_lane == r, cand_r, sel)
    return d, i, e, sel


def _post_kernel(bd_ref, bi_ref, be_ref, nd_ref, ni_ref,
                 od_ref, oi_ref, oe_ref, sel_ref, *, ef: int, E: int, W: int):
    d, i, e, sel = _merge_select(
        bd_ref[:], bi_ref[:], be_ref[:], nd_ref[:], ni_ref[:],
        ef=ef, E=E, W=W,
    )
    od_ref[:] = d
    oi_ref[:] = i
    oe_ref[:] = e
    sel_ref[:] = sel


@functools.partial(jax.jit, static_argnames=("ef", "E", "interpret"))
def beam_post(beam_d, beam_i, beam_e, nd, nids, ef: int, E: int,
              interpret: bool = False):
    """Merge the scored fresh tile into the sorted beam and select the
    next iteration's expansion frontier.

    beam_d/(i/e): (B, W) ascending beam (inf/-1/0 padded; W = pow2 >= ef
    and >= the tile width).  nd/nids: (B, W) scored fresh tile (inf/-1 on
    stale lanes).  Returns (beam_d', beam_i', beam_e', selq (B, 128) with
    the selected ids in lanes 0..E-1, -1 where none)."""
    B, W = beam_d.shape
    bp = ((B + _BQ_POST - 1) // _BQ_POST) * _BQ_POST
    if bp != B:
        beam_d = jnp.pad(beam_d, ((0, bp - B), (0, 0)), constant_values=jnp.inf)
        beam_i = jnp.pad(beam_i, ((0, bp - B), (0, 0)), constant_values=-1)
        beam_e = jnp.pad(beam_e, ((0, bp - B), (0, 0)))
        nd = jnp.pad(nd, ((0, bp - B), (0, 0)), constant_values=jnp.inf)
        nids = jnp.pad(nids, ((0, bp - B), (0, 0)), constant_values=-1)
    kernel = functools.partial(_post_kernel, ef=ef, E=E, W=W)

    def spec(w):
        return pl.BlockSpec((_BQ_POST, w), lambda g: (g, 0), memory_space=pltpu.VMEM)

    od, oi, oe, sel = pl.pallas_call(
        kernel,
        grid=(bp // _BQ_POST,),
        in_specs=[spec(W)] * 2 + [spec(W)] + [spec(W)] * 2,
        out_specs=[spec(W)] * 3 + [spec(128)],
        out_shape=[
            jax.ShapeDtypeStruct((bp, W), jnp.float32),
            jax.ShapeDtypeStruct((bp, W), jnp.int32),
            jax.ShapeDtypeStruct((bp, W), jnp.int32),
            jax.ShapeDtypeStruct((bp, 128), jnp.int32),
        ],
        interpret=interpret,
    )(beam_d, beam_i, beam_e, nd, nids)
    return od[:B], oi[:B], oe[:B], sel[:B]


def beam_post_ref(beam_d, beam_i, beam_e, nd, nids, ef: int, E: int):
    """Pure-XLA twin of `beam_post`."""
    W = beam_d.shape[1]
    return _merge_select(beam_d, beam_i, beam_e, nd, nids, ef=ef, E=E, W=W,
                         roll=jnp.roll)
