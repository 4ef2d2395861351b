"""Batched lock-step beam search over a neighbor graph.

The reference's HNSW search is a sequential best-first loop per query with a
HashSet visited set and BTreeSet frontier (src/index_algorithm/hnsw_index.rs:258-291).
That shape cannot use a TPU.  Here the traversal is reformulated as a
*batched beam search*: a whole batch of queries advances in lock step; per
step each query expands its best unexpanded beam entries, gathers their
neighbor id blocks, computes all neighbor distances as one batched
gather+GEMM, and merges into a sorted (ef)-wide beam with `lax.top_k`.

Visited-set semantics: the beam itself deduplicates (membership test by
broadcast compare), plus a small ring buffer of recently expanded nodes
catches re-discovery of evicted nodes.  A node that escapes both is merely
re-scored — correctness is unaffected, only a little extra work, the same
correctness-by-construction argument the reference uses for its batch-insert
race tolerance (hnsw_index.rs:430-437).

Termination matches the reference's `check_candidate` rule
(candidate_pair.rs:55-57): the loop stops when no beam entry is left
unexpanded — any candidate outside the ef-best has been evicted, which is
exactly when the sequential loop would `break`.

The distance function is a closure so the same traversal serves exact
vector distance (HNSW search/build) and PQ ADC distance (knn_pq,
hnsw_index.rs:672-697).
"""

from __future__ import annotations

import functools
import os
from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array

# Merge engine for the per-iteration beam update: the Pallas bitonic-merge
# kernel (ops/pallas_merge.py) halves the whole lock-step iteration vs the
# lax.top_k formulation (5.54 -> 2.69 ms/iter at B=1000/ef=120/E=4 on v5e)
# with bit-identical beam contents.  CPU (tests/oracle) keeps top_k.
_PALLAS_MERGE = os.environ.get("VECDB_TPU_PALLAS_MERGE", "1") == "1"


def set_pallas_merge(enabled: bool) -> None:
    """A/B seam for the beam-merge engine (ADVICE r3 #4).  Read at TRACE
    time — call `jax.clear_caches()` after flipping."""
    global _PALLAS_MERGE
    _PALLAS_MERGE = bool(enabled)


# Fused beam body (ops/pallas_beam.py): dedup/compaction and merge/select
# run as two Pallas kernels instead of ~30 XLA ops, eliminating the HBM
# round trips of every (B, EL, ef) intermediate (round-4 floor measurement:
# ~80% of the lock-step iteration was this body).  TPU default; CPU keeps
# the original XLA formulation (the oracle path).
_FUSED_BEAM = os.environ.get("VECDB_TPU_FUSED_BEAM", "1") == "1"


def set_fused_beam(enabled: bool) -> None:
    """A/B seam for the fused beam body.  Read at TRACE time — call
    `jax.clear_caches()` after flipping."""
    global _FUSED_BEAM
    _FUSED_BEAM = bool(enabled)
# node_dist_fn: (B, C) int32 ids -> (B, C) f32 distances.  Ids may be -1
# (invalid): the fn may return ANY value there (callers mask), but must not
# fault — and the Pallas DMA-gather implementation uses an all-invalid row
# to skip that query's DMAs entirely (see pallas_gather.py), which is what
# makes converged queries cheap in the lock-step loops below.
NodeDistFn = Callable[[Array], Array]
# links_fn: (B, E) int32 ids -> (B, E, L) int32 neighbor ids (-1 padded)
LinksFn = Callable[[Array], Array]


def _sorted_merge(beam_d, beam_i, beam_e, nd, nids, ef: int):
    """Merge a candidate tile into the sorted beam: top_k over the
    concatenation, carrying ids and expansion flags by position gather.

    `lax.top_k` is stable by position, so ties break toward the existing
    beam (it sits first in the concatenation) — the same tie order the
    reference's (distance, index) BTreeSet maintains for already-present
    entries.  An earlier rank-merge formulation (compare matrices + argmax
    inverse-permutation) avoided the sort but measured ~25% SLOWER on the
    v5e than one fused top_k over ef+EL lanes.
    """
    if _PALLAS_MERGE and jax.default_backend() == "tpu":
        from . import pallas_merge as PM

        return PM.merge_sorted(beam_d, beam_i, beam_e, nd, nids)
    all_d = jnp.concatenate([beam_d, nd], axis=1)
    all_i = jnp.concatenate([beam_i, nids], axis=1)
    all_e = jnp.concatenate([beam_e, jnp.zeros_like(nd, dtype=bool)], axis=1)
    neg, pos = jax.lax.top_k(-all_d, ef)
    return (
        -neg,
        jnp.take_along_axis(all_i, pos, axis=1),
        jnp.take_along_axis(all_e, pos, axis=1),
    )


def beam_search_fused(
    entry: Array,
    node_dist_fn: NodeDistFn,
    links_fn: LinksFn,
    ef: int,
    max_iters: int,
    expand: int = 4,
    ring_size: int = 512,
    with_stats: bool = False,
    use_kernels: bool | None = None,
    interpret: bool = False,
) -> tuple[Array, ...]:
    """Lock-step beam search with the FUSED Pallas beam body.

    Same contract as `beam_search` (sorted (B, ef) beam, reference
    termination rule); the body is beam_pre -> node_dist_fn -> beam_post
    (ops/pallas_beam.py) so only (B, ~W) state arrays cross HBM per
    iteration.  The visited ring is the shift-register variant (see
    pallas_beam's module docstring for the one documented divergence).

    `use_kernels=False` runs the pure-XLA twins (CPU path / kernel
    oracle); default picks kernels on TPU."""
    from . import pallas_beam as PB

    if use_kernels is None:
        use_kernels = jax.default_backend() == "tpu"
    if use_kernels:
        pre = functools.partial(PB.beam_pre, interpret=interpret)
        post = functools.partial(PB.beam_post, interpret=interpret)
    else:
        pre, post = PB.beam_pre_ref, PB.beam_post_ref

    B = entry.shape[0]
    E = expand
    # probe the links shape once (outside the loop) to size the tile
    L = links_fn(jnp.zeros((1, 1), jnp.int32)).shape[-1]
    EL = ((E * L + 127) // 128) * 128
    W = PB._pow2(max(ef, EL, 128))
    # ring capped (default 256): the dedup compare volume is linear in R
    # and the fused PRE kernel pays it every iteration; 256 slots hold 64+
    # iterations of expansion history at E=4, and a node evicted beyond
    # that horizon is merely re-scored (measured rows/query unchanged at
    # ef=120 vs the 512-slot ring).  VECDB_TPU_RING_CAP overrides (read at
    # trace time) for A/B measurement.
    _cap = int(os.environ.get("VECDB_TPU_RING_CAP", "256"))
    R = ((max(min(ring_size, _cap), 128) + 127) // 128) * 128

    entry_d = node_dist_fn(entry[:, None])[:, 0]  # (B,)
    beam_d = jnp.full((B, W), jnp.inf, jnp.float32).at[:, 0].set(
        jnp.where(entry >= 0, entry_d, jnp.inf))
    beam_i = jnp.full((B, W), -1, jnp.int32).at[:, 0].set(entry)
    beam_e = jnp.zeros((B, W), jnp.int32)
    ring = jnp.full((B, R), -1, jnp.int32)
    rows = jnp.ones((B,), jnp.int32)
    # initial expansion select: one POST pass with an empty fresh tile
    beam_d, beam_i, beam_e, selq = post(
        beam_d, beam_i, beam_e,
        jnp.full((B, W), jnp.inf, jnp.float32),
        jnp.full((B, W), -1, jnp.int32), ef=ef, E=E,
    )

    def cond(state):
        beam_d, beam_i, beam_e, ring, selq, rows, it = state
        return (it < max_iters) & jnp.any(selq[:, :E] >= 0)

    def body(state):
        beam_d, beam_i, beam_e, ring, selq, rows, it = state
        ids_e = selq[:, :E]  # (B, E)
        nbrs = links_fn(jnp.maximum(ids_e, 0))  # (B, E, L)
        nbrs = jnp.where(ids_e[:, :, None] >= 0, nbrs, -1).reshape(B, E * L)
        if EL != E * L:
            nbrs = jnp.pad(nbrs, ((0, 0), (0, EL - E * L)), constant_values=-1)
        comp, ring, cnt = pre(beam_i, ring, selq, nbrs, E=E)
        nd = node_dist_fn(comp)
        nd = jnp.where(comp >= 0, nd, jnp.inf)
        beam_d, beam_i, beam_e, selq = post(
            beam_d, beam_i, beam_e, nd, comp, ef=ef, E=E)
        rows = rows + cnt[:, 0]
        return beam_d, beam_i, beam_e, ring, selq, rows, it + 1

    beam_d, beam_i, beam_e, ring, selq, rows, _ = jax.lax.while_loop(
        cond, body, (beam_d, beam_i, beam_e, ring, selq, rows, jnp.int32(0))
    )
    if with_stats:
        return beam_d[:, :ef], beam_i[:, :ef], rows
    return beam_d[:, :ef], beam_i[:, :ef]


def beam_search(
    entry: Array,
    node_dist_fn: NodeDistFn,
    links_fn: LinksFn,
    ef: int,
    max_iters: int,
    expand: int = 1,
    ring_size: int = 64,
    with_stats: bool = False,
) -> tuple[Array, ...]:
    """Run lock-step beam search from per-query entry points.

    entry: (B,) int32 node ids.
    Returns (beam_dists, beam_ids): (B, ef) sorted ascending, -1 padded;
    with_stats additionally returns (B,) int32 NOVEL rows scored per query
    (the quantity the 16 ns/row DMA-issue ceiling prices — DESIGN.md 9c).
    """
    if _FUSED_BEAM and jax.default_backend() == "tpu":
        return beam_search_fused(
            entry, node_dist_fn, links_fn, ef, max_iters,
            expand=expand, ring_size=ring_size, with_stats=with_stats,
        )
    B = entry.shape[0]
    E = expand
    R = ring_size

    entry_d = node_dist_fn(entry[:, None])[:, 0]  # (B,)
    beam_d = jnp.full((B, ef), jnp.inf, jnp.float32).at[:, 0].set(entry_d)
    beam_i = jnp.full((B, ef), -1, jnp.int32).at[:, 0].set(entry)
    expanded = jnp.zeros((B, ef), bool)
    ring = jnp.full((B, R), -1, jnp.int32)
    ring_pos = jnp.zeros((B,), jnp.int32)
    rows = jnp.ones((B,), jnp.int32)  # entry row is scored up front

    def cond(state):
        beam_d, beam_i, expanded, ring, ring_pos, rows, it = state
        unexp = (~expanded) & (beam_i >= 0)
        return (it < max_iters) & jnp.any(unexp)

    def body(state):
        beam_d, beam_i, expanded, ring, ring_pos, rows, it = state
        unexp = (~expanded) & (beam_i >= 0)
        active = jnp.any(unexp, axis=1)  # (B,)

        # Select the E best (lowest-slot) unexpanded entries per query.
        # Beam is sorted ascending, so slot order == best-first order and
        # "the E best unexpanded" = "unexpanded with running count <= E" —
        # a cumsum + compare + tiny one-hot contraction, NOT a top_k sort
        # (a per-iteration (B, ef) sort was a measurable slice of the
        # while_loop body on the v5e).
        rank = jnp.cumsum(unexp.astype(jnp.int32), axis=1)  # (B, ef) 1-based
        sel_mask = unexp & (rank <= E)  # (B, ef)
        onehot = (
            sel_mask[:, :, None]
            & (rank[:, :, None] == jnp.arange(1, E + 1, dtype=jnp.int32)[None, None, :])
        )  # (B, ef, E): slot j feeds expansion lane rank-1
        sel_valid = jnp.any(onehot, axis=1)  # (B, E)
        cand = jnp.max(
            jnp.where(onehot, beam_i[:, :, None], jnp.int32(-1)), axis=1
        )  # (B, E), -1 where no such slot
        cand_safe = jnp.maximum(cand, 0)
        exp_new = expanded | sel_mask

        # Gather neighbor blocks and flatten the expansion axis.
        nbrs = links_fn(cand_safe)  # (B, E, L)
        L = nbrs.shape[-1]
        nbrs = jnp.where(sel_valid[:, :, None], nbrs, -1).reshape(B, E * L)

        valid = nbrs >= 0
        # Dedup against current beam membership.
        in_beam = jnp.any(nbrs[:, :, None] == beam_i[:, None, :], axis=2)
        # Dedup against the recently-expanded ring buffer.
        in_ring = jnp.any(nbrs[:, :, None] == ring[:, None, :], axis=2)
        # Dedup within the tile (earlier occurrence wins).
        if E * L > 1:
            eq = nbrs[:, :, None] == nbrs[:, None, :]
            tri = jnp.tril(jnp.ones((E * L, E * L), bool), k=-1)
            dup = jnp.any(eq & tri[None, :, :], axis=2)
        else:
            dup = jnp.zeros_like(valid)
        fresh = valid & ~in_beam & ~in_ring & ~dup

        # Novel-first compaction (scatter-free, same one-hot trick as the
        # expansion select): fresh ids move to the FRONT of the tile, stale
        # slots become a -1 tail.  The DMA-gather distance kernel skips
        # all-invalid WAVES (pallas_gather._WAVE), so after compaction the
        # tile's DMA cost tracks the number of NOVEL rows this step —
        # mid-search tiles are typically majority-stale (dup/beam/ring
        # hits), and a converged query's tile is all -1 (every wave
        # skipped).  Order within the tile is irrelevant to the merge.
        EL = E * L
        crank = jnp.cumsum(fresh.astype(jnp.int32), axis=1)  # 1-based
        hit = fresh[:, :, None] & (
            crank[:, :, None] == (1 + jnp.arange(EL, dtype=jnp.int32))[None, None, :]
        )  # (B, EL src, EL dst)
        comp = jnp.max(jnp.where(hit, nbrs[:, :, None], jnp.int32(-1)), axis=1)

        nd = node_dist_fn(comp)
        nd = jnp.where(comp >= 0, nd, jnp.inf)
        nids = comp

        # Merge into the sorted beam, carrying expansion flags through.
        beam_d, beam_i, expanded2 = _sorted_merge(beam_d, beam_i, exp_new, nd, nids, ef)
        beam_i = jnp.where(jnp.isfinite(beam_d), beam_i, -1)
        expanded2 = jnp.where(beam_i >= 0, expanded2, False)

        # Push expanded nodes into the ring buffer.  Same de-scatter
        # treatment: the E slots written this step are distinct (consecutive
        # mod R, E <= R), so a one-hot max-select over the E axis replaces
        # the scatter exactly.
        ring_slots = (ring_pos[:, None] + jnp.arange(E, dtype=jnp.int32)[None, :]) % R
        write = sel_valid & active[:, None]  # (B, E)
        slot_hit = (
            ring_slots[:, :, None] == jnp.arange(R, dtype=jnp.int32)[None, None, :]
        ) & write[:, :, None]  # (B, E, R)
        upd = jnp.max(jnp.where(slot_hit, cand[:, :, None], jnp.int32(-1)), axis=1)
        ring = jnp.where(jnp.any(slot_hit, axis=1), upd, ring)
        ring_pos = ring_pos + jnp.sum(sel_valid, axis=1).astype(jnp.int32)
        rows = rows + jnp.where(active, crank[:, -1], 0)

        return beam_d, beam_i, expanded2, ring, ring_pos, rows, it + 1

    beam_d, beam_i, expanded, ring, ring_pos, rows, _ = jax.lax.while_loop(
        cond, body, (beam_d, beam_i, expanded, ring, ring_pos, rows,
                     jnp.int32(0))
    )
    if with_stats:
        return beam_d, beam_i, rows
    return beam_d, beam_i


def greedy_descent(
    entry: Array,
    node_dist_fn: NodeDistFn,
    links_fn: LinksFn,
    max_iters: int,
) -> Array:
    """Batched greedy descent on one level: hill-climb to a local minimum.

    The TPU reformulation of `greedy_search_on_level_fn`
    (reference: hnsw_index.rs:306-330).  entry: (B,) -> (B,) improved ids.
    """
    B = entry.shape[0]
    cur_d = node_dist_fn(entry[:, None])[:, 0]

    def cond(state):
        cur, cur_d, moved, it = state
        return (it < max_iters) & jnp.any(moved)

    def body(state):
        cur, cur_d, moved, it = state
        nbrs = links_fn(cur[:, None])[:, 0, :]  # (B, L)
        # a query that did not move last step cannot improve (same node,
        # same neighbors): blank its ids so the DMA-gather kernel skips it
        nbrs = jnp.where(moved[:, None], nbrs, -1)
        valid = nbrs >= 0
        nd = node_dist_fn(nbrs)
        nd = jnp.where(valid, nd, jnp.inf)
        best_pos = jnp.argmin(nd, axis=1)
        best_d = jnp.take_along_axis(nd, best_pos[:, None], axis=1)[:, 0]
        best_i = jnp.take_along_axis(nbrs, best_pos[:, None], axis=1)[:, 0]
        improve = best_d < cur_d
        cur = jnp.where(improve, best_i, cur)
        cur_d = jnp.where(improve, best_d, cur_d)
        return cur, cur_d, improve, it + 1

    cur, _, _, _ = jax.lax.while_loop(
        cond, body, (entry, cur_d, jnp.ones((B,), bool), jnp.int32(0))
    )
    return cur
