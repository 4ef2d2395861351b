"""Top-k selection over distance tiles.

The reference maintains a bounded-k BTreeSet per query
(`ResultSet::add`, src/index_algorithm/candidate_pair.rs:61-74).  On TPU the
equivalent is a running (dists, ids) pair per query, merged tile-by-tile with
`lax.top_k` so the full (B, N) distance matrix never materializes in HBM for
large N — the blocked scan streams base tiles through the MXU and keeps only
the k-best in registers/VMEM.

Ordering parity: results ascend by distance; for ties, `lax.top_k` keeps the
lower-position element first, and tiles are scanned in index order, so ties
break toward the smaller index like the reference's (distance, index) order
(candidate_pair.rs:36-40).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import distance as D

INVALID_ID = jnp.int32(-1)


def topk_smallest(dists: jax.Array, ids: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Select the k smallest distances (last axis), sorted ascending.

    `dists` (..., C), `ids` (..., C) int32. Returns ((..., k), (..., k)).
    Padded slots should carry +inf distance.
    """
    neg, pos = jax.lax.top_k(-dists, k)
    return -neg, jnp.take_along_axis(ids, pos, axis=-1)


def merge_topk(
    best_d: jax.Array, best_i: jax.Array, new_d: jax.Array, new_i: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Merge a new candidate tile into the running k-best (both (..., *))."""
    d = jnp.concatenate([best_d, new_d], axis=-1)
    i = jnp.concatenate([best_i, new_i], axis=-1)
    return topk_smallest(d, i, k)


@partial(jax.jit, static_argnames=("k", "dist", "block"))
def knn_scan(
    queries: jax.Array,
    base: jax.Array,
    base_cache: jax.Array,
    n_valid: jax.Array,
    k: int,
    dist: str,
    block: int = 65536,
) -> tuple[jax.Array, jax.Array]:
    """Exact brute-force kNN: the Flat index hot loop as a blocked GEMM scan.

    This is the TPU reformulation of `FlatIndex::knn`
    (reference: src/index_algorithm/flat_index.rs:48-57).

    queries: (B, dim); base: (N_pad, dim) with rows >= n_valid as padding;
    base_cache: (N_pad,) per-row dist cache. Returns (B, k) dists ascending
    and (B, k) int32 ids (-1 for missing when n_valid < k).
    """
    B = queries.shape[0]
    n_pad = base.shape[0]
    q = queries.astype(jnp.float32)
    q_cache = D.dist_cache(q, dist)

    if n_pad <= block:
        d = D.pairwise(q, base, dist, q_cache=q_cache)
        ids = jax.lax.broadcasted_iota(jnp.int32, (B, n_pad), 1)
        d = jnp.where(ids < n_valid, d, jnp.inf)
        kk = min(k, n_pad)
        bd, bi = topk_smallest(d, ids, kk)
        if kk < k:
            bd = jnp.pad(bd, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
            bi = jnp.pad(bi, ((0, 0), (0, k - kk)), constant_values=-1)
        return bd, jnp.where(jnp.isfinite(bd), bi, INVALID_ID)

    num_blocks = (n_pad + block - 1) // block
    pad_to = num_blocks * block
    if pad_to != n_pad:
        base = jnp.pad(base, ((0, pad_to - n_pad), (0, 0)))
        base_cache = jnp.pad(base_cache, (0, pad_to - n_pad))

    def body(carry, blk_idx):
        best_d, best_i = carry
        start = blk_idx * block
        tile = jax.lax.dynamic_slice(base, (start, 0), (block, base.shape[1]))
        tile_cache = jax.lax.dynamic_slice(base_cache, (start,), (block,))
        d = D.pairwise(q, tile, dist, q_cache=q_cache, base_cache=tile_cache)
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (B, block), 1)
        d = jnp.where(ids < n_valid, d, jnp.inf)
        best_d, best_i = merge_topk(best_d, best_i, d, ids, k)
        return (best_d, best_i), None

    init = (
        jnp.full((B, k), jnp.inf, dtype=jnp.float32),
        jnp.full((B, k), INVALID_ID, dtype=jnp.int32),
    )
    (bd, bi), _ = jax.lax.scan(body, init, jnp.arange(num_blocks, dtype=jnp.int32))
    return bd, jnp.where(jnp.isfinite(bd), bi, INVALID_ID)


def knn_gathered(
    queries: jax.Array,
    base: jax.Array,
    cand_ids: jax.Array,
    k: int,
    dist: str,
    base_cache: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """kNN over per-query candidate id lists (IVF probe scan, PQ rerank).

    queries: (B, dim); cand_ids: (B, C) int32 with -1 padding. Gathers the
    candidate vectors and reduces with one batched GEMV per query row.
    """
    B, C = cand_ids.shape
    safe = jnp.maximum(cand_ids, 0)
    vecs = base[safe]  # (B, C, dim)
    q = queries.astype(jnp.float32)
    if dist == "l2sqr":
        dots = jnp.einsum("bd,bcd->bc", q, vecs.astype(jnp.float32),
                          preferred_element_type=jnp.float32, precision=D.PRECISION)
        if base_cache is not None:
            v_sq = base_cache[safe]
        else:
            v_sq = jnp.sum(vecs.astype(jnp.float32) ** 2, axis=-1)
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        d = jnp.maximum(q_sq + v_sq - 2.0 * dots, 0.0)
    else:
        dots = jnp.einsum("bd,bcd->bc", q, vecs.astype(jnp.float32),
                          preferred_element_type=jnp.float32, precision=D.PRECISION)
        if base_cache is not None:
            v_n = base_cache[safe]
        else:
            v_n = jnp.sqrt(jnp.sum(vecs.astype(jnp.float32) ** 2, axis=-1))
        q_n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
        d = 1.0 - dots / jnp.maximum(q_n * v_n, 1e-10)
    d = jnp.where(cand_ids >= 0, d, jnp.inf)
    kk = min(k, C)
    bd, bi = topk_smallest(d, cand_ids, kk)
    if kk < k:
        bd = jnp.pad(bd, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
        bi = jnp.pad(bi, ((0, 0), (0, k - kk)), constant_values=-1)
    return bd, jnp.where(jnp.isfinite(bd), bi, INVALID_ID)
