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


def select_smallest(d: jax.Array, ids: jax.Array, kk: int) -> tuple[jax.Array, jax.Array]:
    """Exact kk-smallest over the last axis, routed by width: wide rows use
    `approx_min_k(recall_target=1.0)` (TPU's partial-reduce top-k — orders of
    magnitude faster than the full-sort `lax.top_k` at 1e5-wide rows; at
    recall_target 1.0 it is exact), narrow rows the plain sort."""
    if d.shape[-1] > 4 * kk:
        bd, pos = jax.lax.approx_min_k(d, kk, recall_target=1.0)
        return bd, jnp.take_along_axis(ids, pos, axis=-1)
    return topk_smallest(d, ids, kk)


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

    select = select_smallest

    if n_pad <= block:
        d = D.pairwise(q, base, dist, q_cache=q_cache)
        ids = jax.lax.broadcasted_iota(jnp.int32, (B, n_pad), 1)
        d = jnp.where(ids < n_valid, d, jnp.inf)
        kk = min(k, n_pad)
        bd, bi = select(d, ids, kk)
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
        td, ti = select(d, ids, k)
        best_d, best_i = merge_topk(best_d, best_i, td, ti, k)
        return (best_d, best_i), None

    init = (
        jnp.full((B, k), jnp.inf, dtype=jnp.float32),
        jnp.full((B, k), INVALID_ID, dtype=jnp.int32),
    )
    (bd, bi), _ = jax.lax.scan(body, init, jnp.arange(num_blocks, dtype=jnp.int32))
    return bd, jnp.where(jnp.isfinite(bd), bi, INVALID_ID)


@partial(jax.jit, static_argnames=("dist",))
def int8_ordering_selftest(vecs: jax.Array, n_valid: jax.Array, key: jax.Array, dist: str) -> jax.Array:
    """Estimate whether per-row int8 quantization preserves NEIGHBOR ORDER
    on this dataset: mean fraction of each sampled query's exact top-10
    (within a 2048-row sample) found in its int8 top-12.

    Per-row int8 fails when inter-point gaps are tiny relative to point
    magnitudes (e.g. dense clusters far from the origin: the quantization
    step is sized by the large common component, the signal lives in the
    small residual).  Calibration: healthy datasets (uniform, or clusters
    with gaps >= ~1% of magnitudes) score 1.0; the pathological regime
    scores ~0.7 with end-to-end recall collapse.  Runs fully on device,
    returns a scalar in [0, 1].
    """
    ks, kq = jax.random.split(key)
    n = jnp.maximum(n_valid, 1)
    si = jax.random.randint(ks, (2048,), 0, n)
    qi = jax.random.randint(kq, (32,), 0, n)
    samp = vecs[si].astype(jnp.float32)
    qs = vecs[qi].astype(jnp.float32)

    def dists(a_dot_b, a_sq, b_sq):
        if dist == "l2sqr":
            return a_sq[:, None] + b_sq[None, :] - 2.0 * a_dot_b
        denom = jnp.maximum(
            jnp.sqrt(a_sq)[:, None] * jnp.sqrt(b_sq)[None, :], 1e-10
        )
        return 1.0 - a_dot_b / denom

    q_sq = jnp.sum(qs * qs, axis=1)
    s_sq = jnp.sum(samp * samp, axis=1)
    d_exact = dists(qs @ samp.T, q_sq, s_sq)
    q8s, ss = quantize_rows_int8(samp)
    q8q, sq = quantize_rows_int8(qs)
    dots8 = jnp.dot(q8q.astype(jnp.int32), q8s.astype(jnp.int32).T).astype(
        jnp.float32
    ) * (sq[:, None] * ss[None, :])
    d_int8 = dists(dots8, q_sq, s_sq)

    _, t_exact = jax.lax.top_k(-d_exact, 10)  # (32, 10)
    _, t_int8 = jax.lax.top_k(-d_int8, 12)  # (32, 12)
    hit = jnp.any(t_exact[:, :, None] == t_int8[:, None, :], axis=2)
    return jnp.mean(hit.astype(jnp.float32))


@jax.jit
def decode_perm(cand: jax.Array, perm: jax.Array, n_valid: jax.Array) -> jax.Array:
    """Map candidate ids from the scan-PERMUTED int8 mirror back to original
    row ids (store.device_int8 permutes rows to de-cluster storage order for
    the chunk-min kernels).  Drops -1 inputs and decoded ids >= n_valid
    (invalid mirror rows carry losing sentinels but can still surface when a
    query's survivor group holds nothing better)."""
    orig = jnp.where(cand >= 0, perm[jnp.clip(cand, 0, perm.shape[0] - 1)], INVALID_ID)
    return jnp.where(orig < n_valid, orig, INVALID_ID)


@partial(jax.jit, static_argnames=("r", "dist", "block", "recall_target"))
def scan_candidates(
    queries: jax.Array,
    base_scan: jax.Array,
    base_cache: jax.Array,
    n_valid: jax.Array,
    r: int,
    dist: str,
    block: int = 0,
    recall_target: float = 0.99,
) -> tuple[jax.Array, jax.Array]:
    """Stage 1 of the two-stage exact scan: approximate candidate selection.

    One (or a few) bf16 GEMM(s) over the scan copy of the base set +
    `lax.approx_min_k` (the TPU-native partial-reduce top-k).  The distance
    matrix is kept in bf16 to halve its HBM traffic — candidates are
    reranked exactly in f32 afterwards (stage 2, `knn_gathered`), so only
    candidate *selection* sees the quantization.  Blocking is chosen so the
    (B, block) intermediate stays under ~2 GB; per-block results are merged
    with a tiny top_k.

    queries: (B, dim) f32; base_scan: (N_pad, dim) bf16 (or f32);
    base_cache: (N_pad,) f32 per-row dist cache. Returns ((B, r) approx
    dists, (B, r) int32 ids, -1 padded), ascending.
    """
    B = queries.shape[0]
    n_pad, dim = base_scan.shape
    qs = queries.astype(base_scan.dtype)
    q_cache = D.dist_cache(queries.astype(jnp.float32), dist)
    if block <= 0:
        # bound the (B, block) bf16 intermediate to ~2 GB
        block = max(65536, min(n_pad, (2 << 30) // (2 * max(B, 1))))

    def block_dist(tile, tile_cache, start):
        dots = jax.lax.dot_general(
            qs, tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )  # (B, block) — bf16 multiplies and output; selection-grade only
        if dist == "l2sqr":
            d = (q_cache[:, None] + tile_cache[None, :]).astype(jnp.bfloat16) - 2.0 * dots
        else:
            denom = jnp.maximum(q_cache[:, None] * tile_cache[None, :], 1e-10)
            d = 1.0 - dots / denom.astype(jnp.bfloat16)
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (B, tile.shape[0]), 1)
        return jnp.where(ids < n_valid, d, jnp.inf).astype(jnp.bfloat16), ids

    def select(d, ids, rr):
        bd, pos = jax.lax.approx_min_k(d, rr, recall_target=recall_target)
        return bd.astype(jnp.float32), jnp.take_along_axis(ids, pos, axis=1)

    def pad_out(bd, bi, rr):
        if rr < r:
            bd = jnp.pad(bd, ((0, 0), (0, r - rr)), constant_values=jnp.inf)
            bi = jnp.pad(bi, ((0, 0), (0, r - rr)), constant_values=-1)
        return bd, jnp.where(jnp.isfinite(bd), bi, INVALID_ID)

    if n_pad <= block:
        d, ids = block_dist(base_scan, base_cache, jnp.int32(0))
        rr = min(r, n_pad)
        bd, bi = select(d, ids, rr)
        return pad_out(bd, bi, rr)

    num_blocks = (n_pad + block - 1) // block
    pad_to = num_blocks * block
    if pad_to != n_pad:
        base_scan = jnp.pad(base_scan, ((0, pad_to - n_pad), (0, 0)))
        base_cache = jnp.pad(base_cache, (0, pad_to - n_pad))
    rr = min(r, block)

    def body(carry, blk_idx):
        best_d, best_i = carry
        start = blk_idx * block
        tile = jax.lax.dynamic_slice(base_scan, (start, 0), (block, dim))
        tile_cache = jax.lax.dynamic_slice(base_cache, (start,), (block,))
        d, ids = block_dist(tile, tile_cache, start)
        td, ti = select(d, ids, rr)
        return merge_topk(best_d, best_i, td, ti, rr), None

    init = (
        jnp.full((B, rr), jnp.inf, dtype=jnp.float32),
        jnp.full((B, rr), INVALID_ID, dtype=jnp.int32),
    )
    (bd, bi), _ = jax.lax.scan(body, init, jnp.arange(num_blocks, dtype=jnp.int32))
    return pad_out(bd, bi, rr)


def quantize_rows_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization: x ~= q8 * scale[:, None].

    Returns ((N, dim) int8, (N,) f32 scales).  Zero rows get scale 1.
    """
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q8 = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
    return q8, scale


@partial(jax.jit, static_argnames=("r", "dist", "recall_target"))
def scan_candidates_int8(
    queries: jax.Array,  # (B, dim) f32
    base_i8: jax.Array,  # (N_pad, dim) int8 per-row quantized
    base_scale: jax.Array,  # (N_pad,) f32 cross-term factors (s_x or s_x/|x|)
    base_cache: jax.Array,  # (N_pad,) f32 additive terms (|x|^2 / 0 / +BIG)
    n_valid: jax.Array,
    r: int,
    dist: str,
    recall_target: float = 0.99,
) -> tuple[jax.Array, jax.Array]:
    """Stage-1 candidate selection on the int8 MXU (2x bf16 rate, half the
    HBM traffic of bf16).  Same contract as `scan_candidates`.

    The int8 x int8 -> int32 GEMM computes raw dot products; dequantization
    is a rank-1 scale (q_scale x row_scale) fused into the distance epilogue.
    Exact caches keep the |q|^2/|x|^2 terms full-precision, so only the
    cross-term carries quantization error — selection-grade, reranked
    exactly afterwards (reference f32 parity: src/distance/mod.rs:71-95).
    """
    B = queries.shape[0]
    n_pad = base_i8.shape[0]
    q = queries.astype(jnp.float32)
    q_cache = D.dist_cache(q, dist)
    q8, q_scale = quantize_rows_int8(q)
    if base_i8.shape[1] != q8.shape[1]:
        # base columns zero-padded to a full-lane multiple (store
        # device_int8); zeros are dot-transparent
        q8 = jnp.pad(q8, ((0, 0), (0, base_i8.shape[1] - q8.shape[1])))

    dots = jax.lax.dot_general(
        q8, base_i8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )  # (B, N) int32
    # keep every (B, N) intermediate bf16: the epilogue fuses into the
    # top-k read, and f32 here doubles the HBM round trip for selection-grade
    # values (the exact rerank fixes final distances anyway)
    from ..ops.pallas_scan import query_channels

    qs2, qc = query_channels(q_scale, q_cache, dist)
    dots_f = dots.astype(jnp.bfloat16) * (
        qs2[:, None] * base_scale[None, :]
    ).astype(jnp.bfloat16)
    # unified channel formula (pallas_scan._scan_kernel_int8_packed)
    d = (qc[:, None] + base_cache[None, :]).astype(jnp.bfloat16) - dots_f
    ids = jax.lax.broadcasted_iota(jnp.int32, (B, n_pad), 1)
    d = jnp.where(ids < n_valid, d, jnp.inf)

    rr = min(r, n_pad)
    if n_pad > 4 * rr:
        bd, pos = jax.lax.approx_min_k(d, rr, recall_target=recall_target)
        bd = bd.astype(jnp.float32)
        bi = jnp.take_along_axis(ids, pos, axis=1)
    else:
        bd, bi = topk_smallest(d.astype(jnp.float32), ids, rr)
    if rr < r:
        bd = jnp.pad(bd, ((0, 0), (0, r - rr)), constant_values=jnp.inf)
        bi = jnp.pad(bi, ((0, 0), (0, r - rr)), constant_values=-1)
    return bd, jnp.where(jnp.isfinite(bd), bi, INVALID_ID)


@partial(jax.jit, static_argnames=("dist",))
def exact_distances_sorted(
    queries: jax.Array,
    base: jax.Array,
    ids: jax.Array,
    dist: str,
    base_cache: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact f32 distances for small per-query id lists, sorted ascending.

    The final step of the two-stage scan: after candidate *selection* on the
    bf16 copy, gather only the chosen k rows from the f32 store and compute
    the exact distances the API returns (parity with the reference's f32
    scalar distances, src/distance/mod.rs:71-95).
    """
    B, k = ids.shape
    safe = jnp.maximum(ids, 0)
    v = base[safe].astype(jnp.float32)  # (B, k, dim)
    q = queries.astype(jnp.float32)
    if dist == "l2sqr":
        diff = q[:, None, :] - v
        d = jnp.sum(diff * diff, axis=-1)
    else:
        dots = jnp.sum(q[:, None, :] * v, axis=-1)
        if base_cache is not None:
            v_n = base_cache[safe]
        else:
            v_n = jnp.sqrt(jnp.sum(v * v, axis=-1))
        q_n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
        d = 1.0 - dots / jnp.maximum(q_n * v_n, 1e-10)
    d = jnp.where(ids >= 0, d, jnp.inf)
    bd, pos = jax.lax.top_k(-d, k)
    bi = jnp.take_along_axis(ids, pos, axis=-1)
    bd = -bd
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
