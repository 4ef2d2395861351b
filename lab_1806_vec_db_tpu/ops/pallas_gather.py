"""Pallas TPU kernel: row-gather + exact distance (the rerank hot path).

XLA lowers `base[ids]` row gathers to scalar-unit loads (~15 GB/s observed);
for the two-stage scan's rerank that was ~60% of total query time.  This
kernel instead issues one async DMA per candidate row (HBM -> VMEM, all in
flight concurrently), then computes the exact f32 distances on the VPU — the
gather runs at HBM copy speed and the (B, r, dim) gathered tensor never
exists in HBM.

Layout trick: Mosaic requires HBM slices to be (8, 128)-tile aligned, so a
single (1, dim) row cannot be DMA'd.  The base set is therefore stored in
"row-slab" layout: dim padded to a multiple of 1024 and reshaped to
(N * SR, 128) with SR = dim_pad/128 (a multiple of 8) — each logical row is
one aligned (SR, 128) slab, and distances are computed directly in slab
layout (reduce over slab axes), so no relayout is ever needed.

Reference behavior being accelerated: exact rerank of ADC/approximate
candidates (src/index_algorithm/candidate_pair.rs:102-108) and the exact
f32 distances the flat scan returns (src/distance/mod.rs:71-95).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_SEM_BANK = 128  # DMA semaphores per wave (sflag space holds ~500 total)
# Wave granularity for the PER-WAVE skip: a wave whose ids are ALL invalid
# is neither issued nor waited on.  Callers that compact valid ids to the
# FRONT of the tile (ops/beam.py novel-first compaction) turn "fraction of
# stale slots" directly into skipped trailing waves, so the tile's DMA cost
# tracks the NOVEL row count instead of r.  32 is fine-grained enough to
# matter at r=128-256 while the extra byte-counted waits stay ~free (the
# round-2 measurement: per-copy -> per-128 waits saved 21%, i.e. one wait
# costs ~0.17% of the kernel — 4-8 waves add < 1%).
_WAVE = 32


def rerank_dim_pad(dim: int) -> int:
    """Row-slab padded dim: next multiple of 1024 (SR = dim_pad/128 must be a
    multiple of the 8-row sublane tile)."""
    return ((dim + 1023) // 1024) * 1024


def prepare_rerank_base(base: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(N, dim) -> (N * SR, 128) row-slab copy for `gather_dists_rs`.

    Do this ONCE per index (it copies the data); the result reshapes back to
    (N, dim_pad) for free (same bytes, row-major).  `dtype` may be
    jnp.bfloat16 for the memory-lean tier: half the HBM footprint and DMA
    traffic, distances computed in f32 after an in-VMEM upcast (~1e-2
    relative — callers on the lean tier accept selection-grade rerank).
    """
    n, dim = base.shape
    dim_pad = rerank_dim_pad(dim)
    if dim_pad != dim:
        base = jnp.pad(base, ((0, 0), (0, dim_pad - dim)))
    return base.astype(dtype).reshape(n * (dim_pad // 128), 128)


def _gather_dist_kernel(
    ids_ref,  # SMEM (1, 1, r) int32 — DMA source ids (scalar-readable)
    qn_ref,  # SMEM (1, 1, 1) f32 — |q| for cosine (ignored for l2sqr)
    act_ref,  # SMEM (1, 1, n_waves) int32 — per-wave: 0 iff wave all-invalid
    idv_ref,  # VMEM (1, r, 1) int32 — same ids, vector copy for masking
    q_ref,  # VMEM (1, SR, 128) f32 — this query in slab layout
    base_rs,  # ANY (N*SR, 128) f32 — row-slab base, DMA'd manually
    out_ref,  # VMEM (1, r, 1) f32
    rows,  # scratch VMEM (r*SR, 128) f32 — slab j at rows [j*SR, (j+1)*SR)
    sems,  # scratch DMA sems (2,) — ONE per wave bank (see below)
    *,
    dist: str,
    r: int,
    sr: int,
):
    # The scalar core's DMA ISSUE loop is the kernel's real cost (profiled
    # ~tens of ns per descriptor; the copies themselves run concurrently on
    # the DMA engines).  Two reductions keep it minimal:
    # - waves share ONE semaphore per bank: DMA completion increments a
    #   semaphore by the copy's byte count, so a single wait on a descriptor
    #   spanning the wave's total bytes replaces per-copy waits
    #   (halves the scalar work vs the original per-copy wait loop);
    # - two banks pipeline: wave w+1's copies are issued while wave w is
    #   being waited on.
    # A WAVE whose ids are all invalid (act[w] == 0) skips its issue AND
    # wait: in the lock-step beam search (ops/beam.py) converged queries
    # feed all -1 tiles (every wave skipped — the round-2 whole-query
    # skip), and the novel-first compaction puts each step's fresh ids at
    # the tile's front so stale slots fall into skippable TRAILING waves.
    # On an issue-bound kernel the cost then tracks rows actually novel.
    # The skip stays all-or-nothing per wave because the byte-counted wait
    # needs a static byte count — per-slot conditional issue would
    # deadlock the wait (and a compensating VMEM self-copy costs the same
    # scalar issue slot it would save).
    n_waves = (r + _WAVE - 1) // _WAVE

    def start_wave(w, lo, size):
        def s(j, c):
            rid = jnp.maximum(ids_ref[0, 0, j], 0)
            pltpu.make_async_copy(
                base_rs.at[pl.ds(rid * sr, sr)],
                rows.at[pl.ds(j * sr, sr)],
                sems.at[w % 2],
            ).start()
            return c

        # Mosaic fori_loop supports only unroll=1 or full unroll; fully
        # unrolling the issue loop removes the per-iteration branch cost
        # from the scalar core's hot path
        jax.lax.fori_loop(lo, lo + size, s, 0, unroll=size)

    def wait_wave(w, lo, size):
        # wait-by-byte-count: the descriptor only sizes the wait (the
        # data already moved via the per-row copies above), so src ==
        # dst == the wave's scratch slice — always in bounds even when
        # the base has fewer than `size` rows
        sl = rows.at[pl.ds(lo * sr, size * sr)]
        pltpu.make_async_copy(sl, sl, sems.at[w % 2]).wait()

    sizes = [min(_WAVE, r - w * _WAVE) for w in range(n_waves)]

    def guarded_start(w):
        @pl.when(act_ref[0, 0, w] > 0)
        def _():
            start_wave(w, w * _WAVE, sizes[w])

    def guarded_wait(w):
        @pl.when(act_ref[0, 0, w] > 0)
        def _():
            wait_wave(w, w * _WAVE, sizes[w])

    guarded_start(0)
    for w in range(n_waves):  # static unroll (n_waves is tiny)
        if w + 1 < n_waves:
            guarded_start(w + 1)
        guarded_wait(w)

    # All intermediates stay >= 2D (Mosaic cannot lay out 1D vectors).
    q = q_ref[:]  # (1, SR, 128) broadcasts over candidates
    v = rows[:].reshape(r, sr, 128).astype(jnp.float32)  # (r, SR, 128);
    # dim-padding lanes are zero in BOTH; bf16 slabs upcast here (distance
    # math stays f32)
    if dist == "l2sqr":
        diff = v - q
        d = jnp.sum(jnp.sum(diff * diff, axis=2), axis=1, keepdims=True)  # (r, 1)
    else:
        dots = jnp.sum(jnp.sum(v * q, axis=2), axis=1, keepdims=True)
        vn = jnp.sqrt(jnp.sum(jnp.sum(v * v, axis=2), axis=1, keepdims=True))
        # |q| comes via SMEM: reducing the (1, SR) query square-sum in-kernel
        # trips a Mosaic relayout bug on replicated singleton rows
        d = 1.0 - dots / jnp.maximum(vn * qn_ref[0, 0, 0], 1e-10)
    out_ref[0] = jnp.where(idv_ref[0] >= 0, d, jnp.inf)


_WAVE_MQ = 16  # finer skip granularity than the 1-query kernel's 32: the
# beam search's mid-iteration tiles hold ~40 novel rows of r=128, so wave
# rounding at 32 issued ~1.5x the novel count; at 16 it is ~1.15x


def _gather_dist_kernel_mq(
    ids_ref,  # SMEM (BQ, r) int32 — DMA source ids (scalar-readable)
    nw_ref,  # SMEM (BQ, 1) int32 — active-wave count per query (prefix)
    idv_ref,  # VMEM (BQ, r) int32 — same ids, vector copy for masking
    qn_ref,  # VMEM (BQ, 128) f32 — |q| broadcast rows (cosine only)
    q_ref,  # VMEM (BQ, SR, 128) f32 — queries in slab layout
    base_rs,  # ANY (N*SR, 128) — row-slab base, DMA'd manually
    out_ref,  # VMEM (BQ, r) f32
    rows,  # scratch VMEM (BQ*r*SR, 128)
    sem,  # scratch DMA sem ()
    *,
    dist: str,
    r: int,
    sr: int,
    bq: int,
):
    """Multi-query variant of `_gather_dist_kernel`: BQ queries per grid
    step, so the per-grid-step fixed cost (measured ~1.3 us/step — 1.3 ms
    of pure overhead per lock-step beam iteration at B=1000) is amortized
    BQ-fold, and the distance epilogue runs at full sublane utilization on
    a clean (BQ, r) output tile instead of (1, r, 1).

    Wave skip is a DYNAMIC LOOP over each query's active-wave PREFIX
    (nw_ref) rather than a static unroll of per-wave branch guards: the
    per-wave `@pl.when` form emits n_waves*BQ branch regions whose
    fall-through cost alone measured ~0.4 ms/iteration at B=1000.  Callers
    with compacted ids (the beam search) get exact prefix counts; callers
    with scattered validity get the covering prefix (stale slots inside it
    issue a harmless clamped row-0 copy).  All copies signal ONE byte-
    counted semaphore; the wait pass drains the same wave sizes, and since
    every wait precedes the epilogue, the final wait cannot complete until
    every issued byte has landed — per-copy attribution is irrelevant."""
    n_waves = (r + _WAVE_MQ - 1) // _WAVE_MQ

    def issue_q(qi):
        def wave(w, c):
            lo = w * _WAVE_MQ

            def s(j, cc):
                rid = jnp.maximum(ids_ref[qi, lo + j], 0)
                pltpu.make_async_copy(
                    base_rs.at[pl.ds(rid * sr, sr)],
                    rows.at[pl.ds((qi * r + lo + j) * sr, sr)],
                    sem,
                ).start()
                return cc

            jax.lax.fori_loop(0, _WAVE_MQ, s, 0, unroll=_WAVE_MQ)
            return c

        jax.lax.fori_loop(0, nw_ref[qi, 0], wave, 0)

    def wait_q(qi):
        def wave(w, c):
            lo = w * _WAVE_MQ
            sl = rows.at[pl.ds((qi * r + lo) * sr, _WAVE_MQ * sr)]
            pltpu.make_async_copy(sl, sl, sem).wait()
            return c

        jax.lax.fori_loop(0, nw_ref[qi, 0], wave, 0)

    for qi in range(bq):  # static: issue everything first (all in flight)
        issue_q(qi)
    for qi in range(bq):
        wait_q(qi)

    # Distance epilogue, chunked over candidate slots with active-prefix
    # skip: slots past every query's active prefix were never fetched, so
    # their chunks keep the +inf fill and cost nothing.  Mid-search beam
    # tiles hold ~40 novel slots of r=128 (epilogue ~3x cheaper) and a
    # fully-converged step skips the epilogue outright.
    mx = nw_ref[0, 0]
    for qi in range(1, bq):
        mx = jnp.maximum(mx, nw_ref[qi, 0])
    out_ref[:] = jnp.full(out_ref.shape, jnp.inf, jnp.float32)
    q = q_ref[:]  # (BQ, SR, 128)
    rows4 = rows[:].reshape(bq, r, sr, 128)
    CH = 32  # slots per chunk (= 2 waves; r is a multiple of 16)
    for c0 in range(0, r, CH):
        c1 = min(c0 + CH, r)

        @pl.when(c0 < mx * _WAVE_MQ)
        def _(c0=c0, c1=c1):
            v = rows4[:, c0:c1].astype(jnp.float32)
            if dist == "l2sqr":
                diff = v - q[:, None]
                d = jnp.sum(jnp.sum(diff * diff, axis=3), axis=2)  # (BQ, c1-c0)
            else:
                dots = jnp.sum(jnp.sum(v * q[:, None], axis=3), axis=2)
                vn = jnp.sqrt(jnp.sum(jnp.sum(v * v, axis=3), axis=2))
                d = 1.0 - dots / jnp.maximum(vn * qn_ref[:, :1], 1e-10)
            out_ref[:, c0:c1] = jnp.where(idv_ref[:, c0:c1] >= 0, d, jnp.inf)


@functools.partial(jax.jit, static_argnames=("dist", "interpret"))
def gather_dists_rs(
    queries: jax.Array,  # (B, dim) f32
    base_rs: jax.Array,  # (N*SR, 128) f32 from prepare_rerank_base
    ids: jax.Array,  # (B, r) int32, -1 padded
    dist: str,
    interpret: bool = False,
) -> jax.Array:
    """Exact f32 distances base[ids[b, j]] <-> queries[b] -> (B, r) f32.

    Invalid ids (< 0) produce +inf.  8 queries per grid step (see
    `_gather_dist_kernel_mq`; Mosaic block sublane dims must be multiples
    of 8); candidate widths whose 8-query row scratch would exceed ~8 MB
    of VMEM delegate to the single-query kernel."""
    B, dim = queries.shape
    dim_pad = rerank_dim_pad(dim)
    sr = dim_pad // 128
    r = ids.shape[1]
    r_in = r
    # queries per grid step: more queries/step = more DMAs in flight across
    # each serialized issue->wait boundary and fewer per-step fixed costs;
    # bounded by the row-scratch VMEM (~16 MB budget of the 48 MB limit).
    bq = int(os.environ.get("VECDB_TPU_GATHER_BQ", "16"))
    while bq > 8 and bq * ((r + 15) // 16 * 16) * sr * 512 > 16 * 1024 * 1024:
        bq //= 2
    if bq * ((r + 15) // 16 * 16) * sr * 512 > 16 * 1024 * 1024:
        return gather_dists_rs_1q(queries, base_rs, ids, dist,
                                  interpret=interpret)
    if r % 16:
        # lane-align the candidate axis to the wave size
        pad = 16 - r % 16
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        r = r + pad
    bp = ((B + bq - 1) // bq) * bq
    if bp != B:
        queries = jnp.pad(queries, ((0, bp - B), (0, 0)))
        ids = jnp.pad(ids, ((0, bp - B), (0, 0)), constant_values=-1)
    q = queries.astype(jnp.float32)
    if dim_pad != dim:
        q = jnp.pad(q, ((0, 0), (0, dim_pad - dim)))
    q_norms = jnp.broadcast_to(
        jnp.sqrt(jnp.sum(q * q, axis=1))[:, None], (bp, 128)
    )
    q = q.reshape(bp, sr, 128)
    n_waves = (r + _WAVE_MQ - 1) // _WAVE_MQ
    act = jnp.any(ids.reshape(bp, n_waves, _WAVE_MQ) >= 0, axis=2)
    # covering active-wave prefix (== exact count for compacted tiles)
    nw = jnp.max(
        jnp.where(act, jnp.arange(1, n_waves + 1, dtype=jnp.int32)[None, :], 0),
        axis=1, keepdims=True,
    )
    kernel = functools.partial(
        _gather_dist_kernel_mq, dist=dist, r=r, sr=sr, bq=bq
    )
    out = pl.pallas_call(
        kernel,
        grid=(bp // bq,),
        in_specs=[
            pl.BlockSpec((bq, r), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, r), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, sr, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((bq, r), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, r), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bq * r * sr, 128), base_rs.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        # the 8-query row scratch alone is 8 MB at r=256; the v5e's
        # scoped-vmem default (16 MB) needs raising for the wider beam
        # tiles (the ADC kernels already run with a raised limit)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(ids, nw, ids, q_norms, q, base_rs)
    return out[:B, :r_in]


@functools.partial(jax.jit, static_argnames=("dist", "interpret"))
def gather_dists_rs_1q(
    queries: jax.Array,  # (B, dim) f32
    base_rs: jax.Array,  # (N*SR, 128) f32 from prepare_rerank_base
    ids: jax.Array,  # (B, r) int32, -1 padded
    dist: str,
    interpret: bool = False,
) -> jax.Array:
    """Single-query-per-grid-step variant (the original kernel), kept for
    A/B measurement and as a fallback envelope.
    """
    B, dim = queries.shape
    dim_pad = rerank_dim_pad(dim)
    sr = dim_pad // 128
    r = ids.shape[1]
    r_in = r
    if r % 8:
        # sublane-align the candidate axis: r=1 (a beam search's entry-point
        # probe) trips a Mosaic singleton-relayout bug, and non-multiple-of-8
        # r wastes a partial sublane tile anyway.  Padded slots are -1 -> inf.
        pad = 8 - r % 8
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        r = r + pad
    q = queries.astype(jnp.float32)
    if dim_pad != dim:
        q = jnp.pad(q, ((0, 0), (0, dim_pad - dim)))
    q_norms = jnp.sqrt(jnp.sum(q * q, axis=1)).reshape(B, 1, 1)
    q = q.reshape(B, sr, 128)
    ids3 = ids.reshape(B, 1, r)
    # per-wave activity flags: wave w covers slots [w*_WAVE, (w+1)*_WAVE)
    n_waves = (r + _WAVE - 1) // _WAVE
    pad_w = n_waves * _WAVE - r
    ids_w = jnp.pad(ids, ((0, 0), (0, pad_w)), constant_values=-1) if pad_w else ids
    act = (
        jnp.any(ids_w.reshape(B, n_waves, _WAVE) >= 0, axis=2)
        .astype(jnp.int32)
        .reshape(B, 1, n_waves)
    )
    idc = ids.reshape(B, r, 1)
    kernel = functools.partial(_gather_dist_kernel, dist=dist, r=r, sr=sr)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, r), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_waves), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, r, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, r, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, r, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((r * sr, 128), base_rs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ids3, q_norms, act, idc, q, base_rs)
    return out.reshape(B, r)[:, :r_in]


def gather_dists(
    queries: jax.Array,
    base: jax.Array,  # (N, dim) f32 — transformed internally (copies!)
    ids: jax.Array,
    dist: str,
    interpret: bool = False,
) -> jax.Array:
    """Convenience wrapper over `gather_dists_rs` for one-off calls; hot
    paths should cache `prepare_rerank_base(base)` and call the _rs form."""
    return gather_dists_rs(queries, prepare_rerank_base(base), ids, dist, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("k", "dist", "interpret"))
def rerank_topk_rs(
    queries: jax.Array,  # (B, dim) f32
    base_rs: jax.Array,  # (N*SR, 128) f32
    ids: jax.Array,  # (B, r) int32 candidates, -1 padded
    k: int,
    dist: str,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over candidate ids: DMA-gather + f32 distance + top_k.

    Returns ((B, k) f32 dists ascending, (B, k) int32 ids, -1 padded).
    """
    d = gather_dists_rs(queries, base_rs, ids, dist, interpret=interpret)
    kk = min(k, d.shape[1])
    nd, pos = jax.lax.top_k(-d, kk)
    bi = jnp.take_along_axis(ids, pos, axis=1)
    bd = -nd
    if kk < k:
        bd = jnp.pad(bd, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
        bi = jnp.pad(bi, ((0, 0), (0, k - kk)), constant_values=-1)
    return bd, jnp.where(jnp.isfinite(bd), bi, -1)


def rerank_topk(queries, base, ids, k, dist, interpret=False):
    """Convenience wrapper over `rerank_topk_rs` (copies base every call)."""
    return rerank_topk_rs(
        queries, prepare_rerank_base(base), ids, k, dist, interpret=interpret
    )


@functools.partial(jax.jit, static_argnames=("k", "dist", "block", "interpret"))
def rerank_topk_blocked(
    queries: jax.Array,  # (B, dim) f32
    base_rs: jax.Array,  # (N*SR, 128) f32
    ids: jax.Array,  # (B, C) int32 candidates, -1 padded; C may be large
    k: int,
    dist: str,
    block: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over a WIDE candidate list (e.g. IVF posting unions).

    Streams the candidates through the DMA-gather kernel `block` ids at a
    time with a running top-k merge, so the gathered vectors never exceed
    (B, block, dim) — an XLA `base[ids]` gather would materialize the whole
    (B, C, dim) tensor (tens of GB for IVF probe unions).
    """
    from .topk import INVALID_ID, merge_topk, topk_smallest

    B, C = ids.shape
    if C <= block:
        return rerank_topk_rs(queries, base_rs, ids, k, dist, interpret=interpret)
    pad = (-C) % block
    if pad:
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
    n_blocks = ids.shape[1] // block
    kk = min(k, block)

    def body(carry, blk):
        best_d, best_i = carry
        sl = jax.lax.dynamic_slice(ids, (0, blk * block), (B, block))
        d = gather_dists_rs(queries, base_rs, sl, dist, interpret=interpret)
        td, ti = topk_smallest(d, sl, kk)
        return merge_topk(best_d, best_i, td, ti, kk), None

    init = (
        jnp.full((B, kk), jnp.inf, jnp.float32),
        jnp.full((B, kk), INVALID_ID, jnp.int32),
    )
    (bd, bi), _ = jax.lax.scan(body, init, jnp.arange(n_blocks, dtype=jnp.int32))
    if kk < k:
        bd = jnp.pad(bd, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
        bi = jnp.pad(bi, ((0, 0), (0, k - kk)), constant_values=-1)
    return bd, jnp.where(jnp.isfinite(bd), bi, -1)
