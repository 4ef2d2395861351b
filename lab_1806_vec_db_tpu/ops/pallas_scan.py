"""Pallas TPU kernel: fused distance-scan + chunk-min partial reduction.

Why this kernel exists: XLA compiles the (B, dim) x (dim, N) scan GEMM with
the query rows as the outer loop, so the full base set streams from HBM once
per 128-query row tile — at B=1024 / N=1M that is 8 x 1.92 GB of reads and a
2 GB distance-matrix round trip before top-k.  This kernel inverts the loop:
the whole query block stays resident in VMEM, each base tile is read ONCE,
and the distance tile is reduced on the spot to one (min, argmin) survivor
per 128-row chunk — the (B, N) matrix never exists in HBM.  The caller then
runs an exact top-r over the (B, N/128) survivors, which is ~1% of the
original traffic.

This is the TPU-native replacement for the reference's flat-scan hot loop
(src/index_algorithm/flat_index.rs:48-57, scalar distance loops
src/distance/mod.rs:71-95).

Accuracy: distances accumulate in f32 on the MXU (bf16 inputs), strictly
better than the previous bf16 distance matrix.  The chunk-min reduction is
exact-by-construction for the #1 neighbor; for top-r it assumes at most one
true candidate per 128 consecutive MIRROR rows — the int8 mirror therefore
stores rows under a fixed random permutation (store.device_int8) so any
storage order de-clusters; ids decode via topk.decode_perm.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NB = 1024  # base rows per grid step
_CHUNK = 128  # rows per surviving candidate (one VPU lane-reduce)


def _scan_kernel(
    nvalid_ref,  # SMEM (1, 1) int32
    q_ref,  # VMEM (B, dim) bf16 — resident across all grid steps
    qc_ref,  # VMEM (B, 1) f32 query dist-cache
    cache_ref,  # VMEM (1, NB) f32 base dist-cache tile
    base_ref,  # VMEM (NB, dim) bf16 base tile
    outd_ref,  # VMEM (1, B, NB/CHUNK) f32 — one grid-step slab
    outi_ref,  # VMEM (1, B, NB/CHUNK) int32
    *,
    dist: str,
):
    i = pl.program_id(0)
    B = q_ref.shape[0]
    NB = base_ref.shape[0]

    dots = jax.lax.dot_general(
        q_ref[:],
        base_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, NB) f32 accumulation on the MXU
    if dist == "l2sqr":
        d = qc_ref[:] + cache_ref[:] - 2.0 * dots
    else:  # cosine: cache rows hold |x|, qc holds |q|
        denom = jnp.maximum(qc_ref[:] * cache_ref[:], 1e-10)
        d = 1.0 - dots / denom

    col = jax.lax.broadcasted_iota(jnp.int32, (B, NB), 1) + i * NB
    d = jnp.where(col < nvalid_ref[0, 0], d, jnp.inf)

    # chunk-min: one survivor per CHUNK consecutive base rows
    mins, args = [], []
    for s in range(NB // _CHUNK):
        seg = d[:, s * _CHUNK : (s + 1) * _CHUNK]  # (B, 128)
        mins.append(jnp.min(seg, axis=1))
        a = jnp.argmin(seg, axis=1).astype(jnp.int32)
        args.append(i * NB + s * _CHUNK + a)
    outd_ref[0] = jnp.stack(mins, axis=1)
    outi_ref[0] = jnp.stack(args, axis=1)


@functools.partial(jax.jit, static_argnames=("dist", "interpret"))
def scan_chunkmin(
    queries_scan: jax.Array,  # (B, dim) bf16 (or base dtype)
    q_cache: jax.Array,  # (B,) f32
    base_scan: jax.Array,  # (N_pad, dim) bf16
    base_cache: jax.Array,  # (N_pad,) f32
    n_valid: jax.Array,  # () int32
    dist: str,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused scan: per-(query, 128-row-chunk) min distance and argmin id.

    Returns ((B, N_pad/128) f32 dists, (B, N_pad/128) int32 global ids).
    Rows >= n_valid come back as +inf / arbitrary id.
    """
    B, dim = queries_scan.shape
    n_pad0 = base_scan.shape[0]
    n_pad = ((n_pad0 + _NB - 1) // _NB) * _NB
    if n_pad != n_pad0:
        base_scan = jnp.pad(base_scan, ((0, n_pad - n_pad0), (0, 0)))
        base_cache = jnp.pad(base_cache, (0, n_pad - n_pad0))
    G = n_pad // _NB  # grid steps
    SB = _NB // _CHUNK  # survivors per step

    kernel = functools.partial(_scan_kernel, dist=dist)
    outd, outi = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _NB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_NB, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, B, SB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, SB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, B, SB), jnp.float32),
            jax.ShapeDtypeStruct((G, B, SB), jnp.int32),
        ),
        interpret=interpret,
    )(
        jnp.reshape(n_valid.astype(jnp.int32), (1, 1)),
        queries_scan,
        q_cache.astype(jnp.float32)[:, None],
        base_cache.astype(jnp.float32)[None, :],
        base_scan,
    )
    # (G, B, SB) -> (B, G*SB): survivor columns in base-row order
    outd = jnp.transpose(outd, (1, 0, 2)).reshape(B, G * SB)
    outi = jnp.transpose(outi, (1, 0, 2)).reshape(B, G * SB)
    return outd, outi


def _dist_kernel_int8(
    nvalid_ref,  # SMEM (1, 1) int32
    q_ref,  # VMEM (B, dim) int8 — resident across all grid steps
    qs_ref,  # VMEM (B, 1) f32 query dequant scales
    qc_ref,  # VMEM (B, 1) f32 query dist-cache
    scale_ref,  # VMEM (1, NB) f32 base dequant scales tile
    cache_ref,  # VMEM (1, NB) f32 base dist-cache tile
    base_ref,  # VMEM (NB, dim) int8 base tile
    out_ref,  # VMEM (B, NB) bf16 distance tile
    *,
    dist: str,
):
    i = pl.program_id(0)
    B = q_ref.shape[0]
    NB = base_ref.shape[0]
    dots = jax.lax.dot_general(
        q_ref[:],
        base_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # drop to bf16 immediately: the int32/f32 (B, NB) intermediates are the
    # kernel's VMEM high-water mark
    dots_f = dots.astype(jnp.bfloat16) * (qs_ref[:] * scale_ref[:]).astype(jnp.bfloat16)
    if dist == "l2sqr":
        d = (qc_ref[:] + cache_ref[:]).astype(jnp.bfloat16) - 2.0 * dots_f
    else:
        denom = jnp.maximum(qc_ref[:] * cache_ref[:], 1e-10)
        d = 1.0 - dots_f / denom.astype(jnp.bfloat16)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, NB), 1) + i * NB
    out_ref[:] = jnp.where(col < nvalid_ref[0, 0], d, jnp.inf)


@functools.partial(jax.jit, static_argnames=("dist", "interpret"))
def scan_dist_int8(
    q8: jax.Array,  # (B, dim) int8
    q_scale: jax.Array,  # (B,) f32
    q_cache: jax.Array,  # (B,) f32
    base_i8: jax.Array,  # (N_pad, dim) int8
    base_scale: jax.Array,  # (N_pad,) f32
    base_cache: jax.Array,  # (N_pad,) f32
    n_valid: jax.Array,
    dist: str,
    interpret: bool = False,
) -> jax.Array:
    """Fused int8 distance scan with queries RESIDENT in VMEM.

    XLA's (B, dim) x (dim, N) GEMM re-streams the base once per 128-query
    row tile; this kernel pins the whole (quantized) query block in VMEM and
    streams each base tile exactly once, writing the selection-grade bf16
    distance tile.  Rows >= n_valid come back +inf.  Top-k runs outside
    (`lax.approx_min_k` fuses with the bf16 read).
    """
    B, dim = q8.shape
    n_pad0 = base_i8.shape[0]
    n_pad = ((n_pad0 + _NB - 1) // _NB) * _NB
    if n_pad != n_pad0:
        base_i8 = jnp.pad(base_i8, ((0, n_pad - n_pad0), (0, 0)))
        base_scale = jnp.pad(base_scale, (0, n_pad - n_pad0))
        base_cache = jnp.pad(base_cache, (0, n_pad - n_pad0))
    kernel = functools.partial(_dist_kernel_int8, dist=dist)
    return pl.pallas_call(
        kernel,
        grid=(n_pad // _NB,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _NB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _NB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_NB, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, _NB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad), jnp.bfloat16),
        interpret=interpret,
    )(
        jnp.reshape(n_valid.astype(jnp.int32), (1, 1)),
        q8,
        q_scale.astype(jnp.float32)[:, None],
        q_cache.astype(jnp.float32)[:, None],
        base_scale.astype(jnp.float32)[None, :],
        base_cache.astype(jnp.float32)[None, :],
        base_i8,
    )


_NB_T = 2048  # base rows per grid step (transposed kernel; VMEM-bounded)
_CB_T = 512  # rows per inner MXU chunk: bounds the (CB, B) int32 dots tile


def _scan_kernel_int8_t(
    nvalid_ref,  # SMEM (1, 1) int32
    qT_ref,  # VMEM (dim, B) int8 — resident across all grid steps
    qs_ref,  # VMEM (1, B) f32 query dequant scales
    qc_ref,  # VMEM (1, B) f32 query dist-cache
    scale_ref,  # VMEM (NB, 1) f32 base dequant scales tile
    cache_ref,  # VMEM (NB, 1) f32 base dist-cache tile
    base_ref,  # VMEM (NB, dim) int8 base tile
    outd_ref,  # VMEM (NB/CHUNK, B) f32 survivor mins
    outi_ref,  # VMEM (NB/CHUNK, B) int32 survivor global ids
    *,
    dist: str,
):
    """Transposed distance tile: base rows on SUBLANES, queries on lanes.

    The chunk-min then reduces over the sublane axis — far cheaper on the
    VPU than the cross-lane shuffle chain the (B, NB) orientation needs.
    """
    i = pl.program_id(0)
    NB = base_ref.shape[0]
    B = qT_ref.shape[1]
    qs = qs_ref[:]  # (1, B)
    qc = qc_ref[:]

    for c in range(NB // _CB_T):
        bchunk = base_ref[c * _CB_T : (c + 1) * _CB_T, :]  # (CB, dim) int8
        scale_c = scale_ref[c * _CB_T : (c + 1) * _CB_T, :]  # (CB, 1)
        cache_c = cache_ref[c * _CB_T : (c + 1) * _CB_T, :]
        dots = jax.lax.dot_general(
            bchunk,
            qT_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (CB, B) int32 on the MXU
        dots_f = dots.astype(jnp.bfloat16) * (scale_c * qs).astype(jnp.bfloat16)
        if dist == "l2sqr":
            d = (cache_c + qc).astype(jnp.bfloat16) - 2.0 * dots_f
        else:  # cosine: cache rows hold |x|, qc holds |q|
            denom = jnp.maximum(cache_c * qc, 1e-10)
            d = 1.0 - dots_f / denom.astype(jnp.bfloat16)
        row0 = i * NB + c * _CB_T
        row = jax.lax.broadcasted_iota(jnp.int32, (_CB_T, B), 0) + row0
        d = jnp.where(row < nvalid_ref[0, 0], d, jnp.inf).astype(jnp.float32)

        mins, args = [], []
        for s in range(_CB_T // _CHUNK):
            seg = d[s * _CHUNK : (s + 1) * _CHUNK, :]  # (128, B)
            m = jnp.min(seg, axis=0)  # sublane reduce -> (B,)
            sub = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, B), 0)
            a = jnp.min(jnp.where(seg == m[None, :], sub, _CHUNK), axis=0)
            mins.append(m)
            args.append(row0 + s * _CHUNK + a)
        o0 = c * (_CB_T // _CHUNK)
        outd_ref[o0 : o0 + _CB_T // _CHUNK, :] = jnp.stack(mins, axis=0)
        outi_ref[o0 : o0 + _CB_T // _CHUNK, :] = jnp.stack(args, axis=0)


@functools.partial(jax.jit, static_argnames=("dist", "interpret"))
def scan_chunkmin_int8_t(
    q8: jax.Array,  # (B, dim) int8
    q_scale: jax.Array,  # (B,) f32
    q_cache: jax.Array,  # (B,) f32
    base_i8: jax.Array,  # (N_pad, dim) int8
    base_scale: jax.Array,  # (N_pad,) f32
    base_cache: jax.Array,  # (N_pad,) f32
    n_valid: jax.Array,
    dist: str,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused int8 scan + chunk-min, queries resident, base streamed ONCE.

    Returns ((N_pad/128, B) f32 survivor dists, (N_pad/128, B) int32 global
    ids): the min / argmin over each 128 consecutive base rows, computed in
    the (base, query) orientation so the reduction runs over sublanes.
    """
    B, dim = q8.shape
    n_pad0 = base_i8.shape[0]
    n_pad = ((n_pad0 + _NB_T - 1) // _NB_T) * _NB_T
    if n_pad != n_pad0:
        base_i8 = jnp.pad(base_i8, ((0, n_pad - n_pad0), (0, 0)))
        base_scale = jnp.pad(base_scale, (0, n_pad - n_pad0))
        base_cache = jnp.pad(base_cache, (0, n_pad - n_pad0))
    G = n_pad // _NB_T
    SB = _NB_T // _CHUNK

    kernel = functools.partial(_scan_kernel_int8_t, dist=dist)
    outd, outi = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((dim, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_NB_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_NB_T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_NB_T, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((SB, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G * SB, B), jnp.float32),
            jax.ShapeDtypeStruct((G * SB, B), jnp.int32),
        ),
        interpret=interpret,
    )(
        jnp.reshape(n_valid.astype(jnp.int32), (1, 1)),
        q8.T,
        q_scale.astype(jnp.float32)[None, :],
        q_cache.astype(jnp.float32)[None, :],
        base_scale.astype(jnp.float32)[:, None],
        base_cache.astype(jnp.float32)[:, None],
        base_i8,
    )
    return outd, outi


_BIG = 3.0e38  # finite sentinel: keeps packed bits non-NaN (plain float: jnp consts cannot be captured by kernels)

# Blocked (N/128, 128) channel operands for the packed full scan (see
# _scan_kernel_int8_packed_bc): zero-padding HBM layout vs the (N, 1)
# form's 128x lane padding.  Env-gated for A/B measurement.
_BLOCKED_CHANNELS = os.environ.get("VECDB_TPU_BLOCKED_CHANNELS", "1") == "1"


def set_blocked_channels(enabled: bool) -> None:
    """A/B seam for the blocked-channel kernel variants (ADVICE r3 #4: the
    env var was read once at import, so one process could never exercise
    both).  The flag is read at TRACE time inside jitted wrappers — call
    `jax.clear_caches()` after flipping so cached traces don't pin the old
    variant."""
    global _BLOCKED_CHANNELS
    _BLOCKED_CHANNELS = bool(enabled)


def query_channels(q_scale: jax.Array, q_cache: jax.Array, dist: str):
    """Query-side (qs2, qc) for the unified kernel formula
    d = cache_x + qc - dots * (scale_x * qs2) — see _scan_kernel_int8_packed.
    q_cache is D.dist_cache(q, dist): |q|^2 for l2sqr, |q| for cosine."""
    q_scale = q_scale.astype(jnp.float32)
    q_cache = q_cache.astype(jnp.float32)
    if dist == "l2sqr":
        return 2.0 * q_scale, q_cache
    return q_scale / jnp.maximum(q_cache, 1e-20), jnp.ones_like(q_cache)


def _tiles_for(dim: int) -> tuple[int, int]:
    """(NB, CB) grid/inner tile rows for the packed int8 scan, VMEM-bounded.

    Measured on v5e at N=1e6, B=1024: full-lane dims are worth ~40% (dim
    960 -> padded 1024: 137 -> 189 TOPS at this tile shape; store.device_int8
    pads).  NB=4096 crashes the TPU compiler (any CB, with or without the
    epilogue's masking), so the shape is pinned to the proven envelope.
    CB=NB=2048 (one MXU call per grid step) measured 15.6 ms vs 19.9 ms for
    the old CB=512 + `lax.cond` boundary masking at N=1e6/B=1024 — the cond
    alone cost 3.4 ms (validity now rides the cache-channel sentinels
    exclusively), the full-tile halving min tree another ~1 ms.
    """
    return 2048, 2048


def _scan_kernel_int8_packed(
    qT_ref,  # VMEM (dim, B) int8 — resident across all grid steps
    qs2_ref,  # VMEM (1, B) f32 query cross-term factor (see CHANNELS below)
    qc_ref,  # VMEM (1, B) f32 query additive term
    scale_ref,  # VMEM (NB, 1) f32 base cross-term factors tile
    cache_ref,  # VMEM (NB, 1) f32 base additive terms tile
    base_ref,  # VMEM (NB, dim) int8 base tile
    out_ref,  # VMEM (NB/CHUNK, B) int32: packed (f32 dist bits | group level)
    *,
    dist: str,
    cb: int,
):
    """Packed group-min: one sortable int32 per (128-row group, query).

    The f32 distance's low 7 mantissa bits are replaced by the row's level
    within its STRIDED group (see below), so a min-reduce yields both the
    (16-mantissa-bit) min distance and its argmin — no separate
    compare/select argmin chain.  Positive-f32 bit patterns sort identically
    as int32, so the packed value is ordered by distance; callers may even
    bitcast the packed array to f32 and run `approx_min_k` on it directly.

    Survivor groups are STRIDED, not consecutive: with SB = CB/128 survivors
    per chunk, survivor s is the min over rows {s, s+SB, s+2*SB, ...} and the
    packed low bits hold level = row//SB (0..127).  Under the mirror's fixed
    random permutation any 128-row partition is statistically identical, and
    the strided layout lets the reduce run as a log2 halving chain of
    full-tile `minimum` ops (m[:h] vs m[h:2h]) instead of per-segment sublane
    reduces — measured ~1 ms cheaper per 1M rows at B=1024.

    There is NO positional validity masking: invalid rows (beyond n, or
    permutation holes) must carry +BIG in the cache channel — the sentinel
    contract of store.device_int8; the wrapper pads its own NB-alignment
    rows the same way.  (The old `lax.cond` boundary mask measured 3.4 ms
    per 1M-row scan — Mosaic cannot pipeline across it.)

    CHANNELS — one distance formula for BOTH metrics:
        d = cache_x + qc_q - dots * (scale_x * qs2_q)
    l2sqr:  cache=|x|^2, qc=|q|^2, scale=s_x, qs2=2*s_q
    cosine: cache=0,     qc=1,     scale=s_x/|x|, qs2=s_q/|q|
    (1 - cos = 1 - dot/(|x||q|); the norms fold into the cross factors, so
    the cache channel is a free ADDITIVE BIAS: rows carrying +BIG there lose
    every min for both metrics, with no per-element division in the
    epilogue.)
    """
    NB = base_ref.shape[0]
    B = qT_ref.shape[1]
    qs2 = qs2_ref[:]  # (1, B)
    qc = qc_ref[:]
    CB = cb
    SB = CB // _CHUNK

    # loop-invariant level bits: same (CB, B) tile for every chunk
    lvl = jax.lax.broadcasted_iota(jnp.int32, (CB, B), 0) // SB

    for c in range(NB // CB):
        scale_c = scale_ref[c * CB : (c + 1) * CB, :]  # (CB, 1)
        cache_c = cache_ref[c * CB : (c + 1) * CB, :]
        dots = jax.lax.dot_general(
            base_ref[c * CB : (c + 1) * CB, :],
            qT_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (CB, B) int32 on the MXU
        dots_f = dots.astype(jnp.float32)
        d = (cache_c + qc) - dots_f * (scale_c * qs2)

        # pack: drop 7 mantissa bits, insert the strided-group level.  No
        # clamping: inputs are finite so d cannot be NaN/inf, and
        # slightly-negative d (rounding of a true-zero distance) bitcasts to
        # a negative int32 that still sorts FIRST under the int min — i.e.
        # near-zero distances win, which is the right stage-1 outcome; the
        # exact rerank restores true distances.
        bits = pltpu.bitcast(d, jnp.int32)
        m = (bits & jnp.int32(~(_CHUNK - 1))) | lvl

        # halving min chain: full-rate elementwise tiles all the way down
        h = CB // 2
        while h >= SB:
            m = jnp.minimum(m[:h, :], m[h : 2 * h, :])
            h //= 2
        out_ref[c * SB : (c + 1) * SB, :] = m


def _chcol_from_blocked(A: jax.Array) -> jax.Array:
    """(NB/128, 128) lane-major channel tile -> (NB, 1) column.

    Mosaic cannot shape-cast lanes into sublanes directly (`reshape`
    (NB/128,128)->(NB,1) is an unsupported relayout), so the column is
    built arithmetically: replicate each 128-lane row down 128 sublanes,
    then select lane (row % 128) by mask and lane-reduce.  ~2 VPU passes
    over (NB, 128) — microseconds against the grid step's MXU work."""
    R8, L = A.shape
    NB = R8 * L
    Arep = jnp.broadcast_to(A[:, None, :], (R8, L, L)).reshape(NB, L)
    lane = jax.lax.broadcasted_iota(jnp.int32, (NB, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (NB, L), 0)
    sel = lane == (row & (L - 1))
    return jnp.sum(jnp.where(sel, Arep, 0.0), axis=1, keepdims=True)


def _scan_kernel_int8_packed_bc(
    qT_ref,  # VMEM (dim, B) int8 — resident across all grid steps
    qs2_ref,  # VMEM (1, B) f32
    qc_ref,  # VMEM (1, B) f32
    scale_ref,  # VMEM (NB/128, 128) f32 — blocked, no lane padding in HBM
    cache_ref,  # VMEM (NB/128, 128) f32
    base_ref,  # VMEM (NB, dim) int8 base tile
    out_ref,  # VMEM (NB/CHUNK, B) int32
    *,
    dist: str,
    cb: int,
):
    """`_scan_kernel_int8_packed` with BLOCKED channel operands.

    The (N, 1) f32 channel arrays of the original kernel lane-pad 128x
    under the TPU's T(8,128) layout — XLA materializes ~512 B/row of
    padded copies per call (2 x 2.5 GB HBM transients at N=4M; ~1.3 ms of
    pure padding traffic per 1M rows).  Blocked (N/128, 128) operands have
    zero padding; the (NB, 1) columns the distance formula needs are
    rebuilt in-register per grid step (`_chcol_from_blocked`)."""
    B = qT_ref.shape[1]
    qs2 = qs2_ref[:]
    qc = qc_ref[:]
    NB = base_ref.shape[0]
    CB = cb
    SB = CB // _CHUNK
    scale_col = _chcol_from_blocked(scale_ref[:])
    cache_col = _chcol_from_blocked(cache_ref[:])

    lvl = jax.lax.broadcasted_iota(jnp.int32, (CB, B), 0) // SB
    for c in range(NB // CB):
        scale_c = scale_col[c * CB : (c + 1) * CB, :]
        cache_c = cache_col[c * CB : (c + 1) * CB, :]
        dots = jax.lax.dot_general(
            base_ref[c * CB : (c + 1) * CB, :],
            qT_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        dots_f = dots.astype(jnp.float32)
        d = (cache_c + qc) - dots_f * (scale_c * qs2)
        bits = pltpu.bitcast(d, jnp.int32)
        m = (bits & jnp.int32(~(_CHUNK - 1))) | lvl
        h = CB // 2
        while h >= SB:
            m = jnp.minimum(m[:h, :], m[h : 2 * h, :])
            h //= 2
        out_ref[c * SB : (c + 1) * SB, :] = m


@functools.partial(jax.jit, static_argnames=("dist", "interpret"))
def scan_chunkmin_int8_packed(
    q8: jax.Array,  # (B, dim) int8
    q_scale: jax.Array,  # (B,) f32
    q_cache: jax.Array,  # (B,) f32
    base_i8: jax.Array,  # (N_pad, dim) int8
    base_scale: jax.Array,  # (N_pad,) f32
    base_cache: jax.Array,  # (N_pad,) f32
    n_valid: jax.Array,
    dist: str,
    interpret: bool = False,
) -> jax.Array:
    """Packed-survivor int8 scan.  Returns (N_pad/128, B) int32 where each
    value packs (f32 distance bits & ~127) | strided-group level.  Survivor
    column j (after the caller's transpose) covers chunk j//SB of the base,
    slot s = j % SB; decode: id = (j//SB)*CB + (v & 127)*SB + s;
    dist = bitcast(v & ~127) (16-mantissa-bit).

    `n_valid` is NOT used for masking: validity must ride the cache channel
    as +BIG sentinels (the store.device_int8 contract); NB-alignment padding
    added here gets the same sentinel."""
    B, dim = q8.shape
    NB, CB = _tiles_for(dim)
    n_pad0 = base_i8.shape[0]
    n_pad = ((n_pad0 + NB - 1) // NB) * NB
    if n_pad != n_pad0:
        base_i8 = jnp.pad(base_i8, ((0, n_pad - n_pad0), (0, 0)))
        base_scale = jnp.pad(base_scale, (0, n_pad - n_pad0))
        base_cache = jnp.pad(
            base_cache, (0, n_pad - n_pad0), constant_values=_BIG
        )
    G = n_pad // NB
    SB = NB // _CHUNK

    qs2 = q_scale.astype(jnp.float32)  # caller supplies the full factor
    # (query_channels: 2*s_q for l2sqr, s_q/|q| for cosine)
    if _BLOCKED_CHANNELS:
        # blocked channel operands: zero HBM padding (the (N,1) form
        # lane-pads 128x — ~512 B/row of transient copies per call)
        kernel = functools.partial(_scan_kernel_int8_packed_bc, dist=dist, cb=CB)
        ch_spec = pl.BlockSpec(
            (NB // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        scale_op = base_scale.astype(jnp.float32).reshape(n_pad // 128, 128)
        cache_op = base_cache.astype(jnp.float32).reshape(n_pad // 128, 128)
    else:
        kernel = functools.partial(_scan_kernel_int8_packed, dist=dist, cb=CB)
        ch_spec = pl.BlockSpec((NB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        scale_op = base_scale.astype(jnp.float32)[:, None]
        cache_op = base_cache.astype(jnp.float32)[:, None]
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((dim, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ch_spec,
            ch_spec,
            pl.BlockSpec((NB, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SB, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * SB, B), jnp.int32),
        interpret=interpret,
    )(
        q8.T,
        qs2[None, :],
        q_cache.astype(jnp.float32)[None, :],
        scale_op,
        cache_op,
        base_i8,
    )


_NB_BIN = 512  # sorted-list rows per grid step: lists pad to 512-row
# multiples, so the grid tile matches the padding granularity (a 2048 tile
# would force 4x the list padding); the per-step query block re-fetch is
# ~128 KB against a 512 KB base tile — minor
_SPT = 128  # survivors per tile.  Unlike the full-scan kernel (1 per 128
# rows), a query's true neighbors CONCENTRATE in its own posting list, so
# the binned reduction must keep many more survivors per list: 128 strided
# groups of 4 rows — expected same-group collisions of true top-10 rows at
# list length ~4000 are ~0.05 (~1500: ~0.12).  The strided partition lets
# the reduce run as 2 pairwise sublane-half mins (~1 VPU pass) instead of
# 128 tiny reduces.
_GS = _NB_BIN // _SPT  # rows per survivor group (4) -> 2 packed low bits


def _scan_kernel_int8_binned(
    qbT_ref,  # VMEM (1, dim, QB) int8 — this list's binned queries, transposed
    qs2_ref,  # VMEM (1, 1, QB) f32 query cross-term factors (query_channels)
    qc_ref,  # VMEM (1, 1, QB) f32 query additive terms
    scale_ref,  # VMEM (NB, 1) f32 sorted base dequant scales tile
    cache_ref,  # VMEM (NB, 1) f32 sorted base dist-cache tile (+BIG on pads)
    base_ref,  # VMEM (NB, dim) int8 sorted base tile
    out_ref,  # VMEM (SPT, QB) int32 packed (dist bits | row-level-in-group)
    *,
    dist: str,
):
    """Packed strided group-min over ONE list tile x that list's query bin.

    Identical distance math to `_scan_kernel_int8_packed`, minus all
    validity masking: padded base rows carry a +BIG dist-cache (so they
    lose every min by construction) and padded query slots are simply never
    read back by the caller's regroup step.

    Survivor s of the tile is the min over rows {s, s+_SPT, ...,
    s+(_GS-1)*_SPT} (strided groups); the packed low log2(_GS) bits hold
    the row's level r // _SPT, so row-in-tile = level * _SPT + s.
    """
    NB = base_ref.shape[0]
    QB = qbT_ref.shape[2]
    qs2 = qs2_ref[0]  # (1, QB)
    qc = qc_ref[0]

    dots = jax.lax.dot_general(
        base_ref[:],
        qbT_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (NB, QB) int32 on the MXU
    dots_f = dots.astype(jnp.float32)
    # unified channel formula (see _scan_kernel_int8_packed CHANNELS note)
    d = (cache_ref[:] + qc) - dots_f * (scale_ref[:] * qs2)
    lvl = jax.lax.broadcasted_iota(jnp.int32, (NB, QB), 0) // _SPT  # 0..GS-1
    bits = pltpu.bitcast(d, jnp.int32)
    m = (bits & jnp.int32(~(_GS - 1))) | lvl
    h = NB // 2
    while h >= _SPT:
        m = jnp.minimum(m[:h, :], m[h : 2 * h, :])
        h //= 2
    out_ref[:] = m


def _scan_kernel_int8_binned_bc(
    qbT_ref,  # VMEM (1, dim, QB) int8
    qs2_ref,  # VMEM (1, 1, QB) f32
    qc_ref,  # VMEM (1, 1, QB) f32
    ch_ref,  # VMEM (8, 128) f32 — blocked scale+cache PAIR tile: 1024
    #         channel values covering TWO 512-row grid steps (see wrapper)
    ch2_ref,  # VMEM (8, 128) f32 — second channel (cache)
    base_ref,  # VMEM (NB, dim) int8 sorted base tile
    out_ref,  # VMEM (SPT, QB) int32
    *,
    dist: str,
):
    """`_scan_kernel_int8_binned` with BLOCKED channel operands.

    _NB_BIN = 512 values = 4 sublanes of a (x, 128) blocked array — below
    the (8, 128) Pallas block floor — so each channel block carries 1024
    values (two grid steps) indexed at g // 2, and the kernel selects the
    parity half after the in-register column rebuild.  Removes the (R, 1)
    operands' 128x lane padding (~1 KB/row of HBM transients per call —
    2 x 2.5 GB at N=4M, the allocation that OOMed the fused binned search)."""
    NB = base_ref.shape[0]
    QB = qbT_ref.shape[2]
    qs2 = qs2_ref[0]
    qc = qc_ref[0]
    parity = jax.lax.rem(pl.program_id(0), 2)

    def half(col):  # (1024, 1) -> this grid step's (512, 1)
        return jnp.where(parity == 0, col[:NB, :], col[NB:, :])

    scale_col = half(_chcol_from_blocked(ch_ref[:]))
    cache_col = half(_chcol_from_blocked(ch2_ref[:]))

    dots = jax.lax.dot_general(
        base_ref[:],
        qbT_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dots_f = dots.astype(jnp.float32)
    d = (cache_col + qc) - dots_f * (scale_col * qs2)
    lvl = jax.lax.broadcasted_iota(jnp.int32, (NB, QB), 0) // _SPT
    bits = pltpu.bitcast(d, jnp.int32)
    m = (bits & jnp.int32(~(_GS - 1))) | lvl
    h = NB // 2
    while h >= _SPT:
        m = jnp.minimum(m[:h, :], m[h : 2 * h, :])
        h //= 2
    out_ref[:] = m


@functools.partial(jax.jit, static_argnames=("dist", "interpret", "lpad"))
def scan_chunkmin_int8_binned(
    qbT: jax.Array,  # (nlist, dim, QB) int8 — per-list binned queries
    qs2_b: jax.Array,  # (nlist, 1, QB) f32
    qc_b: jax.Array,  # (nlist, 1, QB) f32
    base_i8: jax.Array,  # (nlist * Lpad, dim) int8, cluster-sorted
    base_scale: jax.Array,  # (nlist * Lpad,) f32
    base_cache: jax.Array,  # (nlist * Lpad,) f32, +BIG on padded rows
    dist: str,
    interpret: bool = False,
    lpad: int | None = None,
) -> jax.Array:
    """Segmented packed group-min: every list scanned once against its bin.

    `Lpad` (= rows per list) must be a multiple of `_NB_BIN`.  Returns
    (nlist * Lpad/_GS, QB) int32 packed survivors; survivor row m of list l
    decodes to sorted row l*Lpad + (m//_SPT)*_NB_BIN + (m%_SPT)
    + low_bits*_SPT (the caller's regroup implements this).

    `lpad` may be passed explicitly when `base_i8` carries extra tail rows
    beyond `nlist * Lpad` (the ingest-sorted mirror stores the overflow
    segment and capacity padding in the same array; the grid simply never
    reads past `nlist * Lpad`).
    """
    nlist, dim, QB = qbT.shape
    total = base_i8.shape[0]
    if lpad is None:
        lpad = total // nlist
    if nlist * lpad > total:
        raise ValueError(
            f"binned scan layout overruns the base array: nlist={nlist} * "
            f"lpad={lpad} > total rows {total}"
        )
    if lpad % _NB_BIN != 0:
        raise ValueError(f"lpad={lpad} must be a multiple of {_NB_BIN}")
    gpl = lpad // _NB_BIN  # grid steps per list
    G = nlist * gpl
    SB = _SPT

    scanned = nlist * lpad  # rows the grid actually reads
    if _BLOCKED_CHANNELS:
        # blocked channels (see _scan_kernel_int8_binned_bc): (R, 1)
        # operands lane-pad 128x in HBM; blocked (Rp/128, 128) pads zero.
        # Each (8, 128) block holds 1024 values = two 512-row grid steps.
        rp = ((scanned + 1023) // 1024) * 1024
        sc = base_scale.astype(jnp.float32)[:scanned]
        ca = base_cache.astype(jnp.float32)[:scanned]
        if rp != scanned:
            sc = jnp.pad(sc, (0, rp - scanned))
            ca = jnp.pad(ca, (0, rp - scanned), constant_values=_BIG)
        kernel = functools.partial(_scan_kernel_int8_binned_bc, dist=dist)
        ch_spec = pl.BlockSpec((8, 128), lambda g: (g // 2, 0), memory_space=pltpu.VMEM)
        scale_op = sc.reshape(rp // 128, 128)
        cache_op = ca.reshape(rp // 128, 128)
    else:
        kernel = functools.partial(_scan_kernel_int8_binned, dist=dist)
        ch_spec = pl.BlockSpec((_NB_BIN, 1), lambda g: (g, 0), memory_space=pltpu.VMEM)
        scale_op = base_scale.astype(jnp.float32)[:, None]
        cache_op = base_cache.astype(jnp.float32)[:, None]
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, dim, QB), lambda g: (g // gpl, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, QB), lambda g: (g // gpl, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, QB), lambda g: (g // gpl, 0, 0), memory_space=pltpu.VMEM),
            ch_spec,
            ch_spec,
            pl.BlockSpec((_NB_BIN, dim), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SB, QB), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * SB, QB), jnp.int32),
        interpret=interpret,
    )(
        qbT,
        qs2_b.astype(jnp.float32),
        qc_b.astype(jnp.float32),
        scale_op,
        cache_op,
        base_i8,
    )


@functools.partial(jax.jit, static_argnames=("r", "dist", "recall_target", "interpret"))
def scan_candidates_int8_packed(
    queries: jax.Array,  # (B, dim) f32
    base_i8: jax.Array,  # (N_pad, dim) int8
    base_scale: jax.Array,  # (N_pad,) f32
    base_cache: jax.Array,  # (N_pad,) f32
    n_valid: jax.Array,
    r: int,
    dist: str,
    recall_target: float = 0.95,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Stage-1 candidate selection via the packed chunk-min kernel.

    Same contract as ops.topk.scan_candidates_int8.  The top-r runs
    directly on the packed values bitcast to f32 (order-preserving for
    non-negative distances), then ids are decoded from the low 7 bits.

    `recall_target` tunes `lax.approx_min_k` over the chunk survivors:
    1.0 compiles to an exact (much slower) reduction; below 1.0 it uses the
    single-pass bucketed partial reduction.  Candidates feed an exact
    rerank, so a missed survivor only matters if it was a true top-k row —
    measured end-to-end recall@10 impact at 0.95 is < 1e-3 (N=1e6 bench).
    """
    from . import distance as D
    from .topk import INVALID_ID, quantize_rows_int8, topk_smallest

    q = queries.astype(jnp.float32)
    B = q.shape[0]
    B_pad = max(128, ((B + 127) // 128) * 128)
    if B_pad != B:
        q = jnp.pad(q, ((0, B_pad - B), (0, 0)))
    q_cache = D.dist_cache(q, dist)
    q8, q_scale = quantize_rows_int8(q)
    if base_i8.shape[1] != q8.shape[1]:
        # base columns are zero-padded to a full-lane multiple (store
        # device_int8); match the query width — zeros are dot-transparent
        q8 = jnp.pad(q8, ((0, 0), (0, base_i8.shape[1] - q8.shape[1])))
    qs2, qc = query_channels(q_scale, q_cache, dist)
    packed = scan_chunkmin_int8_packed(
        q8, qs2, qc, base_i8, base_scale, base_cache,
        jnp.int32(n_valid), dist, interpret=interpret,
    ).T  # (B_pad, S)
    S = packed.shape[1]
    NB, _ = _tiles_for(base_i8.shape[1])
    SB = NB // _CHUNK
    as_f32 = jax.lax.bitcast_convert_type(packed, jnp.float32)
    # survivor column j covers grid chunk j//SB, slot j%SB; the packed low
    # 7 bits hold the strided-group level: id = chunk*NB + level*SB + slot
    col = jax.lax.broadcasted_iota(jnp.int32, packed.shape, 1)
    base0 = (col // SB) * NB + (col % SB)

    rr = min(r, S)
    if S > 4 * rr and not interpret:
        _, pos = jax.lax.approx_min_k(as_f32, rr, recall_target=recall_target)
    else:
        _, pos = jax.lax.top_k(-as_f32, rr)
    pk = jnp.take_along_axis(packed, pos, axis=1)
    b0 = jnp.take_along_axis(base0, pos, axis=1)

    bd = jax.lax.bitcast_convert_type(pk & jnp.int32(~(_CHUNK - 1)), jnp.float32)
    bi = b0 + (pk & (_CHUNK - 1)) * SB
    bd, bi = bd[:B], bi[:B]
    if rr < r:
        bd = jnp.pad(bd, ((0, 0), (0, r - rr)), constant_values=jnp.inf)
        bi = jnp.pad(bi, ((0, 0), (0, r - rr)), constant_values=-1)
    bad = bd >= jnp.float32(1.0e38)
    return jnp.where(bad, jnp.inf, bd), jnp.where(bad, INVALID_ID, bi)


@functools.partial(jax.jit, static_argnames=("r", "dist", "interpret"))
def scan_candidates_int8_chunkmin(
    queries: jax.Array,  # (B, dim) f32
    base_i8: jax.Array,  # (N_pad, dim) int8
    base_scale: jax.Array,  # (N_pad,) f32
    base_cache: jax.Array,  # (N_pad,) f32
    n_valid: jax.Array,
    r: int,
    dist: str,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Stage-1 candidate selection via the transposed q-resident int8 kernel.

    Same contract as ops.topk.scan_candidates_int8.  At most one candidate
    survives per 128 consecutive base rows before the top-r.
    """
    from . import distance as D
    from .topk import INVALID_ID, quantize_rows_int8, topk_smallest

    q = queries.astype(jnp.float32)
    B = q.shape[0]
    B_pad = max(128, ((B + 127) // 128) * 128)
    if B_pad != B:
        q = jnp.pad(q, ((0, B_pad - B), (0, 0)))
    q_cache = D.dist_cache(q, dist)
    q8, q_scale = quantize_rows_int8(q)
    outd, outi = scan_chunkmin_int8_t(
        q8, q_scale, q_cache, base_i8, base_scale, base_cache,
        jnp.int32(n_valid), dist, interpret=interpret,
    )
    outd = outd.T  # (B_pad, S)
    outi = outi.T
    S = outd.shape[1]
    rr = min(r, S)
    if S > 4 * rr and not interpret:
        bd, pos = jax.lax.approx_min_k(outd, rr, recall_target=1.0)
        bi = jnp.take_along_axis(outi, pos, axis=1)
    else:
        bd, bi = topk_smallest(outd, outi, rr)
    bd, bi = bd[:B], bi[:B]
    if rr < r:
        bd = jnp.pad(bd, ((0, 0), (0, r - rr)), constant_values=jnp.inf)
        bi = jnp.pad(bi, ((0, 0), (0, r - rr)), constant_values=-1)
    return bd, jnp.where(jnp.isfinite(bd), bi, INVALID_ID)


@functools.partial(jax.jit, static_argnames=("r", "dist", "recall_target", "interpret"))
def scan_candidates_int8_pallas(
    queries: jax.Array,  # (B, dim) f32
    base_i8: jax.Array,  # (N_pad, dim) int8
    base_scale: jax.Array,  # (N_pad,) f32
    base_cache: jax.Array,  # (N_pad,) f32
    n_valid: jax.Array,
    r: int,
    dist: str,
    recall_target: float = 0.99,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Stage-1 candidate selection via the q-resident int8 scan kernel.

    Same contract as ops.topk.scan_candidates_int8.
    """
    from . import distance as D
    from .topk import INVALID_ID, quantize_rows_int8, topk_smallest

    q = queries.astype(jnp.float32)
    q_cache = D.dist_cache(q, dist)
    q8, q_scale = quantize_rows_int8(q)
    d = scan_dist_int8(
        q8, q_scale, q_cache, base_i8, base_scale, base_cache,
        jnp.int32(n_valid), dist, interpret=interpret,
    )
    B, n_pad = d.shape
    ids = jax.lax.broadcasted_iota(jnp.int32, (B, n_pad), 1)
    rr = min(r, n_pad)
    if n_pad > 4 * rr and not interpret:
        bd, pos = jax.lax.approx_min_k(d, rr, recall_target=recall_target)
        bd = bd.astype(jnp.float32)
        bi = jnp.take_along_axis(ids, pos, axis=1)
    else:
        bd, bi = topk_smallest(d.astype(jnp.float32), ids, rr)
    if rr < r:
        bd = jnp.pad(bd, ((0, 0), (0, r - rr)), constant_values=jnp.inf)
        bi = jnp.pad(bi, ((0, 0), (0, r - rr)), constant_values=-1)
    return bd, jnp.where(jnp.isfinite(bd), bi, INVALID_ID)


@functools.partial(jax.jit, static_argnames=("r", "dist", "interpret"))
def scan_candidates_pallas(
    queries: jax.Array,  # (B, dim) f32
    base_scan: jax.Array,  # (N_pad, dim) bf16
    base_cache: jax.Array,  # (N_pad,) f32
    n_valid: jax.Array,
    r: int,
    dist: str,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Stage-1 candidate selection through the fused scan kernel.

    Same contract as ops.topk.scan_candidates: ((B, r) f32 dists ascending,
    (B, r) int32 ids, -1 padded).  At most one candidate survives per 128
    consecutive base rows (see module docstring).
    """
    from . import distance as D
    from .topk import INVALID_ID, topk_smallest

    q_cache = D.dist_cache(queries.astype(jnp.float32), dist)
    qs = queries.astype(base_scan.dtype)
    outd, outi = scan_chunkmin(
        qs, q_cache, base_scan, base_cache, jnp.int32(n_valid), dist,
        interpret=interpret,
    )
    S = outd.shape[1]
    rr = min(r, S)
    if S > 4 * rr and not interpret:
        bd, pos = jax.lax.approx_min_k(outd, rr, recall_target=1.0)
        bi = jnp.take_along_axis(outi, pos, axis=1)
    else:
        bd, bi = topk_smallest(outd, outi, rr)
    if rr < r:
        bd = jnp.pad(bd, ((0, 0), (0, r - rr)), constant_values=jnp.inf)
        bi = jnp.pad(bi, ((0, 0), (0, r - rr)), constant_values=-1)
    return bd, jnp.where(jnp.isfinite(bd), bi, INVALID_ID)
