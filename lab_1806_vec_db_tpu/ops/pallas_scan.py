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
true candidate per 128 consecutive rows — callers that store clustered data
contiguously should shuffle storage order (see FlatIndex scan permutation).
"""

from __future__ import annotations

import functools

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
