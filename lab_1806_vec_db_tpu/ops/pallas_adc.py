"""Pallas TPU kernel: fused PQ-ADC distance scan.

The XLA formulation of the ADC scan (`ops/pq.py:adc_scan`) gathers LUT
entries by code (`take_along_axis`), which lowers to scalar-unit gathers on
TPU.  This kernel reformulates the lookup as **one-hot MXU matmuls**: for a
chunk of G groups, codes expand to a (N_t, G*k) one-hot tile (a VPU compare
against a broadcasted iota) and the partial-distance sum over those groups
is one (N_t, G*k) x (G*k, B_t) matmul — the gather becomes a 128-wide
contraction on the systolic array, and the uint8 codes are the only HBM
traffic per base row.

4-bit codes stay **nibble-packed in HBM** (two codes per byte, low nibble
first — the reference's in-memory layout, pq_table.rs:66-91) and are
unpacked in-register inside the kernel: half the code memory AND half the
scan's HBM traffic for the n_bits=4 flagship configs.

The one-hot operand is exactly representable in bf16 and the LUT is cast to
bf16, so the matmul runs at the MXU's bf16 rate with f32 accumulation;
partial-distance rounding (~0.4% relative per entry, averaged over m) is
far below ADC quantization error, and callers exact-rerank anyway.

For Cosine the per-code centroid squared-norm sum rides the same matmul as
one extra LUT row.

Reference behavior being accelerated: the ADC accumulation loop at
src/distance/pq_table.rs:252-299 (L2Sqr sum of partial distances; Cosine
norm reconstruction 1 - sum / (sqrt(c_sq) * |q|), pq_table.rs:291-299).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile sizes: lane dim fixed at 128 = G * k for k=16 -> G=8 groups per step
_NT = 512  # base rows per tile
_BT = 128  # queries per tile (min f32 sublane alignment handled by padding)


def _adc_kernel(
    codes_ref, lut_ref, out_ref, *, m_pad: int, k: int, n_groups_step: int,
    packed: bool, exact: bool,
):
    """codes_ref: (NT, m_pad) int32, or (NT, m_pad//2) int32 packed bytes
    when `packed` (4-bit, low nibble first); lut_ref: (BT, m_pad*k) bf16;
    out_ref: (NT, BT) f32 accumulated sums."""
    NT = codes_ref.shape[0]
    BT = lut_ref.shape[0]
    G = n_groups_step
    W = G * k  # 128 lanes per step
    steps = m_pad // G

    codes = codes_ref[:]
    lut = lut_ref[:]
    acc = jnp.zeros((NT, BT), jnp.float32)
    # static unroll: every slice is compile-time, W-aligned on the LUT side
    for s in range(steps):
        g0 = s * G
        if packed:
            # two 4-bit codes per byte: unpack G groups from G//2 bytes.
            # NO interleave (Mosaic rejects the (NT, G/2, 2)->(NT, G) shape
            # cast) — lo/hi nibbles are lane-CONCATENATED [evens | odds] and
            # the LUT group columns were permuted to match (see adc_sums).
            bytes_g = codes[:, g0 // 2 : (g0 + G) // 2]  # (NT, G//2)
            lo = bytes_g & 0xF
            hi = (bytes_g >> 4) & 0xF
            codes_g = jnp.concatenate([lo, hi], axis=1)  # (NT, G)
        else:
            codes_g = codes[:, g0 : g0 + G]  # (NT, G)
        # One-hot over the k codewords of each group in CODE-MAJOR lane
        # order: lane w <-> (code w // G, group-position w % G).  Built with
        # pltpu.repeat (a native lane tiling) because the group-major
        # (NT, G, k) -> (NT, W) reshape is a Mosaic-unsupported shape cast;
        # the LUT lanes were pre-transposed to the same order in adc_sums.
        codes_rep = pltpu.repeat(codes_g, k, axis=1)  # (NT, W) = [g0..gG-1]*k
        code_of_lane = jax.lax.broadcasted_iota(jnp.int32, (NT, W), 1) // G
        oh = (codes_rep == code_of_lane).astype(jnp.float32 if exact else jnp.bfloat16)
        lut_g = lut[:, g0 * k : g0 * k + W]  # (BT, W)
        if exact:
            lut_g = lut_g.astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            oh, lut_g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("packed", "exact", "interpret"))
def adc_sums(
    codes: jax.Array,
    lut_rows: jax.Array,
    packed: bool = False,
    exact: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Compute per-(base,query-row) ADC sums.

    codes: (N, m) uint8/int32 codes, or (N, ceil(m/2)) packed nibble bytes
      when `packed` — padded to tiles internally.
    lut_rows: (R, m, k) f32 lookup rows (queries, plus optionally one extra
      row of centroid squared norms for Cosine).
    Returns (N, R) f32 sums: sum_i lut_rows[r, i, codes[n, i]].
    """
    N = codes.shape[0]
    R, m, k = lut_rows.shape
    G = max(128 // k, 1)
    m_pad = ((m + G - 1) // G) * G
    n_pad = ((N + _NT - 1) // _NT) * _NT
    r_pad = ((R + _BT - 1) // _BT) * _BT

    if packed:
        assert G % 2 == 0, "packed layout needs an even group step"
        codes_p = jnp.zeros((n_pad, m_pad // 2), jnp.int32)
        codes_p = codes_p.at[:N, : codes.shape[1]].set(codes.astype(jnp.int32))
    else:
        assert codes.shape[1] == m
        codes_p = jnp.zeros((n_pad, m_pad), jnp.int32)
        codes_p = codes_p.at[:N, :m].set(codes.astype(jnp.int32))
    # padded groups point at code 0 of a zero LUT column -> contribute 0
    lut_dtype = jnp.float32 if exact else jnp.bfloat16
    lut_full = jnp.zeros((r_pad, m_pad, k), lut_dtype)
    lut_full = lut_full.at[:R, :m].set(lut_rows.astype(lut_dtype))
    if packed:
        # match the kernel's concat-unpack group order: within each step of
        # G groups, all even-offset groups (lo nibbles) then all odd-offset
        # ones (hi nibbles) — a static lane permutation applied once here
        # instead of an unsupported in-register interleave per tile.
        perm = np.concatenate(
            [
                np.concatenate([np.arange(g0, g0 + G, 2), np.arange(g0 + 1, g0 + G, 2)])
                for g0 in range(0, m_pad, G)
            ]
        )
        lut_full = lut_full[:, perm, :]
    # code-major lane order per step (see the kernel's pltpu.repeat one-hot):
    # step lane w holds (code w // G, group-position w % G)
    steps = m_pad // G
    lut_p = (
        lut_full.reshape(r_pad, steps, G, k)
        .transpose(0, 1, 3, 2)
        .reshape(r_pad, m_pad * k)
    )

    kernel = functools.partial(
        _adc_kernel, m_pad=m_pad, k=k, n_groups_step=G, packed=packed, exact=exact
    )
    cw = codes_p.shape[1]
    # grid order: query tiles OUTER, base tiles inner — the big LUT tile
    # (m_pad*k lanes) then loads once per query tile instead of once per
    # (query, base) pair (the codes re-reads it trades for are G*k/8 ~ 16x
    # smaller, and half that again when packed)
    out = pl.pallas_call(
        kernel,
        grid=(r_pad // _BT, n_pad // _NT),
        in_specs=[
            pl.BlockSpec((_NT, cw), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BT, m_pad * k), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_NT, _BT), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, r_pad), jnp.float32),
        interpret=interpret,
    )(codes_p, lut_p)
    return out[:N, :R]


_IDS_QT = 128  # query-tile width for adc_dists_for_ids


@functools.partial(jax.jit, static_argnames=("dist", "m", "packed", "interpret"))
def adc_dists_for_ids(
    lookup: jax.Array,  # (B, m, k) f32 per-query LUT
    q_norms: jax.Array,  # (B,)
    codes: jax.Array,  # (N, m) uint8 or (N, ceil(m/2)) packed device codes
    cb_sqnorm: jax.Array,  # (m, k) f32
    ids: jax.Array,  # (B, C) int32 candidate ids, -1 invalid
    dist: str,
    m: int,
    packed: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """ADC distances for per-query candidate ids -> (B, C) f32 (+inf where
    invalid).

    The traversal form of the ADC lookup (HNSW+PQ frontier expansion,
    hnsw_index.rs:672-697).  The XLA `take_along_axis` formulation
    (ops/pq.py:adc_lookup_codes) lowers to B*C*m scalar-unit gathers —
    ~41M per beam iteration at B=1000, C=128, m=320 — and measured ~30
    ms/query in round 1.  Here the gathered candidate code rows are fed
    through the PROVEN scan kernel (`adc_sums`) per 128-query tile: it
    computes sums against the whole tile's LUT rows and the per-query
    diagonal is selected after.  That does QT=128x redundant MACs, but
    one-hot matmuls are nearly free on the MXU (~1e10 bf16 MACs per beam
    iteration ~ 0.05 ms) — a dedicated per-query kernel (elementwise VPU
    broadcast) OOMed Mosaic's 16M scoped-vmem stack at m=320, and this
    formulation reuses a kernel whose tiling is already validated on the
    chip.  The code-row gather stays in XLA (code rows are far below the
    (32, 128) int8 tile, so per-row DMA cannot be aligned)."""
    B, C = ids.shape
    QT = _IDS_QT
    b_pad = ((B + QT - 1) // QT) * QT
    if b_pad != B:
        ids = jnp.pad(ids, ((0, b_pad - B), (0, 0)), constant_values=-1)
        lookup = jnp.pad(lookup, ((0, b_pad - B), (0, 0), (0, 0)))
        q_norms = jnp.pad(q_norms, (0, b_pad - B))
    rows = codes[jnp.maximum(ids, 0)]  # (b_pad, C, cw)
    cos = dist == "cosine"
    outs = []
    for j in range(b_pad // QT):
        codes_j = rows[j * QT : (j + 1) * QT].reshape(QT * C, rows.shape[-1])
        lut_j = lookup[j * QT : (j + 1) * QT]  # (QT, m, k)
        if cos:
            lut_j = jnp.concatenate([lut_j, cb_sqnorm[None]], axis=0)
        sums = adc_sums(codes_j, lut_j, packed=packed, interpret=interpret)
        # diagonal select: candidate row q*C+c belongs to query q
        diag = sums[:, :QT].reshape(QT, C, QT)
        qi = jnp.arange(QT, dtype=jnp.int32)[:, None, None]
        s = jnp.take_along_axis(diag, jnp.broadcast_to(qi, (QT, C, 1)), axis=2)[..., 0]
        if cos:
            c_sq = sums[:, QT].reshape(QT, C)
            norm0 = jnp.sqrt(jnp.maximum(c_sq, 0.0))
            qn = q_norms[j * QT : (j + 1) * QT]
            s = 1.0 - s / jnp.maximum(norm0 * qn[:, None], 1e-10)
        outs.append(s)
    d = jnp.concatenate(outs, axis=0)[:B]
    return jnp.where(ids[:B] >= 0, d, jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("k_out", "dist", "packed", "exact", "block", "interpret")
)
def adc_scan_pallas(
    lookup: jax.Array,  # (B, m, k) f32
    codes: jax.Array,  # (N, m) uint8, or (N, ceil(m/2)) packed when `packed`
    n_valid,
    cb_sqnorm: jax.Array,  # (m, k) f32
    q_norms: jax.Array,  # (B,)
    k_out: int,
    dist: str,
    packed: bool = False,
    exact: bool = False,
    block: int = 131072,
    interpret: bool = False,
):
    """Full ADC scan + top-k through the Pallas kernel, blocked over N so
    the (N, B) distance matrix never materializes (at N=1e6, B=1e3 it would
    be 4 GB of HBM).

    Same contract as ops.pq.adc_scan: (B, k_out) dists/ids.
    """
    from . import topk as T

    B = lookup.shape[0]
    N = codes.shape[0]
    if dist == "cosine":
        rows = jnp.concatenate([lookup, cb_sqnorm[None, :, :]], axis=0)
    else:
        rows = lookup

    def block_dists(tile_codes, start):
        sums = adc_sums(tile_codes, rows, packed=packed, exact=exact, interpret=interpret)
        if dist == "cosine":
            dots = sums[:, :B]
            c_sq = sums[:, B]
            norm0 = jnp.sqrt(jnp.maximum(c_sq, 0.0))[:, None]
            d = 1.0 - dots / jnp.maximum(norm0 * q_norms[None, :], 1e-10)
        else:
            d = sums[:, :B]
        d = d.T  # (B, nb)
        ids = start + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        return jnp.where(ids < n_valid, d, jnp.inf), ids

    if N <= block:
        d, ids = block_dists(codes, jnp.int32(0))
        kk = min(k_out, N)
        bd, bi = T.topk_smallest(d, ids, kk)
        if kk < k_out:
            bd = jnp.pad(bd, ((0, 0), (0, k_out - kk)), constant_values=jnp.inf)
            bi = jnp.pad(bi, ((0, 0), (0, k_out - kk)), constant_values=-1)
        return bd, jnp.where(jnp.isfinite(bd), bi, -1)

    num_blocks = -(-N // block)
    pad_to = num_blocks * block
    if pad_to != N:
        codes = jnp.pad(codes, ((0, pad_to - N), (0, 0)))

    def body(carry, blk):
        best_d, best_i = carry
        start = blk * block
        tile = jax.lax.dynamic_slice(codes, (start, 0), (block, codes.shape[1]))
        d, ids = block_dists(tile, start)
        return T.merge_topk(best_d, best_i, d, ids, k_out), None

    init = (
        jnp.full((B, k_out), jnp.inf, jnp.float32),
        jnp.full((B, k_out), -1, jnp.int32),
    )
    (bd, bi), _ = jax.lax.scan(body, init, jnp.arange(num_blocks, dtype=jnp.int32))
    return bd, jnp.where(jnp.isfinite(bd), bi, -1)
