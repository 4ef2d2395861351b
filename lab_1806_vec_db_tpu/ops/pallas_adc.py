"""Pallas TPU kernel: fused PQ-ADC distance scan.

The XLA formulation of the ADC scan (`ops/pq.py:adc_scan`) gathers LUT
entries by code (`take_along_axis`), which lowers to scalar-unit gathers on
TPU.  This kernel reformulates the lookup as a **one-hot MXU contraction**:
codes expand to a (NT, W = m*k) one-hot tile and the partial-distance sum
is ONE (NT, W) x (W, BT) matmul against a contraction-major LUT whose
column b holds query b's m*k partial distances.

Round-4 redesign (24x the round-3 kernel).  The round-3 kernel tiled
queries at BT=128 and rebuilt the one-hot per (query-tile, step) in 40
narrow (NT,128)x(128,128) dots — measured 3.7% MXU.  Measured on-chip
(v5e, N=131072, m=320, k=16, B=1000, tmp/bench_adc_micro2.py):

  round-3 kernel                 183.5 ms   3.7% bf16-MXU peak
  v2 bf16: one-hot once/base-tile,
    queries resident (BT=1024),
    single (256,5120)x(5120,1024)  11.4 ms  61% peak
  v2 int8: one-hot as int8, LUT
    per-query int8-quantized        7.6 ms  92% bf16 peak (46% int8)

Design rules that matter:
- the whole query batch rides one dot (BT=r_pad<=1024): the one-hot is
  built ONCE per base tile instead of once per (base, query) tile pair;
- `code_of_lane` is a precomputed (8, W) int32 input row, not an in-kernel
  `iota // m` (integer div by a non-power-of-2);
- the int8 one-hot must be built with `.astype(jnp.int8)` — the
  `jnp.where(mask, int8(1), int8(0))` form trips a Mosaic i1-relayout
  bug ("Invalid relayout ... vector<...xi1>");
- no VMEM scratch: letting Mosaic register-allocate the one-hot value beat
  an explicit scratch round-trip by ~8%.

Arithmetic floor: a LUT lookup via matmul costs k MACs (the one-hot row),
so a full scan is N*B*m*k MACs — 5.2e12 at Gist1M flagship shape = 53 ms
at v5e bf16 peak, 27 ms at int8 peak.  A VPU select-tree lookup would cost
~15 VPU-ops per lookup = N*B*m*15 element-ops ~ 80x slower than the MXU
route at these shapes; one-hot-on-MXU is the right compute shape, the
round-3 problem was utilization (BT=128 + per-step one-hot rebuild), not
the idea.

int8 LUT quantization (the default stage-1 path, `lut_dtype="int8"`) is
per query row: s_b = max|lut_b|/127, entry error <= s_b/2, summed error
std ~ s_b*sqrt(m/12) ~ 0.8% of the max partial distance — far below ADC's
own quantization error; every caller exact-reranks the returned candidate
ordering.  `exact=True` (tests) runs f32 operands end-to-end.

4-bit codes stay **nibble-packed in HBM** (two codes per byte, low nibble
first — the reference's in-memory layout, pq_table.rs:66-91) and are
unpacked in-register: half the code memory AND half the scan's HBM traffic
for the n_bits=4 flagship configs.

For Cosine the per-code centroid squared-norm sum rides the same matmul as
one extra LUT row (its own column, its own int8 scale).

Reference behavior being accelerated: the ADC accumulation loop at
src/distance/pq_table.rs:252-299 (L2Sqr sum of partial distances; Cosine
norm reconstruction 1 - sum / (sqrt(c_sq) * |q|), pq_table.rs:291-299).

n_bits=8 (k=256) tables keep the round-3 step-wise kernel: their one-hot
width m*256 makes the resident-LUT layout exceed VMEM.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NT = 256  # base rows per tile (v2 kernel)
_BT_MAX = 1024  # queries resident per kernel call
_VMEM_LIMIT = 110 * 1024 * 1024

# ---- legacy step-wise kernel (kept for k=256 / n_bits=8 tables) ----
_NT_LEG = 512
_BT_LEG = 128


def _adc_kernel_stepwise(
    codes_ref, lut_ref, out_ref, *, m_pad: int, k: int, n_groups_step: int,
    packed: bool, exact: bool,
):
    """codes_ref: (NT, m_pad) int32, or (NT, m_pad//2) int32 packed bytes
    when `packed` (4-bit, low nibble first); lut_ref: (BT, m_pad*k) bf16;
    out_ref: (NT, BT) f32 accumulated sums."""
    NT = codes_ref.shape[0]
    G = n_groups_step
    W = G * k
    steps = m_pad // G

    codes = codes_ref[:]
    lut = lut_ref[:]
    acc = jnp.zeros((NT, lut_ref.shape[0]), jnp.float32)
    for s in range(steps):
        g0 = s * G
        if packed:
            bytes_g = codes[:, g0 // 2 : (g0 + G) // 2]
            lo = bytes_g & 0xF
            hi = (bytes_g >> 4) & 0xF
            codes_g = jnp.concatenate([lo, hi], axis=1)
        else:
            codes_g = codes[:, g0 : g0 + G]
        codes_rep = pltpu.repeat(codes_g, k, axis=1)
        code_of_lane = jax.lax.broadcasted_iota(jnp.int32, (NT, W), 1) // G
        oh = (codes_rep == code_of_lane).astype(jnp.float32 if exact else jnp.bfloat16)
        lut_g = lut[:, g0 * k : g0 * k + W]
        if exact:
            lut_g = lut_g.astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            oh, lut_g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    out_ref[:] = acc


def _adc_sums_stepwise(codes, lut_rows, packed, exact, interpret):
    N = codes.shape[0]
    R, m, k = lut_rows.shape
    G = max(128 // k, 1)
    m_pad = ((m + G - 1) // G) * G
    n_pad = ((N + _NT_LEG - 1) // _NT_LEG) * _NT_LEG
    r_pad = ((R + _BT_LEG - 1) // _BT_LEG) * _BT_LEG

    if packed:
        assert G % 2 == 0, "packed layout needs an even group step"
        codes_p = jnp.zeros((n_pad, m_pad // 2), jnp.int32)
        codes_p = codes_p.at[:N, : codes.shape[1]].set(codes.astype(jnp.int32))
    else:
        assert codes.shape[1] == m
        codes_p = jnp.zeros((n_pad, m_pad), jnp.int32)
        codes_p = codes_p.at[:N, :m].set(codes.astype(jnp.int32))
    lut_dtype = jnp.float32 if exact else jnp.bfloat16
    lut_full = jnp.zeros((r_pad, m_pad, k), lut_dtype)
    lut_full = lut_full.at[:R, :m].set(lut_rows.astype(lut_dtype))
    if packed:
        perm = np.concatenate(
            [
                np.concatenate([np.arange(g0, g0 + G, 2), np.arange(g0 + 1, g0 + G, 2)])
                for g0 in range(0, m_pad, G)
            ]
        )
        lut_full = lut_full[:, perm, :]
    steps = m_pad // G
    lut_p = (
        lut_full.reshape(r_pad, steps, G, k)
        .transpose(0, 1, 3, 2)
        .reshape(r_pad, m_pad * k)
    )

    kernel = functools.partial(
        _adc_kernel_stepwise, m_pad=m_pad, k=k, n_groups_step=G,
        packed=packed, exact=exact,
    )
    cw = codes_p.shape[1]
    out = pl.pallas_call(
        kernel,
        grid=(r_pad // _BT_LEG, n_pad // _NT_LEG),
        in_specs=[
            pl.BlockSpec((_NT_LEG, cw), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_BT_LEG, m_pad * k), lambda j, i: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (_NT_LEG, _BT_LEG), lambda j, i: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, r_pad), jnp.float32),
        interpret=interpret,
    )(codes_p, lut_p)
    return out[:N, :R]




def _codes_as_i8(codes: jax.Array) -> jax.Array:
    """View uint8/int code rows as int8 WITHOUT widening: an int32 copy of
    the codes lane-pads 160 -> 256 under the (8,128) tile (1 KB/row — a
    36 GiB transient at the 10M layout, the round-4 OOM).  Kernels unpack
    with sign-safe masks ((b >> 4) & 0xF), so the int8 bit pattern is all
    they need."""
    if codes.dtype == jnp.int8:
        return codes
    if codes.dtype == jnp.uint8:
        return jax.lax.bitcast_convert_type(codes, jnp.int8)
    return codes.astype(jnp.int8)


# ---- v2 kernel (k <= 16): one-hot once per base tile, queries resident ----


def _adc_kernel_v2(codes_ref, col_ref, lut_ref, out_ref, *, k: int, packed: bool,
                   oh_dtype):
    """codes_ref: (NT, cw) int32 — packed nibble bytes (cw = m_eff//2) or
    unpacked codes (cw = m_eff); col_ref: (8, W) int32, row = lane's code id
    (w // m_eff); lut_ref: (W, BT) contraction-major LUT; out_ref: (NT, BT)
    raw sums in the LUT dtype's accumulator (f32 for f32/bf16, int32-as-f32
    for int8 — the wrapper applies per-query scales).

    Code tiles arrive int8 (HBM-lean; an int32 array lane-pads 160->256 =
    1 KB/row) and widen to int32 HERE, in VMEM, where the copy is one tile:
    Mosaic cannot legalize the int8 right-shift the nibble unpack needs
    (arith.shrsi on i8 vectors)."""
    codes = codes_ref[:].astype(jnp.int32)
    if packed:
        # two 4-bit codes per byte.  Unpacked lane order is
        # [lo nibbles | hi nibbles] = groups [0,2,4,... | 1,3,5,...]; the
        # LUT columns were permuted to match (no in-register interleave —
        # Mosaic rejects that shape cast).
        codes_u = jnp.concatenate([codes & 0xF, (codes >> 4) & 0xF], axis=1)
    else:
        codes_u = codes
    rep = pltpu.repeat(codes_u, k, axis=1)  # (NT, W): lane w -> pos w % m_eff
    oh = (rep == col_ref[:1]).astype(oh_dtype)
    acc_t = jnp.int32 if oh_dtype == jnp.int8 else jnp.float32
    acc = jax.lax.dot_general(
        oh, lut_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=acc_t
    )
    out_ref[:] = acc.astype(jnp.float32)


def _v2_lut_layout(lut_rows, packed, m_eff, r_pad, np_mod=np):
    """(R, m, k) rows -> (W, r_pad) contraction-major layout.

    Lane/sublane index w of the one-hot <-> (code c = w // m_eff, unpacked
    position p = w % m_eff).  For packed codes position p maps to group
    2p (p < cw: low nibbles) or 2(p - cw) + 1 (high nibbles); positions
    whose group >= m are padding and get zero columns (their code-0 one-hot
    hit contributes 0)."""
    R, m, k = lut_rows.shape
    cw = m_eff // 2 if packed else m_eff
    if packed:
        pos_to_group = np.concatenate([np.arange(0, 2 * cw, 2), np.arange(1, 2 * cw, 2)])
    else:
        pos_to_group = np.arange(m_eff)
    valid = pos_to_group < m
    src = np.where(valid, pos_to_group, 0)
    # (R, m_eff, k) with zeroed padding columns
    cols = jnp.where(
        jnp.asarray(valid)[None, :, None],
        jnp.take(lut_rows, jnp.asarray(src), axis=1),
        0.0,
    )
    lut_p = jnp.transpose(cols, (2, 1, 0)).reshape(k * m_eff, R)  # (W, R)
    if r_pad != R:
        lut_p = jnp.pad(lut_p, ((0, 0), (0, r_pad - R)))
    return lut_p


@functools.partial(jax.jit, static_argnames=("packed", "lut_dtype", "interpret"))
def _adc_sums_v2(codes, lut_rows, packed, lut_dtype, interpret):
    N, cw = codes.shape
    R, m, k = lut_rows.shape
    m_eff = 2 * cw if packed else cw
    W = m_eff * k
    n_pad = ((N + _NT - 1) // _NT) * _NT
    r_tile = min(_BT_MAX, ((R + 127) // 128) * 128)
    r_pad = ((R + r_tile - 1) // r_tile) * r_tile

    codes_p = _codes_as_i8(codes)
    if n_pad != N:
        codes_p = jnp.pad(codes_p, ((0, n_pad - N), (0, 0)))
    col = jnp.broadcast_to(
        (jnp.arange(W, dtype=jnp.int32) // m_eff)[None, :], (8, W)
    )
    lut_p = _v2_lut_layout(lut_rows, packed, m_eff, r_pad)

    if lut_dtype == "int8":
        # per-query symmetric quantization; dequant rides the wrapper
        scales = jnp.max(jnp.abs(lut_p), axis=0) / 127.0  # (r_pad,)
        scales = jnp.where(scales > 0, scales, 1.0)
        lut_q = jnp.round(lut_p / scales[None, :]).astype(jnp.int8)
        oh_dtype = jnp.int8
        scale_rows = jnp.broadcast_to(scales[None, :], (8, r_pad))
    else:
        oh_dtype = jnp.float32 if lut_dtype == "f32" else jnp.bfloat16
        lut_q = lut_p.astype(oh_dtype)
        scale_rows = None

    kernel = functools.partial(
        _adc_kernel_v2, k=k, packed=packed, oh_dtype=oh_dtype
    )
    out = pl.pallas_call(
        kernel,
        grid=(r_pad // r_tile, n_pad // _NT),
        in_specs=[
            pl.BlockSpec((_NT, cw), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, W), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, r_tile), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_NT, r_tile), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, r_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(codes_p, col, lut_q)
    if scale_rows is not None:
        out = out * scale_rows[:1]
    return out[:N, :R]


@functools.partial(
    jax.jit, static_argnames=("packed", "exact", "interpret", "lut_dtype")
)
def adc_sums(
    codes: jax.Array,
    lut_rows: jax.Array,
    packed: bool = False,
    exact: bool = False,
    interpret: bool = False,
    lut_dtype: str = "bf16",
) -> jax.Array:
    """Compute per-(base,query-row) ADC sums.

    codes: (N, m) uint8/int32 codes, or (N, ceil(m/2)) packed nibble bytes
      when `packed` — padded to tiles internally.
    lut_rows: (R, m, k) f32 lookup rows (queries, plus optionally one extra
      row of centroid squared norms for Cosine).
    lut_dtype: "bf16" (default), "int8" (per-query quantized stage-1 — use
      when the caller exact-reranks), or "f32"; `exact=True` forces f32.
    Returns (N, R) f32 sums: sum_i lut_rows[r, i, codes[n, i]].
    """
    k = lut_rows.shape[2]
    if exact:
        lut_dtype = "f32"
    if k > 16:
        return _adc_sums_stepwise(codes, lut_rows, packed, exact, interpret)
    return _adc_sums_v2(codes, lut_rows, packed, lut_dtype, interpret)


# ---- fused chunk-min ADC scan (the production full-scan path) ----

_CHUNK = 32  # base rows per surviving candidate


def _prep_lut_quant(lut_p: jax.Array, lut_dtype: str):
    """(W, r_pad) f32 contraction-major LUT -> (lut_q, per-column scales,
    one-hot dtype) for the requested stage-1 precision."""
    if lut_dtype == "int8":
        scales = jnp.max(jnp.abs(lut_p), axis=0) / 127.0
        scales = jnp.where(scales > 0, scales, 1.0)
        return (jnp.round(lut_p / scales[None, :]).astype(jnp.int8),
                scales, jnp.int8)
    oh_dtype = jnp.float32 if lut_dtype == "f32" else jnp.bfloat16
    return lut_p.astype(oh_dtype), jnp.ones((lut_p.shape[1],), jnp.float32), oh_dtype


def _adc_chunkmin_kernel(
    nvalid_ref, codes_ref, col_ref, lut_ref, aux_ref, cs_ref,
    outd_ref, outi_ref, *, k: int, packed: bool, oh_dtype, dist: str, chunk: int,
    transposed: bool = False,
):
    """One base tile -> (NT/chunk, BT) chunk-min survivors.

    codes_ref: (NT, cw) int32 — or (cw, NT) when `transposed` (the
    sublane-major at-rest layout; see adc_scan_chunkmin); col_ref: (8, W)
    int32 code-of-lane; lut_ref: (W, BT) query LUT (int8/bf16/f32);
    aux_ref: (8, BT) f32 rows [0]=per-query dequant scale, [1]=query norms
    (cosine), [2][0]=centroid column scale; cs_ref: (W, 128) centroid-sqnorm
    LUT column (col 0) or a (8, 128) dummy for L2; outd/outi: (NT/chunk, BT)
    survivor dist + GLOBAL base-row position (pre-permutation decode)."""
    i = pl.program_id(1)
    NT = codes_ref.shape[1] if transposed else codes_ref.shape[0]
    BT = lut_ref.shape[1]
    codes = codes_ref[:].astype(jnp.int32)  # widen in VMEM (see kernel v2)
    if transposed:
        # one in-register transpose back to row-major; the HBM tile was
        # (cw, NT) with cw on SUBLANES (160 = 5x32 int8 sublane tiles,
        # zero padding) instead of lanes (160 -> 256, the 1.6x HBM tax)
        codes = codes.T
    if packed:
        codes_u = jnp.concatenate([codes & 0xF, (codes >> 4) & 0xF], axis=1)
    else:
        codes_u = codes
    rep = pltpu.repeat(codes_u, k, axis=1)
    oh = (rep == col_ref[:1]).astype(oh_dtype)
    acc_t = jnp.int32 if oh_dtype == jnp.int8 else jnp.float32
    acc = jax.lax.dot_general(
        oh, lut_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=acc_t
    )
    d = acc.astype(jnp.float32) * aux_ref[0:1]
    if dist == "cosine":
        cs_acc = jax.lax.dot_general(
            oh, cs_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=acc_t
        )
        c_sq = cs_acc[:, :1].astype(jnp.float32) * aux_ref[2:3, :1]
        norm0 = jnp.sqrt(jnp.maximum(c_sq, 0.0))
        d = 1.0 - d / jnp.maximum(norm0 * aux_ref[1:2], 1e-10)
    # mask padded base rows (beyond n_valid)
    pos0 = i * NT
    row_pos = jax.lax.broadcasted_iota(jnp.int32, (NT, 1), 0) + pos0
    d = jnp.where(row_pos < nvalid_ref[0], d, jnp.inf)

    mins, args = [], []
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, BT), 0)
    for s in range(NT // chunk):
        seg = d[s * chunk : (s + 1) * chunk, :]
        mn = jnp.min(seg, axis=0, keepdims=True)
        a = jnp.min(
            jnp.where(seg == mn, rows, jnp.int32(2**30)), axis=0, keepdims=True
        )
        mins.append(mn)
        args.append(pos0 + s * chunk + a)
    outd_ref[:] = jnp.concatenate(mins, axis=0)
    outi_ref[:] = jnp.concatenate(args, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("k_out", "dist", "packed", "lut_dtype", "chunk", "selector",
                     "transposed", "interpret"),
)
def adc_scan_chunkmin(
    lookup: jax.Array,  # (B, m, k) f32
    codes: jax.Array,  # PERMUTED (N, cw) device codes — (cw, N) if transposed
    perm: jax.Array,  # (N,) int32: position -> original id
    n_valid,
    cb_sqnorm: jax.Array,  # (m, k) f32
    q_norms: jax.Array,  # (B,)
    k_out: int,
    dist: str,
    packed: bool = False,
    lut_dtype: str = "int8",
    chunk: int = _CHUNK,
    selector: str = "exact",
    transposed: bool = False,
    interpret: bool = False,
):
    """Full ADC scan fused with a chunk-min partial top-k.

    `transposed`: codes arrive (cw, N) — the sublane-major at-rest layout
    for cw that is a multiple of 32 but not of 128 (m=320 packed: cw=160
    lane-pads to 256 B/row row-major = 1.6x HBM on the bandwidth-bound
    big-N scan; transposed it tiles exactly, 160 = 5x32 int8 sublanes).
    The kernel transposes each (cw, NT) tile back in-register.

    The dense path materializes the (N, B) sum matrix in HBM and reduces it
    outside the kernel — at 1M/B=1000 that is a 4 GB round trip plus a
    1e5-wide top-k per block (measured 48-119 ms per 131k block, 4-10x the
    ADC kernel itself).  Here each (chunk=32)-row group of PERMUTED base
    rows is reduced to one (min, argmin) survivor inside the kernel (the
    flat scan's chunk-min design, ops/pallas_scan.py), so the exact top-k
    runs over N/32 survivors.  The permutation de-clusters storage order;
    collision loss for top-ef selection is ~ef^2/(2*N/32) candidates
    (~2 of 180 at N=1M), far below ADC quantization error, and callers
    exact-rerank.

    PERM CONTRACT: padding is masked by POSITION (< n_valid), so `perm`
    must map positions [0, n_valid) to exactly the valid original ids —
    permute the valid rows only and keep any capacity padding at the tail
    (PQTable.device_scan and PQCodesIndex.build_from_fill both do).

    Returns (B, k_out) f32 dists + int32 ORIGINAL ids (decoded via perm).
    """
    from . import topk as T

    B = lookup.shape[0]
    N = codes.shape[1] if transposed else codes.shape[0]
    NT = _NT
    n_pad = ((N + NT - 1) // NT) * NT
    S = n_pad // chunk
    kk = min(k_out, S)

    R, m, k = lookup.shape[0], lookup.shape[1], lookup.shape[2]
    cw = codes.shape[0] if transposed else codes.shape[1]
    m_eff = 2 * cw if packed else cw
    W = m_eff * k
    r_tile = min(_BT_MAX, ((B + 127) // 128) * 128)
    r_pad = ((B + r_tile - 1) // r_tile) * r_tile

    codes_p = _codes_as_i8(codes)
    if n_pad != N:
        pad_n = ((0, 0), (0, n_pad - N)) if transposed else ((0, n_pad - N), (0, 0))
        codes_p = jnp.pad(codes_p, pad_n)
    col = jnp.broadcast_to(
        (jnp.arange(W, dtype=jnp.int32) // m_eff)[None, :], (8, W)
    )
    lut_p = _v2_lut_layout(lookup, packed, m_eff, r_pad)

    cos = dist == "cosine"
    lut_q, scales, oh_dtype = _prep_lut_quant(lut_p, lut_dtype)
    cs_scale = jnp.float32(1.0)
    if cos:
        cs_full = _v2_lut_layout(cb_sqnorm[None], packed, m_eff, 128)  # (W, 128)
        if lut_dtype == "int8":
            cs_scale = jnp.maximum(jnp.max(jnp.abs(cs_full)) / 127.0, 1e-30)
            cs_q = jnp.round(cs_full / cs_scale).astype(jnp.int8)
        else:
            cs_q = cs_full.astype(oh_dtype)
    else:
        cs_q = jnp.zeros((8, 128), oh_dtype)

    qn = jnp.zeros((r_pad,), jnp.float32).at[:B].set(q_norms)
    aux = jnp.zeros((8, r_pad), jnp.float32)
    aux = aux.at[0].set(jnp.broadcast_to(scales, (r_pad,)))
    aux = aux.at[1].set(qn)
    aux = aux.at[2, 0].set(cs_scale)

    kernel = functools.partial(
        _adc_chunkmin_kernel, k=k, packed=packed, oh_dtype=oh_dtype, dist=dist,
        chunk=chunk, transposed=transposed,
    )
    codes_spec = (
        pl.BlockSpec((cw, NT), lambda j, i: (0, i), memory_space=pltpu.VMEM)
        if transposed
        else pl.BlockSpec((NT, cw), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
    )
    cs_w = cs_q.shape[0]
    outd, outi = pl.pallas_call(
        kernel,
        grid=(r_pad // r_tile, n_pad // NT),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            codes_spec,
            pl.BlockSpec((8, W), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, r_tile), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, r_tile), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((cs_w, 128), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((NT // chunk, r_tile), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NT // chunk, r_tile), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((S, r_pad), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.int32), codes_p, col, lut_q, aux, cs_q)

    d_q = outd.T[:B]  # (B, S)
    p_q = outi.T[:B]
    if selector == "approx" and S > 4 * kk:
        # wide candidate-pool selection (stage-0 of the codes tier): the
        # exact lax.top_k sort on 3e5-wide rows costs more than the scan;
        # approx_min_k at recall_target .95 loses ~5% of pool members the
        # downstream ef-selection would mostly drop anyway
        td, pos = jax.lax.approx_min_k(d_q, kk, recall_target=0.95)
        tp = jnp.take_along_axis(p_q, pos, axis=-1)
    else:
        td, tp = T.topk_smallest(d_q, p_q, kk)
    ids = jnp.where(jnp.isfinite(td), perm[jnp.clip(tp, 0, N - 1)], -1)
    if kk < k_out:
        td = jnp.pad(td, ((0, 0), (0, k_out - kk)), constant_values=jnp.inf)
        ids = jnp.pad(ids, ((0, 0), (0, k_out - kk)), constant_values=-1)
    return td, ids


# ---- binned chunk-min ADC (IVF-PQ: probed lists only, full-m quality) ----

_NT_BIN = 512  # list rows per grid step (lpad is a multiple, _LPAD_MULT)


def _adc_chunkmin_binned_kernel(
    codes_ref, col_ref, lut_ref, aux_ref, cs_ref,
    outd_ref, outi_ref, *, k: int, packed: bool, oh_dtype, dist: str,
    chunk: int, lpad: int, transposed: bool = False,
):
    """One (list, list-tile) -> (NT/chunk, QB) chunk-min survivors.

    The IVF inversion of the full-scan kernel: grid dim 0 walks posting
    lists (codes cluster-sorted, one contiguous lpad-row segment per list),
    and the resident LUT block holds ONLY the QB queries binned to this
    list (ops/binning.py) — each code row is scored against the queries
    that probe its list instead of the whole batch, which is where the
    nlist/n_probes work reduction comes from.

    lut_ref: (1, W, QB); aux_ref: (1, 8, QB) rows [0]=dequant scale,
    [1]=query norm, [2][0]=centroid-column scale, [3][0]=this list's valid
    row count as f32 (exact to 2^24; a per-list SMEM scalar input is not
    expressible — rank-1/rank-2 sub-(8,128) blocks fail Mosaic's block
    mapping rules, so the scalar rides the aux VMEM block); outd/outi:
    (1, NT/chunk, QB), outi = GLOBAL slot index (list_base + row) for
    post-hoc id decode."""
    l = pl.program_id(0)
    t = pl.program_id(1)
    NT = codes_ref.shape[1] if transposed else codes_ref.shape[0]
    QB = lut_ref.shape[2]
    codes = codes_ref[:].astype(jnp.int32)  # widen in VMEM (see kernel v2)
    if transposed:
        codes = codes.T  # (cw, NT) sublane-major at-rest tile -> row-major
    if packed:
        codes_u = jnp.concatenate([codes & 0xF, (codes >> 4) & 0xF], axis=1)
    else:
        codes_u = codes
    rep = pltpu.repeat(codes_u, k, axis=1)
    oh = (rep == col_ref[:1]).astype(oh_dtype)
    acc_t = jnp.int32 if oh_dtype == jnp.int8 else jnp.float32
    acc = jax.lax.dot_general(
        oh, lut_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=acc_t
    )
    d = acc.astype(jnp.float32) * aux_ref[0, 0:1]
    if dist == "cosine":
        cs_acc = jax.lax.dot_general(
            oh, cs_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=acc_t
        )
        c_sq = cs_acc[:, :1].astype(jnp.float32) * aux_ref[0, 2:3, :1]
        norm0 = jnp.sqrt(jnp.maximum(c_sq, 0.0))
        d = 1.0 - d / jnp.maximum(norm0 * aux_ref[0, 1:2], 1e-10)
    row_in_list = jax.lax.broadcasted_iota(jnp.int32, (NT, 1), 0) + t * NT
    d = jnp.where(row_in_list.astype(jnp.float32) < aux_ref[0, 3:4, :1], d,
                  jnp.inf)

    mins, args = [], []
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, QB), 0)
    base = l * lpad + t * NT
    for s in range(NT // chunk):
        seg = d[s * chunk : (s + 1) * chunk, :]
        mn = jnp.min(seg, axis=0, keepdims=True)
        a = jnp.min(
            jnp.where(seg == mn, rows, jnp.int32(2**30)), axis=0, keepdims=True
        )
        mins.append(mn)
        args.append(base + s * chunk + a)
    outd_ref[0] = jnp.concatenate(mins, axis=0)
    outi_ref[0] = jnp.concatenate(args, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("dist", "packed", "lut_dtype", "chunk", "lpad",
                     "transposed", "interpret"),
)
def adc_chunkmin_binned(
    lookup: jax.Array,  # (B, m, k) f32 per-query LUT
    codes_sorted: jax.Array,  # (>= nlist*lpad, cw) cluster-sorted codes
    #   — (cw, nlist*lpad) when `transposed` (sublane-major at-rest layout)
    lens: jax.Array,  # (nlist,) int32 valid rows per list
    bins: jax.Array,  # (nlist, QB) int32 query ids, -1 padded
    cb_sqnorm: jax.Array,  # (m, k) f32
    q_norms: jax.Array,  # (B,)
    dist: str,
    packed: bool = False,
    lut_dtype: str = "int8",
    chunk: int = _CHUNK,
    lpad: int = 0,
    transposed: bool = False,
    interpret: bool = False,
):
    """Chunk-min ADC over probed posting lists -> per-(list, bin-slot)
    survivors.

    Returns (outd, outi): (nlist, lpad//chunk, QB) f32 survivor distances
    and int32 GLOBAL SLOT indices (caller decodes slot -> original id and
    gathers each query's survivors from its probes' (list, slot) columns).
    Bin columns with no query (-1) compute against QUERY 0's LUT (the
    safe=maximum(bins, 0) clamp below) — harmless garbage the caller's
    slot mask discards, not a zero LUT (ADVICE r4 #5).

    HBM transient (ADVICE r4 #5): `lut_binned` materializes a per-list
    LUT copy of shape (nlist, W, QB) int8 per batch — at the flagship
    shape (nlist=2048, W=5120, qb=512) up to ~5.4 GB.  IVFPQIndex._auto_qb
    sizes qb to ~2x the mean per-list load precisely to bound this (qb=64
    at B=1000/p=48/nlist=2048 -> ~0.7 GB); callers picking a manual qb
    must budget nlist*W*qb bytes of headroom."""
    nlist, QB = bins.shape
    B, m, k = lookup.shape
    cw = codes_sorted.shape[0] if transposed else codes_sorted.shape[1]
    m_eff = 2 * cw if packed else cw
    W = m_eff * k
    NT = _NT_BIN
    assert lpad % NT == 0 and lpad % chunk == 0

    col = jnp.broadcast_to(
        (jnp.arange(W, dtype=jnp.int32) // m_eff)[None, :], (8, W)
    )
    lut_p = _v2_lut_layout(lookup, packed, m_eff, B)  # (W, B)
    lut_q, scales, oh_dtype = _prep_lut_quant(lut_p, lut_dtype)
    cos = dist == "cosine"
    cs_scale = jnp.float32(1.0)
    if cos:
        cs_full = _v2_lut_layout(cb_sqnorm[None], packed, m_eff, 128)
        if lut_dtype == "int8":
            cs_scale = jnp.maximum(jnp.max(jnp.abs(cs_full)) / 127.0, 1e-30)
            cs_q = jnp.round(cs_full / cs_scale).astype(jnp.int8)
        else:
            cs_q = cs_full.astype(oh_dtype)
    else:
        cs_q = jnp.zeros((8, 128), oh_dtype)

    safe = jnp.maximum(bins, 0)
    # per-list LUT columns: (W, nlist, QB) gather -> (nlist, W, QB)
    lut_binned = jnp.transpose(lut_q[:, safe], (1, 0, 2))
    aux = jnp.zeros((nlist, 8, QB), jnp.float32)
    aux = aux.at[:, 0, :].set(jnp.where(bins >= 0, scales[safe], 1.0))
    aux = aux.at[:, 1, :].set(q_norms[safe])
    aux = aux.at[:, 2, 0].set(cs_scale)
    aux = aux.at[:, 3, 0].set(lens.astype(jnp.float32))

    codes_p = _codes_as_i8(codes_sorted)
    need = nlist * lpad
    n_axis = 1 if transposed else 0
    if codes_p.shape[n_axis] < need:
        grow = need - codes_p.shape[n_axis]
        pad_n = ((0, 0), (0, grow)) if transposed else ((0, grow), (0, 0))
        codes_p = jnp.pad(codes_p, pad_n)
    elif codes_p.shape[n_axis] > need:
        # avoid a same-size slice: an in-jit slice of the full table copies
        # it (2.6 GB/batch at 10M) — callers pass exactly-sized arrays
        codes_p = codes_p[:, :need] if transposed else codes_p[:need]

    kernel = functools.partial(
        _adc_chunkmin_binned_kernel, k=k, packed=packed, oh_dtype=oh_dtype,
        dist=dist, chunk=chunk, lpad=lpad, transposed=transposed,
    )
    SB = NT // chunk
    tiles = lpad // NT
    cs_w = cs_q.shape[0]
    codes_spec = (
        pl.BlockSpec((cw, NT), lambda l, t: (0, l * (lpad // _NT_BIN) + t),
                     memory_space=pltpu.VMEM)
        if transposed
        else pl.BlockSpec((NT, cw), lambda l, t: (l * (lpad // _NT_BIN) + t, 0),
                          memory_space=pltpu.VMEM)
    )
    outd, outi = pl.pallas_call(
        kernel,
        grid=(nlist, tiles),
        in_specs=[
            codes_spec,
            pl.BlockSpec((8, W), lambda l, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, QB), lambda l, t: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, QB), lambda l, t: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cs_w, 128), lambda l, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, SB, QB), lambda l, t: (l, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SB, QB), lambda l, t: (l, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nlist, lpad // chunk, QB), jnp.float32),
            jax.ShapeDtypeStruct((nlist, lpad // chunk, QB), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(codes_p, col, lut_binned, aux, cs_q)
    return outd, outi


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
    through the scan kernel (`adc_sums`) per 128-query tile: it computes
    sums against the whole tile's LUT rows and the per-query diagonal is
    selected after.  That does QT=128x redundant MACs, but one-hot matmuls
    are nearly free on the MXU; the code-row gather stays in XLA (code rows
    are far below the (32, 128) int8 tile, so per-row DMA cannot be
    aligned)."""
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
    jax.jit,
    static_argnames=("k_out", "dist", "packed", "exact", "block", "interpret",
                     "lut_dtype"),
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
    lut_dtype: str = "int8",
):
    """Full ADC scan + top-k through the Pallas kernel, blocked over N so
    the (N, B) distance matrix never materializes (at N=1e6, B=1e3 it would
    be 4 GB of HBM).

    Stage-1 candidate ordering defaults to the int8-quantized LUT (every
    caller exact-reranks; see module docstring for the error budget).

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
        sums = adc_sums(tile_codes, rows, packed=packed, exact=exact,
                        interpret=interpret, lut_dtype=lut_dtype)
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
        bd, bi = T.select_smallest(d, ids, kk)
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
        # block-wide reduce via approx_min_k (exact at recall_target=1.0);
        # the full-sort lax.top_k on 1e5-wide rows cost ~6x the ADC kernel
        td, ti = T.select_smallest(d, ids, k_out)
        return T.merge_topk(best_d, best_i, td, ti, k_out), None

    init = (
        jnp.full((B, k_out), jnp.inf, jnp.float32),
        jnp.full((B, k_out), -1, jnp.int32),
    )
    (bd, bi), _ = jax.lax.scan(body, init, jnp.arange(num_blocks, dtype=jnp.int32))
    return bd, jnp.where(jnp.isfinite(bd), bi, -1)
