"""Pallas TPU kernel: fused PQ-ADC distance scan.

The XLA formulation of the ADC scan (`ops/pq.py:adc_scan`) gathers LUT
entries by code (`take_along_axis`), which lowers to scalar-unit gathers on
TPU.  This kernel reformulates the lookup as **one-hot MXU matmuls**: for a
chunk of G groups, codes expand to a (N_t, G*k) one-hot tile (a VPU compare
against a broadcasted iota) and the partial-distance sum over those groups
is one (N_t, G*k) x (G*k, B_t) matmul — the gather becomes a 128-wide
contraction on the systolic array, and the uint8 codes are the only HBM
traffic per base row.

For Cosine the per-code centroid squared-norm sum rides the same matmul as
one extra LUT row.

Reference behavior being accelerated: the ADC accumulation loop at
src/distance/pq_table.rs:252-299 (L2Sqr sum of partial distances; Cosine
norm reconstruction 1 - sum / (sqrt(c_sq) * |q|), pq_table.rs:291-299).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile sizes: lane dim fixed at 128 = G * k for k=16 -> G=8 groups per step
_NT = 512  # base rows per tile
_BT = 128  # queries per tile (min f32 sublane alignment handled by padding)


def _adc_kernel(codes_ref, lut_ref, out_ref, *, m_pad: int, k: int, n_groups_step: int):
    """codes_ref: (NT, m_pad) int32; lut_ref: (BT, m_pad*k) f32;
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
        codes_g = codes[:, g0 : g0 + G]  # (NT, G)
        # one-hot over the k codewords of each group, laid out as G*k lanes
        col = jax.lax.broadcasted_iota(jnp.int32, (NT, G, k), 2)
        oh = (codes_g[:, :, None] == col).reshape(NT, W).astype(jnp.float32)
        lut_g = lut[:, g0 * k : g0 * k + W]  # (BT, W)
        acc = acc + jax.lax.dot_general(
            oh, lut_g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def adc_sums(codes: jax.Array, lut_rows: jax.Array, interpret: bool = False) -> jax.Array:
    """Compute per-(base,query-row) ADC sums.

    codes: (N, m) uint8/int32 — padded to tiles internally.
    lut_rows: (R, m, k) f32 lookup rows (queries, plus optionally one extra
      row of centroid squared norms for Cosine).
    Returns (N, R) f32 sums: sum_i lut_rows[r, i, codes[n, i]].
    """
    N, m = codes.shape
    R, m2, k = lut_rows.shape
    assert m2 == m
    G = max(128 // k, 1)
    m_pad = ((m + G - 1) // G) * G
    n_pad = ((N + _NT - 1) // _NT) * _NT
    r_pad = ((R + _BT - 1) // _BT) * _BT

    codes_p = jnp.zeros((n_pad, m_pad), jnp.int32)
    codes_p = codes_p.at[:N, :m].set(codes.astype(jnp.int32))
    # padded groups point at code 0 of a zero LUT column -> contribute 0
    lut_p = jnp.zeros((r_pad, m_pad * k), jnp.float32)
    lut_p = lut_p.at[:R, : m * k].set(lut_rows.reshape(R, m * k))

    kernel = functools.partial(
        _adc_kernel, m_pad=m_pad, k=k, n_groups_step=G
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // _NT, r_pad // _BT),
        in_specs=[
            pl.BlockSpec((_NT, m_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BT, m_pad * k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_NT, _BT), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, r_pad), jnp.float32),
        interpret=interpret,
    )(codes_p, lut_p)
    return out[:N, :R]


def adc_scan_pallas(
    lookup: jax.Array,  # (B, m, k) f32
    codes: jax.Array,  # (N, m) uint8
    n_valid,
    cb_sqnorm: jax.Array,  # (m, k) f32
    q_norms: jax.Array,  # (B,)
    k_out: int,
    dist: str,
    interpret: bool = False,
):
    """Full ADC scan + top-k through the Pallas kernel.

    Same contract as ops.pq.adc_scan (B, k_out) dists/ids.
    """
    from . import topk as T

    B = lookup.shape[0]
    N = codes.shape[0]
    if dist == "cosine":
        rows = jnp.concatenate([lookup, cb_sqnorm[None, :, :]], axis=0)
        sums = adc_sums(codes, rows, interpret=interpret)  # (N, B+1)
        dots = sums[:, :B]
        c_sq = sums[:, B]
        norm0 = jnp.sqrt(c_sq)[:, None]
        d = 1.0 - dots / jnp.maximum(norm0 * q_norms[None, :], 1e-10)
    else:
        d = adc_sums(codes, lookup, interpret=interpret)  # (N, B)
    d = d.T  # (B, N)
    ids = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    d = jnp.where(ids < n_valid, d, jnp.inf)
    kk = min(k_out, N)
    bd, bi = T.topk_smallest(d, ids, kk)
    if kk < k_out:
        bd = jnp.pad(bd, ((0, 0), (0, k_out - kk)), constant_values=jnp.inf)
        bi = jnp.pad(bi, ((0, 0), (0, k_out - kk)), constant_values=-1)
    return bd, jnp.where(jnp.isfinite(bd), bi, -1)
