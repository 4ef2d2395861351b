"""Pallas ADC kernel vs the XLA reference implementation (interpret mode on
CPU; the same kernel compiles for real on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lab_1806_vec_db_tpu.models import PQTable
from lab_1806_vec_db_tpu.ops import pq as P
from lab_1806_vec_db_tpu.ops import pallas_adc as PA
from lab_1806_vec_db_tpu.utils.config import PQConfig


def _fixture(dist, gist_1000, n_bits=4):
    vecs = gist_1000[:200, :24].copy()
    queries = gist_1000[200:210, :24].copy()
    cfg = PQConfig(n_bits=n_bits, m=8, dist=dist, k_means_size=100)
    pq = PQTable.train(vecs, cfg, seed=0)
    q_dev = jnp.asarray(queries)
    lookup, q_norms = pq.create_lookup(q_dev)
    return pq, lookup, q_norms, len(vecs)


@pytest.mark.parametrize("dist", ["l2sqr", "cosine"])
def test_pallas_adc_matches_xla(dist, gist_1000):
    """exact=True (f32 operands): bit-compatible with the XLA gather path."""
    pq, lookup, q_norms, n = _fixture(dist, gist_1000)
    _, _, cb_sq = pq.device()
    codes_unpacked = jnp.asarray(pq.codes)

    d_ref, i_ref = P.adc_scan(lookup, codes_unpacked, jnp.int32(n), cb_sq, q_norms, 10, dist)
    d_pal, i_pal = PA.adc_scan_pallas(
        lookup, codes_unpacked, jnp.int32(n), cb_sq, q_norms, 10, dist,
        exact=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(d_pal), np.asarray(d_ref), rtol=1e-4, atol=1e-5
    )
    # ids may differ only on exact distance ties; compare via distances
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


@pytest.mark.parametrize("dist", ["l2sqr", "cosine"])
def test_pallas_adc_packed_nibbles(dist, gist_1000):
    """In-kernel nibble unpack (4-bit codes packed in device memory,
    pq_table.rs:66-91 layout) must equal the unpacked-codes kernel."""
    pq, lookup, q_norms, n = _fixture(dist, gist_1000)
    codes_dev, _, cb_sq = pq.device()
    assert pq.packed and codes_dev.shape[1] == 4  # (N, ceil(8/2)) bytes

    d_u, i_u = PA.adc_scan_pallas(
        lookup, jnp.asarray(pq.codes), jnp.int32(n), cb_sq, q_norms, 10, dist,
        exact=True, interpret=True,
    )
    d_p, i_p = PA.adc_scan_pallas(
        lookup, codes_dev, jnp.int32(n), cb_sq, q_norms, 10, dist,
        packed=True, exact=True, interpret=True,
    )
    # the packed kernel's LUT group permutation reorders the f32 summation,
    # so values agree to rounding (not bitwise)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_u), rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_u))


@pytest.mark.parametrize(
    "lut_dtype,med_tol,max_tol",
    [("bf16", 5e-3, 0.15), ("int8", 3e-2, 0.5)],
)
def test_pallas_adc_quantized_lut_tolerance(lut_dtype, med_tol, max_tol, gist_1000):
    """The production quantized-LUT paths (bf16, and the per-query int8
    stage-1 default): partial-distance rounding must stay small relative to
    the distances (stage-1 ordering only; callers exact-rerank)."""
    pq, lookup, q_norms, n = _fixture("l2sqr", gist_1000)
    codes_dev, _, cb_sq = pq.device()
    d_ref, _ = P.adc_scan(lookup, jnp.asarray(pq.codes), jnp.int32(n), cb_sq, q_norms, 10, "l2sqr")
    d_bf, _ = PA.adc_scan_pallas(
        lookup, codes_dev, jnp.int32(n), cb_sq, q_norms, 10, "l2sqr",
        packed=True, interpret=True, lut_dtype=lut_dtype,
    )
    ref = np.asarray(d_ref)
    rel = np.abs(np.asarray(d_bf) - ref) / np.maximum(np.abs(ref), 1e-6)
    print(f"{lut_dtype}: median {np.median(rel):.2e} max {rel.max():.2e}")
    assert np.median(rel) < med_tol and rel.max() < max_tol


def test_unpack_codes_4bit_dev_roundtrip(rng):
    codes = rng.integers(0, 16, size=(13, 7)).astype(np.uint8)
    packed = P.pack_codes_4bit(codes)
    out = np.asarray(P.unpack_codes_4bit_dev(jnp.asarray(packed), 7))
    np.testing.assert_array_equal(out, codes)


@pytest.mark.parametrize("dist", ["l2sqr", "cosine"])
@pytest.mark.parametrize("packed", [False, True])
def test_adc_dists_for_ids_matches_xla(dist, packed, gist_1000):
    """Per-query candidate ADC (the HNSW+PQ traversal kernel) vs the XLA
    take_along_axis oracle, incl. -1 masking and nibble-packed codes."""
    pq, lookup, q_norms, n = _fixture(dist, gist_1000)
    _, _, cb_sq = pq.device()
    rng = np.random.default_rng(0)
    B = int(lookup.shape[0])
    C = 13  # deliberately unaligned
    ids = rng.integers(0, n, size=(B, C)).astype(np.int32)
    ids[0, 3] = -1
    ids[5, :] = -1  # fully-converged query
    if packed:
        codes_dev = jnp.asarray(P.pack_codes_4bit(pq.codes))
    else:
        codes_dev = jnp.asarray(pq.codes)
    got = PA.adc_dists_for_ids(
        lookup, q_norms, codes_dev, cb_sq, jnp.asarray(ids), dist,
        pq.config.m, packed=packed, interpret=True,
    )
    want = P.adc_lookup_codes(
        jnp.asarray(pq.codes)[jnp.maximum(jnp.asarray(ids), 0)],
        lookup, cb_sq, dist, q_norms,
    )
    want = jnp.where(jnp.asarray(ids) >= 0, want, jnp.inf)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("dist", ["l2sqr", "cosine"])
@pytest.mark.parametrize("lut_dtype", ["f32", "int8"])
def test_adc_scan_chunkmin_matches_dense(dist, lut_dtype, rng):
    """The fused chunk-min scan (the production full-scan path) must agree
    with the exact XLA ADC ordering up to chunk-collision loss: top-10 of a
    4096-row set, >= 9/10 mean overlap (deterministic fixture/seed)."""
    n, dim, m, nb = 4096, 32, 8, 4
    vecs = np.abs(rng.standard_normal((n, dim))).astype(np.float32)
    queries = np.abs(rng.standard_normal((16, dim))).astype(np.float32)
    cfg = PQConfig(n_bits=nb, m=m, dist=dist, k_means_size=512)
    pq = PQTable.train(vecs, cfg, seed=0)
    lookup, q_norms = pq.create_lookup(jnp.asarray(queries))
    _, _, cb_sq = pq.device()

    d_ref, i_ref = P.adc_scan(
        lookup, jnp.asarray(pq.codes), jnp.int32(n), cb_sq, q_norms, 10, dist)

    codes_s, perm = pq.device_scan()
    d_cm, i_cm = PA.adc_scan_chunkmin(
        lookup, codes_s, perm, jnp.int32(n), cb_sq, q_norms, 10, dist,
        packed=pq.packed, lut_dtype=lut_dtype, interpret=True)

    a, e = np.asarray(i_cm), np.asarray(i_ref)
    overlap = np.mean([len(set(a[i]) & set(e[i])) / 10 for i in range(len(e))])
    assert overlap >= 0.9, overlap
    # survivor distances must match the exact ADC distance of the id they
    # name (f32 path: to rounding; int8: to the quantization budget)
    dd = np.asarray(d_cm)
    md = np.asarray(P.adc_lookup_codes(
        jnp.asarray(pq.codes)[np.maximum(a, 0)], lookup, cb_sq, dist, q_norms))
    rel = np.abs(dd - md) / np.maximum(np.abs(md), 1e-5)
    tol = 1e-4 if lut_dtype == "f32" else 5e-2
    assert np.median(rel[a >= 0]) < tol


def test_adc_transposed_layout_exact_parity(rng):
    """The transposed-at-rest code layout (codes (cw, N), cw on sublanes —
    the r5 zero-padding layout for cw not a lane multiple) must produce
    BIT-IDENTICAL survivors to the row-major layout in both the full-scan
    and binned chunk-min kernels (the transpose is an in-kernel relayout,
    not a numerical change)."""
    N, m, k, B = 8192, 16, 16, 64
    cw = m // 2
    codes = jnp.asarray(rng.integers(0, 256, (N, cw), dtype=np.uint8))
    codes_t = jnp.asarray(np.asarray(codes).T.copy())
    perm = jnp.arange(N, dtype=jnp.int32)
    lookup = jnp.asarray(rng.standard_normal((B, m, k)).astype(np.float32))
    cb_sq = jnp.zeros((m, k), jnp.float32)
    qn = jnp.ones((B,), jnp.float32)

    d0, i0 = PA.adc_scan_chunkmin(
        lookup, codes, perm, jnp.int32(N), cb_sq, qn, 20, "l2sqr",
        packed=True, interpret=True)
    d1, i1 = PA.adc_scan_chunkmin(
        lookup, codes_t, perm, jnp.int32(N), cb_sq, qn, 20, "l2sqr",
        packed=True, transposed=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))

    # binned kernel: 8 lists x lpad rows, every query binned to two lists
    nlist, lpad, qb = 8, 1024, 16
    cs = codes[: nlist * lpad]
    cs_t = jnp.asarray(np.asarray(cs).T.copy())
    lens = jnp.full((nlist,), lpad - 3, jnp.int32)
    bins = jnp.asarray(
        rng.integers(0, B, (nlist, qb), dtype=np.int32))
    od0, oi0 = PA.adc_chunkmin_binned(
        lookup, cs, lens, bins, cb_sq, qn, "l2sqr", packed=True, lpad=lpad,
        interpret=True)
    od1, oi1 = PA.adc_chunkmin_binned(
        lookup, cs_t, lens, bins, cb_sq, qn, "l2sqr", packed=True, lpad=lpad,
        transposed=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(oi0), np.asarray(oi1))
    np.testing.assert_array_equal(np.asarray(od0), np.asarray(od1))
