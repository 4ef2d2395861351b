"""PQCodesIndex: the codes-resident scale tier (coarse ADC pool -> main ADC
-> exact refine by block regeneration).  Interpret-mode Pallas on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lab_1806_vec_db_tpu.models import FlatIndex, PQCodesIndex
from lab_1806_vec_db_tpu.utils.config import PQConfig

N, DIM, BR = 20000, 64, 4096


def _gen(dist):
    """Deterministic jit-traceable block generator (the bench's device-born
    ingest shape): spectrum-decay gaussians clipped at 0, the Gist-like
    regime PQ is built for.  (A tight-cluster mixture is an adversarial
    fixture for ANY product quantizer — within-cluster gaps sit far below
    the quantization cell size — and collapses the reference's PQ too;
    the self-test gate covers that regime.)"""
    key = jax.random.PRNGKey(7)
    kb, kq = jax.random.split(key, 2)
    scales = jnp.asarray(
        (1.2 * np.exp(-0.06 * np.arange(DIM))).astype(np.float32))

    def draw_rows(params, key, row_ids):
        (s,) = params
        keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(
            row_ids.astype(jnp.uint32))
        z = jax.vmap(lambda kk: jax.random.normal(kk, (DIM,), jnp.float32))(keys)
        return jnp.clip(z * s + 0.2, 0.0, None)

    gen_rows = jax.jit(draw_rows)
    params = (scales,)

    def fill(row0, rows):
        return gen_rows(params, kb, row0 + jnp.arange(rows, dtype=jnp.int32))

    qz = jax.vmap(lambda kk: jax.random.normal(kk, (DIM,), jnp.float32))(
        jax.random.split(kq, 32))
    queries = np.asarray(jnp.clip(qz * scales + 0.2, 0.0, None))
    fill.row_gen = (draw_rows, params, kb)
    return fill, (draw_rows, params, kb), queries


def _build(dist, traced=True):
    fill, gen3, queries = _gen(dist)
    idx = PQCodesIndex.build_from_fill(
        fill, N, DIM, dist,
        pq_config=PQConfig(n_bits=4, m=16, dist=dist, k_means_size=4000,
                           rotate=True),
        coarse_m=8, sample_rows=4000, block_rows=BR,
        row_gen=gen3 if traced else None,
    )
    base = np.concatenate([np.asarray(fill(r, min(BR, N - r)))
                           for r in range(0, N, BR)])
    return idx, base, queries


@pytest.mark.parametrize("dist", ["l2sqr", "cosine"])
def test_pq_codes_recall_and_exact_distances(dist):
    idx, base, queries = _build(dist)
    # main codes row-major (rows gathered by candidate id); coarse codes
    # transposed at rest (cw on sublanes — the r5 layout)
    assert idx._codes.shape[1] == 8
    assert idx._codes_c_is_t and idx._codes_c.shape[0] == 4
    flat = FlatIndex.from_numpy(base, dist)
    _, gt = flat.knn_batch(queries, 10, exact=True)

    d, i = idx.knn_batch(queries, 10, ef=128, c0=1024, interpret=True)
    d, i = np.asarray(d), np.asarray(i)
    recall = np.mean([len(set(gt[q]) & set(i[q])) / 10 for q in range(len(queries))])
    assert recall >= 0.85, recall
    # returned distances are EXACT f32 of the returned ids (refine contract)
    for q in range(len(queries)):
        for c in range(10):
            if i[q, c] < 0:
                continue
            if dist == "l2sqr":
                true = float(((base[i[q, c]] - queries[q]) ** 2).sum())
            else:
                a, b = base[i[q, c]], queries[q]
                true = 1.0 - float(a @ b) / max(
                    float(np.linalg.norm(a) * np.linalg.norm(b)), 1e-10)
            assert abs(d[q, c] - true) <= 1e-3 + 1e-4 * abs(true)
        fin = d[q][np.isfinite(d[q])]
        assert np.all(np.diff(fin) >= -1e-6)


def test_pq_codes_host_fill_refine_matches_traced():
    """The host-fill fallback refine must produce the same result set as
    the single-program traced refine."""
    idx_t, base, queries = _build("l2sqr", traced=True)
    idx_h = PQCodesIndex(
        idx_t.pq, idx_t.coarse, N, DIM, "l2sqr",
        fill=lambda row0, rows: jnp.asarray(base[row0:row0 + rows]),
        traced_gen=None, row_gen=None, block_rows=BR,
    )
    idx_h._codes, idx_h._codes_c = idx_t._codes, idx_t._codes_c
    idx_h._codes_c_is_t = idx_t._codes_c_is_t
    idx_h._perm, idx_h._inv = idx_t._perm, idx_t._inv
    d_t, i_t = idx_t.knn_batch(queries, 10, ef=64, c0=512, interpret=True)
    d_h, i_h = idx_h.knn_batch(queries, 10, ef=64, c0=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_h))
    np.testing.assert_allclose(np.asarray(d_t), np.asarray(d_h),
                               rtol=1e-5, atol=1e-6)


def test_pq_codes_index_bytes_small():
    """The whole point: device bytes ~ (m/2 + mc/2 + 8)/row, far below the
    f32 row (DIM*4) and the lean tier (~3*DIM)."""
    idx, _, _ = _build("l2sqr")
    per_row = idx.index_bytes() / N
    assert per_row < 0.3 * DIM * 4  # << f32 rows


def test_ivfpq_recall_and_exact_distances():
    """IVFPQIndex: binned probed-list ADC + overflow scan + exact refine."""
    from lab_1806_vec_db_tpu.models import IVFPQIndex

    fill, gen3, queries = _gen("l2sqr")
    idx = IVFPQIndex.build_from_fill(
        fill, N, DIM, "l2sqr", nlist=32,
        pq_config=PQConfig(n_bits=4, m=32, dist="l2sqr", k_means_size=4000,
                           rotate=True),
        sample_rows=4000, block_rows=BR, row_gen=gen3,
    )
    base = np.concatenate([np.asarray(fill(r, min(BR, N - r)))
                           for r in range(0, N, BR)])
    flat = FlatIndex.from_numpy(base, "l2sqr")
    _, gt = flat.knn_batch(queries, 10, exact=True)

    d, i = idx.knn_batch(queries, 10, n_probes=8, ef=160, qb=32,
                         chunk=8, interpret=True)
    d, i = np.asarray(d), np.asarray(i)
    recall = np.mean([len(set(gt[q]) & set(i[q])) / 10 for q in range(len(queries))])
    assert recall >= 0.85, recall
    for q in range(len(queries)):
        for c in range(10):
            if i[q, c] < 0:
                continue
            true = float(((base[i[q, c]] - queries[q]) ** 2).sum())
            assert abs(d[q, c] - true) <= 1e-3 + 1e-4 * abs(true)
        fin = d[q][np.isfinite(d[q])]
        assert np.all(np.diff(fin) >= -1e-6)
    # every valid row is findable exactly once across lists + overflow
    sid = np.asarray(idx._slot_id)
    kl = idx.nlist * idx.lpad
    lens = idx.lens
    seen = []
    for l in range(idx.nlist):
        seen.append(sid[l * idx.lpad: l * idx.lpad + lens[l]])
    seen.append(sid[kl: kl + idx.ov_count])
    seen = np.concatenate(seen)
    assert sorted(seen.tolist()) == list(range(N))


def test_ivfpq_fused_single_program_matches_unfused():
    """The fused single-program search (_ivfpq_search_jit — the production
    10M bench configuration: row_gen present, unrotated table,
    non-interpret) must match the unfused path result-for-result (ADVICE
    r4 #3: the fused trace had no pytest coverage, so a regression in the
    lookup build / inline refine / S sizing would only surface on
    hardware).  force_tpu_interpret_mode runs its Pallas kernels
    interpreted on CPU while the routing still takes the fused branch."""
    from jax.experimental.pallas import tpu as pltpu
    from lab_1806_vec_db_tpu.models import IVFPQIndex
    from lab_1806_vec_db_tpu.models import ivfpq as IVFPQ

    fill, gen3, queries = _gen("l2sqr")
    idx = IVFPQIndex.build_from_fill(
        fill, N, DIM, "l2sqr", nlist=32,
        pq_config=PQConfig(n_bits=4, m=32, dist="l2sqr", k_means_size=4000,
                           rotate=False),
        sample_rows=4000, block_rows=BR, row_gen=gen3,
    )
    assert idx.pq.rotation is None  # fused-path precondition
    d_u, i_u = idx.knn_batch(queries, 10, n_probes=8, ef=160, qb=32,
                             chunk=8, interpret=True)
    calls = []
    orig = IVFPQ._ivfpq_search_jit

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    IVFPQ._ivfpq_search_jit = spy
    try:
        with pltpu.force_tpu_interpret_mode():
            d_f, i_f = idx.knn_batch(queries, 10, n_probes=8, ef=160, qb=32,
                                     chunk=8, interpret=False)
    finally:
        IVFPQ._ivfpq_search_jit = orig
    assert calls, "fused branch was not taken"
    np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_u))
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_u),
                               rtol=1e-4, atol=1e-5)


def test_row_gen_matches_fill():
    """The row-addressable generator must reproduce exactly the rows `fill`
    produces (the refine's correctness rests on this identity)."""
    fill, (draw_rows, params, key), _ = _gen("l2sqr")
    import jax.numpy as jnp

    blk = np.asarray(fill(BR, BR))
    ids = np.array([BR, BR + 7, BR + BR - 1], np.int32)
    rows = np.asarray(draw_rows(params, key, jnp.asarray(ids)))
    np.testing.assert_allclose(rows, blk[ids - BR], rtol=1e-6, atol=1e-7)


def test_ivfpq_cosine_and_serde(tmp_path):
    """Cosine metric end-to-end + checkpoint/resume: a reloaded index (row
    source re-attached) returns identical results."""
    from lab_1806_vec_db_tpu.models import IVFPQIndex

    fill, gen3, queries = _gen("cosine")
    idx = IVFPQIndex.build_from_fill(
        fill, N, DIM, "cosine", nlist=32,
        pq_config=PQConfig(n_bits=4, m=32, dist="cosine", k_means_size=4000,
                           rotate=True),
        sample_rows=4000, block_rows=BR, row_gen=gen3,
    )
    base = np.concatenate([np.asarray(fill(r, min(BR, N - r)))
                           for r in range(0, N, BR)])
    flat = FlatIndex.from_numpy(base, "cosine")
    _, gt = flat.knn_batch(queries, 10, exact=True)
    d1, i1 = idx.knn_batch(queries, 10, n_probes=8, ef=160, qb=32, chunk=8,
                           interpret=True)
    rec = np.mean([len(set(gt[q]) & set(np.asarray(i1)[q])) / 10
                   for q in range(len(queries))])
    assert rec >= 0.8, rec

    p = str(tmp_path / "ivfpq.npz")
    idx.save(p)
    idx2 = IVFPQIndex.load(p, row_gen=gen3)
    d2, i2 = idx2.knn_batch(queries, 10, n_probes=8, ef=160, qb=32, chunk=8,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)


def test_pq_codes_serde(tmp_path):
    """PQCodesIndex checkpoint/resume parity."""
    idx, base, queries = _build("l2sqr")
    d1, i1 = idx.knn_batch(queries, 10, ef=64, c0=512, interpret=True)
    p = str(tmp_path / "codes.npz")
    idx.save(p)
    from lab_1806_vec_db_tpu.models import PQCodesIndex

    idx2 = PQCodesIndex.load(p, row_gen=idx._row_gen)
    d2, i2 = idx2.knn_batch(queries, 10, ef=64, c0=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)


def test_ivfpq_slot_ordered_encode_matches_scatter():
    """The slot-ordered streaming encode (row-addressable build path — no
    row-major accumulator, the r5 capacity fix) must produce byte-identical
    code segments to the block-scatter path."""
    from lab_1806_vec_db_tpu.models import IVFPQIndex

    fill, gen3, _ = _gen("l2sqr")
    kw = dict(
        nlist=32,
        pq_config=PQConfig(n_bits=4, m=32, dist="l2sqr", k_means_size=4000),
        sample_rows=4000, block_rows=BR,
    )
    a = IVFPQIndex.build_from_fill(fill, N, DIM, "l2sqr", row_gen=gen3, **kw)
    b = IVFPQIndex.build_from_fill(fill, N, DIM, "l2sqr", **kw)
    assert a._codes_is_t and b._codes_is_t
    # pad slots differ by construction (slot-ordered writes row-0 filler
    # codes, scatter leaves zeros) and are masked at search (list lens /
    # ov_valid); compare the VALID slots only
    ca = np.asarray(a._codes).view(np.uint8)
    cb = np.asarray(b._codes).view(np.uint8)
    col = np.arange(ca.shape[1])
    valid = (col % a.lpad) < a.lens[col // a.lpad]
    np.testing.assert_array_equal(ca[:, valid], cb[:, valid])
    ov = a.ov_count
    np.testing.assert_array_equal(
        np.asarray(a._codes_ov).view(np.uint8)[:, :ov],
        np.asarray(b._codes_ov).view(np.uint8)[:, :ov])
