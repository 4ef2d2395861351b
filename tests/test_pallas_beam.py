"""Fused beam-body kernels (ops/pallas_beam.py): interpret-mode kernels
must be bit-identical to their pure-XLA twins, and the fused beam search
must match the classic XLA formulation's search quality."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lab_1806_vec_db_tpu.ops import beam as BM
from lab_1806_vec_db_tpu.ops import pallas_beam as PB


def _rand_state(rng, B=40, W=128, R=256, EL=128, E=4, N=5000):
    beam_i = rng.integers(0, N, (B, W)).astype(np.int32)
    beam_i[:, 100:] = -1  # ef=100 style tail
    beam_d = np.sort(rng.random((B, W)).astype(np.float32), axis=1)
    beam_d[beam_i < 0] = np.inf
    beam_e = (rng.random((B, W)) < 0.5).astype(np.int32)
    beam_e[beam_i < 0] = 0
    ring = rng.integers(-1, N, (B, R)).astype(np.int32)
    selq = np.full((B, 128), -1, np.int32)
    selq[:, :E] = rng.integers(-1, N, (B, E))
    nbrs = rng.integers(-1, N, (B, EL)).astype(np.int32)
    # sprinkle guaranteed duplicates of beam/ring/tile entries
    nbrs[:, 3] = beam_i[:, 0]
    nbrs[:, 5] = ring[:, 2]
    nbrs[:, 7] = nbrs[:, 1]
    return (jnp.asarray(beam_d), jnp.asarray(beam_i), jnp.asarray(beam_e),
            jnp.asarray(ring), jnp.asarray(selq), jnp.asarray(nbrs))


@pytest.mark.parametrize("E,EL,W", [(4, 128, 128), (8, 256, 256)])
def test_beam_pre_kernel_matches_ref(E, EL, W):
    rng = np.random.default_rng(0)
    _, beam_i, _, ring, selq, nbrs = _rand_state(
        rng, W=W, EL=EL, E=E)
    ck, rk, nk = PB.beam_pre(beam_i, ring, selq, nbrs, E=E, interpret=True)
    cr, rr, nr = PB.beam_pre_ref(beam_i, ring, selq, nbrs, E=E)
    np.testing.assert_array_equal(np.asarray(ck), np.asarray(cr))
    np.testing.assert_array_equal(np.asarray(rk), np.asarray(rr))
    np.testing.assert_array_equal(np.asarray(nk), np.asarray(nr))


@pytest.mark.parametrize("ef,E,W", [(100, 4, 128), (180, 4, 256)])
def test_beam_post_kernel_matches_ref(ef, E, W):
    rng = np.random.default_rng(1)
    beam_d, beam_i, beam_e, _, _, _ = _rand_state(rng, W=W)
    nd = rng.random((40, W)).astype(np.float32)
    nids = rng.integers(-1, 5000, (40, W)).astype(np.int32)
    nd[nids < 0] = np.inf
    nd, nids = jnp.asarray(nd), jnp.asarray(nids)
    ok = PB.beam_post(beam_d, beam_i, beam_e, nd, nids, ef=ef, E=E,
                      interpret=True)
    orf = PB.beam_post_ref(beam_d, beam_i, beam_e, nd, nids, ef=ef, E=E)
    for a, b, name in zip(ok, orf, ("d", "i", "e", "sel")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_beam_post_semantics():
    """Merged beam is the sorted ef-best of (beam, tile); selected lanes
    are the E best unexpanded entries and get their flags set."""
    B, W, ef, E = 8, 128, 16, 4
    rng = np.random.default_rng(2)
    beam_d = np.full((B, W), np.inf, np.float32)
    beam_i = np.full((B, W), -1, np.int32)
    beam_e = np.zeros((B, W), np.int32)
    beam_d[:, 0] = 0.5
    beam_i[:, 0] = 7
    nd = np.full((B, W), np.inf, np.float32)
    nids = np.full((B, W), -1, np.int32)
    nd[:, :8] = rng.random((B, 8)).astype(np.float32)
    nids[:, :8] = np.arange(100, 108)
    d, i, e, sel = PB.beam_post_ref(
        jnp.asarray(beam_d), jnp.asarray(beam_i), jnp.asarray(beam_e),
        jnp.asarray(nd), jnp.asarray(nids), ef=ef, E=E)
    d, i, e, sel = map(np.asarray, (d, i, e, sel))
    # union of {0.5@7} and the 8 fresh, sorted ascending, 9 finite entries
    exp_d = np.sort(np.concatenate([nd[0, :8], [0.5]]))
    np.testing.assert_allclose(d[0, :9], exp_d, rtol=1e-6)
    assert np.all(d[:, ef:] == np.inf) and np.all(i[:, ef:] == -1)
    # the E best entries are selected and flagged expanded
    np.testing.assert_array_equal(sel[0, :E], i[0, :E])
    assert np.all(e[:, :E] == 1) and np.all(e[:, E:] == 0)
    assert np.all(sel[:, E:] == -1)


def _knn_graph(rng, N=400, dim=16, L=8):
    vecs = rng.standard_normal((N, dim)).astype(np.float32)
    d2 = ((vecs[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    links = np.argsort(d2, axis=1)[:, :L].astype(np.int32)
    return vecs, links


def _fns(vecs, links, queries):
    vecs_j = jnp.asarray(vecs)
    links_j = jnp.asarray(links)
    q = jnp.asarray(queries)

    def nd(ids):
        v = vecs_j[jnp.maximum(ids, 0)]
        d = jnp.sum((v - q[:, None, :]) ** 2, axis=-1)
        return jnp.where(ids >= 0, d, jnp.inf)

    return nd, lambda ids: links_j[ids]


def test_fused_beam_search_quality_matches_classic():
    """End-to-end: fused pipeline (XLA twins) finds the same neighbors as
    the classic lock-step formulation on a kNN graph."""
    rng = np.random.default_rng(3)
    vecs, links = _knn_graph(rng)
    queries = rng.standard_normal((16, vecs.shape[1])).astype(np.float32)
    nd, lf = _fns(vecs, links, queries)
    entry = jnp.zeros((16,), jnp.int32)
    ef = 32
    d_c, i_c = BM.beam_search(entry, nd, lf, ef, max_iters=200, expand=4,
                              ring_size=128)
    d_f, i_f = BM.beam_search_fused(entry, nd, lf, ef, max_iters=200,
                                    expand=4, ring_size=128,
                                    use_kernels=False)
    # ground truth top-10
    d2 = ((vecs[None, :, :] - queries[:, None, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :10]
    rec_c = np.mean([len(set(gt[b]) & set(np.asarray(i_c)[b, :10])) / 10
                     for b in range(16)])
    rec_f = np.mean([len(set(gt[b]) & set(np.asarray(i_f)[b, :10])) / 10
                     for b in range(16)])
    assert rec_f >= rec_c - 0.05, (rec_f, rec_c)
    assert rec_f >= 0.9
    # beams sorted ascending with exact distances
    df = np.asarray(d_f)
    assert np.all(np.diff(df[np.isfinite(df).all(axis=1)], axis=1) >= -1e-6)


def test_fused_beam_search_kernels_match_refs():
    """The interpret-mode kernel pipeline is bit-identical to the XLA-twin
    pipeline (same trace, different backends)."""
    rng = np.random.default_rng(4)
    vecs, links = _knn_graph(rng, N=300)
    queries = rng.standard_normal((8, vecs.shape[1])).astype(np.float32)
    nd, lf = _fns(vecs, links, queries)
    entry = jnp.zeros((8,), jnp.int32)
    d_r, i_r, rows_r = BM.beam_search_fused(
        entry, nd, lf, 24, max_iters=100, expand=4, ring_size=128,
        use_kernels=False, with_stats=True)
    d_k, i_k, rows_k = BM.beam_search_fused(
        entry, nd, lf, 24, max_iters=100, expand=4, ring_size=128,
        use_kernels=True, interpret=True, with_stats=True)
    np.testing.assert_array_equal(np.asarray(i_k), np.asarray(i_r))
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_r), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(rows_k), np.asarray(rows_r))


def test_fused_beam_converges_and_counts_rows():
    """Termination: with a generous iteration budget the loop stops when
    no unexpanded beam entry remains; rows counts novel scored rows."""
    rng = np.random.default_rng(5)
    vecs, links = _knn_graph(rng, N=200)
    queries = rng.standard_normal((4, vecs.shape[1])).astype(np.float32)
    nd, lf = _fns(vecs, links, queries)
    entry = jnp.zeros((4,), jnp.int32)
    _, ids, rows = BM.beam_search_fused(
        entry, nd, lf, 16, max_iters=500, expand=4, ring_size=128,
        use_kernels=False, with_stats=True)
    rows = np.asarray(rows)
    assert np.all(rows > 16)  # scored beyond the beam width
    assert np.all(rows <= 200 + 1)  # never more than the graph (novel only)
