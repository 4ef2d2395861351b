"""Single-kernel traversal (ops/pallas_traverse.py): semantic parity with
the fused-beam XLA twins, interpret-mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp

from lab_1806_vec_db_tpu.ops import beam as BM
from lab_1806_vec_db_tpu.ops import pallas_gather as PG
from lab_1806_vec_db_tpu.ops import pallas_traverse as PT


def test_traverse_matches_fused_twins():
    N, dim, L, E, ef, B = 2000, 64, 32, 4, 32, 16
    rng = np.random.default_rng(0)
    base = rng.standard_normal((N, dim)).astype(np.float32)
    links = rng.integers(0, N, (N, L)).astype(np.int32)
    q = rng.standard_normal((B, dim)).astype(np.float32)
    entry = rng.integers(0, N, (B,)).astype(np.int32)

    base_rs = PG.prepare_rerank_base(jnp.asarray(base))
    links_j = jnp.asarray(links)
    links_q = PT.pack_links(links_j)

    d1, i1 = PT.traverse(jnp.asarray(q), base_rs, links_q,
                         jnp.asarray(entry), ef, L, E=E, R=256,
                         max_iters=20, bq=16, interpret=True)

    nd = lambda ids: PG.gather_dists_rs(jnp.asarray(q), base_rs, ids,
                                        "l2sqr", interpret=True)
    lf = lambda ids: links_j[ids]
    d2, i2 = BM.beam_search_fused(jnp.asarray(entry), nd, lf, ef, 20,
                                  expand=E, ring_size=256,
                                  use_kernels=False)
    i1n, i2n = np.asarray(i1), np.asarray(i2)
    overlap = np.mean([len(set(i1n[b].tolist()) & set(i2n[b].tolist())) / ef
                       for b in range(B)])
    # identical semantics up to float reduce-order ties in the distance
    # epilogue (the TPU run measures 1.0; interpret occasionally flips a
    # tie at the beam tail)
    assert overlap >= 0.97, overlap
    np.testing.assert_allclose(np.asarray(d1)[:, :8], np.asarray(d2)[:, :8],
                               rtol=1e-5, atol=1e-5)


def test_pack_links_layout():
    links = jnp.asarray(np.arange(12 * 5).reshape(12, 5), jnp.int32)
    lq = PT.pack_links(links)
    assert lq.shape == (16, 128)
    a = np.asarray(lq)
    assert (a[:, 0] == np.arange(16)).all()  # self id in lane 0
    np.testing.assert_array_equal(a[:12, 1:6], np.asarray(links))
    assert (a[:12, 6:] == -1).all() and (a[12:, 1:] == -1).all()
