"""Pallas ADC kernel vs the XLA reference implementation (interpret mode on
CPU; the same kernel compiles for real on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lab_1806_vec_db_tpu.models import PQTable
from lab_1806_vec_db_tpu.ops import pq as P
from lab_1806_vec_db_tpu.ops import pallas_adc as PA
from lab_1806_vec_db_tpu.utils.config import PQConfig


@pytest.mark.parametrize("dist", ["l2sqr", "cosine"])
def test_pallas_adc_matches_xla(dist, gist_1000):
    vecs = gist_1000[:200, :24].copy()
    queries = gist_1000[200:210, :24].copy()
    cfg = PQConfig(n_bits=4, m=8, dist=dist, k_means_size=100)
    pq = PQTable.train(vecs, cfg, seed=0)

    q_dev = jnp.asarray(queries)
    lookup, q_norms = pq.create_lookup(q_dev)
    codes, _, cb_sq = pq.device()
    n = jnp.int32(len(vecs))

    d_ref, i_ref = P.adc_scan(lookup, codes, n, cb_sq, q_norms, 10, dist)
    d_pal, i_pal = PA.adc_scan_pallas(
        lookup, codes, n, cb_sq, q_norms, 10, dist, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(d_pal), np.asarray(d_ref), rtol=1e-4, atol=1e-5
    )
    # ids may differ only on exact distance ties; compare via distances
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))
