"""Native (C++) query engine tests: must agree with the device kernels."""

import numpy as np
import pytest

from lab_1806_vec_db_tpu.models import FlatIndex, HNSWIndex, native
from lab_1806_vec_db_tpu.utils.config import HNSWConfig

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native extension not built"
)


def test_native_flat_matches_device(gist_1000):
    vecs = gist_1000[:300, :32].copy()
    flat = FlatIndex.from_numpy(vecs, "l2sqr")
    q = gist_1000[400, :32]
    ids, dists = native.flat_knn_single(flat.store, q, 5)
    d_dev, i_dev = flat.knn_batch(q, 5)
    assert ids == list(i_dev[0])
    np.testing.assert_allclose(dists, d_dev[0], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dist", ["l2sqr", "cosine"])
def test_native_hnsw_oracle(dist, gist_1000):
    vecs = gist_1000[:500, :12].copy()
    index = HNSWIndex.build(vecs, dist, HNSWConfig(), seed=3)
    flat = FlatIndex.from_numpy(vecs, dist)
    for qi in (5, 99, 250):
        res = native.hnsw_knn_single(index, vecs[qi], 5, 80)
        assert res is not None
        ids, dists = res
        flat_ids = [p.index for p in flat.knn(vecs[qi], 5)]
        assert ids == flat_ids
        assert dists == sorted(dists)
