"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lab_1806_vec_db_tpu.parallel import sharded as S
from lab_1806_vec_db_tpu.models import FlatIndex


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_flat_matches_single_device(gist_1000):
    base = gist_1000[:333, :64].copy()  # deliberately not divisible by 8
    queries = gist_1000[500:510, :64].copy()
    mesh = S.make_mesh()
    sharded = S.ShardedFlatIndex(mesh, base, "l2sqr")
    flat = FlatIndex.from_numpy(base, "l2sqr")
    d1, i1 = sharded.knn_batch(queries, 7)
    d2, i2 = flat.knn_batch(queries, 7)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-4)


def test_sharded_kmeans_step(gist_1000):
    base = gist_1000[:256, :16].copy()
    mesh = S.make_mesh()
    idx = S.ShardedFlatIndex(mesh, base, "l2sqr")
    centroids = jnp.asarray(base[:4])
    new_c = np.asarray(
        S.kmeans_step_sharded(idx.base, idx.n_local, centroids, "l2sqr", mesh)
    )
    # oracle: single-process Lloyd step
    d = ((base[:, None, :] - base[:4][None, :, :]) ** 2).sum(-1)
    a = d.argmin(1)
    expect = np.stack([base[a == c].mean(0) if (a == c).any() else base[c] for c in range(4)])
    np.testing.assert_allclose(new_c, expect, rtol=1e-4, atol=1e-4)


def test_graft_entry_compiles():
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    d, i = out
    assert d.shape == (4, 16)

    ge.dryrun_multichip(8)
