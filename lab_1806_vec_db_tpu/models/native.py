"""Loader + wrappers for the native (C++) query engine.

The native module is optional: when `_vecdb_native` is present (built via
`python native/build.py`), single-query searches route through the serial
C++ engine (microsecond latency, no device dispatch); otherwise everything
falls back to the batched device kernels.  Both paths traverse the *same*
dense link arrays — there is one index format.
"""

from __future__ import annotations

import numpy as np

try:
    from .. import _vecdb_native as _native
except ImportError:  # pragma: no cover - environment without the built ext
    _native = None

DIST_CODE = {"l2sqr": 0, "cosine": 1}


def available() -> bool:
    return _native is not None


def hnsw_knn_single(index, query: np.ndarray, k: int, ef: int):
    """Serial native HNSW search. Returns (ids, dists) lists or None if the
    native module is unavailable."""
    if _native is None or index.entry_point is None:
        return None
    query = np.ascontiguousarray(query, dtype=np.float32)
    vecs = index.store._host()  # materializes device-born stores
    if vecs.dtype != np.float32:
        return None
    n = len(index.store)
    upper = []
    for ul in index.upper[: (index.enter_level or 0)]:
        upper.append((ul.pos, ul.links[: max(ul.n, 1)]))
    ids, dists = _native.hnsw_knn(
        vecs,
        index.links0,
        upper,
        int(index.entry_point),
        query,
        int(k),
        int(max(ef, k)),
        DIST_CODE[index.dist],
        n,
    )
    return ids, dists


def flat_knn_single(store, query: np.ndarray, k: int):
    """Serial native exact scan. Returns (ids, dists) lists or None."""
    if _native is None or store.tier == "lean":
        return None
    if store._host().dtype != np.float32:
        return None
    query = np.ascontiguousarray(query, dtype=np.float32)
    ids, dists = _native.flat_knn(
        store._host(), query, len(store), int(k), DIST_CODE[store.dist]
    )
    return ids, dists
