"""Runtime Flat|HNSW dispatch.

Parity target: `DynamicIndex` (reference: src/database/dynamic_index.rs).
IVF is intentionally *not* part of the database layer, matching the
reference where IVF exists only in the bench harness
(dynamic_index.rs:11-14 vs examples/bench.rs:141-145).
"""

from __future__ import annotations

import numpy as np

from ..models import FlatIndex, FlatIndexU8, HNSWIndex, PQTable
from ..models.base import IndexBuilder, IndexKNN, IndexKNNWithEf, IndexPQ
from ..utils.config import HNSWConfig


class DynamicIndex:
    def __init__(self, dim: int, dist: str, data_type: str = "float32"):
        # runtime-dtype dispatch, the DB-layer face of the reference's
        # DynamicVecSet (src/vec_set.rs:237-263): uint8 tables hold the
        # exact-int8-MXU flat index and never cast the set to f32
        if data_type == "uint8":
            self.inner: FlatIndex | FlatIndexU8 | HNSWIndex = FlatIndexU8(dim, dist)
        elif data_type == "float32":
            self.inner = FlatIndex(dim, dist)
        else:
            raise ValueError(f"Unsupported data_type: {data_type!r}")
        self.data_type = data_type

    @property
    def dim(self) -> int:
        return self.inner.dim

    @property
    def dist(self) -> str:
        return self.inner.dist

    def __len__(self) -> int:
        return len(self.inner)

    @property
    def is_hnsw(self) -> bool:
        return isinstance(self.inner, HNSWIndex)

    # ---- mutation ----
    def add(self, vec) -> int:
        if not isinstance(self.inner, IndexBuilder):
            raise TypeError(f"{type(self.inner).__name__} is not incrementally buildable")
        return self.inner.add(vec)

    def batch_add(self, vecs) -> list[int]:
        if not isinstance(self.inner, IndexBuilder):
            raise TypeError(f"{type(self.inner).__name__} is not incrementally buildable")
        return self.inner.batch_add(vecs)

    # ---- index lifecycle ----
    def build_hnsw(self, ef_construction: int | None, seed: int | None = None) -> None:
        """Upgrade Flat -> HNSW bulk build; no-op if already HNSW
        (metadata_vec_table.rs:84-98)."""
        if self.is_hnsw:
            return
        if self.data_type == "uint8":
            raise RuntimeError("HNSW index requires a float32 table")
        flat: FlatIndex = self.inner
        cfg = HNSWConfig(max_elements=len(flat))
        if ef_construction is not None:
            cfg.ef_construction = ef_construction
        vectors = flat.store.numpy().astype(np.float32, copy=True)
        if len(vectors):
            self.inner = HNSWIndex.build(vectors, flat.dist, cfg, seed=seed)
        else:
            self.inner = HNSWIndex(flat.dim, flat.dist, cfg, seed)

    def clear_hnsw(self) -> None:
        """Downgrade HNSW -> Flat keeping the vec set
        (metadata_vec_table.rs:100-106)."""
        if not self.is_hnsw:
            return
        hnsw: HNSWIndex = self.inner
        self.inner = FlatIndex.from_store(hnsw.store)

    # ---- search dispatch (dynamic_index.rs:61-93) ----
    # Dispatch is by capability protocol (models/base.py), the structural
    # analog of the reference's trait-bound dispatch
    # (src/index_algorithm/mod.rs:35-154): an index that lacks a capability
    # degrades to the next one down instead of raising AttributeError.
    def knn(self, query, k: int):
        assert isinstance(self.inner, IndexKNN)
        return self.inner.knn(query, k)

    def knn_with_ef(self, query, k: int, ef: int):
        if isinstance(self.inner, IndexKNNWithEf) and self.is_hnsw:
            return self.inner.knn_with_ef(query, k, ef)
        # Flat ignores ef (dynamic_index.rs:75-80)
        return self.inner.knn(query, k)

    def knn_pq(self, query, k: int, ef: int, pq: PQTable):
        if not isinstance(self.inner, IndexPQ):
            raise TypeError(f"{type(self.inner).__name__} has no PQ-accelerated search")
        return self.inner.knn_pq(query, k, ef, pq)

    # ---- serde ----
    def state(self) -> tuple[dict, dict]:
        return self.inner.state(include_vectors=True)

    @classmethod
    def from_state(cls, arrays: dict, meta: dict) -> "DynamicIndex":
        self = cls.__new__(cls)
        if meta["algorithm"] == "HNSW":
            self.inner = HNSWIndex.from_state(arrays, meta)
            self.data_type = "float32"
        elif meta["algorithm"] == "FlatU8":
            self.inner = FlatIndexU8.from_state(arrays, meta)
            self.data_type = "uint8"
        else:
            self.inner = FlatIndex.from_state(arrays, meta)
            self.data_type = "float32"
        return self
