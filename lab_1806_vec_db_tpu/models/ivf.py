"""IVF (inverted file) index.

Parity target: `IVFIndex` (reference: src/index_algorithm/ivf_index.rs).
TPU design: the coarse quantizer is `ops/kmeans`; posting lists are a padded
`(k, Lmax)` int32 matrix (-1 padded) instead of `Vec<Vec<usize>>`; search is
a centroid GEMM top-n_probes followed by a gather of the probed rows and one
masked batched GEMM scan + top-k (`ops/topk.knn_gathered`) — the
"segmented matmul" formulation of ivf_index.rs:143-154.

As in the reference, `ef` means the number of probed lists
(ivf_index.rs:137-142) and the default is 4 probes (ivf_index.rs:97).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .store import VecStore
from ..ops import kmeans as KM
from ..ops import topk as T
from ..utils.config import IVFConfig
from ..utils import serde
from ..utils.candidates import CandidatePair, pairs_from_arrays

DEFAULT_N_PROBES = 4


class IVFIndex:
    algorithm = "IVF"

    def __init__(
        self,
        store: VecStore,
        config: IVFConfig,
        centroids: np.ndarray,
        posting: np.ndarray,  # (k, Lmax) int32, -1 padded
        posting_len: np.ndarray,  # (k,)
    ):
        self.store = store
        self.config = config
        self.centroids = np.asarray(centroids, dtype=np.float32)
        self.posting = np.asarray(posting, dtype=np.int32)
        self.posting_len = np.asarray(posting_len, dtype=np.int32)
        self.default_n_probes = DEFAULT_N_PROBES
        self._dev_centroids = None
        self._dev_posting = None

    @property
    def dim(self) -> int:
        return self.store.dim

    @property
    def dist(self) -> str:
        return self.store.dist

    def __len__(self) -> int:
        return len(self.store)

    # ---- build (ivf_index.rs:64-107) ----
    @classmethod
    def from_numpy(
        cls, vectors: np.ndarray, dist: str, config: IVFConfig, seed: int = 0
    ) -> "IVFIndex":
        import jax

        n = len(vectors)
        rng = np.random.default_rng(seed)
        if config.k_means_size is not None and config.k_means_size < n:
            sel = rng.choice(n, size=config.k_means_size, replace=False)
            train = vectors[sel]
        else:
            train = vectors
        train_dev = jnp.asarray(np.ascontiguousarray(train, dtype=np.float32))
        centroids = KM.kmeans_fit(
            jax.random.PRNGKey(seed),
            train_dev,
            jnp.int32(len(train)),
            config.k,
            config.k_means_max_iter,
            config.k_means_tol,
            dist,
        )
        vec_dev = jnp.asarray(np.ascontiguousarray(vectors, dtype=np.float32))
        assign = np.asarray(jax.device_get(KM.find_nearest(vec_dev, centroids, dist)))
        centroids = np.asarray(jax.device_get(centroids))

        counts = np.bincount(assign, minlength=config.k)
        l_max = max(int(counts.max()), 1) if n else 1
        posting = np.full((config.k, l_max), -1, dtype=np.int32)
        cursor = np.zeros(config.k, dtype=np.int64)
        for i, c in enumerate(assign):
            posting[c, cursor[c]] = i
            cursor[c] += 1

        store = VecStore.from_numpy(vectors, dist)
        return cls(store, config, centroids, posting, counts.astype(np.int32))

    # ---- search (ivf_index.rs:143-154) ----
    def _device(self):
        if self._dev_centroids is None:
            self._dev_centroids = jnp.asarray(self.centroids)
            self._dev_posting = jnp.asarray(self.posting)
        return self._dev_centroids, self._dev_posting

    def knn_batch(self, queries: np.ndarray, k: int, n_probes: int | None = None):
        n_probes = n_probes or self.default_n_probes
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        q_dev = jnp.asarray(queries)
        centroids, posting = self._device()
        _, probe_ids = KM.find_n_nearest(q_dev, centroids, n_probes, self.dist)
        cand = posting[probe_ids]  # (B, n_probes, Lmax)
        cand = cand.reshape(cand.shape[0], -1)
        import jax

        if jax.default_backend() != "cpu":
            # probe unions can span most of the set — stream them through
            # the DMA-gather kernel instead of one giant XLA gather
            from ..ops import pallas_gather as PG

            d, i = PG.rerank_topk_blocked(
                q_dev, self.store.device_rerank(), cand, k, self.dist
            )
        else:
            vecs, cache = self.store.device()
            d, i = T.knn_gathered(q_dev, vecs, cand, k, self.dist, base_cache=cache)
        return np.asarray(d), np.asarray(i)

    def knn(self, query, k: int) -> list[CandidatePair]:
        d, i = self.knn_batch(query, k, self.default_n_probes)
        return pairs_from_arrays(d[0], i[0], k)

    def knn_with_ef(self, query, k: int, ef: int) -> list[CandidatePair]:
        """`ef` is the number of probes (ivf_index.rs:137-142)."""
        d, i = self.knn_batch(query, k, ef)
        return pairs_from_arrays(d[0], i[0], k)

    # ---- serde ----
    def state(self, include_vectors: bool = True) -> tuple[dict, dict]:
        arrays = self.store.state_arrays(include_vectors)
        arrays.update(
            ivf_centroids=self.centroids,
            ivf_posting=self.posting,
            ivf_posting_len=self.posting_len,
        )
        meta = {
            "algorithm": "IVF",
            "dim": self.dim,
            "dist": self.dist,
            "n": len(self.store),
            "ivf": {
                "k": self.config.k,
                "k_means_size": self.config.k_means_size,
                "k_means_max_iter": self.config.k_means_max_iter,
                "k_means_tol": self.config.k_means_tol,
            },
        }
        return arrays, meta

    @classmethod
    def from_state(cls, arrays: dict, meta: dict, external_vectors=None) -> "IVFIndex":
        vecs = arrays.get("vectors", external_vectors)
        if vecs is None:
            raise ValueError("IVFIndex state has no vectors and none were provided")
        store = VecStore.from_numpy(np.asarray(vecs), meta["dist"])
        cfg = IVFConfig.from_dict(meta["ivf"])
        return cls(
            store, cfg, arrays["ivf_centroids"], arrays["ivf_posting"], arrays["ivf_posting_len"]
        )

    def save(self, path, include_vectors: bool = True) -> None:
        arrays, meta = self.state(include_vectors)
        serde.save_arrays(path, arrays, meta)

    @classmethod
    def load(cls, path, external_vectors=None) -> "IVFIndex":
        arrays, meta = serde.load_arrays(path)
        return cls.from_state(arrays, meta, external_vectors)
