"""KMeans component class.

Parity target: `KMeans` / `KMeansConfig` (reference: src/distance/k_means.rs:14-37)
including the `selected` dim-range restriction (k_means.rs:30,105-109) used
by PQ subspace training, `find_nearest` (k_means.rs:166-170) and
`find_n_nearest` (IVF probes, k_means.rs:174-191).

The compute runs through the batched device kernels in `ops/kmeans.py`; this
class is the host-side component with config + trained centroids.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import kmeans as KM
from ..utils.config import KMeansConfig


class KMeans:
    def __init__(self, config: KMeansConfig, centroids: np.ndarray):
        self.config = config
        self.centroids = np.asarray(centroids, dtype=np.float32)
        self._dev = None

    @classmethod
    def from_numpy(cls, vectors: np.ndarray, config: KMeansConfig, seed: int = 0) -> "KMeans":
        assert config.k > 0, "The number of clusters should be greater than 0."
        data = np.asarray(vectors, dtype=np.float32)
        if config.selected is not None:
            lo, hi = config.selected
            assert hi <= data.shape[1], "selected range out of bounds"
            data = data[:, lo:hi]
        centroids = KM.kmeans_fit(
            jax.random.PRNGKey(seed),
            jnp.asarray(np.ascontiguousarray(data)),
            jnp.int32(len(data)),
            config.k,
            config.max_iter,
            config.tol,
            config.dist,
        )
        return cls(config, np.asarray(jax.device_get(centroids)))

    def _select(self, v: np.ndarray) -> np.ndarray:
        if self.config.selected is not None:
            lo, hi = self.config.selected
            return v[..., lo:hi]
        return v

    def _device(self):
        if self._dev is None:
            self._dev = jnp.asarray(self.centroids)
        return self._dev

    def find_nearest(self, v) -> int:
        v = self._select(np.atleast_2d(np.asarray(v, np.float32)))
        ids = KM.find_nearest(jnp.asarray(v), self._device(), self.config.dist)
        return int(np.asarray(ids)[0])

    def find_nearest_batch(self, vs: np.ndarray) -> np.ndarray:
        vs = self._select(np.atleast_2d(np.asarray(vs, np.float32)))
        return np.asarray(KM.find_nearest(jnp.asarray(vs), self._device(), self.config.dist))

    def find_n_nearest(self, v, n_probes: int) -> list[int]:
        v = self._select(np.atleast_2d(np.asarray(v, np.float32)))
        _, ids = KM.find_n_nearest(jnp.asarray(v), self._device(), n_probes, self.config.dist)
        return [int(x) for x in np.asarray(ids)[0]]
