"""Padded device-resident vector storage.

The TPU re-design of `VecSet<T>` (reference: src/vec_set.rs:15-203):
- canonical storage is a host numpy array with geometric capacity growth
  (push/batch_push/swap_remove, mirroring vec_set.rs:116-137)
- the device view is a fixed-capacity `(cap, dim)` float32 array plus the
  per-row distance cache (`dist_cache`, reference src/distance/mod.rs:31-36),
  padded rows zeroed, refreshed *incrementally*: small writes are applied as
  device scatters instead of re-uploading the whole set, so XLA keeps static
  shapes while N changes on the host side.

Capacity changes (growth) trigger one full re-upload and a recompile of the
downstream jitted kernels — amortized by doubling.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import distance as D

_MIN_CAP = 8


from functools import partial as _partial


@_partial(
    jax.jit,
    static_argnames=("dist", "flags", "sr"),
    donate_argnums=(0, 1, 2, 3, 4),
)
def _sync_rows_jit(dev, cache, bf16, slab, int8pair, rows, vals, dist, flags, sr):
    """Scatter `vals` into row `rows` of every live device mirror in ONE
    dispatch, with donated (in-place) buffers."""
    has_bf16, has_rerank, has_int8 = flags
    dev = dev.at[rows].set(vals)
    cache = cache.at[rows].set(D.dist_cache(vals, dist))
    if has_bf16:
        bf16 = bf16.at[rows].set(vals.astype(jnp.bfloat16))
    if has_rerank:
        dim_pad = sr * 128
        v = vals
        if dim_pad != v.shape[1]:
            v = jnp.pad(v, ((0, 0), (0, dim_pad - v.shape[1])))
        slab_rows = (rows[:, None] * sr + jnp.arange(sr, dtype=rows.dtype)[None, :]).reshape(-1)
        slab = slab.at[slab_rows].set(v.reshape(-1, 128))
    if has_int8:
        from ..ops import topk as T

        q8, sc = int8pair
        v8 = vals
        if q8.shape[1] != v8.shape[1]:
            v8 = jnp.pad(v8, ((0, 0), (0, q8.shape[1] - v8.shape[1])))
        q8v, scv = T.quantize_rows_int8(v8)
        int8pair = (q8.at[rows].set(q8v), sc.at[rows].set(scv))
    return dev, cache, bf16, slab, int8pair


def _round_cap(n: int) -> int:
    cap = _MIN_CAP
    while cap < n:
        cap *= 2
    return cap


class VecStore:
    def __init__(self, dim: int, dist: str, capacity: int = 0, dtype=np.float32):
        D.check_dist(dist)
        self.dim = int(dim)
        self.dist = dist
        self.dtype = np.dtype(dtype)
        self._n = 0
        self._cap = _round_cap(max(capacity, _MIN_CAP))
        self._data = np.zeros((self._cap, dim), dtype=self.dtype)
        # device state
        self._dev: jax.Array | None = None
        self._dev_cache: jax.Array | None = None
        self._dev_bf16: jax.Array | None = None
        self._dev_rerank: jax.Array | None = None
        self._dev_int8: tuple[jax.Array, jax.Array] | None = None
        self._dirty_rows: set[int] = set()
        self._dev_full_dirty = True

    # ---- host-side mutation (vec_set.rs push/pop/swap_remove parity) ----
    def __len__(self) -> int:
        return self._n

    @property
    def n(self) -> int:
        return self._n

    @property
    def capacity(self) -> int:
        return self._cap

    def numpy(self) -> np.ndarray:
        """Valid rows as a host array view (n, dim)."""
        return self._data[: self._n]

    def __getitem__(self, i: int) -> np.ndarray:
        if not (0 <= i < self._n):
            raise IndexError(i)
        return self._data[i]

    def _grow_to(self, n: int) -> None:
        if n <= self._cap:
            return
        new_cap = _round_cap(n)
        new = np.zeros((new_cap, self.dim), dtype=self.dtype)
        new[: self._n] = self._data[: self._n]
        self._data = new
        self._cap = new_cap
        self._dev = None
        self._dev_cache = None
        self._dev_full_dirty = True
        self._dirty_rows.clear()

    def push(self, vec) -> int:
        vec = np.asarray(vec, dtype=self.dtype).reshape(-1)
        if vec.shape[0] != self.dim:
            raise ValueError(f"Dimension mismatch: {vec.shape[0]} != {self.dim}")
        self._grow_to(self._n + 1)
        idx = self._n
        self._data[idx] = vec
        self._n += 1
        self._mark_dirty(idx)
        return idx

    def batch_push(self, vecs) -> list[int]:
        vecs = np.asarray(vecs, dtype=self.dtype)
        if vecs.ndim != 2 or vecs.shape[1] != self.dim:
            raise ValueError(f"Dimension mismatch: {vecs.shape} vs dim={self.dim}")
        start = self._n
        self._grow_to(self._n + len(vecs))
        self._data[start : start + len(vecs)] = vecs
        self._n += len(vecs)
        for i in range(start, self._n):
            self._mark_dirty(i)
        return list(range(start, self._n))

    def swap_remove(self, i: int) -> None:
        """Remove row i by moving the last row into it (vec_set.rs:131-137)."""
        if not (0 <= i < self._n):
            raise IndexError(i)
        last = self._n - 1
        if i != last:
            self._data[i] = self._data[last]
            self._mark_dirty(i)
        self._data[last] = 0
        self._mark_dirty(last)
        self._n = last

    def _mark_dirty(self, row: int) -> None:
        if self._dev_full_dirty:
            return
        self._dirty_rows.add(row)
        # Full rebuild only when a big fraction changed: a rebuild re-uploads
        # the whole set (tunnel-bound) and invalidates every derived copy
        # (bf16/int8/rerank slab), so incremental row-scatter wins until the
        # dirty set approaches half the data.
        if len(self._dirty_rows) > max(16384, self._cap // 2):
            self._dev_full_dirty = True
            self._dirty_rows.clear()

    # ---- device view ----
    def device(self) -> tuple[jax.Array, jax.Array]:
        """Return (vectors (cap, dim) f32, dist_cache (cap,) f32), synced."""
        if self._dev is None or self._dev_full_dirty:
            host = np.zeros((self._cap, self.dim), dtype=np.float32)
            host[: self._n] = self._data[: self._n].astype(np.float32)
            self._dev = jnp.asarray(host)
            self._dev_cache = D.dist_cache(self._dev, self.dist)
            self._dev_bf16 = None
            self._dev_rerank = None
            self._dev_int8 = None
            self._dev_full_dirty = False
            self._dirty_rows.clear()
            # barrier: let upload staging free before derived copies build —
            # async overlap of the transients can transiently exceed HBM at
            # N=1e6 x 960 (f32 mirror + slab + int8 all in flight)
            jax.block_until_ready(self._dev_cache)
        elif self._dirty_rows:
            rows = np.fromiter(self._dirty_rows, dtype=np.int32)
            vals = self._data[rows].astype(np.float32)
            # one fused + donated dispatch: every live device mirror updates
            # in place in a single round trip (eager .at[].set chains paid
            # ~23 ms tunnel latency each and copied the full arrays)
            def dummy():
                # distinct buffer per donated slot (same buffer cannot be
                # donated twice in one call)
                return jnp.zeros((0,), jnp.float32)

            flags = (
                self._dev_bf16 is not None,
                self._dev_rerank is not None,
                self._dev_int8 is not None,
            )
            from ..ops import pallas_gather as PG

            sr = PG.rerank_dim_pad(self.dim) // 128
            dev, cache, bf16, slab, int8pair = _sync_rows_jit(
                self._dev,
                self._dev_cache,
                self._dev_bf16 if flags[0] else dummy(),
                self._dev_rerank if flags[1] else dummy(),
                self._dev_int8 if flags[2] else (dummy(), dummy()),
                jnp.asarray(rows),
                jnp.asarray(vals),
                self.dist,
                flags,
                sr,
            )
            self._dev, self._dev_cache = dev, cache
            if flags[0]:
                self._dev_bf16 = bf16
            if flags[1]:
                self._dev_rerank = slab
            if flags[2]:
                self._dev_int8 = int8pair
            self._dirty_rows.clear()
        return self._dev, self._dev_cache

    def device_traversal(self) -> tuple[jax.Array, jax.Array]:
        """Return (vectors (cap, dim) bf16, dist_cache (cap,) f32), synced.

        The bf16 copy exists for graph traversal: beam/greedy search is HBM
        gather-bound, and half-width rows double the effective bandwidth.
        Distances computed from it are approximate (~1e-2 relative); callers
        must rerank final results against the exact f32 view (`device()`).
        """
        vecs, cache = self.device()
        if self._dev_bf16 is None:
            self._dev_bf16 = vecs.astype(jnp.bfloat16)
            jax.block_until_ready(self._dev_bf16)
        return self._dev_bf16, cache

    def device_rerank(self) -> jax.Array:
        """Return the (cap*SR, 128) f32 row-slab copy for the Pallas DMA
        rerank kernel (ops/pallas_gather.py), synced and cached."""
        from ..ops import pallas_gather as PG

        self.device()  # syncs dirty rows into _dev_rerank too
        if self._dev_rerank is None:
            # build the slab layout on the HOST and upload it directly: a
            # device-side pad+reshape of the f32 mirror materializes ~2x the
            # mirror in transients, which pushes peak HBM past the limit at
            # N=1e6 x dim=960 when every mirror is live
            dim_pad = PG.rerank_dim_pad(self.dim)
            host = np.zeros((self._cap, dim_pad), dtype=np.float32)
            host[: self._n, : self.dim] = self._data[: self._n].astype(np.float32)
            self._dev_rerank = jnp.asarray(host.reshape(self._cap * (dim_pad // 128), 128))
            jax.block_until_ready(self._dev_rerank)
        return self._dev_rerank

    def device_int8(self) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Return ((cap, dim) int8 per-row-quantized vectors, (cap,) f32
        scales, (cap,) f32 exact dist_cache), synced and cached.

        The int8 copy feeds stage-1 candidate selection on the int8 MXU
        (2x bf16 rate, half the HBM traffic); results are always reranked
        against the exact f32 view."""
        from ..ops import topk as T

        vecs, cache = self.device()
        if self._dev_int8 is None:
            # full-lane columns: the int8 MXU runs ~1.45x faster on
            # 128-multiple dims (e.g. 960 -> 1024 measured 137 -> 208 TOPS);
            # zero columns are dot-transparent and leave per-row scales
            # unchanged.  Quantize on the HOST: a device-side pad+quantize
            # materializes ~3x the f32 mirror in transients and OOMs at
            # N=1e6 x 960 alongside the other mirrors.
            dim_pad = ((self.dim + 127) // 128) * 128
            x = self._data[: self._n].astype(np.float32)
            amax = np.abs(x).max(axis=1) if self._n else np.zeros((0,), np.float32)
            scale = np.ones((self._cap,), np.float32)
            scale[: self._n] = np.where(amax > 0, amax / 127.0, 1.0)
            q8 = np.zeros((self._cap, dim_pad), np.int8)
            if self._n:
                np.clip(
                    np.round(x / scale[: self._n, None]), -127, 127,
                    out=x,
                )
                q8[: self._n, : self.dim] = x.astype(np.int8)
            self._dev_int8 = (jnp.asarray(q8), jnp.asarray(scale))
            jax.block_until_ready(self._dev_int8)
        return self._dev_int8[0], self._dev_int8[1], cache

    # ---- conversions (vec_set.rs:142-163 parity) ----
    def to_type(self, dtype) -> "VecStore":
        """dtype conversion via f32 mediation (vec_set.rs:142-149)."""
        out = VecStore(self.dim, self.dist, capacity=self._n, dtype=dtype)
        if self._n:
            out.batch_push(self._data[: self._n].astype(np.float32).astype(dtype))
        return out

    def random_sample(self, size: int, rng: np.random.Generator) -> np.ndarray:
        """Sample `size` rows without replacement (vec_set.rs:154-163)."""
        size = min(size, self._n)
        sel = rng.choice(self._n, size=size, replace=False)
        return self._data[np.sort(sel)].copy()

    # ---- serde ----
    def state_arrays(self, include_vectors: bool = True) -> dict[str, np.ndarray]:
        out = {}
        if include_vectors:
            out["vectors"] = self._data[: self._n].copy()
        return out

    @classmethod
    def from_numpy(cls, vectors: np.ndarray, dist: str, dtype=None) -> "VecStore":
        vectors = np.asarray(vectors)
        dtype = dtype or vectors.dtype
        store = cls(vectors.shape[1], dist, capacity=len(vectors), dtype=dtype)
        if len(vectors):
            store.batch_push(vectors)
        return store
