"""Batched k-means on the MXU.

TPU reformulation of the reference's rayon-parallel k-means
(src/distance/k_means.rs):
- k-means++ init with distance-weighted sampling (k_means.rs:61-87) using
  `jax.random.categorical` over masked log-weights; all-zero weights fall
  back to uniform like the reference (k_means.rs:80-82).
- Lloyd iterations (k_means.rs:114-160): assignment is a (N, k) distance
  GEMM + argmin; the centroid update is a scatter-add (segment sum) in f32
  accumulators; empty clusters keep their previous centroid
  (k_means.rs:131-137); tol-based early stop on max centroid movement
  (k_means.rs:150-159).
- The reference's `selected` dim-range (k_means.rs:30,105-109) is handled by
  the caller slicing the dim axis before the call (PQ subspaces vmap this
  function over groups).

All functions are jittable and vmappable; everything is fixed-shape with
validity masks so XLA tiles the GEMMs onto the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import distance as D


def _weighted_choice(key: jax.Array, weights: jax.Array, valid: jax.Array) -> jax.Array:
    """Sample an index proportionally to `weights` over `valid` slots.

    Falls back to uniform over valid slots when all weights are zero or
    non-finite (reference: k_means.rs:80-82).
    """
    w = jnp.where(valid, weights, 0.0)
    w = jnp.where(jnp.isfinite(w), w, 0.0)
    total = jnp.sum(w)
    logits = jnp.where(
        (total > 0.0) & valid,
        jnp.log(jnp.maximum(w, 1e-38)),
        jnp.where(valid, 0.0, -jnp.inf),
    )
    # When total > 0, invalid/zero-weight slots must be excluded entirely.
    logits = jnp.where((total > 0.0) & (w <= 0.0), -jnp.inf, logits)
    return jax.random.categorical(key, logits)


@partial(jax.jit, static_argnames=("k", "max_iter", "dist"))
def kmeans_fit(
    key: jax.Array,
    data: jax.Array,
    n_valid: jax.Array,
    k: int,
    max_iter: int,
    tol: float,
    dist: str,
) -> jax.Array:
    """Fit k centroids; returns (k, dim) float32.

    data: (N_pad, dim) with rows >= n_valid zero-padded.
    """
    n_pad, dim = data.shape
    data = data.astype(jnp.float32)
    valid = jnp.arange(n_pad) < n_valid

    # ---- k-means++ init (k_means.rs:61-87) ----
    key, k0 = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, jnp.maximum(n_valid, 1))
    centroids0 = jnp.zeros((k, dim), jnp.float32).at[0].set(data[first])

    def init_body(i, carry):
        centroids, weight, key = carry
        # update weights with distance to the most recently added centroid
        last = centroids[i - 1]
        d = D.pointwise(data, last[None, :], dist)
        weight = jnp.minimum(weight, d)
        key, sub = jax.random.split(key)
        c = _weighted_choice(sub, weight, valid)
        centroids = centroids.at[i].set(data[c])
        return centroids, weight, key

    weight0 = jnp.full((n_pad,), jnp.inf, jnp.float32)
    centroids, _, _ = jax.lax.fori_loop(1, k, init_body, (centroids0, weight0, key))

    # ---- Lloyd iterations (k_means.rs:114-160) ----
    def assign(centroids):
        d = D.pairwise(data, centroids, dist)  # (N_pad, k)
        return jnp.argmin(d, axis=1)

    def update(centroids):
        a = assign(centroids)
        onehot_w = jnp.where(valid, 1.0, 0.0)
        counts = jnp.zeros((k,), jnp.float32).at[a].add(onehot_w)
        sums = (
            jnp.zeros((k, dim), jnp.float32)
            .at[a]
            .add(jnp.where(valid[:, None], data, 0.0))
        )
        new_c = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centroids)
        return new_c

    def cond(carry):
        _, i, diff = carry
        return (i < max_iter) & (diff >= tol)

    def body(carry):
        centroids, i, _ = carry
        new_c = update(centroids)
        diff = jnp.max(jnp.sum((new_c - centroids) ** 2, axis=1))
        return new_c, i + 1, diff

    centroids, _, _ = jax.lax.while_loop(
        cond, body, (centroids, jnp.int32(0), jnp.float32(jnp.inf))
    )
    return centroids


@partial(jax.jit, static_argnames=("dist",))
def find_nearest(vectors: jax.Array, centroids: jax.Array, dist: str) -> jax.Array:
    """Nearest-centroid ids (argmin over a distance GEMM).

    Mirrors `find_nearest_base` including the lowest-index tie break
    (reference: k_means.rs:40-57).  vectors: (N, dim) -> (N,) int32.
    """
    d = D.pairwise(vectors, centroids, dist)
    return jnp.argmin(d, axis=1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_probes", "dist"))
def find_n_nearest(vectors: jax.Array, centroids: jax.Array, n_probes: int, dist: str):
    """Top-n_probes nearest centroids per vector, ascending by distance.

    Mirrors `KMeans::find_n_nearest` (reference: k_means.rs:174-191).
    Returns ((N, n_probes) dists, (N, n_probes) int32 ids).
    """
    from . import topk as T

    d = D.pairwise(vectors, centroids, dist)
    ids = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    return T.topk_smallest(d, ids, min(n_probes, centroids.shape[0]))
