"""Flat (brute-force exact) index.

Parity target: `FlatIndex` (reference: src/index_algorithm/flat_index.rs).
The reference's per-vector scalar scan loop (flat_index.rs:48-57) becomes a
blocked (B, dim) x (dim, N) MXU GEMM with a running top-k
(`ops/topk.knn_scan`).  `knn_pq` is a blocked ADC scan followed by an exact
rerank of the top max(ef, k) (flat_index.rs:84-104).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from .store import VecStore
from .pq_table import PQTable
from ..ops import topk as T
from ..utils import serde
from ..utils.candidates import CandidatePair, pairs_from_arrays

# Scan policy (env VECDB_TPU_SCAN):
#   "int8"  (default) — per-row-quantized int8 MXU candidate pass (2x bf16
#            rate, half the HBM traffic) + exact f32 rerank.
#   "pca"   — PCA-projected int8 candidate pass at VECDB_TPU_PCA_DIM dims
#            (default 256: ~4x less stage-1 compute/traffic at dim 960) +
#            deeper exact f32 rerank (ops/project.py).
#   "bf16" / "2stage" — bf16 MXU candidate pass + exact f32 rerank.
#   "exact" — single-pass full-f32 scan everywhere (ground-truth mode).
_SCAN_MODE = os.environ.get("VECDB_TPU_SCAN", "int8")
# Below this N the planner uses the single-pass exact f32 scan instead of
# the two-stage int8 plan.  Two binding constraints at small N: (a) the
# packed chunk-min kernel keeps at most ONE stage-1 survivor per 128
# consecutive mirror rows, so the candidate pool caps at n/128 regardless
# of ef (measured at 10k: recall plateaus at 0.9653 from ef=240 on, 79
# survivors max — data/t_bench_10000_tpu.toml round-3 regen), and (b) the
# exact f32 scan at n <= 64k costs ~1-2 ms/kilobatch on the MXU anyway —
# at or below the two-stage path's own dispatch floor.  64k rows ~ 8k
# survivor cap keeps the cap comfortably above any sane ef.
_EXACT_BELOW = 65536
_RERANK_MULT = int(os.environ.get("VECDB_TPU_RERANK_MULT", "4"))
# stage-1 candidates per requested neighbor (floor 32): measured at N=1e6
# dim=960 clustered, r=32..80 all hold recall@10=0.9993 — the packed scan's
# candidate ordering is good enough that extra rerank depth only adds DMA
# traffic.  Beyond 1M rows the depth scales with log2(N/1M): twice the rows
# means more near-boundary competitors for the same r, and the DMA rerank
# is ~1 ms per 40 rows/query at B=1000 — cheap insurance.
_PCA_DIM = int(os.environ.get("VECDB_TPU_PCA_DIM", "256"))
_RERANK_MULT_PCA = int(os.environ.get("VECDB_TPU_RERANK_PCA", "16"))  # floor 128


class FlatIndex:
    algorithm = "Flat"

    def __init__(self, dim: int, dist: str, capacity: int = 0):
        self.store = VecStore(dim, dist, capacity)

    # ---- construction ----
    @classmethod
    def from_numpy(cls, vectors: np.ndarray, dist: str) -> "FlatIndex":
        idx = cls(vectors.shape[1], dist, capacity=len(vectors))
        if len(vectors):
            idx.store.batch_push(vectors)
        return idx

    @classmethod
    def from_store(cls, store: VecStore) -> "FlatIndex":
        if getattr(store, "_mirror_layout", "scan") == "sorted":
            # fail at construction, not first search: the cluster-sorted
            # mirror breaks the full scan's survivor statistics (see
            # _knn_device) and such stores belong to IVFIndex
            raise ValueError(
                "store's int8 mirror is cluster-sorted (binned-IVF scale "
                "layout); FlatIndex requires the randomly-permuted layout"
            )
        idx = cls.__new__(cls)
        idx.store = store
        return idx

    @property
    def dim(self) -> int:
        return self.store.dim

    @property
    def dist(self) -> str:
        return self.store.dist

    def __len__(self) -> int:
        return len(self.store)

    def index_bytes(self) -> int:
        """Device-HBM footprint of this index (store arrays; Flat has no
        topology) — recorded per sweep row (BASELINE.md: equal index
        memory)."""
        return self.store.device_bytes()

    def add(self, vec) -> int:
        return self.store.push(vec)

    def batch_add(self, vecs) -> list[int]:
        return self.store.batch_push(vecs)

    # ---- search ----
    def knn_batch(self, queries: np.ndarray, k: int, exact: bool | None = None):
        """Batched exact kNN -> ((B, k) dists, (B, k) ids), -1 padded.

        Default path: bf16 MXU scan + approx_min_k candidate selection, then
        exact f32 rerank of the top max(8k, 64) (returned distances are exact
        f32, matching the reference's f32 scalar scan,
        flat_index.rs:48-57).  `exact=True` (or VECDB_TPU_SCAN=exact) forces
        the single-pass full-f32 scan — used for ground-truth generation.

        Lean-tier stores rerank on the reduced-precision slab; when the
        store retained its block generator (keep_fill, the default) the
        final (B, k) distances are refined to exact f32 here, honoring the
        reference's exact-returned-distance contract.
        """
        d, i = self._knn_device(queries, k, exact)
        if self.store.tier == "lean":
            i_h = np.asarray(i)
            refined = self.store.refine_distances(
                np.atleast_2d(np.asarray(queries, np.float32)), i_h
            )
            if refined is not None:
                order = np.argsort(refined, axis=1, kind="stable")
                return (
                    np.take_along_axis(refined, order, axis=1),
                    np.take_along_axis(i_h, order, axis=1),
                )
        return np.asarray(d), np.asarray(i)

    def _knn_device(self, queries, k: int, exact: bool | None = None,
                    rerank_depth: int | None = None):
        """Device-resident variant of knn_batch (no host fetch; accepts an
        already-uploaded (B, dim) device array to keep pipelines sync-free).

        `rerank_depth` overrides the stage-1 survivor count (how many
        candidates reach the exact rerank).  HNSW's scan route maps its
        `ef` here so the reference's accuracy knob keeps its meaning —
        recall is monotone in the candidate-pool width on both designs."""
        import jax

        if isinstance(queries, jax.Array):
            q = queries
        else:
            q = jnp.asarray(np.atleast_2d(np.asarray(queries, dtype=np.float32)))
        n = len(self.store)
        lean = self.store.tier == "lean"
        if getattr(self.store, "_mirror_layout", "scan") == "sorted":
            # ingest-sorted mirror (IVFIndex.from_device_blocks(mirror=
            # "sorted")): posting order concentrates a query's neighbors
            # into few 128-row chunks, which collapses the chunk-min
            # survivor statistics the full scan depends on
            raise RuntimeError(
                "store's int8 mirror is cluster-sorted (binned-IVF scale "
                "layout); the full scan requires the randomly-permuted "
                "layout — search via IVFIndex instead"
            )
        if exact is None:
            exact = not lean and (_SCAN_MODE == "exact" or n <= _EXACT_BELOW)
            if not exact and _SCAN_MODE in ("int8", "pca"):
                # quantization self-test: datasets whose neighbor gaps are
                # tiny relative to vector magnitudes defeat int8 ordering
                # at ANY rerank depth; use the exact scan there
                exact = not self.store.int8_reliable()
        if exact:
            if lean:
                raise RuntimeError(
                    "exact f32 scan unavailable on a lean-tier store "
                    "(no f32 device copy; and the int8 self-test failed, "
                    "so the quantized stage-1 cannot be trusted either)"
                )
            vecs, cache = self.store.device()
            return T.knn_scan(q, vecs, cache, jnp.int32(n), k, self.dist)
        mult = _RERANK_MULT
        if n > 1_500_000:  # log2 depth growth past ~1M (see knob comment)
            mult = _RERANK_MULT * max(1, int(np.log2(n / 1_000_000)) + 1)
        r = min(max(mult * k, 32), n)
        if rerank_depth is not None:
            r = min(max(rerank_depth, k, 32), n)
        if _SCAN_MODE == "pca" and _PCA_DIM < self.dim:
            from ..ops import project as PJ

            r = min(max(_RERANK_MULT_PCA * k, 128), n)
            if rerank_depth is not None:
                r = min(max(rerank_depth, k, 128), n)
            proj, mu, p8, pscale, pcache = self.store.device_proj_int8(_PCA_DIM)
            qp = PJ.project(q, proj, mu)
            if jax.default_backend() != "cpu":
                from ..ops import pallas_scan as PS

                _, cand = PS.scan_candidates_int8_packed(
                    qp, p8, pscale, pcache, jnp.int32(n), r, self.dist
                )
            else:
                _, cand = T.scan_candidates_int8(
                    qp, p8, pscale, pcache, jnp.int32(n), r, self.dist
                )
        elif _SCAN_MODE in ("int8", "pca"):  # pca degrades to int8 at small dim
            base_i8, scales, cache8, perm = self.store.device_int8()
            cap8 = jnp.int32(base_i8.shape[0])  # validity lives IN the
            # permuted mirror (sentinels), not in a positional bound
            if jax.default_backend() != "cpu":
                # packed Pallas chunk-min: argmin folded into the distance
                # bits, one sublane reduce per 128-row chunk (~25% faster
                # than the XLA int8 scan at N>=4e5, measured chained)
                from ..ops import pallas_scan as PS

                _, cand = PS.scan_candidates_int8_packed(
                    q, base_i8, scales, cache8, cap8, r, self.dist
                )
            else:
                _, cand = T.scan_candidates_int8(
                    q, base_i8, scales, cache8, cap8, r, self.dist
                )
            cand = T.decode_perm(cand, perm, jnp.int32(n))
        else:
            scan_vecs, scan_cache0 = self.store.device_traversal()
            _, cand = T.scan_candidates(
                q, scan_vecs, scan_cache0, jnp.int32(n), r, self.dist
            )
        if jax.default_backend() != "cpu":
            # DMA-gather rerank kernel: exact (slab-precision on the lean
            # tier) f32 distances for the r candidates at HBM copy speed
            # (ops/pallas_gather.py)
            from ..ops import pallas_gather as PG

            base_rs = self.store.device_rerank()
            return PG.rerank_topk_rs(q, base_rs, cand, k, self.dist)
        if lean:
            # CPU lean tier (tests): the DMA kernel runs in interpret mode
            from ..ops import pallas_gather as PG

            base_rs = self.store.device_rerank()
            return PG.rerank_topk_rs(q, base_rs, cand, k, self.dist, interpret=True)
        # CPU fallback: order candidates on the half-width bf16 copy
        # (gather-bound step), then exact f32 distances for the chosen k rows
        vecs, _ = self.store.device()
        scan_vecs, scan_cache = self.store.device_traversal()
        _, top_ids = T.knn_gathered(q, scan_vecs, cand, k, self.dist, base_cache=scan_cache)
        return T.exact_distances_sorted(q, vecs, top_ids, self.dist, base_cache=scan_cache)

    def knn(self, query, k: int) -> list[CandidatePair]:
        # Single-query fast path: the native serial scan avoids device
        # dispatch latency for interactive lookups.
        from . import native

        res = native.flat_knn_single(self.store, np.asarray(query, np.float32), k)
        if res is not None:
            ids, dists = res
            return [CandidatePair(int(i_), float(d_)) for i_, d_ in zip(ids, dists)]
        d, i = self.knn_batch(query, k)
        return pairs_from_arrays(d[0], i[0], k)

    def knn_with_ef(self, query, k: int, ef: int) -> list[CandidatePair]:
        """Flat search ignores ef (reference: src/database/dynamic_index.rs:75-80)."""
        return self.knn(query, k)

    def knn_pq_batch(self, queries: np.ndarray, k: int, ef: int, pq: PQTable):
        """ADC scan + exact rerank (flat_index.rs:84-104)."""
        import jax

        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        pq.warn_if_unreliable("FlatIndex.knn_pq (ADC candidate ordering)")
        q_dev = jnp.asarray(queries)
        lookup, q_norms = pq.create_lookup(q_dev)
        n_cand = max(ef, k)
        _, cand_ids = pq.adc_scan(lookup, q_norms, n_cand)
        if jax.default_backend() != "cpu":
            from ..ops import pallas_gather as PG

            d, i = PG.rerank_topk_rs(q_dev, self.store.device_rerank(), cand_ids, k, self.dist)
        else:
            vecs, cache = self.store.device()
            d, i = T.knn_gathered(q_dev, vecs, cand_ids, k, self.dist, base_cache=cache)
        return np.asarray(d), np.asarray(i)

    def knn_pq(self, query, k: int, ef: int, pq: PQTable) -> list[CandidatePair]:
        d, i = self.knn_pq_batch(query, k, ef, pq)
        return pairs_from_arrays(d[0], i[0], k)

    # ---- serde (flat_index.rs:72-83; external-vec-set form stores only config) ----
    def state(self, include_vectors: bool = True) -> tuple[dict, dict]:
        arrays = self.store.state_arrays(include_vectors)
        meta = {
            "algorithm": "Flat",
            "dim": self.dim,
            "dist": self.dist,
            "n": len(self.store),
        }
        return arrays, meta

    @classmethod
    def from_state(cls, arrays: dict, meta: dict, external_vectors: np.ndarray | None = None):
        vecs = arrays.get("vectors", external_vectors)
        if vecs is None:
            raise ValueError("FlatIndex state has no vectors and none were provided")
        idx = cls.from_numpy(np.asarray(vecs), meta["dist"])
        return idx

    def save(self, path, include_vectors: bool = True) -> None:
        arrays, meta = self.state(include_vectors)
        serde.save_arrays(path, arrays, meta)

    @classmethod
    def load(cls, path, external_vectors: np.ndarray | None = None) -> "FlatIndex":
        arrays, meta = serde.load_arrays(path)
        return cls.from_state(arrays, meta, external_vectors)
