"""Headline benchmark: batched HNSW search QPS at recall@10 on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline: the reference's committed Gist1M multi-threaded CPU result
(data/t_bench.toml: HNSW M=16 efc=200, ef=120 -> 0.1535 ms/query ~ 6514 QPS
at recall@10 = 0.8504; see BASELINE.md).  Gist1M itself cannot be downloaded
here (no egress), so the bench runs on a deterministic synthetic clustered
dataset with the same dim=960 and measures recall against exact ground truth
computed on-device.  Dataset size defaults to 100k (override with BENCH_N).

Env knobs: BENCH_N, BENCH_EF, BENCH_K, BENCH_QUERIES.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_QPS = 6514.0  # Gist1M HNSW ef=120 multi-threaded (BASELINE.md)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_dataset(n: int, dim: int, n_queries: int, seed: int = 0):
    """Deterministic clustered synthetic data (Gist-like scale, dim=960)."""
    rng = np.random.default_rng(seed)
    n_clusters = 256
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    base = centers[assign] + 0.35 * rng.standard_normal((n, dim)).astype(np.float32)
    qa = rng.integers(0, n_clusters, size=n_queries)
    queries = centers[qa] + 0.35 * rng.standard_normal((n_queries, dim)).astype(np.float32)
    return base.astype(np.float32), queries.astype(np.float32)


def main() -> None:
    n = int(os.environ.get("BENCH_N", "100000"))
    ef = int(os.environ.get("BENCH_EF", "120"))
    k = int(os.environ.get("BENCH_K", "10"))
    n_queries = int(os.environ.get("BENCH_QUERIES", "1000"))
    expand = int(os.environ.get("BENCH_EXPAND", "1"))
    dim = 960

    from lab_1806_vec_db_tpu.models import FlatIndex, HNSWIndex
    from lab_1806_vec_db_tpu.utils.config import HNSWConfig

    log(f"dataset: N={n} dim={dim} queries={n_queries}")
    base, queries = make_dataset(n, dim, n_queries)

    log("computing exact ground truth (blocked GEMM scan)...")
    flat = FlatIndex.from_numpy(base, "l2sqr")
    t0 = time.perf_counter()
    _, gt_ids = flat.knn_batch(queries, k)
    gt_s = time.perf_counter() - t0
    log(f"ground truth in {gt_s:.1f}s")

    log("building HNSW (M=16, efc=200)...")
    from lab_1806_vec_db_tpu.utils.profiling import progress_bar

    t0 = time.perf_counter()
    index = HNSWIndex.build(
        base, "l2sqr", HNSWConfig(ef_construction=200, M=16), seed=42,
        progress=progress_bar(n, "hnsw-build"),
    )
    build_s = time.perf_counter() - t0
    log(f"build in {build_s:.1f}s")

    # warm-up / compile
    index.knn_with_ef_batch(queries, k, ef, expand=expand)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        _, ids = index.knn_with_ef_batch(queries, k, ef, expand=expand)
    elapsed = time.perf_counter() - t0
    qps = reps * n_queries / elapsed
    recall = float(
        np.mean([len(set(gt_ids[i]) & set(ids[i])) / k for i in range(n_queries)])
    )
    log(f"QPS={qps:.0f} recall@{k}={recall:.4f} ms/query={1000/qps:.4f}")

    print(
        json.dumps(
            {
                "metric": "hnsw_batched_search_qps",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / BASELINE_QPS, 3),
                "recall_at_10": round(recall, 4),
                "ef": ef,
                "n": n,
                "dim": dim,
                "build_seconds": round(build_s, 1),
                "baseline": "Gist1M HNSW ef=120 multi-threaded CPU, 6514 QPS @ recall 0.8504 (data/t_bench.toml)",
                "note": "synthetic clustered dim-960 dataset (no egress to fetch Gist1M); recall vs exact on-device GT",
            }
        )
    )


if __name__ == "__main__":
    main()
