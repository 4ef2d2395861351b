"""Headline benchmark: exact vector search QPS on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline: the reference's committed Gist1M multi-threaded CPU result
(data/t_bench.toml: HNSW M=16 efc=200, ef=120 -> 0.1535 ms/query ~ 6514 QPS
at recall@10 = 0.8504; see BASELINE.md).  Gist1M itself cannot be downloaded
here (no egress), so the bench runs on a deterministic synthetic dataset
matched to the PCA spectrum of the committed real Gist fixture slice (see
`gist_spectrum`) with the same N=1M / dim=960 shape, and measures recall
against exact ground truth computed on-device in full f32.

The measured path is the TPU-native redesign of the search hot loop: a
blocked bf16 GEMM scan over the full dataset on the MXU + `lax.approx_min_k`
candidate selection + exact f32 rerank (ops/topk.py:scan_candidates /
knn_gathered).  It is *exact-grade* search (recall@10 ~ 1.0 measured, not by
construction) — brute force beats graph traversal on this hardware at this
scale, which is the point of the TPU-first architecture.

Throughput is measured pipelined (many batches in flight, one sync), which
is the TPU serving model; the tunnel/dispatch round-trip (~26 ms) is
reported separately as single-batch latency.

Env knobs: BENCH_N, BENCH_K, BENCH_QUERIES, BENCH_EF,
BENCH_MODE=scan|hnsw|sweep|big|bigivf|codes
  sweep: full 1M reference-config matrix -> data/t_bench_1M_tpu.toml
         (BENCH_SWEEP_BLOCKS=scan,hnsw,pq,ivf; BENCH_HNSW_CACHE=path)
  big:   lean-tier >=2M sweeps -> data/t_bench_<N>M_lean_tpu.toml
  codes: IVF-PQ codes tier (10M+/chip) -> data/t_bench_<N>M_codes_tpu.toml
         (BENCH_NLIST, BENCH_PQ_M, BENCH_BLOCK_ROWS)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_QPS = 6514.0  # Gist1M HNSW ef=120 multi-threaded (BASELINE.md)
BASELINE_RECALL = 0.8504


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def gist_spectrum(dim: int):
    """PCA model (mean, per-component scales, basis) of the committed real
    Gist slice — see lab_1806_vec_db_tpu.bench.synth.gist_spectrum (the
    canonical implementation; matching the real fixture's spectrum is what
    makes PQ/graph recall behave like the reference's published numbers)."""
    from lab_1806_vec_db_tpu.bench import synth

    here = os.path.dirname(os.path.abspath(__file__))
    return synth.gist_spectrum(dim, data_dir=os.path.join(here, "data"))


def make_dataset(n: int, dim: int, n_queries: int, seed: int = 0, kind: str = "gist"):
    """Deterministic synthetic data (Gist-like scale, dim=960).

    kind="gist" (default): Gaussian in the PCA basis of the real Gist
    fixture slice, clipped to >= 0 like real Gist — realistic spectrum and
    distance contrast (see `gist_spectrum`).  kind="clusters": the legacy
    isotropic 256-center mixture (easier for int8 stage-1/IVF, degenerate
    for PQ at dim=960).
    """
    rng = np.random.default_rng(seed)
    if kind == "gist" and dim <= 960:
        mu, scales, vt = gist_spectrum(dim)
        r = len(scales)

        def draw(m):
            z = rng.standard_normal((m, r), dtype=np.float32)
            z *= scales
            x = z @ vt
            x += mu
            np.clip(x, 0.0, None, out=x)
            return x

        return draw(n), draw(n_queries)
    n_clusters = 256
    centers = rng.standard_normal((n_clusters, dim), dtype=np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    # generate noise directly in f32 and add in-place: at N=1M x 960 the
    # f64-then-cast route costs ~3x the wall time and 8 GB of extra traffic
    base = rng.standard_normal((n, dim), dtype=np.float32)
    base *= 0.35
    base += centers[assign]
    qa = rng.integers(0, n_clusters, size=n_queries)
    queries = rng.standard_normal((n_queries, dim), dtype=np.float32)
    queries *= 0.35
    queries += centers[qa]
    return base, queries


def make_dataset_device(n: int, dim: int, n_queries: int, seed: int = 0, kind: str = "gist"):
    """Same distribution as `make_dataset` (default: Gist-spectrum), ON the TPU.

    A host-generated 1M x 960 f32 set pays ~4 minutes of RNG on the single
    host core; device generation + `VecStore.from_device` ingest skips that
    and the upload.  Returns ((n_pad, dim) f32 device array, (n_queries,
    dim) f32 host array, n_pad) where n_pad >= n rounds n up to a whole
    number of generation blocks (every row is a real draw).
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    gist = kind == "gist" and dim <= 960
    key = jax.random.PRNGKey(seed)
    kc, kq, kb = jax.random.split(key, 3)
    if gist:
        mu_h, scales_h, vt_h = gist_spectrum(dim)
        # model params passed as ARGUMENTS: closing over device arrays would
        # constant-fold them into the HLO (slow, and brittle over the tunnel)
        params = (jnp.asarray(mu_h), jnp.asarray(scales_h), jnp.asarray(vt_h))

        def draw(params, key, rows):
            mu, scales, vt = params
            z = jax.random.normal(key, (rows, len(scales_h)), jnp.float32)
            return jnp.clip((z * scales) @ vt + mu, 0.0, None)

    else:
        n_clusters = 256
        params = (jax.random.normal(kc, (n_clusters, dim), jnp.float32),)

        def draw(params, key, rows):
            (centers,) = params
            ka, kn = jax.random.split(key)
            assign = jax.random.randint(ka, (rows,), 0, n_clusters)
            return centers[assign] + 0.35 * jax.random.normal(kn, (rows, dim), jnp.float32)

    n_blocks = min(16, max(1, n // 4096))
    rows = -(-n // n_blocks)  # ceil
    n_pad = rows * n_blocks

    @partial(jax.jit, donate_argnums=(0,), static_argnames=("rows",))
    def fill(buf, params, key, row0, rows):
        return jax.lax.dynamic_update_slice(buf, draw(params, key, rows), (row0, 0))

    base = jnp.zeros((n_pad, dim), jnp.float32)
    for b, kb_i in enumerate(jax.random.split(kb, n_blocks)):
        base = fill(base, params, kb_i, b * rows, rows)

    make_queries = jax.jit(partial(draw, rows=n_queries))
    queries = make_queries(params, kq)
    jax.block_until_ready(base)
    return base, np.asarray(queries), n_pad


def recall_at_k(gt_ids: np.ndarray, ids: np.ndarray, k: int) -> float:
    return float(
        np.mean([len(set(gt_ids[i][:k]) & set(ids[i][:k])) / k for i in range(len(gt_ids))])
    )


def bench_scan(n: int, k: int, n_queries: int) -> dict:
    import jax
    from lab_1806_vec_db_tpu.models import FlatIndex

    dim = 960
    log(f"dataset: N={n} dim={dim} queries={n_queries}")
    t0 = time.perf_counter()
    if jax.default_backend() == "cpu":
        base, queries = make_dataset(n, dim, n_queries)
        flat = FlatIndex.from_numpy(base, "l2sqr")
    else:
        base_dev, queries, n = make_dataset_device(n, dim, n_queries)
        from lab_1806_vec_db_tpu.models.store import VecStore

        flat = FlatIndex.from_store(VecStore.from_device(base_dev, "l2sqr"))
        del base_dev
    log(f"dataset + ingest in {time.perf_counter()-t0:.1f}s")

    log("computing exact f32 ground truth on-device...")
    t0 = time.perf_counter()
    _, gt_ids = flat.knn_batch(queries, k, exact=True)
    gt_s = time.perf_counter() - t0
    log(f"ground truth in {gt_s:.1f}s")

    # warm-up / compile the two-stage path
    t0 = time.perf_counter()
    d, ids = flat.knn_batch(queries, k)
    log(f"two-stage warmup (incl. compile) in {time.perf_counter()-t0:.1f}s")
    recall = recall_at_k(gt_ids, ids, k)

    # single-batch latency (includes dispatch/tunnel round-trip)
    t0 = time.perf_counter()
    flat.knn_batch(queries, k)
    single_ms = (time.perf_counter() - t0) * 1000

    # pipelined throughput: many batches in flight, one final sync.  Batches
    # are chained through a scalar data dependency so every dispatch MUST
    # execute before the final fetch — robust against lazy/async dispatch
    # semantics in the device transport (an unchained loop that fetches only
    # the last output can under-count if unused results are elided).
    import jax.numpy as jnp

    q_dev = jnp.asarray(queries)
    reps, rounds = 8, 5
    round_s = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        s = jnp.float32(0.0)
        for _ in range(reps):
            d_out, _ = flat._knn_device(q_dev + s * 1e-30, k)
            s = s + d_out[0, 0] * 1e-30
        np.asarray(s)
        round_s.append(time.perf_counter() - t0)
    # best round: the TPU chip behind the tunnel is shared, so contention
    # inflates individual rounds; the minimum is the honest device cost.
    # The median is recorded alongside (VERDICT r2 weak-7: best-of is a
    # flattering statistic on its own).
    elapsed = min(round_s)
    median_s = float(np.median(round_s))
    qps = reps * n_queries / elapsed
    qps_median = reps * n_queries / median_s
    log(f"rounds ms/batch: {[f'{r/reps*1000:.1f}' for r in round_s]}")
    log(
        f"QPS={qps:.0f} recall@{k}={recall:.4f} "
        f"ms/query={1000 * n_queries / qps / n_queries:.4f} single-batch={single_ms:.1f}ms"
    )
    return {
        "metric": "exact_scan_search_qps",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
        "recall_at_10": round(recall, 4),
        "baseline_recall_at_10": BASELINE_RECALL,
        "n": n,
        "dim": dim,
        "batch": n_queries,
        "qps_median": round(qps_median, 1),
        "single_batch_ms": round(single_ms, 1),
        "ground_truth_seconds": round(gt_s, 1),
        "index_device_bytes": flat.index_bytes(),
        "baseline": "Gist1M HNSW ef=120 multi-threaded CPU, 6514 QPS @ recall 0.8504 (data/t_bench.toml)",
        "note": "packed int8 Pallas chunk-min scan + approx_min_k(0.95) + exact f32 Pallas DMA rerank; device-born Gist-spectrum synthetic dim-960 dataset (no egress for Gist1M); recall vs exact f32 on-device GT; QPS = best of 5 chained rounds (shared chip), median alongside",
    }


def make_fill(seed: int, dim: int, kind: str = "gist"):
    """Deterministic block generator for the lean-tier ingest (same
    distribution family as `make_dataset`): fill(row0, rows) regenerates the
    SAME rows for the same row0 (keyed by fold_in), so exact f32 ground
    truth can be computed in blocks after the f32 data is discarded."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    key = jax.random.PRNGKey(seed)
    kc, kb, kq = jax.random.split(key, 3)
    if kind == "gist" and dim <= 960:
        mu_h, scales_h, vt_h = gist_spectrum(dim)
        params = (jnp.asarray(mu_h), jnp.asarray(scales_h), jnp.asarray(vt_h))

        def draw(key_b, params, rows):
            mu, scales, vt = params
            z = jax.random.normal(key_b, (rows, len(scales_h)), jnp.float32)
            return jnp.clip((z * scales) @ vt + mu, 0.0, None)

    else:
        n_clusters = 256
        params = (jax.random.normal(kc, (n_clusters, dim), jnp.float32),)

        def draw(key_b, params, rows):
            (centers,) = params
            ka, kn = jax.random.split(key_b)
            assign = jax.random.randint(ka, (rows,), 0, n_clusters)
            return centers[assign] + 0.35 * jax.random.normal(kn, (rows, dim), jnp.float32)

    # ROW-ADDRESSABLE keying: every base row draws from its own
    # fold_in(kb, row_id) key, so consumers can regenerate an arbitrary id
    # SET directly (the codes tiers' exact refine needs ~B*ef of 10M rows;
    # block-keyed draws forced a full-dataset regen per batch — 77 blocks
    # x ~8.8 ms of RNG+GEMM = 540 ms of the measured 750 ms/batch at 10M).
    def draw_rows(params, key, row_ids):
        keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(
            row_ids.astype(jnp.uint32))
        if kind == "gist" and dim <= 960:
            mu, scales, vt = params
            z = jax.vmap(
                lambda kk: jax.random.normal(kk, (len(scales_h),), jnp.float32)
            )(keys)
            return jnp.clip((z * scales) @ vt + mu, 0.0, None)
        (centers,) = params
        def one(kk):
            ka, kn = jax.random.split(kk)
            a = jax.random.randint(ka, (), 0, centers.shape[0])
            return a, jax.random.normal(kn, (centers.shape[1],), jnp.float32)
        assign, noise = jax.vmap(one)(keys)
        return centers[assign] + 0.35 * noise

    gen_rows = jax.jit(draw_rows)
    gen_q = partial(jax.jit, static_argnames=("rows",))(draw)

    def fill(row0, rows):
        return gen_rows(params, kb, row0 + jnp.arange(rows, dtype=jnp.int32))

    def queries(n_queries):
        return gen_q(kq, params, n_queries)

    # jit-traceable row generator for consumers that regenerate INSIDE one
    # device program (the codes tiers' exact refine): identical keying to
    # `fill` by construction
    fill.row_gen = (draw_rows, params, kb)
    return fill, queries


def exact_gt_blocked(fill, n, q_dev, k, dist, block_rows):
    """Exact f32 ground truth without ever holding the full set: regenerate
    each block, exact-scan it, merge a running top-k."""
    import jax.numpy as jnp
    from lab_1806_vec_db_tpu.ops import topk as T

    B = q_dev.shape[0]
    best_d = jnp.full((B, k), jnp.inf, jnp.float32)
    best_i = jnp.full((B, k), T.INVALID_ID, jnp.int32)
    from lab_1806_vec_db_tpu.ops import distance as D

    for row0 in range(0, n, block_rows):
        rows = min(block_rows, n - row0)
        v = fill(row0, rows)
        cache = D.dist_cache(v, dist)
        td, ti = T.knn_scan(q_dev, v, cache, jnp.int32(rows), k, dist)
        ti = jnp.where(ti >= 0, ti + row0, ti)
        best_d, best_i = T.merge_topk(best_d, best_i, td, ti, k)
    return np.asarray(best_i)


def bench_ivf_big(n: int, k: int, n_queries: int, n_probes: int) -> dict:
    """Lean-tier scale demo: N x 960 f32 would be ~4 GB per 1M rows — past
    ~1.2M the full tier (f32 canonical + f32 slab + mirrors) no longer fits
    one 16 GB chip.  The lean tier (permuted int8 mirror + bf16 rerank
    slab, ~3 KB/row at dim 960) holds N >= 2M with room for transients,
    and the batched binned IVF scan beats the (linear-cost) full scan."""
    import jax
    import jax.numpy as jnp
    from lab_1806_vec_db_tpu.models import FlatIndex, IVFIndex
    from lab_1806_vec_db_tpu.utils.config import IVFConfig

    dim = 960
    nlist = 256 * max(1, round(n / 1_000_000))
    # past ~2.5M the scan-layout mode OOMs building the binned search's
    # second (cluster-sorted) mirror copy; the ingest-sorted layout holds
    # one copy only (~4M rows/chip) but cannot serve the full-scan kernel
    mirror = "sorted" if n > 2_500_000 else "scan"
    log(f"lean ingest: N={n} dim={dim} nlist={nlist} probes={n_probes} mirror={mirror}")
    fill, queries_fn = make_fill(0, dim)
    q_dev = jnp.asarray(queries_fn(n_queries))

    t0 = time.perf_counter()
    idx = IVFIndex.from_device_blocks(
        fill, n, dim, "l2sqr", IVFConfig(k=nlist, k_means_max_iter=10), seed=0,
        mirror=mirror,
    )
    build_s = time.perf_counter() - t0
    log(f"lean IVF build in {build_s:.1f}s")

    log("exact f32 ground truth (blocked regeneration)...")
    t0 = time.perf_counter()
    gt_ids = exact_gt_blocked(fill, n, q_dev, k, "l2sqr", 131072)
    log(f"ground truth in {time.perf_counter()-t0:.1f}s")

    # warm both paths (full scan needs the random-permutation layout)
    d, ids = idx._knn_device_binned(q_dev, k, n_probes)
    recall_ivf = recall_at_k(gt_ids, np.asarray(ids), k)
    flat = None
    recall_flat = None
    if mirror == "scan":
        flat = FlatIndex.from_store(idx.store)
        _, ids_f = flat._knn_device(q_dev, k)
        recall_flat = recall_at_k(gt_ids, np.asarray(ids_f), k)

    def chained_qps(step):
        reps, rounds = 6, 4
        best = 1e9
        for _ in range(rounds):
            t0 = time.perf_counter()
            s = jnp.float32(0.0)
            for _ in range(reps):
                d_out, _ = step(q_dev + s * 1e-30)
                s = s + d_out[0, 0] * 1e-30
            np.asarray(s)
            best = min(best, (time.perf_counter() - t0) / reps)
        return n_queries / best

    qps_ivf = chained_qps(lambda q: idx._knn_device_binned(q, k, n_probes))
    qps_flat = None
    if flat is not None:
        qps_flat = chained_qps(lambda q: flat._knn_device(q, k))
        log(
            f"binned IVF: {qps_ivf:.0f} QPS @ recall {recall_ivf:.4f} | "
            f"full scan: {qps_flat:.0f} QPS @ recall {recall_flat:.4f}"
        )
    else:
        log(f"binned IVF: {qps_ivf:.0f} QPS @ recall {recall_ivf:.4f}")
    return {
        "metric": "lean_ivf_binned_qps",
        "value": round(qps_ivf, 1),
        "unit": "qps",
        "vs_baseline": round(qps_ivf / BASELINE_QPS, 3),
        "recall_at_10": round(recall_ivf, 4),
        "n": n,
        "dim": dim,
        "nlist": nlist,
        "n_probes": n_probes,
        "batch": n_queries,
        "build_seconds": round(build_s, 1),
        "mirror": mirror,
        "full_scan_qps": round(qps_flat, 1) if qps_flat is not None else None,
        "full_scan_recall_at_10": round(recall_flat, 4) if recall_flat is not None else None,
        "baseline": "Gist1M HNSW ef=120 multi-threaded CPU, 6514 QPS @ recall 0.8504 (data/t_bench.toml)",
        "note": (
            f"lean tier ({'cluster-sorted' if mirror == 'sorted' else 'permuted'} "
            "int8 mirror + bf16 DMA-rerank slab, no f32 on device); exact f32 GT "
            "by deterministic block regeneration; QPS best-of-rounds chained"
        ),
    }


def bench_sweep_big(n: int, k: int, n_queries: int) -> dict:
    """The >=3M/chip regime (VERDICT r2 item 2): lean-tier sweeps at N x 960
    written to data/t_bench_<tag>_lean_tpu.toml (merge-by-label, same schema
    as the 1M sweep).  Two blocks (BENCH_SWEEP_BLOCKS=scan,ivf):

    - scan: permuted-int8-mirror lean store (no sorted copy — that pairing
      caps at ~2.5M), two-stage scan at several rerank depths.
    - ivf: ingest-sorted binned IVF (the one-mirror layout that holds ~4M
      rows/chip), n_probes sweep.

    The graph route is intentionally absent here: its cost is ~flat in N
    (DMA-issue bound, 0.44 ms/q at 1M ef=120) while the scan's is ~linear
    (0.020 ms/q at 1M), so the single-chip crossover sits at ~22M rows —
    past lean-tier HBM capacity (~4-5M/chip).  Past one chip the designed
    graph-scale path is sharding (parallel/sharded.ShardedHNSWIndex), not
    a deeper single-chip walk; see DESIGN.md 9b.
    """
    import jax
    import jax.numpy as jnp
    from lab_1806_vec_db_tpu.models import FlatIndex, IVFIndex
    from lab_1806_vec_db_tpu.models.store import VecStore
    from lab_1806_vec_db_tpu.utils.config import IVFConfig

    dim = 960
    tag = f"{n // 1_000_000}M" if n % 1_000_000 == 0 else str(n)
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data",
        f"t_bench_{tag}_lean_tpu.toml",
    )
    blocks = set(os.environ.get("BENCH_SWEEP_BLOCKS", "scan,ivf").split(","))

    def _label_key(label: str) -> str:
        return label.split(" (")[0]

    results: list[dict] = []
    if os.path.exists(out_path):
        import tomllib

        with open(out_path, "rb") as f:
            for r in tomllib.load(f).get("results", []):
                results.append({
                    "label": r["label"], "ef": r["ef"], "ms": r["search_time"],
                    "ms_median": r.get("search_time_median", r["search_time"]),
                    "recall": r["recall"],
                    "extra": {kk: vv for kk, vv in r.items()
                              if kk not in ("label", "ef", "search_time",
                                            "search_time_median", "recall")},
                })

    def write_toml():
        lines = [
            f'title = "Gist-spectrum synthetic {tag} x 960, single TPU v5e chip, LEAN tier '
            '(int8 mirror + bf16 rerank slab, no f32 copy on device), batch=1000; '
            'search_time = ms/query (best of chained rounds, shared chip; median alongside); '
            'recall@10 vs exact f32 GT by blocked regeneration; '
            'scan rows: ef = stage-1 survivor count; ivf rows: ef = n_probes."\n'
        ]
        for r in results:
            lines.append("[[results]]")
            lines.append(f'label = "{r["label"]}"')
            lines.append(f'ef = {r["ef"]}')
            for key, val in r.get("extra", {}).items():
                lines.append(f"{key} = {val!r}")
            ms = ",\n".join(f"    {v!r}" for v in r["ms"])
            md = ",\n".join(f"    {v!r}" for v in r["ms_median"])
            rc = ",\n".join(f"    {v!r}" for v in r["recall"])
            lines.append(f"search_time = [\n{ms},\n]")
            lines.append(f"search_time_median = [\n{md},\n]")
            lines.append(f"recall = [\n{rc},\n]")
            lines.append("")
        with open(out_path, "w") as f:
            f.write("\n".join(lines))

    def _merge_row(row: dict) -> None:
        key = _label_key(row["label"])
        for idx, r in enumerate(results):
            if _label_key(r["label"]) == key:
                results[idx] = row
                return
        results.append(row)

    fill, queries_fn = make_fill(0, dim)
    q_dev = jnp.asarray(queries_fn(n_queries))
    summary: dict = {}
    gt_ids = None

    def ensure_gt():
        nonlocal gt_ids
        if gt_ids is None:
            log("exact f32 ground truth (blocked regeneration)...")
            t0 = time.perf_counter()
            gt_ids = exact_gt_blocked(fill, n, q_dev, k, "l2sqr", 131072)
            log(f"ground truth in {time.perf_counter()-t0:.1f}s")

    def chained_stats(step, reps=4, rounds=3):
        times = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            s = jnp.float32(0.0)
            for _ in range(reps):
                d_out, _ = step(q_dev + s * 1e-30)
                s = s + d_out[0, 0] * 1e-30
            np.asarray(s)
            times.append((time.perf_counter() - t0) / reps)
        scale = 1000.0 / n_queries
        return min(times) * scale, float(np.median(times)) * scale

    def sweep(label, efs, step, extra=None):
        ms, med, rec = [], [], []
        for ef in efs:
            _, ids = step(q_dev, ef)
            rec.append(round(recall_at_k(gt_ids, np.asarray(ids), k), 4))
            b, m_ = chained_stats(lambda q, e=ef: step(q, e))
            ms.append(round(b, 4))
            med.append(round(m_, 4))
            log(f"  {label} ef={ef}: {ms[-1]:.4f} ms/q (med {med[-1]:.4f})  recall@{k}={rec[-1]:.4f}")
        row = {"label": label, "ef": list(efs), "ms": ms,
               "ms_median": med, "recall": rec, "extra": extra or {}}
        _merge_row(row)
        write_toml()
        return row

    if "scan" in blocks:
        try:
            log(f"[1/2] lean scan-layout ingest: N={n} x {dim}")
            t0 = time.perf_counter()
            store = VecStore.from_device_blocks(fill, n, dim, "l2sqr")
            ingest_s = time.perf_counter() - t0
            log(f"ingest in {ingest_s:.1f}s")
            ensure_gt()
            flat = FlatIndex.from_store(store)
            row = sweep(
                f"tpu-lean two-stage scan (int8 stage1 + bf16-slab rerank; ingest {ingest_s:.0f}s)",
                [80, 160, 320],
                lambda q, ef: flat._knn_device(q, k, rerank_depth=ef),
                extra={"build_seconds": round(ingest_s, 1),
                       "index_device_bytes": store.device_bytes()},
            )
            summary["scan_ef160_qps"] = round(1000.0 / row["ms"][1], 1)
            summary["scan_ef160_recall"] = row["recall"][1]
            del flat, store  # free the scan-layout mirrors before the ivf ingest
        except Exception as e:
            log(f"scan block failed: {e!r}")

    if "ivf" in blocks:
        try:
            nlist = 256 * max(1, round(n / 1_000_000))
            log(f"[2/2] lean sorted-layout binned IVF ingest: nlist={nlist}")
            t0 = time.perf_counter()
            idx = IVFIndex.from_device_blocks(
                fill, n, dim, "l2sqr",
                IVFConfig(k=nlist, k_means_max_iter=10), seed=0, mirror="sorted",
            )
            build_s = time.perf_counter() - t0
            log(f"lean IVF build in {build_s:.1f}s")
            ensure_gt()
            row = sweep(
                f"tpu-lean ivf-binned nlist{nlist} sorted-mirror (ef = n_probes; build {build_s:.0f}s)",
                [4, 8, 16, 32, 64],
                lambda q, ef: idx._knn_device_binned(q, k, ef),
                extra={"build_seconds": round(build_s, 1),
                       "index_device_bytes": idx.index_bytes()},
            )
            summary["ivf_p4_qps"] = round(1000.0 / row["ms"][1], 1)
            summary["ivf_p4_recall"] = row["recall"][1]
        except Exception as e:
            log(f"ivf block failed: {e!r}")

    qps = summary.get("scan_ef160_qps") or summary.get("ivf_p4_qps") or 0.0
    return {
        "metric": "lean_big_scan_qps_ef160",
        "value": qps,
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
        "recall_at_10": summary.get("scan_ef160_recall"),
        "n": n,
        "dim": dim,
        "batch": n_queries,
        "baseline": "Gist1M HNSW ef=120 multi-threaded CPU, 6514 QPS @ recall 0.8504 (data/t_bench.toml)",
        "sweep": summary,
        "note": f"lean-tier {tag} sweep written to {os.path.basename(out_path)}",
    }


def bench_hnsw(n: int, k: int, n_queries: int, ef: int) -> dict:
    from lab_1806_vec_db_tpu.models import FlatIndex, HNSWIndex
    from lab_1806_vec_db_tpu.utils.config import HNSWConfig
    from lab_1806_vec_db_tpu.utils.profiling import progress_bar

    import jax
    from lab_1806_vec_db_tpu.models.store import VecStore

    dim = 960
    log(f"dataset: N={n} dim={dim} queries={n_queries}")
    if jax.default_backend() == "cpu":
        base, queries = make_dataset(n, dim, n_queries)
        store = VecStore.from_numpy(base, "l2sqr")
    else:
        # device-born end to end: generation, GT, and build never move the
        # base over the tunnel (multi-GB transfers have wedged it)
        base_dev, queries, _ = make_dataset_device(n, dim, n_queries)
        store = VecStore.from_device(base_dev, "l2sqr")

    log("computing exact ground truth (blocked GEMM scan)...")
    flat = FlatIndex.from_store(store)
    _, gt_ids = flat.knn_batch(queries, k, exact=True)

    log("building HNSW (M=16, efc=200)...")
    t0 = time.perf_counter()
    index = HNSWIndex.build_from_store(
        store, HNSWConfig(ef_construction=200, M=16), seed=42,
        progress=progress_bar(n, "hnsw-build"),
    )
    build_s = time.perf_counter() - t0
    log(f"build in {build_s:.1f}s ({n/build_s:.0f} vec/s)")

    # the build's candidate scans needed the int8 mirror; batched search
    # needs the bf16 traversal copy + f32 rerank slab instead — at 1M all
    # of them together exceed a shared 16 GB chip
    index.store.free_scan_mirrors()

    index.knn_with_ef_batch(queries, k, ef)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        _, ids = index.knn_with_ef_batch(queries, k, ef)
    elapsed = time.perf_counter() - t0
    qps = reps * n_queries / elapsed
    recall = recall_at_k(gt_ids, ids, k)
    log(f"QPS={qps:.0f} recall@{k}={recall:.4f}")
    return {
        "metric": "hnsw_batched_search_qps",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
        "recall_at_10": round(recall, 4),
        "ef": ef,
        "n": n,
        "dim": dim,
        "build_seconds": round(build_s, 1),
        "build_vecs_per_s": round(n / build_s, 1),
        "baseline": "Gist1M HNSW ef=120 multi-threaded CPU, 6514 QPS @ recall 0.8504 (data/t_bench.toml)",
        "note": "Gist-spectrum synthetic dim-960 dataset; recall vs exact on-device GT",
    }


def bench_codes(n: int, k: int, n_queries: int) -> dict:
    """Codes-resident IVF-PQ tier sweep (VERDICT r3 item 2): N rows served
    from cluster-sorted PQ codes alone (~200-230 B/row on device incl. list
    padding) — binned probed-list ADC at full m=320 quality + exact-f32
    refine via the retained block generator.  Written to
    data/t_bench_<tag>_codes_tpu.toml.

    At 10M x 960 the f32 set would be 38 GB and even the lean tier's
    ~3 KB/row exceeds one v5e chip; the codes tier holds it in ~1.8 GB.
    Recall is measured against exact f32 GT computed by blocked
    regeneration (the same generator the refine uses)."""
    import jax
    import jax.numpy as jnp
    from lab_1806_vec_db_tpu.models import IVFPQIndex
    from lab_1806_vec_db_tpu.utils.config import PQConfig
    from lab_1806_vec_db_tpu.utils.profiling import progress_bar

    dim = 960
    tag = f"{n // 1_000_000}M" if n % 1_000_000 == 0 else str(n)
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data",
        f"t_bench_{tag}_codes_tpu.toml",
    )

    fill, queries_fn = make_fill(0, dim)
    q_dev = jnp.asarray(queries_fn(n_queries))

    nlist = int(os.environ.get("BENCH_NLIST", "2048"))
    pq_m = int(os.environ.get("BENCH_PQ_M", "320"))
    log(f"[1/3] IVF-PQ codes-tier ingest: N={n} x {dim} (PQ m={pq_m}, nlist={nlist})")
    t0 = time.perf_counter()
    idx = IVFPQIndex.build_from_fill(
        fill, n, dim, "l2sqr", nlist=nlist,
        pq_config=PQConfig(n_bits=4, m=pq_m, dist="l2sqr", k_means_size=25_000),
        row_gen=fill.row_gen,
        block_rows=int(os.environ.get("BENCH_BLOCK_ROWS", "131072")),
        progress=progress_bar(n, "ivfpq-ingest"),
    )
    build_s = time.perf_counter() - t0
    bytes_row = idx.index_bytes() / n
    log(f"built in {build_s:.1f}s; {idx.index_bytes()/1e9:.2f} GB device "
        f"({bytes_row:.0f} B/row); lpad {idx.lpad}, overflow {idx.ov_count} "
        f"({idx.ov_count/n:.2%}); main self-test {idx.pq.adc_quality:.3f}")

    log("[2/3] exact f32 ground truth (blocked regeneration)")
    t0 = time.perf_counter()
    gt_ids = exact_gt_blocked(fill, n, q_dev, k, "l2sqr", 131072)
    log(f"ground truth in {time.perf_counter()-t0:.1f}s")

    def chained_stats(step, reps=4, rounds=3):
        times = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            s = jnp.float32(0.0)
            for _ in range(reps):
                d_out, _ = step(q_dev + s * 1e-30)
                s = s + d_out[0, 0] * 1e-30
            np.asarray(s)
            times.append((time.perf_counter() - t0) / reps)
        scale = 1000.0 / n_queries
        return min(times) * scale, float(np.median(times)) * scale

    log("[3/3] (n_probes, ef) sweep")
    # BENCH_QB=32 pins the bin width: bin_queries keeps each query's
    # HIGHEST-priority probes when a list's bin fills, so p > qb*nlist/2B
    # buys coverage at the same kernel cost (the kernel's dot scales with
    # qb, not p).  Pinning below ~1.5x the mean load drops too many probes
    # (measured 0.84 vs 0.93 recall at 1M/nlist=1024/p=64 with qb=32);
    # default auto = 2x mean.
    qb_env = os.environ.get("BENCH_QB", "auto")
    qb = None if qb_env == "auto" else int(qb_env)
    # BENCH_CHUNK widens the chunk-min grouping (halves the survivor
    # temp arrays; needed to fit the search compile at 30M+)
    chunk = int(os.environ.get("BENCH_CHUNK", "16"))
    combos = [(32, 256), (48, 256), (64, 256), (96, 320)]
    ms, med, rec, efs = [], [], [], []
    for p, ef in combos:
        step = lambda q, p=p, ef=ef: idx.knn_batch(q, k, n_probes=p, ef=ef,
                                                   qb=qb, chunk=chunk)
        _, ids = step(q_dev)
        rec.append(round(recall_at_k(gt_ids, np.asarray(ids), k), 4))
        b, m_ = chained_stats(step)
        ms.append(round(b, 4))
        med.append(round(m_, 4))
        efs.append(p)
        log(f"  ivfpq probes={p} ef={ef}: {ms[-1]:.4f} ms/q (med {med[-1]:.4f}) "
            f"recall@{k}={rec[-1]:.4f}")

    # merge with existing rows (other qb settings keep their rows)
    existing = []
    if os.path.exists(out_path):
        import tomllib

        with open(out_path, "rb") as f:
            existing = tomllib.load(f).get("results", [])

    title = (
        f'title = "Gist-spectrum synthetic {tag} x 960, single TPU v5e chip, IVF-PQ CODES '
        f"tier (nlist={nlist} cluster-sorted packed m=320 codes + slot map; NO per-row "
        "float storage on device; binned probed-list ADC + overflow scan + exact-f32 "
        "refine via block regeneration), batch=1000; ef = n_probes "
        "(ivf_index.rs:137-142 convention), rerank ef pairs per row in ef_rerank; "
        "search_time = ms/query (best of chained rounds, shared chip; median alongside); "
        'recall@10 vs exact f32 GT by blocked regeneration."\n'
    )
    label = (f"tpu-ivfpq m{pq_m} nlist{nlist} qb={qb_env} "
             f"binned-adc+exact-refine (build {build_s:.0f}s)")
    lines = [title]
    for r in existing:
        if r["label"].split(" (")[0] == label.split(" (")[0]:
            continue
        lines.append("[[results]]")
        for kk in ("label",):
            lines.append(f'label = "{r["label"]}"')
        for kk in ("ef", "build_seconds", "index_device_bytes", "ef_rerank", "qb"):
            if kk in r:
                lines.append(f"{kk} = {r[kk]!r}")
        for kk in ("search_time", "search_time_median", "recall"):
            if kk in r:
                lines.append(f"{kk} = [\n" + ",\n".join(f"    {v!r}" for v in r[kk]) + ",\n]")
        lines.append("")
    lines += ["[[results]]",
              f'label = "{label}"',
              f"ef = {efs}",
              f"build_seconds = {round(build_s, 1)!r}",
              f"index_device_bytes = {idx.index_bytes()}",
              f"ef_rerank = {[e for _, e in combos]}",
              f'qb = "{qb_env}"']
    lines.append("search_time = [\n" + ",\n".join(f"    {v!r}" for v in ms) + ",\n]")
    lines.append("search_time_median = [\n" + ",\n".join(f"    {v!r}" for v in med) + ",\n]")
    lines.append("recall = [\n" + ",\n".join(f"    {v!r}" for v in rec) + ",\n]")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    log(f"written to {out_path}")

    best = max(range(len(ms)), key=lambda i: (rec[i] >= 0.85, 1.0 / ms[i]))
    qps = round(1000.0 / ms[best], 1)
    return {
        "metric": f"codes_tier_{tag}_qps",
        "value": qps,
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
        "recall_at_10": rec[best],
        "n": n,
        "dim": dim,
        "batch": n_queries,
        "index_device_bytes": idx.index_bytes(),
        "bytes_per_row": round(bytes_row, 1),
        "build_seconds": round(build_s, 1),
        "baseline": "Gist1M HNSW ef=120 multi-threaded CPU, 6514 QPS @ recall 0.8504 (data/t_bench.toml)",
        "note": f"codes-resident tier at {tag} rows on one chip; see {os.path.basename(out_path)}",
    }


def bench_sweep_1m(n: int, k: int, n_queries: int) -> dict:
    """Full Gist1M-shaped sweep: every reference bench config measured on
    one TPU chip against exact on-device ground truth, written incrementally
    to data/t_bench_1M_tpu.toml (the TPU analog of the reference's
    data/t_bench.toml).  Configs (BASELINE.md): HNSW M=16 efc=200 ef sweep;
    HNSW+PQ m=320 n_bits=4 ef sweep; Flat+PQ; binned IVF; exact scan."""
    import jax
    import jax.numpy as jnp

    from lab_1806_vec_db_tpu.models import FlatIndex, HNSWIndex, IVFIndex
    from lab_1806_vec_db_tpu.models.pq_table import PQTable
    from lab_1806_vec_db_tpu.models.store import VecStore
    from lab_1806_vec_db_tpu.ops import pallas_gather as PG
    from lab_1806_vec_db_tpu.utils.config import HNSWConfig, IVFConfig, PQConfig
    from lab_1806_vec_db_tpu.utils.profiling import progress_bar

    dim = 960
    tag = "1M" if n == 1_000_000 else str(n)
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", f"t_bench_{tag}_tpu.toml"
    )
    # BENCH_SWEEP_BLOCKS selects blocks (comma list of scan,hnsw,pq,ivf;
    # default all); results MERGE into the existing TOML by label stem so a
    # partial re-run (e.g. just the PQ block after an OOM) composes with
    # rows measured earlier instead of clobbering them.
    blocks = set(
        os.environ.get("BENCH_SWEEP_BLOCKS", "scan,hnsw,pq,ivf").split(",")
    )

    def _label_key(label: str) -> str:
        return label.split(" (")[0]

    results: list[dict] = []
    if os.path.exists(out_path):
        import tomllib

        with open(out_path, "rb") as f:
            for r in tomllib.load(f).get("results", []):
                results.append({
                    "label": r["label"], "ef": r["ef"], "ms": r["search_time"],
                    "ms_median": r.get("search_time_median", r["search_time"]),
                    "recall": r["recall"],
                    "extra": {kk: vv for kk, vv in r.items()
                              if kk not in ("label", "ef", "search_time",
                                            "search_time_median", "recall")},
                })

    def _merge_row(row: dict) -> None:
        key = _label_key(row["label"])
        for idx, r in enumerate(results):
            if _label_key(r["label"]) == key:
                results[idx] = row
                return
        results.append(row)

    def write_toml():
        lines = [
            f'title = "Gist-spectrum synthetic {tag} x 960 (Gist1M-shaped), single TPU v5e chip, '
            'batch=1000; search_time = ms/query (best of chained rounds, shared chip — '
            'search_time_median alongside; device-resident step timing, host np conversion '
            '+ tunnel sync excluded, DESIGN.md timing methodology); recall@10 vs exact f32 '
            'on-device GT; build_seconds + index_device_bytes recorded per row. '
            'route=scan is the production batched plan (query planner, DESIGN.md 9/9c); '
            'route=graph is the literal beam traversal (reference algorithm)."\n'
        ]
        for r in results:
            lines.append("[[results]]")
            lines.append(f'label = "{r["label"]}"')
            lines.append(f'ef = {r["ef"]}')
            for key, val in r.get("extra", {}).items():
                lines.append(f"{key} = {val!r}")
            ms = ",\n".join(f"    {v!r}" for v in r["ms"])
            md = ",\n".join(f"    {v!r}" for v in r["ms_median"])
            rc = ",\n".join(f"    {v!r}" for v in r["recall"])
            lines.append(f"search_time = [\n{ms},\n]")
            lines.append(f"search_time_median = [\n{md},\n]")
            lines.append(f"recall = [\n{rc},\n]")
            lines.append("")
        with open(out_path, "w") as f:
            f.write("\n".join(lines))

    log(f"dataset: N={n} dim={dim} queries={n_queries} (device-born Gist-spectrum)")
    t0 = time.perf_counter()
    base_dev, queries, n = make_dataset_device(n, dim, n_queries)
    store = VecStore.from_device(base_dev, "l2sqr")
    del base_dev
    flat = FlatIndex.from_store(store)
    log(f"dataset + ingest in {time.perf_counter()-t0:.1f}s")

    q_dev = jnp.asarray(queries)
    t0 = time.perf_counter()
    _, gt = flat._knn_device(q_dev, k, exact=True)
    gt_ids = np.asarray(gt)
    log(f"exact GT in {time.perf_counter()-t0:.1f}s")

    def chained_stats(step, reps=6, rounds=4):
        """Best AND median ms/query over chained rounds (VERDICT r2 weak-7:
        best-of alone is flattering on a shared chip)."""
        times = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            s = jnp.float32(0.0)
            for _ in range(reps):
                d_out, _ = step(q_dev + s * 1e-30)
                s = s + d_out[0, 0] * 1e-30
            np.asarray(s)
            times.append((time.perf_counter() - t0) / reps)
        scale = 1000.0 / n_queries
        return min(times) * scale, float(np.median(times)) * scale

    def sweep_device(label, efs, step, reps=6, rounds=4, extra=None):
        """Time a device-in/device-out step (chained, sync-free).  This is
        the computation the same-named public entry point dispatches (minus
        host np conversion + per-batch tunnel sync — an environment
        artifact; the exclusion is declared in the title)."""
        ms, med, rec = [], [], []
        for ef in efs:
            _, ids = step(q_dev, ef)  # warm/compile + recall
            rec.append(round(recall_at_k(gt_ids, np.asarray(ids), k), 4))
            b, m_ = chained_stats(lambda q, e=ef: step(q, e), reps, rounds)
            ms.append(round(b, 4))
            med.append(round(m_, 4))
            log(f"  {label} ef={ef}: {ms[-1]:.4f} ms/q (med {med[-1]:.4f})  recall@{k}={rec[-1]:.4f}")
        row = {"label": label, "ef": list(efs), "ms": ms,
               "ms_median": med, "recall": rec, "extra": extra or {}}
        _merge_row(row)
        write_toml()
        return row

    def sweep_host(label, efs, fn, reps=3, extra=None):
        """Time a host-API step (returns numpy; batch cost >> tunnel RTT)."""
        ms, med, rec = [], [], []
        for ef in efs:
            _, ids = fn(ef)  # warm/compile + recall
            rec.append(round(recall_at_k(gt_ids, ids, k), 4))
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(ef)
                times.append(time.perf_counter() - t0)
            scale = 1000.0 / n_queries
            ms.append(round(min(times) * scale, 4))
            med.append(round(float(np.median(times)) * scale, 4))
            log(f"  {label} ef={ef}: {ms[-1]:.4f} ms/q (med {med[-1]:.4f})  recall@{k}={rec[-1]:.4f}")
        row = {"label": label, "ef": list(efs), "ms": ms,
               "ms_median": med, "recall": rec, "extra": extra or {}}
        _merge_row(row)
        write_toml()
        return row

    summary: dict = {}

    # -- exact-grade two-stage scan (the headline path) --
    if "scan" in blocks:
        log("[1/6] two-stage scan")
        row = sweep_device("tpu-exact-scan (int8 stage1 + exact f32 rerank)", [0],
                           lambda q, ef: flat._knn_device(q, k), reps=8, rounds=5,
                           extra={"index_device_bytes": flat.index_bytes()})
        summary["scan_qps"] = round(1000.0 / row["ms"][0], 1)
        summary["scan_recall"] = row["recall"][0]

    # -- HNSW build (M=16, efc=200) --
    efs = [120, 150, 180, 240, 360]
    hnsw = None
    if "hnsw" in blocks:
        try:
            # BENCH_HNSW_CACHE=path: save/load the graph TOPOLOGY (vectors
            # stay device-born) so kernel-iteration reruns skip the ~18-min
            # 1M build.  The original build time rides in the npz meta and
            # is reported unchanged — cached reruns re-measure SEARCH, not
            # build.  The dataset is deterministic (same seed), so the
            # topology pairs with the regenerated store exactly.
            cache = os.environ.get("BENCH_HNSW_CACHE", "")
            store.free_search_caches()
            # dataset fingerprint stamped into the cache meta (ADVICE r3 #2):
            # a stale topology from a different seed/shape/config silently
            # pairs wrong links with regenerated vectors and corrupts recall
            fingerprint = f"gist-spectrum seed=0 n={n} dim={dim} dist=l2sqr M=16 efc=200 build_seed=42"
            cached_ok = False
            if cache and os.path.exists(cache):
                from lab_1806_vec_db_tpu.utils import serde as _serde

                arrays, hmeta = _serde.load_arrays(cache)
                if hmeta.get("dataset_fingerprint") == fingerprint:
                    log(f"[2/6] HNSW topology from cache {cache}")
                    hnsw = HNSWIndex.from_state(arrays, hmeta, external_store=store)
                    build_s = float(hmeta.get("build_seconds", 0.0))
                    cached_ok = True
                else:
                    log(f"cache {cache} fingerprint mismatch "
                        f"({hmeta.get('dataset_fingerprint')!r} != {fingerprint!r}); rebuilding")
            if not cached_ok:
                log("[2/6] HNSW build (M=16, efc=200)")
                # drop the scan sweep's mirrors first: the f32 rerank slab +
                # int8 mirror (~4.9 GB at 1M x 960) left resident alongside
                # the build's own working set OOMed a shared 16 GB chip
                # (round-3 first run); every mirror rebuilds lazily on demand
                t0 = time.perf_counter()
                hnsw = HNSWIndex.build_from_store(
                    store, HNSWConfig(ef_construction=200, M=16), seed=42,
                    progress=progress_bar(n, "hnsw-build"),
                )
                build_s = time.perf_counter() - t0
                log(f"build in {build_s:.1f}s ({n/build_s:.0f} vec/s)")
                if cache:
                    arrays, hmeta = hnsw.state(include_vectors=False)
                    hmeta["build_seconds"] = round(build_s, 1)
                    hmeta["dataset_fingerprint"] = fingerprint
                    from lab_1806_vec_db_tpu.utils import serde as _serde

                    _serde.save_arrays(cache, arrays, hmeta)
                    log(f"topology cached to {cache}")
            summary["hnsw_build_seconds"] = round(build_s, 1)
            store.free_scan_mirrors()  # graph sweep needs slab+links, not mirrors

            log("[3/6] HNSW graph route (literal beam traversal)")
            # per-ef traversal telemetry: novel rows scored per query and
            # the 16 ns/row DMA-issue floor they price (DESIGN.md 9c) —
            # one stats batch per ef, recorded alongside the timing so the
            # floor-vs-measured claim stays checkable in the artifact
            rows_scored, floors = [], []
            for ef in efs:
                _, _, rs = hnsw.traversal_stats(queries, k, ef)
                rows_scored.append(int(np.mean(rs)))
                floors.append(round(rows_scored[-1] * 16e-6, 4))
                log(f"  traversal_stats ef={ef}: {rows_scored[-1]} rows/q "
                    f"(floor {floors[-1]:.4f} ms/q)")
            # device-resident chained, like every other 1M row (the title's
            # declared methodology): descent + single-kernel traversal per
            # step; host np conversion/tunnel sync excluded
            row = sweep_device(
                f"tpu-hnsw route=graph M16 efc200 (build {build_s:.0f}s)", efs,
                lambda q, ef: hnsw._graph_knn_device(q, ef)[:2],
                reps=3, rounds=3,
                extra={"build_seconds": round(build_s, 1),
                       "index_device_bytes": hnsw.index_bytes(),
                       "rows_scored_per_query": rows_scored,
                       "dma_floor_ms": floors},
            )
            summary["hnsw_graph_ef120_qps"] = round(1000.0 / row["ms"][0], 1)
            summary["hnsw_graph_ef120_recall"] = row["recall"][0]
        except Exception as e:  # keep later blocks if the build OOMs
            log(f"HNSW build/graph block failed: {e!r}")
            hnsw = None

        log("[4/6] HNSW scan route (production auto plan)")
        row = sweep_device(
            "tpu-hnsw route=scan/auto (ef = stage-1 survivor count)", efs,
            lambda q, ef: FlatIndex.from_store(store)._knn_device(q, k, rerank_depth=ef),
            extra={"index_device_bytes": flat.index_bytes()},
        )
        summary["hnsw_ef120_qps"] = round(1000.0 / row["ms"][0], 1)
        summary["hnsw_ef120_recall"] = row["recall"][0]

    # -- PQ m=320 n_bits=4 (reference flagship quantized config) --
    if "pq" in blocks:
        log("[5/6] PQ train m=320 n_bits=4 (25k sample; see layout note)")
        try:
            # int8 mirror is ~1 GB the PQ blocks never touch (ADC scan +
            # slab rerank); keep headroom on the shared chip
            store.free_scan_mirrors()
            t0 = time.perf_counter()
            # train on the VALID prefix only (ADVICE r2 #1) via n_valid — a
            # [:n] slice of the padded device array would materialize a
            # second 3.85 GB copy (the round-3 PQ-block OOM); padding rows
            # join neither the k-means sample nor the scanned candidate set
            # (len(pq) == n keeps adc_scan's validity mask honest).
            # sample 25k (not the reference's 0.1 proportion = 100k): the
            # vmapped per-group k-means materializes an (m, sample, dsub)
            # temp whose tiny dsub minor dim lane-pads 42x on TPU — at
            # m=320/sample=100k that is a 15.26 GB HLO temp (compile-time
            # OOM).  16 centroids per 3-dim subspace saturate long before
            # 25k points; measured recall is unchanged.
            pq = PQTable.train(
                store.device()[0],
                PQConfig(n_bits=4, m=320, dist="l2sqr", k_means_size=25_000),
                seed=0,
                n_valid=len(store),
            )
            pq_s = time.perf_counter() - t0
            log(f"PQ train+encode in {pq_s:.1f}s (ADC self-test {pq.adc_quality})")
            summary["pq_train_seconds"] = round(pq_s, 1)
            summary["pq_adc_self_test"] = pq.adc_quality

            def pq_scan_step(q, ef, pq=pq):
                lookup, q_norms = pq.create_lookup(q)
                _, cand = pq.adc_scan(lookup, q_norms, max(ef, k))
                return PG.rerank_topk_rs(q, store.device_rerank(), cand, k, store.dist)

            pq_extra = {"build_seconds": round(pq_s, 1),
                        "index_device_bytes": flat.index_bytes() + pq.device_bytes(),
                        "adc_self_test": pq.adc_quality}
            row = sweep_device(
                f"tpu-flat+pq m320 4bit route=scan (ADC scan + exact rerank; train {pq_s:.0f}s)",
                [180, 360, 600], pq_scan_step, reps=3, rounds=3, extra=pq_extra,
            )
            summary["pq_scan_ef180_qps"] = round(1000.0 / row["ms"][0], 1)
            summary["pq_scan_ef180_recall"] = row["recall"][0]
            if hnsw is not None:
                row = sweep_host(
                    "tpu-hnsw+pq m320 4bit route=graph (ADC beam traversal + exact rerank)",
                    [180, 360], lambda ef: hnsw.knn_pq_batch(queries, k, ef, pq, route="graph"),
                    reps=2, extra=pq_extra,
                )
                summary["pq_graph_ef180_qps"] = round(1000.0 / row["ms"][0], 1)
                summary["pq_graph_ef180_recall"] = row["recall"][0]
            row = sweep_device(
                "tpu-hnsw+pq route=mirror/auto (planner: resident int8 mirror beats 4-bit ADC)",
                [180, 360, 600],
                lambda q, ef: FlatIndex.from_store(store)._knn_device(q, k, rerank_depth=ef),
                extra={"index_device_bytes": flat.index_bytes()},
            )
            summary["pq_auto_ef180_qps"] = round(1000.0 / row["ms"][0], 1)
            summary["pq_auto_ef180_recall"] = row["recall"][0]

            # -- PQ m=240 (reference t_bench_pq.toml config) --
            log("[5b/6] PQ train m=240 n_bits=4")
            del pq
            t0 = time.perf_counter()
            pq240 = PQTable.train(
                store.device()[0],
                PQConfig(n_bits=4, m=240, dist="l2sqr", k_means_size=25_000),
                seed=0,
                n_valid=len(store),
            )
            pq240_s = time.perf_counter() - t0
            log(f"PQ m=240 train+encode in {pq240_s:.1f}s "
                f"(ADC self-test {pq240.adc_quality})")
            row = sweep_device(
                f"tpu-flat+pq m240 4bit route=scan (ADC scan + exact rerank; train {pq240_s:.0f}s)",
                [240, 360, 600],
                lambda q, ef, pq=pq240: pq_scan_step(q, ef, pq), reps=3, rounds=3,
                extra={"build_seconds": round(pq240_s, 1),
                       "index_device_bytes": flat.index_bytes() + pq240.device_bytes(),
                       "adc_self_test": pq240.adc_quality},
            )
            summary["pq240_scan_ef240_qps"] = round(1000.0 / row["ms"][0], 1)
            summary["pq240_scan_ef240_recall"] = row["recall"][0]
            del pq240
        except Exception as e:  # keep earlier blocks if PQ OOMs
            log(f"PQ block failed: {e!r}")

    # -- binned IVF --
    if "ivf" in blocks:
        log("[6/6] binned IVF (nlist=256)")
        try:
            hnsw = None  # free the graph before the IVF build
            t0 = time.perf_counter()
            ivf = IVFIndex.from_store(store, IVFConfig(k=256, k_means_max_iter=10), seed=0)
            ivf_s = time.perf_counter() - t0
            log(f"IVF build in {ivf_s:.1f}s")
            row = sweep_device(
                f"tpu-ivf-binned nlist256 (ef = n_probes; build {ivf_s:.0f}s)",
                [2, 4, 8, 16, 32], lambda q, ef: ivf._knn_device_binned(q, k, ef), reps=4, rounds=3,
                extra={"build_seconds": round(ivf_s, 1),
                       "index_device_bytes": ivf.index_bytes()},
            )
            summary["ivf_p4_qps"] = round(1000.0 / row["ms"][1], 1)
            summary["ivf_p4_recall"] = row["recall"][1]
        except Exception as e:
            log(f"IVF block failed: {e!r}")

    qps = (summary.get("hnsw_ef120_qps") or summary.get("scan_qps")
           or summary.get("pq_scan_ef180_qps") or summary.get("ivf_p4_qps") or 0.0)
    return {
        "metric": "hnsw_route_auto_qps_ef120",
        "value": qps,
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
        "recall_at_10": summary.get("hnsw_ef120_recall"),
        "n": n,
        "dim": dim,
        "batch": n_queries,
        "baseline": "Gist1M HNSW ef=120 multi-threaded CPU, 6514 QPS @ recall 0.8504 (data/t_bench.toml)",
        "sweep": summary,
        "note": "full per-config sweep written to data/t_bench_1M_tpu.toml",
    }


def main() -> None:
    mode = os.environ.get("BENCH_MODE", "scan")
    k = int(os.environ.get("BENCH_K", "10"))
    n_queries = int(os.environ.get("BENCH_QUERIES", "1000"))
    if mode == "hnsw":
        n = int(os.environ.get("BENCH_N", "100000"))
        ef = int(os.environ.get("BENCH_EF", "120"))
        result = bench_hnsw(n, k, n_queries, ef)
    elif mode == "sweep":
        n = int(os.environ.get("BENCH_N", "1000000"))
        result = bench_sweep_1m(n, k, n_queries)
    elif mode == "bigivf":
        n = int(os.environ.get("BENCH_N", "2000000"))
        n_probes = int(os.environ.get("BENCH_PROBES", "4"))
        result = bench_ivf_big(n, k, n_queries, n_probes)
    elif mode == "big":
        n = int(os.environ.get("BENCH_N", "4000000"))
        result = bench_sweep_big(n, k, n_queries)
    elif mode == "codes":
        n = int(os.environ.get("BENCH_N", "10000000"))
        result = bench_codes(n, k, n_queries)
    else:
        n = int(os.environ.get("BENCH_N", "1000000"))
        result = bench_scan(n, k, n_queries)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
