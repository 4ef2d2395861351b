"""Synthetic dataset generator for self-contained benchmarking.

The reference benchmarks on Gist1M downloaded from an external host
(README.md dataset section); this environment has no egress, so this tool
generates a deterministic clustered dataset with the same shape
(dim=960 float32) plus exact ground truth, wired for the config/*.toml
sweeps.

Usage:
  python -m lab_1806_vec_db_tpu.bench.synth -n 10000 --prefix data/gist_10000
  # writes <prefix>.local.bin, data/gist_test.bin-compatible queries are
  # reused from the bundled test set when dim == 960.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..utils import io


def make(n: int, dim: int, seed: int = 0, n_clusters: int = 256, spread: float = 0.35):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    return (centers[assign] + spread * rng.standard_normal((n, dim)).astype(np.float32)).astype(np.float32)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, required=True)
    ap.add_argument("-d", "--dim", type=int, default=960)
    ap.add_argument("--prefix", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-q", "--queries", type=int, default=0,
                    help="also write <prefix>_test.local.bin in-distribution queries")
    ap.add_argument("--gnd", default=None, help="also generate ground truth vs this test set")
    ap.add_argument("--gnd-out", default=None)
    args = ap.parse_args(argv)

    base = make(args.n, args.dim, args.seed)
    out = f"{args.prefix}.local.bin"
    io.save_raw(out, base)
    print(f"Wrote {out}: {base.shape}")

    if args.queries:
        # queries from the SAME clustered distribution (perturbed base
        # points) — out-of-distribution queries make quantized search
        # (PQ/IVF) recall meaningless
        rng = np.random.default_rng(args.seed + 1)
        sel = rng.integers(0, args.n, size=args.queries)
        qs = base[sel] + 0.2 * rng.standard_normal((args.queries, args.dim)).astype(np.float32)
        qout = f"{args.prefix}_test.local.bin"
        io.save_raw(qout, qs.astype(np.float32))
        print(f"Wrote {qout}: {qs.shape}")

    if args.gnd:
        from ..models import FlatIndex
        from ..utils.candidates import GroundTruth

        test = io.load_raw(args.gnd, args.dim, "float32")
        index = FlatIndex.from_numpy(base, "l2sqr")
        rows = []
        for s in range(0, len(test), 256):
            _, ids = index.knn_batch(test[s : s + 256], 10, exact=True)
            rows.append(ids)
        gt = GroundTruth(np.concatenate(rows))
        gt.save(args.gnd_out or f"{args.prefix}_gnd.local.npz")
        print(f"Wrote ground truth for {len(test)} queries")


if __name__ == "__main__":
    main()
