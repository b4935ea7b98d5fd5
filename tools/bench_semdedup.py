"""Scale micro-bench for the SemDeDup path: kmeans_fit (distributed
Lloyd branch) + semantic_dedup wall on a deterministic synthetic
embedding corpus large enough to exercise the per-round partial-sum
reduce and the per-cluster greedy dedup at realistic cluster sizes.

Corpus: ``--docs`` 64-dim vectors drawn around ``--docs/3000`` planted
centers (seeded), with 25% of rows exact-noise copies of an earlier
row (cos ≳ 0.999) so the dedup pass carries a realistic duplicate
load. Identical bytes run to run.

Usage: python tools/bench_semdedup.py [--docs 200000] [--cpus 32]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CORPUS = "/tmp/zhtml_ray_semdedup_bench"


def build_corpus(n: int, dim: int = 64) -> str:
    path = os.path.join(CORPUS, f"emb_{n}_{dim}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(CORPUS, exist_ok=True)
    rng = np.random.RandomState(13)
    n_centers = max(8, n // 3000)
    centers = rng.standard_normal((n_centers, dim)).astype(np.float32)
    base = centers[rng.randint(0, n_centers, n)] + \
        rng.standard_normal((n, dim)).astype(np.float32) * 0.25
    dup_of = rng.randint(0, n, n)
    is_dup = (np.arange(n) % 4 == 3) & (dup_of < np.arange(n))
    base[is_dup] = base[dup_of[is_dup]] + \
        rng.standard_normal((int(is_dup.sum()), dim)).astype(np.float32) * 1e-3
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([r.tolist() for r in base],
                              pa.list_(pa.float32()))}), tmp)
    os.replace(tmp, path)
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    path = build_corpus(args.docs)

    import ray
    import ray.data as rd
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False)

    from zhtml_ray.functions.similarity import kmeans_fit, semantic_dedup

    k = max(16, args.docs // 3000)
    t0 = time.perf_counter()
    kmeans_fit(rd.read_parquet(path), n_centroids=k, iters=10,
               driver_budget_rows=1024)  # force the distributed branch
    fit_wall = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    out = semantic_dedup(rd.read_parquet(path), threshold=0.99,
                         n_centroids=k, iters=10).materialize()
    dd_wall = round(time.perf_counter() - t0, 3)
    n_dropped = out.filter(expr="kept == False").count()

    print(json.dumps({
        "docs": args.docs, "cpus": args.cpus, "n_centroids": k,
        "load1": round(os.getloadavg()[0], 2),
        "kmeans_fit_wall": fit_wall,
        "semantic_dedup_wall": dd_wall,
        "rows": out.count(), "dropped": n_dropped}))
    ray.shutdown()


if __name__ == "__main__":
    main()
