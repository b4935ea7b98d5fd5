"""Scale micro-bench for the round-3 session-6 operators: bm25_topk /
mask_dup_spans / chunk_docs walls on the same synthetic 200k-doc corpus
as tools/bench_dedup.py (identical bytes run to run; ~30% exact-dup
rows, so mask_dup_spans sees a heavy realistic duplicate load).

Usage: python tools/bench_ops3.py [--docs 200000] [--cpus 32]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

from bench_dedup import build_corpus  # noqa: E402  (tools dir)


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

    from zhtml_ray.functions.corpusstats import mask_dup_spans
    from zhtml_ray.functions.retrieval import bm25_topk
    from zhtml_ray.pipelines.ops_queries import _BM25_QUERIES

    walls = {}

    t0 = time.perf_counter()
    top = bm25_topk(rd.read_parquet(path), _BM25_QUERIES, k=10
                    ).materialize()
    walls["bm25_topk"] = {"wall": round(time.perf_counter() - t0, 3),
                          "rows": top.count()}
    del top

    t0 = time.perf_counter()
    masked = mask_dup_spans(rd.read_parquet(path), n=10).materialize()
    walls["mask_dup_spans"] = {"wall": round(time.perf_counter() - t0, 3),
                               "rows": masked.count()}
    del masked

    t0 = time.perf_counter()
    from zhtml_ray.pipelines.ops_queries import chunk_docs_batch  # noqa

    ch = rd.read_parquet(path).map_batches(
        chunk_docs_batch, batch_format="pyarrow").materialize()
    walls["chunk_docs"] = {"wall": round(time.perf_counter() - t0, 3),
                           "rows": ch.count()}
    del ch

    print(json.dumps({"docs": args.docs, "cpus": args.cpus,
                      "load1": round(os.getloadavg()[0], 2), **walls}))
    ray.shutdown()


if __name__ == "__main__":
    main()
