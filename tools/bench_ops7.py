"""Scale micro-bench for the round-3 session-11 operators:
heavy-hitter bigrams / perplexity buckets / snapshot upsert /
fuzzy join over the shared dedup-bench corpus, interval join /
pivot / melt / windowed dedup over the events table, and HITS over a
synthetic edge table big enough to force the distributed tier.

Usage: python tools/bench_ops7.py [--docs 200000] [--events 2000000]
       [--edges 3000000] [--cpus 32]
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
from bench_ops4 import build_events  # noqa: E402  (tools dir)

EDGES_DIR = "/tmp/zhtml_ray_bench_edges"


def build_edges(n: int, n_nodes: int = 300_000) -> str:
    """Deterministic synthetic (src, dst) edge table with a Zipf-ish
    in-degree skew (a few mega-authorities)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(EDGES_DIR, f"n{n}")
    path = os.path.join(d, "edges.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(7)
    src = rng.randint(0, n_nodes, n)
    # skew: 20% of edges point at 100 hot authorities
    dst = rng.randint(0, n_nodes, n)
    hot = rng.rand(n) < 0.2
    dst[hot] = rng.randint(0, 100, int(hot.sum()))
    keep = src != dst
    t = pa.table({
        "src": pa.array([f"n{x}" for x in src[keep]], pa.string()),
        "dst": pa.array([f"n{x}" for x in dst[keep]], pa.string())})
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--edges", type=int, default=3_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    corpus_path = build_corpus(args.docs)
    docs_dir = os.path.join(os.path.dirname(corpus_path),
                            f"sfdir_{args.docs}")
    os.makedirs(docs_dir, exist_ok=True)
    link = os.path.join(docs_dir, "documents.parquet")
    if not os.path.exists(link):
        os.link(corpus_path, link)
    events_dir = build_events(args.events)
    edges_path = build_edges(args.edges)

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=args.cpus,
             include_dashboard=False, ignore_reinit_error=True)

    out: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        out[name] = round(time.perf_counter() - t0, 3)
        return r

    from zhtml_ray.pipelines.ops_queries import (
        fuzzy_best_match, q_event_dedup_window, q_event_melt,
        q_event_pivot, q_heavy_hitters, q_ppl_buckets,
        q_snapshot_upsert, q_window_join)

    hh = timed("heavy_hitters", lambda: q_heavy_hitters(docs_dir))
    out["hh_rows"] = hh.num_rows
    timed("ppl_buckets",
          lambda: q_ppl_buckets(docs_dir).materialize())
    timed("snapshot_upsert",
          lambda: q_snapshot_upsert(docs_dir).materialize())
    fz = timed("fuzzy_join", lambda: fuzzy_best_match(
        rd.read_parquet(corpus_path, columns=["doc_id", "text"]))
        .materialize())
    out["fuzzy_rows"] = fz.count()

    timed("window_join",
          lambda: q_window_join(events_dir).materialize())
    timed("event_pivot",
          lambda: q_event_pivot(events_dir).materialize())
    timed("event_melt",
          lambda: q_event_melt(events_dir).materialize())
    timed("event_dedup_window",
          lambda: q_event_dedup_window(events_dir).materialize())

    from zhtml_ray.functions.graph import hits
    h = timed("hits", lambda: hits(
        rd.read_parquet(edges_path)).materialize())
    out["hits_nodes"] = h.count()

    print(json.dumps({"bench": "ops7", "docs": args.docs,
                      "events": args.events, "edges": args.edges,
                      "num_cpus": args.cpus, **out}))
    ray.shutdown()


if __name__ == "__main__":
    main()
