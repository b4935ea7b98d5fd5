"""Scale micro-bench for the round-3 session-9 operators: graph ops
(PageRank / connected components / degree histogram) over a synthetic
power-law edge list, and the text/window additions (tfidf_top_terms /
top_words / events_retention / events_ntile / user_event_path) over
the shared 500k-doc corpus and 2M-row events table.

The edge list is deterministic (seeded numpy): V nodes, E edges with
Zipf-ish in-degree skew (dst drawn from a squared-uniform index so a
few hosts take most in-links — the real web's shape and the shuffle's
worst case).

Usage: python tools/bench_ops5.py [--edges 2000000] [--nodes 200000]
       [--events 2000000] [--docs 500000] [--cpus 32]
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


def build_edges(n_edges: int, n_nodes: int) -> str:
    """Deterministic skewed (src, dst) edge parquet; distinct rows."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(EDGES_DIR, f"e{n_edges}_v{n_nodes}")
    path = os.path.join(d, "edges.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(7)
    src = rng.randint(0, n_nodes, n_edges)
    # squared uniform → heavy in-degree head (hot-host worst case)
    dst = (rng.random_sample(n_edges) ** 2 * n_nodes).astype(np.int64)
    keep = src != dst
    pairs = np.unique(
        np.stack([src[keep], dst[keep]], axis=1), axis=0)
    t = pa.table({
        "src": pa.array([f"https://h{s}.ex/" for s in pairs[:, 0]]),
        "dst": pa.array([f"https://h{d_}.ex/" for d_ in pairs[:, 1]]),
    })
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--nodes", type=int, default=200_000)
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    edges_path = build_edges(args.edges, args.nodes)
    events_dir = build_events(args.events)
    # sf_dir-style layout for the documents queries: one dir holding
    # exactly <dir>/documents.parquet (hard-link into the shared cache)
    corpus_path = build_corpus(args.docs)
    docs_dir = os.path.join(os.path.dirname(corpus_path),
                            f"sfdir_{args.docs}")
    os.makedirs(docs_dir, exist_ok=True)
    link = os.path.join(docs_dir, "documents.parquet")
    if not os.path.exists(link):
        os.link(corpus_path, link)

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

    from zhtml_ray.functions.graph import degree_histogram, pagerank
    from zhtml_ray.functions.dedup import label_propagation

    def read_edges():
        return rd.read_parquet(edges_path)

    pr = timed("pagerank_5it", lambda: pagerank(read_edges())
               .materialize())
    out["pagerank_nodes"] = pr.count()

    cc = timed("components", lambda: label_propagation(
        read_edges().map_batches(
            lambda b: b.rename_columns(["key_a", "key_b"]),
            batch_format="pyarrow")).materialize())
    out["component_rows"] = cc.count()

    timed("degree_hist", lambda: degree_histogram(read_edges())
          .materialize())

    from zhtml_ray.pipelines.ops_queries import (
        q_events_ntile, q_events_retention, q_tfidf_top_terms,
        q_top_words, q_user_event_path)

    timed("events_retention", lambda: q_events_retention(events_dir)
          .materialize())
    timed("events_ntile", lambda: q_events_ntile(events_dir)
          .materialize())
    timed("user_event_path", lambda: q_user_event_path(events_dir)
          .materialize())
    timed("top_words", lambda: q_top_words(docs_dir).materialize())
    timed("tfidf_top_terms", lambda: q_tfidf_top_terms(docs_dir)
          .materialize())

    print(json.dumps({"bench": "ops5", "edges": args.edges,
                      "nodes": args.nodes, "events": args.events,
                      "docs": args.docs, "cpus": args.cpus, **out}))
    ray.shutdown()


if __name__ == "__main__":
    main()
