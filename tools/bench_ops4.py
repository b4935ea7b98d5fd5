"""Scale micro-bench for the round-3 session-8 operators: the window /
distinct / sketch family over a synthetic 2M-row events table, and the
document ops (shuffle_order / incremental_dedup / word_freq_cms) over
the shared 500k-doc corpus (tools/bench_dedup.build_corpus — identical
bytes run to run, ~30% exact-dup rows for the dedup path).

The events table is deterministic (seeded numpy; ts spread over one
year, 20k users so per-user groups are real, 5 event types).

Usage: python tools/bench_ops4.py [--events 2000000] [--docs 500000]
       [--cpus 32]
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

EVENTS_DIR = "/tmp/zhtml_ray_bench_events"


def build_events(n: int) -> str:
    """Deterministic synthetic events table, written once per size,
    laid out as <dir>/events.parquet so the sf_dir-style query
    callables run on it unchanged."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(EVENTS_DIR, f"n{n}")
    path = os.path.join(d, "events.parquet")
    if os.path.exists(path):
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(11)
    base = np.int64(1_700_000_000_000_000)  # epoch µs
    ts = base + rng.randint(0, 365 * 86400, n).astype(np.int64) * 1_000_000
    types = np.asarray(["signup", "view", "click", "purchase", "scroll"],
                       object)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.randint(0, 20_000, n).astype(np.int64)),
        "event_type": pa.array(types[rng.randint(0, 5, n)].tolist(),
                               pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 1000, n), 2)),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    ev_dir = build_events(args.events)
    docs_path = build_corpus(args.docs)
    # docs ops want a documents.parquet dir with a source column
    docs_dir = os.path.join("/tmp/zhtml_ray_bench_docs", f"n{args.docs}")
    dp = os.path.join(docs_dir, "documents.parquet")
    if not os.path.exists(dp):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        os.makedirs(docs_dir, exist_ok=True)
        t = pq.read_table(docs_path)
        src = pc.binary_join_element_wise(
            "src", pc.cast(pc.bit_wise_and(t["doc_id"], 15), pa.string()),
            "")
        tmp = dp + f".tmp.{os.getpid()}"
        pq.write_table(t.append_column("source", src), tmp)
        os.replace(tmp, dp)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False)

    from zhtml_ray.pipelines.ops_queries import (
        CMS_D, CMS_LOG2W, CMS_PROBES, q_events_distinct_users,
        q_events_funnel, q_events_moving_avg, q_events_value_rank,
        q_incremental_dedup, q_shuffle_order)

    walls = {}

    def run(name, fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        if hasattr(out, "materialize"):
            out = out.materialize()
            rows = out.count()
        else:
            rows = len(out)
        walls[name] = {"wall": round(time.perf_counter() - t0, 3),
                       "rows": rows}

    run("events_value_rank", q_events_value_rank, ev_dir)
    run("events_moving_avg", q_events_moving_avg, ev_dir)
    run("events_funnel", q_events_funnel, ev_dir)
    run("events_distinct_users", q_events_distinct_users, ev_dir)

    import ray.data as rd
    from zhtml_ray.functions.sketch import approx_distinct, cms_probe_freqs
    run("approx_distinct_users", lambda d: approx_distinct(
        rd.read_parquet(f"{d}/events.parquet",
                        columns=["event_type", "user_id"]),
        "event_type", "user_id", 12), ev_dir)

    run("shuffle_order", q_shuffle_order, docs_dir)
    run("incremental_dedup", q_incremental_dedup, docs_dir)
    run("word_freq_cms", lambda d: cms_probe_freqs(
        rd.read_parquet(f"{d}/documents.parquet", columns=["text"]),
        list(CMS_PROBES), CMS_LOG2W, CMS_D), docs_dir)

    print(json.dumps({"events": args.events, "docs": args.docs,
                      "num_cpus": args.cpus, "walls": walls}))
    ray.shutdown()


if __name__ == "__main__":
    main()
