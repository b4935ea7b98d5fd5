"""Tracked per-round bench of the 10 most expensive LLM-pipeline ops
(r3 VERDICT item 7): regressions in the ops family become visible
round-over-round, not just the extract headline.

    python tools/bench_ops.py [sf_dir] [out.json]

Writes one JSON object (op → wall seconds + rows) to out.json
(default BENCH_OPS_r04.json at the repo root) and prints it. Times
come from the queries() registry callables, i.e. exactly what the
driver runs; web_pipeline uses the computation-only form (no
oracle-golden side effect). Run on a quiet host (±30% steal swings,
CLAUDE.md).
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OPS = [
    "web_pipeline", "mask_dup_spans", "minhash_dedup", "paragraph_dedup",
    "inverted_index", "bpe_merges", "link_pagerank", "decontaminate",
    "semantic_dedup", "pq_topk",
]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(ROOT, "BENCH_OPS_r04.json")
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry
    from zhtml_ray.pipelines.ops_queries import web_pipeline_ds
    qs = entry.queries()

    def run(name):
        fn = (lambda s: web_pipeline_ds(s)) if name == "web_pipeline" \
            else qs[name]
        t0 = time.perf_counter()
        out = fn(sf)
        n = out.count() if hasattr(out, "count") and not hasattr(out, "iloc") \
            else len(out)
        return round(time.perf_counter() - t0, 2), int(n)

    results = {}
    for name in OPS:
        # warmup pass first: several queries() callables build their
        # DuckDB oracle goldens on first call after a source change
        # (persistent digest-keyed cache) — that one-time scaffolding
        # cost must not pollute the tracked engine wall times
        run(name)
        wall, n = run(name)
        results[name] = {"wall_s": wall, "rows": n}
        print(json.dumps({"op": name, "wall_s": wall, "rows": n}))

    doc = {"sf_dir": sf,
           "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
           "total_s": round(sum(r["wall_s"] for r in results.values()), 1),
           "ops": results}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    ray.shutdown()


if __name__ == "__main__":
    main()
