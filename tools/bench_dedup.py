"""Dedup-at-scale micro-bench: minhash_dedup wall on a synthetic 200k-doc
corpus (VERDICT r2 item 2 asks for a measured wall improvement of the
vectorized shuffle ops on a >=200k-doc run, recorded in BENCH/BASELINE.md).

Corpus: sf0.1 documents (5k rows) expanded 40x deterministically —
30% of rows are exact copies of their base doc (near-dup clusters of
~12), the rest get a seeded word shuffle + unique salt tokens so their
pairwise Jaccard stays low. Same corpus bytes for old and new code.

Usage: python tools/bench_dedup.py [--docs 200000] [--cpus 32]
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

CORPUS = "/tmp/zhtml_ray_dedup_bench"


def build_corpus(n_docs: int) -> str:
    path = os.path.join(CORPUS, f"docs_{n_docs}")
    if os.path.exists(path):
        return path
    os.makedirs(CORPUS, exist_ok=True)
    base = pq.read_table("/root/testdata/sf0.1/documents.parquet",
                         columns=["doc_id", "text"])
    texts = base["text"].to_pylist()
    nb = len(texts)
    rng = np.random.RandomState(7)
    out_ids, out_txt = [], []
    for i in range(n_docs):
        t = texts[i % nb] or ""
        if i % 10 < 3:  # exact duplicate of the base doc
            out_txt.append(t)
        else:  # seeded shuffle + salt: low Jaccard vs everything
            w = t.split()
            rng2 = np.random.RandomState(i)
            rng2.shuffle(w)
            w.insert(0, f"salt{i}")
            w.append(f"tok{i * 31}")
            out_txt.append(" ".join(w))
        out_ids.append(i)
    tmp = path + f".tmp.{os.getpid()}"
    # 32 SHARD FILES: Ray's fused read→minhash stage parallelizes at
    # file granularity on this version (row-group splitting measured
    # a no-op), and the pipeline reads the corpus more than once
    # (candidates / verify / assign) — the old single file serialized
    # ~12 s of decode+hash onto one task per read at 500k, a
    # bench-harness artifact no sharded real corpus has.
    os.makedirs(tmp, exist_ok=True)
    t = pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                  "text": pa.array(out_txt, pa.string())})
    n_shards = 32
    per = -(-t.num_rows // n_shards)
    for s in range(n_shards):
        sl = t.slice(s * per, per)
        if sl.num_rows:
            pq.write_table(sl, os.path.join(tmp, f"part-{s:04d}.parquet"))
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
    from zhtml_ray.functions.dedup import minhash_dedup

    import pyarrow.compute as pc

    ds = rd.read_parquet(path)
    t0 = time.perf_counter()
    # materialize ONCE and count/sum from the materialized result — a
    # bare count() + row-lambda filter re-executed the assignment
    # pipeline twice and inflated the recorded walls (r3 review)
    out = minhash_dedup(ds, key="doc_id", col="text").materialize()
    n = out.count()
    n_dup = int(out.map_batches(
        lambda b: pa.table({"d": [pc.sum(pc.cast(b["is_dup"],
                                                 pa.int64())).as_py() or 0]}),
        batch_format="pyarrow").sum("d") or 0)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "metric": "minhash_dedup_wall", "value": round(wall, 3),
        "unit": "sec", "docs": args.docs, "rows_out": n, "n_dup": n_dup,
        "docs_per_s": round(args.docs / wall, 1), "num_cpus": args.cpus,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
