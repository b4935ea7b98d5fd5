"""Scale micro-bench for the round-3 session-10 operators: PMI
collocations / inverted-index build+probe / snapshot diff over the
shared 500k-doc corpus, event trigrams over the 2M-row events table,
distributed PCA over a synthetic 500k x 64 embedding table, and
perceptual-hash near-dup over a 30k-row media table (10k images, exact
dup chain planted).

Usage: python tools/bench_ops6.py [--docs 500000] [--events 2000000]
       [--vecs 500000] [--media 30000] [--cpus 32]
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

EMB_DIR = "/tmp/zhtml_ray_bench_emb"


def build_embeddings(n: int, dim: int = 64) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(EMB_DIR, f"n{n}_d{dim}")
    path = os.path.join(d, "embeddings.parquet")
    if os.path.exists(path):
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(11)
    M = rng.standard_normal((n, dim)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(M.ravel()), dim).cast(pa.list_(pa.float32())),
        "label": pa.array([i % 10 for i in range(n)], pa.int32()),
    })
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--vecs", type=int, default=500_000)
    ap.add_argument("--media", type=int, default=30_000)
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
    emb_dir = build_embeddings(args.vecs)

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
        q_event_trigrams, q_pmi_collocations, q_snapshot_diff)

    r = timed("pmi_collocations",
              lambda: q_pmi_collocations(docs_dir).materialize())
    out["pmi_rows"] = r.count()
    timed("snapshot_diff",
          lambda: q_snapshot_diff(docs_dir).materialize())
    timed("event_trigrams",
          lambda: q_event_trigrams(events_dir).materialize())

    from zhtml_ray.functions.corpusstats import bigram_logprob
    timed("bigram_logprob", lambda: bigram_logprob(
        rd.read_parquet(corpus_path, columns=["doc_id", "text"]))
        .materialize())

    from zhtml_ray.functions.retrieval import (build_inverted_index,
                                               inverted_index_lookup)
    idx_dir = "/tmp/zhtml_ray_bench_invidx"
    timed("invidx_build", lambda: build_inverted_index(
        rd.read_parquet(corpus_path, columns=["doc_id", "text"]),
        idx_dir))
    stats: dict = {}
    pr = timed("invidx_probe", lambda: inverted_index_lookup(
        idx_dir, ["hash", "join", "vector", "sort"],
        scan_stats=stats).materialize())
    out["invidx_probe_rows"] = pr.count()
    out["invidx_buckets_read"] = stats["n_buckets_read"]
    out["invidx_buckets_total"] = stats["n_buckets_total"]

    from zhtml_ray.functions.similarity import pca_fit, pca_transform
    emb = rd.read_parquet(f"{emb_dir}/embeddings.parquet")
    comp = timed("pca_fit", lambda: pca_fit(emb, k=4))
    timed("pca_transform",
          lambda: pca_transform(emb, comp).materialize())

    from zhtml_ray.functions.multimodal import (filter_kind,
                                                gen_media_table,
                                                phash_neardup)
    tbl = gen_media_table(args.media, dup_every=10)
    imgs = rd.from_arrow(tbl).map_batches(
        lambda b: filter_kind(b, "image"), batch_format="pyarrow")
    ph = timed("phash_neardup",
               lambda: phash_neardup(imgs).materialize())
    out["phash_pairs"] = ph.count()

    print(json.dumps({"bench": "ops6", "docs": args.docs,
                      "events": args.events, "vecs": args.vecs,
                      "media": args.media, "num_cpus": args.cpus,
                      **out}))
    ray.shutdown()


if __name__ == "__main__":
    main()
