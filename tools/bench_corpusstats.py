"""Corpus-stats-at-scale micro-bench: dup_ngrams / rep_signals /
vocab_df walls on the same synthetic 200k-doc corpus as
tools/bench_dedup.py (reused builder, identical bytes run to run).

Usage: python tools/bench_corpusstats.py [--docs 200000] [--cpus 32]
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
    from zhtml_ray.functions.corpusstats import (dup_ngrams,
                                                 rep_signals_batch,
                                                 unigram_logprob,
                                                 vocab_doc_freq)

    walls = {}

    t0 = time.perf_counter()
    rep = rd.read_parquet(path).map_batches(
        rep_signals_batch, batch_format="pyarrow").materialize()
    walls["rep_signals"] = {"wall": round(time.perf_counter() - t0, 3),
                            "rows": rep.count()}
    del rep

    t0 = time.perf_counter()
    vdf = vocab_doc_freq(rd.read_parquet(path), k=100).materialize()
    walls["vocab_df"] = {"wall": round(time.perf_counter() - t0, 3),
                         "rows": vdf.count()}
    del vdf

    t0 = time.perf_counter()
    dng = dup_ngrams(rd.read_parquet(path), n=5).materialize()
    walls["dup_ngrams"] = {"wall": round(time.perf_counter() - t0, 3),
                           "rows": dng.count()}
    del dng

    t0 = time.perf_counter()
    ulp = unigram_logprob(rd.read_parquet(path)).materialize()
    walls["unigram_logprob"] = {
        "wall": round(time.perf_counter() - t0, 3), "rows": ulp.count()}
    del ulp

    print(json.dumps({
        "metric": "corpusstats_walls", "unit": "sec",
        "docs": args.docs, "num_cpus": args.cpus, "queries": walls,
        "docs_per_s_dup_ngrams": round(
            args.docs / walls["dup_ngrams"]["wall"], 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
