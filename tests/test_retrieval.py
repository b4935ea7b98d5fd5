"""BM25 retrieval: serial brute-force differential + edge cases."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from zhtml_ray.functions.retrieval import B, K1, bm25_topk


def _brute(texts, ids, queries, k=10):
    """Independent serial BM25 (Counter-based, no shared code with the
    engine kernel beyond the formula)."""
    words = [t.split() for t in texts]
    n = len(texts)
    avgdl = sum(len(w) for w in words) / n if n else 0.0
    out = []
    for qid, qtext in queries:
        terms = sorted(set(qtext.split()))
        scores = {}
        for t in terms:
            df = sum(1 for w in words if t in w)
            if df == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for did, w in zip(ids, words):
                tf = Counter(w)[t]
                if tf:
                    dl = float(len(w))
                    scores[did] = scores.get(did, 0.0) + (
                        idf * tf * (K1 + 1.0)
                        / (tf + K1 * (1.0 - B + B * dl / avgdl)))
        pinned = {d: math.floor(s * 1e6 + 0.5) / 1e6
                  for d, s in scores.items()}
        top = sorted(pinned.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend((qid, d, s) for d, s in top)
    return sorted(out)


def _ds(texts, ids, nblocks):
    import ray.data as rd
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    return rd.from_arrow(tbl).repartition(nblocks)


@pytest.mark.parametrize("nblocks", [1, 7])
def test_bm25_matches_brute_force(ray_session, nblocks):
    rng = np.random.default_rng(42)
    vocab = ["hash", "join", "merge", "sort", "scan", "filter", "agg",
             "window", "key", "row"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 30)))
             for _ in range(120)]
    texts[5] = ""                       # empty doc
    ids = list(range(1000, 1000 + len(texts)))
    queries = [(0, "hash join"), (1, "sort sort window"), (2, "filter")]

    got = bm25_topk(_ds(texts, ids, nblocks), queries, k=10).take_all()
    got = sorted((r["query_id"], r["doc_id"], r["score"]) for r in got)
    assert got == _brute(texts, ids, queries, k=10)


def test_bm25_absent_term_and_small_corpus(ray_session):
    texts = ["alpha beta", "beta beta gamma", "delta"]
    ids = [1, 2, 3]
    queries = [(7, "beta"), (8, "nosuchword"), (9, "alpha nosuchword")]
    rows = bm25_topk(_ds(texts, ids, 2), queries, k=10).take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # absent term: query 8 yields nothing; query 9 still scores via alpha
    assert 8 not in by_q
    assert [r["doc_id"] for r in by_q[9]] == [1]
    # query 7: doc 2 (tf=2, shorter-normalized) outranks doc 1
    q7 = sorted(by_q[7], key=lambda r: -r["score"])
    assert [r["doc_id"] for r in q7] == [2, 1]
    assert got_match_brute(texts, ids, queries, rows)


def got_match_brute(texts, ids, queries, rows):
    got = sorted((r["query_id"], r["doc_id"], r["score"]) for r in rows)
    return got == _brute(texts, ids, queries, k=10)


def test_bm25_tie_breaks_on_doc_id(ray_session):
    # identical docs -> identical scores -> doc_id ascending wins at k
    texts = ["tie word common"] * 8
    ids = [30, 10, 50, 20, 70, 60, 40, 80]
    rows = bm25_topk(_ds(texts, ids, 3), [(0, "tie")], k=4).take_all()
    assert sorted(r["doc_id"] for r in rows) == [10, 20, 30, 40]
    assert len({round(r["score"], 6) for r in rows}) == 1


def test_inverted_index_round_trip(ray_session, tmp_path):
    """Postings built distributed over many tiny blocks (hot stopword
    straddles every block edge) must equal an independent dict
    reference exactly — term set, df, ascending doc order, per-doc tf
    — and a probe must open only its terms' bucket partitions."""
    from collections import Counter, defaultdict

    from zhtml_ray.functions.retrieval import (build_inverted_index,
                                               inverted_index_lookup)

    rng = np.random.default_rng(11)
    vocab = ["the"] + [f"w{i}" for i in range(40)]
    texts = [" ".join(["the"] + rng.choice(
        vocab, size=rng.integers(0, 25)).tolist()) for _ in range(200)]
    texts += ["", "   ", None]
    ids = list(range(len(texts)))
    out = str(tmp_path / "idx")
    build_inverted_index(_ds(texts, ids, 13), out)

    ref = defaultdict(Counter)
    for i, t in zip(ids, texts):
        for w in (t or "").split():
            ref[w][i] += 1

    stats = {}
    rows = inverted_index_lookup(
        out, ["the", "w0", "w17", "absent_zz"],
        scan_stats=stats).take_all()
    assert stats["n_buckets_read"] < stats["n_buckets_total"]
    got = {r["term"]: r for r in rows}
    assert set(got) == {"the", "w0", "w17"}
    for term, r in got.items():
        want = sorted(ref[term].items())
        assert r["df"] == len(want)
        assert r["doc_ids"] == [d for d, _ in want]  # ascending
        assert r["tfs"] == [c for _, c in want]
    assert got["the"]["df"] == 200  # the hot term spans every block
