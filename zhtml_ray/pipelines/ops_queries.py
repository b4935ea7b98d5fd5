"""Driver-contract queries for the training-data operators (dedup,
similarity, text analysis, multimodal, event windows) over the
driver-provided tables (documents / embeddings / events)."""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _docs(sf_dir, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _emb(sf_dir):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


# ----------------------------------------------------------- text analysis

def q_token_count(sf_dir: str):
    from zhtml_ray.functions.textstats import token_count_batch
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(token_count_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_tokens"])


SQL_TOKEN_COUNT = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
           ::BIGINT AS n_tokens
FROM documents
"""


def q_quality(sf_dir: str):
    from zhtml_ray.functions.textstats import QualityScore
    ds = _docs(sf_dir, ["doc_id", "text", "lang"])
    out = ds.map_batches(QualityScore, batch_format="pyarrow", concurrency=2)
    return out.select_columns(["doc_id", "n_words", "quality_score",
                               "stopword_ratio", "punct_ratio"])


def q_langid(sf_dir: str):
    from zhtml_ray.functions.textstats import LangId
    ds = _docs(sf_dir, ["doc_id", "text", "lang"])
    out = ds.map_batches(LangId, batch_format="pyarrow", concurrency=2)
    return out.select_columns(["doc_id", "lang", "lang_pred", "lang_conf"])


def q_fingerprint(sf_dir: str):
    from zhtml_ray.functions.textstats import Fingerprint
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(Fingerprint, batch_format="pyarrow", concurrency=2)
    return out.select_columns(["doc_id", "fingerprint", "content_hash"])


def q_bpe_token_count(sf_dir: str):
    from zhtml_ray.functions.textstats import BpeTokenCount
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(BpeTokenCount, batch_format="pyarrow", concurrency=2)
    return out.select_columns(["doc_id", "n_bpe_tokens"])


# ------------------------------------------------------------------- dedup

def q_exact_dedup(sf_dir: str):
    """Exact dedup: keep min doc_id per distinct text (SQL-oracled)."""
    from zhtml_ray.functions.dedup import exact_dedup
    ds = _docs(sf_dir, ["doc_id", "text"])
    kept = exact_dedup(ds, col="text", key="doc_id")
    return kept.select_columns(["doc_id"])


SQL_EXACT_DEDUP = """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
"""


def q_minhash_dedup(sf_dir: str):
    from zhtml_ray.functions.dedup import minhash_dedup
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = minhash_dedup(ds, key="doc_id", col="text")
    return out.select_columns(["doc_id", "cluster", "is_dup"])


def q_simhash(sf_dir: str):
    from zhtml_ray.functions.dedup import SimHashBatch
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(SimHashBatch, batch_format="pyarrow", concurrency=2)
    return out.select_columns(["doc_id", "simhash", "simhash_b0"])


def q_embedding_neardup(sf_dir: str):
    """Near-dup over embeddings ∪ perturbed copies (vec_id+10⁶, small
    seeded noise) so the operator demonstrably finds the planted pairs —
    random vectors alone have no near-dups."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from zhtml_ray.functions.dedup import embedding_neardup

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t["vec_id"].to_pylist())
    emb = np.asarray(t["embedding"].to_pylist(), np.float32)
    rng = np.random.RandomState(42)
    take = ids % 10 == 0  # every 10th vector gets a near-duplicate
    dup_emb = emb[take] + rng.standard_normal(emb[take].shape).astype(
        np.float32) * 0.01
    dup = pa.table({
        "vec_id": pa.array((ids[take] + 1_000_000).tolist(), pa.int64()),
        "embedding": pa.array([r.tolist() for r in dup_emb],
                              t.schema.field("embedding").type),
        "label": pa.array([0] * int(take.sum()), pa.int32()),
    })
    ds = rd.from_arrow(t).union(rd.from_arrow(dup))
    out = embedding_neardup(ds, key="vec_id", col="embedding", threshold=0.98)
    return out.select_columns(["key_a", "key_b"])


# -------------------------------------------------------------- similarity

def _query_vectors(sf_dir, n=5):
    import pyarrow.parquet as pq
    import numpy as np
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vecs = t.sort_by("vec_id")["embedding"].to_pylist()[:n]
    return np.asarray(vecs, np.float64)


def q_ann_topk(sf_dir: str):
    """Exact brute-force cosine top-10 for the first 5 vectors as
    queries; returns (query_id, vec_id) ranked — floats dropped so the
    oracle hash is stable across engines."""
    from zhtml_ray.functions.similarity import brute_force_topk
    q = _query_vectors(sf_dir, 5)
    out = brute_force_topk(_emb(sf_dir), q, k=10)
    return out[["query_id", "vec_id"]]


SQL_ANN_TOPK = """
WITH q AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS query_id, embedding AS qv
  FROM embeddings ORDER BY vec_id LIMIT 5
)
SELECT query_id::INTEGER AS query_id, vec_id
FROM q CROSS JOIN embeddings e
QUALIFY row_number() OVER (
  PARTITION BY query_id
  ORDER BY list_cosine_similarity(qv, e.embedding) DESC, vec_id) <= 10
"""


def q_ivf_topk(sf_dir: str):
    from zhtml_ray.functions.similarity import ivf_topk
    q = _query_vectors(sf_dir, 5)
    out = ivf_topk(_emb(sf_dir), q, k=10, n_probe=4, n_centroids=8)
    return out[["query_id", "vec_id"]]


# ------------------------------------------------------------ event windows

def q_events_window(sf_dir: str):
    """Tumbling 1-hour window per user: pre-aggregated inside map_batches
    (partial combine), then a small groupby — the at-scale aggregation
    pattern (windowed aggregate over a stream-shaped table)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        secs = pc.divide(pc.cast(batch["ts"], pa.int64()), 1_000_000)
        w = pc.cast(pc.floor(pc.divide(pc.cast(secs, pa.float64()), 3600.0)),
                    pa.int64())
        batch = batch.append_column("w", w)
        t = batch.group_by(["user_id", "w"]).aggregate([
            ("value", "sum"), ("value", "count")])
        return t.rename_columns(["user_id", "w", "p_sum", "p_n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["user_id", "w"]).aggregate(
        Sum("p_sum", alias_name="sum_value"),
        Sum("p_n", alias_name="n_events"))
    return agg


SQL_EVENTS_WINDOW = """
SELECT user_id,
       CAST(floor(epoch(ts) / 3600) AS BIGINT) AS w,
       sum(value) AS sum_value,
       count(*) AS n_events
FROM events GROUP BY 1, 2
"""


def q_events_sessionize(sf_dir: str):
    """Session windows (30-min inactivity gap) per user:
    groupby(user).map_groups over ts-sorted events (the guide's
    streaming-shaped pattern)."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff().dt.total_seconds().fillna(1e18)
        sid = (gap > 1800).cumsum()
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "count"),
        ).reset_index(drop=True)
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


SQL_EVENTS_SESSIONIZE = """
WITH t AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, event_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM t
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
"""


# -------------------------------------------------------------- multimodal

def _media_rows_for(sf_dir: str) -> int:
    return {"sf0.001": 60, "sf0.01": 300, "sf0.1": 1500}.get(
        __import__("os").path.basename(
            __import__("os").path.normpath(sf_dir)), 60)


def q_media_features(sf_dir: str):
    import ray.data as rd
    from zhtml_ray.functions.multimodal import ImageFeatures, gen_media_table
    tbl = gen_media_table(_media_rows_for(sf_dir))
    ds = rd.from_arrow(tbl)
    return ds.map_batches(ImageFeatures, batch_format="pyarrow",
                          batch_size=32, concurrency=2)


def q_frame_sample(sf_dir: str):
    import ray.data as rd
    from zhtml_ray.functions.multimodal import FrameSampler, gen_media_table
    tbl = gen_media_table(_media_rows_for(sf_dir))
    ds = rd.from_arrow(tbl)
    return ds.map_batches(FrameSampler(fps=1.0), batch_format="pyarrow",
                          batch_size=32)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "token_count": q_token_count,
        "bpe_token_count": q_bpe_token_count,
        "quality_score": q_quality,
        "lang_id": q_langid,
        "fingerprint": q_fingerprint,
        "exact_dedup": q_exact_dedup,
        "minhash_dedup": q_minhash_dedup,
        "simhash": q_simhash,
        "embedding_neardup": q_embedding_neardup,
        "ann_topk": q_ann_topk,
        "ivf_topk": q_ivf_topk,
        "events_window": q_events_window,
        "events_sessionize": q_events_sessionize,
        "media_features": q_media_features,
        "frame_sample": q_frame_sample,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "token_count": SQL_TOKEN_COUNT,
        "exact_dedup": SQL_EXACT_DEDUP,
        "ann_topk": SQL_ANN_TOPK,
        "events_window": SQL_EVENTS_WINDOW,
        "events_sessionize": SQL_EVENTS_SESSIONIZE,
    }
