"""Skew defusal for mega-HTML documents (SURVEY.md §4.3; north_star:
"explicit repartitioning and salt-key redistribution to defuse skew").

Parse cost is ∝ html bytes (one state step per input char), so a 50 MB
document is ~10⁴× a median page. Strategy:

  * route by the CC-index-style ``html_len`` column with parquet filter
    pushdown — giants and normal docs take separate map_batches paths
    (giants: batch_size=1, so one straggler never rides with 63 hostages
    in a batch and blocks never exceed one giant);
  * when the length column is absent, ``add_salt`` +
    ``repartition(shuffle=True)`` spreads rows so no block accumulates
    several giants;
  * layout guidance: write giant docs into dedicated shards at ingest
    (our fixture does: pages-mega.parquet) so the two filtered reads
    prune to disjoint row groups — the "double read" costs metadata only.
"""

from __future__ import annotations

import pyarrow.compute as pc

DEFAULT_GIANT_BYTES = 1_000_000  # ≈ P99.9 of Common-Crawl page sizes


def extract_with_skew_routing(paths, threshold: int = DEFAULT_GIANT_BYTES,
                              columns=("url", "html", "lang", "html_len"),
                              small_batch_size: int = 64,
                              giant_num_cpus: float = 1.0):
    """pages shards → extraction Dataset, giants routed to a
    batch_size=1 path. Requires the ``html_len`` column (written by
    ingest, like the CC index's content length)."""
    import ray.data as rd
    from zhtml_ray.pipelines.extract import extract_pages

    cols = list(columns)
    small = rd.read_parquet(paths, columns=cols,
                            filter=pc.field("html_len") <= threshold)
    giant = rd.read_parquet(paths, columns=cols,
                            filter=pc.field("html_len") > threshold)
    a = extract_pages(small, batch_size=small_batch_size)
    # giants cluster into one input block (dedicated shard layout) —
    # split to one-row blocks so each giant parses on its own core
    giant = giant.repartition(32)
    b = extract_pages(giant, batch_size=1, num_cpus=giant_num_cpus)
    return a.union(b)


def add_salt(ds, key: str = "url", buckets: int = 1024,
             out: str = "salt"):
    """Deterministic salt column hash(key) % buckets — the repartition key
    when co-location must be broken up (e.g. a shard of giants)."""
    import pyarrow as pa
    import zlib

    def f(batch: pa.Table) -> pa.Table:
        ks = batch[key].to_pylist()
        salt = [zlib.crc32(str(k).encode()) % buckets for k in ks]
        return batch.append_column(out, pa.array(salt, pa.int32()))

    return ds.map_batches(f, batch_format="pyarrow")


def spread_giants(ds, buckets: int = 256):
    """Salt + shuffle-repartition: distributes clustered giants across
    blocks before the parse stage."""
    return add_salt(ds, buckets=buckets).repartition(buckets, shuffle=True)
