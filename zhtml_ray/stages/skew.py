"""Skew defusal for mega-HTML documents (SURVEY.md §4.3; north_star:
"explicit repartitioning and salt-key redistribution to defuse skew").

Parse cost is ∝ html bytes (one state step per input char), so a 50 MB
document is ~10⁴× a median page. Measured on the sf0.1 fixture
(50k docs + 4×3.6MB giants, 8 CPUs):

  * two filtered reads (html_len pushdown) + union:      32.5 s
  * …plus a repartition barrier on the giant branch:     35.1 s
  * ONE read, block-as-batch (batch_size=None):          11.2 s

The double-read design loses: the second scan + the union/repartition
barriers cost far more than giant isolation saves. The winning design
relies on Ray Data's own block layout:

  * one ``read_parquet`` pass; the reader's dynamic block splitting
    (``DataContext.target_max_block_size``) caps block bytes, so a
    shard of giants becomes many 1-row blocks at ingest — no shuffle;
  * ``batch_size=None`` → each block is one task ("block-as-batch"):
    a giant's block IS its own task, so it parses on its own core and
    never rides with 63 small-row hostages (and normal blocks skip the
    slice/coalesce overhead of re-batching);
  * layout guidance: write giant docs into dedicated shards at ingest
    (our fixture does: pages-mega.parquet) so giant blocks are pure;
  * for *mixed* shards where giants hide among small rows,
    ``spread_giants`` (shuffle repartition) remains the
    explicit-shuffle fallback — pay the all-to-all only when the
    layout is hostile.
"""

from __future__ import annotations

DEFAULT_GIANT_BYTES = 1_000_000  # ≈ P99.9 of Common-Crawl page sizes

# Cap on read-output block bytes: ≥1 giant per block still parses alone;
# a worst-case block holds ~GIANT_BLOCK_BYTES of sequential parse work
# (~4s at the measured 8 MB/s single-core rate) — the straggler ceiling.
GIANT_BLOCK_BYTES = 32 * 1024 * 1024


def cap_block_size(max_bytes: int = GIANT_BLOCK_BYTES) -> None:
    """Session-scoped: cap ``DataContext.target_max_block_size`` (never
    raising it) so giant-heavy read outputs split into ~1-doc blocks.
    Call this from the process that OWNS the Ray session (bench.py,
    job.py, a user's driver) — it is a global knob, so the library
    stages themselves never touch it."""
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    if ctx.target_max_block_size is None or \
            ctx.target_max_block_size > max_bytes:
        ctx.target_max_block_size = max_bytes


def extract_with_skew_routing(paths, columns=("url", "html", "lang"),
                              include_spans: bool = True,
                              override_num_blocks: int | None = None):
    """pages shards → extraction Dataset with giant-doc skew defused by
    block layout (see module docstring). Single read, no shuffle, no
    barrier, no global-context mutation (session owners call
    ``cap_block_size`` for the belt-and-braces byte cap; the read's own
    per-file splitting already lands fixture giants 1-per-block).
    ``override_num_blocks``: pin the read block count. When omitted
    (r4), it defaults to bench.py's measured sweet spot — ~1000 rows
    per task with a floor of 2 waves per core: fewer tasks = less
    driver-side per-task overhead, still ≥2 waves for balancing
    (default-vs-64-block sweep at sf0.1: 2.7 s → 2.4 s). Giant-doc
    isolation does NOT depend on the block count: the session's
    ``cap_block_size`` byte cap makes the reader's dynamic splitter
    put oversized rows in their own blocks regardless."""
    import ray.data as rd
    from zhtml_ray.pipelines.extract import extract_pages

    kw = {"columns": list(columns)}
    if override_num_blocks is None:
        import pyarrow as pa
        import pyarrow.dataset as pads

        from zhtml_ray.stages.util import cluster_cpus
        try:  # metadata-only row count (no data read)
            n_rows = pads.dataset(paths).count_rows()
            override_num_blocks = max(
                1, min(n_rows, max(2 * cluster_cpus(), n_rows // 1000)))
        except (OSError, pa.ArrowInvalid):  # non-path inputs: reader default
            override_num_blocks = None
    if override_num_blocks is not None:
        kw["override_num_blocks"] = override_num_blocks
    ds = rd.read_parquet(paths, **kw)
    return extract_pages(ds, batch_size=None, include_spans=include_spans)


def spread_giants(ds, buckets: int = 256):
    """Shuffle-repartition: distributes clustered giants across blocks
    before the parse stage. Explicit all-to-all — only for mixed shards
    whose layout hides giants among small rows. Placement comes from
    the keyless random shuffle: ``repartition(keys=...)`` would give
    deterministic hash placement but requires the HASH_SHUFFLE
    DataContext strategy (probed on this Ray version — raises under the
    default sort-shuffle), and a prior salt column was dead work the
    shuffle ignored (r3 review)."""
    return ds.repartition(buckets, shuffle=True)
