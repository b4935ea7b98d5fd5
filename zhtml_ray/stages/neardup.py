"""Job-CLI incremental near-dup stage over an at-rest LSH index.

The 100-TB operational lifecycle (VERDICT r4 #2): each job partition
PROBES the at-rest MinHash/LSH index (functions/dedup.py:
build_lsh_index layout — ``(bucket, key)`` rows Hive-partitioned by
``bucket_part``), marks colliding docs as near-duplicates, then
APPENDS the surviving docs' band rows so every later partition (and
every later job) sees them. Semantics are candidate-level by design —
the index stores hashes, never text, so there is nothing to
exact-verify against; an LSH band collision IS the duplicate signal,
exactly like the snapshot/incremental dedup literature's first stage:

  * cross-partition: any band collision with an indexed key drops the
    probing doc (``neardup_keep = false``);
  * within-partition: docs also collide with EACH OTHER — the
    lexicographically-smaller key of every candidate pair survives
    (pairwise-canonical; deterministic and order-free).

The stage is append-only on the data path (a ``neardup_keep`` bool
column, preserving the job CLI's rows == inputs manifest invariant —
the same contract as ``--clean``) and exactly-once on the index path:

  * partition appends are DETERMINISTICALLY NAMED
    (``part-<pid>.parquet`` inside each ``bucket_part=`` dir), so a
    partition that crashed after appending but before its manifest
    wrote is wiped (``clean_partition_files``) and re-appended
    byte-identically on resume — the probe never sees the partition's
    own half-written rows;
  * index parameters are pinned in ``<index>/_lsh_config.json`` on
    first touch and verified on every later partition/resume (the
    plan.json config-pinning convention) — probing with different
    num_perm/bands/seed would silently miss every duplicate.

Partition order is the determinism boundary: partition P's probe must
see partitions 0..P-1's appends, so run_partitioned forces
``overlap=1`` when this stage is active.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_LSH_CONFIG = {
    "key": "url",
    "col": "extracted_text",
    "n_parts": 64,
    "num_perm": 128,
    "bands": 32,
    "shingle_k": 3,
    "seed": 42,
}


def pin_lsh_config(index_dir: str, overrides: dict | None = None) -> dict:
    """Load ``<index>/_lsh_config.json`` (verifying any overrides
    against it) or pin defaults+overrides on first touch. A mismatch
    fails loudly: an index probed with the wrong parameters finds
    nothing and silently lets every duplicate through."""
    os.makedirs(index_dir, exist_ok=True)
    cfg = dict(DEFAULT_LSH_CONFIG, **(overrides or {}))
    path = os.path.join(index_dir, "_lsh_config.json")
    if os.path.exists(path):
        with open(path) as f:
            stored = json.load(f)
        diff = {k for k in cfg if stored.get(k) != cfg[k]}
        if overrides and diff & set(overrides):
            raise ValueError(
                f"LSH index at {index_dir} was built with "
                f"{ {k: stored.get(k) for k in sorted(diff)} }, not "
                f"{ {k: cfg[k] for k in sorted(diff)} }; an index is "
                "only probeable with its own parameters")
        return stored
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cfg, f)
    os.replace(tmp, path)
    return cfg


def job_tag(out_dir: str) -> str:
    """Stable 8-hex namespace for one job's deterministic append files
    (sha1 of the job OUTPUT dir's abspath — stable across resumes of
    the same job, distinct between jobs): without it, two jobs sharing
    one index would collide on ``part-<pid>`` names and partition P of
    job B's crash cleanup would delete job A's partition-P appends."""
    import hashlib
    return hashlib.sha1(
        os.path.abspath(out_dir).encode()).hexdigest()[:8]


def clean_partition_files(index_dir: str, pid: int,
                          tag: str = "") -> int:
    """Remove THIS JOB's partition-``pid`` deterministically-named
    append files (and torn ``.tmp``s) from every bucket_part dir —
    crash recovery before a re-probe, so the partition never collides
    with its own previous half-append. Returns the number of files
    removed."""
    pat = os.path.join(index_dir, "bucket_part=*",
                       f"part-{tag}{pid:06d}.parquet")
    removed = 0
    for f in glob.glob(pat) + glob.glob(pat + ".tmp"):
        os.remove(f)
        removed += 1
    return removed


def _collect_band_rows(docs_ds, cfg: dict, budget_rows: int) -> pa.Table:
    """Run the MinHash → band-explode stages and collect the (bucket,
    key) rows to the driver under an explicit budget (the probe-side
    smallness premise — same loud failure as lsh_index_probe)."""
    from zhtml_ray.functions.dedup import (_cached_lsh_explode,
                                           _cached_minhash)

    mh = _cached_minhash(cfg["col"], cfg["num_perm"], cfg["shingle_k"],
                         cfg["seed"])
    le = _cached_lsh_explode(cfg["key"], cfg["bands"], cfg["num_perm"])
    chunks, n = [], 0
    for t in (docs_ds.map_batches(mh, batch_format="pyarrow")
                     .map_batches(le, batch_format="pyarrow")
                     .iter_batches(batch_size=None,
                                   batch_format="pyarrow")):
        n += t.num_rows
        if n > budget_rows:
            raise ValueError(
                f"neardup partition explodes to >{n} band rows "
                f"(budget {budget_rows}); shrink --group-size so each "
                "partition stays the small probe side")
        chunks.append(t)
    if not chunks:
        kt = docs_ds.schema().base_schema.field(cfg["key"]).type
        return pa.table({"bucket": pa.array([], pa.int64()),
                         cfg["key"]: pa.array([], kt)})
    return pa.concat_tables(chunks)


def append_partition_to_index(band_rows: pa.Table, index_dir: str,
                              pid: int, cfg: dict,
                              tag: str = "") -> int:
    """Write a partition's surviving band rows into the index with
    deterministic per-partition file names (atomic tmp+rename per
    bucket_part) — rerunnable after clean_partition_files. Returns the
    number of bucket_part files written."""
    key = cfg["key"]
    part = np.mod(band_rows["bucket"].to_numpy(zero_copy_only=False),
                  cfg["n_parts"])
    written = 0
    for v in np.unique(part):
        sub = band_rows.filter(pa.array(part == v))
        d = os.path.join(index_dir, f"bucket_part={int(v)}")
        os.makedirs(d, exist_ok=True)
        final = os.path.join(d, f"part-{tag}{pid:06d}.parquet")
        pq.write_table(sub.select(["bucket", key]), final + ".tmp")
        os.replace(final + ".tmp", final)
        written += 1
    return written


def partition_neardup(docs_ds, index_dir: str, pid: int,
                      cfg: dict | None = None,
                      budget_rows: int = 4_000_000,
                      tag: str = ""):
    """The per-partition probe → mark → append lifecycle.

    ``docs_ds``: the partition's extracted docs (must contain
    ``cfg[key]`` and ``cfg[col]``; pass a column-pruned dataset).
    Returns ``(drop_keys, stats)`` where ``drop_keys`` is the set of
    keys marked near-duplicate and ``stats`` the manifest record.
    Caller sequencing contract: partitions run in ascending pid order
    (run_partitioned forces overlap=1)."""
    from zhtml_ray.functions.dedup import lsh_index_probe
    from zhtml_ray.stages.sortagg import sorted_first_per_group

    cfg = cfg or pin_lsh_config(index_dir)
    cleaned = clean_partition_files(index_dir, pid, tag)
    scan_stats: dict = {}
    pairs = lsh_index_probe(
        index_dir, docs_ds, key=cfg["key"], col=cfg["col"],
        n_parts=cfg["n_parts"], num_perm=cfg["num_perm"],
        bands=cfg["bands"], shingle_k=cfg["shingle_k"],
        seed=cfg["seed"], scan_stats=scan_stats,
        new_budget_rows=budget_rows)
    index_drops = {r["key_a"] for r in
                   sorted_first_per_group(pairs, ["key_a"]).take_all()} \
        if pairs.count() else set()

    # within-partition: band rows collected ONCE serve both the pair
    # scan (numpy, driver-side — the partition is the budgeted small
    # side by contract) and, post-filter, the index append
    band_rows = _collect_band_rows(docs_ds, cfg, budget_rows)
    order = np.lexsort((
        np.asarray(band_rows[cfg["key"]].to_pylist(), object),
        band_rows["bucket"].to_numpy(zero_copy_only=False)))
    bk = band_rows["bucket"].to_numpy(zero_copy_only=False)[order]
    keys = np.asarray(band_rows[cfg["key"]].to_pylist(), object)[order]
    within_drops: set = set()
    run_start = 0
    for i in range(1, len(bk) + 1):
        if i == len(bk) or bk[i] != bk[run_start]:
            if i - run_start > 1:
                seen = keys[run_start]
                for k in keys[run_start + 1:i]:
                    if k != seen:
                        within_drops.add(k)  # smaller key survives
            run_start = i
    drop_keys = index_drops | within_drops

    survivors = band_rows if not drop_keys else band_rows.filter(
        pa.array([k not in drop_keys
                  for k in band_rows[cfg["key"]].to_pylist()]))
    files_written = append_partition_to_index(survivors, index_dir,
                                              pid, cfg, tag)
    n_docs = len(set(band_rows[cfg["key"]].to_pylist()))
    stats = {
        "index_dir": index_dir,
        "probed": n_docs,
        "dropped_index": len(index_drops),
        "dropped_within": len(within_drops - index_drops),
        "appended": n_docs - len(drop_keys),
        "index_parts_read": scan_stats.get("n_parts_read", 0),
        "index_files_written": files_written,
        "stale_files_cleaned": cleaned,
    }
    return drop_keys, stats
