"""Shared stage-sizing helpers.

Hard-coded actor-pool sizes (``concurrency=2``) starve stages on a real
cluster; pools here are sized from ``ray.cluster_resources()`` at
pipeline-construction time and expressed as autoscaling ``(min, max)``
ranges so a small input spins up few actors while a 256-node cluster can
scale each stage to its share of the CPUs.
"""

from __future__ import annotations


def cluster_cpus(default: int = 4) -> int:
    import ray
    if not ray.is_initialized():
        return default
    return int(ray.cluster_resources().get("CPU", default) or default)


def autoscale_pool(frac: float = 0.5, lo: int = 1,
                   hi: int | None = None) -> tuple[int, int]:
    """(min, max) for an autoscaling actor pool: max = frac of cluster
    CPUs (≥2), optionally capped. Use frac<1 for stages that coexist
    with other pools in the same pipeline so no stage starves the rest."""
    mx = max(2, int(cluster_cpus() * frac))
    if hi is not None:
        mx = min(mx, hi)
    return (lo, mx)


def stateless_stage(cls, **ctor_kwargs):
    """``map_batches``-ready plain function wrapping a callable-class
    stage whose ``__init__`` only ``ray.get``s broadcast refs (and
    trivially reshapes them): the class is constructed PER BATCH —
    ``ray.get`` of the same ObjectRef is cached per worker process, so
    stateless tasks are as warm as an actor pool WITHOUT the pool's
    spin-up (r5: measured ~2 s of actor-pool startup per stage on
    sub-second workloads across the dedup and PQ/ANN families). Keep
    actor pools (a callable class + ``concurrency=``) for stages whose
    setup does real work per actor — model loads, index builds."""
    def fn(batch):
        return cls(**ctor_kwargs)(batch)
    fn.__name__ = f"stateless_{cls.__name__}"
    return fn


def drop_empty_blocks(ds):
    """Rebuild a (small, already-materialized) Dataset from its non-empty
    block refs. Ray's groupby.map_groups can emit 0-row blocks with an
    EMPTY schema (the UDF never runs for them), and pyarrow's hash join
    rejects a shuffle partition built from such a block ("no match for
    key field"). Zero-copy: only object refs move, blocks stay put."""
    import ray.data as rd
    ds = ds.materialize()
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return ds
    return rd.from_arrow_refs(refs)


def compact_blocks(ds, target_rows: int = 65536):
    """Materialize and coalesce a tiny-block-heavy Dataset to
    ~``target_rows`` rows per block. A ``sorted_bucket_apply`` output
    carries ~2 small blocks per INPUT block (interior + boundary), and
    Ray's range sort costs O(input_blocks × output_partitions) block
    parts — feeding one sortagg stage's output straight into the next
    sort measured 420+ s where the same rows in 3 compacted blocks
    sorted in seconds (500k-doc mask_dup_spans probe, session 7).
    No-op (beyond the materialize) when blocks are already
    reasonably sized."""
    ds = ds.materialize()
    n = ds.count()
    want = max(1, -(-n // target_rows))
    if ds.num_blocks() > want * 2:
        return ds.repartition(want).materialize()
    return ds


def schema_safe_result(ds):
    """For SMALL final results only: Ray's ``to_pandas()`` returns a
    column-less frame for an all-empty Dataset (whatever the blocks'
    schemas), which fails any downstream schema compare. Materialize;
    if empty, hand back a typed empty ``pyarrow.Table`` instead (the
    driver contract accepts Dataset | DataFrame | Table)."""
    import pyarrow as pa
    ds = ds.materialize()
    if ds.count() > 0:
        return ds
    sch = ds.schema()
    if sch is None or not sch.names:
        return ds  # nothing recoverable
    schema = sch.base_schema
    return pa.table({f.name: pa.array([], f.type) for f in schema})


def shuffle_partitions() -> int:
    """Partition count for hash-shuffle operators (joins): ~2 waves of
    tasks per CPU, floor 8."""
    return max(8, cluster_cpus() * 2)


def sized_partitions(n_rows: int, rows_per_part: int = 100_000) -> int:
    """Hash-shuffle partition count sized to the DATA, capped by
    ``shuffle_partitions()``: every partition is an aggregator actor, so
    a 64-way shuffle of a 200k-row label table pays ~60 actor spin-ups
    for nothing (measured: label-propagation rounds dropped from ~12 s
    to seconds on the 200k-doc dedup bench). Floor 2 keeps the operator
    distributed."""
    import math
    return max(2, min(shuffle_partitions(),
                      math.ceil(max(1, n_rows) / rows_per_part)))


def harmonize_union(datasets, target_schema):
    """Schema-evolution union (X126): combine Datasets whose at-rest
    schemas have DRIFTED — missing columns (null-filled), narrower
    numeric types (widened by cast), different column orders — into
    one stream with ``target_schema``. Pure per-batch map on each
    input (zero shuffle) + the zero-copy ``union``; unknown extra
    columns are dropped loudly only if absent from the target (the
    caller's target IS the contract). A column present with an
    incompatible (non-castable) type raises inside the task — schema
    drift must fail loudly, not null out silently."""
    import pyarrow as pa

    target = target_schema

    def conform(b: pa.Table) -> pa.Table:
        cols = []
        for f in target:
            if f.name in b.column_names:
                cols.append(b[f.name].cast(f.type))
            else:
                cols.append(pa.nulls(b.num_rows, f.type))
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray)
             else c for c in cols], schema=target)

    outs = [d.map_batches(conform, batch_format="pyarrow")
            for d in datasets]
    u = outs[0]
    for o in outs[1:]:
        u = u.union(o)
    return u
