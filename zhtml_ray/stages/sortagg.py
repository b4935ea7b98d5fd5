"""Sort-based grouped-first primitive.

Measured on this Ray version (BENCH/BASELINE.md, r3 dedup section):
the hash-shuffle ``groupby().aggregate()`` runs 36–48 s over 6.4M rows
with 4.5M groups at ANY partition count, while the range-shuffle
``sort()`` moves the same rows in 1.9 s and block-local Arrow/numpy
aggregation is essentially free. For high-cardinality keys the sort
form is ~20× faster with identical semantics.

``sorted_first_per_group`` keeps ONE row per distinct group — the
first in sort order, so appending tie-break columns to the sort makes
it min-by. After the sort every group is a contiguous run; run heads
inside a block are exact, and only each block's FIRST and LAST runs
can straddle a block edge, so those rows (≤ 2 runs per block) take a
tiny per-group second pass — bounded by block count, not data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _run_starts(b: pa.Table, group_cols: list[str]) -> np.ndarray:
    """Positions where a new group run begins (composite adjacent-diff
    across the group columns, vectorized per column)."""
    import pyarrow.compute as pc
    n = b.num_rows
    diff = np.zeros(max(n - 1, 0), bool)
    for c in group_cols:
        if n <= 1:
            break
        col = b[c].combine_chunks()
        # value-vs-null compares yield null (filled as "equal"), so the
        # validity flip supplies that boundary; null==null stays equal
        ne = pc.fill_null(pc.not_equal(col.slice(1), col.slice(0, n - 1)),
                          False).to_numpy(zero_copy_only=False).astype(bool)
        va = pc.is_valid(col).to_numpy(zero_copy_only=False)
        diff |= ne | (va[1:] != va[:-1])
    return np.flatnonzero(np.r_[True, diff])


def sorted_first_per_group(ds, group_cols, tie_cols=()):
    """One row per distinct ``group_cols`` combination: the first row
    in ``sort(group_cols + tie_cols)`` order (i.e. min of the tie
    columns per group). Returns a Dataset with the input schema.

    ONE range shuffle + C-speed block-local run heads; boundary runs
    (first/last of each block) resolve in a per-group pass bounded by
    2×blocks groups. Empty input passes through."""
    import pyarrow.compute as pc
    from zhtml_ray.stages.util import drop_empty_blocks

    group_cols = list(group_cols)
    srt = ds.sort(group_cols + list(tie_cols)).materialize()
    if srt.count() == 0:
        return srt

    def interior_heads(b: pa.Table) -> pa.Table:
        starts = _run_starts(b, group_cols)
        if len(starts) <= 2:
            # 0/1/2 runs: every run touches a block edge
            return b.slice(0, 0)
        keep = starts[1:-1]  # heads of runs fully inside this block
        return b.take(pa.array(keep, pa.int64()))

    def edge_rows(b: pa.Table) -> pa.Table:
        # ONLY the head row of the block's first and last runs: rows
        # within a run are already tie-sorted by the global sort, so
        # each block's candidate for a boundary group's "first" is its
        # run head — shipping whole runs would materialize a hot group
        # (e.g. a 10^8-copy boilerplate text) on one worker (r3 review)
        starts = _run_starts(b, group_cols)
        idx = sorted({0, int(starts[-1])})
        return b.take(pa.array(idx, pa.int64()))

    interior = srt.map_batches(interior_heads, batch_size=None,
                               batch_format="pyarrow")
    edges = drop_empty_blocks(
        srt.map_batches(edge_rows, batch_size=None,
                        batch_format="pyarrow"))
    if edges.count() == 0:
        return interior

    def first_of(g: pa.Table) -> pa.Table:
        # candidates are per-block run HEADS (≤ 2×blocks rows total,
        # arriving in arbitrary order): re-sort by the tie columns so
        # the group winner is the global min-by, exactly as if the
        # whole run had been scanned
        if tie_cols:
            order = pc.sort_indices(
                g, sort_keys=[(c, "ascending") for c in tie_cols])
            g = g.take(order)
        return g.slice(0, 1)

    # edges is ≤ 2×blocks rows scattered over ~blocks ONE-ROW blocks;
    # Ray's groupby sort pays per-block overhead, not per-row — the
    # uncompacted form measured 2.4 s for 400 rows (r4 stats audit)
    from zhtml_ray.stages.util import compact_blocks
    boundary = compact_blocks(edges).groupby(group_cols).map_groups(
        first_of, batch_format="pyarrow")
    return interior.union(boundary)


def sorted_head_n_per_group(ds, group_cols, tie_cols, n):
    """First ``n`` rows per distinct ``group_cols`` combination in
    ``sort(group_cols + tie_cols)`` order (min-n-by). Same shape as
    ``sorted_first_per_group``: ONE range shuffle, block-local run
    slices, and a boundary pass that ships only the first ``n`` rows
    of each block's first/last run (<= 2n rows per block — a hot group
    never lands whole on one worker)."""
    import pyarrow.compute as pc
    from zhtml_ray.stages.util import drop_empty_blocks

    group_cols = list(group_cols)
    tie_cols = list(tie_cols)
    srt = ds.sort(group_cols + tie_cols).materialize()
    if srt.count() == 0:
        return srt

    def run_bounds(b):
        starts = _run_starts(b, group_cols)
        ends = np.r_[starts[1:], b.num_rows]
        return starts, ends

    def interior_heads(b: pa.Table) -> pa.Table:
        starts, ends = run_bounds(b)
        if len(starts) <= 2:
            return b.slice(0, 0)
        idx = np.concatenate([
            np.arange(s, min(s + n, e))
            for s, e in zip(starts[1:-1], ends[1:-1])])
        return b.take(pa.array(idx, pa.int64()))

    def edge_rows(b: pa.Table) -> pa.Table:
        starts, ends = run_bounds(b)
        take = {int(j) for s, e in
                ((starts[0], ends[0]), (starts[-1], ends[-1]))
                for j in range(s, min(s + n, e))}
        return b.take(pa.array(sorted(take), pa.int64()))

    interior = srt.map_batches(interior_heads, batch_size=None,
                               batch_format="pyarrow")
    edges = drop_empty_blocks(
        srt.map_batches(edge_rows, batch_size=None,
                        batch_format="pyarrow"))
    if edges.count() == 0:
        return interior

    def head_of(g: pa.Table) -> pa.Table:
        # candidates arrive in arbitrary order; re-sort by ties so the
        # group head-n is the global min-n-by
        if tie_cols:
            order = pc.sort_indices(
                g, sort_keys=[(c, "ascending") for c in tie_cols])
            g = g.take(order)
        return g.slice(0, n)

    from zhtml_ray.stages.util import compact_blocks
    boundary = compact_blocks(edges).groupby(group_cols).map_groups(
        head_of, batch_format="pyarrow")
    return interior.union(boundary)


def sorted_sum_per_group(ds, group_cols, sum_cols):
    """``groupby(group_cols).sum(sum_cols)`` as ONE range-shuffle sort
    + block-local ``np.add.reduceat`` run sums. Measured on this Ray
    version: ``groupby().aggregate(Sum)`` costs ~10.5 s over 1.75M
    rows / 200k groups regardless of key type, while the same data
    range-sorts in 0.4–0.7 s and segment sums are C-speed — ~15–25×.

    A hot group never converges on one worker: each block contributes
    at most TWO boundary rows (the PARTIAL SUMS of its first and last
    runs), and the boundary combine runs over ≤ 2×blocks rows in one
    task. Sum columns must be non-null (partial tables always are);
    int64 sums are exact and layout-invariant, float sums follow the
    caller's pin rules exactly as with Ray's Aggregate. Output
    columns: group_cols + sum_cols (same names, summed)."""
    from zhtml_ray.stages.util import drop_empty_blocks

    group_cols = list(group_cols)
    sum_cols = list(sum_cols)
    srt = ds.sort(group_cols).materialize()
    if srt.count() == 0:
        return srt
    schema = srt.schema().base_schema
    empty = pa.table({c: pa.array([], schema.field(c).type)
                      for c in group_cols + sum_cols})

    def block_runsums(b: pa.Table):
        starts = _run_starts(b, group_cols)
        keys = {c: b[c].combine_chunks().take(
            pa.array(starts, pa.int64())) for c in group_cols}
        sums = {c: np.add.reduceat(
            b[c].combine_chunks().to_numpy(zero_copy_only=False),
            starts) for c in sum_cols}
        return starts, keys, sums

    def pick(keys, sums, sel) -> pa.Table:
        return pa.table({**{c: keys[c].take(pa.array(sel, pa.int64()))
                            for c in group_cols},
                         **{c: pa.array(sums[c][sel])
                            for c in sum_cols}})

    def interior(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        starts, keys, sums = block_runsums(b)
        if len(starts) <= 2:
            return empty
        return pick(keys, sums, np.arange(1, len(starts) - 1))

    def edge_partials(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        starts, keys, sums = block_runsums(b)
        sel = np.unique([0, len(starts) - 1])
        return pick(keys, sums, sel)

    interior_ds = srt.map_batches(interior, batch_size=None,
                                  batch_format="pyarrow")
    edges = drop_empty_blocks(
        srt.map_batches(edge_partials, batch_size=None,
                        batch_format="pyarrow"))
    if edges.count() == 0:
        return interior_ds

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by(group_cols).aggregate(
            [(c, "sum") for c in sum_cols])
        return g.rename_columns(group_cols + sum_cols)

    # ≤ 2×blocks partial rows: one task combines them all
    boundary = edges.repartition(1).map_batches(
        combine, batch_size=None, batch_format="pyarrow")
    return interior_ds.union(boundary)


def sorted_bucket_apply(ds, bucket_col, sort_keys, interior_fn, edge_fn,
                        empty_result: pa.Table):
    """The sort-based per-bucket pattern, shared by the LSH pair
    emitters (``minhash_candidate_pairs`` and ``embedding_neardup``):
    ONE range-shuffle ``sort(sort_keys)``, then per-block C-speed run
    decomposition over ``bucket_col`` (any orderable non-null type).

    ``interior_fn(block, starts, ends, runs_mask) -> pa.Table`` emits
    output for the runs FULLY contained in their block (``runs_mask``
    marks them); ``edge_fn(group: pa.Table) -> pa.Table`` handles each
    bucket that straddles a block edge — at most 2 per block, plus any
    hot bucket larger than a block, so that per-group pass is bounded
    by block count, not data. Rows reach ``edge_fn`` in arbitrary
    order; re-sort inside if orientation matters. ``empty_result`` is
    a zero-row table with the OUTPUT schema: it is both the
    empty-input result and the guard value for 0-row sorted blocks
    (which carry no schema, so the UDFs must not touch their columns —
    explicit rather than relying on this Ray version skipping UDFs on
    empty blocks; r3 review)."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd
    from zhtml_ray.stages.util import drop_empty_blocks

    srt = ds.sort(sort_keys).materialize()
    if srt.count() == 0:
        return rd.from_arrow(empty_result)
    btype = srt.schema().base_schema.field(bucket_col).type

    # first/last bucket id of every sorted block — only these can span
    # a block boundary (2 rows per block, a genuinely tiny collect)
    def edges_of(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({bucket_col: pa.array([], btype)})
        col_ = b[bucket_col]
        return pa.table({bucket_col: pa.array(
            [col_[0].as_py(), col_[-1].as_py()], btype)})

    edge_ids = sorted({r[bucket_col] for r in srt.map_batches(
        edges_of, batch_size=None, batch_format="pyarrow").take_all()})
    # broadcast as a typed Arrow array: zero-copy shared from plasma,
    # no per-block pickle + pa.array rebuild (r3 review)
    eref = ray.put(pa.array(edge_ids, btype))

    def interior(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_result
        n = b.num_rows
        starts = _run_starts(b, [bucket_col])
        ends = np.r_[starts[1:], n]
        heads = b[bucket_col].combine_chunks().take(
            pa.array(starts, pa.int64()))
        on_edge = pc.is_in(heads, value_set=ray.get(eref))
        mask = ~pc.fill_null(on_edge, False) \
            .to_numpy(zero_copy_only=False).astype(bool)
        return interior_fn(b, starts, ends, mask)

    out = srt.map_batches(interior, batch_size=None,
                          batch_format="pyarrow")

    def keep_edges(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        m = pc.is_in(b[bucket_col], value_set=ray.get(eref))
        return b.filter(m)

    edge_rows = drop_empty_blocks(
        srt.map_batches(keep_edges, batch_format="pyarrow"))
    if edge_rows.count():
        from zhtml_ray.stages.util import compact_blocks
        out = out.union(
            compact_blocks(edge_rows).groupby(bucket_col).map_groups(
                edge_fn, batch_format="pyarrow"))
    return out


def sorted_lookup_join(big, lookup, key_col, payload_cols, how="inner"):
    """Attach ``payload_cols`` from ``lookup`` onto ``big``'s rows by
    ``key_col`` — a merge join expressed as ONE range-shuffle sort of
    the tagged union (via ``sorted_bucket_apply``), replacing a hash
    ``Dataset.join``. Measured on this Ray version the hash join costs
    ~5× the equivalent sort at equal bytes moved (BENCH/BASELINE.md r3
    label-prop section), and the sort path is immune to the
    empty-block schema-loss crashes that force ``drop_empty_blocks``
    guards around every hash-join input.

    ``lookup`` must be unique per key (only the first lookup row of a
    key is consulted); ``big`` may repeat keys freely. ``how='left'``
    keeps unmatched big rows with null payloads; ``'inner'`` drops
    them; ``'full'`` additionally emits one row per lookup key with NO
    big rows (key + payloads populated, big's other columns null) —
    the FULL OUTER join, still the same single range shuffle. Output
    columns: big's columns (in order) + payload_cols."""
    import numpy as np

    big_schema = big.schema().base_schema
    lk_schema = lookup.schema().base_schema
    big_cols = list(big_schema.names)
    assert key_col in big_cols and key_col in lk_schema.names
    clash = set(payload_cols) & set(big_cols)
    if clash or "_src" in big_cols or "_src" in payload_cols:
        # a payload name already present in big would silently replace
        # user data; a '_src' column would corrupt the row tagging
        raise ValueError(f"sorted_lookup_join: column collision "
                         f"{clash or {'_src'}} between big and "
                         "payload/tag columns")
    empty_result = pa.table(
        {**{n: pa.array([], big_schema.field(n).type) for n in big_cols},
         **{p: pa.array([], lk_schema.field(p).type)
            for p in payload_cols}})
    other_big = [n for n in big_cols if n != key_col]

    def tag_big(b: pa.Table) -> pa.Table:
        cols = {key_col: b[key_col],
                "_src": pa.array(np.ones(b.num_rows, np.int8))}
        for n in other_big:
            cols[n] = b[n]
        for p in payload_cols:
            cols[p] = pa.nulls(b.num_rows, lk_schema.field(p).type)
        return pa.table(cols)

    def tag_lookup(b: pa.Table) -> pa.Table:
        cols = {key_col: b[key_col],
                "_src": pa.array(np.zeros(b.num_rows, np.int8))}
        for n in other_big:
            cols[n] = pa.nulls(b.num_rows, big_schema.field(n).type)
        for p in payload_cols:
            cols[p] = b[p]
        return pa.table(cols)

    tagged = big.map_batches(tag_big, batch_format="pyarrow").union(
        lookup.map_batches(tag_lookup, batch_format="pyarrow"))

    def interior_fn(b, starts, ends, mask):
        S = (b["_src"].combine_chunks()
             .to_numpy(zero_copy_only=False) != 0)
        lens = ends - starts
        run_of = np.repeat(np.arange(len(starts)), lens)
        head_ok = ~S[starts]  # run head is a lookup row for this key
        if how == "inner":
            keep = np.repeat(mask & head_ok, lens) & S
        else:
            keep = np.repeat(mask, lens) & S
        pos = np.flatnonzero(keep)
        headpos = starts[run_of][pos]
        if how in ("left", "full"):
            # null head index → null payload via Arrow take semantics
            hidx = pa.array(headpos, pa.int64(),
                            mask=~head_ok[run_of][pos])
        else:
            hidx = pa.array(headpos, pa.int64())
        posa = pa.array(pos, pa.int64())
        cols = {n: b[n].combine_chunks().take(posa) for n in big_cols}
        for p in payload_cols:
            cols[p] = b[p].combine_chunks().take(hidx)
        out_tbl = pa.table(cols)
        if how == "full":
            # lookup keys with NO big rows in their run: emit the
            # lookup row itself (lookup is head-sorted + unique, so a
            # big-less run is exactly a length-1 run whose head is the
            # lookup row)
            big_per_run = np.add.reduceat(S.astype(np.int64), starts) \
                if len(starts) else np.zeros(0, np.int64)
            lonely = np.flatnonzero(mask & head_ok & (big_per_run == 0))
            if lonely.size:
                lpos = pa.array(starts[lonely], pa.int64())
                nulls = pa.array(np.zeros(lonely.size, np.int64),
                                 mask=np.ones(lonely.size, bool))
                lcols = {}
                for n in big_cols:
                    col_ = b[n].combine_chunks()
                    lcols[n] = col_.take(lpos) if n == key_col else \
                        col_.take(nulls)
                for p in payload_cols:
                    lcols[p] = b[p].combine_chunks().take(lpos)
                out_tbl = pa.concat_tables([out_tbl, pa.table(lcols)])
        return out_tbl

    def edge_fn(g: pa.Table) -> pa.Table:
        S = (g["_src"].combine_chunks()
             .to_numpy(zero_copy_only=False) != 0)
        lpos = np.flatnonzero(~S)
        epos = np.flatnonzero(S)
        if lpos.size == 0 and how == "inner":
            return empty_result
        if how == "full" and epos.size == 0:
            if lpos.size == 0:
                return empty_result
            la = pa.array(lpos[:1], pa.int64())
            one_null = pa.array(np.zeros(1, np.int64),
                                mask=np.ones(1, bool))
            return pa.table(
                {**{n: (g[n].combine_chunks().take(la) if n == key_col
                        else g[n].combine_chunks().take(one_null))
                    for n in big_cols},
                 **{p: g[p].combine_chunks().take(la)
                    for p in payload_cols}})
        posa = pa.array(epos, pa.int64())
        cols = {n: g[n].combine_chunks().take(posa) for n in big_cols}
        if lpos.size:
            hidx = pa.array(np.full(len(epos), lpos[0], np.int64))
        else:
            hidx = pa.array(np.zeros(len(epos), np.int64),
                            mask=np.ones(len(epos), bool))
        for p in payload_cols:
            cols[p] = g[p].combine_chunks().take(hidx)
        return pa.table(cols)

    return sorted_bucket_apply(tagged, key_col, [key_col, "_src"],
                               interior_fn, edge_fn, empty_result)
