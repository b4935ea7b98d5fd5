"""Distributed as-of join — an operator Ray Data lacks natively.

``asof_join(probe, build, ...)`` attaches to every probe row the
payload of the LATEST build row with the same ``by`` key and ``on``
value ≤ the probe's (inclusive), i.e. DuckDB's ``ASOF LEFT JOIN`` /
pandas ``merge_asof``: the attribution/backfill join of event
pipelines ("which click preceded this purchase").

Shape (the ``stages/sortagg.py`` family): tag build rows 0 and probe
rows 1, union, ONE range-shuffle sort on ``(by, on, tag, uid)`` —
build-before-probe at equal ``on`` makes the bound inclusive, the
caller-supplied per-side-unique ``uid`` makes the order total so both
passes see identical deterministic blocks — then two streaming passes
over the materialized sorted Dataset:

* pass A emits ONE summary row per block (its first sort key, its last
  key value, and the last build payload of that key inside the block);
  the driver chains these O(num_blocks) rows into a carry-in per block
  — because the sort makes each key's rows contiguous, only the single
  key straddling each block edge ever needs carrying, no matter how
  hot it is;
* pass B re-reads the same blocks, resolves every probe row against the
  block-local forward-fill (vectorized numpy: maximum-accumulate of
  build positions with key-run resets), and falls back to the
  broadcast carry-in for the first key's prefix rows.

Nothing row-shaped ever lands on the driver; a mega-key (one user = a
whole shard) just spans several sorted blocks and chains through the
summaries. Skew-safe, O(blocks) driver state, two map passes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _null_of(t: pa.DataType):
    return pa.scalar(None, t)


def _pykey(*vals):
    """Canonical python tuple for the block-identity dict: ``take_all``
    rows and ``.as_py()`` must hash equal, so numpy scalar types are
    unwrapped to their python equivalents."""
    return tuple(v.item() if hasattr(v, "item") else v for v in vals)


def asof_join(probe, build, by: str, on: str, uid: str,
              payload_cols: list[str]):
    """Probe rows + latest-at-or-before build payloads.

    ``probe``: Dataset whose every column is kept in the output.
    ``build``: Dataset with ``by``, ``on``, ``uid`` and
    ``payload_cols`` (payload names must not collide with probe's).
    ``uid`` must be unique within each side (sort tiebreak → total
    deterministic order). Ties on ``(by, on)`` inside build resolve to
    the max-``uid`` row — value-identical payloads either way when the
    payload is derived from ``(by, on)``.
    Returns: Dataset[probe columns + payload_cols (null = no match)].
    """
    from zhtml_ray.stages.util import drop_empty_blocks

    probe_schema = probe.schema().base_schema
    build_schema = build.schema().base_schema
    probe_cols = list(probe_schema.names)
    extra = [c for c in probe_cols if c not in (by, on, uid)]
    for c in payload_cols:
        if c in probe_cols:
            raise ValueError(f"payload column {c!r} collides with probe")
    pay_types = {c: build_schema.field(c).type for c in payload_cols}
    extra_types = {c: probe_schema.field(c).type for c in extra}

    def tag_probe(b: pa.Table) -> pa.Table:
        cols = {by: b[by], on: b[on], uid: b[uid],
                "_tag": pa.array(np.ones(b.num_rows, np.int8))}
        for c in extra:
            cols[c] = b[c]
        for c in payload_cols:
            cols[c] = pa.nulls(b.num_rows, pay_types[c])
        return pa.table(cols)

    def tag_build(b: pa.Table) -> pa.Table:
        cols = {by: b[by], on: b[on], uid: b[uid],
                "_tag": pa.array(np.zeros(b.num_rows, np.int8))}
        for c in extra:
            cols[c] = pa.nulls(b.num_rows, extra_types[c])
        for c in payload_cols:
            cols[c] = b[c]
        return pa.table(cols)

    union = drop_empty_blocks(
        probe.map_batches(tag_probe, batch_format="pyarrow").union(
            build.map_batches(tag_build, batch_format="pyarrow")))
    srt = union.sort([by, on, "_tag", uid]).materialize()

    def _runs(b: pa.Table):
        u = b[by].to_numpy(zero_copy_only=False)
        tag = b["_tag"].to_numpy(zero_copy_only=False)
        n = b.num_rows
        idx = np.arange(n)
        ff = np.maximum.accumulate(np.where(tag == 0, idx, -1))
        new_u = np.r_[True, u[1:] != u[:-1]]
        run_start = np.maximum.accumulate(np.where(new_u, idx, 0))
        return u, tag, idx, ff, run_start

    def _summary_empty() -> pa.Table:
        cols = {f"first_{by}": pa.array([], probe_schema.field(by).type),
                f"first_{on}": pa.array([], probe_schema.field(on).type),
                "first__tag": pa.array([], pa.int8()),
                f"first_{uid}": pa.array([], probe_schema.field(uid).type),
                "last_by": pa.array([], probe_schema.field(by).type)}
        for c in payload_cols:
            cols[f"carry_{c}"] = pa.array([], pay_types[c])
        cols["has_carry"] = pa.array([], pa.bool_())
        return pa.table(cols)

    # ---- pass A: one summary row per block ----
    def summarize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _summary_empty()
        u, tag, idx, ff, _ = _runs(b)
        first = b.select([by, on, "_tag", uid]).slice(0, 1)
        cols = {f"first_{c}": first[c]
                for c in (by, on, "_tag", uid)}
        cols["last_by"] = b[by].slice(b.num_rows - 1, 1)
        # last build row belonging to the block's LAST key, if any
        j = int(ff[-1])
        has = j >= 0 and u[j] == u[-1]
        for c in payload_cols:
            cols[f"carry_{c}"] = (b[c].slice(j, 1) if has
                                  else pa.nulls(1, pay_types[c]))
        cols["has_carry"] = pa.array([bool(has)])
        return pa.table(cols)

    summaries = srt.map_batches(summarize, batch_size=None,
                                batch_format="pyarrow").take_all()
    summaries.sort(key=lambda r: (r[f"first_{by}"], r[f"first_{on}"],
                                  r["first__tag"], r[f"first_{uid}"]))

    # chain: running (key, payload) through block order
    carry_in: dict = {}
    cur_by, cur_pay = None, None
    for s in summaries:
        fkey = _pykey(s[f"first_{by}"], s[f"first_{on}"],
                      s["first__tag"], s[f"first_{uid}"])
        carry_in[fkey] = None
        if cur_by is not None and s[f"first_{by}"] == cur_by \
                and cur_pay is not None:
            carry_in[fkey] = cur_pay
        # advance the running state to this block's end
        if s["has_carry"]:
            cur_by = s["last_by"]
            cur_pay = tuple(s[f"carry_{c}"] for c in payload_cols)
        elif s["last_by"] == s[f"first_{by}"]:
            # single-key block (or trailing key == leading key) with no
            # build rows for it: the running payload survives only if
            # it was already for this key
            if cur_by != s["last_by"]:
                cur_by, cur_pay = s["last_by"], None
        else:
            cur_by, cur_pay = s["last_by"], None

    import ray
    carry_ref = ray.put(carry_in)

    # ---- pass B: resolve every probe row block-locally ----
    out_names = probe_cols + payload_cols

    def resolve(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({c: pa.array(
                [], pay_types.get(c) or probe_schema.field(c).type)
                for c in out_names})
        import ray as _ray
        carries = _ray.get(carry_ref)
        fkey = _pykey(b[by][0].as_py(), b[on][0].as_py(),
                      b["_tag"][0].as_py(), b[uid][0].as_py())
        # every non-empty block registered a summary in pass A — a miss
        # is a key-normalization bug and must fail loudly, not null out
        # boundary rows
        carry = carries[fkey]
        u, tag, idx, ff, run_start = _runs(b)
        pmask = tag == 1
        pi = idx[pmask]
        j = ff[pi]
        valid = j >= run_start[pi]
        use_carry = (~valid) & (run_start[pi] == 0) & (carry is not None)
        probe_rows = b.filter(pa.array(pmask))
        cols = {c: probe_rows[c] for c in probe_cols}
        take_idx = pa.array(np.where(valid, j, 0), pa.int64())
        vmask = pa.array(valid)
        for k, c in enumerate(payload_cols):
            taken = b[c].take(take_idx)
            col = pc.if_else(vmask, taken, _null_of(pay_types[c]))
            if use_carry.any():
                col = pc.if_else(pa.array(use_carry),
                                 pa.scalar(carry[k], pay_types[c]), col)
            cols[c] = col
        return pa.table(cols)

    return srt.map_batches(resolve, batch_size=None,
                           batch_format="pyarrow")
