"""Mergeable cardinality sketches (HyperLogLog).

A 100-TB corpus can't afford COUNT(DISTINCT) when an estimate is
enough: exact distinct shuffles every (group, value) pair (the
`events_distinct_users` plan), while an HLL register block is a few KB
per group REGARDLESS of cardinality, merges with an elementwise max
(commutative + associative + idempotent → the result is EXACTLY
layout-, schedule- and duplication-invariant), and rides Ray Data as a
per-batch combiner → tiny shuffle → per-group fold.

Public algorithm: Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the
analysis of a near-optimal cardinality estimation algorithm" (AofA
2007), with the standard small-range (linear counting) correction.
Hash is SplitMix64 (Steele et al., public domain reference sequence),
vectorized in uint64 numpy (wrapping semantics are numpy's documented
unsigned behavior).

All kernels are deterministic pure functions of their inputs — the
serial golden run and the distributed run produce byte-identical
registers, so the gate pins the ESTIMATE exactly, not within a
tolerance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized SplitMix64 finalizer over uint64 (wrapping)."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += _SM_GAMMA
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
    return z ^ (z >> np.uint64(31))


def _floor_log2(x: np.ndarray) -> np.ndarray:
    """Exact floor(log2(x)) for uint64 x > 0 (binary-search bit scan —
    float64 log2 mis-rounds just below powers of two)."""
    x = x.copy()
    r = np.zeros(x.shape, np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        m = (x >> np.uint64(shift)) != 0
        r[m] += shift
        x[m] >>= np.uint64(shift)
    return r


def hll_rho(z: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) per hash: index = top ``p`` bits, rho =
    1 + leading-zero count of the remaining 64-p bit suffix (suffix of
    all zeros → 64 - p + 1, the spec's sentinel)."""
    j = (z >> np.uint64(64 - p)).astype(np.int64)
    w = z << np.uint64(p)  # suffix occupies the top bits; bottom zeros
    rho = np.where(w == 0, np.int64(64 - p + 1),
                   np.int64(64) - _floor_log2(np.maximum(w, 1)))
    return j, rho.astype(np.int64)


def hll_registers(values: np.ndarray, group_codes: np.ndarray,
                  n_groups: int, p: int = 12) -> np.ndarray:
    """(n_groups, 2**p) uint8 register block from int64 values and
    their group codes — one ``np.maximum.at`` scatter, no Python loop."""
    m = 1 << p
    regs = np.zeros((n_groups, m), np.uint8)
    if len(values) == 0:
        return regs
    z = splitmix64(values.astype(np.uint64, copy=False))
    j, rho = hll_rho(z, p)
    flat = group_codes.astype(np.int64) * m + j
    np.maximum.at(regs.reshape(-1), flat, rho.astype(np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate with the linear-counting small-range
    correction (Flajolet et al. 2007 Fig. 3). Deterministic given the
    registers (fixed-order np.sum)."""
    m = regs.shape[-1]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv = np.ldexp(1.0, -regs.astype(np.int64))  # exact 2**-M_j
    e = alpha * m * m / float(np.sum(inv))
    if e <= 2.5 * m:
        v = int(np.count_nonzero(regs == 0))
        if v:
            e = m * np.log(m / v)
    return float(e)


def hll_partial_batch(batch: pa.Table, group_col: str, value_col: str,
                      p: int = 12) -> pa.Table:
    """Per-batch HLL combiner: one row per group present in the batch,
    registers as a fixed-size binary column. This is the ONLY stage
    that sees raw rows; everything downstream moves 2**p bytes per
    (group × batch)."""
    m = 1 << p
    if batch.num_rows == 0:
        return pa.table({group_col: batch[group_col],
                         "regs": pa.array([], pa.binary(m))})
    enc = batch[group_col].combine_chunks().dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = batch[value_col].to_numpy(zero_copy_only=False)
    regs = hll_registers(vals, codes, len(enc.dictionary), p)
    return pa.table({group_col: enc.dictionary,
                     "regs": pa.array([r.tobytes() for r in regs],
                                      pa.binary(m))})


def hll_merge_rows(tbl: pa.Table) -> np.ndarray:
    """Elementwise-max fold of a partial table's ``regs`` rows."""
    rows = tbl["regs"].to_pylist()
    mat = np.frombuffer(b"".join(rows), np.uint8).reshape(len(rows), -1)
    return mat.max(axis=0)


# -------------------------------------------------------- Count-Min sketch

def word_hash64(words: list[str]) -> np.ndarray:
    """Content-based uint64 hash per word via blake2b — deterministic
    across processes (Python's ``hash()`` is per-process-seeded; the
    corpusstats gram hashes use the same construction)."""
    from hashlib import blake2b
    out = np.empty(len(words), np.uint64)
    for i, w in enumerate(words):
        d = blake2b((w or "").encode("utf-8", "surrogatepass"),
                    digest_size=8).digest()
        out[i] = int.from_bytes(d, "little")
    return out


def cms_buckets(hashes: np.ndarray, log2_w: int, d: int) -> np.ndarray:
    """(n, d) bucket index per hash per lane — the same salted
    SplitMix64 lanes as the Bloom filter, so build/probe/golden can
    never disagree."""
    return bloom_hash_bits(hashes, log2_w, d)


def cms_build(hashes: np.ndarray, counts: np.ndarray, log2_w: int,
              d: int) -> np.ndarray:
    """(d, 2**log2_w) int64 Count-Min table. Cell values are SUMS →
    merging partial tables is ``+`` (commutative/associative), so the
    sketch is exactly layout- and schedule-invariant."""
    tbl = np.zeros((d, 1 << log2_w), np.int64)
    if len(hashes) == 0:
        return tbl
    b = cms_buckets(hashes, log2_w, d)
    for lane in range(d):
        np.add.at(tbl[lane], b[:, lane], counts)
    return tbl


def cms_estimate(tbl: np.ndarray, hashes: np.ndarray,
                 log2_w: int) -> np.ndarray:
    """Min-over-lanes frequency estimate per hash (Cormode &
    Muthukrishnan 2005): never an underestimate; overshoot bounded by
    collisions (εN with ε = e/w at the usual parameterization)."""
    d = tbl.shape[0]
    b = cms_buckets(hashes, log2_w, d)
    lanes = np.stack([tbl[lane][b[:, lane]] for lane in range(d)])
    return lanes.min(axis=0)


def cms_probe_freqs(ds, probes: list[str], log2_w: int, d: int,
                    text_col: str = "text"):
    """Distributed CMS frequency estimates for a FIXED probe list:
    because cells are sums, only the ≤ |probes|×d cells the probe
    words hash to need materializing — each batch emits just those
    cells' partial counts (collision mass included, so the result
    equals the full 2**log2_w×d sketch's exactly), a tiny
    (lane, bucket) groupby sums them, and the driver takes the min
    over lanes. Raw tokens never leave their batch. Returns a pandas
    DataFrame (word, est_n) sorted by word."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from zhtml_ray.functions.corpusstats import _split_encode
    from zhtml_ray.stages.util import drop_empty_blocks

    probe_cells = cms_buckets(word_hash64(probes), log2_w, d)
    empty = pa.table({"lane": pa.array([], pa.int32()),
                      "bucket": pa.array([], pa.int64()),
                      "part": pa.array([], pa.int64())})

    def partial(b: pa.Table) -> pa.Table:
        _, codes, vocab, _lens = _split_encode(b[text_col])
        if len(vocab) == 0:
            return empty
        cnt = np.bincount(codes, minlength=len(vocab))
        buckets = cms_buckets(word_hash64(vocab.to_pylist()), log2_w, d)
        lanes_out, buck_out, part_out = [], [], []
        for lane in range(d):
            m = np.isin(buckets[:, lane], probe_cells[:, lane])
            if not m.any():
                continue
            u, inv = np.unique(buckets[m, lane], return_inverse=True)
            s = np.bincount(inv, weights=cnt[m]).astype(np.int64)
            lanes_out.append(np.full(len(u), lane, np.int32))
            buck_out.append(u)
            part_out.append(s)
        if not lanes_out:
            return empty
        return pa.table({"lane": pa.array(np.concatenate(lanes_out)),
                         "bucket": pa.array(np.concatenate(buck_out)),
                         "part": pa.array(np.concatenate(part_out))})

    cells = drop_empty_blocks(
        ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=None)) \
        .groupby(["lane", "bucket"]) \
        .aggregate(Sum("part", alias_name="cnt")).to_pandas()
    cell_of = {(int(r.lane), int(r.bucket)): int(r.cnt)
               for r in cells.itertuples()}
    ests = [min(cell_of.get((lane, int(probe_cells[i, lane])), 0)
                for lane in range(d))
            for i in range(len(probes))]
    out = pd.DataFrame({"word": list(probes), "est_n": ests})
    out["est_n"] = out["est_n"].astype("int64")
    return out.sort_values("word").reset_index(drop=True)


# ------------------------------------------------------------ Bloom filter

def bloom_hash_bits(values: np.ndarray, log2_bits: int,
                    k: int) -> np.ndarray:
    """(n, k) int64 bit positions for each value: k independent
    SplitMix64 lanes (seed-salted), masked to 2**log2_bits. Shared by
    build and probe so the two can never disagree."""
    n = len(values)
    out = np.empty((n, k), np.int64)
    v = values.astype(np.uint64, copy=False)
    mask = np.uint64((1 << log2_bits) - 1)
    for lane in range(k):
        with np.errstate(over="ignore"):
            salted = v + np.uint64(0x9E3779B97F4A7C15) * np.uint64(lane)
        out[:, lane] = (splitmix64(salted) & mask).astype(np.int64)
    return out


def bloom_build(values: np.ndarray, log2_bits: int = 20,
                k: int = 6) -> np.ndarray:
    """Byte-packed Bloom bitmap (2**log2_bits bits). Merging partial
    bitmaps is ``np.bitwise_or`` — commutative/associative/idempotent,
    so the built filter is exactly layout- and schedule-invariant."""
    bits = bloom_hash_bits(values, log2_bits, k).reshape(-1)
    bitmap = np.zeros((1 << log2_bits) // 8, np.uint8)
    np.bitwise_or.at(bitmap, bits >> 3,
                     np.left_shift(np.uint8(1),
                                   (bits & 7).astype(np.uint8)))
    return bitmap


def bloom_probe(bitmap: np.ndarray, values: np.ndarray,
                log2_bits: int, k: int) -> np.ndarray:
    """Boolean might-contain mask (no false negatives)."""
    if len(values) == 0:
        return np.zeros(0, bool)
    bits = bloom_hash_bits(values, log2_bits, k)
    got = (bitmap[bits >> 3] >> (bits & 7).astype(np.uint8)) & 1
    return got.all(axis=1)


def bloom_from_dataset(ds, key_col: str, log2_bits: int = 20,
                       k: int = 6) -> np.ndarray:
    """Distributed Bloom build over a Dataset column: per-batch partial
    bitmaps → a shuffle-free batch-level OR fold (~1024 partials per
    task, same free tree level as ``approx_distinct``) → driver OR of
    the per-task survivors (blocks/1024 bitmaps — add another fold
    level before the driver if block count × bitmap bytes outgrows
    it). The result is independent of partitioning (bitwise OR)."""
    nbytes = (1 << log2_bits) // 8

    def partial(b: pa.Table) -> pa.Table:
        vals = b[key_col].to_numpy(zero_copy_only=False)
        bm = bloom_build(vals, log2_bits, k)
        return pa.table({"bm": pa.array([bm.tobytes()],
                                        pa.binary(nbytes))})

    def local_or(b: pa.Table) -> pa.Table:
        rows = b["bm"].to_pylist()
        mat = np.frombuffer(b"".join(rows), np.uint8) \
            .reshape(len(rows), nbytes)
        return pa.table({"bm": pa.array(
            [np.bitwise_or.reduce(mat, axis=0).tobytes()],
            pa.binary(nbytes))})

    # block-as-batch: ONE bitmap per input block, not one per default
    # 1024-row batch (at 10^9 rows the per-batch form emits ~10^6
    # bitmaps = 100+ GB of partials; per block it's bounded by block
    # count, and local_or folds those 1024-at-a-time without a shuffle)
    folded = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None) \
        .map_batches(local_or, batch_format="pyarrow", batch_size=1024)
    acc = np.zeros(nbytes, np.uint8)
    for b in folded.iter_batches(batch_size=None,
                                 batch_format="pyarrow"):
        for row in b["bm"].to_pylist():
            acc |= np.frombuffer(row, np.uint8)
    return acc


def approx_distinct(ds, group_col: str, value_col: str, p: int = 12):
    """Distributed approx COUNT(DISTINCT value) per group.

    Plan: per-batch register combiner (raw rows die here) → a second
    batch-level merge that folds ~1024 partial rows per task WITHOUT a
    shuffle (a free tree level — at 10^6 input blocks the per-group
    fan-in to the final fold drops 3 orders of magnitude) → tiny
    groupby.map_groups fold + estimate (group count is bounded; each
    group's payload is blocks/1024 × 2**p bytes). Returns a Dataset of
    (group, approx_n: int64)."""
    m = 1 << p

    def partial(b: pa.Table) -> pa.Table:
        return hll_partial_batch(b, group_col, value_col, p)

    def local_merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        enc = b[group_col].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        rows = b["regs"].to_pylist()
        mat = np.frombuffer(b"".join(rows), np.uint8) \
            .reshape(len(rows), m)
        out = np.zeros((len(enc.dictionary), m), np.uint8)
        np.maximum.at(out, codes, mat)
        return pa.table({group_col: enc.dictionary,
                         "regs": pa.array([r.tobytes() for r in out],
                                          pa.binary(m))})

    def fold(g: pa.Table) -> pa.Table:
        est = hll_estimate(hll_merge_rows(g))
        return pa.table({group_col: g[group_col][:1],
                         "approx_n": pa.array([int(round(est))],
                                              pa.int64())})

    # block-as-batch: one register row per (group × block), not per
    # default 1024-row batch — 64× fewer partial rows at this block
    # layout, same bytes logic as bloom_from_dataset
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    merged = partials.map_batches(local_merge, batch_format="pyarrow",
                                  batch_size=1024)
    return merged.groupby(group_col).map_groups(fold,
                                                batch_format="pyarrow")


# ------------------------------------------------- log-histogram quantiles

def loghist_bucket(iv: np.ndarray) -> np.ndarray:
    """DDSketch-style base-2 bucket of a 6-dp-scaled int64 value
    (Masson, Lee, Rim, "DDSketch: a fast and fully-mergeable quantile
    sketch with relative-error guarantees", VLDB 2019 — γ = 2 and an
    INTEGER mantissa domain, so bucketing is an exact bit-scan with no
    float log anywhere): iv > 0 → bit_length(iv); 0 → 0; iv < 0 →
    −bit_length(−iv). Deterministic and engine-independent — the SQL
    side computes the identical bucket as ``length(bin(iv))``."""
    out = np.zeros(len(iv), np.int64)
    pos = iv > 0
    neg = iv < 0
    if pos.any():
        out[pos] = _floor_log2(iv[pos].astype(np.uint64)) + 1
    if neg.any():
        out[neg] = -(_floor_log2((-iv[neg]).astype(np.uint64)) + 1)
    return out


def loghist_partial_batch(batch: pa.Table, group_col: str,
                          value_col: str) -> pa.Table:
    """Per-batch (group, bucket) count partials: pin-scale the value
    with the house formula floor(v·1e6 + 0.5) (IEEE-identical to the
    SQL side), exact-bit-scan bucket, Arrow group_by count. Counts are
    int64 sums → the merged sketch is layout/schedule-invariant."""
    v = batch[value_col].combine_chunks().to_numpy(
        zero_copy_only=False).astype(np.float64)
    iv = np.floor(v * 1e6 + 0.5).astype(np.int64)
    t = pa.table({group_col: batch[group_col],
                  "bucket": pa.array(loghist_bucket(iv), pa.int64())})
    g = t.group_by([group_col, "bucket"]).aggregate([("bucket",
                                                      "count")])
    return g.rename_columns([group_col, "bucket", "c"])


_LOGHIST_QS = ((50, 100, "p50"), (90, 100, "p90"), (99, 100, "p99"))


def _loghist_rep(bucket: int) -> float:
    """Bucket → representative value: the bucket's lower bound
    2^(|b|−1)/1e6 (sign-carried; 0 for the zero bucket). An exact
    power of two divided by the same literal — bit-identical IEEE in
    any engine."""
    if bucket == 0:
        return 0.0
    mag = float(1 << (abs(bucket) - 1)) / 1e6
    return mag if bucket > 0 else -mag


def loghist_quantiles(ds, group_col: str, value_col: str,
                      qs=_LOGHIST_QS) -> pa.Table:
    """Approximate per-group quantiles from the mergeable base-2
    log-histogram: per-batch partials → one sorted run-sum over
    (group, bucket) → a driver-side selection over the TINY merged
    sketch (≤ #groups × 128 rows — 64 magnitudes per sign — no matter
    how many input rows). Quantile rule: 1-based rank ⌈q·n⌉, the
    smallest bucket whose cumulative count reaches the rank (the
    ``quantile_disc`` convention over buckets); the answer is the
    bucket's lower bound, i.e. a ≤2× relative-error estimate, with
    rank arithmetic in exact integers. Returns one row per group:
    (group, n, p50, p90, p99)."""
    from zhtml_ray.stages.sortagg import sorted_sum_per_group

    merged = sorted_sum_per_group(
        ds.map_batches(
            lambda b: loghist_partial_batch(b, group_col, value_col),
            batch_format="pyarrow"),
        [group_col, "bucket"], ["c"])

    groups: dict = {}
    for b in merged.iter_batches(batch_size=None,
                                 batch_format="pyarrow"):
        for g, bk, c in zip(b[group_col].to_pylist(),
                            b["bucket"].to_pylist(),
                            b["c"].to_pylist()):
            groups.setdefault(g, {})
            groups[g][bk] = groups[g].get(bk, 0) + c

    out = {group_col: [], "n": []}
    for _, _, name in qs:
        out[name] = []
    for g in sorted(groups):
        buckets = sorted(groups[g])
        counts = np.array([groups[g][bk] for bk in buckets], np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1])
        out[group_col].append(g)
        out["n"].append(n)
        for qn, qd, name in qs:
            rank = (n * qn + qd - 1) // qd
            idx = int(np.searchsorted(cum, rank))
            out[name].append(_loghist_rep(buckets[idx]))
    return pa.table({
        group_col: pa.array(out[group_col]),
        "n": pa.array(out["n"], pa.int64()),
        **{name: pa.array(out[name], pa.float64())
           for _, _, name in qs}})


def sql_loghist_quantiles(table_sql: str, group_col: str,
                          value_col: str, qs=_LOGHIST_QS) -> str:
    """DuckDB oracle for :func:`loghist_quantiles`: the identical pin
    + ``length(bin(iv))`` bucket, window cumulative counts, integer
    rank selection, and the same exact power-of-two representative."""
    rep = """CASE WHEN {b} = 0 THEN 0.0
         WHEN {b} > 0 THEN CAST(1::BIGINT << ({b} - 1) AS DOUBLE) / 1000000.0
         ELSE -(CAST(1::BIGINT << (-{b} - 1) AS DOUBLE) / 1000000.0) END"""
    qcols = []
    for qn, qd, name in qs:
        sub = f"""(SELECT min(bucket) FROM cum
      WHERE cum.g = tot.g
        AND cum.cm >= (tot.n * {qn} + {qd} - 1) // {qd})"""
        qcols.append("  " + rep.format(b=sub) + f" AS {name}")
    return f"""
WITH iv AS (SELECT {group_col} AS g,
                   CAST(floor({value_col} * 1000000 + 0.5) AS BIGINT)
                       AS iv
            FROM ({table_sql})),
bk AS (SELECT g, CASE WHEN iv = 0 THEN 0
                      WHEN iv > 0 THEN length(bin(iv))
                      ELSE -length(bin(-iv)) END AS bucket FROM iv),
cnt AS (SELECT g, bucket, count(*)::BIGINT AS c FROM bk GROUP BY 1, 2),
cum AS (SELECT g, bucket, sum(c) OVER (PARTITION BY g ORDER BY bucket
                                       )::BIGINT AS cm FROM cnt),
tot AS (SELECT g, sum(c)::BIGINT AS n FROM cnt GROUP BY 1)
SELECT tot.g AS {group_col}, tot.n AS n,
{",".join(qcols)}
FROM tot
"""
