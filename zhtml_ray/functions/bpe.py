"""Distributed BPE tokenizer-vocabulary training + corpus encoding.

The tokenizer-training job a pretraining pipeline runs over the corpus
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units" — public paper): learn ``num_merges``
byte-pair merges from word-type frequencies, then encode every
document with the learned merge table and report its subword token
count.

Scale shape (the part that must survive 100 TB):

* the ONLY corpus-scale pass is the word-TYPE frequency table — the
  same per-batch word-count pre-combine → ``sorted_sum_per_group``
  shuffle as the exact heavy hitters (X81); the shuffle moves one row
  per (batch, word), never per token.
* the type table is capped to the top ``max_types`` word types by
  (count DESC, word ASC) — the standard practical move (frequency
  mass concentrates; HF/sentencepiece trainers do the same) — via the
  existing deterministic sort+limit, so the merge loop's input is
  BOUNDED regardless of corpus size.
* merge rounds run on that bounded table as flat-numpy vector passes
  (one lexsort pair count + one vectorized leftmost-nonoverlap merge
  per round) — O(max_types·avg_len) per round, independent of corpus
  rows, exactly how reference BPE trainers operate on a word-count
  table rather than the raw corpus.
* encoding is a pure per-batch map: each batch dictionary-encodes its
  words and encodes each DISTINCT word once (the merge table is
  broadcast once via ``ray.put``), so per-doc token counts cost
  O(distinct words per batch), zero shuffles.

Determinism: counts are exact integers; the winning pair each round is
argmax by (count DESC, left-string ASC, right-string ASC); within-word
application is leftmost-first non-overlapping. No floats anywhere, so
results are layout/schedule/engine invariant with no pin. Training is
order-independent of the type table (argmax over counts), and the
within-word merge is per-word — both certified by the serial
INDEPENDENT naive oracle (dict/Counter recompute per round) in
``pipelines/golden.py`` and the pytest differential sweep.

No end-of-word marker: merges act within whitespace-delimited words
(the corpus word is the unit, matching every other corpus-stat
operator's tokenization); the choice is pinned by the oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_NUM_MERGES = 120
DEFAULT_MIN_COUNT = 2
DEFAULT_MAX_TYPES = 200_000


# ------------------------------------------------------------ training

def _flatten_types(words: list[str], freqs: np.ndarray):
    """Word types → (symbols list, flat sym ids, flat word ids, flat
    per-position word freq). One bounded Python pass over the TYPE
    table (≤ max_types rows), never the corpus."""
    symbols: list[str] = []
    sym_of: dict[str, int] = {}
    flat_sym: list[int] = []
    flat_wid: list[int] = []
    for wi, w in enumerate(words):
        for ch in w:
            si = sym_of.get(ch)
            if si is None:
                si = sym_of[ch] = len(symbols)
                symbols.append(ch)
            flat_sym.append(si)
            flat_wid.append(wi)
    sym = np.asarray(flat_sym, np.int64)
    wid = np.asarray(flat_wid, np.int64)
    pfreq = freqs[wid] if wid.size else np.zeros(0, np.int64)
    return symbols, sym_of, sym, wid, pfreq


def _merge_positions(sym: np.ndarray, wid: np.ndarray,
                     left_id: int, right_id: int) -> np.ndarray:
    """Positions of leftmost-first NON-OVERLAPPING (left,right)
    occurrences within words. Consecutive candidate positions overlap
    (possible only when left==right symbol runs), so within each run
    of consecutive candidates keep the even offsets."""
    if sym.size < 2:
        return np.zeros(0, np.int64)
    cand = np.flatnonzero((sym[:-1] == left_id) & (sym[1:] == right_id)
                          & (wid[:-1] == wid[1:]))
    if cand.size == 0:
        return cand
    run_start = np.r_[True, np.diff(cand) > 1]
    run_id = np.cumsum(run_start) - 1
    first = cand[np.flatnonzero(run_start)]
    offset = cand - first[run_id]
    return cand[offset % 2 == 0]


def _apply_merge(sym, wid, pfreq, pos, new_id):
    sym = sym.copy()
    sym[pos] = new_id
    keep = np.ones(sym.size, bool)
    keep[pos + 1] = False
    return sym[keep], wid[keep], pfreq[keep]


def bpe_train_types(words: list[str], freqs: np.ndarray,
                    num_merges: int = DEFAULT_NUM_MERGES,
                    min_count: int = DEFAULT_MIN_COUNT):
    """Learn merges from a (word type, frequency) table. Returns
    ``[(left, right, pair_count), ...]`` in rank order. Vectorized:
    each round is one lexsort pair count over the flat symbol array
    plus one vectorized merge application."""
    freqs = np.asarray(freqs, np.int64)
    symbols, sym_of, sym, wid, pfreq = _flatten_types(words, freqs)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        if sym.size < 2:
            break
        adj = wid[:-1] == wid[1:]
        L, R, W = sym[:-1][adj], sym[1:][adj], pfreq[:-1][adj]
        if L.size == 0:
            break
        order = np.lexsort((R, L))
        Ls, Rs, Ws = L[order], R[order], W[order]
        new = np.r_[True, (Ls[1:] != Ls[:-1]) | (Rs[1:] != Rs[:-1])]
        starts = np.flatnonzero(new)
        csum = np.r_[0, np.cumsum(Ws)]
        ends = np.r_[starts[1:], Ls.size]
        counts = csum[ends] - csum[starts]
        best = counts.max()
        if best < min_count:
            break
        tied = np.flatnonzero(counts == best)
        # few ties: resolve by (left string, right string) ascending
        li, ri = min(
            ((int(Ls[starts[t]]), int(Rs[starts[t]])) for t in tied),
            key=lambda p: (symbols[p[0]], symbols[p[1]]))
        new_str = symbols[li] + symbols[ri]
        new_id = sym_of.get(new_str)
        if new_id is None:
            new_id = sym_of[new_str] = len(symbols)
            symbols.append(new_str)
        merges.append((symbols[li], symbols[ri], int(best)))
        pos = _merge_positions(sym, wid, li, ri)
        sym, wid, pfreq = _apply_merge(sym, wid, pfreq, pos, new_id)
    return merges


def merges_to_table(merges) -> pa.Table:
    return pa.table({
        "rank": pa.array(np.arange(len(merges), dtype=np.int64)),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "pair_cnt": pa.array([m[2] for m in merges], pa.int64())})


# ------------------------------------------------------------ encoding

def bpe_encode_types(words: list[str], merges) -> np.ndarray:
    """Subword token count per word type: apply the learned merges in
    rank order (same leftmost-nonoverlap rule as training) over the
    flat symbol array of the DISTINCT words. Unknown characters stay
    single symbols. Returns int64 counts aligned with ``words``."""
    n = len(words)
    if n == 0:
        return np.zeros(0, np.int64)
    symbols, sym_of, sym, wid, _ = _flatten_types(
        words, np.ones(n, np.int64))
    for left, right, _cnt in merges:
        li = sym_of.get(left)
        ri = sym_of.get(right)
        if li is None or ri is None:
            continue  # pair can't occur in this batch's vocabulary
        pos = _merge_positions(sym, wid, li, ri)
        new_str = left + right
        new_id = sym_of.get(new_str)
        if new_id is None:
            new_id = sym_of[new_str] = len(symbols)
            symbols.append(new_str)
        if pos.size:
            sym = sym.copy()
            sym[pos] = new_id
            keep = np.ones(sym.size, bool)
            keep[pos + 1] = False
            sym, wid = sym[keep], wid[keep]
    return np.bincount(wid, minlength=n).astype(np.int64)


# ------------------------------------------------- dataset-level ops

def word_type_counts(ds):
    """Corpus word-TYPE frequency table (word, cnt) — per-batch
    pre-combine over dictionary codes, then ONE vocabulary-bounded
    ``sorted_sum_per_group`` shuffle (the X81 plan)."""
    from zhtml_ray.functions.corpusstats import _split_encode
    from zhtml_ray.stages.sortagg import sorted_sum_per_group

    def partial(b: pa.Table) -> pa.Table:
        _row, codes, vocab, _lens = _split_encode(b["text"])
        if len(vocab) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        return pa.table({"word": vocab, "cnt": pa.array(cnt)})

    return sorted_sum_per_group(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["word"], ["cnt"])


def bpe_train(ds, num_merges: int = DEFAULT_NUM_MERGES,
              min_count: int = DEFAULT_MIN_COUNT,
              max_types: int = DEFAULT_MAX_TYPES) -> pa.Table:
    """Train a BPE merge table over a docs Dataset's ``text`` column.
    Only the capped type table (≤ ``max_types`` rows, top by count
    with lexical tie-break) ever reaches the driver."""
    import pyarrow.compute as pc

    cnt = word_type_counts(ds)

    def neg(b: pa.Table) -> pa.Table:
        return b.append_column("neg", pc.negate_checked(b["cnt"]))

    top = cnt.map_batches(neg, batch_format="pyarrow") \
        .sort(["neg", "word"]).limit(max_types) \
        .map_batches(lambda b: b.drop_columns(["neg"]),
                     batch_format="pyarrow")
    blocks = ray_get_all_blocks(top)
    if not blocks:
        return merges_to_table([])
    t = pa.concat_tables(blocks)
    words = t["word"].to_pylist()
    freqs = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    return merges_to_table(bpe_train_types(words, freqs,
                                           num_merges, min_count))


def ray_get_all_blocks(ds) -> list[pa.Table]:
    """Collect a BOUNDED dataset's blocks as Arrow tables (the type
    table is ≤ max_types rows by construction — this is the explicit
    bounded-collect, not a corpus materialization). 0-row sorted
    blocks carry NO schema (house landmine) and are dropped."""
    import ray
    return [t for t in (ray.get(ref) for ref in ds.to_arrow_refs())
            if t.num_rows > 0]


def bpe_encode(ds, merges_table: pa.Table):
    """Per-doc subword token count under a learned merge table:
    merges broadcast once via ``ray.put``; each batch encodes its
    DISTINCT words once (dictionary encode) and scatters counts back
    to rows. Pure map, zero shuffles."""
    import ray

    from zhtml_ray.functions.corpusstats import _split_encode

    merges = list(zip(merges_table["left"].to_pylist(),
                      merges_table["right"].to_pylist(),
                      merges_table["pair_cnt"].to_pylist()))
    mref = ray.put(merges)

    def encode(b: pa.Table) -> pa.Table:
        m = ray.get(mref)
        row, codes, vocab, _lens = _split_encode(b["text"])
        n = b.num_rows
        if len(vocab) == 0:
            return pa.table({"doc_id": b["doc_id"],
                             "n_bpe": pa.array(np.zeros(n, np.int64))})
        per_type = bpe_encode_types(vocab.to_pylist(), m)
        tok = np.bincount(row, weights=per_type[codes],
                          minlength=n).astype(np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "n_bpe": pa.array(tok)})

    return ds.map_batches(encode, batch_format="pyarrow")
