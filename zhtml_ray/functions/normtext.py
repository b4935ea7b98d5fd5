"""Unicode text normalization for crawl corpora: NFC composition plus
whitespace canonicalization (collapse every run of Unicode whitespace,
NBSP and zero-width space to one ASCII space; trim the ends).

This is the standard first cleanup pass of a pretraining pipeline
(ftfy/CCNet-style): combining-mark sequences from different encoders
must compose to one canonical form before any hash-based dedup or
tokenization, or byte-identical text dedups as distinct.

Engine and SQL oracle execute the SAME rule text (the pattern below is
RE2 in both pyarrow and DuckDB), mirroring ``functions/pii.py`` — the
differential gate compares two independent engines on one rule, so
neither implementation can drift silently.

Scale notes: the whitespace collapse is one vectorized RE2 pass. NFC
composition CANNOT use ``pc.utf8_normalize`` — in this pyarrow 16.1
build it is a silent NO-OP for every form (measured: ``e`` + U+0301
passes through uncomposed under NFC/NFKC/NFD/NFKD — the build lacks the
utf8proc transform; do not "simplify" back to it). Instead: a
vectorized RE2 non-ASCII pre-filter (NFC is the identity on pure-ASCII
text, so those batches pay zero Python), then per-row
``unicodedata.is_normalized`` (a C quick-check — real crawl text is
almost always already NFC) with ``unicodedata.normalize`` only on the
rows that fail it.
"""
from __future__ import annotations

import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

# \s plus NBSP (U+00A0) and zero-width space (U+200B); the literal
# characters embed as UTF-8 in both the RE2 pattern and the SQL text.
WS_CLASS = "[\\s ​]+"


_NON_ASCII = "[^\\x00-\\x7f]"


def _nfc(raw):
    """NFC-compose a string array; see the module docstring for why
    this is not ``pc.utf8_normalize``."""
    if isinstance(raw, pa.ChunkedArray):
        raw = raw.combine_chunks()
    mask = pc.match_substring_regex(raw, _NON_ASCII)
    if not pc.any(mask).as_py():
        return raw
    vals = raw.to_pylist()
    dirty = False
    for i, s in enumerate(vals):
        if s is not None and not unicodedata.is_normalized("NFC", s):
            vals[i] = unicodedata.normalize("NFC", s)
            dirty = True
    return pa.array(vals, pa.string()) if dirty else raw


def normalize_column(raw: pa.ChunkedArray | pa.Array):
    """Returns ``(norm_text, changed, n_chars)`` arrays for a string
    column: NFC-compose, collapse whitespace runs, trim, and report
    whether the row changed and its normalized codepoint length."""
    norm = _nfc(raw)
    collapsed = pc.replace_substring_regex(
        norm, pattern=WS_CLASS, replacement=" ")
    clean = pc.utf8_trim(collapsed, characters=" ")
    changed = pc.not_equal(clean, raw)
    n_chars = pc.cast(pc.utf8_length(clean), pa.int64())
    return clean, changed, n_chars


def sql_normalize_exprs(col: str) -> tuple[str, str, str]:
    """DuckDB expressions mirroring :func:`normalize_column` exactly:
    (norm_text, changed, n_chars). ``nfc_normalize`` is DuckDB's
    utf8proc NFC; ``regexp_replace`` is RE2 with the same pattern
    string; ``trim(x, ' ')``/``length`` match ``utf8_trim``/
    ``utf8_length`` (codepoints)."""
    clean = (f"trim(regexp_replace(nfc_normalize({col}), "
             f"'{WS_CLASS}', ' ', 'g'), ' ')")
    return (clean, f"({clean} != {col})", f"length({clean})::BIGINT")
