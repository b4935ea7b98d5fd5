"""Unit tests for the session-12 LLM-data quality filters: Gopher
rules (integer-exact signals) and the C4 line filter."""

import numpy as np
import pyarrow as pa


def _gopher(texts, **kw):
    from zhtml_ray.functions.textstats import GopherStats
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return GopherStats(**kw)(t).to_pydict()


def test_gopher_counts_hand_case():
    # 6 words, 2 bigram dups ("a b" twice + "b a" once dup? compute):
    # words: a b a b a c -> bigrams: ab ba ab ba ac -> 5 bigrams,
    # distinct {ab, ba, ac} = 3 -> dup 2. top word 'a' count 3 len 1.
    out = _gopher(["a b a b a c"])
    assert out["n_words"] == [6]
    assert out["n_chars"] == [6]
    assert out["n_bigrams"] == [5]
    assert out["dup_bigrams"] == [2]
    assert out["top_word_mass"] == [3]
    assert out["keep"] == [False]  # word count below min_words


def test_gopher_stop_hits_and_keep_rule():
    words = ["join", "hash", "row"] + ["alpha%d" % i for i in range(30)]
    txt = " ".join(words)
    out = _gopher([txt])
    assert out["stop_hits"] == [3]
    assert out["n_words"] == [33]
    # mean word len: 4+4+3 + 30*~6 chars -> within [3,10]*n
    assert out["keep"] == [True]
    # same doc but below the stopword floor
    out2 = _gopher([" ".join(words[1:] + ["alphax"])])
    assert out2["stop_hits"] == [2]
    assert out2["keep"] == [False]


def test_gopher_empty_and_single_word():
    out = _gopher(["", "solo", None])
    assert out["n_words"] == [0, 1, 0]
    assert out["n_bigrams"] == [0, 0, 0]
    assert out["dup_bigrams"] == [0, 0, 0]
    assert out["top_word_mass"] == [0, 4, 0]
    assert out["keep"] == [False, False, False]


def test_gopher_top_word_mass_prefers_char_mass_not_count():
    # 'xxxxxxxx' appears twice (mass 16); 'a' appears 5 times (mass 5)
    out = _gopher(["xxxxxxxx a a xxxxxxxx a a a"])
    assert out["top_word_mass"] == [16]


def _c4(texts):
    from zhtml_ray.pipelines.ops_queries import _c4_batch
    t = pa.table({"url": pa.array([f"u{i}" for i in range(len(texts))]),
                  "extracted_text": pa.array(texts, pa.string())})
    return _c4_batch(t).to_pydict()


def test_c4_line_rules():
    doc = ("A good long sentence with many words here.\n"
           "short line.\n"                      # < 5 words
           "no terminal punctuation at all\n"   # no punct
           "  Another fine sentence that ends properly!  \n"
           "\n"
           'He said "stop" and that was "the end"')  # ends with quote
    out = _c4([doc])
    assert out["n_lines"] == [5]
    assert out["n_kept"] == [3]
    assert out["clean_text"][0].split("\n") == [
        "A good long sentence with many words here.",
        "Another fine sentence that ends properly!",
        'He said "stop" and that was "the end"']
    assert out["keep"] == [True]


def test_c4_doc_level_rejects():
    base = "One two three four five six.\n" * 3
    assert _c4([base])["keep"] == [True]
    assert _c4([base + "code { display: none }\n"])["keep"] == [False]
    assert _c4([base + "Lorem Ipsum dolor sit amet keeps going."])[
        "keep"] == [False]
    assert _c4(["One two three four five six.\n" * 2])["keep"] == [False]
    assert _c4(["", None])["keep"] == [False, False]


def test_c4_nbsp_is_not_a_word_separator():
    # U+00A0 joins words on BOTH engine and oracle (ASCII class):
    # 4 space-separated tokens -> below the 5-word floor
    doc = "alpha beta gamma delta epsilon."
    out = _c4([doc])
    assert out["n_kept"] == [0]
