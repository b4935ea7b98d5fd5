"""PII redaction kernel tests — Arrow-kernel level plus a DuckDB
differential check that the SQL generated from the same PII_RULES text
produces byte-identical masked output and counts (two independent RE2
engines on the shared rule source)."""

import duckdb
import pyarrow as pa
import pytest

from zhtml_ray.functions.pii import PII_RULES, redact_batch, sql_redact_exprs


def _tbl(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_email_masking_and_count():
    t = redact_batch(_tbl([
        "mail me at alice.b+spam@sub.Example-Host.org today",
        "no pii here",
        "two: a@b.cc and z_9%x@y.io end",
    ]))
    assert t["redacted"].to_pylist() == [
        "mail me at <EMAIL> today",
        "no pii here",
        "two: <EMAIL> and <EMAIL> end",
    ]
    assert t["n_email"].to_pylist() == [1, 0, 2]
    assert t["n_phone"].to_pylist() == [0, 0, 0]


def test_phone_and_ip():
    t = redact_batch(_tbl([
        "call 555-123-4567 or 555.987.6543 now",
        "server at 10.0.255.1 and 192.168.1.2",
        "not a phone: 55-123-4567, 5551234567",
    ]))
    assert t["redacted"].to_pylist() == [
        "call <PHONE> or <PHONE> now",
        "server at <IP> and <IP>",
        "not a phone: 55-123-4567, 5551234567",
    ]
    assert t["n_phone"].to_pylist() == [2, 0, 0]
    assert t["n_ipv4"].to_pylist() == [0, 2, 0]


def test_staged_counts_no_double_mask():
    # the dotted-quad inside an email-like token must be consumed by the
    # email rule, never counted again by the ipv4 rule; a phone-shaped
    # local part is consumed by the email rule too
    t = redact_batch(_tbl([
        "x 555-123-4567@corp.example y",
        "ip-ish mail: a@1.2.3.4 done",
    ]))
    assert t["redacted"].to_pylist() == [
        "x <EMAIL> y",
        "ip-ish mail: <EMAIL> done",
    ]
    assert t["n_email"].to_pylist() == [1, 1]
    assert t["n_phone"].to_pylist() == [0, 0]
    assert t["n_ipv4"].to_pylist() == [0, 0]


def test_preserves_other_columns_and_empty():
    base = pa.table({"doc_id": pa.array([7], pa.int64()),
                     "text": pa.array([""], pa.string()),
                     "lang": pa.array(["en"], pa.string())})
    t = redact_batch(base)
    assert t["doc_id"].to_pylist() == [7]
    assert t["lang"].to_pylist() == ["en"]
    assert t["redacted"].to_pylist() == [""]
    assert t["n_email"].to_pylist() == [0]


_NASTY = [
    "a@b.com@c.com chained",                    # leftover @domain after mask
    "1.2.3.4.5.6.7.8 run of quads",             # adjacent quads, one scan
    "edge 999.999.999.999 and 0.0.0.0",
    "dot-end phone 555-123-4567. next",
    "unicode café@naïve.fr tab\tand\nnewline 10.1.1.1",
    "[EMAIL]-shaped text user@host.co, punct (555-123-4567)",
    "",
    "   ",
]


def test_duckdb_differential_on_nasty_strings():
    # the SQL oracle is GENERATED from PII_RULES; this compares the two
    # RE2 engines end to end, including staging order
    t = redact_batch(_tbl(_NASTY))
    redacted, counts = sql_redact_exprs("text")
    con = duckdb.connect()
    con.register("docs", _tbl(_NASTY))
    got = con.execute(
        f"SELECT {', '.join(counts)}, {redacted} AS redacted "
        f"FROM docs ORDER BY doc_id").fetch_arrow_table()
    for col in ("n_email", "n_phone", "n_ipv4", "redacted"):
        assert got[col].to_pylist() == t[col].to_pylist(), col


def test_rule_table_shape():
    names = [n for n, _, _ in PII_RULES]
    assert names == ["email", "phone", "ipv4"]
    for _, pat, repl in PII_RULES:
        assert "'" not in pat and "'" not in repl  # SQL literal safety


@pytest.mark.parametrize("seed", [1, 2])
def test_randomized_separated_pii_fully_masked(seed):
    # whitespace-separated PII is always fully masked (the public
    # single-pass recipe guarantees this only for delimited tokens)
    import random

    import pyarrow.compute as pc
    rng = random.Random(seed)
    texts = []
    for _ in range(200):
        parts = []
        for _ in range(rng.randint(1, 8)):
            kind = rng.randint(0, 3)
            if kind == 0:
                parts.append(f"u{rng.randint(0, 99)}@h{rng.randint(0, 9)}.net")
            elif kind == 1:
                parts.append(f"{rng.randint(100, 999)}-"
                             f"{rng.randint(100, 999)}-"
                             f"{rng.randint(1000, 9999)}")
            elif kind == 2:
                parts.append(".".join(str(rng.randint(0, 255))
                                      for _ in range(4)))
            else:
                parts.append(rng.choice(["plain", "words", "here"]))
        texts.append(" ".join(parts))
    t = redact_batch(_tbl(texts))
    red = t["redacted"]
    for _, pat, _ in PII_RULES:
        leftover = pc.sum(pc.count_substring_regex(red, pat)).as_py()
        assert leftover == 0
