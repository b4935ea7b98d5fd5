"""URL canonicalization kernel tests + DuckDB differential (the SQL is
generated from the same pattern text, so this pits pyarrow's RE2
against DuckDB's RE2 on identical rules)."""

import duckdb
import pyarrow as pa
import pyarrow.compute as pc

from zhtml_ray.functions.urltools import canonicalize_batch, sql_canonical_exprs


def _tbl(urls):
    return pa.table({"doc_id": pa.array(range(len(urls)), pa.int64()),
                     "url": pa.array(urls, pa.string())})


def test_basic_canonicalization():
    t = canonicalize_batch(_tbl([
        "HTTPS://WWW.Example.COM:443/en/p/12?utm_source=a&id=7&utm_medium=m#x",
        "http://Host.Org:80",
        "https://h:8080/p?q=1#frag",
    ]))
    assert t["canonical_url"].to_pylist() == [
        "https://www.example.com/en/p/12?id=7",
        "http://host.org/",
        "https://h:8080/p?q=1",   # non-default port kept
    ]
    assert t["host"].to_pylist() == ["www.example.com", "host.org", "h:8080"]


def test_default_port_strip_is_scheme_aware():
    # review-caught: http://h:443 and https://h:80 are DIFFERENT
    # origins than the portless forms and must not merge
    t = canonicalize_batch(_tbl([
        "http://h:443/x", "https://h:80/x", "ftp://h:80/x",
        "http://h:80/x", "https://h:443/x",
    ]))
    assert t["canonical_url"].to_pylist() == [
        "http://h:443/x", "https://h:80/x", "ftp://h:80/x",
        "http://h/x", "https://h/x",
    ]


def test_utm_in_path_untouched():
    # review-caught: a literal &utm_ inside the PATH (unencoded '&' is
    # legal there) must not eat the rest of the URL
    t = canonicalize_batch(_tbl([
        "https://a.b/p&utm_source=x/q?id=1",
        "https://a.b/p&utm_x=1/q?id=2&utm_y=3",
    ]))
    assert t["canonical_url"].to_pylist() == [
        "https://a.b/p&utm_source=x/q?id=1",
        "https://a.b/p&utm_x=1/q?id=2",
    ]


def test_utm_positions_all_stripped():
    t = canonicalize_batch(_tbl([
        "https://a.b/p?utm_a=1&utm_b=2&x=3",   # leading + middle
        "https://a.b/p?utm_a=1",               # sole param
        "https://a.b/p?x=1&utm_z=9",           # trailing
        "https://a.b/p?utm_a=&utm_b=",         # empty values, all utm
    ]))
    assert t["canonical_url"].to_pylist() == [
        "https://a.b/p?x=3",
        "https://a.b/p",
        "https://a.b/p?x=1",
        "https://a.b/p",
    ]


def test_invalid_urls_yield_null():
    t = canonicalize_batch(_tbl(["not a url", "relative/path", ""]))
    assert t["canonical_url"].to_pylist() == [None, None, None]
    assert t["host"].to_pylist() == [None, None, None]


def test_idempotent():
    urls = [
        "HTTPS://WWW.Example.COM:443/en?utm_source=a&id=7#x",
        "http://h/",
        "https://a.b/p?x=1&utm_z=9",
    ]
    once = canonicalize_batch(_tbl(urls))
    twice = canonicalize_batch(
        pa.table({"doc_id": once["doc_id"], "url": once["canonical_url"]}))
    assert once["canonical_url"].to_pylist() == \
        twice["canonical_url"].to_pylist()


def test_duckdb_differential():
    urls = [
        "HTTPS://WWW.Example.COM:443/en/p/12?utm_source=a&id=7&utm_medium=m#x",
        "http://Host.Org:80",
        "https://a.b/path?utm_a=1&utm_b=2&x=3",
        "https://a.b/path?utm_a=1",
        "https://a.b/?x=1&utm_z=9",
        "ftp://Mixed.Case/Dir/File",
        "https://h:8080/p?q=1#f",
        "https://x.y:443/?utm_only=1#frag",
        "http://u.v:80/a/b/../c?&weird=&#",
    ]
    t = canonicalize_batch(_tbl(urls))
    host_e, canon_e = sql_canonical_exprs("url")
    con = duckdb.connect()
    con.register("u", _tbl(urls))
    got = con.execute(
        f"SELECT {host_e} AS host, {canon_e} AS canonical_url FROM u "
        f"ORDER BY doc_id").fetch_arrow_table()
    assert got["host"].to_pylist() == t["host"].to_pylist()
    assert got["canonical_url"].to_pylist() == t["canonical_url"].to_pylist()


def test_preserves_input_columns():
    base = pa.table({"url": pa.array(["https://a.b/x"]),
                     "n_chars": pa.array([10], pa.int64())})
    t = canonicalize_batch(base)
    assert t["n_chars"].to_pylist() == [10]
    assert set(t.column_names) == {"url", "n_chars", "host", "canonical_url"}
