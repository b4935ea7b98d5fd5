"""Unicode normalization kernel tests + DuckDB differential, and
small-scale oracle checks for the host_cap / length_quantiles ops."""

import duckdb
import pyarrow as pa
import pyarrow.compute as pc

from zhtml_ray.functions.normtext import _nfc, normalize_column, sql_normalize_exprs


def test_nfc_composes_combining_marks():
    import unicodedata
    samples = ["Café", "Åben", "ascii only", "", "é́x"]
    out = _nfc(pa.array(samples)).to_pylist()
    assert out == [unicodedata.normalize("NFC", s) for s in samples]
    assert out[0] == "Café" and out[1] == "Åben"


def test_pyarrow_utf8_normalize_is_still_a_noop():
    """This build's pc.utf8_normalize silently does nothing (the reason
    _nfc exists — see functions/normtext.py docstring). If a pyarrow
    upgrade fixes it, this flips and _nfc can become fully vectorized."""
    s = pa.array(["Café"])
    assert pc.utf8_normalize(s, form="NFC")[0].as_py() == "Café"


def test_whitespace_collapse_and_trim():
    clean, changed, n_chars = normalize_column(pa.array([
        "a\t\tb  c​d",   # tabs, NBSP, zero-width space
        "  lead and trail \n",
        "already clean",
    ]))
    assert clean.to_pylist() == ["a b c d", "lead and trail",
                                 "already clean"]
    assert changed.to_pylist() == [True, True, False]
    assert n_chars.to_pylist() == [7, 14, 13]


def test_nulls_preserved():
    clean, changed, n_chars = normalize_column(
        pa.array(["x", None, " y "], pa.string()))
    assert clean.to_pylist() == ["x", None, "y"]
    assert changed.to_pylist() == [False, None, True]
    assert n_chars.to_pylist() == [1, None, 1]


def test_ascii_fast_path_returns_input_unchanged():
    a = pa.array(["plain", "ascii rows", "pay zero python"])
    assert _nfc(a) is a


def test_duckdb_differential():
    """Engine vs DuckDB on the SAME rule text, messy unicode inputs."""
    rows = [
        "Café  \t du​monde  ",
        "  x",
        "Å B́ C",
        "plain",
        "tab\there\nnewline",
    ]
    t = pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                  "text": pa.array(rows, pa.string())})
    clean, changed, n_chars = normalize_column(t["text"])
    con = duckdb.connect()
    con.register("t", t)
    c_expr, ch_expr, n_expr = sql_normalize_exprs("text")
    got = con.execute(
        f"SELECT {c_expr}, {ch_expr}, {n_expr} FROM t ORDER BY doc_id"
    ).fetchall()
    assert [r[0] for r in got] == clean.to_pylist()
    assert [r[1] for r in got] == changed.to_pylist()
    assert [r[2] for r in got] == n_chars.to_pylist()


def test_host_cap_matches_sql(ray_session):
    from zhtml_ray.pipelines.ops_queries import _sql_host_cap, q_host_cap

    got = q_host_cap("/root/testdata/sf0.001").take_all()
    got = sorted((r["host"], r["doc_id"]) for r in got)
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'")
    want = sorted(map(tuple, con.sql(_sql_host_cap()).fetchall()))
    assert got == want
    # cap actually binds: every host has > 5 docs at sf0.001
    hosts = {h for h, _ in got}
    assert all(sum(1 for x, _ in got if x == h) == 5 for h in hosts)


def test_length_quantiles_tie_semantics(ray_session, tmp_path):
    """Heavy ties + tiny n stress the ceil(n*q) rank pin directly."""
    import ray.data as rd

    texts = ["a" * k for k in [3, 3, 3, 3, 7, 7, 9, 100, 100, 100, 2]]
    pa_tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                       "text": pa.array(texts, pa.string())})
    import pyarrow.parquet as pq
    pq.write_table(pa_tbl, tmp_path / "documents.parquet")

    from zhtml_ray.pipelines.ops_queries import _QUANTS, q_length_quantiles
    got = q_length_quantiles(str(tmp_path))
    con = duckdb.connect()
    want = con.execute(
        "SELECT " + ", ".join(
            f"quantile_disc(length(text), {q})" for q in _QUANTS)
        + f" FROM '{tmp_path}/documents.parquet'").fetchone()
    assert got["n_chars"].to_pylist() == list(want)
    assert got["q"].to_pylist() == _QUANTS
