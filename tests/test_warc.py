"""WARC source tests: record parsing, HTTP envelope stripping, gzip
multi-member handling, malformed-record isolation, and the Ray
read_warc integration feeding the extract stage."""

import gzip

import pyarrow as pa
import pytest

from zhtml_ray.sources.warc import (build_warc, http_payload,
                                    iter_warc_records, read_warc,
                                    warc_bytes_to_pages)

_RECS = [
    ("https://a.example/1", "2017-03-22T17:01:03Z",
     b"<!doctype html><p>one</p>"),
    ("https://b.example/2", "2018-06-01T00:00:00Z",
     b"<html><body>two \xc3\xa9</body></html>"),
]


def test_roundtrip_plain():
    t = warc_bytes_to_pages(build_warc(_RECS))
    assert t["url"].to_pylist() == [u for u, _, _ in _RECS]
    assert t["html"].to_pylist() == [h for _, _, h in _RECS]
    assert str(t["warc_ts"].type) == "timestamp[us]"
    assert t["warc_ts"].to_pylist()[0].year == 2017


def test_roundtrip_gzip_multi_member():
    raw = build_warc(_RECS, per_record_gzip=True)
    assert raw[:2] == b"\x1f\x8b"
    t = warc_bytes_to_pages(raw)
    assert t["html"].to_pylist() == [h for _, _, h in _RECS]


def test_warcinfo_and_request_records_skipped():
    # build_warc always prepends a warcinfo record
    t = warc_bytes_to_pages(build_warc(_RECS))
    assert t.num_rows == 2


def test_http_envelope_stripped_only_once():
    body = (b"HTTP/1.1 200 OK\r\nX: y\r\n\r\n"
            b"payload with \r\n\r\n inside")
    assert http_payload(body) == b"payload with \r\n\r\n inside"
    assert http_payload(b"no envelope") == b"no envelope"


def test_payload_containing_warc_magic_not_resplit():
    html = b"<p>WARC/1.0 inside text</p>"
    t = warc_bytes_to_pages(build_warc([("u", "2017-01-01T00:00:00Z", html)]))
    assert t.num_rows == 1
    assert t["html"].to_pylist() == [html]


def test_malformed_record_resync():
    good = build_warc(_RECS)
    # a record with a lying Content-Length larger than the remaining
    # buffer must not produce a row nor break earlier records
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://bad.example\r\n"
           b"Content-Length: 999999\r\n\r\nshort")
    t = warc_bytes_to_pages(good + bad)
    assert t["url"].to_pylist() == [u for u, _, _ in _RECS]
    # non-integer length is skipped and later records still parse
    nolen = (b"WARC/1.0\r\nWARC-Type: response\r\n"
             b"Content-Length: NaN\r\n\r\n")
    t2 = warc_bytes_to_pages(nolen + good)
    assert t2.num_rows == 2


def test_truncated_and_garbage_buffers():
    assert warc_bytes_to_pages(b"").num_rows == 0
    assert warc_bytes_to_pages(b"garbage no magic").num_rows == 0
    assert warc_bytes_to_pages(build_warc(_RECS)[:40]).num_rows == 0
    assert warc_bytes_to_pages(b"\x1f\x8bnot really gzip").num_rows == 0


def test_negative_content_length_terminates():
    # review-caught: a negative length moved the cursor backwards and
    # looped forever on the same record
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: u\r\nContent-Length: -1000\r\n\r\npayload")
    assert warc_bytes_to_pages(bad).num_rows == 0
    t = warc_bytes_to_pages(bad + build_warc(_RECS))
    assert t.num_rows == 2  # resyncs onto the good records


def test_truncated_and_corrupt_gzip_yield_zero_rows():
    # review-caught: EOFError (truncated member) and zlib.error
    # (corrupt deflate) are not OSError and crashed the read task
    good = build_warc(_RECS, per_record_gzip=True)
    assert warc_bytes_to_pages(good[: len(good) // 2]).num_rows == 0
    corrupt = bytearray(good)
    corrupt[20:24] = b"\x00\xff\x00\xff"
    assert warc_bytes_to_pages(bytes(corrupt)).num_rows == 0


def test_bad_date_yields_null_ts():
    t = warc_bytes_to_pages(build_warc([("u", "yesterday", b"<p>x</p>")]))
    assert t["warc_ts"].to_pylist() == [None]
    assert t.num_rows == 1


def test_job_mixed_parquet_and_warc_partition(tmp_path, ray_session):
    """A partition mixing parquet pages shards and .warc.gz crawl
    shards runs through the resumable job path with one output schema
    (warc rows null-fill the optional lang column)."""
    from zhtml_ray.sources.pages import write_pages_dataset
    from zhtml_ray.stages.manifest import run_partitioned

    shard_dir = tmp_path / "in"
    shard_dir.mkdir()
    pq_files = write_pages_dataset(str(shard_dir), 40, rows_per_file=20)
    warc_path = shard_dir / "crawl.warc.gz"
    warc_path.write_bytes(build_warc(
        [(f"https://warc{i}.example/p", "2017-01-01T00:00:00Z",
          b"<!doctype html><body><p>" +
          b"warc words for the extractor pipeline " * 25 + b"</p>")
         for i in range(5)], per_record_gzip=True))
    out = str(tmp_path / "out")
    summary = run_partitioned(pq_files + [str(warc_path)], out,
                              group_size=3, overlap=1)
    assert summary["complete"]
    assert summary["rows"] == 45
    import pyarrow.dataset as pads
    dset = pads.dataset(out, format="parquet",
                        exclude_invalid_files=True)
    t = dset.to_table(columns=["url", "extracted_text"])
    warc_rows = [u for u in t["url"].to_pylist() if u.startswith("https://warc")]
    assert len(warc_rows) == 5


def test_read_warc_dataset_and_extract(tmp_path, ray_session):
    import ray  # noqa: F401  (session fixture owns init)
    for i, gz in enumerate([False, True]):
        ext = "warc.gz" if gz else "warc"
        (tmp_path / f"shard{i}.{ext}").write_bytes(
            build_warc([(f"https://s{i}.example/p", "2017-01-01T00:00:00Z",
                         b"<!doctype html><body><p>" +
                         b"real words here for the extractor " * 30 +
                         b"</p></body>")], per_record_gzip=gz))
    ds = read_warc(str(tmp_path))
    rows = ds.take_all()
    assert len(rows) == 2
    assert {r["url"] for r in rows} == \
        {"https://s0.example/p", "https://s1.example/p"}
    # pages-shaped output drops straight into the extraction stage
    from zhtml_ray.html.extract import extract_document
    out = extract_document(rows[0]["html"])
    assert "real words here" in out["extracted_text"]
