"""PDF text + layout extraction (functions/pdf.py — the north rule's
"PDF/layout parse" leg). The fixture generator's input text IS the
oracle: extraction must reproduce it byte-identically."""

import pytest

from zhtml_ray.functions.pdf import (
    PdfExtractBatch, extract_pdf, gen_pdf_table, make_pdf)


def test_roundtrip_exact():
    t = gen_pdf_table(30)
    for i in range(t.num_rows):
        out = extract_pdf(t.column("pdf")[i].as_py())
        assert out["text"] == t.column("expected_text")[i].as_py()


def test_flate_and_raw_agree():
    pages = [["alpha beta", "gamma"], ["second page line"]]
    raw = extract_pdf(make_pdf(pages, compress=False))
    comp = extract_pdf(make_pdf(pages, compress=True))
    assert raw["text"] == comp["text"] == "alpha beta\ngamma\nsecond page line"
    assert raw["n_pages"] == 2


def test_string_escapes_and_hex():
    pdf = make_pdf([["paren (x) \\ back", "tab\tkept"]], compress=False)
    out = extract_pdf(pdf)
    assert out["text"] == "paren (x) \\ back\ntab\tkept"


def test_layout_reading_order():
    """Runs emitted out of visual order must come back in reading order
    (y desc, x asc) — the layout-parse contract."""
    content = (b"BT /F1 12 Tf 72 100 Td (bottom) Tj ET\n"
               b"BT /F1 12 Tf 200 700 Td (top-right) Tj ET\n"
               b"BT /F1 12 Tf 72 700 Td (top-left) Tj ET")
    pdf = make_pdf([["placeholder"]], compress=False)
    # splice our custom stream into a fresh single-page pdf
    import re
    body = (b"<< /Length " + str(len(content)).encode() +
            b" >>\nstream\n" + content + b"\nendstream")
    pdf = re.sub(rb"<< /Length .*?endstream", body, pdf,
                 count=1, flags=re.S)
    out = extract_pdf(pdf)
    assert out["text"] == "top-left top-right\nbottom"


def test_tj_array_and_tstar():
    content = (b"BT /F1 12 Tf 72 720 Td 14 TL "
               b"[(Hel) (lo)] TJ T* (world) Tj ET")
    body = (b"<< /Length " + str(len(content)).encode() +
            b" >>\nstream\n" + content + b"\nendstream")
    import re
    pdf = re.sub(rb"<< /Length .*?endstream", body,
                 make_pdf([["x"]], compress=False), count=1, flags=re.S)
    assert extract_pdf(pdf)["text"] == "Hello\nworld"


def test_hostile_inputs_isolated():
    import pyarrow as pa
    bad = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "pdf": pa.array([b"", b"\x00\x01", b"%PDF-1.4 junk",
                         make_pdf([["fine"]])], pa.binary()),
    })
    out = PdfExtractBatch()(bad)
    oks = out.column("ok").to_pylist()
    assert oks == [False, False, True, True]  # junk pdf: 0 pages, ok
    assert out.column("text").to_pylist()[3] == "fine"


def test_pdf_query_entry(ray_session):
    from zhtml_ray.pipelines.ops_queries import q_pdf_extract
    out = q_pdf_extract("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 60
    assert (out["n_pages"] >= 1).all()
    assert out["text"].str.len().gt(0).all()
