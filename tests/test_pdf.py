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


def test_indirect_length_falls_back_to_endstream():
    """'/Length 1234 0 R' (indirect) must NOT be misparsed as a direct
    length via regex backtracking ('123'); the endstream scan must
    recover the full stream."""
    from zhtml_ray.functions.pdf import extract_pdf, make_pdf
    pdf = make_pdf([["hello indirect length world"]], compress=False)
    # rewrite the content stream's direct /Length N into an indirect ref
    import re
    m = re.search(rb"<< /Length (\d+) >>\s*stream", pdf)
    assert m, "fixture layout changed"
    pdf2 = pdf.replace(m.group(0),
                       b"<< /Length 9999 0 R >>\nstream", 1)
    out = extract_pdf(pdf2)
    assert "hello indirect length world" in out["text"]


def test_contents_array_concatenated():
    """/Contents [a 0 R b 0 R] pages concatenate their streams."""
    from zhtml_ray.functions.pdf import extract_pdf, make_pdf
    import re
    pdf = make_pdf([["part one"], ["part two"]], compress=False)
    out = extract_pdf(pdf)
    assert "part one" in out["text"] and "part two" in out["text"]
    # build an array-contents page by merging the two page objects
    m = re.findall(rb"/Contents (\d+) 0 R", pdf)
    assert len(m) == 2
    a, b = m
    pdf2 = pdf.replace(b"/Contents " + a + b" 0 R",
                       b"/Contents [" + a + b" 0 R " + b + b" 0 R]", 1)
    out2 = extract_pdf(pdf2)
    assert "part one" in out2["text"] and "part two" in out2["text"]


def test_missing_contents_is_flagged_not_silent():
    """A /Page whose /Contents is unparseable yields ok=False through
    the batch UDF (documented contract), not silent text loss."""
    import pyarrow as pa
    from zhtml_ray.functions.pdf import PdfExtractBatch, make_pdf
    pdf = make_pdf([["x"]], compress=False)
    broken = pdf.replace(b"/Contents", b"/Kontents", 1)
    out = PdfExtractBatch()(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "pdf": pa.array([broken], pa.binary())}))
    assert out["ok"].to_pylist() == [False]
    assert "Contents" in out["fail_reason"].to_pylist()[0]
