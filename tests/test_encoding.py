"""Tests for WHATWG encoding sniffing (html/encoding.py) and its
wiring into the tokenizer preprocess."""

import pytest

from zhtml_ray.html.encoding import sniff_decode
from zhtml_ray.html.tokenizer import preprocess


def test_bom_wins_over_meta():
    raw = "﻿<meta charset='koi8-r'>é".encode("utf-8")
    # utf-8 encode of ﻿ IS the utf-8 BOM bytes
    text, codec = sniff_decode(raw)
    assert codec == "utf-8"
    assert text.endswith("é") and not text.startswith("﻿")


def test_utf16_boms():
    t, c = sniff_decode("ab".encode("utf-16-le"))
    # Python utf-16-le str.encode emits no BOM; prepend explicitly
    t, c = sniff_decode(b"\xff\xfe" + "ab€".encode("utf-16-le"))
    assert (t, c) == ("ab€", "utf-16-le")
    t, c = sniff_decode(b"\xfe\xff" + "ab€".encode("utf-16-be"))
    assert (t, c) == ("ab€", "utf-16-be")


def test_meta_charset_1252():
    raw = b"<html><meta charset=windows-1252><body>caf\xe9"
    text, codec = sniff_decode(raw)
    assert codec == "cp1252"
    assert text.endswith("caf\xe9")


def test_meta_http_equiv_content():
    raw = (b"<meta http-equiv='Content-Type' "
           b"content='text/html; charset=ISO-8859-2'>\xb1")
    text, codec = sniff_decode(raw)
    assert codec == "iso8859-2"
    assert text.endswith("ą")  # 0xB1 in latin-2


def test_meta_in_comment_ignored():
    raw = b"<!-- <meta charset=koi8-r> -->plain \xc3\xa9"
    text, codec = sniff_decode(raw)
    assert codec == "utf-8"
    assert text.endswith("\xe9")


def test_unterminated_comment_truncates_prescan():
    raw = b"<!-- <meta charset=koi8-r> plain \xc3\xa9"
    assert sniff_decode(raw)[1] == "utf-8"


def test_iso_8859_1_maps_to_1252():
    raw = b"<meta charset=iso-8859-1>\x93quoted\x94"
    text, codec = sniff_decode(raw)
    assert codec == "cp1252"
    assert "“quoted”" in text  # 0x93/0x94 are curly quotes in 1252


def test_whatwg_1252_undefined_bytes_are_c1():
    text, codec = sniff_decode(b"<meta charset=ascii>\x81\x8d\x90")
    assert codec == "cp1252"
    assert text.endswith("\x81\x8d\x90")


def test_meta_utf16_treated_as_utf8():
    raw = b"<meta charset=utf-16>caf\xc3\xa9"
    text, codec = sniff_decode(raw)
    assert codec == "utf-8"
    assert text.endswith("caf\xe9")


def test_x_user_defined_maps_to_1252():
    assert sniff_decode(b"<meta charset=x-user-defined>x")[1] == "cp1252"


def test_fallback_strict_utf8_then_1252():
    assert sniff_decode("é no meta".encode("utf-8"))[1] == "utf-8"
    text, codec = sniff_decode(b"caf\xe9 no meta")
    assert codec == "cp1252"
    assert "caf\xe9" in text


def test_unknown_label_falls_through():
    assert sniff_decode(b"<meta charset=klingon-8>ascii")[1] == "utf-8"


def test_prescan_window_is_1024_bytes():
    raw = b"<!--" + b"x" * 0 + b"-->" + b" " * 1200 + \
        b"<meta charset=koi8-r>\xf0"
    text, codec = sniff_decode(raw)
    assert codec == "cp1252"  # meta outside window; invalid utf-8 falls back


def test_valid_utf8_unchanged_through_preprocess():
    payload = "<p>caf\xe9 中文</p>".encode("utf-8")
    assert preprocess(payload) == payload.decode("utf-8")


def test_preprocess_crlf_after_sniff():
    raw = b"<meta charset=windows-1252>a\r\nb\rc"
    assert preprocess(raw).endswith("a\nb\nc")


def test_extract_document_1252_page():
    from zhtml_ray.html.extract import extract_document
    raw = (b"<!doctype html><meta charset=iso-8859-1><title>t</title>"
           b"<body><p>" + b"caf\xe9 r\xe9sum\xe9 word " * 20 + b"</p>")
    out = extract_document(raw)
    assert "caf\xe9 r\xe9sum\xe9" in out["extracted_text"]


# ---- hand-verified prescan edge family (frozen probe batch) ----------
# Each expectation was checked against HTML 13.2.3.2 (prescan) + the
# Encoding Standard label rules by hand; the byte \xc1 is valid in
# the single-byte codecs but an invalid UTF-8 lead continuation, so a
# wrong prescan shows up as the cp1252 fallback.

PRESCAN_CASES = [
    # (raw, expected codec)
    (b"<!--<meta charset=koi8-r>--><p>\xc1", "cp1252"),   # meta inside comment
    (b"<!--<meta charset=koi8-r><p>\xc1", "cp1252"),      # unterminated comment
    (b"<!--x--><meta charset=koi8-r><p>\xc1", "koi8-r"),
    (b"<meta charset=UTF-16BE><p>hi", "utf-8"),           # utf-16 label -> utf-8
    (b"<meta http-equiv=refresh content='charset=koi8-r'><p>\xc1",
     "cp1252"),                                           # wrong http-equiv
    (b"<meta charset=koi8-r charset=utf-8><p>\xc1", "koi8-r"),  # dup attr 1st wins
    (b"<meta charset=koi8-r><meta charset=utf-8><p>\xc1", "koi8-r"),
    (b"<meta charset='koi8-r'><p>\xc1", "koi8-r"),
    (b"<meta http-equiv='content-type' content='charset=\"koi8-r\"'><p>\xc1",
     "koi8-r"),                                           # quoted inside content
    (b"<meta/charset=koi8-r><p>\xc1", "koi8-r"),          # <meta/ form allowed
    (b"<meta charset=shift_jis/><p>\x83\x41", "cp1252"),  # '/' in unquoted value
    (b"<meta charset=windows-1251 id=x><p>\xc1", "cp1251"),
]


@pytest.mark.parametrize("raw,codec", PRESCAN_CASES)
def test_prescan_edge_family(raw, codec):
    assert sniff_decode(raw)[1] == codec


def test_fast_utf8_path_agrees_with_prescan():
    # the fast utf-8 regex must never accept a form the general prescan
    # would NOT resolve to utf-8: a fast false-positive silently decodes
    # a non-utf-8 page as utf-8 (caught live: unquoted `charset=utf-8/>`
    # whose spec value is the unknown label 'utf-8/'; mismatched quotes)
    from zhtml_ray.html.encoding import _FAST_UTF8_RE, _meta_prescan
    quotes = [b"", b'"', b"'"]
    vals = [b"utf-8", b"utf8", b"UTF-8"]
    tails = [b">", b" >", b"/>", b" />", b"  / >"]
    spaces = [b"", b" ", b"  "]
    for q1 in quotes:
        for q2 in quotes:
            for v in vals:
                for t in tails:
                    for s1 in spaces:
                        for s2 in spaces:
                            raw = (b"<meta charset" + s1 + b"=" + s2 +
                                   q1 + v + q2 + t + b"<p>\xe9")
                            head = raw[:1024]
                            if _FAST_UTF8_RE.search(head):
                                assert _meta_prescan(head) == "utf-8", raw
    # and the common forms must still take the fast path
    for raw in (b"<meta charset=utf-8>", b'<meta charset="utf-8">',
                b"<meta charset='UTF-8'/>", b'<meta charset="utf-8" />'):
        assert _FAST_UTF8_RE.search(raw), raw
