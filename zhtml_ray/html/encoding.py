"""WHATWG-style encoding sniffing for the ``html: binary`` column
(Encoding Standard labels + HTML 13.2.3.2 prescan, simplified but
spec-shaped). The reference consumes already-decoded strings only
(/root/reference/src/tokenizer.zig:140-155); real Common-Crawl bytes
need this layer.

Order: BOM > meta prescan of the first 1024 bytes > strict UTF-8
attempt > windows-1252 fallback. All paths are deterministic and
per-document; the regexes compile once per worker at import.

Deviations from the full spec, chosen for the batch-extraction
setting and documented here: the prescan tag walk is regex-based
(comments removed, unterminated comments truncate the window) rather
than the byte-cursor state machine; no parent-chain ``content``
attribute double-checking; unknown labels fall through to the
UTF-8-else-1252 default instead of aborting the prescan.
"""

from __future__ import annotations

import codecs
import re

# WHATWG Encoding Standard label -> Python codec (public label table,
# subset covering the labels that occur at meaningful web frequency).
# Note the spec maps iso-8859-1 / ascii / latin1 to windows-1252.
_W1252 = "cp1252"
ENCODING_LABELS: dict[str, str] = {}
for _codec, _labels in [
    ("utf-8", ["utf-8", "utf8", "unicode-1-1-utf-8", "unicode11utf8",
               "unicode20utf8", "x-unicode20utf8"]),
    (_W1252, ["windows-1252", "cp1252", "x-cp1252", "ansi_x3.4-1968",
              "ascii", "us-ascii", "iso-8859-1", "iso8859-1", "iso88591",
              "iso_8859-1", "latin1", "l1", "csisolatin1", "iso-ir-100",
              "iso_8859-1:1987", "cp819", "ibm819", "x-user-defined"]),
    ("iso8859-2", ["iso-8859-2", "iso8859-2", "latin2", "l2"]),
    ("iso8859-3", ["iso-8859-3", "iso8859-3", "latin3", "l3"]),
    ("iso8859-4", ["iso-8859-4", "iso8859-4", "latin4", "l4"]),
    ("iso8859-5", ["iso-8859-5", "iso8859-5", "cyrillic"]),
    ("iso8859-6", ["iso-8859-6", "iso8859-6", "arabic"]),
    ("iso8859-7", ["iso-8859-7", "iso8859-7", "greek", "greek8"]),
    ("iso8859-8", ["iso-8859-8", "iso8859-8", "hebrew", "visual"]),
    ("iso8859-10", ["iso-8859-10", "iso8859-10", "latin6", "l6"]),
    ("iso8859-13", ["iso-8859-13", "iso8859-13"]),
    ("iso8859-14", ["iso-8859-14", "iso8859-14"]),
    ("iso8859-15", ["iso-8859-15", "iso8859-15", "latin9", "l9"]),
    ("iso8859-16", ["iso-8859-16"]),
    ("cp1250", ["windows-1250", "cp1250", "x-cp1250"]),
    ("cp1251", ["windows-1251", "cp1251", "x-cp1251"]),
    ("cp1253", ["windows-1253", "cp1253", "x-cp1253"]),
    ("cp1254", ["windows-1254", "cp1254", "x-cp1254", "iso-8859-9",
                "iso8859-9", "latin5", "l5"]),
    ("cp1255", ["windows-1255", "cp1255", "x-cp1255"]),
    ("cp1256", ["windows-1256", "cp1256", "x-cp1256"]),
    ("cp1257", ["windows-1257", "cp1257", "x-cp1257"]),
    ("cp1258", ["windows-1258", "cp1258", "x-cp1258"]),
    ("cp874", ["windows-874", "tis-620", "iso-8859-11", "iso8859-11",
               "dos-874"]),
    ("koi8-r", ["koi8-r", "koi8", "koi", "cskoi8r", "koi8_r"]),
    ("koi8-u", ["koi8-u", "koi8-ru"]),
    ("mac-roman", ["macintosh", "x-mac-roman", "mac", "csmacintosh"]),
    ("shift_jis", ["shift_jis", "shift-jis", "sjis", "x-sjis", "ms932",
                   "ms_kanji", "windows-31j", "csshiftjis"]),
    ("euc-jp", ["euc-jp", "x-euc-jp", "cseucpkdfmtjapanese"]),
    ("iso2022_jp", ["iso-2022-jp", "csiso2022jp"]),
    ("big5", ["big5", "big5-hkscs", "cn-big5", "x-x-big5", "csbig5"]),
    ("gbk", ["gbk", "gb2312", "gb_2312", "gb_2312-80", "chinese",
             "csgb2312", "csiso58gb231280", "iso-ir-58", "x-gbk"]),
    ("gb18030", ["gb18030"]),
    ("euc-kr", ["euc-kr", "korean", "ks_c_5601-1987", "ks_c_5601-1989",
                "ksc5601", "ksc_5601", "windows-949", "cseuckr"]),
    ("utf-16-le", ["utf-16", "utf-16le", "unicodefeff"]),
    ("utf-16-be", ["utf-16be", "unicodefffe"]),
]:
    for _l in _labels:
        ENCODING_LABELS[_l] = _codec


def _whatwg1252_errors(exc):
    """windows-1252 per WHATWG maps the five bytes cp1252 leaves
    undefined (81 8D 8F 90 9D) to the matching C1 controls instead of
    U+FFFD."""
    return ("".join(chr(b) for b in exc.object[exc.start:exc.end]),
            exc.end)


codecs.register_error("whatwg1252", _whatwg1252_errors)

# overwhelmingly-common declarations, matched with ONE search before
# the general prescan machinery (measured ~5% of single-core extract
# wall when every page takes the general path). Only forms the general
# prescan ALSO resolves to utf-8 may match: quotes must pair (backref),
# and an unquoted value must end at whitespace or '>' — an immediate
# '/' is part of an unquoted value per the spec, making the label the
# unknown 'utf-8/', so `charset=utf-8/>` must fall through.
_FAST_UTF8_RE = re.compile(
    rb"""<meta\s+charset\s*=\s*(?:(["'])utf-?8\1\s*/?|utf-?8\s+/?|utf-?8)>""",
    re.I)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.S)
_META_RE = re.compile(rb"<meta[\s/][^>]*>", re.I)
_ATTR_RE = re.compile(
    rb"""([a-zA-Z][a-zA-Z0-9_:.-]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]*))?""")
_CHARSET_IN_CONTENT_RE = re.compile(
    rb"""charset\s*=\s*("[^"]*"|'[^']*'|[^\s;"']*)""", re.I)


def _resolve_label(label: bytes) -> str | None:
    name = label.strip(b" \t\n\f\r").lower().decode("ascii", "replace")
    codec = ENCODING_LABELS.get(name)
    if codec in ("utf-16-le", "utf-16-be"):
        # spec: a meta-declared UTF-16 is treated as UTF-8 (the prescan
        # itself proved the stream is ASCII-compatible)
        return "utf-8"
    return codec


def _meta_prescan(head: bytes) -> str | None:
    head = _COMMENT_RE.sub(b" ", head)
    cut = head.find(b"<!--")
    if cut != -1:
        head = head[:cut]
    for m in _META_RE.finditer(head):
        tag = m.group(0)
        attrs: dict[bytes, bytes] = {}
        for am in _ATTR_RE.finditer(tag[5:]):
            k = am.group(1).lower()
            v = am.group(2) or b""
            if v[:1] in (b'"', b"'") and v[-1:] == v[:1]:
                v = v[1:-1]
            attrs.setdefault(k, v)
        if b"charset" in attrs:
            codec = _resolve_label(attrs[b"charset"])
            if codec:
                return codec
        elif (attrs.get(b"http-equiv", b"").lower() == b"content-type"
              and b"content" in attrs):
            cm = _CHARSET_IN_CONTENT_RE.search(attrs[b"content"])
            if cm:
                v = cm.group(1)
                if v[:1] in (b'"', b"'") and v[-1:] == v[:1]:
                    v = v[1:-1]
                codec = _resolve_label(v)
                if codec:
                    return codec
    return None


def sniff_decode(raw: bytes) -> tuple[str, str]:
    """Decode an HTML byte payload: (text, resolved codec). BOM wins;
    then the meta prescan over the first 1024 bytes; then strict UTF-8;
    then windows-1252 (never raises — errors replace)."""
    if raw[:3] == b"\xef\xbb\xbf":
        return raw[3:].decode("utf-8", "replace"), "utf-8"
    if raw[:2] == b"\xff\xfe":
        return raw[2:].decode("utf-16-le", "replace"), "utf-16-le"
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace"), "utf-16-be"
    head = raw[:1024]
    if _FAST_UTF8_RE.search(head) is not None:
        # a comment can't contain a full well-formed meta tag, so the
        # fast hit can only disagree with the prescan when an EARLIER
        # meta declares a different charset — rare enough that the
        # general path handles it: only trust the fast hit if it is
        # the first meta in the window
        first_meta = _META_RE.search(head)
        if (first_meta is not None
                and _FAST_UTF8_RE.match(head, first_meta.start())
                and head.find(b"<!--") == -1):
            return raw.decode("utf-8", "replace"), "utf-8"
    codec = _meta_prescan(head)
    if codec == "utf-8":
        return raw.decode("utf-8", "replace"), "utf-8"
    if codec == _W1252:
        return raw.decode(_W1252, "whatwg1252"), _W1252
    if codec is not None:
        return raw.decode(codec, "replace"), codec
    try:
        return raw.decode("utf-8", "strict"), "utf-8"
    except UnicodeDecodeError:
        return raw.decode(_W1252, "whatwg1252"), _W1252
