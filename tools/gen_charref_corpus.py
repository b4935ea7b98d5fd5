"""Generate tests/corpus/tokenizer/zhtml_ray3_charref.test — character
reference conformance cases (the reference's own ignored-test area,
/root/reference/test/tokenizer-html5lib.zig:15-61).

Expected outputs are derived HERE, independently of the tokenizer, from
PUBLIC data + WHATWG spec rules re-encoded in this generator:

  * stdlib ``html.entities.html5`` (the 2231-entry table, same data the
    reference vendors at src/namedCharacterReference.zig);
  * longest-match semantics + the semicolon-less HISTORICAL attribute
    rule (spec 13.2.5.73: in an attribute, a legacy match followed by
    '=' or alphanumeric is NOT decoded and NOT an error);
  * the numeric-reference C1 remap table + error taxonomy copied from
    the spec's "numeric character reference end state" (13.2.5.80).

Any mismatch against the engine is adjudicated by hand: either a
tokenizer bug (fix the tokenizer) or a generator transcription error
(fix the rule here) — never by pasting engine output in.
"""

import json
import os
from html.entities import html5

CASES = []


def c(desc, inp, out, errors=(), **kw):
    t = {"description": desc, "input": inp, "output": out}
    if errors:
        t["errors"] = [{"code": e} for e in errors]
    t.update(kw)
    CASES.append(t)


MISSING_SEMI = "missing-semicolon-after-character-reference"

# ---------------------------------------------------- A. legacy entities
nosemi = sorted(k for k in html5 if not k.endswith(";"))


def safe_suffix(name: str) -> str:
    """A char that cannot extend `name` into a longer table key, so the
    longest match is exactly `name`."""
    for s in "0123456789zqxjvkw":
        if not any(k.startswith(name + s) for k in html5):
            return s
    raise AssertionError(name)


for n in nosemi:
    ch = html5[n]
    suf = safe_suffix(n)
    # data: decode + missing-semicolon, whatever follows
    c(f"legacy &{n} data space", f"x&{n} y",
      [["Character", f"x{ch} y"]], [MISSING_SEMI])
    c(f"legacy &{n} data alnum", f"&{n}{suf}",
      [["Character", f"{ch}{suf}"]], [MISSING_SEMI])
    # attribute historical rule: '=' or alnum next → literal, NO error
    c(f"legacy &{n} attr eq", f'<a b="&{n}=z">',
      [["StartTag", "a", {"b": f"&{n}=z"}]])
    c(f"legacy &{n} attr alnum", f'<a b="&{n}{suf}">',
      [["StartTag", "a", {"b": f"&{n}{suf}"}]])
    # attribute, other next char → decode + missing-semicolon
    c(f"legacy &{n} attr space", f'<a b="&{n} ">',
      [["StartTag", "a", {"b": f"{ch} "}]], [MISSING_SEMI])

# with-semicolon sanity per legacy name (both casings resolve)
for n in nosemi:
    c(f"entity &{n}; data", f"&{n};", [["Character", html5[n + ';']]])

# ------------------------------------------- B. longest-match precedence
c("longest match notin;", "&notin;", [["Character", "∉"]])
c("longest match not prefix", "&notinq",
  [["Character", "¬inq"]], [MISSING_SEMI])
c("longest match gt prefix", "&gtdotq",
  [["Character", ">dotq"]], [MISSING_SEMI])
c("longest match gtdot;", "&gtdot;", [["Character", "⋗"]])
c("longest match ampersand chain", "&amp&amp;",
  [["Character", "&&"]], [MISSING_SEMI])
c("longest match centerdot", "&centerdot;", [["Character", "·"]])
c("longest match cent prefix", "&centerdotq",
  [["Character", "¢erdotq"]], [MISSING_SEMI])
c("longest match copysr;", "&copysr;", [["Character", "℗"]])
c("longest match copy prefix", "&copysrq",
  [["Character", "©srq"]], [MISSING_SEMI])

# -------------------------------------------------- C. unknown/ambiguous
c("unknown entity with semi", "&abc;", [["Character", "&abc;"]],
  ["unknown-named-character-reference"])
c("unknown entity no semi", "&abc ", [["Character", "&abc "]])
c("unknown x with semi", "&x;", [["Character", "&x;"]],
  ["unknown-named-character-reference"])
c("bare ampersand", "&", [["Character", "&"]])
c("ampersand semicolon", "&;", [["Character", "&;"]])
c("ampersand nonalnum", "&!", [["Character", "&!"]])
c("unknown in attribute", '<a b="&abc;">',
  [["StartTag", "a", {"b": "&abc;"}]], ["unknown-named-character-reference"])
c("unknown in attribute no semi", '<a b="&abc ">',
  [["StartTag", "a", {"b": "&abc "}]])

# ------------------------------------------------------------ D. numeric
# C1 remap table, transcribed from the spec (13.2.5.80)
C1_REMAP = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}
for cp in range(0x80, 0xA0):
    want = chr(C1_REMAP.get(cp, cp))
    c(f"numeric C1 hex {cp:#x}", f"&#x{cp:x};", [["Character", want]],
      ["control-character-reference"])
    c(f"numeric C1 dec {cp}", f"&#{cp};", [["Character", want]],
      ["control-character-reference"])

# C0 controls: error unless ASCII whitespace; 0x0D errors explicitly
for cp in (0x01, 0x02, 0x08, 0x0B, 0x0E, 0x1F, 0x7F, 0x0D):
    c(f"numeric control {cp:#x}", f"&#x{cp:x};", [["Character", chr(cp)]],
      ["control-character-reference"])
for cp in (0x09, 0x0A, 0x0C, 0x20):
    c(f"numeric whitespace {cp:#x}", f"&#x{cp:x};", [["Character", chr(cp)]])

# noncharacters: kept verbatim + error
for cp in (0xFDD0, 0xFDD8, 0xFDEF, 0xFFFE, 0xFFFF, 0x1FFFE, 0x1FFFF,
           0x10FFFE, 0x10FFFF):
    c(f"numeric noncharacter {cp:#x}", f"&#x{cp:x};", [["Character", chr(cp)]],
      ["noncharacter-character-reference"])

# surrogates → U+FFFD + error
for cp in (0xD800, 0xDABC, 0xDFFF):
    c(f"numeric surrogate {cp:#x}", f"&#x{cp:x};", [["Character", "�"]],
      ["surrogate-character-reference"])

# out of range → U+FFFD + error
for s in ("110000", "FFFFFF", "123456789ABC"):
    c(f"numeric out of range 0x{s}", f"&#x{s};", [["Character", "�"]],
      ["character-reference-outside-unicode-range"])
c("numeric out of range dec", "&#1114112;", [["Character", "�"]],
  ["character-reference-outside-unicode-range"])

# NUL → U+FFFD + null-character-reference
c("numeric nul hex", "&#x0;", [["Character", "�"]],
  ["null-character-reference"])
c("numeric nul dec", "&#0;", [["Character", "�"]],
  ["null-character-reference"])

# missing semicolon on numeric
c("numeric missing semi space", "&#65 x", [["Character", "A x"]],
  [MISSING_SEMI])
c("numeric missing semi eof", "&#x41", [["Character", "A"]], [MISSING_SEMI])
c("numeric hex missing semi attr", '<a b="&#x42">',
  [["StartTag", "a", {"b": "B"}]], [MISSING_SEMI])

# absence of digits
for inp in ("&#;", "&#x;", "&#xg", "&# ", "&#zq"):
    c(f"numeric absence {inp!r}", inp, [["Character", inp]],
      ["absence-of-digits-in-numeric-character-reference"])

# leading zeros + simple decodes in both contexts
c("numeric leading zeros", "&#000065;", [["Character", "A"]])
c("numeric attr decode", '<a b="x&#65;y">', [["StartTag", "a", {"b": "xAy"}]])
c("numeric hex upper X", "&#X61;", [["Character", "a"]])
c("numeric astral", "&#x1F600;", [["Character", "\U0001F600"]])
c("numeric max valid", "&#x10FFFD;", [["Character", "\U0010FFFD"]])


# ---------------------------------------- E. charrefs by tokenizer state
# RCDATA decodes character references; RAWTEXT / script data / PLAINTEXT
# pass them through verbatim (spec: only Data and RCDATA consume '&')
for n in ("amp", "lt", "not", "copy"):
    ch = html5[n + ";"]
    c(f"state rcdata &{n};", f"x&{n};y", [["Character", f"x{ch}y"]],
      initialStates=["RCDATA state"], lastStartTag="title")
    c(f"state rawtext &{n};", f"x&{n};y", [["Character", f"x&{n};y"]],
      initialStates=["RAWTEXT state"], lastStartTag="style")
    c(f"state script &{n};", f"x&{n};y", [["Character", f"x&{n};y"]],
      initialStates=["Script data state"], lastStartTag="script")
    c(f"state plaintext &{n};", f"x&{n};y", [["Character", f"x&{n};y"]],
      initialStates=["PLAINTEXT state"], lastStartTag="plaintext")
c("state rcdata numeric", "&#x41;&#66;", [["Character", "AB"]],
  initialStates=["RCDATA state"], lastStartTag="title")
c("state rcdata legacy missing semi", "&amp x", [["Character", "& x"]],
  ["missing-semicolon-after-character-reference"],
  initialStates=["RCDATA state"], lastStartTag="title")


def main():
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "corpus",
                       "tokenizer", "zhtml_ray3_charref.test")
    with open(out, "w") as f:
        json.dump({"tests": CASES}, f, ensure_ascii=False, indent=1)
    print(f"wrote {len(CASES)} cases to {out}")


if __name__ == "__main__":
    main()
