"""Generate tests/corpus/tokenizer/zhtml_ray6_attr.test — attribute
state + tag-open + CDATA cases, expected outputs hand-derived from the
WHATWG spec (13.2.5.32-.40 attribute states, 13.2.5.6-.8 tag open,
13.2.5.69-.71 CDATA). Adjudication on mismatch: spec wins."""

import json
import os

CASES = []


def c(desc, inp, out, errors=(), **kw):
    t = {"description": desc, "input": inp, "output": out}
    if errors:
        t["errors"] = [{"code": e} for e in errors]
    t.update(kw)
    CASES.append(t)


# ------------------------------------------------- attribute name errors
c("quote in attr name dq", '<a "b>x', [["StartTag", "a", {'"b': ""}],
                                       ["Character", "x"]],
  ["unexpected-character-in-attribute-name"])
c("quote in attr name sq", "<a 'b>x", [["StartTag", "a", {"'b": ""}],
                                       ["Character", "x"]],
  ["unexpected-character-in-attribute-name"])
c("lt in attr name", "<a <b>x", [["StartTag", "a", {"<b": ""}],
                                 ["Character", "x"]],
  ["unexpected-character-in-attribute-name"])
c("equals before attr name", "<a =b>x", [["StartTag", "a", {"=b": ""}],
                                         ["Character", "x"]],
  ["unexpected-equals-sign-before-attribute-name"])
c("attr name uppercased", "<a FOO=1 Bar=2>", [["StartTag", "a",
                                               {"foo": "1", "bar": "2"}]])
c("duplicate attr first wins", "<a x=1 x=2 X=3>",
  [["StartTag", "a", {"x": "1"}]],
  ["duplicate-attribute", "duplicate-attribute"])

# ------------------------------------------------ attribute value errors
c("missing attr value", "<a b=>x", [["StartTag", "a", {"b": ""}],
                                    ["Character", "x"]],
  ["missing-attribute-value"])
c("unquoted value quote", '<a b=c"d>x', [["StartTag", "a", {"b": 'c"d'}],
                                         ["Character", "x"]],
  ["unexpected-character-in-unquoted-attribute-value"])
c("unquoted value backtick", "<a b=c`d>", [["StartTag", "a", {"b": "c`d"}]],
  ["unexpected-character-in-unquoted-attribute-value"])
c("unquoted value lt", "<a b=c<d>", [["StartTag", "a", {"b": "c<d"}]],
  ["unexpected-character-in-unquoted-attribute-value"])
c("unquoted value equals", "<a b=c=d>", [["StartTag", "a", {"b": "c=d"}]],
  ["unexpected-character-in-unquoted-attribute-value"])
c("missing ws between attrs", '<a b="c"d=e>',
  [["StartTag", "a", {"b": "c", "d": "e"}]],
  ["missing-whitespace-between-attributes"])
c("null in attr name", "<a b\x00c=1>", [["StartTag", "a", {"b�c": "1"}]],
  ["unexpected-null-character"])
c("null in attr value dq", '<a b="x\x00y">',
  [["StartTag", "a", {"b": "x�y"}]], ["unexpected-null-character"])
c("null in unquoted value", "<a b=x\x00y>",
  [["StartTag", "a", {"b": "x�y"}]], ["unexpected-null-character"])

# -------------------------------------------------------- solidus / eof
c("solidus in tag", "<a b/c=1>", [["StartTag", "a", {"b": "", "c": "1"}]],
  ["unexpected-solidus-in-tag"])
# '/' in an UNQUOTED value is just a value char (spec anything-else) —
# the tag is NOT self-closing and the value is "1/"
c("unquoted value eats solidus", "<a b=1/>x",
  [["StartTag", "a", {"b": "1/"}], ["Character", "x"]])
c("self closing after ws", "<a b=1 />x", [["StartTag", "a", {"b": "1"}, True],
                                          ["Character", "x"]])
c("slash then gt after value", '<a b="1"/>x',
  [["StartTag", "a", {"b": "1"}, True], ["Character", "x"]])
c("eof in tag", "<a b=1", [], ["eof-in-tag"])
c("eof in attr dq value", '<a b="x', [], ["eof-in-tag"])
c("eof after solidus", "<a/", [], ["eof-in-tag"])

# ------------------------------------------------------------- tag open
c("invalid first char of tag", "<3>x", [["Character", "<3>x"]],
  ["invalid-first-character-of-tag-name"])
c("end tag bogus comment", "</3>x", [["Comment", "3"], ["Character", "x"]],
  ["invalid-first-character-of-tag-name"])
c("missing end tag name", "</>x", [["Character", "x"]],
  ["missing-end-tag-name"])
c("question mark bogus comment", "<?php ?>x",
  [["Comment", "?php ?"], ["Character", "x"]],
  ["unexpected-question-mark-instead-of-tag-name"])
c("eof before tag name", "<", [["Character", "<"]], ["eof-before-tag-name"])
c("eof after end tag open", "</", [["Character", "</"]],
  ["eof-before-tag-name"])

# ----------------------------------------------------------------- CDATA
c("cdata in html content", "<![CDATA[x]]>y",
  [["Comment", "[CDATA[x]]"], ["Character", "y"]],
  ["cdata-in-html-content"])
c("cdata bracket run", "a]]b", [["Character", "a]]b"]], ["eof-in-cdata"],
  initialStates=["CDATA section state"])
c("cdata section content", "x]>y]]z]]>w",
  [["Character", "x]>y]]z"], ["Character", "w"]],
  initialStates=["CDATA section state"])
c("eof in cdata", "abc", [["Character", "abc"]], ["eof-in-cdata"],
  initialStates=["CDATA section state"])
c("eof in cdata brackets", "abc]]", [["Character", "abc]]"]],
  ["eof-in-cdata"], initialStates=["CDATA section state"])


# ------------------------------------------- CR/CRLF input preprocessing
# (the reference's missing piece — its harness ignores all CR tests,
# /root/reference/test/tokenizer-html5lib.zig:55-60; we normalize per
# spec 13.2.3.5: CRLF → LF, lone CR → LF, before tokenization)
c("crlf in text", "a\r\nb", [["Character", "a\nb"]])
c("lone cr in text", "a\rb", [["Character", "a\nb"]])
c("cr at eof", "a\r", [["Character", "a\n"]])
c("crlf run collapses pairwise", "a\r\r\n\rb", [["Character", "a\n\n\nb"]])
c("crlf in attribute value", "<a b='x\r\ny'>", [["StartTag", "a", {"b": "x\ny"}]])
c("cr in comment", "<!--c\rd-->", [["Comment", "c\nd"]])
c("crlf in rcdata", "a\r\nb", [["Character", "a\nb"]],
  initialStates=["RCDATA state"], lastStartTag="title")
c("cr in doctype public id", '<!DOCTYPE html PUBLIC "a\rb">',
  [["DOCTYPE", "html", "a\nb", None, True]])


def main():
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "corpus",
                       "tokenizer", "zhtml_ray6_attr.test")
    with open(out, "w") as f:
        json.dump({"tests": CASES}, f, ensure_ascii=False, indent=1)
    print(f"wrote {len(CASES)} cases to {out}")


if __name__ == "__main__":
    main()
