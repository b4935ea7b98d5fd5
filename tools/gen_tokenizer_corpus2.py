"""Generate tests/corpus/tokenizer/zhtml_ray2.test — spec-edge cases
(expected outputs hand-derived from the WHATWG tokenizer spec, then
adjudicated against the implementation; see tests/test_corpus.py)."""

import json
import os

T = []


def c(desc, inp, out, errors=None, **kw):
    t = {"description": desc, "input": inp, "output": out}
    if errors:
        t["errors"] = [{"code": e} for e in errors]
    t.update(kw)
    T.append(t)


c("doctype simple", "<!DOCTYPE html>", [["DOCTYPE", "html", None, None, True]])
c("doctype public+system mixed quotes", "<!doctype HTML PUBLIC \"-//a\" 'b'>",
  [["DOCTYPE", "html", "-//a", "b", True]])
c("doctype missing ws", "<!DOCTYPEhtml>", [["DOCTYPE", "html", None, None, True]],
  ["missing-whitespace-before-doctype-name"])
c("doctype empty", "<!DOCTYPE>", [["DOCTYPE", None, None, None, False]],
  ["missing-doctype-name"])
c("doctype system kw only", "<!DOCTYPE html SYSTEM>",
  [["DOCTYPE", "html", None, None, False]],
  ["missing-doctype-system-identifier"])
c("empty comment abrupt", "<!-->", [["Comment", ""]],
  ["abrupt-closing-of-empty-comment"])
c("empty comment abrupt 2", "<!--->", [["Comment", ""]],
  ["abrupt-closing-of-empty-comment"])
c("comment trailing dash", "<!-- --->", [["Comment", " -"]])
c("comment bang close", "<!-- --!>", [["Comment", " "]],
  ["incorrectly-closed-comment"])
c("numeric hex dec", "&#x41;&#X61;&#97;", [["Character", "Aaa"]])
c("charref control remap", "&#x80;", [["Character", "€"]],
  ["control-character-reference"])
c("charref surrogate", "&#xD800;", [["Character", "�"]],
  ["surrogate-character-reference"])
c("charref noncharacter", "&#xFDD0;", [["Character", "﷐"]],
  ["noncharacter-character-reference"])
c("charref null", "&#x0;", [["Character", "�"]],
  ["null-character-reference"])
c("charref no digits dec", "&#;", [["Character", "&#;"]],
  ["absence-of-digits-in-numeric-character-reference"])
c("charref no digits hex", "&#x;", [["Character", "&#x;"]],
  ["absence-of-digits-in-numeric-character-reference"])
c("entity maxmunch prefix", "&notin", [["Character", "¬in"]],
  ["missing-semicolon-after-character-reference"])
c("legacy uppercase GT", "&GT", [["Character", ">"]],
  ["missing-semicolon-after-character-reference"])
c("attr with and without value", "<a a=b c>",
  [["StartTag", "a", {"a": "b", "c": ""}]])
c("equals before attr name", "<a =x>", [["StartTag", "a", {"=x": ""}]],
  ["unexpected-equals-sign-before-attribute-name"])
c("quote in attr name", "<a a\"b=c>", [["StartTag", "a", {"a\"b": "c"}]],
  ["unexpected-character-in-attribute-name"])
c("stray solidus in tag", "<a/b>", [["StartTag", "a", {"b": ""}]],
  ["unexpected-solidus-in-tag"])
c("missing end tag name", "</>", [], ["missing-end-tag-name"])
c("end tag bogus comment", "</ x>", [["Comment", " x"]],
  ["invalid-first-character-of-tag-name"])
c("pi bogus comment", "<?xml?>", [["Comment", "?xml?"]],
  ["unexpected-question-mark-instead-of-tag-name"])
c("cdata in html", "<![CDATA[x]]>", [["Comment", "[CDATA[x]]"]],
  ["cdata-in-html-content"])
c("script comment passthrough", "x<!--y--></script>",
  [["Character", "x<!--y-->"], ["EndTag", "script"]],
  initialStates=["Script data state"], lastStartTag="script")
c("script double escape", "<!--<script>x</script>--></script>",
  [["Character", "<!--<script>x</script>-->"], ["EndTag", "script"]],
  initialStates=["Script data state"], lastStartTag="script")
c("cr normalization", "a\rb\r\nc", [["Character", "a\nb\nc"]])
c("nul kept in data", "a\x00b", [["Character", "a\x00b"]],
  ["unexpected-null-character"])
c("missing ws between attrs", "<a href='x'y=z>",
  [["StartTag", "a", {"href": "x", "y": "z"}]],
  ["missing-whitespace-between-attributes"])
c("ampersand nonentity in unquoted value", "<a href=x&y>",
  [["StartTag", "a", {"href": "x&y"}]])
c("self closing after quoted", "<a href=\"x\" />",
  [["StartTag", "a", {"href": "x"}, True]])
c("end tag trailing solidus", "</br/>", [["EndTag", "br"]],
  ["end-tag-with-trailing-solidus"])
c("end tag with attrs", "</br x=1>", [["EndTag", "br"]],
  ["end-tag-with-attributes"])
c("plaintext nul", "a<b>\x00c", [["Character", "a<b>�c"]],
  ["unexpected-null-character"], initialStates=["PLAINTEXT state"])
c("newline inside tag", "<a\nb='c'>", [["StartTag", "a", {"b": "c"}]])
c("eof in comment", "<!--x", [["Comment", "x"]], ["eof-in-comment"])
c("eof in doctype", "<!DOCTYPE", [["DOCTYPE", None, None, None, False]],
  ["eof-in-doctype"])
c("eof in tag", "<a b=\"c", [], ["eof-in-tag"])
c("duplicate attribute", "<a x=1 x=2>", [["StartTag", "a", {"x": "1"}]],
  ["duplicate-attribute"])

out_path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "corpus", "tokenizer",
    "zhtml_ray2.test")
with open(out_path, "w") as f:
    json.dump({"tests": T}, f, indent=1, ensure_ascii=False)
print(len(T), "cases ->", out_path)
