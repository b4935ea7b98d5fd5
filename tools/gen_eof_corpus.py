"""Generate tests/corpus/tokenizer/zhtml_ray7_eof.test — EOF-truncation
and RCDATA/RAWTEXT/script end-tag families.

Truncated documents are a fact of crawl data (connection cut mid-tag,
mid-comment, mid-doctype), so every EOF arm of the tokenizer spec gets
a pinned case here: expected outputs hand-derived from the WHATWG
"EOF" anything-else clauses of each state (13.2.5.x), then adjudicated
against the implementation before freezing (same method as
gen_tokenizer_corpus2.py)."""

import json
import os

T = []


def c(desc, inp, out, errors=None, **kw):
    t = {"description": desc, "input": inp, "output": out}
    if errors:
        t["errors"] = [{"code": e} for e in errors]
    t.update(kw)
    T.append(t)


CH = "Character"

# ---- EOF inside tag machinery (13.2.5.6-.40 EOF arms)
c("eof after <", "<", [[CH, "<"]], ["eof-before-tag-name"])
c("eof after </", "</", [[CH, "</"]], ["eof-before-tag-name"])
c("eof in tag name", "<a", [], ["eof-in-tag"])
c("eof before attr name", "<a ", [], ["eof-in-tag"])
c("eof in attr name", "<a b", [], ["eof-in-tag"])
c("eof before attr value", "<a b=", [], ["eof-in-tag"])
c("eof in attr value single", "<a b='x", [], ["eof-in-tag"])
c("eof in attr value double", '<a b="x', [], ["eof-in-tag"])
c("eof in attr value unquoted", "<a b=x", [], ["eof-in-tag"])
c("eof after solidus", "<a/", [], ["eof-in-tag"])
c("eof in end tag name", "</a", [], ["eof-in-tag"])

# ---- EOF inside comments (13.2.5.43-.52 EOF arms)
c("eof after <!", "<!", [["Comment", ""]], ["incorrectly-opened-comment"])
c("eof after <!-", "<!-", [["Comment", "-"]],
  ["incorrectly-opened-comment"])
c("eof in comment start", "<!--", [["Comment", ""]], ["eof-in-comment"])
c("eof in comment start dash", "<!---", [["Comment", ""]],
  ["eof-in-comment"])
c("eof in comment", "<!--a", [["Comment", "a"]], ["eof-in-comment"])
c("eof in comment end dash", "<!--a-", [["Comment", "a"]],
  ["eof-in-comment"])
c("eof in comment end", "<!--a--", [["Comment", "a"]], ["eof-in-comment"])
c("eof in comment end bang", "<!--a--!", [["Comment", "a"]],
  ["eof-in-comment"])
c("comment CR normalized", "<!--a\rb-->", [["Comment", "a\nb"]])

# ---- EOF inside DOCTYPE (13.2.5.53-.67 EOF arms)
c("eof after <!doctype", "<!doctype",
  [["DOCTYPE", None, None, None, False]], ["eof-in-doctype"])
c("eof before doctype name", "<!doctype ",
  [["DOCTYPE", None, None, None, False]], ["eof-in-doctype"])
c("eof in doctype name", "<!doctype html",
  [["DOCTYPE", "html", None, None, False]], ["eof-in-doctype"])
c("eof after doctype name", "<!doctype html ",
  [["DOCTYPE", "html", None, None, False]], ["eof-in-doctype"])
c("eof after public keyword", "<!doctype html public",
  [["DOCTYPE", "html", None, None, False]], ["eof-in-doctype"])
c("eof in public id", '<!doctype html public "a',
  [["DOCTYPE", "html", "a", None, False]], ["eof-in-doctype"])
c("eof after public id", '<!doctype html public "a"',
  [["DOCTYPE", "html", "a", None, False]], ["eof-in-doctype"])
c("eof in system id", '<!doctype html system "s',
  [["DOCTYPE", "html", None, "s", False]], ["eof-in-doctype"])
c("eof in bogus doctype", "<!doctype html x",
  [["DOCTYPE", "html", None, None, False]],
  ["invalid-character-sequence-after-doctype-name"])

# ---- CDATA / charref EOF arms
c("cdata in html content is bogus comment", "<![CDATA[x",
  [["Comment", "[CDATA[x"]], ["cdata-in-html-content"])
c("bare ampersand at eof", "&", [[CH, "&"]])
c("numeric charref no digits", "&#", [[CH, "&#"]],
  ["absence-of-digits-in-numeric-character-reference"])
c("hex charref no digits", "&#x", [[CH, "&#x"]],
  ["absence-of-digits-in-numeric-character-reference"])
c("partial named ref at eof", "&am", [[CH, "&am"]])
c("named ref without semicolon at eof", "&amp", [[CH, "&"]],
  ["missing-semicolon-after-character-reference"])

# ---- RCDATA / RAWTEXT / PLAINTEXT end-tag machinery (13.2.5.9-.17)
c("rawtext eof mid end tag", "foo</xmp", [[CH, "foo</xmp"]],
  initialStates=["RAWTEXT state"], lastStartTag="xmp")
c("rawtext appropriate end tag with ws", "foo</xmp >",
  [[CH, "foo"], ["EndTag", "xmp"]],
  initialStates=["RAWTEXT state"], lastStartTag="xmp")
c("rawtext case-insensitive end tag", "foo</xMp>",
  [[CH, "foo"], ["EndTag", "xmp"]],
  initialStates=["RAWTEXT state"], lastStartTag="xmp")
c("rawtext non-matching end tag", "foo</xmpx>", [[CH, "foo</xmpx>"]],
  initialStates=["RAWTEXT state"], lastStartTag="xmp")
c("rawtext space before name not end tag", "foo</ xmp>",
  [[CH, "foo</ xmp>"]],
  initialStates=["RAWTEXT state"], lastStartTag="xmp")
c("rcdata charref active", "a&amp;b</title>",
  [[CH, "a&b"], ["EndTag", "title"]],
  initialStates=["RCDATA state"], lastStartTag="title")
c("rawtext charref inert", "a&amp;b</style>",
  [[CH, "a&amp;b"], ["EndTag", "style"]],
  initialStates=["RAWTEXT state"], lastStartTag="style")
c("plaintext consumes everything", "a</plaintext>b&amp;",
  [[CH, "a</plaintext>b&amp;"]],
  initialStates=["PLAINTEXT state"])
c("rcdata eof mid end tag", "</title", [[CH, "</title"]],
  initialStates=["RCDATA state"], lastStartTag="title")
c("rcdata nul replaced", "a\x00b", [[CH, "a�b"]],
  ["unexpected-null-character"],
  initialStates=["RCDATA state"], lastStartTag="title")
c("plaintext nul replaced", "a\x00b", [[CH, "a�b"]],
  ["unexpected-null-character"],
  initialStates=["PLAINTEXT state"])
c("script data eof in html comment-like", "a<!--b", [[CH, "a<!--b"]],
  ["eof-in-script-html-comment-like-text"],
  initialStates=["Script data state"], lastStartTag="script")
c("script data plain eof", "a<b", [[CH, "a<b"]],
  initialStates=["Script data state"], lastStartTag="script")

# ---- bogus comment residue
c("bogus comment nul", "<!x\x00y>", [["Comment", "x�y"]],
  ["incorrectly-opened-comment", "unexpected-null-character"])
c("processing instruction style", "<?php x ?>", [["Comment", "?php x ?"]],
  ["unexpected-question-mark-instead-of-tag-name"])
c("end tag with only >", "</>", [],
  ["missing-end-tag-name"])


def main():
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "corpus",
                       "tokenizer", "zhtml_ray7_eof.test")
    with open(out, "w") as f:
        json.dump({"tests": T}, f, indent=1, ensure_ascii=False)
    print(f"wrote {len(T)} cases to {out}")


if __name__ == "__main__":
    main()
