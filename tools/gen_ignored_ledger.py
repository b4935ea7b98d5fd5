"""Generate tests/corpus/tokenizer/zhtml_ray18_ignored_ledger.test —
one conformance case per entry of the REFERENCE's own skipped-test
ledger (/root/reference/test/tokenizer-html5lib.zig:15-61, the
`ignored_tests` list naming the html5lib-tests cases its tokenizer
cannot pass yet). The r3 VERDICT asked for "a corpus-coverage note
mapping every ignored_tests entry to a local passing case"; this file
IS that mapping, machine-checked: every case description is
"ledger: <entry verbatim>" and tests/test_corpus.py's
test_ignored_ledger_complete asserts the set matches.

Expected outputs are derived HERE from WHATWG spec rules (13.2.5
tokenization; 13.2.3.5 input-stream CR normalization) independently of
the engine — the same adjudication method as the other gen_* tools:
a mismatch is either a tokenizer bug (fix the tokenizer) or a
transcription error here (fix the rule), never resolved by pasting
engine output in. The upstream corpus is not vendorable offline, so
inputs are reconstructed from the entry names (each names its input
construct precisely); error lists follow the repo convention of
TOKENIZER errors only (input-stream errors are a separate collector,
tests/test_corpus.py runs with collect_input_errors=False).
"""

import json
import os

CASES = []

EOF_DT = "eof-in-doctype"
MISSING_SEMI = "missing-semicolon-after-character-reference"
ABSENT = "absence-of-digits-in-numeric-character-reference"
NO_WS_NAME = "missing-whitespace-before-doctype-name"
NO_WS_PUB = "missing-whitespace-after-doctype-public-keyword"
NO_WS_SYS = "missing-whitespace-after-doctype-system-keyword"
NO_QUOTE_PUB = "missing-quote-before-doctype-public-identifier"

# U+100000 (plane-16 private use), the 􀀀 surrogate pair in
# the upstream JSON — exercises astral passthrough
ASTRAL = "\U00100000"


def c(entry, inp, out, errors=()):
    t = {"description": f"ledger: {entry}", "input": inp, "output": out}
    if errors:
        t["errors"] = [{"code": e} for e in errors]
    CASES.append(t)


def ch(s):
    return ["Character", s]


def dt(name=None, pub=None, sys_=None, ok=False):
    return ["DOCTYPE", name, pub, sys_, ok]


# ------------------------------------------------- entity family
# &f…EOF: 'f' prefixes table keys but completes none → flush, no error
c("Unfinished entity", "&f", [ch("&f")])
# &#x…EOF: hex start state hits EOF before a digit
c("Unfinished numeric entity", "&#x", [ch("&#x")], [ABSENT])
# not; / notin; are both complete keys → exact decode, no error
c("Entity with trailing semicolon (1)", "I'm &not;it", [ch("I'm ¬it")])
c("Entity with trailing semicolon (2)", "I'm &notin;", [ch("I'm ∉")])
# longest COMPLETE key is the legacy "not" → historical decode + error
c("Entity without trailing semicolon (1)", "I'm &notit",
  [ch("I'm ¬it")], [MISSING_SEMI])
c("Entity without trailing semicolon (2)", "I'm &notin",
  [ch("I'm ¬in")], [MISSING_SEMI])
# "no" completes no key → flush verbatim, no error
c("Partial entity match at end of file", "I'm &no", [ch("I'm &no")])
# '¬' cannot start any name: zero consumed, '&' flushes, no error
c("Non-ASCII character reference name", "&¬;", [ch("&¬;")])
c("Entity + newline", "\n&gt;\n", [ch("\n>\n")])
# plane-16 private-use char after ';' — plain astral passthrough
c(";\\uDBC0\\uDC00", ";" + ASTRAL, [ch(";" + ASTRAL)])
c("Empty hex numeric entities", "&#x &#X ", [ch("&#x &#X ")],
  [ABSENT, ABSENT])
c("Invalid digit in hex numeric entity", "&#xg", [ch("&#xg")], [ABSENT])
c("Empty decimal numeric entities", "&# &#;", [ch("&# &#;")],
  [ABSENT, ABSENT])
c("Invalid digit in decimal numeric entity", "&#g", [ch("&#g")], [ABSENT])
c("Ampersand, number sign", "&#", [ch("&#")], [ABSENT])

# ------------------------------------------------- comment-end-bang + CR
# "<!----!\r>": comment-end-bang on non-'>' appends "--!" and returns
# to comment state; the normalized LF and '>' join the data; EOF closes
c("<!----!CR>", "<!----!\r>", [["Comment", "--!\n>"]], ["eof-in-comment"])
c("<!----!CRLF>", "<!----!\r\n>", [["Comment", "--!\n>"]],
  ["eof-in-comment"])

# ------------------------------------------------- DOCTYPE + CR / C0
# CR→LF is whitespace in every DOCTYPE state; EOF then force-quirks
c("<!DOCTYPE\\u000D", "<!DOCTYPE\r", [dt()], [EOF_DT])
c("<!DOCTYPE \\u000D", "<!DOCTYPE \r", [dt()], [EOF_DT])
c("<!DOCTYPE a\\u000D", "<!DOCTYPE a\r", [dt("a")], [EOF_DT])
c("<!DOCTYPE a PUBLIC\\u000D", "<!DOCTYPE a PUBLIC\r", [dt("a")], [EOF_DT])
# U+001F after PUBLIC: not whitespace, not a quote → quote error +
# bogus DOCTYPE (which swallows it; EOF in bogus doctype is NOT an
# eof-in-doctype error). The control-char complaint is an
# input-stream error, outside this collector.
c("<!DOCTYPE a PUBLIC\\u001F", "<!DOCTYPE a PUBLIC", [dt("a")],
  [NO_QUOTE_PUB])
c("<!DOCTYPE a PUBLIC''\\u000D", "<!DOCTYPE a PUBLIC''\r",
  [dt("a", pub="")], [NO_WS_PUB, EOF_DT])
c("<!DOCTYPE a SYSTEM\\u000D", "<!DOCTYPE a SYSTEM\r", [dt("a")], [EOF_DT])
c("<!DOCTYPE a SYSTEM''\\u000D", "<!DOCTYPE a SYSTEM''\r",
  [dt("a", sys_="")], [NO_WS_SYS, EOF_DT])
c("<!DOCTYPEa\\u000D", "<!DOCTYPEa\r", [dt("a")], [NO_WS_NAME, EOF_DT])
c("<!DOCTYPEa PUBLIC\\u000D", "<!DOCTYPEa PUBLIC\r", [dt("a")],
  [NO_WS_NAME, EOF_DT])
c("<!DOCTYPEa PUBLIC''\\u000D", "<!DOCTYPEa PUBLIC''\r",
  [dt("a", pub="")], [NO_WS_NAME, NO_WS_PUB, EOF_DT])
c("<!DOCTYPEa SYSTEM\\u000D", "<!DOCTYPEa SYSTEM\r", [dt("a")],
  [NO_WS_NAME, EOF_DT])
c("<!DOCTYPEa SYSTEM''\\u000D", "<!DOCTYPEa SYSTEM''\r",
  [dt("a", sys_="")], [NO_WS_NAME, NO_WS_SYS, EOF_DT])

# ------------------------------------------------- tag/attr + CR
ATAG = ["StartTag", "a", {}, False]
c("<a\\u000D>", "<a\r>", [ATAG])
c("<a \\u000D>", "<a \r>", [ATAG])
c("<a a\\u000D>", "<a a\r>", [["StartTag", "a", {"a": ""}, False]])
c("<a a \\u000D>", "<a a \r>", [["StartTag", "a", {"a": ""}, False]])
# before-attribute-value skips the LF, then '>' → missing value error
c("<a a=\\u000D>", "<a a=\r>", [["StartTag", "a", {"a": ""}, False]],
  ["missing-attribute-value"])
c("<a a=''\\u000D>", "<a a=''\r>", [["StartTag", "a", {"a": ""}, False]])
c("<a a=a\\u000D>", "<a a=a\r>", [["StartTag", "a", {"a": "a"}, False]])

# ------------------------------------------------- astral after '<'
c("<\\uDBC0\\uDC00", "<" + ASTRAL, [ch("<" + ASTRAL)],
  ["invalid-first-character-of-tag-name"])
c("\\uDBC0\\uDC00", ASTRAL, [ch(ASTRAL)])

# ------------------------------------------------- CR normalization
c("CR followed by non-LF", "\ra", [ch("\na")])
c("CR at EOF", "\r", [ch("\n")])
c("CR LF", "\r\n", [ch("\n")])
c("CR CR", "\r\r", [ch("\n\n")])
c("LF CR", "\n\r", [ch("\n\n")])
c("text CR CR CR text", "text\r\r\rtext", [ch("text\n\n\ntext")])


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "corpus", "tokenizer",
        "zhtml_ray18_ignored_ledger.test")
    with open(out, "w") as f:
        json.dump({"tests": CASES}, f, indent=1, ensure_ascii=True)
        f.write("\n")
    print(f"wrote {len(CASES)} cases -> {out}")


if __name__ == "__main__":
    main()
