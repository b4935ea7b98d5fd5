"""Generate tests/corpus/tokenizer/zhtml_ray22_comment_grid.test —
the systematic comment-edge grid (r5, VERDICT r4 #8: "the
``<!----!>`` comment-edge grid beyond the r4 cases").

METHOD — differential adjudication, stronger than engine-baking: this
file contains an INDEPENDENT implementation of the WHATWG comment
state machine (13.2.5.43–13.2.5.52, transcribed by hand from the
spec prose: comment start / start dash / comment / less-than-sign /
bang / bang dash / bang dash dash / end dash / end / end bang). The
grid of ``<!--`` + body × terminator (+ data tail when the comment
closed) strings runs through BOTH this spec machine and the engine
tokenizer; any disagreement aborts generation. What lands in the
corpus is therefore double-derived, not a frozen engine replay.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BODIES = [
    "", "-", "x", "-x", "x-", "x--", "!", "-!", "x!", "!-",
    "<", "<!", "<!-", "<!--", "<!--x", "<<", "<!!", "x<!--y",
    "x<!-y", "--", "x--y", "---", "x\x00y", "<!x",
]
TERMS = ["-->", "--!>", ">", "->", "!>", "", "-", "--", "--!", "--!-",
         "--!x>"]


def spec_comment(raw: str):
    """Independent WHATWG comment machine over ``raw`` (which starts
    with '<!--' — markup-declaration-open already consumed two
    dashes). Returns (tokens, error_codes); trailing characters after
    a closed comment pass through as data (grid tails contain no
    further markup)."""
    assert raw.startswith("<!--")
    i = 4
    n = len(raw)
    buf = []
    toks = []
    errs = []

    def emit():
        toks.append(["Comment", "".join(buf)])

    state = "start"
    while True:
        ch = raw[i] if i < n else None
        i += 1
        if state == "start":
            if ch == "-":
                state = "start_dash"
            elif ch == ">":
                errs.append("abrupt-closing-of-empty-comment")
                emit()
                state = "data"
            else:
                i -= 1
                state = "comment"
        elif state == "start_dash":
            if ch == "-":
                state = "end"
            elif ch == ">":
                errs.append("abrupt-closing-of-empty-comment")
                emit()
                state = "data"
            elif ch is None:
                errs.append("eof-in-comment")
                emit()
                break
            else:
                buf.append("-")
                i -= 1
                state = "comment"
        elif state == "comment":
            if ch == "<":
                buf.append("<")
                state = "lt"
            elif ch == "-":
                state = "end_dash"
            elif ch == "\x00":
                errs.append("unexpected-null-character")
                buf.append("�")
            elif ch is None:
                errs.append("eof-in-comment")
                emit()
                break
            else:
                buf.append(ch)
        elif state == "lt":
            if ch == "!":
                buf.append("!")
                state = "lt_bang"
            elif ch == "<":
                buf.append("<")
            else:
                i -= 1
                state = "comment"
        elif state == "lt_bang":
            if ch == "-":
                state = "lt_bang_dash"
            else:
                i -= 1
                state = "comment"
        elif state == "lt_bang_dash":
            if ch == "-":
                state = "lt_bang_dash_dash"
            else:
                i -= 1
                state = "end_dash"
        elif state == "lt_bang_dash_dash":
            if ch == ">" or ch is None:
                i -= 1
                state = "end"
            else:
                errs.append("nested-comment")
                i -= 1
                state = "end"
        elif state == "end_dash":
            if ch == "-":
                state = "end"
            elif ch is None:
                errs.append("eof-in-comment")
                emit()
                break
            else:
                buf.append("-")
                i -= 1
                state = "comment"
        elif state == "end":
            if ch == ">":
                emit()
                state = "data"
            elif ch == "!":
                state = "end_bang"
            elif ch == "-":
                buf.append("-")
            elif ch is None:
                errs.append("eof-in-comment")
                emit()
                break
            else:
                buf.append("--")
                i -= 1
                state = "comment"
        elif state == "end_bang":
            if ch == "-":
                buf.append("--!")
                state = "end_dash"
            elif ch == ">":
                errs.append("incorrectly-closed-comment")
                emit()
                state = "data"
            elif ch is None:
                errs.append("eof-in-comment")
                emit()
                break
            else:
                buf.append("--!")
                i -= 1
                state = "comment"
        elif state == "data":
            if ch is None:
                break
            toks.append(["Character", ch])
    # coalesce characters the way the corpus runner does
    out = []
    for t in toks:
        if t[0] == "Character" and out and out[-1][0] == "Character":
            out[-1][1] += t[1]
        else:
            out.append(list(t))
    return out, errs


def engine_tokens(raw: str):
    from collections import Counter

    from zhtml_ray.html import tokenizer as tkz
    t = tkz.Tokenizer(raw, collect_input_errors=False)
    toks = []
    for tok in t.tokens():
        if tok[0] == "Character":
            if toks and toks[-1][0] == "Character":
                toks[-1][1] += tok[1]
            else:
                toks.append(["Character", tok[1]])
        else:
            toks.append([tok[0], tok[1]])
    return toks, Counter(c for c, _ in t.errors)


def main():
    from collections import Counter
    cases = []
    seen = set()
    n_mismatch = 0
    for body in BODIES:
        for term in TERMS:
            raw = "<!--" + body + term
            variants = [raw]
            want, werr = spec_comment(raw)
            # if the comment closed (a Comment token emitted with no
            # eof error), also probe with a data tail
            if want and want[0][0] == "Comment" and \
                    "eof-in-comment" not in werr:
                variants.append(raw + "z")
            for v in variants:
                if v in seen:
                    continue
                seen.add(v)
                want, werr = spec_comment(v)
                got, gerr = engine_tokens(v)
                if got != want or gerr != Counter(werr):
                    n_mismatch += 1
                    print(f"MISMATCH {v!r}:\n  spec   {want} {werr}\n"
                          f"  engine {got} {dict(gerr)}")
                    continue
                cases.append({
                    "description": f"comment grid {v!r}",
                    "input": v,
                    "output": want,
                    "errors": [{"code": c} for c in werr],
                })
    if n_mismatch:
        print(f"{n_mismatch} spec/engine mismatches — NOT writing")
        sys.exit(1)
    out = os.path.join(os.path.dirname(__file__), "..", "tests",
                       "corpus", "tokenizer",
                       "zhtml_ray22_comment_grid.test")
    with open(out, "w") as f:
        json.dump({"tests": cases}, f, indent=1)
    print(f"wrote {len(cases)} cases to {out} (0 mismatches)")


if __name__ == "__main__":
    main()
