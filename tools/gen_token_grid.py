"""Generate tests/corpus/regression/tokens.json — token-stream
regression pins BAKED FROM THE CURRENT ENGINE.

PROVENANCE: like gen_regression_grid.py, these are NOT hand-verified
spec adjudications — they pin the current (tokens, error codes) of a
systematic input grid across all initial tokenizer states, so a
future tokenizer change can't silently shift a stream the corpus
families and the fast/slow differential (which only guards WITHIN one
commit) would miss. Deliberate fixes regenerate with a commit note.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zhtml_ray.html import tokenizer as tkz  # noqa: E402

INPUTS = [
    # tags / attrs
    "<div>", "<DIV>", "<div/>", "<div a>", "<div a=b>", '<div a="b">',
    "<div a='b'>", "<div a=b c=d>", "<div a=b a=c>", "<div  a = b >",
    "<div\ta=b>", "<div a>", "<div =x>", "<div a==b>", "<div a=`b`>",
    "<div a=b/>", "<div a=/>", "<div/ a=b>", "</div>", "</div a=b>",
    "</div/>", "< div>", "<1div>", "</>", "<>", "</ >", "<!>", "<?pi?>",
    "<div a=b", "<div a=\"b", "<div a='b", "<di",
    # charrefs
    "&amp;", "&amp", "&AMP", "&AMP;", "&notin;", "&notit;", "&not;x",
    "&notx", "&#65;", "&#x41;", "&#X41;", "&#65", "&#x", "&#", "&;",
    "&#0;", "&#xD800;", "&#x110000;", "&#xFDD0;", "&#x80;", "&#x9F;",
    "&a", "&", "a&b;c", "&CounterClockwiseContourIntegral;",
    "<div a='&amp;'>", "<div a='&not;'>", "<div a='&notin'>",
    "<div a='&not=x'>", "<div a='&ampx'>", "<div a=&amp>",
    # comments / doctype / cdata
    "<!--a-->", "<!---->", "<!-->", "<!--->", "<!--a--!>", "<!--a--b-->",
    "<!--a<!--b-->", "<!--a", "<!--a-", "<!--a--", "<!--a--!",
    "<!DOCTYPE html>", "<!doctype html>", "<!DOCTYPEhtml>", "<!DOCTYPE>",
    "<!DOCTYPE html PUBLIC 'a' 'b'>", '<!DOCTYPE html PUBLIC "a">',
    "<!DOCTYPE html SYSTEM 'a'>", "<!DOCTYPE html PUBLIC'a'>",
    "<!DOCTYPE html x>", "<!DOCTYPE", "<![CDATA[x]]>", "<![CDATA[x",
    # NUL / CR / controls
    "a\x00b", "<div\x00>", "<div a\x00=b>", "<div a=\x00>", "a\rb\r\nc",
    "<!--\x00-->", "&#\x00;",
    # script-ish
    "<script>a</script>", "x</script>y",
    "<!--<script>a</script>-->",
]

STATES = [
    (tkz.DATA, None), (tkz.RCDATA, "title"), (tkz.RAWTEXT, "style"),
    (tkz.SCRIPT_DATA, "script"), (tkz.PLAINTEXT, None),
    (tkz.CDATA_SECTION, None),
]


def stream(s, state, last):
    t = tkz.Tokenizer(s, initial_state=state, last_start_tag=last)
    toks = []
    for tok in t.tokens():
        if tok[0] in ("StartTag", "EndTag"):
            toks.append([tok[0], tok[1], sorted(tok[2].items()), tok[3]])
        else:
            toks.append(list(tok))
    errs = [[c, o] for c, o in t.errors]
    return {"tokens": toks, "errors": errs}


def main():
    out = []
    for s in INPUTS:
        for state, last in STATES:
            out.append({"input": s, "state": state, "last": last,
                        "expect": stream(s, state, last)})
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "corpus", "regression",
        "tokens.json")
    with open(path, "w") as f:
        json.dump(out, f, ensure_ascii=False, indent=0)
    print(f"{len(out)} cases -> {path}")


if __name__ == "__main__":
    main()
