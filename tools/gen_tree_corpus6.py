"""Generate tests/corpus/tree/zhtml_ray6.dat — round-3d families:
in-select internals (13.2.6.4.16-17), quirks-mode tree effects
(13.2.6.4.7 'table' vs quirks), after-body / after-after-body
(13.2.6.4.19/.22), RCDATA-RAWTEXT-in-head routing, caption / cell
misnesting (13.2.6.4.11/.13-15), fragment contexts beyond div/td,
and foster-parenting × active-formatting reconstruction (13.2.6.1
foster parenting + 13.2.4.3).

PROVENANCE / METHOD: expected trees frozen after per-case hand
adjudication against the named spec sections — same policy as
gen_tree_corpus3/4/5.py: rerunning RE-BAKES from the current engine
and destroys regression value; only rerun after re-adjudicating, and
say so in the commit message. A future mismatch against the frozen
.dat is a regression to adjudicate, not a reason to re-bake.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zhtml_ray.html.dom import serialize  # noqa: E402
from zhtml_ray.html.treebuilder import parse, parse_fragment  # noqa: E402

FAMILIES = {
    "F56 in-select internals (13.2.6.4.16: option/optgroup implied "
    "pops, nested select as end tag, input/keygen/textarea "
    "pop-and-reprocess, hr-in-select, ignored start tags; .17 "
    "in-select-in-table row/cell breakout)": [
        "<select><option>a<option>b</select>c",
        "<select><optgroup><option>a</optgroup><option>b</select>",
        "<select><option><optgroup>a",
        "<select><select>b",
        "<select><input>x",
        "<select><keygen>k",
        "<select><textarea>t</textarea>u",
        "<select><hr>x",
        "<select><option>a<hr><option>b",
        "<select>a<b>c</select>d",
        "<select><option></option><option>b",
        "<select><option>a</select></option>b",
        "<select><script>s</script>x",
        "<table><tr><td><select><tr>x",
        "<table><tr><td><select><td>y",
        "<select><option>a<option>b</optgroup>c",
    ],
    "F57 quirks-mode tree effects (13.2.6.4.7 'table': p stays open "
    "in quirks; 13.2.5.4.1 doctype classification feeds it)": [
        "<p><table><td>x",
        "<!DOCTYPE html><p><table><td>x",
        "<!DOCTYPE html PUBLIC \"-//W3C//DTD HTML 4.01 Transitional//EN\">"
        "<p><table><td>x",
        "<!DOCTYPE html SYSTEM \"about:legacy-compat\"><p><table><td>x",
        "<!DOCTYPE html PUBLIC \"-//W3C//DTD XHTML 1.0 Transitional//EN\" "
        "\"http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd\">"
        "<p><table><td>x",
    ],
    "F58 after-body / after-after-body (13.2.6.4.19: comment goes on "
    "<html>; .22: comment goes on Document; stray tokens reprocess "
    "in body; second <html> merges attributes)": [
        "<body>x</body>y",
        "<body>x</body><!--c-->",
        "<body>x</body></html>y",
        "<body>x</body></html><!--c-->",
        "x</body><p>y",
        "x</html>z",
        "<html><head></head><body>b</body><html lang=x>",
        "<body>x</body> <!--c--> ",
        "</body><!--c--><p>p",
    ],
    "F59 RCDATA/RAWTEXT in head routing (13.2.6.4.4 title/style/"
    "noframes/script, generic raw-text elements swallow lookalike "
    "tags, implicit head pop on anything-else)": [
        "<title>a<b>c</title>d",
        "<title>t",
        "<style>p{}</style>x",
        "<noframes><body>n</noframes>m",
        "<script><!--<script>--></script>x",
        "<head><title></head>x</title>y",
        "<style>s<!--</style>-->t",
        "<script>s",
    ],
    "F60 caption / cell misnesting (13.2.6.4.11 caption-closes-"
    "caption, .9 td-in-table implies tbody+tr, nested tables, "
    "table-start inside caption nests via in-body)": [
        "<table><caption>a<caption>b",
        "<table><caption><td>c",
        "<table><tr><td><table><tr><td>n",
        "<table><caption><table>t",
        "<table><tr><td>a</table>b",
        "<table><tr><td><table>x</td>y",
        "<table><tbody><caption>c",
        "<table><caption>a</table>b",
        "<table><caption><div>d</caption>e",
    ],
    "F61 fragment contexts beyond div/td (13.2.9 reset + RCDATA/"
    "script-data context tokenizer states)": [],
    "F62 foster parenting x AFE reconstruction (13.2.6.1 appropriate "
    "place with foster, 13.2.4.3 reconstruct in cell / after table, "
    "cell close clears AFE to marker)": [
        "<table><b><i>x<tr><td>y",
        "<table><tr><b><td>x",
        "a<table>b<b>c</table>d",
        "<table><tr><td><b>x</table>y",
        "<b><table><td></b>x",
        "<table><b>x<i>y</table>z",
        "a<table><tr><td>b</td></tr>c</table>d",
    ],
}

FRAGMENTS = [
    ("<option>a<optgroup>b", "select"),
    ("<td>x<td>y", "tr"),
    ("<col><col span=1>", "colgroup"),
    ("<tr><td>a", "tbody"),
    ("<li>a<li>b", "ul"),
    ("x<b>y", "title"),
    ("a</script>b", "script"),
    ("<frame>", "frameset"),
    ("<tbody><tr><td>t", "table"),
    ("<caption>c", "table"),
]


def main():
    parts = []
    n = 0
    for cases in FAMILIES.values():
        for c in cases:
            tree = serialize(parse(c).document)
            parts.append(f"#data\n{c}\n#errors\n#document\n{tree}\n")
            n += 1
    for c, ctx in FRAGMENTS:
        tree = serialize(parse_fragment(c, ctx).document)
        parts.append(f"#data\n{c}\n#errors\n#document-fragment\n{ctx}\n"
                     f"#document\n{tree}\n")
        n += 1
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "corpus",
                       "tree", "zhtml_ray6.dat")
    with open(out, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {n} cases to {out}")


if __name__ == "__main__":
    main()
