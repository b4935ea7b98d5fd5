"""Regenerate tests/corpus/tree/zhtml_ray3.dat — round-3 families for
the thin areas VERDICT r2 flagged: in-caption / in-row / in-cell
end-tag handling, adoption agency across table boundaries, select in
table, template in template, colgroup residue, plus fragment contexts.

PROVENANCE / METHOD (do not re-bake casually): expected trees were
frozen on 2026-08-18 after per-case hand adjudication against the
WHATWG spec sections named in each family title — every engine output
was reviewed against the relevant ignore-list / close-and-reprocess /
AFE-marker / template-mode-stack rule before freezing. Rerunning this
script RE-BAKES expectations from the CURRENT engine, which destroys
the corpus's regression value: only rerun after re-adjudicating every
case by hand, and say so in the commit message (same policy as
tools/gen_golden.py). A future mismatch against the frozen .dat is a
regression to adjudicate, not a reason to re-bake.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zhtml_ray.html.dom import serialize  # noqa: E402
from zhtml_ray.html.treebuilder import TreeBuilder, parse  # noqa: E402

FAMILIES = {
    "F34 in-caption end-tag family (13.2.6.4.11: ignore list, "
    "caption-close-and-reprocess list)": [
        "<table><caption>a</tbody>b", "<table><caption>a</td>b",
        "<table><caption>a</tr>b", "<table><caption>a</col>b",
        "<table><caption>a</colgroup>b", "<table><caption>a</html>b",
        "<table><caption>a</body>b", "<table><caption>a</th>b",
        "<table><caption><b>x</caption>y<tr><td>z",
        "<table><caption>a<caption>b", "<table><caption>a<col>",
        "<table><caption>a<tbody><tr><td>x", "<table><caption>a<th>h",
        "<table><caption><i>x</caption><tr><td>z",
        "<table><caption>a<colgroup><col>",
        "<table><caption>a<tfoot><tr><td>x",
        "<table><caption><table><tr><td>i</table>o",
        "<table><caption><select>s<td>d",
        "<table><caption><template>t</template>u</caption>",
    ],
    "F35 in-row / in-cell end-tag family (13.2.6.4.14-15: ignore "
    "lists, close-cell-and-reprocess)": [
        "<table><tr></td><td>x", "<table><tr></caption><td>x",
        "<table><tr></html><td>x", "<table><tr></col><td>x",
        "<table><tr></body><td>x", "<table><tr><td>a</caption>b",
        "<table><tr><td>a</col>b", "<table><tr><td>a</colgroup>b",
        "<table><tr><td>a</body>b", "<table><tr><td>a</html>b",
        "<table><tr><td>a</table>b", "<table><tr><td>a</thead>b",
        "<table><thead><tr><td>a</thead>b", "<table><tr><td><p>x<td>y",
        "<table><tr><td>x<tr>y", "<table><tr><th>h<td>d",
        "<table><tr><td>a<caption>c", "<table><tr><td>a<col>x",
        "<table><tbody><tr><td>a</tr></tbody><tr><td>b",
        "<table><tr><td><button>x<td>y", "<table><tr><td>a</tfoot>b",
        "<table><tfoot><tr><td>a</tfoot>b",
        "<table><tr><td>a<tbody><tr><td>b",
        "<table><tr><td><table><tr><th>i</table>o<td>p",
        "<table><tbody><tr><td>a<tfoot><tr><td>b<thead>",
        "<table><tr><style>s</style><td>x",
        "<table><tr><script>s</script><td>x",
        "<table><form><tr><td>x",
        "<table><tr><td><form><input></form><input>",
    ],
    "F36 adoption agency across table boundaries / multi-run "
    "misnesting (13.2.6.4.7 + AFE markers at cells/caption)": [
        "<b>1<table><tr><td>2</b>3", "<a>1<table><tr><td><a>2</table>3",
        "<a><table><a></table>b", "<p><b>1<p>2</b>3",
        "<table><td><b>x</td><td>y", "<b><table><td>x</b>y</td></table>z",
        "<i><table>t<td>x</table>j", "<b><i><table><td>1</i>2</b>3",
        "<em><p>1<table><td>2</em>3</table>4", "<b>1<i>2</b>3</i>4",
        "<a>x<div>y<a>z", "<b>b<a>a</b>c</a>d",
        "<b><p>x</b><b>y</b>z", "<i><b>1<p>2</i>3</b>4",
        "<b>1<div>2<b>3</div>4</b>5",
        "<nobr>1<nobr>2<table><nobr>3<td>4</nobr>5",
        "<b><em><b>x</b>y</em>z</b>w", "<a href=1>x<a href=2>y</a>z",
    ],
    "F37 select-in-table (13.2.6.4.17: pop-select-and-reprocess "
    "start/end lists; table-scope check on end tags)": [
        "<table><tr><td><select><option>a<td>b",
        "<table><tr><td><select><option>a</table>b",
        "<table><tr><td><select>x</tr><tr><td>y",
        "<table><tr><td><select><table>",
        "<table><tr><td><select><caption>c",
        "<select><td>x",
        "<table><tr><td><select><optgroup><option>a<th>h",
        "<table><tr><td><select>a</td>b",
        "<table><tr><td><select>a</tbody>b",
        "<table><select><option>a<tr>",
        "<table><tr><td><select><tbody>",
        "<table><tr><td><select>a</th>b",
        "<select><option>a<option>b</option><optgroup><option>c",
        "<select><select>x", "<select><textarea>t",
        "<table><tr><td><select><option>1<select><option>2",
    ],
    "F38 template-in-template and template x table modes "
    "(13.2.6.4.19 template-mode stack)": [
        "<template><template>x</template>y</template>z",
        "<template><table><template><tr><td>a",
        "<template><template><td>a",
        "x</template>y", "<template><tbody><tr><td>a</template>b",
        "<template><col>x", "<template><frame>f",
        "<table><template><tr><td>x</template></table>",
        "<template><caption>c</template>",
        "<template><template><table>t",
        "<template><select><option>o</template>p",
        "<table><tbody><template><tr><td>i</template><tr><td>j",
        "<template><tr><td>a<tr><td>b</template>",
        "<template><th>h</template>",
        "<template><table><tr><td>x</template>y",
        "<template></table><tr><td>z</template>",
    ],
    "F39 colgroup / table-structure residue (13.2.6.4.12-13)": [
        "<table><colgroup><template><col></template><tr><td>x",
        "<table><colgroup></colgroup></colgroup><tr><td>x",
        "<table><colgroup><col><caption>c",
    ],
}

FRAGMENTS = [
    ("<caption>c<tr><td>x", "table"), ("<col><col span=2>", "colgroup"),
    ("</tr><td>a", "tr"), ("<template><td>t</template>", "table"),
    ("<option>a<optgroup><option>b", "select"), ("<b>x", "b"),
    ("<li>a<li>b", "ul"), ("<tr>r", "caption"),
    ("<td>c", "template"), ("<tbody><tr><td>x</table>y", "table"),
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
        tree = serialize(TreeBuilder().parse_fragment(c, ctx).document)
        parts.append(f"#data\n{c}\n#errors\n#document-fragment\n{ctx}\n"
                     f"#document\n{tree}\n")
        n += 1
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "corpus",
                       "tree", "zhtml_ray3.dat")
    with open(out, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {n} cases to {out}")


if __name__ == "__main__":
    main()
