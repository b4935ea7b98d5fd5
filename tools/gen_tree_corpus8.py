"""Generate tests/corpus/tree/zhtml_ray93_template_fragments.dat —
r5 families from VERDICT r4 #8 (the spec areas the real html5lib
corpus stresses hardest that local generation covered thinnest):
template FRAGMENT contexts (13.2.9 step 4.4: context `template`
pushes "in template" onto the stack of template insertion modes, so
table-section/row/cell/col/caption starts re-route through their
table modes with NO table element on the stack) and foreign-content
integration-point TEXT (13.2.6.5: svg desc/title/foreignObject and
math mtext/mi/mo/mn/ms are HTML integration points; annotation-xml
only with text/html | application/xhtml+xml encoding — HTML inside
them parses as HTML, tables foster, breakout tags do NOT break out).

PROVENANCE / METHOD: expected trees frozen after per-case hand
adjudication against the named spec sections — same policy as
gen_tree_corpus3-7.py: rerunning RE-BAKES from the current engine and
destroys regression value; only rerun after re-adjudicating, and say
so in the commit message.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zhtml_ray.html.dom import serialize  # noqa: E402
from zhtml_ray.html.treebuilder import parse, parse_fragment  # noqa: E402

# (context, input) — context None = document parse
FRAGMENT_FAMILIES = {
    "F66 template fragment contexts (13.2.9: 'in template' pushed; "
    "table parts route through table modes with no open table; "
    "head/body/frame starts fall to their templated modes)": [
        ("template", "<td>a<td>b"),
        ("template", "<tr><td>x</td></tr>"),
        ("template", "<col><col span=2>"),
        ("template", "<caption>c</caption>x"),
        ("template", "<thead><tr><th>h"),
        ("template", "<template><tr><td>y"),
        ("template", "x<table><tr><td>z"),
        ("template", "</template>after-ctx-endtag-ignored"),
        ("template", "<head>h</head>y"),
        ("template", "<body>b</body>c"),
        ("template", "<frame>x"),
        ("template", "<frameset><frame>"),
        ("template", "<colgroup><col>t"),
        ("template", "<tbody><tr><td>1<tfoot><tr><td>2"),
        ("template", "<select><option>o"),
    ],
    "F68 template fragments x foreign content (IP inside a template "
    "fragment; table parts AFTER foreign roots)": [
        ("template", "<svg><desc><b>x</b></desc></svg>"),
        ("template", "<svg><tr>t"),
        ("template", "<td><svg><foreignObject><p>p"),
        ("template", "<math><mtext><td>c"),
    ],
}

DOC_FAMILIES = {
    "F67 foreign integration-point text (13.2.6.5 tree construction "
    "dispatcher: HTML IPs svg desc/title/foreignObject + MathML text "
    "IPs mtext/mi/mo/mn/ms; annotation-xml IP iff encoding is "
    "text/html or application/xhtml+xml; tables inside IPs foster, "
    "breakout tags inside IPs do NOT break out)": [
        "<svg><desc><b>x</b></desc>y</svg>z",
        "<svg><foreignObject><p>t</p></foreignObject><rect></svg>",
        "<svg><title><table><tr><td>c</table></title></svg>",
        "<math><mtext><b>x</b><svg><desc>d</desc></svg></mtext></math>",
        "<math><mi>x<b>y</b></mi>z</math>",
        "<math><annotation-xml encoding='text/html'><p>h</p>"
        "</annotation-xml></math>",
        "<math><annotation-xml encoding='APPLICATION/XHTML+XML'><p>h"
        "</p></annotation-xml></math>",
        "<math><annotation-xml encoding='text/plain'><p>h</p>"
        "</annotation-xml></math>",
        "<math><annotation-xml><font size=1>f</annotation-xml></math>",
        "<svg><desc>a<table>b<tr>c",
        "<math><ms><table><tr><td>m</table>t</ms>n</math>",
        "<svg><foreignObject><table><caption>c</caption></table>"
        "</foreignObject></svg>",
        "<math><mn><mglyph>g</mglyph><malignmark>m</malignmark></mn>"
        "</math>",
        "<svg><desc><svg><desc>inner</desc></svg>tail</desc></svg>",
        "<math><mo><div>d</div></mo></math>",
    ],
}


def main():
    parts = []
    n = 0
    for cases in FRAGMENT_FAMILIES.values():
        for ctx, c in cases:
            tree = serialize(parse_fragment(c, ctx).document)
            parts.append(f"#data\n{c}\n#errors\n#document-fragment\n"
                         f"{ctx}\n#document\n{tree}\n")
            n += 1
    for cases in DOC_FAMILIES.values():
        for c in cases:
            tree = serialize(parse(c).document)
            parts.append(f"#data\n{c}\n#errors\n#document\n{tree}\n")
            n += 1
    out = os.path.join(os.path.dirname(__file__), "..", "tests",
                       "corpus", "tree",
                       "zhtml_ray93_template_fragments.dat")
    with open(out, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {n} cases to {out}")


if __name__ == "__main__":
    main()
