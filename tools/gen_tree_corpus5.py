"""Generate tests/corpus/tree/zhtml_ray5.dat — round-3c families:
adoption-agency loop counters and degenerate arms (13.2.6.4.7 AA
steps 1-4, outer loop cap 8, inner loop cap 3), the in-table
hidden-input / character special cases (13.2.6.4.9), image→img and
misc in-body token arms, and head / after-head element routing
(13.2.6.4.4-.6).

PROVENANCE / METHOD: expected trees frozen after per-case hand
adjudication against the named spec sections — same policy as
gen_tree_corpus3/4.py: rerunning RE-BAKES from the current engine and
destroys regression value; only rerun after re-adjudicating, and say
so in the commit message. A future mismatch against the frozen .dat
is a regression to adjudicate, not a reason to re-bake.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zhtml_ray.html.dom import serialize  # noqa: E402
from zhtml_ray.html.treebuilder import parse, parse_fragment  # noqa: E402

FAMILIES = {
    "F52 adoption agency counters and degenerate arms (13.2.6.4.7: "
    "step-2 same-as-current fast path, no-furthest-block pop, outer "
    "loop x8, AFE-not-in-stack removal)": [
        "<b><i></b>x",
        "<p>1<b>2<i>3</b>4</i>5",
        "<a><div><div><div><div><div><div><div><div>x</a>y",
        "<b><div1><div2><div3>x</b>y",
        "<nobr>x<nobr>y<nobr>z",
        "<b><button>x</b>y</button>z",
        "<a href=a>x<table><a href=b>y</table>z",
        "<b>x</b></b>y",
        "<i><p>1</i>2<i>3</p>4",
        "<b><p></b></p>x",
        "<a><b><a>x</a></b>y",
        "<em><strong><em>x</strong>y</em>z",
        "<b><div><i><div>x</i>y</div>z</div>w",
        "<u><p><u>a</u>b</p>c</u>d",
        "<s><div><s>x</div></s>y",
    ],
    "F53 in-table input/hidden and stray-character arms "
    "(13.2.6.4.9: hidden-input insert-and-pop, pending table chars)": [
        "<table><input type=hidden name=x><tr><td>a",
        "<table><input type=HIDDEN><tr><td>a",
        "<table><input type=text><tr><td>a",
        "<table><input><tr><td>a",
        "<table> <tr> <td>a",
        "<table>x y<tr><td>a",
        "<table><tr><td>a</td> x </tr>",
        "<table>&amp;<tr><td>a",
        "<table><style>s</style><tr><td>a",
        "<table><script>s</script><tr><td>a",
        "<table><tbody><input type=hidden><tr><td>a",
    ],
    "F54 image/misc in-body token arms (13.2.6.4.7 'image' rename, "
    "void elements, year-2000 arms)": [
        "<image src=a>x",
        "<wbr>a<keygen>b<embed src=e>c",
        "<track src=t><source src=s><param name=p>",
        "<hr>a<hr/>b",
        "<br/>x</br>y",
        "<textarea><b>t</textarea>u",
        "<iframe><b>i</iframe>j",
        "<noembed><b>n</noembed>m",
        "<button>a<button>b",
        "<p><button><p>x",
        "<main>a<main>b",
        "<search>a</search>b",
        "<dialog open>d</dialog>e",
    ],
    "F55 head / after-head element routing (13.2.6.4.4-.6: in-head "
    "passthrough from after-head, head end-tag forms)": [
        "<head><style>s</style></head><title>t</title><body>b",
        "<head></head><style>s</style>x",
        "<head></head><script>sc</script><body>b",
        "<head></head><base href=u><body>b",
        "<head></head><meta charset=u>x",
        "<head><template><meta></template></head>x",
        "<head></head> <link rel=r>x",
        "<head><noscript><link></noscript></head>b",
        "<head><noscript><p>n</noscript>b",
        "</head>x",
        "<head></head><head>x",
        "<head></head><body></body><head>z",
        "<title>t</title>b",
        "<head><base><basefont><bgsound><link><meta></head>x",
    ],
}

FRAGMENTS = [
    ("<b>x</b></b>y", "div"),
    ("<input type=hidden>", "table"),
    ("a<table>b", "td"),
    ("<style>s</style>x", "head"),
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
                       "tree", "zhtml_ray5.dat")
    with open(out, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {n} cases to {out}")


if __name__ == "__main__":
    main()
