"""Generate tests/corpus/regression/grid.dat — a systematic tag ×
context behavioral grid BAKED FROM THE CURRENT ENGINE.

PROVENANCE: unlike tests/corpus/tree/* (hand-adjudicated against the
WHATWG spec), these cases are NOT individually verified — they are
regression pins. Their value: any future kernel change that alters the
tree for ANY (tag, template, context) cell fails loudly, so round-4/5
refactors can't silently shift behavior the sweeps and fuzz miss.
If a deliberate spec fix changes cells, rerun this script and say so
in the commit message (same policy as gen_golden.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zhtml_ray.html.dom import serialize  # noqa: E402
from zhtml_ray.html.treebuilder import (  # noqa: E402
    NS_HTML, NS_MATHML, NS_SVG, parse, parse_fragment)

TAGS = [
    "a", "abbr", "address", "applet", "area", "article", "aside", "b",
    "base", "bdi", "big", "blockquote", "body", "br", "button", "caption",
    "center", "cite", "code", "col", "colgroup", "dd", "details", "dfn",
    "dialog", "dir", "div", "dl", "dt", "em", "embed", "fieldset",
    "figcaption", "figure", "font", "footer", "form", "frame", "frameset",
    "h1", "h6", "head", "header", "hgroup", "hr", "html", "i", "iframe",
    "image", "img", "input", "keygen", "label", "legend", "li", "link",
    "listing", "main", "marquee", "menu", "meta", "nav", "nobr", "noembed",
    "noframes", "noscript", "object", "ol", "optgroup", "option", "output",
    "p", "plaintext", "pre", "q", "rb", "rp", "rt", "rtc", "ruby", "s",
    "samp", "script", "section", "select", "small", "source", "span",
    "strike", "strong", "style", "sub", "summary", "sup", "table", "tbody",
    "td", "template", "textarea", "tfoot", "th", "thead", "time", "title",
    "tr", "track", "tt", "u", "ul", "var", "video", "wbr", "xmp",
    "svg", "math", "mi", "annotation-xml", "foreignObject",
]

TEMPLATES = ["<{t}>x</{t}>y", "<{t} id=z>x"]

CONTEXTS = [
    None,                          # full document
    ("td", NS_HTML),
    ("select", NS_HTML),
    ("template", NS_HTML),
    ("head", NS_HTML),
    ("svg", NS_SVG),
    ("mi", NS_MATHML),
]


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "corpus", "regression")
    os.makedirs(out_dir, exist_ok=True)
    blocks = []
    for tag in TAGS:
        for tpl in TEMPLATES:
            s = tpl.format(t=tag)
            for ctx in CONTEXTS:
                if ctx is None:
                    doc = parse(s).document
                    blocks.append("#data\n%s\n#errors\n#document\n%s"
                                  % (s, serialize(doc)))
                else:
                    name, ns = ctx
                    doc = parse_fragment(s, name, context_ns=ns).document
                    label = {NS_HTML: name, NS_SVG: "svg " + name,
                             NS_MATHML: "math " + name}[ns]
                    blocks.append(
                        "#data\n%s\n#errors\n#document-fragment\n%s"
                        "\n#document\n%s" % (s, label, serialize(doc)))
    path = os.path.join(out_dir, "grid.dat")
    with open(path, "w") as f:
        f.write("\n\n".join(blocks) + "\n")
    print(f"{len(blocks)} cases -> {path}")


if __name__ == "__main__":
    main()
