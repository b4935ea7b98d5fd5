"""Generate tests/corpus/regression/grid_endtags.dat — end-tag x
context behavioral grid BAKED FROM THE CURRENT ENGINE (same provenance
and policy as gen_regression_grid.py: regression pins, not
hand-adjudicated; rerun deliberately on spec fixes)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zhtml_ray.html.dom import serialize  # noqa: E402
from zhtml_ray.html.treebuilder import (  # noqa: E402
    NS_HTML, NS_MATHML, NS_SVG, parse, parse_fragment)
from tools.gen_regression_grid import CONTEXTS, TAGS  # noqa: E402

TEMPLATES = [
    "x</{t}>y",            # stray end tag
    "<div><{t}>a</div>b",  # block close crossing an open element
]


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "corpus", "regression")
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
    path = os.path.join(out_dir, "grid_endtags.dat")
    with open(path, "w") as f:
        f.write("\n\n".join(blocks) + "\n")
    print(f"{len(blocks)} cases -> {path}")


if __name__ == "__main__":
    main()
