"""Generate tests/corpus/tree/zhtml_ray4.dat — round-3b families for
the remaining thin tree-construction areas: foreign-content stack
walking and integration-point exits (13.2.6.5), Noah's ark clause and
AFE markers (13.2.4.3), implied-end-tag families (li/dd/dt/heading/
ruby/option, 13.2.6.4.7), frameset (13.2.6.4.20-21), plaintext/xmp/
pre/listing newline skip, and the form-element-pointer rules.

PROVENANCE / METHOD (do not re-bake casually): expected trees are
frozen after per-case hand adjudication against the WHATWG spec
sections named in each family title — every engine output is reviewed
against the relevant spec rule before freezing. Rerunning this script
RE-BAKES expectations from the CURRENT engine, which destroys the
corpus's regression value: only rerun after re-adjudicating every
case by hand, and say so in the commit message (same policy as
tools/gen_golden.py). A future mismatch against the frozen .dat is a
regression to adjudicate, not a reason to re-bake.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zhtml_ray.html.dom import serialize  # noqa: E402
from zhtml_ray.html.treebuilder import parse, parse_fragment  # noqa: E402

FAMILIES = {
    "F40 foreign content x table / foster parenting (13.2.6.5 + "
    "13.2.6.4.9 table anything-else)": [
        "<table><svg><g>x</g></svg><tr><td>y",
        "<table><tr><svg><circle>c</svg><td>x",
        "<table><tr><td><svg><desc>d</desc></svg><td>y",
        "<table><math><mi>m</mi></math><tr><td>y",
        "<table><tbody><svg><g>s</table>t",
        "<table><caption><svg><g>g</svg>c</caption>d",
        "<table><colgroup><svg><g>g",
        "<select><svg><g>g</select>x",
    ],
    "F41 foreign end-tag stack walk / case handling (13.2.6.5 'any "
    "other end tag' in foreign)": [
        "<svg><g><rect></svg>x",
        "<svg><g></G>x",
        "<svg><g><circle></g>y</svg>z",
        "<svg><g>a</svG>b",
        "<math><mrow><mi>i</mrow>j</math>k",
        "<svg><g></html>",
        "<svg><g></p>x",
        "<svg><g></br>x",
        "<math><mrow></body>",
        "<svg>a</div>b</svg>c",
    ],
    "F42 integration-point exits and nesting (13.2.6.5 HTML "
    "integration points, MathML text integration points)": [
        "<svg><foreignObject><div>d</div></foreignObject><rect></svg>x",
        "<svg><foreignObject><p>a<p>b</foreignObject></svg>",
        "<math><mi><svg><g>g</svg></mi><mn>2</mn></math>",
        "<math><annotation-xml encoding=\"application/xhtml+xml\"><p>h",
        "<math><annotation-xml encoding=\"text/plain\"><p>h",
        "<math><annotation-xml><p>h</p></annotation-xml></math>",
        "<svg><desc><svg><g>inner</svg>t</desc></svg>",
        "<svg><foreignObject><table><tr><td>c</table></foreignObject>",
        "<math><ms><b>bold</b></ms><mi>i</mi></math>",
        "<svg><title><b>t</b></title><g>g</svg>",
        "<math><mtext><table><tr><td>x",
        "<svg><foreignObject><svg><circle></svg>y</foreignObject>",
        "<math><mo><span>s</span></mo>t</math>",
        "<math><mglyph>g</mglyph></math>",
        "<math><mi><mglyph>g</mglyph></mi></math>",
    ],
    "F43 foreign misc: self-closing, NUL, EOF, script flags "
    "(13.2.6.5 start-tag self-closing / U+0000)": [
        "<svg/>x",
        "<math/>x",
        "<svg><g/>x</svg>y",
        "<svg><script/>x</svg>y",
        "<svg>\x00x</svg>",
        "<svg><g>",
        "<math><mi>",
        "<p><svg><desc>d",
        "<svg><p><rect>",
    ],
    "F44 Noah's ark clause and AFE reconstruction (13.2.4.3 push "
    "onto the list of active formatting elements)": [
        "<p><b><b><b><b>x<p>y",
        "<p><b id=a><b id=a><b id=a><b id=a>x<p>y",
        "<p><b id=a><b id=b><b id=a><b id=b>x<p>y",
        "<p><b><i><b><i><b><i>x<p>y",
        "<b>1<p>2<p>3<p>4",
        "<p><b class=x><b class=x><b class=y><b class=x>w<p>z",
        "<b><b><b><b><b>x<p>y",
        "<p><span><b></span>x<p>y",
    ],
    "F45 AFE markers: applet / marquee / object / td boundaries "
    "(13.2.4.3 markers, 13.2.6.4.7)": [
        "<b><marquee>x</b>y</marquee>z",
        "<b><object>x</b>y</object>z",
        "<b><applet>x</b>y</applet>z",
        "<i><marquee><b>a</marquee>b",
        "<marquee><p>a</marquee>b",
        "<b><td>x</td>y",
        "<object><b></object>x",
        "<b><marquee></marquee></b>x",
    ],
    "F46 implied end tags: li / dd / dt (13.2.6.4.7 'li' / 'dd' / "
    "'dt' start tags in body)": [
        "<ul><li>a<li>b</ul>c",
        "<ul><li>a<ul><li>b</ul>c</ul>d",
        "<li>a<div><li>b",
        "<ol><li>a<address><li>b",
        "<dl><dd>a<dd>b<dt>c<dd>d</dl>e",
        "<dd>a<div><dd>b",
        "<ul><li><p>a<li>b",
        "<ul><li>a</li>b<li>c",
        "<li><button><li>x",
        "<dl><dt><b>a<dt>b",
        "<ul><li><ol><li>a</ol><li>b",
    ],
    "F47 implied end tags: p / headings / ruby / option / optgroup "
    "(13.2.6.4.7)": [
        "<p>a<h1>b</h1><p>c",
        "<h1>a<h2>b</h2>c",
        "<h1><p>a</h1>b",
        "<p>a<pre>b</pre>",
        "<p>a<ul><li>b</ul>",
        "<ruby><rb>a<rt>b<rb>c</ruby>",
        "<ruby><rtc><rt>a<rb>b</ruby>",
        "<select><option>a<optgroup>b<option>c</select>d",
        "<option>a<option>b",
        "<optgroup><option>a</optgroup><optgroup><option>b",
        "<p><form>a<p>b",
        "<form><p>a</form>b",
    ],
    "F48 frameset family (13.2.6.4.6 frameset-ok, .20 in frameset, "
    ".21 after frameset)": [
        "<frameset><frame src=a><frame src=b></frameset>",
        "<frameset><frameset><frame></frameset></frameset>",
        "<frameset></frameset><noframes>n</noframes>x",
        "<body>x<frameset>",
        "<body> <frameset><frame>",
        "<br><frameset><frame>",
        "<frameset><frame></frameset>x<frame>",
        "<frameset><noframes>raw <b>text</noframes></frameset>",
        "<head></head><frameset><frame>",
        "<frameset></frameset></html>x",
        "<p><frameset>",
        "<frameset><frame></frameset><frameset>",
    ],
    "F49 plaintext / xmp / listing / pre newline skip (13.2.6.4.7 "
    "'pre, listing' / 'plaintext' / 'xmp')": [
        "<pre>\nx</pre>",
        "<pre>\n\nx</pre>",
        "<pre>x\n</pre>",
        "<listing>\nx</listing>",
        "<textarea>\nx</textarea>",
        "<textarea>\r\nx</textarea>",
        "<plaintext>x</plaintext>y<b>z",
        "<p><plaintext>a</p>",
        "<xmp><b>x</b></xmp>y",
        "<p>a<xmp>b</xmp>",
        "<pre><b>\nx</b></pre>",
    ],
    "F50 form element pointer (13.2.6.4.7 'form' start/end, "
    "13.2.6.4.9 form-in-table)": [
        "<form>a<form>b</form>c",
        "<form>a</form><form>b",
        "<table><form><input type=text></form><tr><td>x",
        "<form><table><form><tr><td><input>",
        "</form>x",
        "<form><div>a</form>b</div>c",
        "<template><form>a</form><form>b</template>",
        "<form><button></form><button>x",
        "<table><tr><td><form>f</table>g",
        "<form><table><tr><td></form><input>",
    ],
    "F51 body/html attribute merge and post-body content "
    "(13.2.6.4.7 'html' / 'body' start tags, .19-.22)": [
        "<body bgcolor=a><body bgcolor=b x=y>t",
        "<html lang=a><html lang=b dir=c><body>t",
        "<body>a</body>b",
        "<body>a</body><div>d",
        "<body>a</html>b",
        "<body>a</body> \n<!--c-->",
        "<html><!--c--><body>t",
        "</body><title>t</title>",
        "<body></body><body x=1>t",
    ],
}

FRAGMENTS = [
    ("<g><rect>r</g>", "svg path"),
    ("<mi>i</mi>", "math mrow"),
    ("<div>d</div>", "svg foreignObject"),
    ("<li>a<li>b", "ol"),
    ("<frame>", "frameset"),
    ("<rt>r<rb>b", "ruby"),
    ("x</plaintext>y", "plaintext"),
    ("<form><input>", "form"),
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
        # parse_fragment understands the "svg path" namespaced form
        tree = serialize(parse_fragment(c, ctx).document)
        parts.append(f"#data\n{c}\n#errors\n#document-fragment\n{ctx}\n"
                     f"#document\n{tree}\n")
        n += 1
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "corpus",
                       "tree", "zhtml_ray4.dat")
    with open(out, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {n} cases to {out}")


if __name__ == "__main__":
    main()
