"""Generate tests/corpus/tree/zhtml_ray2.dat — tree-construction
conformance families (the part the reference declared but never built,
/root/reference/src/parser.zig:18-42,130-133).

Expected trees are built by TEMPLATES that encode the WHATWG
tree-construction rules family-by-family (p-closers, heading pops,
formatting reconstruction, adoption agency, foster parenting, foreign
breakout list, SVG case adjustments, void elements, rawtext, frameset).
The spec tag lists are transcribed from the spec text here — not read
from the engine. Mismatches are adjudicated by hand (engine bug → fix
engine; template transcription error → fix here); engine output is
never pasted in blind.
"""

import os

CASES = []


class E:
    def __init__(self, tag, attrs=None, *kids):
        self.tag = tag
        self.attrs = attrs or {}
        self.kids = list(kids)


def render(node, ind, out):
    if isinstance(node, str):
        out.append(f"| {' ' * ind}\"{node}\"")
        return
    if node.tag == "content":
        # html5lib-tests prints the template content node bare
        out.append(f"| {' ' * ind}content")
        for kid in node.kids:
            render(kid, ind + 2, out)
        return
    out.append(f"| {' ' * ind}<{node.tag}>")
    for k in sorted(node.attrs):
        out.append(f"| {' ' * (ind + 2)}{k}=\"{node.attrs[k]}\"")
    for kid in node.kids:
        render(kid, ind + 2, out)


def case(desc, data, *body_kids, head_kids=(), html_extra=None,
         doctype=None, raw_tree=None):
    out = []
    if raw_tree is None:
        if doctype:
            out.append(f"| <!DOCTYPE {doctype}>")
        out.append("| <html>")
        out.append("|   <head>")
        for k in head_kids:
            render(k, 4, out)
        if html_extra is None:
            out.append("|   <body>")
            for k in body_kids:
                render(k, 4, out)
        else:
            for k in html_extra:
                render(k, 2, out)
        tree = "\n".join(out)
    else:
        tree = raw_tree
    CASES.append((desc, data, tree))


# ------------------------------------------------- F1: <p> closed by block
# spec "in body" start tags that close a p in button scope
P_CLOSERS = ("address article aside blockquote center details dialog dir "
             "div dl fieldset figcaption figure footer header hgroup main "
             "menu nav ol section summary ul p pre listing form h1 h2 h3 "
             "h4 h5 h6 li").split()
# li closes p only inside list-item handling; plain <li> start also
# closes p in button scope per spec — keep it in the family.
for x in P_CLOSERS:
    case(f"p closed by {x}", f"<p>a<{x}>b",
         E("p", None, "a"), E(x, None, "b"))

# --------------------------------------------- F2: heading pops heading
for i in range(1, 7):
    for j in range(1, 7):
        case(f"h{i} then h{j}", f"<h{i}>a<h{j}>b",
             E(f"h{i}", None, "a"), E(f"h{j}", None, "b"))

# ----------------------------------------------- F3: li / dd / dt chains
case("li chain", "<ul><li>a<li>b<li>c</ul>d",
     E("ul", None, E("li", None, "a"), E("li", None, "b"),
       E("li", None, "c")), "d")
case("nested ul li", "<ul><li>a<ul><li>b</ul><li>c</ul>",
     E("ul", None,
       E("li", None, "a", E("ul", None, E("li", None, "b"))),
       E("li", None, "c")))
case("dt dd chain", "<dl><dt>a<dd>b<dt>c</dl>",
     E("dl", None, E("dt", None, "a"), E("dd", None, "b"),
       E("dt", None, "c")))
case("dd closes dd", "<dl><dd>a<dd>b</dl>",
     E("dl", None, E("dd", None, "a"), E("dd", None, "b")))
case("li not closed by div", "<ul><li>a<div>b</div>c</ul>",
     E("ul", None, E("li", None, "a", E("div", None, "b"), "c")))

# ------------------------------------- F4: formatting reconstruction
FMT = "b i u s em strong small code tt big strike font nobr".split()
for f in FMT:
    case(f"reconstruct {f} across p", f"<p><{f}>1</p><p>2",
         E("p", None, E(f, None, "1")), E("p", None, E(f, None, "2")))

# ------------------------------------------- F5: adoption agency per fmt
for f in FMT:
    if f == "nobr":
        continue  # nobr start implies extra nobr handling; covered below
    case(f"adoption agency {f} div", f"<p>1<{f}>2<div>3</{f}>4</div>",
         E("p", None, "1", E(f, None, "2")),
         E("div", None, E(f, None, "3"), "4"))
case("adoption agency a div a", "<a>1<div>2<a>3",
     E("a", None, "1"),
     E("div", None, E("a", None, "2"), E("a", None, "3")))
case("adoption agency simple", "<b><i>x</b>y</i>",
     E("b", None, E("i", None, "x")), E("i", None, "y"))

# ------------------------------- F6: nested formatting + Noah's ark (3)
case("four nested b", "<b><b><b><b>x",
     E("b", None, E("b", None, E("b", None, E("b", None, "x")))))
case("noahs ark prunes 4th b", "<p><b><b><b><b>1</p><p>2",
     E("p", None,
       E("b", None, E("b", None, E("b", None, E("b", None, "1"))))),
     E("p", None, E("b", None, E("b", None, E("b", None, "2")))))

# --------------------------------------------- F7: foster parenting
for x in "div p b span h1 em code ul".split():
    case(f"foster {x} out of table",
         f"<table><{x}>y</{x}><tr><td>z",
         E(x, None, "y"),
         E("table", None,
           E("tbody", None, E("tr", None, E("td", None, "z")))))
case("hidden input stays in table", '<table><input type="hidden"><td>x',
     E("table", None, E("input", {"type": "hidden"}),
       E("tbody", None, E("tr", None, E("td", None, "x")))))
case("text input fostered", '<table><input type="text"><td>x',
     E("input", {"type": "text"}),
     E("table", None, E("tbody", None, E("tr", None, E("td", None, "x")))))
case("fostered text before table", "<table>x<td>y",
     "x", E("table", None,
            E("tbody", None, E("tr", None, E("td", None, "y")))))

# ------------------------------- F8: template / select structure
case("template in table", "<table><template>x</template><tr><td>y",
     E("table", None,
       E("template", None, E("content", None, "x")),
       E("tbody", None, E("tr", None, E("td", None, "y")))))
case("select closed by table", "<table><tr><td><select><table>",
     E("table", None,
       E("tbody", None, E("tr", None,
         E("td", None, E("select"), E("table"))))))
case("option optgroup", "<select><option>a<optgroup>b<option>c</select>",
     E("select", None, E("option", None, "a"),
       E("optgroup", None, "b", E("option", None, "c"))))
case("select in table keeps table", "<table><select><option>o</select><tr><td>c",
     E("select", None, E("option", None, "o")),
     E("table", None, E("tbody", None, E("tr", None, E("td", None, "c")))))
case("nested select reopens", "<select>a<select>b",
     E("select", None, "a"), "b")

# --------------------------------------- F9: foreign-content breakout
BREAKOUT = ("b big blockquote body br center code dd div dl dt em embed "
            "h1 h2 h3 h4 h5 h6 head hr i img li listing menu meta nobr ol "
            "p pre ruby s small span strong strike sub sup table tt u ul "
            "var").split()
VOID_HTML = set("br embed hr img meta".split())
for x in BREAKOUT:
    if x in ("body", "head", "table"):
        continue  # body/head merge specially; table interacts with foster
    if x in VOID_HTML:
        case(f"svg breakout {x}", f"<svg><{x}>z",
             E("svg svg"), E(x), "z")
    else:
        case(f"svg breakout {x}", f"<svg><{x}>z",
             E("svg svg"), E(x, None, "z"))
case("svg font no attrs stays foreign", "<svg><font>x",
     E("svg svg", None, E("svg font", None, "x")))
case("svg font color breaks out", '<svg><font color="red">x',
     E("svg svg"), E("font", {"color": "red"}, "x"))
case("math breakout", "<math><div>x",
     E("math math"), E("div", None, "x"))

# --------------------------------------- F10: SVG tag-name adjustment
SVG_ADJUST = ("altGlyph altGlyphDef altGlyphItem animateColor animateMotion "
              "animateTransform clipPath feBlend feColorMatrix "
              "feComponentTransfer feComposite feConvolveMatrix "
              "feDiffuseLighting feDisplacementMap feDistantLight "
              "feDropShadow feFlood feFuncA feFuncB feFuncG feFuncR "
              "feGaussianBlur feImage feMerge feMergeNode feMorphology "
              "feOffset fePointLight feSpecularLighting feSpotLight feTile "
              "feTurbulence foreignObject glyphRef linearGradient "
              "radialGradient textPath").split()
for name in SVG_ADJUST:
    case(f"svg case adjust {name}", f"<svg><{name.lower()}></{name.lower()}></svg>",
         E("svg svg", None, E(f"svg {name}")))

# ----------------------------- F11: foreign attribute adjustments
case("svg attributeName adjust", '<svg><animate attributename="x"/></svg>',
     E("svg svg", None, E("svg animate", {"attributeName": "x"})))
case("svg viewBox adjust", '<svg viewbox="0 0 1 1"></svg>',
     E("svg svg", {"viewBox": "0 0 1 1"}))
case("xlink href adjust", '<svg><a xlink:href="u">t</a></svg>',
     E("svg svg", None, E("svg a", {"xlink href": "u"}, "t")))
case("xml lang adjust", '<svg xml:lang="en"></svg>',
     E("svg svg", {"xml lang": "en"}))
case("math definitionURL", '<math definitionurl="u"></math>',
     E("math math", {"definitionURL": "u"}))

# --------------------------------------------- F12: rawtext / rcdata
for x in "xmp iframe noembed".split():
    case(f"rawtext {x}", f"<{x}><b>1</b></{x}>2",
         E(x, None, "<b>1</b>"), "2")
for x in ("style", "noframes"):
    # head-ok elements: at document start they land in <head>
    case(f"rawtext {x}", f"<{x}><b>1</b></{x}>2",
         "2", head_kids=(E(x, None, "<b>1</b>"),))
case("script rawtext", "<script><b>1</b></script>2",
     "2", head_kids=(E("script", None, "<b>1</b>"),))
case("title rcdata", "<title>&amp;<b></title>x",
     "x", head_kids=(E("title", None, "&<b>"),))
case("textarea rcdata", "<textarea><b>&lt;</textarea>x",
     E("textarea", None, "<b><"), "x")

# --------------------------------------------------- F13: void elements
for x in ("area br embed img keygen wbr param source track input "
          "base basefont bgsound link meta").split():
    in_head = x in set("base basefont bgsound link meta".split())
    if in_head:
        # in-body head-element rule: inserted at current position (body)
        case(f"void {x} in body", f"x<{x}>y", "x", E(x), "y")
    else:
        case(f"void {x} in body", f"x<{x}>y", "x", E(x), "y")
case("end tag br", "x</br>y", "x", E("br"), "y")
case("self closing void", "<br/><img src='u'/>t",
     E("br"), E("img", {"src": "u"}), "t")

# -------------------------------------------------------- F14: frameset
case("frameset basic", "<frameset><frame></frameset>",
     raw_tree="| <html>\n|   <head>\n|   <frameset>\n|     <frame>")
case("nested frameset", "<frameset><frame><frameset><frame></frameset></frameset>",
     raw_tree=("| <html>\n|   <head>\n|   <frameset>\n|     <frame>\n"
               "|     <frameset>\n|       <frame>"))
case("frameset with noframes", "<frameset><noframes>x</noframes></frameset>",
     raw_tree=("| <html>\n|   <head>\n|   <frameset>\n|     <noframes>\n"
               "|       \"x\""))
case("frameset ignored after body text", "x<frameset><frame></frameset>",
     "x")

# --------------------------------------------- F15: misc spec structure
case("body attrs merged", '<body a="1"><body b="2">x',
     raw_tree=('| <html>\n|   <head>\n|   <body>\n|     a="1"\n'
               '|     b="2"\n|     "x"'))
case("html attrs merged", '<html a="1"><html b="2"><p>x',
     raw_tree=('| <html>\n|   a="1"\n|   b="2"\n|   <head>\n|   <body>\n'
               '|     <p>\n|       "x"'))
case("duplicate attr first wins", '<p id="1" id="2">x',
     E("p", {"id": "1"}, "x"))
# spec: </p> with no open p INSERTS an empty p element (in-body rule)
case("stray end tags", "</div></p>x<p>y</p></p>",
     "x", E("p", None, "y"), E("p"))
case("eof in table cell", "<table><tr><td>x",
     E("table", None, E("tbody", None, E("tr", None, E("td", None, "x")))))
case("caption then row", "<table><caption>c<tr><td>d",
     E("table", None, E("caption", None, "c"),
       E("tbody", None, E("tr", None, E("td", None, "d")))))
case("colgroup col", "<table><colgroup><col><col><tr><td>x",
     E("table", None, E("colgroup", None, E("col"), E("col")),
       E("tbody", None, E("tr", None, E("td", None, "x")))))
case("th and td", "<table><tr><th>h<td>d",
     E("table", None, E("tbody", None,
       E("tr", None, E("th", None, "h"), E("td", None, "d")))))
case("tfoot thead order kept", "<table><tfoot><tr><td>f<thead><tr><td>h",
     E("table", None,
       E("tfoot", None, E("tr", None, E("td", None, "f"))),
       E("thead", None, E("tr", None, E("td", None, "h")))))
case("image becomes img", "<image src='u'>x",
     E("img", {"src": "u"}), "x")
case("plaintext swallows all", "<plaintext></plaintext><b>",
     E("plaintext", None, "</plaintext><b>"))
case("xmp rawtext p close", "<p>a<xmp>b</xmp>",
     E("p", None, "a"), E("xmp", None, "b"))


# --------------------------------------- F17: table text / whitespace
case("ws-only text stays in table", "<table> <tr><td>x",
     E("table", None, " ",
       E("tbody", None, E("tr", None, E("td", None, "x")))))
case("mixed table text fostered", "<table>a b<tr><td>x",
     "a b", E("table", None,
              E("tbody", None, E("tr", None, E("td", None, "x")))))

# ------------------------------------------------------ F18: comments
case("comments around html", "<!--c--><html><!--d--><body>x",
     raw_tree=("| <!-- c -->\n| <html>\n|   <!-- d -->\n|   <head>\n"
               "|   <body>\n|     \"x\""))
case("comment after body", "<p>x</p></body><!--c-->",
     raw_tree=("| <html>\n|   <head>\n|   <body>\n|     <p>\n"
               "|       \"x\"\n|   <!-- c -->"))
case("comment after html", "<p>x</body></html><!--c-->",
     raw_tree=("| <html>\n|   <head>\n|   <body>\n|     <p>\n"
               "|       \"x\"\n| <!-- c -->"))
case("comment in head", "<head><!--c--></head><body>x",
     raw_tree=("| <html>\n|   <head>\n|     <!-- c -->\n|   <body>\n"
               "|     \"x\""))

# ------------------------------------------- F19: doctype serialization
case("doctype system only", '<!DOCTYPE html SYSTEM "s"><p>x',
     raw_tree=('| <!DOCTYPE html "" "s">\n| <html>\n|   <head>\n'
               '|   <body>\n|     <p>\n|       "x"'))
case("doctype public only", '<!DOCTYPE html PUBLIC "p"><p>x',
     raw_tree=('| <!DOCTYPE html "p" "">\n| <html>\n|   <head>\n'
               '|   <body>\n|     <p>\n|       "x"'))

# --------------------------------------------- F20: template edge cases
case("nested templates eof", "<template><template>x",
     raw_tree=("| <html>\n|   <head>\n|     <template>\n|       content\n"
               "|         <template>\n|           content\n"
               "|             \"x\"\n|   <body>"))
case("template tr td", "<template><tr><td>x</td></tr></template>y",
     "y",
     head_kids=(E("template", None,
                  E("content", None,
                    E("tr", None, E("td", None, "x")))),))

# --------------------------------------------- F21: select end tags
case("option end tags", "<select><option>a</option><option>b</select>c",
     E("select", None, E("option", None, "a"), E("option", None, "b")),
     "c")
case("optgroup end pops option", "<select><optgroup><option>a</optgroup></select>",
     E("select", None, E("optgroup", None, E("option", None, "a"))))

# ------------------------------------------- F22: text after </body>
case("text after body end", "<p>x</body>y",
     E("p", None, "xy"))
# div reprocessed in body still closes the open p (button scope)
case("tag after body end", "<p>x</body><div>y",
     E("p", None, "x"), E("div", None, "y"))

# --------------------------------------------- F23: misnested tables
case("table in table", "<table><table><tr><td>x",
     E("table"),
     E("table", None, E("tbody", None, E("tr", None, E("td", None, "x")))))
case("td outside row", "<table><td>x",
     E("table", None, E("tbody", None, E("tr", None, E("td", None, "x")))))
case("tr after tbody close", "<table><tbody></tbody><tr><td>x",
     E("table", None, E("tbody"),
       E("tbody", None, E("tr", None, E("td", None, "x")))))

# ----------------------------------------------- F24: button scoping
case("button closes p scope", "<button><p>a</button>b",
     E("button", None, E("p", None, "a")), "b")
case("nested button implies close", "<button>a<button>b",
     E("button", None, "a"), E("button", None, "b"))


# -------------------- F25: canonical spec misnesting examples (13.2.10)
# the WHATWG spec's own worked adoption-agency examples, attrs preserved
case("spec misnest b i p", "<b>A<i>B<p>C</b>D",
     E("b", None, "A", E("i", None, "B")),
     E("i", None, E("p", None, E("b", None, "C"), "D")))
case("spec misnest s b attrs", '<p>1<s id="A">2<b id="B">3</p>4',
     E("p", None, "1",
       E("s", {"id": "A"}, "2", E("b", {"id": "B"}, "3"))),
     E("s", {"id": "A"}, E("b", {"id": "B"}, "4")))
case("reconstruct keeps attrs", '<p><b class="x">1</p><p>2',
     E("p", None, E("b", {"class": "x"}, "1")),
     E("p", None, E("b", {"class": "x"}, "2")))

# ------------------------- F26: markup-declaration-open error recovery
# (tree-level view of '<!x' bogus comments)
case("bogus markup declaration", "<!x>y",
     raw_tree=("| <!-- x -->\n| <html>\n|   <head>\n|   <body>\n"
               "|     \"y\""))
case("partial cdata keyword", "<![CDAT>y",
     raw_tree=("| <!-- [CDAT -->\n| <html>\n|   <head>\n|   <body>\n"
               "|     \"y\""))


# ---------------- F27: head elements appearing after </head> / in body
# spec after-head: base/basefont/bgsound/link/meta/noframes/script/
# style/template/title are a parse error but inserted INTO head
for x in ("base", "link", "meta"):
    case(f"{x} after head goes into head", f"<head></head><{x}><body>x",
         "x", head_kids=(E(x),))
case("title after head goes into head", "<head></head><title>t</title>x",
     "x", head_kids=(E("title", None, "t"),))
case("style after head goes into head", "<head></head><style>s</style>x",
     "x", head_kids=(E("style", None, "s"),))
case("script after head goes into head", "<head></head><script>s</script>x",
     "x", head_kids=(E("script", None, "s"),))
# but once body content exists, head elements land in BODY (in-head
# rules run with body as current node)
case("meta after body text stays in body", "a<meta>b", "a", E("meta"), "b")
case("style in body stays at current pos", "a<style>s</style>b",
     "a", E("style", None, "s"), "b")


# ------------------- F29: table-section end-tag / implied-close family
# (adjudicated against the in-table/in-caption/in-row/in-cell specs)
case("text after caption fostered", "<table><caption>x</caption>y<tr><td>z",
     "y", E("table", None, E("caption", None, "x"),
            E("tbody", None, E("tr", None, E("td", None, "z")))))
case("td implies caption close", "<table><caption>a<td>b",
     E("table", None, E("caption", None, "a"),
       E("tbody", None, E("tr", None, E("td", None, "b")))))
case("tr end then td implies row", "<table><tr><td>a</tr><td>b",
     E("table", None, E("tbody", None,
       E("tr", None, E("td", None, "a")),
       E("tr", None, E("td", None, "b")))))
case("text between cells fostered", "<table><tr><td>a</td>b<td>c",
     "b", E("table", None, E("tbody", None,
            E("tr", None, E("td", None, "a"), E("td", None, "c")))))
case("formatting cleared at table end", "<table><tr><td>a<b>c</table>d",
     E("table", None, E("tbody", None,
       E("tr", None, E("td", None, "a", E("b", None, "c"))))), "d")
case("col implies colgroup", "<table><col><tr><td>x",
     E("table", None, E("colgroup", None, E("col")),
       E("tbody", None, E("tr", None, E("td", None, "x")))))
case("caption in tbody splits sections", "<table><tbody><caption>c<tr><td>x",
     E("table", None, E("tbody"), E("caption", None, "c"),
       E("tbody", None, E("tr", None, E("td", None, "x")))))
case("stray table end ignored", "x</table>y", "xy")
case("tbody end in row then td", "<table><tr></tbody><td>x",
     E("table", None, E("tbody", None, E("tr")),
       E("tbody", None, E("tr", None, E("td", None, "x")))))
case("thead closed by tbody", "<table><thead><tr><th>h</thead><tbody><tr><td>d",
     E("table", None,
       E("thead", None, E("tr", None, E("th", None, "h"))),
       E("tbody", None, E("tr", None, E("td", None, "d")))))

# ----------------- F30: in_select / after-body residue (adjudicated)
case("text between options", "<select><option>a</option>b<option>c",
     E("select", None, E("option", None, "a"), "b", E("option", None, "c")))
case("optgroup end then text", "<select><optgroup><option>a</optgroup>b",
     E("select", None, E("optgroup", None, E("option", None, "a")), "b"))
case("input closes select", "<select>a<input>b",
     E("select", None, "a"), E("input"), "b")
case("keygen closes select", "<select><keygen>x",
     E("select"), E("keygen"), "x")
case("button in select ignored", "<select><button>x",
     E("select", None, "x"))
case("select fostered from table", "<table><select><option>a<td>b",
     E("select", None, E("option", None, "a")),
     E("table", None, E("tbody", None, E("tr", None, E("td", None, "b")))))
case("p inside option", "<option>a<p>b",
     E("option", None, "a", E("p", None, "b")))
case("text after html end", "<p>x</html>y",
     E("p", None, "xy"))
case("comments after body and html", "<p>x</body><!--c--></html><!--d-->e",
     raw_tree=("| <html>\n|   <head>\n|   <body>\n|     <p>\n"
               "|       \"xe\"\n|   <!-- c -->\n| <!-- d -->"))

# -------------- F31: template insertion-mode stack (adjudicated vs
# the html5lib template.dat conventions: bare td/col/tr keep their
# shape inside content, no implied table wrapper)
case("template bare cells", "<template><td>a<td>b</template>x",
     "x", head_kids=(E("template", None, E("content", None,
                       E("td", None, "a"), E("td", None, "b"))),))
case("template bare col", "<template><col></template>x",
     "x", head_kids=(E("template", None,
                       E("content", None, E("col"))),))
case("template bare rows", "<template><tr><td>a</tr><tr><td>b</template>x",
     "x", head_kids=(E("template", None, E("content", None,
                       E("tr", None, E("td", None, "a")),
                       E("tr", None, E("td", None, "b")))),))
case("template row in table", "<table><template><tr><td>x</td></tr></template></table>y",
     E("table", None, E("template", None, E("content", None,
       E("tr", None, E("td", None, "x"))))), "y")
case("nested templates with text", "<template><template>a</template>b</template>c",
     "c", head_kids=(E("template", None, E("content", None,
                       E("template", None, E("content", None, "a")),
                       "b")),))
case("stray end tag in template", "<template></div>x</template>y",
     "y", head_kids=(E("template", None, E("content", None, "x")),))
case("template in body div", "<div><template><p>t</template>after</div>",
     E("div", None,
       E("template", None, E("content", None, E("p", None, "t"))),
       "after"))

# ------- F32: in_head_noscript / foreign integration / after_frameset
case("noscript keeps head elements",
     "<head><noscript><link><style>s</style></noscript></head>x",
     "x", head_kids=(E("noscript", None, E("link"),
                       E("style", None, "s")),))
case("p breaks out of noscript", "<head><noscript><p>t</noscript>x",
     E("p", None, "tx"), head_kids=(E("noscript"),))
case("svg script stays foreign", "<svg><script>alert(1)</script></svg>x",
     E("svg svg", None, E("svg script", None, "alert(1)")), "x")
case("svg title integration point", "<svg><title>t</title></svg>x",
     E("svg svg", None, E("svg title", None, "t")), "x")
case("html inside mtext integration", "<math><mtext><p>h</p></mtext></math>",
     E("math math", None, E("math mtext", None, E("p", None, "h"))))
case("noframes and comment after frameset",
     "<frameset></frameset><noframes>n</noframes><!--c-->",
     raw_tree=("| <html>\n|   <head>\n|   <frameset>\n|   <noframes>\n"
               "|     \"n\"\n|   <!-- c -->"))
case("text after frameset html end ignored",
     "<html><frameset></frameset></html>x",
     raw_tree="| <html>\n|   <head>\n|   <frameset>")

# ----------- F33: caption/colgroup end-tag + nested-table edge cases
case("table end closes caption", "<table><caption>a</table>b",
     E("table", None, E("caption", None, "a")), "b")
case("explicit colgroup end", "<table><colgroup><col></colgroup><tr><td>x",
     E("table", None, E("colgroup", None, E("col")),
       E("tbody", None, E("tr", None, E("td", None, "x")))))
case("text pops colgroup and fosters", "<table><colgroup>text<col><tr><td>x",
     "text", E("table", None, E("colgroup"),
               E("colgroup", None, E("col")),
               E("tbody", None, E("tr", None, E("td", None, "x")))))
case("th end ignored in td", "<table><tr><td>a</th>b",
     E("table", None, E("tbody", None,
       E("tr", None, E("td", None, "ab")))))
case("caption end pops open div", "<table><caption><div>d</caption><tr><td>x",
     E("table", None, E("caption", None, E("div", None, "d")),
       E("tbody", None, E("tr", None, E("td", None, "x")))))
case("table start closes table", "<table><tr><table><tr><td>i",
     E("table", None, E("tbody", None, E("tr"))),
     E("table", None, E("tbody", None, E("tr", None, E("td", None, "i")))))
case("fostered div keeps table flow", "<div><table><div>f<td>c",
     E("div", None, E("div", None, "f"),
       E("table", None, E("tbody", None,
         E("tr", None, E("td", None, "c"))))))

# -------- F28: nobr reconstruct-before-scope-check (spec 13.2.6.4.7)
case("nobr across p reconstructs then AA", "<p><nobr>x</p><nobr>y",
     E("p", None, E("nobr", None, "x")), E("nobr"), E("nobr", None, "y"))


def frag_case(desc, data, context, *kids):
    """#document-fragment case: kids render at top level."""
    out = []
    for k in kids:
        render(k, 0, out)
    CASES.append((desc, data, "\n".join(out), context))


# ------------------------------------------- F16: fragment parsing
frag_case("fragment td content", "<span>a</span>x", "td",
          E("span", None, "a"), "x")
frag_case("fragment tr cells", "<td>x<td>y", "tr",
          E("td", None, "x"), E("td", None, "y"))
frag_case("fragment tbody rows", "<tr><td>a<tr><td>b", "tbody",
          E("tr", None, E("td", None, "a")),
          E("tr", None, E("td", None, "b")))
frag_case("fragment table", "<tr><td>c", "table",
          E("tbody", None, E("tr", None, E("td", None, "c"))))
frag_case("fragment ul li", "<li>a<li>b", "ul",
          E("li", None, "a"), E("li", None, "b"))
frag_case("fragment title rcdata", "a<b>c</b>", "title", "a<b>c</b>")
frag_case("fragment textarea rcdata", "<p>&amp;", "textarea", "<p>&")
frag_case("fragment style rawtext", "x&amp;y", "style", "x&amp;y")
frag_case("fragment script", "a<b>-<!--x", "script", "a<b>-<!--x")
frag_case("fragment plaintext", "a</plaintext>b", "plaintext",
          "a</plaintext>b")
frag_case("fragment div", "<p>one<p>two", "div",
          E("p", None, "one"), E("p", None, "two"))
frag_case("fragment select", "<option>a<optgroup>b", "select",
          E("option", None, "a"), E("optgroup", None, "b"))
frag_case("fragment template", "<td>x", "template",
          E("td", None, "x"))
frag_case("fragment html", "<p>x", "html",
          E("head"), E("body", None, E("p", None, "x")))
frag_case("fragment td stray table", "<table><td>x", "td",
          E("table", None,
            E("tbody", None, E("tr", None, E("td", None, "x")))))
frag_case("fragment svg context", "a<circle r='1'>b</circle>", "svg svg",
          "a", E("svg circle", {"r": "1"}, "b"))
frag_case("fragment svg breakout", "<svg-x><p>y", "svg path",
          E("svg svg-x"), E("p", None, "y"))
frag_case("fragment math context", "<mi>x</mi>", "math math",
          E("math mi", None, "x"))
frag_case("fragment form pointer", "<form>x", "form", "x")
frag_case("fragment frameset context", "<frame>", "frameset", E("frame"))
# fragment case: </frameset> must NOT leave in_frameset mode
frag_case("fragment frameset close then frame",
          "<frameset></frameset><frame>", "frameset",
          E("frameset"), E("frame"))
frag_case("fragment svg unmatched end tag", "<g><bogus></nomatch>x",
          "svg svg", E("svg g", None, E("svg bogus", None, "x")))
frag_case("fragment caption", "<p>x", "caption", E("p", None, "x"))
frag_case("fragment colgroup", "<col span='2'>", "colgroup",
          E("col", {"span": "2"}))


def main():
    parts = []
    for entry in CASES:
        if len(entry) == 4:
            desc, data, tree, context = entry
            parts.append(f"#data\n{data}\n#errors\n#document-fragment\n"
                         f"{context}\n#document\n{tree}\n")
            continue
        desc, data, tree = entry
        parts.append(f"#data\n{data}\n#errors\n#document\n{tree}\n")
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "corpus",
                       "tree", "zhtml_ray2.dat")
    with open(out, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {len(CASES)} cases to {out}")


if __name__ == "__main__":
    main()
