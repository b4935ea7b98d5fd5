"""Tree-construction conformance tests, html5lib-tests serialization
format (SURVEY.md §5.2 — the part the reference declared but never built,
/root/reference/src/parser.zig:130-133)."""

import pytest

from zhtml_ray.html.dom import QUIRKS_LIMITED, QUIRKS_NO, QUIRKS_YES
from zhtml_ray.html.treebuilder import parse
from zhtml_ray.html.dom import serialize


def tree(src):
    return serialize(parse(src).document)


CASES = [
    ("full document",
     "<!DOCTYPE html><html><head><title>T</title></head><body><p>hi</p></body></html>",
     '| <!DOCTYPE html>\n| <html>\n|   <head>\n|     <title>\n|       "T"\n'
     '|   <body>\n|     <p>\n|       "hi"'),
    ("implied structure", "<p>x",
     '| <html>\n|   <head>\n|   <body>\n|     <p>\n|       "x"'),
    ("unclosed p siblings", "<p>one<p>two",
     '| <html>\n|   <head>\n|   <body>\n|     <p>\n|       "one"\n|     <p>\n|       "two"'),
    ("adoption agency", "<b><i>x</b>y</i>",
     '| <html>\n|   <head>\n|   <body>\n|     <b>\n|       <i>\n|         "x"\n'
     '|     <i>\n|       "y"'),
    ("adoption agency block", "<p>1<b>2<div>3</b>4</div>",
     '| <html>\n|   <head>\n|   <body>\n|     <p>\n|       "1"\n|       <b>\n'
     '|         "2"\n|     <div>\n|       <b>\n|         "3"\n|       "4"'),
    ("foster parenting", "<table>x<tr><td>c</td></tr></table>",
     '| <html>\n|   <head>\n|   <body>\n|     "x"\n|     <table>\n|       <tbody>\n'
     '|         <tr>\n|           <td>\n|             "c"'),
    ("implied tbody", "<table><tr><td>c</table>",
     '| <html>\n|   <head>\n|   <body>\n|     <table>\n|       <tbody>\n'
     '|         <tr>\n|           <td>\n|             "c"'),
    ("li closes li", "<ul><li>a<li>b</ul>",
     '| <html>\n|   <head>\n|   <body>\n|     <ul>\n|       <li>\n|         "a"\n'
     '|       <li>\n|         "b"'),
    ("dd dt", "<dl><dt>t<dd>d</dl>",
     '| <html>\n|   <head>\n|   <body>\n|     <dl>\n|       <dt>\n|         "t"\n'
     '|       <dd>\n|         "d"'),
    ("heading pops heading", "<h1>a<h2>b",
     '| <html>\n|   <head>\n|   <body>\n|     <h1>\n|       "a"\n|     <h2>\n|       "b"'),
    ("svg foreign", "<svg><circle r=1 /></svg>x",
     '| <html>\n|   <head>\n|   <body>\n|     <svg svg>\n|       <svg circle>\n'
     '|         r="1"\n|     "x"'),
    ("svg case fix", "<svg><foreignobject><p>h</p></foreignobject></svg>",
     '| <html>\n|   <head>\n|   <body>\n|     <svg svg>\n|       <svg foreignObject>\n'
     '|         <p>\n|           "h"'),
    ("math integration point", "<math><mi>x</mi></math>",
     '| <html>\n|   <head>\n|   <body>\n|     <math math>\n|       <math mi>\n'
     '|         "x"'),
    ("foreign breakout", "<svg><p>html</p></svg>",
     '| <html>\n|   <head>\n|   <body>\n|     <svg svg>\n|     <p>\n|       "html"'),
    ("template in head", "<template><td>t</td></template>",
     '| <html>\n|   <head>\n|     <template>\n|       content\n'
     '|         <td>\n|           "t"\n|   <body>'),
    ("select options", "<select><option>a<option>b</select>",
     '| <html>\n|   <head>\n|   <body>\n|     <select>\n|       <option>\n'
     '|         "a"\n|       <option>\n|         "b"'),
    ("pre newline stripped", "<pre>\nkeep</pre>",
     '| <html>\n|   <head>\n|   <body>\n|     <pre>\n|       "keep"'),
    ("textarea rcdata", "<textarea><b>x</b></textarea>",
     '| <html>\n|   <head>\n|   <body>\n|     <textarea>\n|       "<b>x</b>"'),
    ("script rawtext", "<script>if (a<b) {}</script>",
     '| <html>\n|   <head>\n|     <script>\n|       "if (a<b) {}"\n|   <body>'),
    ("comment placement", "<!--a--><html><!--b--><body>x</body><!--c-->",
     '| <!-- a -->\n| <html>\n|   <!-- b -->\n|   <head>\n|   <body>\n'
     '|     "x"\n|   <!-- c -->'),
    ("nobr reopen", "<nobr>a<nobr>b",
     '| <html>\n|   <head>\n|   <body>\n|     <nobr>\n|       "a"\n|     <nobr>\n'
     '|       "b"'),
    ("button closes button", "<button>a<button>b",
     '| <html>\n|   <head>\n|   <body>\n|     <button>\n|       "a"\n'
     '|     <button>\n|       "b"'),
    ("a reopen via afe", "<a href=x>1<p>2</a>3",
     '| <html>\n|   <head>\n|   <body>\n|     <a>\n|       href="x"\n|       "1"\n'
     '|     <p>\n|       <a>\n|         href="x"\n|         "2"\n|       "3"'),
    ("frameset", "<frameset><frame src=a></frameset>",
     '| <html>\n|   <head>\n|   <frameset>\n|     <frame>\n|       src="a"'),
    ("plaintext", "<plaintext>a<b>c",
     '| <html>\n|   <head>\n|   <body>\n|     <plaintext>\n|       "a<b>c"'),
]


@pytest.mark.parametrize("desc,src,want", CASES, ids=[c[0] for c in CASES])
def test_tree(desc, src, want):
    got = tree(src)
    assert got == want, f"{desc}:\n--- got ---\n{got}\n--- want ---\n{want}"


@pytest.mark.parametrize("src,quirks", [
    ("<!DOCTYPE html><p>x", QUIRKS_NO),
    ("<p>x", QUIRKS_YES),  # missing doctype
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN"><p>x',
     QUIRKS_YES),  # no system id → full quirks
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN" '
     '"http://www.w3.org/TR/html4/loose.dtd"><p>x', QUIRKS_LIMITED),
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN"><p>x',
     QUIRKS_LIMITED),
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 3.2 Final//EN"><p>x', QUIRKS_YES),
    ('<!DOCTYPE html SYSTEM '
     '"http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd"><p>x',
     QUIRKS_YES),
    ("<!doctype HTML><p>x", QUIRKS_NO),
    # HTML 4.01 STRICT is standards mode — only the Frameset /
    # Transitional variants appear in the spec lists (and those only
    # conditionally on system-id presence)
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN">', QUIRKS_NO),
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN" '
     '"http://www.w3.org/TR/html4/strict.dtd">', QUIRKS_NO),
    ('<!DOCTYPE html PUBLIC "-//w3c//dtd html 4.01//en">', QUIRKS_NO),
    # prefix matching is ASCII case-insensitive
    ('<!DOCTYPE html PUBLIC "-//w3c//dtd xhtml 1.0 transitional//en">',
     QUIRKS_LIMITED),
    ('<!DOCTYPE html SYSTEM "ABOUT:LEGACY-COMPAT">', QUIRKS_NO),
    # 4.0 (not 4.01) Frameset/Transitional are UNconditional quirks
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.0 Transitional//EN" "x">',
     QUIRKS_YES),
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Frameset//EN">',
     QUIRKS_YES),
    ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Frameset//EN" "x">',
     QUIRKS_LIMITED),
    # exact-match entries and the doctype-after-html ignore rule
    ('<!DOCTYPE html PUBLIC "-//W3O//DTD W3 HTML Strict 3.0//EN//">',
     QUIRKS_YES),
    ('<!DOCTYPE html PUBLIC "-/W3C/DTD HTML 4.0 Transitional/EN">',
     QUIRKS_YES),
    ('<!DOCTYPE html PUBLIC "HTML">', QUIRKS_YES),
    ('<!DOCTYPE html PUBLIC "" "">', QUIRKS_NO),
    ('<!DOCTYPE html PUBLIC "+//Silmaril//dtd html Pro v0r11 19970101//">',
     QUIRKS_YES),
    ("<!DOCTYPE foo>", QUIRKS_YES),
    ("<html><!DOCTYPE html>", QUIRKS_YES),
])
def test_quirks(src, quirks):
    assert parse(src).document.quirks == quirks


def test_table_in_quirks_does_not_close_p():
    # quirks mode: <table> does NOT close an open <p>
    doc = parse("<p>a<table><tr><td>c</table>").document  # quirks (no doctype)
    body = doc.children[0].children[1]
    p = body.children[0]
    assert p.name == "p"
    assert any(ch.name == "table" for ch in p.children if ch.kind == 2)
    # standards mode: it does
    doc2 = parse("<!DOCTYPE html><p>a<table><tr><td>c</table>").document
    body2 = doc2.children[1].children[1]
    assert [c.name for c in body2.children if c.kind == 2] == ["p", "table"]


def test_eof_inside_table():
    doc = parse("<table><tr><td>x").document
    assert "x" in serialize(doc)


def test_deep_nesting_no_recursion_error():
    src = "<div>" * 2000 + "x"
    doc = parse(src).document
    assert doc is not None


def test_error_positions_sorted():
    r = parse("<p>a\x00b<3")
    offs = [o for _, o in r.errors]
    assert offs == sorted(offs)


class TestPreNewlineSkip:
    """The <pre>/<listing>/<textarea> leading-newline skip applies only
    to the token IMMEDIATELY after the start tag (ADVICE r1: the flag
    must not survive an intervening non-Character token)."""

    def test_newline_directly_after_pre_dropped(self):
        assert tree("<body><pre>\nX</pre>") == (
            '| <html>\n|   <head>\n|   <body>\n|     <pre>\n|       "X"')

    def test_newline_after_close_kept(self):
        assert tree("<body><pre></pre>\nX") == (
            '| <html>\n|   <head>\n|   <body>\n|     <pre>\n|     "\nX"')

    def test_newline_after_comment_kept(self):
        assert tree("<body><pre><!--c-->\nX</pre>") == (
            '| <html>\n|   <head>\n|   <body>\n|     <pre>\n'
            '|       <!-- c -->\n|       "\nX"')

    def test_textarea_newline_dropped(self):
        assert tree("<body><textarea>\nX</textarea>") == (
            '| <html>\n|   <head>\n|   <body>\n|     <textarea>\n|       "X"')


def test_empty_public_id_is_unknown_doctype():
    """An EMPTY public id is a present public id → unknown-doctype."""
    from zhtml_ray.html.treebuilder import parse
    errs = [c for c, _ in parse('<!DOCTYPE html PUBLIC "">x').errors]
    assert "unknown-doctype" in errs
    assert "unknown-doctype" not in [
        c for c, _ in parse('<!DOCTYPE html>x').errors]


class TestGeneratedWellFormedTrees:
    """Independent tree oracle for the well-formed subset: a random
    generator builds a document AND its expected serialized DOM from
    the same structure, so the expectation shares no code with the
    treebuilder. Constrained to constructs with no implied-end /
    adoption / foster behavior: strictly nestable containers, <a> and
    headings never self-nested, void elements, raw-text elements with
    plain bodies, comments, ';'-terminated entities."""

    NESTABLE = ["div", "span", "section", "article", "em", "strong",
                "b", "i", "code"]
    TEXTS = [("plain", "plain"), ("a &amp; b", "a & b"),
             ("x &lt;y&gt;", "x <y>"), ("&#65;&#x42;", "AB"),
             ("café", "café"), ("5 > 4", "5 > 4"),
             ("  sp  ", "  sp  ")]

    def _gen(self, rng, depth, in_a, in_h):
        """Returns (html, [expected child lines at relative depth 0])."""
        html, lines = [], []

        def text(src, val):
            html.append(src)
            if lines and lines[-1][0] == 0 and lines[-1][1].startswith('"'):
                prev = lines.pop()
                lines.append((0, '"' + prev[1][1:-1] + val + '"'))
            else:
                lines.append((0, f'"{val}"'))

        for _ in range(rng.randint(1, 4)):
            r = rng.random()
            if r < 0.40 and depth < 4:
                pool = list(self.NESTABLE)
                if not in_a:
                    pool.append("a")
                if not in_h:
                    pool.append("h2")
                t = rng.choice(pool)
                attr_html, attr_lines = "", []
                if rng.random() < 0.4:
                    k, v = rng.choice([("class", "c1"), ("id", "i2"),
                                       ("href", "/x?a=1"), ("alt", "")])
                    attr_html = f' {k}="{v}"'
                    attr_lines = [(1, f'{k}="{v}"')]
                sub_html, sub_lines = self._gen(
                    rng, depth + 1, in_a or t == "a", in_h or t == "h2")
                html.append(f"<{t}{attr_html}>{sub_html}</{t}>")
                lines.append((0, f"<{t}>"))
                lines.extend(attr_lines)
                lines.extend((d + 1, s) for d, s in sub_lines)
            elif r < 0.50:
                n = rng.randint(0, 99)
                html.append(f"<!--n{n}-->")
                lines.append((0, f"<!-- n{n} -->"))
            elif r < 0.58:
                body = f"var v={rng.randint(0, 9)}; if (v<3) f();"
                html.append(f"<script>{body}</script>")
                lines.append((0, "<script>"))
                lines.append((1, f'"{body}"'))
            elif r < 0.64:
                html.append("<style>.c { color: red; }</style>")
                lines.append((0, "<style>"))
                lines.append((1, '".c { color: red; }"'))
            elif r < 0.72:
                html.append('<br><img src="i.png">')
                lines.append((0, "<br>"))
                lines.append((0, "<img>"))
                lines.append((1, 'src="i.png"'))
            else:
                text(*rng.choice(self.TEXTS))
        return "".join(html), lines

    def test_random_well_formed_trees(self):
        import random
        from zhtml_ray.html.dom import serialize
        from zhtml_ray.html.treebuilder import parse

        rng = random.Random(77)
        for _ in range(150):
            body_html, body_lines = self._gen(rng, 0, False, False)
            doc = ("<!DOCTYPE html><html><head></head><body>"
                   f"{body_html}</body></html>")
            expected = ["| <!DOCTYPE html>", "| <html>", "|   <head>",
                        "|   <body>"]
            expected += [f"|   {'  ' * (d + 1)}{s}" for d, s in body_lines]
            got = serialize(parse(doc).document)
            assert got == "\n".join(expected), doc
