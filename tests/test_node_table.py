"""Tests for DOM-derived tables: node table, links projection, token
stats (SURVEY.md §1.3, §2.2 M14)."""

import pyarrow as pa

from zhtml_ray.stages.node_table import (
    LinksBatch, NodeTableBatch, TokenStatsBatch)


def _pages(html_list):
    return pa.table({
        "url": pa.array([f"u{i}" for i in range(len(html_list))]),
        "html": pa.array([h.encode() for h in html_list], pa.binary()),
    })


def test_links_extraction():
    t = LinksBatch()(_pages([
        '<a href="/x" rel=nofollow>click <b>me</b></a><a href="/y">two</a>',
        "<p>no links</p>",
    ]))
    assert t.num_rows == 2
    assert t["href"].to_pylist() == ["/x", "/y"]
    assert t["anchor_text"].to_pylist() == ["click me", "two"]
    assert t["rel"].to_pylist() == ["nofollow", ""]
    assert t["url"].to_pylist() == ["u0", "u0"]


def test_nested_links_anchor_text():
    t = LinksBatch()(_pages(['<a href="/o">out <span>deep</span> text</a>']))
    assert t["anchor_text"].to_pylist() == ["out deep text"]


def test_node_table_shape():
    t = NodeTableBatch()(_pages(["<!DOCTYPE html><p id=z>x</p>"]))
    nodes = t["nodes"].to_pylist()[0]
    assert nodes[0]["kind"] == 0  # document root
    tags = [n["tag"] for n in nodes if n["kind"] == 2]
    assert tags == ["html", "head", "body", "p"]
    p = [n for n in nodes if n["tag"] == "p"][0]
    assert p["attr_keys"] == ["id"] and p["attr_vals"] == ["z"]
    # parent links are consistent
    for i, n in enumerate(nodes):
        if i:
            assert 0 <= n["parent"] < i


def test_token_stats():
    t = TokenStatsBatch()(_pages(["<p>ab</p><!--c--><3"]))
    r = t.to_pylist()[0]
    assert r["n_start_tags"] == 1
    assert r["n_end_tags"] == 1
    assert r["n_comments"] == 1
    assert r["n_errors"] >= 1
    assert r["n_chars"] >= 2


def test_images_extraction():
    from zhtml_ray.stages.node_table import ImagesBatch
    t = ImagesBatch()(_pages([
        '<img src="/a.png" alt="first" title=T><p><img src=b.gif></p>',
        '<picture><img src="/c.webp" alt=""></picture><img>']))
    assert t["url"].to_pylist() == ["u0", "u0", "u1", "u1"]
    assert t["src"].to_pylist() == ["/a.png", "b.gif", "/c.webp", ""]
    assert t["alt"].to_pylist() == ["first", "", "", ""]
    assert t["title"].to_pylist() == ["T", "", "", ""]


def test_forms_extraction():
    from zhtml_ray.stages.node_table import FormsBatch
    t = FormsBatch()(_pages([
        '<form action="/s" method=POST><input name=a>'
        '<div><select></select><textarea></textarea></div></form>'
        '<form><button>go</button></form>',
        '<p>no forms</p>']))
    assert t["url"].to_pylist() == ["u0", "u0"]
    assert t["action"].to_pylist() == ["/s", ""]
    assert t["method"].to_pylist() == ["POST", ""]
    assert t["n_inputs"].to_pylist() == [3, 1]


def test_forms_nested_form_ignored():
    # spec: a <form> inside an open form is IGNORED by the tree
    # builder (form element pointer), so its fields belong to the
    # outer form and no second row is emitted
    from zhtml_ray.stages.node_table import FormsBatch
    t = FormsBatch()(_pages([
        '<form action=/outer><form action=/inner><input></form></form>']))
    assert t["action"].to_pylist() == ["/outer"]
    assert t["n_inputs"].to_pylist() == [1]


def test_page_meta_extraction():
    from zhtml_ray.stages.node_table import PageMetaBatch
    t = PageMetaBatch()(_pages([
        '<html lang="fr"><head><title> My &amp; <b>Title </title>'
        '<meta charset="utf-8"><meta name=VIEWPORT content=device-width>'
        '<meta name="description" content="a desc">'
        '<link rel="canonical" href="https://e.com/a"></head>'
        '<body><title>second ignored</title></body></html>',
        "<p>bare</p>",
    ]))
    assert t.num_rows == 2
    r = {c: t[c][0].as_py() for c in t.column_names}
    # <title> is RCDATA: "<b>" stays literal text, entity decoded,
    # whitespace normalized; only the FIRST title counts
    assert r["title"] == "My & <b>Title"
    assert r["lang"] == "fr"
    assert r["charset"] == "utf-8"
    assert r["viewport"] == "device-width"
    assert r["description"] == "a desc"
    assert r["canonical"] == "https://e.com/a"
    assert r["n_meta"] == 3
    bare = {c: t[c][1].as_py() for c in t.column_names}
    assert bare["title"] == "" and bare["n_meta"] == 0


def test_table_cells_extraction():
    from zhtml_ray.stages.node_table import TableCellsBatch
    t = TableCellsBatch()(_pages([
        "<table>stray<tr><th>H </th><td>a <b>b</b></td>"
        "<tr><td>c</td></table>",
    ]))
    rows = sorted(zip(t["table_idx"].to_pylist(), t["row_idx"].to_pylist(),
                      t["col_idx"].to_pylist(), t["header"].to_pylist(),
                      t["cell_text"].to_pylist()))
    # foster-parented "stray" text must NOT appear in any cell
    assert rows == [(0, 0, 0, True, "H"), (0, 0, 1, False, "a b"),
                    (0, 1, 0, False, "c")]


def test_table_cells_nested_tables_independent():
    from zhtml_ray.stages.node_table import TableCellsBatch
    t = TableCellsBatch()(_pages([
        "<table><tr><td>outer"
        "<table><tr><td>inner</td></tr></table>"
        " tail</td></tr></table>",
    ]))
    rows = sorted(zip(t["table_idx"].to_pylist(), t["row_idx"].to_pylist(),
                      t["col_idx"].to_pylist(), t["cell_text"].to_pylist()))
    # nearest-cell-only text: "inner" belongs to table 1, never leaks
    # into the outer cell; outer keeps its own text on both sides
    assert rows == [(0, 0, 0, "outer tail"), (1, 0, 0, "inner")]


def test_table_cells_implied_sections():
    from zhtml_ray.stages.node_table import TableCellsBatch
    t = TableCellsBatch()(_pages([
        "<table><thead><tr><th>h1<tbody><tr><td>b1<tr><td>b2"
        "<tfoot><tr><td>f1</table>",
    ]))
    rows = sorted(zip(t["row_idx"].to_pylist(), t["header"].to_pylist(),
                      t["cell_text"].to_pylist()))
    assert rows == [(0, True, "h1"), (1, False, "b1"),
                    (2, False, "b2"), (3, False, "f1")]
