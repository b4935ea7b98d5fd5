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
