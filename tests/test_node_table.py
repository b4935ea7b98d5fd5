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
