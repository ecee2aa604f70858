"""Outlink extraction and host-graph edges (operators/weblinks.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from dere_spark.operators.weblinks import extract_links, host_edges

PAGE = (
    b"<html><body>"
    b'<a href="https://other.example/x">Abs <b>link</b></a>'
    b'<a href="//cdn.example/lib.html">proto-rel</a>'
    b'<a href="/root.html">root</a>'
    b'<a href="sibling.html">rel</a>'
    b'<a href="#frag">frag only</a>'
    b'<a href="javascript:void(0)">js</a>'
    b'<a href="mailto:x@example.com">mail</a>'
    b'<a href="/dup.html">d1</a>'
    b'<a href="/dup.html">d2</a>'
    b"</body></html>"
)


def _pages(spark):
    return spark.createDataFrame(
        [("https://src.example:8443/a/b/page.html", PAGE)], "url string, html binary"
    )


def test_extract_links_resolution(spark):
    links = extract_links(_pages(spark)).collect()
    got = {(r["dst_url"], r["anchor"]) for r in links}
    assert ("https://other.example/x", "Abs link") in got  # nested tag stripped
    assert ("https://cdn.example/lib.html", "proto-rel") in got
    assert ("https://src.example:8443/root.html", "root") in got
    # path-relative resolves against the source DIRECTORY
    assert ("https://src.example:8443/a/b/sibling.html", "rel") in got
    # fragment-only / js / mailto dropped
    assert all("frag" not in a and a not in ("js", "mail") for _, a in got)
    # duplicate edges kept (multiplicity is signal)
    assert len([r for r in links if r["dst_url"].endswith("/dup.html")]) == 2
    assert len(links) == 6


def test_extract_links_no_shuffle(spark):
    plan = (
        extract_links(_pages(spark))._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # extraction is map-side only


def test_host_edges(spark):
    edges = host_edges(extract_links(_pages(spark)))
    got = {(r["src_host"], r["dst_host"]) for r in edges.collect()}
    # self-host edges dropped, duplicates collapsed
    assert got == {
        ("src.example", "other.example"),
        ("src.example", "cdn.example"),
    }


def test_host_edges_feed_connected_components(spark):
    """The host graph slots into the engine's existing graph family."""
    from dere_spark.operators.graph import connected_components

    edges = host_edges(extract_links(_pages(spark))).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    comps = connected_components(edges)
    rows = comps.collect()
    # one component: all three hosts reachable
    assert len({r["component"] for r in rows}) == 1
    assert len(rows) == 3


def test_resolve_query_only_reference_keeps_full_path(spark):
    """RFC 3986 §5.3: a query-only reference keeps the source's full
    path — pagination links from different pages in one directory must
    not alias onto the directory node."""
    pages = spark.createDataFrame(
        [("https://e.com/a/b/page.html", b'<a href="?page=2">next</a>')],
        "url string, html binary",
    )
    rows = extract_links(pages).collect()
    assert rows[0]["dst_url"] == "https://e.com/a/b/page.html?page=2"


def test_extract_and_host_edges_survive_malformed_urls(spark):
    """try_parse_url everywhere: a malformed src url or an href resolving
    to an illegal dst (spaces etc.) must drop the row, not abort the job
    under Spark 4 default ANSI mode."""
    pages = spark.createDataFrame(
        [
            ("http://ex ample.com/a", b'<a href="/x">bad src</a>'),
            ("https://ok.com/a", b'<a href="my page.html">spacey</a>'),
            ("https://ok.com/a", b'<a href="https://fine.com/b">good</a>'),
        ],
        "url string, html binary",
    )
    links = extract_links(pages)
    edges = host_edges(links).collect()  # must not raise
    got = {(r["src_host"], r["dst_host"]) for r in edges}
    assert ("ok.com", "fine.com") in got
    # the spacey dst yields a NULL host and is dropped, not fatal
    assert all(h is not None for pair in got for h in pair)
