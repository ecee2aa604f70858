"""PageRank over edge tables (operators/pagerank.py): reference
power-iteration parity, dangling handling, and the repo-wide
bit-determinism invariant."""

from __future__ import annotations

import pytest

from dere_spark.operators.pagerank import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


GRAPH = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("d", "c"),  # 'd' has in-degree 0; 'e' below is dangling
    ("c", "e"),
]


def _reference_ranks(pairs, alpha=0.85, iters=200):
    """Textbook float power iteration (same formulation as nx.pagerank,
    which itself needs scipy — not in this sandbox; the float reference
    here is 12 lines and exact enough at 1e-12)."""
    out: dict = {}
    nodes = set()
    for s, t in set(pairs):
        out.setdefault(s, set()).add(t)
        nodes.update((s, t))
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r[v] for v in nodes if not out.get(v))
        nxt = {v: (1 - alpha) / n + alpha * dangling / n for v in nodes}
        for s, targets in out.items():
            share = alpha * r[s] / len(targets)
            for t in targets:
                nxt[t] += share
        r = nxt
    return r


def test_pagerank_matches_reference_power_iteration(spark):
    # identical iteration count: the only divergence left is decimal-vs-
    # float rounding, so the tolerance can be tight
    got = {r["node"]: float(r["rank"]) for r in pagerank(_edges(spark, GRAPH), iterations=20).collect()}
    want = _reference_ranks(GRAPH, alpha=0.85, iters=20)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-9), node
    # probability distribution: sums to 1 (decimal rounding residue only)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_mass_redistributed(spark):
    # two nodes, one edge: b is dangling; without redistribution the mass
    # would leak and the ranks would not sum to 1
    got = {r["node"]: float(r["rank"]) for r in pagerank(_edges(spark, [("a", "b")]), iterations=30).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["b"] > got["a"]  # b receives a's full link mass


def test_pagerank_parallel_edges_collapse(spark):
    once = pagerank(_edges(spark, [("a", "b"), ("a", "c")]), iterations=5)
    dup = pagerank(
        _edges(spark, [("a", "b"), ("a", "b"), ("a", "c")]), iterations=5
    )
    r1 = {r["node"]: r["rank"] for r in once.collect()}
    r2 = {r["node"]: r["rank"] for r in dup.collect()}
    assert r1 == r2  # an edge is a relation, not a multiplicity weight


def test_pagerank_bit_deterministic_across_parallelism(spark):
    """Decimal aggregation is exact and order-free: the ranks must be
    BIT-identical under different shuffle-partition counts, not merely
    close — the invariant every operator in this repo holds."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        a = sorted((r["node"], str(r["rank"])) for r in pagerank(_edges(spark, GRAPH)).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted((r["node"], str(r["rank"])) for r in pagerank(_edges(spark, GRAPH)).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_pagerank_validates_damping(spark):
    with pytest.raises(ValueError):
        pagerank(_edges(spark, GRAPH), damping=1.0)


def test_pagerank_host_graph_integration(spark):
    """Slots onto the outlink family: host_edges -> pagerank."""
    from dere_spark.operators.weblinks import extract_links, host_edges

    pages = spark.createDataFrame(
        [
            ("https://hub.com/", b'<a href="https://x.com/">x</a><a href="https://y.com/">y</a>'),
            ("https://x.com/", b'<a href="https://hub.com/">back</a>'),
            ("https://y.com/", b'<a href="https://hub.com/">back</a>'),
        ],
        "url string, html binary",
    )
    edges = host_edges(extract_links(pages)).withColumnsRenamed(
        {"src_host": "src", "dst_host": "dst"}
    )
    ranks = {r["node"]: float(r["rank"]) for r in pagerank(edges).collect()}
    assert ranks["hub.com"] > ranks["x.com"]  # the hub out-ranks the leaves
    assert ranks["x.com"] == ranks["y.com"]  # symmetric leaves tie exactly


def test_pagerank_null_edges_dropped_no_mass_leak(spark):
    """A NULL endpoint cannot receive mass through an equi-join; such
    edges are dropped up front so ranks still sum to 1."""
    edges = spark.createDataFrame(
        [("a", None), ("a", "b"), (None, "b")], "src string, dst string"
    )
    got = {r["node"]: float(r["rank"]) for r in pagerank(edges, iterations=10).collect()}
    assert set(got) == {"a", "b"}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_does_not_mutate_global_decimal_context(spark):
    from decimal import getcontext

    before = getcontext().prec
    pagerank(_edges(spark, [("a", "b")]), iterations=1).collect()
    assert getcontext().prec == before


def test_pagerank_noninteger_damping_consistent(spark):
    """Both halves of the update quantize damping identically: with a
    damping value needing more than 8 decimal digits the ranks must
    still sum to 1 (an inconsistent pair would leak ~5e-9/iteration)."""
    got = {
        r["node"]: float(r["rank"])
        for r in pagerank(_edges(spark, GRAPH), damping=0.123456789, iterations=20).collect()
    }
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
