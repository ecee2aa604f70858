"""Randomized parity of the O1/F6 path kernel against networkx — the
library the reference itself calls (slot_classifier.py:639-704 uses
nx.shortest_path / NetworkXNoPath on an undirected arc graph).

networkx IS present in this sandbox (the one reference dependency that
is), so path-length parity is checked directly instead of through
recorded vectors: on seeded random labeled graphs, `shortest_dep_paths`
must agree with nx on every query's distance (-1 == NetworkXNoPath), and
on the label sequence whenever the shortest path is unique (when ties
exist, nx's own answer depends on adjacency insertion order, which the
reference never pins either — the engine's deterministic neighbor order
is documented in operators/deppath.py).
"""

from __future__ import annotations

import random

import networkx as nx
import pytest


def _random_graph(rng: random.Random, n_nodes: int, n_edges: int):
    """Connected-ish random labeled multigraph-free undirected graph."""
    edges = set()
    while len(edges) < n_edges:
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a == b:
            continue
        edges.add((min(a, b), max(a, b)))
    labels = {e: rng.choice(["nsubj", "dobj", "amod", "prep", "conj"]) for e in edges}
    return [(a, b, labels[(a, b)]) for (a, b) in sorted(edges)]


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_bfs_kernel_matches_networkx(spark, seed):
    from dere_spark.operators.deppath import shortest_dep_paths

    rng = random.Random(seed)
    groups = {}
    for g in range(4):
        n = rng.randrange(6, 18)
        groups[f"g{g}"] = (n, _random_graph(rng, n, rng.randrange(4, n + 6)))

    edge_rows, query_rows, expected = [], [], {}
    for gid, (n, edges) in groups.items():
        G = nx.Graph()
        G.add_nodes_from(range(n))
        for a, b, lab in edges:
            edge_rows.append((gid, a, b, lab))
            G.add_edge(a, b, label=lab)
        for _ in range(12):
            s, t = rng.randrange(n), rng.randrange(n)
            query_rows.append((gid, s, t))
            try:
                paths = list(nx.all_shortest_paths(G, s, t))
                plen = len(paths[0]) - 1
                uniq_labels = None
                if len(paths) == 1:
                    p = paths[0]
                    uniq_labels = "/".join(
                        G.edges[p[i], p[i + 1]]["label"] for i in range(len(p) - 1)
                    )
                expected[(gid, s, t)] = (plen, uniq_labels)
            except nx.NetworkXNoPath:
                expected[(gid, s, t)] = (-1, "")

    edges_df = spark.createDataFrame(
        edge_rows, "group_id string, src int, dst int, label string"
    )
    pairs_df = spark.createDataFrame(
        list(set(query_rows)), "group_id string, from_idx int, to_idx int"
    )
    got = {
        (r["group_id"], r["from_idx"], r["to_idx"]): (r["path_len"], r["path_labels"])
        for r in shortest_dep_paths(edges_df, pairs_df).collect()
    }

    assert set(got) == set(expected)
    for key, (plen, uniq_labels) in expected.items():
        assert got[key][0] == plen, f"{key}: len {got[key][0]} != nx {plen}"
        if plen > 0:
            assert got[key][1].count("/") == plen - 1  # label count matches hops
        if uniq_labels is not None:
            assert got[key][1] == uniq_labels, f"{key}: unique-path labels differ"
        if plen == -1:
            assert got[key][1] == ""
