"""F6/O1 — shortest dependency paths, parser-agnostic.

The reference extracts shortest-dependency-path features between the
anchor and filler tokens with spacy (slot_classifier.py:385-410, path
features :639-704). spacy cannot run in this sandbox, so the engine
formalizes the parse as DATA and implements the graph operator:

  * the parse is an EDGE TABLE ``(group_id, src, dst, label)`` — one row
    per dependency arc, whatever produced it (spacy over mapInPandas in
    production, hand-built fixtures in tests, any synthetic tree for the
    oracle). This is the F6 seam made concrete: the parser is a source,
    the path computation is the operator.
  * ``shortest_dep_paths`` answers (from_idx -> to_idx) queries per group
    with an undirected BFS inside a per-group Arrow kernel
    (groupBy().applyInPandas) — sentences are tiny graphs (tens of
    nodes), so per-sentence BFS is the right physical strategy: no
    iterative global joins, no driver involvement, embarrassingly
    parallel across sentences. The frontier-join formulation only wins
    when single graphs exceed a task (they never do for sentences).

Determinism: BFS visits neighbors in sorted order; unreachable pairs get
path_len = -1. Output: (group_id, from_idx, to_idx, path_len, path_labels).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def shortest_dep_paths(edges: DataFrame, pairs: DataFrame) -> DataFrame:
    """BFS shortest paths per group.

    edges: (group_id, src:int, dst:int, label:string) — undirected arcs.
    pairs: (group_id, from_idx:int, to_idx:int) — path queries.
    Returns (group_id, from_idx, to_idx, path_len:int, path_labels:string)
    with path_len = -1 when no path exists (labels empty then).
    """
    import pandas as pd

    gtype = edges.schema["group_id"].dataType.simpleString()
    e = edges.select(
        "group_id",
        F.col("src").cast("int").alias("src"),
        F.col("dst").cast("int").alias("dst"),
        F.col("label").cast("string").alias("label"),
        F.lit("e").alias("_side"),
        F.lit(None).cast("int").alias("from_idx"),
        F.lit(None).cast("int").alias("to_idx"),
    )
    p = pairs.select(
        "group_id",
        F.lit(None).cast("int").alias("src"),
        F.lit(None).cast("int").alias("dst"),
        F.lit(None).cast("string").alias("label"),
        F.lit("p").alias("_side"),
        F.col("from_idx").cast("int").alias("from_idx"),
        F.col("to_idx").cast("int").alias("to_idx"),
    )
    both = e.unionByName(p)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf["group_id"].iloc[0]
        adj: dict = {}
        for src, dst, label in zip(pdf["src"], pdf["dst"], pdf["label"]):
            if pd.isna(src):
                continue
            s, d = int(src), int(dst)
            adj.setdefault(s, []).append((d, str(label)))
            adj.setdefault(d, []).append((s, str(label)))
        for k in adj:
            adj[k].sort()
        out = []
        queries = pdf[pdf["_side"] == "p"]
        for f_idx, t_idx in zip(queries["from_idx"], queries["to_idx"]):
            start, goal = int(f_idx), int(t_idx)
            if start == goal:
                out.append((gid, start, goal, 0, ""))
                continue
            # BFS with parent tracking, deterministic neighbor order
            prev = {start: None}
            frontier = [start]
            found = False
            while frontier and not found:
                nxt = []
                for node in frontier:
                    for nb, label in adj.get(node, ()):
                        if nb in prev:
                            continue
                        prev[nb] = (node, label)
                        if nb == goal:
                            found = True
                            break
                        nxt.append(nb)
                    if found:
                        break
                frontier = nxt
            if not found:
                out.append((gid, start, goal, -1, ""))
                continue
            labels = []
            node = goal
            while prev[node] is not None:
                parent, label = prev[node]
                labels.append(label)
                node = parent
            out.append((gid, start, goal, len(labels), "/".join(reversed(labels))))
        return pd.DataFrame(
            out,
            columns=["group_id", "from_idx", "to_idx", "path_len", "path_labels"],
        )

    return both.groupBy("group_id").applyInPandas(
        kernel,
        f"group_id {gtype}, from_idx int, to_idx int, path_len int, "
        "path_labels string",
    )


def span_shortest_paths(edges: DataFrame, span_pairs: DataFrame) -> DataFrame:
    """Span-level shortest dependency paths (reference
    slot_classifier.py:639-704): spans are SETS of token nodes, the
    span-pair distance is the MIN over all token pairs, ties broken by
    the first pair in iteration order (token1 outer, token2 inner, both
    in document order — nx `shortest_path` is replaced only on strictly
    shorter paths).

    DELIBERATE DEVIATION from the reference's `edge_distance` (documented
    per ADVICE r3): the reference is internally inconsistent when a span
    pair is PARTIALLY disconnected — `get_shortest_path` skips
    disconnected token pairs and returns the min over connected ones,
    while `edge_distance` lets the NetworkXNoPath raised inside its min()
    abort the whole aggregation and returns -1 if ANY token pair
    disconnects. Both path_len and path_labels here follow the
    `get_shortest_path` behavior (min over CONNECTED pairs; -1/'' only
    when every pair disconnects) so the two outputs stay mutually
    consistent. Pinned by
    tests/test_operators.py::test_span_paths_partially_disconnected.

    span_pairs: (group_id, pair_id, from_idxs:array<int>, to_idxs:array<int>).
    Returns (group_id, pair_id, path_len, path_labels) with -1/'' when no
    token pair connects — a relational composition over the per-token BFS
    kernel: explode both sides, answer distinct token queries once, then
    min-pick per pair with a window."""
    from pyspark.sql import Window

    # explode_outer, not explode: a pair whose either token set is empty
    # (or null) must still come back with the documented -1/'' sentinel —
    # plain explode would emit zero rows and the pair would silently
    # vanish from the result
    exploded = span_pairs.select(
        "group_id",
        "pair_id",
        F.explode_outer("from_idxs").alias("from_idx"),
        F.col("to_idxs"),
    ).select(
        "group_id", "pair_id", "from_idx", F.explode_outer("to_idxs").alias("to_idx")
    )
    answers = shortest_dep_paths(
        edges,
        exploded.where(F.col("from_idx").isNotNull() & F.col("to_idx").isNotNull())
        .select("group_id", "from_idx", "to_idx")
        .distinct(),
    )
    joined = exploded.join(answers, ["group_id", "from_idx", "to_idx"], "left")
    pick = Window.partitionBy("group_id", "pair_id").orderBy(
        (F.col("path_len") < 0).cast("int").asc_nulls_last(),
        F.col("path_len").asc_nulls_last(),
        "from_idx",
        "to_idx",
    )
    return (
        joined.withColumn("_rk", F.row_number().over(pick))
        .where(F.col("_rk") == 1)
        .select(
            "group_id",
            "pair_id",
            F.coalesce("path_len", F.lit(-1)).alias("path_len"),
            F.coalesce("path_labels", F.lit("")).alias("path_labels"),
        )
    )
