"""Graph operators on plain DataFrames (no GraphFrames dependency).

`connected_components` generalizes the reference scorer's ``Equiv`` alias
closure (/root/reference/dere/evaluation/deRE_evaluation.py:92-99 — a
union-find over `Equiv T3 T4` lines) to web scale: iterative hash-min label
propagation over an edge list. Each round every node adopts the minimum
component id in its neighborhood; rounds needed = graph diameter (alias
groups and near-dup clusters are shallow, so typically 2-4).

Scale notes: each round is one shuffle (groupBy node). `localCheckpoint`
truncates lineage so plans don't grow exponentially across rounds. For
power-law graphs the classic large-star/small-star optimization can be
added, but alias/near-dup graphs are tiny-diameter, where plain hash-min
is already optimal.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """edges(src, dst) -> (node, component) with component = min node id
    (string-ordered) in the node's connected component.

    Deterministic: component ids are min() aggregates, independent of
    partitioning or row order.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iterations):
        # candidate labels: own label + neighbors' labels
        nbr = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # exhausting the round budget mid-propagation would return labels
        # that split one true component into several — fail loudly ("no
        # silent caps"): the caller raises max_iterations, never guesses
        raise ValueError(
            f"connected_components did not converge within {max_iterations} "
            f"iterations (graph diameter exceeds the round budget); raise "
            f"max_iterations"
        )
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 30,
) -> DataFrame:
    """Alternating large-star / small-star connected components — the
    power-law-safe variant (published: Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14).

    Why it exists next to ``connected_components``: hash-min label
    propagation needs O(diameter) rounds and keeps every edge live each
    round — fine for shallow alias graphs, painful for long chains or
    power-law giants. Star operations contract the graph toward stars in
    O(log²ⁿ) rounds and shrink the live edge set as they go:

      * large-star: every node points its STRICTLY LARGER neighbors at
        the minimum of its neighborhood (including itself);
      * small-star: every node points its smaller-or-equal neighbors and
        itself at that minimum.

    Both are one groupBy + one join per round over a monotonically
    smaller edge list. Converged when the edge multiset is stable
    (checked with an order-independent xxhash64 checksum — no collect of
    edges). Output matches ``connected_components`` exactly: (node,
    component = min node id of the component) in the ids' NATIVE
    ordering and type — a string cast here would make numeric ids pick
    lexicographic minima ('10' < '2') and change the output type, silently
    diverging from the hash-min variant the docstring promises to match.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _checksum(df: DataFrame) -> int:
        row = df.agg(
            F.coalesce(
                F.sum(
                    F.xxhash64(F.least("u", "v"), F.greatest("u", "v")).cast(
                        "decimal(38,0)"
                    )
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        return (int(row["h"]), int(row["n"]))

    def large_star(df: DataFrame) -> DataFrame:
        nb = df.unionByName(df.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = nb.groupBy("u").agg(F.min("v").alias("_mn")).select(
            "u", F.least("_mn", F.col("u")).alias("m")
        )
        return (
            nb.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(df: DataFrame) -> DataFrame:
        # orient every edge large -> small, then point small neighbors
        # (and the center) at the neighborhood minimum
        nb = df.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        m = nb.groupBy("u").agg(F.min("v").alias("m"))
        pointed = nb.join(m, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        centers = m.select(F.col("u"), F.col("m").alias("v"))
        return (
            pointed.unionByName(centers)
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    prev = None
    converged = False
    for _ in range(max_iterations):
        e = large_star(e).localCheckpoint(eager=True)
        e = small_star(e).localCheckpoint(eager=True)
        cur = _checksum(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise ValueError(
            f"connected_components_star did not converge within "
            f"{max_iterations} rounds; raise max_iterations"
        )

    # converged: every edge is (node -> its component root)
    nodes = edges.select(F.col(src).alias("node")).unionByName(
        edges.select(F.col(dst).alias("node"))
    ).distinct()
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return (
        nodes.join(labels, "node", "left")
        .select("node", F.coalesce("component", F.col("node")).alias("component"))
    )
