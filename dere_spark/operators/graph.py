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
            break
    return labels
