"""PageRank over an edge table — the canonical web-graph ranking signal.

Beyond-reference operator (LLM-data-pipeline family): Common-Crawl-style
corpus curation weights hosts/pages by centrality (the public CC ranks
releases are exactly this); the host graph from
``operators/weblinks.host_edges`` is the intended input.

Formulation: standard damped PageRank with uniform teleport and uniform
dangling-mass redistribution,

    r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/outdeg(u) + dangling/N)

Scale + determinism design:

* One shuffle per iteration (groupBy dst), plus one broadcast-sized
  aggregate (the dangling mass — a single scalar).  Rank and degree
  tables are ``localCheckpoint``-ed per iteration so the lineage stays
  flat over any iteration count (same pattern as the connected-
  components rounds in ``operators/graph.py``).
* ALL arithmetic is DECIMAL(38, 20).  Float sums shuffle-order-drift;
  decimal aggregation is exact and therefore ORDER-FREE, which keeps
  the operator bit-deterministic across parallelism — the repo-wide
  invariant every other operator holds.  Rounding happens only in the
  per-edge division (fixed scale, deterministic half-up), identically
  on every executor.
* Ranks sum to ~1 with error bounded by N * 1e-20 per iteration from
  the division rounding — negligible at any corpus size that fits a
  DECIMAL count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_DEC = "decimal(38,20)"


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Compute PageRank over ``edges(src, dst)``.

    Returns ``(node, rank: decimal(38,20))`` for every node appearing as
    a source or destination.  Parallel edges are collapsed (an edge is a
    link relation, not a multiplicity weight — pass pre-weighted edges
    through a custom loop if multiplicity should count).  Dangling nodes
    (no outlinks) redistribute their mass uniformly, per the standard
    formulation."""
    from decimal import Decimal, getcontext

    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    getcontext().prec = 50  # driver-side scalar math at full headroom
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(None).cast(_DEC))
    d = Decimal(str(damping))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # static per-iteration frame: every node with its outdegree (0 = dangling)
    base = (
        nodes.join(out_deg, nodes["node"] == out_deg["src"], "left")
        .select("node", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
        .localCheckpoint(eager=True)
    )

    def dec_lit(value: Decimal):
        # quantize to the working scale so the literal always fits (38,20)
        return F.lit(str(value.quantize(Decimal("1E-20")))).cast(_DEC)

    ranks = base.select(
        "node", dec_lit(Decimal(1) / Decimal(n)).alias("rank"), "out_deg"
    )
    # distributed arithmetic stays within types whose Spark decimal
    # RESULT type keeps scale 20 (wider operands would trigger Spark's
    # precision-adjustment and silently collapse the scale):
    #   (38,20) / (18,0)  -> (38,20)     per-edge division
    #   (9,8) * (38,20)   -> (38,19)→cast back to (38,20)  damping factor
    #   sum((38,20))      -> exact, order-free
    d_col = F.lit(str(d.quantize(Decimal("1E-8")))).cast("decimal(9,8)")

    for _ in range(int(iterations)):
        dangling = (
            ranks.where(F.col("out_deg") == 0)
            .agg(F.coalesce(F.sum("rank"), F.lit(0).cast(_DEC)).alias("m"))
            .first()["m"]
        )
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                "dst",
                (F.col("rank") / F.col("out_deg").cast("decimal(18,0)")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        # the scalar part — teleport share + redistributed dangling mass —
        # is exact driver-side Decimal math, shipped as one literal
        shared = (Decimal(1) - d) / Decimal(n) + d * Decimal(dangling) / Decimal(n)
        ranks = (
            base.join(contrib, base["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    dec_lit(shared)
                    + (d_col * F.coalesce("in_mass", F.lit(0).cast(_DEC))).cast(_DEC)
                ).cast(_DEC).alias("rank"),
                "out_deg",
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "rank")
