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
  invariant every other operator holds.  Every rounding site is
  fixed-scale and per-row, identical on every executor.
* Ranks sum to ~1 with per-node error ~1e-18 per iteration (the
  per-edge division rounds at scale 20; the damping multiply lands at
  scale 18 and the final add at scale 19 under Spark's decimal
  precision adjustment before the cast back to scale 20) — negligible
  at any corpus size that fits a DECIMAL count, and every rounding
  site is fixed-scale and per-row, so determinism is unaffected.
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
    formulation.  Edges with a NULL endpoint are dropped up front: a
    NULL node cannot receive mass through an equi-join, so keeping such
    edges would silently leak rank every iteration."""
    from decimal import Decimal, localcontext

    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        # checkpoint: the contrib join re-reads e EVERY iteration — without
        # this the distinct shuffle and the whole upstream lineage (e.g. a
        # raw-HTML outlink extraction) would re-execute once per iteration
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(None).cast(_DEC))
    # ONE damping value for both halves of the update: quantized to the
    # executor literal's scale so the driver-side scalar term and the
    # distributed link term can never disagree on d
    d = Decimal(str(damping)).quantize(Decimal("1E-8"))
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
    # RESULT type keeps (near-)full scale (wider operands would trigger
    # Spark's precision-adjustment and collapse the scale to 6):
    #   (38,20) / (18,0) -> (38,20)   per-edge division, rounds at 1e-20
    #   (9,8) * (38,20)  -> (38,18)   damping multiply, rounds at 1e-18
    #   + literal        -> (38,19) -> cast (38,20)
    #   sum((38,20))     -> exact, order-free
    d_col = F.lit(str(d)).cast("decimal(9,8)")

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
        # is exact driver-side Decimal math (local context: must not
        # mutate the caller thread's global decimal precision), shipped
        # as one literal
        with localcontext() as ctx:
            ctx.prec = 50
            shared = (
                (Decimal(1) - d) / Decimal(n) + d * Decimal(dangling) / Decimal(n)
            )
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
