#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...} plus throughput extras (docs_per_sec, triples_per_sec).

Set SPARK_GRAFT_SCALING=1 to additionally run the flagship job at
local[8] and local[32] on identical input and report throughput at both
plus scaling efficiency (the sandbox proxy for the N -> 4N executor
criterion in BASELINE.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "kg_spans",
    "kg_triples",
    "kg_triple_stats",
    "eval_span_counts",
    "agg_pricing_summary",
    "join_full_outer_orders",
    "window_sessionize",
    "topk_terms_per_lang",
    "dedup_exact",
    "text_quality",
]


def _run_suite(cpus: int) -> tuple[dict, float, dict]:
    from dere_spark.queries import QUERIES
    from dere_spark.session import get_spark

    spark = get_spark("dere_spark_bench", cpus=cpus, shuffle_partitions=max(cpus, 16))
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    # warm the JVM/codegen path once so timings measure the plan, not startup
    QUERIES["kg_tokens"](spark, SF_DIR).count()
    t_suite = time.perf_counter()
    for name in HEADLINE:
        t0 = time.perf_counter()
        counts[name] = QUERIES[name](spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(time.perf_counter() - t_suite, 3)
    spark.stop()
    return timings, total, counts


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings, total, counts = _run_suite(CPUS)

    n_docs = counts.get("text_quality", 0)  # one row per document
    n_triples = counts.get("kg_triples", 0)
    triples_sec = round(n_triples / timings["kg_triples"], 1) if timings.get("kg_triples") else 0
    docs_sec = round(n_docs / timings["kg_triples"], 1) if timings.get("kg_triples") else 0

    out = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": CPUS,
        "rows": counts,
        "docs_per_sec": docs_sec,
        "triples_per_sec": triples_sec,
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        scaling = {}
        for cpus in (8, 32):
            t0 = time.perf_counter()
            _, tot, c = _run_suite(cpus)
            wall = round(time.perf_counter() - t0, 3)
            scaling[f"local[{cpus}]"] = {
                "suite_sec": tot,
                "wall_sec": wall,
                "docs_per_sec": round(c.get("text_quality", 0) / tot, 1),
            }
        t8 = scaling["local[8]"]["suite_sec"]
        t32 = scaling["local[32]"]["suite_sec"]
        out["scaling"] = scaling
        out["scaling_efficiency"] = round((t8 / t32) / 4.0, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
