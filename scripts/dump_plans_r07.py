#!/usr/bin/env python
"""Dump .explain('formatted') for the r07-optimization target queries.

Usage: python scripts/dump_plans_r07.py <before|after> [query ...]

Writes plans/r07/<query>_<tag>.txt. Uses sf0.1 (plan SHAPE is scale-
independent; the driver's bench runs sf1.0 but the physical plan is the
same modulo AQE runtime stats, which executed plans would add anyway).
Only queries whose DataFrame construction is action-free are dumpable
(iterative operators like connected components run jobs at build time).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "kg_spans",
    "kg_triples",
    "kg_triple_stats",
    "eval_span_counts",
    "agg_pricing_summary",
    "join_full_outer_orders",
    "window_sessionize",
    "topk_terms_per_lang",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_lsh_candidates",
    "dedup_simhash",
    "sim_cosine_topk",
    "entity_canon_candidates",
    "text_quality",
    "text_language_id",
    "text_quality_scores",
    "text_token_stats",
    "text_fingerprint",
    "dedup_jaccard_verified",
    "dedup_ngram_shingles",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    from dere_spark.queries import QUERIES
    from dere_spark.session import get_spark

    spark = get_spark("dump_plans_r07")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
