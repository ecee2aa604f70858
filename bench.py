#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...} plus throughput extras (docs_per_sec, triples_per_sec).

Methodology (r2): per-query timings are WARM (second run) — steady-state
engine cost, with the shared KG stage prefix persisted once per session
(webtext.cached_stages); "value" is the sum of warm timings and
"cold_queries" records first-run walls incl. the one-time prefix
materialization. Throughput (docs/triples per sec) comes from a dedicated
UNCACHED end-to-end documents->triples run, never from cache reads.

Set SPARK_GRAFT_SCALING=1 to additionally run the flagship job at
local[8] and local[32] on identical input and report throughput at both
plus scaling efficiency (the sandbox proxy for the N -> 4N executor
criterion in BASELINE.json).
"""

from __future__ import annotations

import hashlib
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
    "dedup_minhash_signatures",
    "dedup_lsh_candidates",
    "dedup_simhash",
    "sim_cosine_topk",
    "entity_canon_candidates",
    "text_quality",
    "text_language_id",
]


def flagship_steady_state(spark, sf_dir: str, runs: int = 2) -> tuple[int, float]:
    """THE flagship throughput estimator: min-of-``runs`` wall of the FULL
    uncached documents->triples pipeline (stage caching deliberately
    bypassed), measured on an already-warm session.

    Returns ``(n_triples, min_wall_sec)``.  This single function is shared
    by bench.py's published ``triples_per_sec`` and by the CI floor test
    (tests/test_bench_floor.py) so the two can never disagree about what
    "flagship throughput" means (VERDICT r4 "What's wrong #1": the floor
    test previously used a more favorable best-of-3 ``max(n/wall)``
    estimator and pinned a floor the published min-of-2 number was below).
    Min-of-N reports the plan, not ambient host load — same rule the
    scaling sessions use; a single run swings ±15-30% with tenant noise.
    """
    from dere_spark.webtext import build_stages

    walls = []
    n = 0
    for _ in range(runs):
        t0 = time.perf_counter()
        n = build_stages(spark, sf_dir)["triples"].count()
        walls.append(time.perf_counter() - t0)
    return n, round(min(walls), 3)


def _run_suite(cpus: int) -> tuple[dict, float, dict, dict, float, int]:
    from dere_spark.queries import QUERIES
    from dere_spark.session import get_spark

    spark = get_spark("dere_spark_bench", cpus=cpus, shuffle_partitions=max(cpus, 16))
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    counts: dict[str, int] = {}
    # warm the JVM/codegen path once so timings measure the plan, not startup
    QUERIES["kg_tokens"](spark, SF_DIR).count()
    # flagship throughput: the FULL uncached documents->triples pipeline
    # (stage caching deliberately bypassed — this is the number the
    # docs/sec and triples/sec throughputs derive from)
    from dere_spark.webtext import build_stages

    t0 = time.perf_counter()
    flagship_triples = build_stages(spark, SF_DIR)["triples"].count()
    flagship_cold = round(time.perf_counter() - t0, 3)
    # steady-state: the shared min-of-2 estimator (flagship_steady_state)
    flagship_triples, flagship_wall = flagship_steady_state(spark, SF_DIR, runs=2)
    t_suite = time.perf_counter()
    for name in HEADLINE:
        # cold run: includes shared-stage materialization (charged once,
        # to whichever query touches the cached prefix first)
        t0 = time.perf_counter()
        counts[name] = QUERIES[name](spark, SF_DIR).count()
        cold[name] = round(time.perf_counter() - t0, 3)
        # warm run: steady-state — what a long-running batch actually pays
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    cold["_suite_wall_incl_cold"] = round(time.perf_counter() - t_suite, 3)
    cold["_flagship_cold"] = flagship_cold
    spark.stop()
    return timings, total, counts, cold, flagship_wall, flagship_triples


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # record ambient host load before/after: this host carries variable
    # external tenant load, and a loadavg line turns a "is this −13% a
    # plan regression or noise?" adjudication into a 10-second read
    # (VERDICT r4 next-step #3)
    load_start = [round(x, 2) for x in os.getloadavg()]
    timings, total, counts, cold, flagship_wall, flagship_triples = _run_suite(CPUS)
    load_end = [round(x, 2) for x in os.getloadavg()]

    n_docs = counts.get("text_quality", 0)  # one row per document
    triples_sec = round(flagship_triples / flagship_wall, 1) if flagship_wall else 0
    docs_sec = round(n_docs / flagship_wall, 1) if flagship_wall else 0

    out = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cold_queries": cold,
        "sf": sf,
        "cpus": CPUS,
        "rows": counts,
        "docs_per_sec": docs_sec,
        "triples_per_sec": triples_sec,
        # 1/5/15-min loadavg at suite start and end (start reflects ambient
        # tenant load; end includes this benchmark's own 32 threads)
        "loadavg": {"start": load_start, "end": load_end},
        # r3: the pipeline front door is Treebank segmentation (the
        # correct tokenizer for web text; ~15-30% warm flagship cost vs
        # the whitespace splitter on this space-separated corpus)
        "tokenizer": "treebank",
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        # contaminated-window guard (VERDICT r5 #3): a scaling session
        # launched into ambient tenant load produces a number that looks
        # like a scaling regression but is noise (the r5 0.722 session).
        # Stamp the verdict INTO the artifact so a bad session can never
        # be averaged into the clean series by mistake.  Judged on the
        # loadavg captured at LAUNCH (before the headline suite): by this
        # point the suite's own 32 threads dominate the 1-min loadavg, and
        # stamping on that would brand every session contaminated.
        out["scaling_window"] = scaling_window(load_start[0])
        out["scaling"] = _scaling_run()
        # The launch stamp can't see contamination ARRIVING mid-session;
        # record the post-scaling loadavg too, and note that the in-session
        # detector is wall_all_runs itself — the r5 contaminated artifact
        # showed monotonic 54.2->59.8->63.9 degradation across repeats
        # while a clean session's repeats are flat (BASELINE.md).
        out["loadavg"]["end_scaling"] = [round(x, 2) for x in os.getloadavg()]
        t1 = out["scaling"]["local-cluster[1x8]"]["wall_sec"]
        t4 = out["scaling"]["local-cluster[4x8]"]["wall_sec"]
        out["scaling_efficiency"] = round((t1 / t4) / 4.0, 3)

    print(json.dumps(out))


def scaling_window(loadavg_1min: float, threshold: float = 0.5) -> str:
    """Classify a scaling-session launch window by ambient host load.

    The methodology (BASELINE.md) requires 1-min loadavg < 0.5 at launch
    and a fully idle host for the session; anything else measured-distorts
    the 1x8-vs-4x8 ratio (r5's contaminated attempt: 0.722 vs the clean
    series 0.82-0.93). "contaminated" sessions still run — refusing would
    brick driver-initiated runs under load — but the JSON carries the
    verdict so the row is excluded from the clean series by construction.
    """
    return "clean" if loadavg_1min < threshold else "contaminated"


def _scaling_run(factor: int = 300, repeats: int = 3) -> dict:
    """Identical job + identical input at N=1 vs N=4 executors — the
    closest sandbox realization of BASELINE.json's "N -> 4N executors":
    ``local-cluster[1,8,6144]`` vs ``local-cluster[4,8,6144]`` gives real
    separate executor JVMs (own heaps, own Python workers), unlike
    ``local[n]`` whose single shared heap hits an allocation/GC ceiling
    past ~8 threads (measured: pure-CPU python multiprocessing scales 32x
    on this host, single-JVM Spark plateaus ~2.2x from 8->32 threads).

    The job is the flagship KG extraction over the sf corpus expanded
    ×factor (distinct doc_ids) staged as a 64-file parquet table, so scan
    parallelism is real and per-core work dominates fixed overhead. Wall
    time excludes session startup and JVM warmup (a throwaway warm-up job
    runs first). Each level runs `repeats` times and reports the MIN wall:
    the sandbox host carries variable external tenant load (loadavg >5
    with zero local JVMs), so the minimum is the least-contended, most
    cluster-like sample.
    """
    import pyspark.sql.functions as F

    from dere_spark.session import get_spark
    from dere_spark.sources.documents import load_documents
    from dere_spark.webtext import build_stages

    import tempfile

    # materialize the expanded corpus ONCE as a well-partitioned table —
    # measuring from a single tiny parquet file would serialize the scan
    # and hide all scaling behind a one-task head. The staging path keys
    # on the SOURCE directory too: keyed by factor alone, a run with a
    # different SPARK_GRAFT_SF_DIR would silently reuse the previous
    # source's expanded corpus while reporting the new sf in its JSON
    src_tag = hashlib.md5(SF_DIR.encode()).hexdigest()[:8]
    staging = os.path.join(
        tempfile.gettempdir(),
        f"dere_scaling_{factor}_{src_tag}",
        "documents.parquet",
    )
    if not os.path.exists(os.path.join(staging, "_SUCCESS")):
        spark = get_spark("scaling_prep", cpus=32)
        (
            load_documents(spark, SF_DIR, partition_by_doc=False)
            .crossJoin(spark.range(factor).toDF("copy"))
            .select(
                F.concat_ws("_", "doc_id", "copy").alias("doc_id"),
                "text",
                "lang",
                "source",
            )
            .repartition(64, "doc_id")
            .write.mode("overwrite")
            .parquet(staging)
        )
        spark.stop()

    from pyspark.sql import SparkSession

    results: dict = {}
    for n_exec in (1, 4):
        spark = (
            SparkSession.builder.master(f"local-cluster[{n_exec},8,6144]")
            .appName(f"scaling_{n_exec}x8")
            # worker offers 6144 MB; executors default to 1g unless told —
            # the banded join's per-partition sorts need real heap
            .config("spark.executor.memory", "5g")
            .config("spark.sql.shuffle.partitions", str(max(n_exec * 16, 16)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        sf_dir = os.path.dirname(staging)

        def job() -> int:
            # the REAL pipeline, exactly as extract_triples builds it
            return build_stages(spark, sf_dir)["triples"].count()

        job()  # warmup: codegen + JIT + page cache
        walls = []
        n_triples = 0
        for _ in range(repeats):
            t0 = time.perf_counter()
            n_triples = job()
            walls.append(round(time.perf_counter() - t0, 3))
        wall = min(walls)
        n_docs = spark.read.parquet(staging).count()
        results[f"local-cluster[{n_exec}x8]"] = {
            "wall_sec": wall,
            "wall_all_runs": walls,
            "n_docs": n_docs,
            "n_triples": n_triples,
            "docs_per_sec": round(n_docs / wall, 1),
            "triples_per_sec": round(n_triples / wall, 1),
        }
        spark.stop()
    return results


if __name__ == "__main__":
    sys.exit(main())
