#!/usr/bin/env python
"""Per-query isolation harness for the r07 optimization round (guide §1).

NOT the graded bench (bench.py is frozen); this exists to time individual
queries before/after a change without paying the whole suite:

    python bench_extra.py [--noop] [--runs N] [query ...]

Methodology mirrors bench.py: local[$SPARK_GRAFT_CPUS], data from
$SPARK_GRAFT_SF_DIR, the kg_tokens warmup, warm timings (first run
charged separately as cold). --noop sinks through the no-op writer
(computes every column, guide §1.4) instead of count() so projection
pruning cannot flatter a query; count() mode matches bench.py's numbers.
Each query reports min/median over --runs warm repetitions plus the
ambient loadavg, because this host carries variable tenant load.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    from dere_spark.queries import QUERIES
    from dere_spark.session import get_spark

    names = args.queries or list(QUERIES)
    spark = get_spark("bench_extra", cpus=CPUS, shuffle_partitions=max(CPUS, 16))
    QUERIES["kg_tokens"](spark, SF_DIR).count()  # JVM/codegen warmup

    def run_once(df) -> float:
        t0 = time.perf_counter()
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        return round(time.perf_counter() - t0, 3)

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        df = QUERIES[name](spark, SF_DIR)
        cold = run_once(df)
        warm = [run_once(QUERIES[name](spark, SF_DIR)) for _ in range(args.runs)]
        out[name] = {
            "cold": cold,
            "warm_min": min(warm),
            "warm_median": round(statistics.median(warm), 3),
            "warm_all": warm,
        }
        print(name, json.dumps(out[name]), flush=True)
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "cpus": CPUS,
                "mode": "noop" if args.noop else "count",
                "loadavg": [round(x, 2) for x in os.getloadavg()],
                "results": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
