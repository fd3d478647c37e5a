"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set spans the engine's main physical plans: wide aggregation
(q1), broadcast star join (regional_revenue), the decorrelated gold MV
(firs_mv), hash dedup + LSH near-dup (exact/minhash), and bucketed vector
search (lsh_topk).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = (
    "q1_pricing_summary",
    "regional_revenue",
    "firs_mv",
    "exact_dedup_docs",
    "minhash_lsh_pairs",
    "lsh_topk_embeddings",
)


def main() -> None:
    from dopams_etl_spark.plans import catalog
    from dopams_etl_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()

    # warm the JVM/session so q1 doesn't pay startup costs
    qs["q1_pricing_summary"](spark, SF_DIR).count()

    # Five runs per query, report the steady-state (min). The DataFrame
    # is built ONCE and executed repeatedly: plan construction (Python
    # expression-tree building + Catalyst analysis) is a one-time cost a
    # recurring pipeline amortizes by reusing its prepared plan — the
    # first timed run still includes Catalyst optimization + codegen, so
    # min-of-N is warm EXECUTION, the recurring cost. OS page cache
    # holds the parquet either way. N=5 (was 3 through r8): single
    # executions of firs_mv vary ±30%+ with ambient load on this box
    # (r8's +19.5% "regression" was noise on byte-identical code), and
    # the min of 5 pins the envelope tighter for ~10 extra seconds.
    try:
        runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    except ValueError as e:
        raise SystemExit(
            f"SPARK_GRAFT_BENCH_RUNS must be an integer >= 1: {e}"
        ) from None
    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = qs[name](spark, SF_DIR)
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    lineitem_rows = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "protocol": f"min-of-{runs} warm executions per query",
                "lineitem_rows": lineitem_rows,
                "rows_per_sec_q1": round(lineitem_rows / timings["q1_pricing_summary"]),
            }
        )
    )


if __name__ == "__main__":
    main()
