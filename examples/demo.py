"""End-to-end tour of the engine on the sf0.001 testdata — the surfaces a
reference-system user touches daily, in one runnable script.

    python examples/demo.py            # ~1 min on local[*]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python examples/demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from dopams_etl_spark.catalog import register_views
    from dopams_etl_spark.gold import refresh_gold
    from dopams_etl_spark.nlq.generator import answer_question
    from dopams_etl_spark.plans import catalog
    from dopams_etl_spark.session import get_spark

    spark = get_spark("demo")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()

    print(f"== spark-dopams demo @ {SF_DIR}\n")

    # 1. Analytics: the flagship gold MV (decorrelated firs_mv rewrite)
    mv = qs["firs_mv"](spark, SF_DIR)
    print(f"1. firs_mv gold pipeline: {mv.count()} rows, {len(mv.columns)} cols")

    # 2. Gold refresh executor: recompute + partitioned overwrite on disk
    out = tempfile.mkdtemp(prefix="demo_gold_")
    counts = refresh_gold(spark, SF_DIR, out, names=("criminal_profiles_mv",))
    print(f"2. refresh_gold -> {out}: {counts}")

    # 3. NL -> SQL with guardrails (plan -> generate -> validate -> execute)
    register_views(spark, SF_DIR)
    ans = answer_question(spark, "How many orders are there?")
    first = ans.result.rows[0] if ans.result and ans.result.rows else None
    print(f"3. NLQ: {ans.sql!r} -> {first}")
    grouped = answer_question(
        spark, "What is the average order price per priority in 1995?"
    )
    print(f"3b. NLQ synthesis: {grouped.sql!r} -> {len(grouped.result.rows)} rows")

    # 4. Training-data pipeline: dedup -> quality -> tiers on documents
    dedup = qs["exact_dedup_docs"](spark, SF_DIR)
    tiers = qs["perplexity_tiers"](spark, SF_DIR)
    tier_counts = {r["tier"]: r["n"] for r in
                   tiers.groupBy("tier").agg(F_count().alias("n")).collect()}
    print(f"4. corpus: {dedup.count()} unique docs; perplexity tiers {tier_counts}")

    # 5. Vector search: LSH ANN over the embeddings table
    ann = qs["lsh_topk_embeddings"](spark, SF_DIR)
    print(f"5. lsh_topk ANN: {ann.count()} (probe, neighbor) rows")

    # 6. Lakehouse maintenance: CDC changelog apply + data-quality gate
    snap = qs["cdc_orders_snapshot"](spark, SF_DIR)
    report = qs["lineitem_quality_report"](spark, SF_DIR)
    failing = [r["rule"] for r in report.collect() if not r["pass"]]
    print(f"6. CDC snapshot: {snap.count()} rows; quality gate flags {failing}")

    # 7. Corpus assembly: deterministic split + hybrid retrieval + span dedup
    split = {r["split"]: r["n_docs"] for r in
             qs["train_val_test_split"](spark, SF_DIR).collect()}
    hybrid = qs["hybrid_search_docs"](spark, SF_DIR)
    top1 = {r["query_id"]: r["doc_id"] for r in
            hybrid.filter(hybrid["rank"] == 1).collect()}
    spans = qs["repeated_ngram_spans"](spark, SF_DIR)
    dup_docs = spans.filter(spans["n_dup_spans"] > 0).count()
    print(f"7. split {split}; hybrid top-1 per query {top1}; "
          f"{dup_docs} docs carry cross-doc duplicated spans")

    # 8. Round-7 time-series layer on the events stream
    bars = qs["ohlc_hourly_bars"](spark, SF_DIR)
    depth = qs["queue_depth_daily"](spark, SF_DIR)
    twm = {r["event_type"]: r["weighted_median"] for r in
           qs["time_weighted_median_value"](spark, SF_DIR).collect()}
    print(f"8. time-series: {bars.count()} OHLC bars; "
          f"{depth.count()} queue-depth days; "
          f"duration-weighted medians {twm}")

    # 9. Round-8 decision-support + data-selection layer
    top_wait = qs["q21_suppliers_kept_waiting"](spark, SF_DIR).collect()
    dsir = qs["dsir_importance_weights"](spark, SF_DIR).collect()
    trend = qs["mann_kendall_trend"](spark, SF_DIR).collect()[0]
    print(f"9. TPC-H q21 (EXISTS+NOT-EXISTS decorrelated): "
          f"{len(top_wait)} suppliers kept orders waiting; "
          f"DSIR top candidate doc {dsir[0]['doc_id']} "
          f"(weight {dsir[0]['dsir_weight']}); "
          f"revenue trend z={trend['z_stat']} over {trend['n_days']} days")

    print("\ndemo complete.")


def F_count():
    from pyspark.sql import functions as F

    return F.count(F.lit(1))


if __name__ == "__main__":
    main()
