"""Keep-1-record-style incremental fixture (SURVEY §5): run the merge
twice — the second run must classify everything no_change; rewind the
versions — everything must classify updated. Plus property-based checks
(hypothesis) on merge idempotency and status-normalizer totality."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dopams_etl_spark.functions.status import normalize_status
from dopams_etl_spark.operators.merge import classify_merge, upsert_latest_wins


def test_second_run_is_all_no_change(spark):
    from dopams_etl_spark.catalog import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.001").select(
        "event_id", "ts", "value"
    )
    merged = upsert_latest_wins(
        spark.createDataFrame([], ev.schema), ev, "event_id", "ts"
    )
    # run 2: identical feed against the merged target
    ops = classify_merge(merged, ev, "event_id", ["ts", "value"])
    got = {r["merge_op"] for r in ops.select("merge_op").distinct().collect()}
    assert got == {"no_change"}

    # rewind: target versions pushed back, values blanked → all updated
    rewound = merged.withColumn("ts", F.expr("ts - interval 365 days")).withColumn(
        "value", F.lit(-1.0)
    )
    ops2 = classify_merge(rewound, ev, "event_id", ["ts", "value"])
    got2 = {r["merge_op"] for r in ops2.select("merge_op").distinct().collect()}
    assert got2 == {"updated"}


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3), st.text("ab", max_size=3)),
        min_size=1,
        max_size=12,
    )
)
def test_upsert_idempotent_under_reapplication(spark_global, rows):
    """upsert(upsert(E, I), I) == upsert(E, I) — overlapping chunk replays
    must be harmless (I2)."""
    spark = spark_global
    inc = spark.createDataFrame(rows, "k int, v int, tag string")
    empty = spark.createDataFrame([], "k int, v int, tag string")
    once = upsert_latest_wins(empty, inc, "k", "v", tiebreak="tag")
    twice = upsert_latest_wins(once, inc, "k", "v", tiebreak="tag")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.one_of(st.none(), st.text(max_size=40)))
def test_normalize_status_total(spark_global, raw):
    """Any input maps to exactly one of the four reference labels."""
    df = spark_global.createDataFrame([(raw,)], "s string")
    out = df.select(normalize_status("s").alias("n")).collect()[0]["n"]
    assert out in {"Arrested", "Absconding", "Issued Notice", "Unknown"}
