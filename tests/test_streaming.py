"""Structured Streaming wrappers driven to completion with availableNow
triggers (finite + deterministic)."""

from pyspark.sql import functions as F

from dopams_etl_spark.streaming import (
    read_stream_parquet,
    stream_upsert_parquet,
    windowed_event_counts,
)


def _events_subset(spark, n=200):
    from dopams_etl_spark.catalog import load_table

    return load_table(spark, "events", "/root/testdata/sf0.001").limit(n)


def test_windowed_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ev = _events_subset(spark)
    ev.write.parquet(src)

    stream = read_stream_parquet(spark, src, ev.schema)
    counts = windowed_event_counts(stream, "ts", "event_type", window="1 hour")
    q = (
        counts.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")  # append emits only watermark-closed windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = spark.read.parquet(src)
    want_full = {
        (r["w"]["start"], r["event_type"]): r["n"]
        for r in batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # availableNow + append: all windows except those still open at the
    # final watermark are emitted; every emitted window must match batch.
    assert got, "no windows emitted"
    for k, v in got.items():
        assert want_full[k] == v


def test_stream_upsert_latest_wins(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    ev = _events_subset(spark, 100).select("event_id", "ts", "value")
    ev.write.parquet(src)
    # pre-seed the target with stale versions of 50 rows
    ev.limit(50).withColumn("ts", F.expr("ts - interval 10 days")).withColumn(
        "value", F.lit(-1.0)
    ).write.parquet(target)

    stream = read_stream_parquet(spark, src, ev.schema)
    q = stream_upsert_parquet(stream, target, ckpt, "event_id", "ts")
    q.awaitTermination(120)

    final = spark.read.parquet(target)
    assert final.count() == 100                      # no duplicate keys
    assert final.filter(F.col("value") == -1.0).count() == 0  # stale rows replaced
