"""Structured Streaming restatement of the incremental core (I1–I4).

The reference ingests via overlapping date-range chunks with a
watermark table (``etl-crimes/etl_crimes.py:246–379``); in Spark the same
semantics fall out of Structured Streaming primitives:

- the high-water mark (I1) IS the source's checkpointed offset log;
- late/overlapping data (I2) is handled by event-time watermarks instead
  of chunk overlap;
- checkpoint state (I3) lives in the query's checkpoint location;
- latest-wins upsert (S7/I4) runs per micro-batch via ``foreachBatch``
  over the batch merge operator — one code path for batch AND streaming.

Tests drive these with ``trigger(availableNow=True)`` over a file source,
so they are deterministic and finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from dopams_etl_spark.operators.merge import upsert_latest_wins


def read_stream_parquet(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """File-source stream over a parquet directory (schema required — a
    streaming source can't infer). ``maxFilesPerTrigger`` left to the
    caller's trigger config."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding) event-time window counts with a late-data
    watermark — the streaming analog of the reference's per-chunk stats
    (beyond-reference: the reference has no event-time windows at all)."""
    win = (
        F.window(F.col(ts_col), window)
        if slide is None
        else F.window(F.col(ts_col), window, slide)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def stream_upsert_parquet(
    stream: DataFrame,
    target_path: str,
    checkpoint_path: str,
    keys: str | list[str],
    version_col: str,
) -> StreamingQuery:
    """S7-as-a-stream: each micro-batch merges into the parquet target with
    the SAME latest-wins operator the batch path uses (``foreachBatch``).

    Read-merge-overwrite is the Delta-less MERGE; on a real deployment the
    target would be Delta/Iceberg and this body becomes ``MERGE INTO``.
    """

    def merge_batch(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        try:
            existing = spark.read.parquet(target_path)
        except Exception:
            existing = spark.createDataFrame([], batch.schema)
        merged = upsert_latest_wins(existing, batch, keys, version_col)
        # Two-phase write: the merge reads the files the write replaces.
        tmp = target_path.rstrip("/") + "__staging"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(target_path)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
