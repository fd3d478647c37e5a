"""Interval algebra: merge overlapping per-key intervals (gap-and-island).

The reference works with activity timestamps (FIR event dates, media
download runs) but never consolidates them into busy periods; interval
union is the standard primitive behind downtime reports, session
coalescing with explicit durations, and retention-window bookkeeping.

Spark-first shape: ONE window pass per key — the running maximum of
interval ends over the key's start-ordered intervals detects island
boundaries (a new island starts exactly when a start exceeds every
earlier end), a running sum of those boundary flags numbers the islands,
and a plain groupBy collapses each island to its envelope. The shuffle is
keyed on the partition key; each key sorts only its own intervals — no
self-join (the naive overlap-join is O(n²) per key and produces the
transitive-closure problem this formulation sidesteps entirely).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key: str,
    start: str,
    end: str,
) -> DataFrame:
    """Collapse overlapping-or-touching ``[start, end]`` intervals per
    ``key`` into maximal disjoint islands.

    Returns one row per island: (key, island_start, island_end,
    n_intervals). Intervals touching at a point (next.start == prev.end)
    merge — the closed-interval convention; pre-shrink ends by an epsilon
    for half-open semantics. Start/end may be any orderable numeric or
    timestamp type (the envelope is min(start)/max(end) in that type).
    """
    w = Window.partitionBy(key).orderBy(start, end)
    prev_max_end = F.max(end).over(
        Window.partitionBy(key).orderBy(start, end).rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "__new_island",
        F.when(prev_max_end.isNull() | (F.col(start) > prev_max_end), 1).otherwise(0),
    ).withColumn("__island", F.sum("__new_island").over(w))
    return (
        flagged.groupBy(key, "__island")
        .agg(
            F.min(start).alias("island_start"),
            F.max(end).alias("island_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("__island")
    )
