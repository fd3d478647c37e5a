"""Partitioning utilities.

``ensure_parallelism`` fixes the under-parallel-input case: a small or
single-row-group parquet file scans as ONE partition, which serializes
every downstream per-row expression onto one core (measured 7× on the
document corpus). It repartitions ONLY when the input has fewer
partitions than the cluster's default parallelism — at real scale inputs
already have plenty of partitions and this is a no-op, so the extra
shuffle is never paid where it would hurt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition up to default parallelism when under-partitioned.
    ``key_cols``: hash-partition on these (lets a following groupBy on the
    same keys skip its exchange); empty → round-robin."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key_cols:
        return df.repartition(target, *key_cols)
    return df.repartition(target)
