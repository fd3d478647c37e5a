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

# r16 (VERDICT item 6): the partition-count probe converts the analyzed
# plan all the way to an RDD on the driver (analysis + optimization +
# physical planning), once per call site per DataFrame BUILD — ~36 call
# sites, and multi-arm queries probe the same subtree repeatedly
# (ann_cost_recall_tradeoff probes 7×/build). The count is a pure
# function of the analyzed plan, so memoize it on (session,
# semanticHash): semanticHash needs only analysis, which the caller's
# own schema accesses have already paid. A hash collision could at
# worst return a stale COUNT — the decision then mis-picks a
# partitioning, never a result (both branches are value-identical by
# every call site's contract).
_NPART_CACHE: dict[tuple[int, int], int] = {}
_NPART_CACHE_MAX = 4096


def probed_num_partitions(df: DataFrame) -> int:
    """Planned partition count of ``df``, memoized per (session, plan)."""
    key = (id(df.sparkSession), df.semanticHash())
    n = _NPART_CACHE.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        if len(_NPART_CACHE) >= _NPART_CACHE_MAX:
            _NPART_CACHE.clear()
        _NPART_CACHE[key] = n
    return n


def ensure_parallelism(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition up to default parallelism when under-partitioned.
    ``key_cols``: hash-partition on these (lets a following groupBy on the
    same keys skip its exchange); empty → round-robin."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if probed_num_partitions(df) >= target:
        return df
    if key_cols:
        return df.repartition(target, *key_cols)
    return df.repartition(target)
