"""Bucketed-table co-located joins — the shuffle-elimination primitive.

At 100 TB the dominant cost of a fact-to-fact equi-join is the shuffle of
both sides. Spark's answer is bucketing: write each side pre-hashed into
the same number of buckets on the join key (``bucketBy`` + ``sortBy``),
and a sort-merge join between two such tables needs NO Exchange — each
task zips bucket i of the left with bucket i of the right. A follow-up
aggregation keyed on the same column also inherits the partitioning and
runs exchange-free. The reference's closest surface is its batched
upsert scaffold (`etl-crimes/etl_crimes.py:654–789` re-sorts batches per
key before applying); this is the Spark-native generalization: pay the
partitioning cost once at write time, amortize it over every later join.

``tests/test_scale_posture.py`` asserts the physical plan is
Exchange-free below the join, so the property is machine-checked, not
aspirational.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    path: str,
) -> None:
    """Persist ``df`` as a bucketed+sorted external table on ``key``.

    ``saveAsTable`` is required (plain ``parquet(path)`` writes carry no
    bucket metadata for the reader to trust); the explicit ``path`` keeps
    the data out of the default warehouse. Overwrites any prior table of
    the same name, so repeated pipeline runs are idempotent.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


_CLEANUP_REGISTERED: set[str] = set()


def cleanup_bucketed_at_exit(
    spark: SparkSession, base_dir: str, tables: tuple[str, ...]
) -> None:
    """Register an interpreter-exit cleanup for this application's
    bucketed scratch: DROP the metastore entries (best-effort — the
    session may already be stopped) and remove ``base_dir``. Lazy
    evaluation forbids cleaning eagerly (the returned DataFrame still
    reads these files), and per-application naming means nobody else
    ever reads them — so exit-time is exactly when they become garbage.
    Idempotent per base_dir."""
    import atexit
    import shutil

    if base_dir in _CLEANUP_REGISTERED:
        return
    _CLEANUP_REGISTERED.add(base_dir)

    def _cleanup() -> None:
        for tbl in tables:
            try:
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            except Exception:
                pass  # session already gone; dir removal is the real cleanup
        shutil.rmtree(base_dir, ignore_errors=True)

    atexit.register(_cleanup)


def _pid_alive(pid: int) -> bool:
    import os

    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    except OSError:
        return False
    return True


def sweep_stale_bucketed_dirs(
    parent: str, keep: str, max_age_seconds: float = 86400.0
) -> int:
    """Remove ``dopams_bucketed_*`` scratch dirs abandoned by DEAD prior
    applications (their atexit never ran). Age alone is NOT proof of
    abandonment — a long-lived session's lazy plans may still read a
    day-old dir — so each dir name embeds its owner's pid
    (``dopams_bucketed_<run>_pid<pid>``) and sweeping requires BOTH the
    age threshold AND a dead owner (``kill -0`` probe; scratch under
    /tmp is host-local, so the pid namespace is the right scope).
    Legacy dirs without a pid suffix fall back to age-only sweeping,
    and a 7-day hard backstop sweeps regardless of the pid probe — pid
    reuse can make a recycled pid look alive forever, and no scratch
    consumer legitimately survives a week.
    Returns the number of dirs removed."""
    import glob
    import os
    import re
    import shutil
    import time

    removed = 0
    now = time.time()
    for d in glob.glob(os.path.join(parent, "dopams_bucketed_*")):
        if d == keep:
            continue
        try:
            age = now - os.path.getmtime(d)
        except OSError:
            continue  # raced with its owner's own cleanup
        m = re.search(r"_pid(\d+)$", d)
        if (
            m
            and _pid_alive(int(m.group(1)))
            and age <= 7 * 86400.0  # pid-reuse backstop: a week is dead
        ):
            continue  # owner still running — its lazy plans may read it
        try:
            if age > max_age_seconds:
                shutil.rmtree(d, ignore_errors=True)
                removed += 1
        except OSError:
            continue  # raced with its owner's own cleanup
    return removed


def bucketed_equijoin(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Sort-merge join of two same-bucket-count tables, shuffle-free.

    The ``merge`` hint pins SMJ (a broadcast would also avoid the
    exchange but proves nothing about co-location); with matching bucket
    counts Catalyst plans the join with zero Exchange nodes and reuses
    the bucket-sorted order, so there is no Sort either.
    """
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.hint("merge").join(rt, lt[left_key] == rt[right_key])
