"""FK validation + deferred-retry quarantine (SURVEY §2.2 P6, §2.9 I5).

Reference: crimes whose ``ps_code`` ∉ hierarchy are rejected
(``etl-crimes/etl_crimes.py:661–670``); orphan children go to a
``*_pending_fk`` queue retried at end of run
(``etl-properties/etl_properties.py:177–311``).

Spark restatement: one left join splits the batch into (valid, rejects);
the quarantine is a DataFrame replayed next run — the batch analog of a
stream-stream join's state store. Parent-first DAG ordering removes most
orphans; the queue handles cross-run races.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_validate(
    child: DataFrame, parent: DataFrame, on: str | Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """Split ``child`` into (valid, rejects) by FK existence in ``parent``.

    Computed from a single left join on a deduplicated key projection —
    not two passes — so the child scans once; AQE will broadcast the key
    set when small.
    """
    keys = [on] if isinstance(on, str) else list(on)
    parent_keys = parent.select(*keys).dropDuplicates(keys).withColumn("__fk_ok", F.lit(True))
    joined = child.join(parent_keys, on=keys, how="left")
    valid = joined.filter(F.col("__fk_ok").isNotNull()).drop("__fk_ok")
    rejects = joined.filter(F.col("__fk_ok").isNull()).drop("__fk_ok")
    return valid, rejects


def quarantine_retry(
    pending: DataFrame, parent: DataFrame, on: str | Sequence[str], max_retries: int = 5
) -> tuple[DataFrame, DataFrame]:
    """Replay the pending queue against a (possibly newer) parent table.

    Returns (resolved, still_pending); ``retry_count`` increments and rows
    past ``max_retries`` stay flagged rather than dropped (parity with
    ``etl_fk_retry_queue.py:38–130``)."""
    if "retry_count" not in pending.columns:
        pending = pending.withColumn("retry_count", F.lit(0))
    resolved, still = fk_validate(pending, parent, on)
    still = still.withColumn("retry_count", F.col("retry_count") + 1).withColumn(
        "exhausted", F.col("retry_count") > max_retries
    )
    return resolved, still
