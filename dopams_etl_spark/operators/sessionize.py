"""Gap-based sessionization — the ONE shared session contract.

Every session-scoped query (``user_sessions``, ``session_funnel_ordered``,
``kaplan_meier_retention``, ``logrank_retention_test``,
``shapley_channel_attribution``) derives sessions the same way: a new
session starts at a user's first event or after >30 minutes of
inactivity, with ``(ts, event_id)`` as the deterministic event order.
The definition lives HERE (and its SQL twin in
``plans.catalog.session_ctes``) so a change to the gap threshold or the
tie-break applies to every query on both engines at once instead of
drifting across copies.

Reference analog: the reference sessionizes in its dashboard layer with
the same inactivity-gap rule (``DB-schema.sql`` event views); restated
as two window passes over one ``user_id`` partitioning — the whole
sessionization shuffles once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_SECONDS = 1800


def with_session_num(ev: DataFrame) -> DataFrame:
    """Add ``new_session`` (1 at each session start) and ``session_num``
    (per-user running session counter, BIGINT) to an events frame with
    ``user_id``, ``ts``, ``event_id`` columns. Two windows on the same
    ``user_id`` partitioning — one shuffle. NULL-ts events are dropped
    up front (mirrored by ``session_ctes``'s WHERE): Spark ASC sorts
    NULLS FIRST while DuckDB sorts NULLS LAST, so an unfiltered NULL ts
    would sessionize differently per engine."""
    ev = ev.filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    # the running sum MUST use the same (ts, event_id) total order as the
    # lag window: ordering by ts alone leaves session_num nondeterministic
    # for same-timestamp events (whether the later event's frame includes
    # the session-start marker would depend on engine-internal tie order)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_SECONDS), 1).otherwise(0),
    ).withColumn("session_num", F.sum("new_session").over(run))
