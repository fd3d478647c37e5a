"""Time-series operators over the events stream: bar rollups, duration
weighting, gap-based throttling, and first-seen cohort splits.

The reference's event feed is consumed as chunked batches keyed by time
(`etl-crimes/etl_crimes.py:354–450`); these queries are the analytical
layer a telemetry/market-data team builds on such a feed. Conventions
per ``plans/catalog.py``: identical aliases both sides, timestamps
surfaced as strings, doubles rounded to 6, deterministic (ts, event_id)
tie-breaks. Durations are computed in integer MICROSECONDS
(``unix_micros`` / ``epoch_us``) so both engines subtract identical
BIGINTs — no float time arithmetic anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dopams_etl_spark.operators.timeseries import (
    ohlc_bars,
    throttle_events,
    time_weighted_avg,
)
from dopams_etl_spark.plans.catalog import register, t

# throttle window: a repeat event of the same (user, type) within this
# many microseconds of its predecessor is dropped
THROTTLE_US = 60_000_000


@register(
    "ohlc_hourly_bars",
    """
    WITH w AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, value,
             first_value(value) OVER win AS open,
             last_value(value) OVER win AS close
      FROM events
      WINDOW win AS (PARTITION BY event_type, date_trunc('hour', ts)
                     ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING))
    SELECT event_type, strftime(hr, '%Y-%m-%d %H:00') AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(ANY_VALUE(open), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(ANY_VALUE(close), 6) AS close
    FROM w GROUP BY event_type, hr
    """,
)
def ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar rollup — the market-data/candlestick aggregation: per
    (event_type, hour), the first value (open), max (high), min (low)
    and last value (close), ordered by (ts, event_id) so open/close are
    deterministic under ties. ONE window pass partitioned by the same
    key as the following aggregate, so Catalyst reuses the exchange —
    one shuffle total, and the partition key (type, hour) is bounded, so
    no window partition ever exceeds an hour of one type's events."""
    e = t(spark, sf_dir, "events").select(
        "event_type",
        # materialize the hour key BEFORE the window so the window's
        # hashpartitioning(event_type, hr) is the SAME attribute set the
        # aggregate requires — Catalyst then reuses one exchange for
        # both (partitioning on the raw date_trunc expression instead
        # leaves the agg re-shuffling on the alias: 2 exchanges)
        F.date_trunc("hour", F.col("ts")).alias("hr"),
        "ts",
        "event_id",
        "value",
    )
    bars = ohlc_bars(e, ["event_type", "hr"], "ts", "event_id", "value")
    return bars.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:00").alias("hour"),
        "n_events",
        F.round("open", 6).alias("open"),
        F.round("high", 6).alias("high"),
        F.round("low", 6).alias("low"),
        F.round("close", 6).alias("close"),
    )


@register(
    "time_weighted_avg_value",
    """
    WITH g AS (
      SELECT user_id, CAST(ts AS DATE) AS d, value,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts, event_id)
               - epoch_us(ts) AS dur_us
      FROM events)
    SELECT user_id, CAST(d AS VARCHAR) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           ROUND(SUM(value * dur_us) / SUM(dur_us), 6) AS twap
    FROM g WHERE dur_us IS NOT NULL AND dur_us > 0
    GROUP BY user_id, d
    """,
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) — each observation weighted by how
    long it was the CURRENT value (until the next event that day), the
    estimator market data and metering both need when sampling is
    irregular (a flat mean over-weights bursts). Durations are exact
    integer microseconds via ``unix_micros``/``epoch_us`` lead-diffs, so
    both engines weight by identical BIGINTs; zero-length intervals
    (same-timestamp bursts) carry zero weight and are excluded. One
    window + one aggregate, both keyed (user_id, day) — a single
    shuffle, and the window partition is one user-day, never global."""
    e = t(spark, sf_dir, "events").select(
        "user_id",
        # materialized day key (not the raw cast expression) so the
        # window's exchange satisfies the aggregate's requirement —
        # one shuffle for both (same trick as ohlc_hourly_bars)
        F.col("ts").cast("date").alias("d"),
        "ts",
        "event_id",
        "value",
    )
    g = time_weighted_avg(e, ["user_id", "d"], "ts", "event_id", "value")
    return g.select(
        "user_id",
        F.col("d").cast("string").alias("day"),
        "n_intervals",
        F.round("twap", 6).alias("twap"),
    )


@register(
    "throttle_dedup_events",
    f"""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id, event_type
                     ORDER BY ts, event_id) AS gap_us
      FROM events)
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE gap_us IS NULL
                                    OR gap_us > {THROTTLE_US}) AS BIGINT)
             AS kept,
           CAST(COUNT(*) FILTER (WHERE gap_us IS NOT NULL
                                   AND gap_us <= {THROTTLE_US}) AS BIGINT)
             AS dropped
    FROM g GROUP BY event_type
    """,
)
def throttle_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based event throttling — a repeat of the same (user, type)
    within 60 s of its predecessor is a duplicate-ish retry/double-fire
    and gets dropped; the report counts kept vs dropped per type (the
    batch analog of the streaming replay-dedup operator, and the
    ingestion-side hygiene pass a training-event pipeline runs before
    sessionization). One lag window keyed (user, type) — bounded
    partitions — then a per-type hash aggregate whose map-side partials
    shuffle only |event_types| rows per task. Gap arithmetic in
    integer microseconds on both engines."""
    e = t(spark, sf_dir, "events")
    g = throttle_events(
        e, ["user_id", "event_type"], "ts", "event_id", THROTTLE_US
    )
    return g.groupBy("event_type").agg(
        F.count(F.when(F.col("kept"), 1)).alias("kept"),
        F.count(F.when(~F.col("kept"), 1)).alias("dropped"),
    )


@register(
    "daily_new_vs_returning",
    """
    WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
               FROM events GROUP BY user_id),
         a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT CAST(a.d AS VARCHAR) AS day,
           CAST(COUNT(*) AS BIGINT) AS active_users,
           CAST(COUNT(*) FILTER (WHERE a.d = f.first_day) AS BIGINT)
             AS new_users,
           CAST(COUNT(*) FILTER (WHERE a.d > f.first_day) AS BIGINT)
             AS returning_users
    FROM a JOIN f ON a.user_id = f.user_id GROUP BY a.d
    """,
)
def daily_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning daily split — the growth-accounting curve
    (how much of today's activity is acquisition vs retention). Both
    inputs aggregate to user grain keyed on user_id (first-seen day and
    the distinct active-day set), so the join is co-partitioned — the
    fact table shuffles once per branch at user granularity and never
    joins at event grain."""
    e = t(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    first = e.groupBy("user_id").agg(F.min(d).alias("first_day"))
    active = e.select("user_id", d.alias("d")).distinct()
    j = active.join(first, "user_id")
    return j.groupBy("d").agg(
        F.count(F.lit(1)).alias("active_users"),
        F.count(F.when(F.col("d") == F.col("first_day"), 1)).alias("new_users"),
        F.count(F.when(F.col("d") > F.col("first_day"), 1)).alias(
            "returning_users"
        ),
    ).select(
        F.col("d").cast("string").alias("day"),
        "active_users",
        "new_users",
        "returning_users",
    )
