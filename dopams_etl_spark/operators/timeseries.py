"""Reusable time-series operators: throttling, time weighting, bars.

The registered queries in ``plans/temporal.py`` are thin bindings of
these onto the events table; the operators themselves take any frame so
they compose with other pipelines and can be property-tested against
brute-force references on arbitrary inputs (``tests/
test_timeseries_property.py``). All duration arithmetic is integer
microseconds (``unix_micros``) — no float time math — and every window
orders by (ts, id) so ties are deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def throttle_events(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    id_col: str,
    min_gap_us: int,
) -> DataFrame:
    """Flag each event kept/dropped by gap-based throttling: within each
    key group (ordered by ts then id), an event within ``min_gap_us``
    microseconds (INCLUSIVE — a gap of exactly ``min_gap_us`` drops) of
    its PREDECESSOR EVENT is dropped.

    Note the predecessor is the previous event, not the previous KEPT
    event — the true debounce recurrence is sequential and
    unparallelizable; this lag formulation is the standard one-window
    restatement (each group shuffles once, partition size bounded by the
    group's events). Adds a boolean ``kept`` column."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    return df.withColumn("kept", gap.isNull() | (gap > min_gap_us))


def time_weighted_avg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key time-weighted average: each observation weighted by the
    exact integer-microsecond span until the key's next observation
    (the last observation, and zero-length spans from same-timestamp
    bursts, carry zero weight). Keys with fewer than two distinct
    timestamps produce no row. One window + one aggregate on the same
    key — a single shuffle."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    g = df.select(
        *key_cols,
        F.col(value_col).alias("_v"),
        (F.lead(us).over(w) - us).alias("_dur_us"),
    ).filter(F.col("_dur_us").isNotNull() & (F.col("_dur_us") > 0))
    return g.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        (F.sum(F.col("_v") * F.col("_dur_us")) / F.sum("_dur_us")).alias(
            "twap"
        ),
    )


def interval_depth_daily(
    spans: DataFrame,
    open_col: str,
    close_col: str,
) -> DataFrame:
    """Sweep-line concurrent-interval count: given (open_date,
    close_date) spans (inclusive on both ends), the number of spans
    open at the END of each day — without expanding each span into its
    covered days (a 200-day span would fan out 200×). Each span emits
    +1 at its open date and −1 the day after its close; the deltas
    aggregate to day grain and a running sum over only |days| rows
    yields the depth. Returns (d, net, open_count); the final day's
    running depth is always 0 (every +1 has a −1). Integer arithmetic
    end-to-end — partitioning-invariant."""
    deltas = spans.select(
        F.col(open_col).alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(
            F.date_add(F.col(close_col), 1).alias("d"),
            F.lit(-1).alias("delta"),
        )
    )
    daily = deltas.groupBy("d").agg(
        F.sum("delta").cast("bigint").alias("net")
    )
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "d", "net", F.sum("net").over(w).cast("bigint").alias("open_count")
    )


def ohlc_bars(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key OHLC bar: first value (open), max (high), min (low),
    last value (close), count — open/close resolved by an ordered
    unbounded window so ties on ``ts_col`` break deterministically on
    ``id_col``. Callers materialize any derived bar key (e.g. an hour
    truncation) as a real column BEFORE calling, so the window exchange
    satisfies the aggregate and the whole bar costs one shuffle."""
    win = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w = df.select(
        *key_cols,
        F.col(value_col).alias("_v"),
        F.first(value_col).over(win).alias("_open"),
        F.last(value_col).over(win).alias("_close"),
    )
    return w.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.any_value("_open").alias("open"),
        F.max("_v").alias("high"),
        F.min("_v").alias("low"),
        F.any_value("_close").alias("close"),
    )
