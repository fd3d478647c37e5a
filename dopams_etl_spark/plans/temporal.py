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
    interval_depth_daily,
    ohlc_bars,
    throttle_events,
    time_weighted_avg,
)
from dopams_etl_spark.operators.sessionize import with_session_num
from dopams_etl_spark.plans.catalog import register, session_ctes, t

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
      -- CAST DOUBLE first: both engines then weight the same doubles by
      -- the BIGINT spans even if a fixture regen narrows value to float32
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(value AS DOUBLE) AS value,
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
        # cast("double") first: Spark would otherwise multiply a
        # float32 value by the BIGINT span in the float lane on a
        # float32-narrowed fixture
        F.col("value").cast("double").alias("value"),
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


@register(
    "queue_depth_daily",
    """
    WITH closes AS (
      SELECT l_orderkey AS okey, CAST(MAX(l_shipdate) AS DATE) AS close_d
      FROM lineitem GROUP BY l_orderkey),
    spans AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS open_d,
             COALESCE(close_d, CAST(o_orderdate AS DATE)) AS close_d
      FROM orders LEFT JOIN closes ON o_orderkey = okey
      -- an order with no order date never enters the sweep (a NULL day
      -- would ride the engines' opposite NULL sort through the running sum)
      WHERE o_orderdate IS NOT NULL),
    deltas AS (
      SELECT open_d AS d, 1 AS delta FROM spans
      UNION ALL
      SELECT close_d + 1, -1 FROM spans),
    daily AS (SELECT d, CAST(SUM(delta) AS BIGINT) AS net
              FROM deltas GROUP BY d)
    SELECT CAST(d AS VARCHAR) AS day, net,
           CAST(SUM(net) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS open_orders
    FROM daily
    """,
)
def queue_depth_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line queue depth — how many orders are OPEN (placed, not yet
    fully shipped) at the end of each day: +1 at the order date, −1 the
    day after the order's last lineitem ship date, running-summed. The
    interval-stabbing question answered without expanding each order into
    its covered days (an order open 200 days would fan out 200×): one
    per-order close aggregate (orderkey-co-partitioned join), a delta
    aggregate to day grain, then a running sum over only |days| rows —
    the classic event-sweep rewrite that keeps 100 TB of spans out of
    the window."""
    # an order with no order date never enters the sweep (oracle states
    # o_orderdate IS NOT NULL — the shared null-date convention)
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("open_d"))
    )
    li = t(spark, sf_dir, "lineitem")
    closes = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.max(F.col("l_shipdate").cast("date")).alias("close_d")
    )
    spans = (
        o.join(closes, o["o_orderkey"] == closes["okey"], "left")
        .select("open_d", F.coalesce("close_d", "open_d").alias("close_d"))
    )
    depth = interval_depth_daily(spans, "open_d", "close_d")
    return depth.select(
        F.col("d").cast("string").alias("day"),
        "net",
        F.col("open_count").alias("open_orders"),
    )


@register(
    "seasonal_decompose_daily",
    """
    WITH daily AS (
      -- ts IS NOT NULL: an un-timestamped event has no day (a NULL day
      -- would ride the engines' opposite NULL sort through the centered
      -- moving-average frame)
      SELECT CAST(ts AS DATE) AS d, dayofweek(CAST(ts AS DATE)) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    tr AS (
      SELECT d, dow, n,
             AVG(n) OVER w AS trend,
             COUNT(*) OVER w AS w_n
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    det AS (SELECT d, dow, n, trend, n - trend AS detr
            FROM tr WHERE w_n = 7),
    seas AS (SELECT dow, AVG(detr) AS seasonal FROM det GROUP BY dow)
    -- + 0.0 canonicalizes IEEE -0.0 (seasonal/resid are sign-indefinite)
    SELECT CAST(det.d AS VARCHAR) AS day, det.n,
           ROUND(trend, 6) AS trend,
           ROUND(seasonal, 6) + 0.0 AS seasonal,
           ROUND(det.n - trend - seasonal, 6) + 0.0 AS resid
    FROM det JOIN seas ON det.dow = seas.dow
    """,
)
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily event count:
    trend = centered 7-day moving average (only days with the full
    window), seasonal = mean detrended value per weekday, residual =
    the rest — the STL-lite baseline behind anomaly thresholds and
    forecast sanity checks. The fact collapses to day grain first, so
    every window/join below runs on |days| rows; DOW normalized to
    DuckDB's 0=Sunday numbering per the dow_seasonality convention."""
    # ts IS NOT NULL: an un-timestamped event has no day (a NULL day
    # would ride the engines' opposite NULL sort through the centered
    # moving-average frame)
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    from pyspark.sql import Window

    daily = ev.groupBy(
        F.col("ts").cast("date").alias("d"),
        (F.dayofweek(F.col("ts").cast("date")) - F.lit(1)).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d", "dow", "n",
        F.avg("n").over(w).alias("trend"),
        F.count(F.lit(1)).over(w).alias("w_n"),
    )
    det = tr.filter(F.col("w_n") == 7).select(
        "d", "dow", "n", "trend", (F.col("n") - F.col("trend")).alias("detr")
    )
    seas = det.groupBy("dow").agg(F.avg("detr").alias("seasonal"))
    # + 0.0 canonicalizes IEEE -0.0 (seasonal/resid are sign-indefinite)
    return det.join(F.broadcast(seas), "dow").select(
        F.col("d").cast("string").alias("day"),
        "n",
        F.round("trend", 6).alias("trend"),
        (F.round("seasonal", 6) + 0.0).alias("seasonal"),
        (
            F.round(F.col("n") - F.col("trend") - F.col("seasonal"), 6) + 0.0
        ).alias("resid"),
    )


@register(
    "multi_touch_attribution_linear",
    """
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'purchase' THEN event_id END AS pmark
      FROM events),
    nxt AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(pmark IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS conv_id
      FROM marked),
    touches AS (
      SELECT event_type, conv_id FROM nxt
      WHERE conv_id IS NOT NULL AND event_type IN ('view', 'click')),
    sized AS (
      SELECT event_type, conv_id,
             CAST(COUNT(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n_t
      FROM touches)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(SUM(1.0 / n_t), 6) AS linear_credit
    FROM sized GROUP BY event_type
    """,
)
def multi_touch_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution — every view/click preceding a
    purchase (the user's NEXT purchase, strictly after the touch) splits
    that conversion's credit equally, the even-handed complement to the
    first/last-touch models in attribution_first_vs_last. The
    next-purchase assignment is one user-keyed reverse window
    (last_value IGNORE NULLS over the descending order — no per-touch
    subquery), conversion sizes one conv-keyed window, and the output
    collapses to |event_types| rows."""
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window

    marked = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias(
            "pmark"
        ),
    )
    w_desc = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nxt = marked.select(
        "event_type",
        F.last("pmark", ignorenulls=True).over(w_desc).alias("conv_id"),
    )
    touches = nxt.filter(
        F.col("conv_id").isNotNull()
        & F.col("event_type").isin("view", "click")
    )
    sized = touches.select(
        "event_type",
        F.count(F.lit(1))
        .over(Window.partitionBy("conv_id"))
        .cast("bigint")
        .alias("n_t"),
    )
    return sized.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.round(F.sum(F.lit(1.0) / F.col("n_t")), 6).alias("linear_credit"),
    )


@register(
    "funnel_time_to_convert",
    """
    WITH fv AS (
      SELECT user_id, MIN(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    fp AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase
      FROM events e JOIN fv ON e.user_id = fv.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
      GROUP BY e.user_id),
    d AS (
      SELECT (epoch_us(first_purchase) - epoch_us(first_view)) / 60000000.0
               AS mins
      FROM fv JOIN fp ON fv.user_id = fp.user_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           ROUND(quantile_cont(mins, 0.25), 4) AS p25_min,
           ROUND(quantile_cont(mins, 0.5), 4) AS p50_min,
           ROUND(quantile_cont(mins, 0.75), 4) AS p75_min,
           ROUND(quantile_cont(mins, 0.9), 4) AS p90_min
    FROM d
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution — minutes from each user's first
    view to their first purchase at-or-after it, summarized as exact
    interpolated percentiles (the funnel-latency companion to the
    step-count funnels: how LONG conversion takes, not just whether).
    Two user-keyed min-aggregates and a co-partitioned join collapse the
    fact to one double per converted user; the percentile sorts only
    |users| values. Durations in exact integer microseconds before the
    single division."""
    ev = t(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    d = fv.join(fp, "user_id").select(
        (
            (F.unix_micros("first_purchase") - F.unix_micros("first_view"))
            / F.lit(60000000.0)
        ).alias("mins")
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.percentile("mins", F.lit(0.25)), 4).alias("p25_min"),
        F.round(F.percentile("mins", F.lit(0.5)), 4).alias("p50_min"),
        F.round(F.percentile("mins", F.lit(0.75)), 4).alias("p75_min"),
        F.round(F.percentile("mins", F.lit(0.9)), 4).alias("p90_min"),
    )


@register(
    "time_weighted_median_value",
    """
    WITH g AS (
      SELECT event_type, event_id, value,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
               - epoch_us(ts) AS dur_us
      FROM events),
    wt AS (SELECT event_type, event_id, value, dur_us
           FROM g WHERE dur_us IS NOT NULL AND dur_us > 0),
    c AS (
      SELECT event_type, value,
             SUM(dur_us) OVER (PARTITION BY event_type
                               ORDER BY value, event_id
                               ROWS UNBOUNDED PRECEDING) AS cum_w,
             SUM(dur_us) OVER (PARTITION BY event_type) AS tot_w
      FROM wt),
    hit AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cum_w, value) AS rn
      FROM c WHERE cum_w * 2 >= tot_w)
    SELECT event_type, ROUND(value, 6) AS weighted_median
    FROM hit WHERE rn = 1
    """,
)
def time_weighted_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted median of event value per type — the robust
    center of 'what value was in effect' over TIME rather than over
    samples (a burst of 100 identical readings in one second counts one
    second, not 100 votes). Weights are the exact integer-microsecond
    holding times from the TWAP machinery, so the cumulative-weight
    comparisons are BIGINT-exact on both engines — a float-weighted
    median could disagree at the crossover row; an integer one cannot.
    One user-keyed lag window, then per-type sort windows over the
    weighted rows; the lower weighted median (first value whose
    cumulative weight reaches half the total) with (value, event_id)
    tie-break."""
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window

    us = F.unix_micros(F.col("ts"))
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "event_type", "event_id", "value",
        (F.lead(us).over(w_user) - us).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = g.select(
        "event_type", "value",
        F.sum("dur_us").over(w_cum).alias("cum_w"),
        F.sum("dur_us").over(Window.partitionBy("event_type")).alias("tot_w"),
    )
    hit = c.filter(F.col("cum_w") * 2 >= F.col("tot_w")).select(
        "event_type", "value",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("cum_w", "value"))
        .alias("rn"),
    )
    return hit.filter(F.col("rn") == 1).select(
        "event_type", F.round("value", 6).alias("weighted_median")
    )


def _coalition_ctes() -> str:
    """The shared session-coalition oracle head both Shapley variants
    (exact lattice and permutation-sampled) open with: the standard
    30-min sessionization (``session_ctes``), the channel→bit-position
    table ``u``, the per-session conversion/channel-bitmask aggregate
    ``sess``, and the observed-coalition value table
    ``vm(mask, n_m, c_m)`` — the ONE aggregate that collapses the fact.
    One definition per engine; the coalition model cannot drift between
    the two estimators (Spark twin: ``_session_coalitions``)."""
    return (
        "WITH "
        + session_ctes("event_type")
        + """,
    u AS (SELECT ch, CAST(row_number() OVER (ORDER BY ch) - 1 AS INT) AS pos
          FROM (SELECT DISTINCT event_type AS ch FROM events
                WHERE event_type <> 'purchase')),
    sess AS (
      SELECT s.user_id, s.session_num,
             MAX(CASE WHEN s.event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv,
             COALESCE(bit_or(CASE WHEN s.event_type <> 'purchase'
                             THEN (CAST(1 AS BIGINT) << u.pos) END),
                      0) AS mask
      FROM s LEFT JOIN u ON s.event_type = u.ch
      GROUP BY s.user_id, s.session_num),
    vm AS (SELECT mask, CAST(COUNT(*) AS BIGINT) AS n_m,
                  CAST(SUM(conv) AS BIGINT) AS c_m
           FROM sess GROUP BY mask)"""
    )


def _touched_cte_sql() -> str:
    """The per-channel touched-session CTE both Shapley oracles share
    (SQL twin of ``_channels_touched``): each observed mask contributes
    its session count to every channel whose bit it carries."""
    return """
    touched AS (
      SELECT u.ch,
             CAST(COALESCE(SUM(CASE WHEN ((vm.mask >> u.pos) & 1) = 1
                                    THEN vm.n_m END), 0) AS BIGINT)
               AS n_sessions
      FROM u CROSS JOIN vm GROUP BY u.ch)"""


def _session_coalitions(spark: SparkSession, ev: DataFrame, channels: list[str]) -> DataFrame:
    """Spark twin of ``_coalition_ctes``: sessionize, bitmask each
    session's channel set over the sorted channel list, and aggregate
    to the observed-coalition table ``vm(mask, n_m, c_m)`` — shared by
    the exact and sampled Shapley queries so the coalition model is
    defined once per engine."""
    u = spark.createDataFrame(
        [(ch, i) for i, ch in enumerate(channels)], "ch string, pos int"
    )
    s = with_session_num(ev)
    sess = (
        s.join(F.broadcast(u), s["event_type"] == u["ch"], "left")
        .groupBy("user_id", "session_num")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
            F.coalesce(
                F.bit_or(
                    F.when(
                        F.col("event_type") != "purchase",
                        F.expr("shiftleft(CAST(1 AS BIGINT), pos)"),
                    )
                ),
                F.lit(0).cast("bigint"),
            ).alias("mask"),
        )
    )
    return sess.groupBy("mask").agg(
        F.count(F.lit(1)).alias("n_m"), F.sum("conv").alias("c_m")
    )


@register(
    "shapley_channel_attribution",
    _coalition_ctes()
    + """,
    k_ AS (SELECT CAST(COUNT(*) AS INT) AS k FROM u),
    allm AS (SELECT unnest(range(0, (CAST(1 AS BIGINT) << k))) AS mask
             FROM k_),
    v AS (SELECT allm.mask,
                 COALESCE(c_m / CAST(n_m AS DOUBLE), 0.0) AS v
          FROM allm LEFT JOIN vm USING (mask)),
    f(i, fv) AS (SELECT * FROM (VALUES (0, 1), (1, 1), (2, 2), (3, 6),
                                       (4, 24), (5, 120), (6, 720))
                              t(i, fv)),
    terms AS (
      SELECT u.ch, v0.mask AS s_mask,
             (fa.fv * fb.fv / CAST(fk.fv AS DOUBLE)) * (v1.v - v0.v)
               AS term
      FROM u
      CROSS JOIN k_
      JOIN v v0 ON ((v0.mask >> u.pos) & 1) = 0
      JOIN v v1 ON v1.mask = (v0.mask | (CAST(1 AS BIGINT) << u.pos))
      JOIN f fa ON fa.i = bit_count(v0.mask)
      JOIN f fb ON fb.i = k_.k - 1 - bit_count(v0.mask)
      JOIN f fk ON fk.i = k_.k),
    acc AS (
      SELECT ch, SUM(term) OVER (PARTITION BY ch ORDER BY s_mask
                                 ROWS UNBOUNDED PRECEDING) AS phi,
             row_number() OVER (PARTITION BY ch ORDER BY s_mask DESC)
               AS rn
      FROM terms),"""
    + _touched_cte_sql()
    + """
    SELECT acc.ch AS channel, touched.n_sessions,
           ROUND(acc.phi, 6) + 0.0 AS shapley_credit
    FROM acc JOIN touched ON acc.ch = touched.ch
    WHERE acc.rn = 1
    """,
)
def shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value channel attribution (Shapley 1953 applied to
    conversion paths, the game-theoretic model behind Google Ads'
    data-driven attribution): sessions are coalitions — each session's
    channel set is a bitmask over the non-purchase event types, the
    characteristic value v(S) is the observed conversion rate of
    sessions with EXACTLY channel set S (unobserved coalitions
    contribute 0), and each channel's credit is the classic weighted
    sum phi_i = sum_S |S|!(k-1-|S|)!/k! * (v(S u {i}) - v(S)) — the
    marginal-contribution average first/last/linear models
    (``attribution_first_vs_last``, ``multi_touch_attribution_linear``)
    approximate by fiat. Scale shape: the fact collapses through the
    standard 30-min sessionization to ONE mask-keyed aggregate
    (<= 2^k rows, k = |channels|, a domain constant); the subset
    lattice (k * 2^(k-1) triples with precomputed factorial weights) is
    a driver-built literal like the kmeans centroid table — everything
    downstream of the session aggregate is constant-size at any fact
    cardinality. Per-channel sums accumulate through one ordered
    cumulative frame (last row taken) so both engines add bit-identical
    term doubles in identical order. Channel bit counts per observed
    mask are exploded from the mask (JVM ``filter``/``sequence``
    lambdas), never a non-equi join."""
    import math

    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    channels = sorted(
        r[0]
        for r in ev.filter(F.col("event_type") != "purchase")
        .select("event_type")
        .distinct()
        .collect()
    )
    k = len(channels)
    if k > 6:
        # the oracle's inline factorial table covers |S|! up to 6!; past
        # that its fk join silently matches nothing — fail LOUDLY here
        # instead (exact Shapley past k=6 wants the sampled estimator
        # anyway: 2^k lattice growth)
        raise ValueError(
            f"shapley_channel_attribution supports <= 6 channels, got {k}"
        )
    u = spark.createDataFrame(
        [(ch, i) for i, ch in enumerate(channels)], "ch string, pos int"
    )
    vm = _session_coalitions(spark, ev, channels)
    allm = spark.createDataFrame(
        [(m,) for m in range(1 << k)], "mask bigint"
    )
    v = allm.join(vm, "mask", "left").select(
        "mask",
        F.coalesce(
            F.col("c_m") / F.col("n_m").cast("double"), F.lit(0.0)
        ).alias("v"),
    )
    fact = math.factorial
    triples = spark.createDataFrame(
        [
            (ch, s_mask, (s_mask | (1 << pos)),
             fact(bin(s_mask).count("1"))
             * fact(k - 1 - bin(s_mask).count("1"))
             / fact(k))
            for pos, ch in enumerate(channels)
            for s_mask in range(1 << k)
            if not (s_mask >> pos) & 1
        ],
        "ch string, s_mask bigint, si_mask bigint, w double",
    )
    terms = (
        triples.join(
            F.broadcast(v.withColumnRenamed("v", "v0")),
            triples["s_mask"] == v["mask"],
        )
        .drop("mask")
        .join(
            F.broadcast(
                v.select(
                    F.col("mask").alias("mask1"), F.col("v").alias("v1")
                )
            ),
            F.col("si_mask") == F.col("mask1"),
        )
        .select(
            "ch",
            "s_mask",
            (F.col("w") * (F.col("v1") - F.col("v0"))).alias("term"),
        )
    )
    wacc = Window.partitionBy("ch").orderBy("s_mask").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    acc = terms.select(
        "ch",
        F.sum("term").over(wacc).alias("phi"),
        F.row_number()
        .over(Window.partitionBy("ch").orderBy(F.col("s_mask").desc()))
        .alias("rn"),
    ).filter(F.col("rn") == 1)
    touched = _channels_touched(u, vm, k)
    return acc.join(touched, "ch").select(
        F.col("ch").alias("channel"),
        "n_sessions",
        # + 0.0 canonicalizes IEEE -0.0: a credit in (-5e-7, 0) rounds
        # to -0.0 on DuckDB but 0.0 on Spark, and the gate hashes reprs
        (F.round("phi", 6) + 0.0).alias("shapley_credit"),
    )


def _channels_touched(u: DataFrame, vm: DataFrame, k: int) -> DataFrame:
    """Per-channel touched-session counts from the coalition table:
    each observed mask's bit positions explode JVM-side (filter/sequence
    lambdas — never a non-equi join) and weight by the mask's session
    count. Shared by both Shapley variants."""
    bits = vm.select(
        "n_m",
        F.explode(
            F.expr(
                f"filter(sequence(0, {k - 1}),"
                " p -> ((mask >> p) & 1) = 1)"
            )
        ).alias("pos"),
    )
    return (
        u.join(bits, "pos", "left")
        .groupBy("ch")
        .agg(F.coalesce(F.sum("n_m"), F.lit(0)).cast("bigint").alias(
            "n_sessions"
        ))
    )


SHAPLEY_SAMPLE_SALT = "shap-v1"
SHAPLEY_SAMPLE_PERMS = 24


@register(
    "shapley_channel_attribution_sampled",
    _coalition_ctes()
    + f""",
    reps AS (SELECT unnest(range(0, {SHAPLEY_SAMPLE_PERMS})) AS r),
    perm AS (
      SELECT r, ch, pos,
             row_number() OVER (
               PARTITION BY r
               ORDER BY md5('{SHAPLEY_SAMPLE_SALT}|' || CAST(r AS VARCHAR)
                            || '|' || ch), ch) AS rnk
      FROM u CROSS JOIN reps),
    pre AS (
      SELECT r, ch, pos,
             COALESCE(SUM(CAST(1 AS BIGINT) << pos) OVER (
                 PARTITION BY r ORDER BY rnk
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS m0
      FROM perm),
    tv AS (
      SELECT pre.ch, pre.r,
             COALESCE(v1.c_m / CAST(v1.n_m AS DOUBLE), 0.0)
             - COALESCE(v0.c_m / CAST(v0.n_m AS DOUBLE), 0.0) AS term
      FROM pre
      LEFT JOIN vm v0 ON v0.mask = pre.m0
      LEFT JOIN vm v1
             ON v1.mask = pre.m0 + (CAST(1 AS BIGINT) << pre.pos)),
    acc AS (
      SELECT ch, SUM(term) OVER (PARTITION BY ch ORDER BY r
                                 ROWS UNBOUNDED PRECEDING) AS s,
             row_number() OVER (PARTITION BY ch ORDER BY r DESC) AS rn
      FROM tv),"""
    + _touched_cte_sql()
    + f"""
    SELECT acc.ch AS channel, touched.n_sessions,
           CAST({SHAPLEY_SAMPLE_PERMS} AS BIGINT) AS n_permutations,
           ROUND(acc.s / {SHAPLEY_SAMPLE_PERMS}.0, 6) + 0.0
             AS shapley_credit_sampled
    FROM acc JOIN touched ON acc.ch = touched.ch
    WHERE acc.rn = 1
    """,
)
def shapley_channel_attribution_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation-sampling Shapley estimator (Castro, Gómez & Tejada
    2009) — the scale path past the exact operator's k<=6 cap: each of
    R=24 fixed permutations walks the channels in md5-derived order
    (salt 'shap-v1', replicate-salted — both engines sort the same
    lowercase-hex digests, so the permutation SET is a deterministic
    literal-free cross-engine contract, the bootstrap_mean_ci trick
    applied to orderings) and credits each channel its marginal
    v(pre + channel) − v(pre); phi is the per-channel mean. Cost is R·k lookups into the SAME observed-
    coalition table ``vm`` the exact operator aggregates (shared
    ``_coalition_ctes`` / ``_session_coalitions`` — the fact collapses
    ONCE, everything downstream is R·k rows at any corpus scale and
    ANY k: no 2^k lattice ever materializes, which is the whole point).
    Per-channel terms accumulate through ONE ordered cumulative frame
    over replicate order (last row taken) so both engines add
    bit-identical doubles in identical order; with the permutation set
    exhaustive the estimator IS exact Shapley (telescoping), asserted
    row-level in tests/test_stats_invariants.py."""
    ev = t(spark, sf_dir, "events")
    channels = sorted(
        r[0]
        for r in ev.filter(F.col("event_type") != "purchase")
        .select("event_type")
        .distinct()
        .collect()
    )
    k = len(channels)
    R = SHAPLEY_SAMPLE_PERMS
    from pyspark.sql import Window

    u = spark.createDataFrame(
        [(ch, i) for i, ch in enumerate(channels)], "ch string, pos int"
    )
    vm = _session_coalitions(spark, ev, channels)
    # the R×k replicate grid is a driver literal (k and R are domain
    # constants — the exact operator's lattice pattern); a crossJoin of
    # two local relations would plan as a CartesianProduct node
    grid = spark.createDataFrame(
        [(r, ch, i) for r in range(R) for i, ch in enumerate(channels)],
        "r int, ch string, pos int",
    )
    key = F.md5(
        F.concat(
            F.lit(f"{SHAPLEY_SAMPLE_SALT}|"),
            F.col("r").cast("string"),
            F.lit("|"),
            F.col("ch"),
        )
    )
    perm = grid.select(
        "r",
        "ch",
        "pos",
        F.row_number()
        .over(Window.partitionBy("r").orderBy(key, F.col("ch")))
        .alias("rnk"),
    )
    w_pre = (
        Window.partitionBy("r")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = perm.select(
        "r",
        "ch",
        "pos",
        F.coalesce(
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), pos)")).over(w_pre),
            F.lit(0).cast("bigint"),
        ).alias("m0"),
    )
    v0 = vm.select(
        F.col("mask").alias("mask0"),
        (F.col("c_m") / F.col("n_m").cast("double")).alias("v0"),
    )
    v1 = vm.select(
        F.col("mask").alias("mask1"),
        (F.col("c_m") / F.col("n_m").cast("double")).alias("v1"),
    )
    tv = (
        pre.join(F.broadcast(v0), pre["m0"] == v0["mask0"], "left")
        .join(
            F.broadcast(v1),
            (pre["m0"] + F.expr("shiftleft(CAST(1 AS BIGINT), pos)"))
            == v1["mask1"],
            "left",
        )
        .select(
            "ch",
            "r",
            (
                F.coalesce(F.col("v1"), F.lit(0.0))
                - F.coalesce(F.col("v0"), F.lit(0.0))
            ).alias("term"),
        )
    )
    w_acc = Window.partitionBy("ch").orderBy("r").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    acc = tv.select(
        "ch",
        F.sum("term").over(w_acc).alias("s"),
        F.row_number()
        .over(Window.partitionBy("ch").orderBy(F.col("r").desc()))
        .alias("rn"),
    ).filter(F.col("rn") == 1)
    touched = _channels_touched(u, vm, k)
    return acc.join(touched, "ch").select(
        F.col("ch").alias("channel"),
        "n_sessions",
        F.lit(R).cast("bigint").alias("n_permutations"),
        (F.round(F.col("s") / F.lit(float(R)), 6) + 0.0).alias(
            "shapley_credit_sampled"
        ),
    )
