"""Statistical-testing and advanced-window queries (beyond-reference).

Round-8 additions extending the analytics layer (`plans/analytics.py`)
with the remaining classical inference tools a data-science workload
expects from an engine — two-sample distribution tests, robust trend
estimators, exponential smoothing, inter-rater agreement, time-decay
attribution, distribution-drift monitoring, interval RANGE window
frames, and nearest-neighbor (bidirectional) as-of joins.

Parity conventions as everywhere (`plans/catalog.py`): identical column
aliases, counts cast BIGINT, ratios rounded 6 (z-stats 4) as double on
both sides, durations in integer seconds — never float time math — and
every pairwise construction runs over an AGGREGATED (days/values) table
whose size is bounded regardless of fact cardinality, so the 100 TB
posture is pre-aggregate-then-pair, never fact².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dopams_etl_spark.plans.catalog import register, t


def _daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounded daily order revenue — the shared bounded (≤ |days|) input
    for the trend estimators below. Rounding BEFORE pairing keeps the
    pairwise arithmetic identical across engines. Undated or unpriced
    orders contribute no day: a NULL day rides the engines' opposite
    NULL sort through every row_number/lag/recursion downstream, and a
    NULL rev NaN-poisons the sequential folds (nullhalf census, r14) —
    one convention for all five daily-series estimators."""
    return (
        t(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull()
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )


_DAILY_SQL = """
    SELECT CAST(o_orderdate AS DATE) AS day,
           ROUND(SUM(o_totalprice), 2) AS rev
    FROM orders
    WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
    GROUP BY 1
"""


@register(
    "ks_test_two_sample",
    """
    WITH labeled AS (
      SELECT value AS s, event_type = 'purchase' AS y FROM events
      WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL),
    ps AS (SELECT s,
                  CAST(COUNT(*) FILTER (WHERE y) AS BIGINT) AS n1_s,
                  CAST(COUNT(*) FILTER (WHERE NOT y) AS BIGINT) AS n2_s
           FROM labeled GROUP BY s),
    tot AS (SELECT CAST(SUM(n1_s) AS DOUBLE) AS n1,
                   CAST(SUM(n2_s) AS DOUBLE) AS n2 FROM ps),
    e AS (SELECT SUM(n1_s) OVER (ORDER BY s) / n1 AS f1,
                 SUM(n2_s) OVER (ORDER BY s) / n2 AS f2,
                 n1, n2
          FROM ps CROSS JOIN tot)
    SELECT CAST(n1 AS BIGINT) AS n_purchase, CAST(n2 AS BIGINT) AS n_view,
           ROUND(MAX(ABS(f1 - f2)), 6) AS ks_stat
    FROM e GROUP BY n1, n2
    """,
)
def ks_test_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov two-sample statistic — are purchase and view
    values drawn from the same distribution? D = max |ECDF₁ − ECDF₂|,
    the distribution-free companion to mann_whitney_value_test (which
    only detects location shift; KS sees any shape difference). Scores
    collapse to per-distinct-value counts first, so the ECDFs are ONE
    ordered window over |distinct values| rows — never a sort of the raw
    fact — and max() reduces them to a single row. NULL scores are
    dropped on BOTH sides before the ECDF windows: a NULL carries no
    distribution information, and the engines would otherwise place it
    at opposite ends of the ordering (Spark windows sort NULLS FIRST,
    DuckDB NULLS LAST), skewing every cumulative fraction after it."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
        & F.col("value").isNotNull()
    )
    ps = (
        ev.select("value", (F.col("event_type") == "purchase").alias("y"))
        .groupBy(F.col("value").alias("s"))
        .agg(
            F.count_if(F.col("y")).alias("n1_s"),
            F.count_if(~F.col("y")).alias("n2_s"),
        )
    )
    tot = ps.agg(
        F.sum("n1_s").cast("double").alias("n1"),
        F.sum("n2_s").cast("double").alias("n2"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    # try_divide: a side with zero non-NULL scores gives n=0 — under
    # ANSI a bare / would crash the query where DuckDB quietly yields
    # the NULL-statistic row.
    e = ps.crossJoin(F.broadcast(tot)).select(
        F.try_divide(F.sum("n1_s").over(w), F.col("n1")).alias("f1"),
        F.try_divide(F.sum("n2_s").over(w), F.col("n2")).alias("f2"),
        "n1",
        "n2",
    )
    return e.groupBy("n1", "n2").agg(
        F.round(F.max(F.abs(F.col("f1") - F.col("f2"))), 6).alias("ks_stat")
    ).select(
        F.col("n1").cast("long").alias("n_purchase"),
        F.col("n2").cast("long").alias("n_view"),
        "ks_stat",
    )


@register(
    "theil_sen_daily_trend",
    f"""
    WITH d0 AS ({_DAILY_SQL}),
    d AS (SELECT * FROM d0
          WHERE day > (SELECT MAX(day) FROM d0) - INTERVAL 365 DAY),
    pairs AS (
      SELECT (b.rev - a.rev) / date_diff('day', a.day, b.day) AS slope
      FROM d a JOIN d b ON b.day > a.day)
    SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_days,
           -- + 0.0 canonicalizes IEEE -0.0 (sign-indefinite slope)
           ROUND(MEDIAN(slope), 6) + 0.0 AS sen_slope
    FROM pairs
    """,
)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator of the daily-revenue trend: the MEDIAN of all
    pairwise slopes — robust to ~29% outliers where OLS breaks on one
    bad day. The estimator runs over the TRAILING 365 days of the
    aggregated day table (the trend anyone acts on; also caps the pair
    space at 365²/2 ≈ 66k slopes — Spark's exact-median aggregate
    degrades past ~10⁶ buffered values, measured 14 s on a full
    2400-day pairing vs sub-second bounded); revenue is rounded before
    pairing so both engines divide identical numerators. The window
    bound is itself a one-row MAX broadcast."""
    d0 = _daily_revenue(spark, sf_dir)
    mx = d0.agg(F.max("day").alias("max_day"))
    d = d0.crossJoin(F.broadcast(mx)).filter(
        F.col("day") > F.date_sub(F.col("max_day"), 365)
    ).select("day", "rev")
    a = d.select(F.col("day").alias("da"), F.col("rev").alias("ra"))
    b = d.select(F.col("day").alias("db"), F.col("rev").alias("rb"))
    pairs = a.join(b, F.col("db") > F.col("da")).select(
        (
            (F.col("rb") - F.col("ra"))
            / F.datediff(F.col("db"), F.col("da"))
        ).alias("slope")
    )
    n = d.agg(F.count(F.lit(1)).alias("n_days"))
    return pairs.agg(
        # + 0.0 canonicalizes IEEE -0.0 (sign-indefinite slope)
        (F.round(F.median("slope"), 6) + 0.0).alias("sen_slope")
    ).crossJoin(F.broadcast(n)).select("n_days", "sen_slope")


@register(
    "mann_kendall_trend",
    f"""
    WITH d AS ({_DAILY_SQL}),
    s AS (SELECT CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
                               WHEN b.rev < a.rev THEN -1 ELSE 0 END)
                      AS BIGINT) AS s_stat
          FROM d a JOIN d b ON b.day > a.day),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM d)
    SELECT n_days, s_stat,
           ROUND(CASE WHEN s_stat > 0 THEN (s_stat - 1)
                           / sqrt(n_days*(n_days-1)*(2*n_days+5)/18.0)
                      WHEN s_stat < 0 THEN (s_stat + 1)
                           / sqrt(n_days*(n_days-1)*(2*n_days+5)/18.0)
                      ELSE 0.0 END, 4) + 0.0 AS z_stat
    FROM s CROSS JOIN n
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test on daily revenue: S = Σ
    sign(yⱼ−yᵢ) over ordered day pairs, normal-approximated with the
    standard continuity correction (no tie correction — rounded revenue
    ties are counted as 0 by sign() identically on both engines, and
    the variance formula is stated the same way on both sides). Like
    Theil–Sen, the pair space is the bounded day table."""
    d = _daily_revenue(spark, sf_dir)
    a = d.select(F.col("day").alias("da"), F.col("rev").alias("ra"))
    b = d.select(F.col("day").alias("db"), F.col("rev").alias("rb"))
    s = a.join(b, F.col("db") > F.col("da")).agg(
        F.sum(
            F.when(F.col("rb") > F.col("ra"), 1)
            .when(F.col("rb") < F.col("ra"), -1)
            .otherwise(0)
        ).alias("s_stat")
    )
    n = d.agg(F.count(F.lit(1)).alias("n_days"))
    joined = s.crossJoin(F.broadcast(n))
    nn = F.col("n_days")
    var = nn * (nn - 1) * (2 * nn + 5) / 18.0
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var))
        .otherwise(0.0)
    )
    # + 0.0 canonicalizes IEEE -0.0 (z is sign-indefinite)
    return joined.select(
        "n_days", "s_stat", (F.round(z, 4) + 0.0).alias("z_stat")
    )


@register(
    "ses_level_daily",
    f"""
    WITH d AS ({_DAILY_SQL}),
    idx AS (SELECT rev, row_number() OVER (ORDER BY day) AS rn,
                   COUNT(*) OVER () AS n
            FROM d)
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           ROUND(SUM(CASE WHEN rn = 1 THEN POWER(0.7, n - 1) * rev
                          ELSE 0.3 * POWER(0.7, n - rn) * rev END), 2)
             AS ses_level
    FROM idx
    """,
)
def ses_level_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple exponential smoothing (α=0.3) of daily revenue, CLOSED
    FORM: the recursion lₜ = αxₜ + (1−α)lₜ₋₁ unrolls to one weighted sum
    with geometric weights α(1−α)^(n−t) (and (1−α)^(n−1) on the seed
    l₁=x₁) — so the 'inherently sequential' smoother becomes a single
    parallel aggregate over the day table; weights beyond ~700 days
    underflow to 0 harmlessly. The forecast for any horizon is this
    final level."""
    d = _daily_revenue(spark, sf_dir)
    idx = d.select(
        "rev",
        F.row_number().over(Window.orderBy("day")).alias("rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    alpha = 0.3
    wt = F.when(
        F.col("rn") == 1, F.pow(F.lit(1 - alpha), F.col("n") - 1)
    ).otherwise(alpha * F.pow(F.lit(1 - alpha), F.col("n") - F.col("rn")))
    return idx.agg(
        F.max("n").cast("long").alias("n_days"),
        F.round(F.sum(wt * F.col("rev")), 2).alias("ses_level"),
    )


@register(
    "attribution_time_decay",
    """
    WITH p AS (SELECT event_id AS pid, user_id, ts AS pts FROM events
               WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts AS vts FROM events WHERE event_type = 'view'),
    touch AS (
      SELECT pid, date_diff('second', vts, pts) AS dsec
      FROM p JOIN v USING (user_id)
      WHERE vts < pts AND vts >= pts - INTERVAL 7 DAY),
    w AS (SELECT pid, dsec // 86400 AS days_before,
                 POWER(0.5, dsec / 86400.0) AS wt
          FROM touch),
    norm AS (SELECT days_before,
                    wt / SUM(wt) OVER (PARTITION BY pid) AS credit
             FROM w)
    SELECT CAST(days_before AS INT) AS days_before,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(SUM(credit), 4) AS credit
    FROM norm GROUP BY 1
    """,
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution (half-life = 1 day),
    completing the attribution family (first/last in
    attribution_first_vs_last, linear in multi_touch_attribution_linear):
    each view in the 7 days before a purchase earns weight 2^(−Δt/1d),
    normalized per purchase, credit aggregated by days-before-purchase.
    The purchase×view pairing is an equi-join on user_id with a range
    residual — per-user fan-out bounded by 7-day activity — and Δt is
    integer SECONDS on both engines (never float timestamp math), so
    the decay weights are bit-identical."""
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    dsec = F.col("pts").cast("long") - F.col("vts").cast("long")
    touch = p.join(v, F.col("pu") == F.col("vu")).filter(
        (F.col("vts") < F.col("pts"))
        & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 7 DAYS"))
    ).select("pid", dsec.alias("dsec"))
    w = touch.select(
        "pid",
        F.floor(F.col("dsec") / 86400).alias("days_before"),
        F.pow(F.lit(0.5), F.col("dsec") / 86400.0).alias("wt"),
    )
    norm = w.select(
        "days_before",
        (F.col("wt") / F.sum("wt").over(Window.partitionBy("pid"))).alias(
            "credit"
        ),
    )
    return norm.groupBy(
        F.col("days_before").cast("int").alias("days_before")
    ).agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.round(F.sum("credit"), 4).alias("credit"),
    )


@register(
    "precision_recall_deciles",
    """
    WITH labeled AS (
      SELECT value AS s, event_id,
             CAST(event_type = 'purchase' AS INT) AS y
      FROM events WHERE event_type IN ('purchase', 'view')),
    r AS (SELECT ntile(10) OVER (ORDER BY s DESC, event_id) AS decile, y
          FROM labeled),
    g AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS pos
          FROM r GROUP BY decile),
    c AS (SELECT decile, n, pos,
                 SUM(n) OVER (ORDER BY decile) AS cum_n,
                 SUM(pos) OVER (ORDER BY decile) AS cum_pos,
                 SUM(pos) OVER () AS tot_pos
          FROM g)
    SELECT CAST(decile AS INT) AS decile, n, pos,
           ROUND(cum_pos / CAST(cum_n AS DOUBLE), 6) AS precision_at,
           ROUND(cum_pos / CAST(tot_pos AS DOUBLE), 6) AS recall_at
    FROM c
    """,
)
def precision_recall_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall curve at score deciles — value as the ranking
    score, purchase as the positive class: the threshold-sweep
    evaluation that complements quality_score_auc (a scalar) and
    expected_calibration_error (probability quality). ntile runs over a
    DETERMINISTIC order (score desc, event_id) so tied scores split
    into the same deciles on both engines; the cumulative sums then run
    over exactly 10 rows."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    labeled = ev.select(
        F.col("value").alias("s"),
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    r = labeled.select(
        F.ntile(10)
        .over(Window.orderBy(F.col("s").desc(), F.col("event_id")))
        .alias("decile"),
        "y",
    )
    g = r.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "decile",
        "n",
        "pos",
        F.sum("n").over(wc).alias("cum_n"),
        F.sum("pos").over(wc).alias("cum_pos"),
        F.sum("pos").over(wt).alias("tot_pos"),
    )
    return c.select(
        F.col("decile").cast("int").alias("decile"),
        "n",
        "pos",
        F.round(F.col("cum_pos") / F.col("cum_n").cast("double"), 6).alias(
            "precision_at"
        ),
        F.round(F.col("cum_pos") / F.col("tot_pos").cast("double"), 6).alias(
            "recall_at"
        ),
    )


@register(
    "js_divergence_daily_drift",
    """
    WITH de AS (SELECT CAST(ts AS DATE) AS day, event_type,
                       CAST(COUNT(*) AS BIGINT) AS c
                FROM events GROUP BY 1, 2),
    days AS (SELECT day, CAST(SUM(c) AS DOUBLE) AS nd FROM de GROUP BY day),
    gtot AS (SELECT event_type, CAST(SUM(c) AS DOUBLE) AS cg FROM de
             GROUP BY event_type),
    gq AS (SELECT event_type, cg / (SELECT SUM(cg) FROM gtot) AS q FROM gtot),
    grid AS (
      SELECT d.day, d.nd, g.event_type, g.q,
             COALESCE(de.c, 0) / d.nd AS p
      FROM days d CROSS JOIN gq g
      LEFT JOIN de ON de.day = d.day AND de.event_type = g.event_type),
    terms AS (
      SELECT day, nd,
             CASE WHEN p > 0 THEN 0.5 * p * log2(p / ((p + q) / 2))
                  ELSE 0 END
             + 0.5 * q * log2(q / ((p + q) / 2)) AS term
      FROM grid)
    SELECT CAST(day AS VARCHAR) AS day, CAST(nd AS BIGINT) AS n_events,
           ROUND(SUM(term), 6) AS jsd
    FROM terms GROUP BY day, nd
    """,
)
def js_divergence_daily_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day Jensen–Shannon divergence of the event-type mix against
    the global mix — the bounded, symmetric drift monitor (JSD ∈ [0,1]
    in log₂) where population_stability_index and lang_char_divergence
    are unbounded KLs. The (day × type) grid is completed by a cross
    join of two TINY aggregates (days × 5 types) so zero-count cells
    contribute their exact limit (p·log p → 0, while the q-side term
    stays), and all probability math happens on per-grain aggregates,
    never fact rows."""
    ev = t(spark, sf_dir, "events")
    de = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    days = de.groupBy(F.col("day").alias("d_day")).agg(
        F.sum("c").cast("double").alias("nd")
    )
    glob = de.groupBy(F.col("event_type").alias("g_type")).agg(
        F.sum("c").cast("double").alias("cg")
    )
    tot = glob.agg(F.sum("cg").alias("tot"))
    gq = glob.crossJoin(F.broadcast(tot)).select(
        "g_type", (F.col("cg") / F.col("tot")).alias("q")
    )
    grid = (
        days.crossJoin(F.broadcast(gq))
        .join(
            de,
            (F.col("d_day") == F.col("day"))
            & (F.col("g_type") == F.col("event_type")),
            "left",
        )
        .select(
            F.col("d_day").alias("day"),
            "nd",
            "q",
            (F.coalesce(F.col("c"), F.lit(0)) / F.col("nd")).alias("p"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    term = (
        F.when(
            F.col("p") > 0, 0.5 * F.col("p") * F.log2(F.col("p") / m)
        ).otherwise(0.0)
        + 0.5 * F.col("q") * F.log2(F.col("q") / m)
    )
    return (
        grid.select("day", "nd", term.alias("term"))
        .groupBy("day", "nd")
        .agg(F.round(F.sum("term"), 6).alias("jsd"))
        # nullable date bridge: NULL-day group (null ts) surfaces as
        # VARCHAR on both sides, NULL staying NULL (catalog convention).
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("nd").cast("long").alias("n_events"),
            "jsd",
        )
    )


@register(
    "cohens_kappa_priority_value",
    """
    WITH m AS (SELECT MEDIAN(o_totalprice) AS med FROM orders),
    r AS (SELECT CAST(o_orderpriority IN ('1-URGENT', '2-HIGH') AS INT) AS a,
                 CAST(o_totalprice > med AS INT) AS b
          FROM orders CROSS JOIN m),
    c AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(a * b) AS DOUBLE) AS n11,
                 CAST(SUM(a * (1 - b)) AS DOUBLE) AS n10,
                 CAST(SUM((1 - a) * b) AS DOUBLE) AS n01,
                 CAST(SUM((1 - a) * (1 - b)) AS DOUBLE) AS n00
          FROM r)
    SELECT CAST(n AS BIGINT) AS n_orders,
           ROUND((n11 + n00) / n, 6) AS observed_agreement,
           -- + 0.0 canonicalizes IEEE -0.0 (kappa is sign-indefinite:
           -- agreement below chance is negative)
           -- NULLIF mirrors the Spark twin's try_divide: pe = 1 (every
           -- order in one agreement cell) makes kappa 0/0, which must be
           -- NULL on both engines regardless of DuckDB's
           -- float-division-by-zero setting
           ROUND(((n11 + n00) / n
                  - ((n11 + n10) * (n11 + n01)
                     + (n00 + n01) * (n00 + n10)) / (n * n))
                 / NULLIF(1 - ((n11 + n10) * (n11 + n01)
                               + (n00 + n01) * (n00 + n10)) / (n * n),
                          0.0), 6) + 0.0
             AS kappa
    FROM c
    """,
)
def cohens_kappa_priority_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two binary 'raters' of order importance —
    priority says urgent/high vs. totalprice says above-median —
    agreement corrected for chance (the metric behind annotator-quality
    gates in labeling pipelines). The median threshold is a one-row
    broadcast; the 2×2 contingency comes from one conditional-sum pass;
    kappa is closed-form on that single row. Both engines interpolate
    the even-count median identically."""
    o = t(spark, sf_dir, "orders")
    m = o.agg(F.median("o_totalprice").alias("med"))
    r = o.crossJoin(F.broadcast(m)).select(
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("int")
        .alias("a"),
        (F.col("o_totalprice") > F.col("med")).cast("int").alias("b"),
    )
    c = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("double").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("double").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("double").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("double").alias("n00"),
    )
    n, n11, n10, n01, n00 = (
        F.col("n"),
        F.col("n11"),
        F.col("n10"),
        F.col("n01"),
        F.col("n00"),
    )
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)) / (n * n)
    return c.select(
        n.cast("long").alias("n_orders"),
        F.round(po, 6).alias("observed_agreement"),
        # try_divide: pe = 1 would make the bare '/' ANSI-abort where
        # DuckDB's NULLIF yields NULL
        (F.round(F.try_divide(po - pe, 1 - pe), 6) + 0.0).alias("kappa"),
    )


@register(
    "trailing_week_range_frame",
    """
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                      ROUND(SUM(o_totalprice), 2) AS rev,
                      CAST(COUNT(*) AS BIGINT) AS n_orders
               FROM orders GROUP BY 1)
    SELECT CAST(day AS VARCHAR) AS day, rev,
           ROUND(SUM(rev) OVER (ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 2)
             AS rev_7d,
           CAST(SUM(n_orders) OVER (ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
                AS BIGINT) AS orders_7d
    FROM d
    """,
)
def trailing_week_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-calendar-day revenue via a RANGE window frame — the
    gap-aware rolling sum: where the rolling_* family's ROWS frames
    silently span calendar gaps (6 *rows* back may be 3 weeks back over
    sparse days), a RANGE frame bounds the window by VALUE distance.
    Spark expresses interval-RANGE as rangeBetween over the epoch-day
    ordinal (identical semantics to DuckDB's INTERVAL PRECEDING). The
    frame runs over the aggregated day table."""
    d = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .withColumn("day_ord", F.datediff(F.col("day"), F.lit("1970-01-01")))
    )
    w = Window.orderBy("day_ord").rangeBetween(-6, 0)
    # nullable date bridge: the NULL-day group (null o_orderdate)
    # surfaces as VARCHAR on both sides; its frame is itself on both
    # engines (NULL is its own RANGE peer group).
    return d.select(
        F.col("day").cast("string").alias("day"),
        "rev",
        F.round(F.sum("rev").over(w), 2).alias("rev_7d"),
        F.sum("n_orders").over(w).alias("orders_7d"),
    )


@register(
    "asof_nearest_tolerance_join",
    """
    WITH p AS (SELECT event_id AS pid, user_id, ts AS pts FROM events
               WHERE event_type = 'purchase'),
    v AS (SELECT event_id AS vid, user_id, ts AS vts FROM events
          WHERE event_type = 'view'),
    cand AS (
      SELECT pid, vid, ABS(date_diff('second', vts, pts)) AS adiff, vts
      FROM p JOIN v USING (user_id)
      WHERE vts BETWEEN pts - INTERVAL 30 MINUTE
                    AND pts + INTERVAL 30 MINUTE),
    best AS (SELECT pid, vid, adiff,
                    row_number() OVER (PARTITION BY pid
                                       ORDER BY adiff, vts, vid) AS rn
             FROM cand)
    SELECT pid AS purchase_id, vid AS view_id,
           CAST(adiff AS BIGINT) AS abs_seconds
    FROM best WHERE rn = 1
    """,
)
def asof_nearest_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-match as-of join with tolerance — for each purchase, the
    closest view event of the same user within ±30 minutes, either
    direction (asof_purchase_last_view is backward-only; 'nearest' is
    the sensor-alignment variant pandas calls merge_asof
    direction='nearest'). Candidates form through the user_id equi-join
    with the tolerance as a range residual (hash join, per-user fan-out
    bounded by 30-minute activity), then one row_number per purchase
    picks min |Δt| with earlier-then-id tie-breaks. Δt is integer
    seconds on both engines."""
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"),
        F.col("user_id").alias("vu"),
        F.col("ts").alias("vts"),
    )
    adiff = F.abs(F.col("pts").cast("long") - F.col("vts").cast("long"))
    cand = p.join(v, F.col("pu") == F.col("vu")).filter(
        (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("vts") <= F.col("pts") + F.expr("INTERVAL 30 MINUTES"))
    ).select("pid", "vid", adiff.alias("adiff"), "vts")
    w = Window.partitionBy("pid").orderBy("adiff", "vts", "vid")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("pid").alias("purchase_id"),
            F.col("vid").alias("view_id"),
            F.col("adiff").alias("abs_seconds"),
        )
    )


@register(
    "ols_value_trend_by_type",
    """
    WITH d AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS DOUBLE) AS x,
             value AS y
      FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           -- + 0.0 canonicalizes IEEE -0.0 (slope/intercept signed)
           ROUND(regr_slope(y, x), 6) + 0.0 AS slope,
           ROUND(regr_intercept(y, x), 4) + 0.0 AS intercept,
           ROUND(regr_r2(y, x), 6) AS r2
    FROM d GROUP BY event_type
    """,
)
def ols_value_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary least squares — slope/intercept/R² of event
    value against time for each event type, the classic GROUPED
    regression aggregate (DuckDB's regr_* family). Spark has no regr_*
    builtins, so the same closed forms are composed from the moment
    aggregates it does ship: slope = covar_pop/var_pop,
    intercept = ȳ − slope·x̄, R² = corr² — ONE hash aggregate per
    group either way, map-side partials, no window and no second pass.
    x is epoch-day as double on both engines (integer day arithmetic,
    never float timestamp math). Both sides drop NULL (x, y) pairs
    explicitly: DuckDB's regr_* aggregates exclude the whole pair when
    either side is NULL, while Spark's var_pop(x)/avg(x) would include
    x from NULL-y rows — the pre-filter makes the closed forms actually
    equivalent instead of coincidentally so on NULL-free data.
    Degenerate groups match regr_*'s measured edge cases exactly, and
    do it WITHOUT evaluating an expression that can blow up: under ANSI
    mode Spark's ``corr()`` and a bare ``/`` THROW DIVIDE_BY_ZERO on a
    zero-variance group (constant x, or a single-row group), where
    DuckDB's regr_* quietly return NULL — so slope uses try_divide and
    r² is stated in closed form try_divide(covar², var(x)·var(y))
    (algebraically corr², NULL on either zero variance) with the one
    regr_r2 special case guarded in front: var(y)=0 with var(x)>0 →
    1.0 (a constant y is perfectly 'explained')."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    d = ev.select(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
        .cast("double")
        .alias("x"),
        F.col("value").alias("y"),
    )
    slope = F.try_divide(F.covar_pop("y", "x"), F.var_pop("x"))
    r2 = F.when(
        (F.var_pop("y") == 0) & (F.var_pop("x") > 0), F.lit(1.0)
    ).otherwise(
        F.try_divide(
            F.pow(F.covar_pop("y", "x"), 2),
            F.var_pop("x") * F.var_pop("y"),
        )
    )
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        # + 0.0 canonicalizes IEEE -0.0 (slope/intercept signed)
        (F.round(slope, 6) + 0.0).alias("slope"),
        (F.round(F.avg("y") - slope * F.avg("x"), 4) + 0.0).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


@register(
    "fk_containment_profile",
    """
    WITH pairs(child_table, child_col, parent_table, parent_col) AS (
      VALUES ('lineitem', 'l_orderkey', 'orders', 'o_orderkey'),
             ('lineitem', 'l_partkey', 'part', 'p_partkey'),
             ('lineitem', 'l_suppkey', 'supplier', 's_suppkey'),
             ('orders', 'o_custkey', 'customer', 'c_custkey'),
             ('events', 'user_id', 'customer', 'c_custkey')),
    stats AS (
      SELECT 'lineitem' AS ct, 'l_orderkey' AS cc,
             CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_child,
             CAST(COUNT(DISTINCT CASE WHEN o_orderkey IS NOT NULL
                                      THEN l_orderkey END) AS BIGINT)
               AS n_contained
      FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      UNION ALL
      SELECT 'lineitem', 'l_partkey',
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT),
             CAST(COUNT(DISTINCT CASE WHEN p_partkey IS NOT NULL
                                      THEN l_partkey END) AS BIGINT)
      FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
      UNION ALL
      SELECT 'lineitem', 'l_suppkey',
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT),
             CAST(COUNT(DISTINCT CASE WHEN s_suppkey IS NOT NULL
                                      THEN l_suppkey END) AS BIGINT)
      FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
      UNION ALL
      SELECT 'orders', 'o_custkey',
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
             CAST(COUNT(DISTINCT CASE WHEN c_custkey IS NOT NULL
                                      THEN o_custkey END) AS BIGINT)
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      UNION ALL
      SELECT 'events', 'user_id',
             CAST(COUNT(DISTINCT user_id) AS BIGINT),
             CAST(COUNT(DISTINCT CASE WHEN c_custkey IS NOT NULL
                                      THEN user_id END) AS BIGINT)
      FROM events LEFT JOIN customer ON user_id = c_custkey)
    SELECT p.child_table, p.child_col, p.parent_table, p.parent_col,
           s.n_child, s.n_contained,
           -- NULLIF: an empty child table (n_child = 0) profiles as NULL
           -- containment, matching the engine's try_divide
           ROUND(s.n_contained / NULLIF(CAST(s.n_child AS DOUBLE), 0), 6)
             AS containment
    FROM pairs p JOIN stats s
      ON p.child_table = s.ct AND p.child_col = s.cc
    """,
)
def fk_containment_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key containment profiling — for each declared candidate
    (child column → parent key) pair, what fraction of distinct child
    values exists in the parent: the data-profiling primitive behind FK
    discovery, referential-integrity monitoring, and join-cardinality
    sanity checks (containment 1.0 = clean FK; the events.user_id →
    customer pair is the intentional negative control). Each pair is
    ONE distinct-count over a left join keyed on the candidate column —
    a keyed shuffle per pair, fan-out bounded by the declared pair
    list, never a column-pair cross product."""
    pairs = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("events", "user_id", "customer", "c_custkey"),
    ]
    outs = []
    for ct, cc, pt, pc in pairs:
        child = t(spark, sf_dir, ct).select(cc)
        parent = t(spark, sf_dir, pt).select(pc)
        joined = child.join(parent, F.col(cc) == F.col(pc), "left")
        outs.append(
            joined.agg(
                F.countDistinct(cc).alias("n_child"),
                F.countDistinct(
                    F.when(F.col(pc).isNotNull(), F.col(cc))
                ).alias("n_contained"),
            ).select(
                F.lit(ct).alias("child_table"),
                F.lit(cc).alias("child_col"),
                F.lit(pt).alias("parent_table"),
                F.lit(pc).alias("parent_col"),
                "n_child",
                "n_contained",
                # try_divide: an empty child table has n_child = 0 — NULL
                # containment like the oracle, not an ANSI abort
                F.round(
                    F.try_divide(
                        F.col("n_contained"), F.col("n_child").cast("double")
                    ),
                    6,
                ).alias("containment"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


@register(
    "user_active_day_streaks",
    """
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                FROM events),
    g AS (SELECT user_id, day,
                 date_diff('day', DATE '1970-01-01', day)
                   - row_number() OVER (PARTITION BY user_id ORDER BY day)
                   AS grp
          FROM ud),
    streaks AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len,
                       MIN(day) AS streak_start
                FROM g GROUP BY user_id, grp)
    SELECT user_id, MAX(len) AS max_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           MIN(streak_start) AS first_active_day
    FROM streaks GROUP BY user_id
    """,
)
def user_active_day_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-active-day streak per user
    — THE classic SQL islands construction (epoch-day minus
    row_number is constant within a consecutive run), the engagement
    metric behind daily-streak features. One distinct-day reduction,
    one per-user window (each user sorts only its own days), two
    bounded aggregates; integer day arithmetic throughout."""
    ev = t(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = ud.select(
        "user_id",
        "day",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01"))
            - F.row_number().over(w)
        ).alias("grp"),
    )
    streaks = g.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"), F.min("day").alias("streak_start")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("max_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.min("streak_start").alias("first_active_day"),
    )


@register(
    "customer_golden_record",
    """
    WITH o2 AS (
      SELECT o_custkey, o_orderstatus, o_totalprice, o_orderdate,
             NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS pri,
             CAST(o_orderdate AS DATE) AS vday, o_orderkey AS vkey
      FROM orders)
    SELECT c_custkey, c_name,
           first(o_orderstatus ORDER BY vday DESC, vkey DESC)
             AS last_status,
           first(pri ORDER BY vday DESC, vkey DESC)
             FILTER (WHERE pri IS NOT NULL) AS last_known_priority,
           CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR) AS first_order_day,
           CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) AS last_order_day,
           ROUND(SUM(o_totalprice), 2) AS lifetime_value,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM customer JOIN o2 ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def customer_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship 'golden record' construction — the MDM primitive
    the reference's smart-merge family feeds: per entity, each field
    survives by its OWN rule (most-recent value for status,
    most-recent NON-NULL for priority — '4-NOT SPECIFIED' is treated
    as missing, so a customer whose latest order left it unspecified
    keeps the last real priority, earliest/latest for dates, sum for
    lifetime value). Field-level arg_max over the composite version
    TUPLE (order day, orderkey tie-break): Spark max_by over a struct
    and DuckDB's ordered first() both compare lexicographically, so
    the key is unique and monotone at ANY scale — unlike the earlier
    day*1e8+key integer packing, which silently inverted once
    orderkeys crossed 1e8 (TPC-H reaches that near SF 17). ONE hash
    aggregate per entity, never a self-join per field."""
    o = t(spark, sf_dir, "orders")
    o2 = o.select(
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).alias(
            "pri"
        ),
        F.struct(
            F.col("o_orderdate").cast("date").alias("vday"),
            F.col("o_orderkey").alias("vkey"),
        ).alias("ver"),
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        c.join(o2, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.max_by("o_orderstatus", "ver").alias("last_status"),
            F.max_by(
                "pri", F.when(F.col("pri").isNotNull(), F.col("ver"))
            ).alias("last_known_priority"),
            # nullable date bridge: an all-null-date customer surfaces
            # NULL first/last day as VARCHAR on both sides.
            F.min(F.col("o_orderdate").cast("date"))
            .cast("string")
            .alias("first_order_day"),
            F.max(F.col("o_orderdate").cast("date"))
            .cast("string")
            .alias("last_order_day"),
            F.round(F.sum("o_totalprice"), 2).alias("lifetime_value"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "markov_next_event_accuracy",
    """
    WITH seq AS (SELECT user_id, event_type,
                        lag(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS prev
                 FROM events
                 -- shared null conventions: an un-timestamped event has
                 -- no sequence position; an untyped event can neither
                 -- be predicted nor scored
                 WHERE ts IS NOT NULL AND event_type IS NOT NULL),
    trans AS (SELECT prev, event_type AS next,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
    pred AS (SELECT prev, next AS predicted,
                    row_number() OVER (PARTITION BY prev
                                       ORDER BY cnt DESC, next) AS rn
             FROM trans),
    p1 AS (SELECT prev, predicted FROM pred WHERE rn = 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_transitions,
           ROUND(SUM(CASE WHEN s.event_type = p1.predicted
                          THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS top1_accuracy
    FROM seq s JOIN p1 ON s.prev = p1.prev
    """,
)
def markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 accuracy of the first-order Markov next-event predictor —
    the evaluation half of event_transition_matrix: predict each
    transition's next event as the modal successor of its predecessor
    (ties broken alphabetically, deterministic on both engines) and
    score against what actually happened. In-sample by design (the
    resubstitution baseline every sequence model must beat). The
    |event_types|-row predictor broadcasts back over the transitions;
    everything else is the same one lag window."""
    # shared null conventions: un-timestamped events have no sequence
    # position; untyped events can neither be predicted nor scored
    ev = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    trans = seq.groupBy("prev", F.col("event_type").alias("next")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wp = Window.partitionBy("prev").orderBy(
        F.col("cnt").desc(), F.col("next")
    )
    p1 = (
        trans.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select(F.col("prev").alias("p_prev"), F.col("next").alias("predicted"))
    )
    joined = seq.join(F.broadcast(p1), F.col("prev") == F.col("p_prev"))
    return joined.agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.round(
            F.sum(
                F.when(F.col("event_type") == F.col("predicted"), 1).otherwise(0)
            )
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("top1_accuracy"),
    )


@register(
    "running_distinct_parts_per_customer",
    """
    WITH li AS (
      SELECT o_custkey, o_orderdate, o_orderkey, l_partkey
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    flagged AS (
      SELECT o_custkey, o_orderdate, o_orderkey,
             -- NULLS FIRST states Spark's ASC shape: an undated order
             -- sorts before recorded history (live no-op)
             CASE WHEN row_number() OVER (
                    PARTITION BY o_custkey, l_partkey
                    ORDER BY o_orderdate NULLS FIRST, o_orderkey, l_partkey) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM li),
    per_order AS (
      SELECT o_custkey, o_orderdate, o_orderkey,
             CAST(SUM(first_seen) AS BIGINT) AS new_parts
      FROM flagged GROUP BY 1, 2, 3)
    SELECT o_custkey, o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_day,
           new_parts,
           CAST(SUM(new_parts) OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate NULLS FIRST, o_orderkey) AS BIGINT)
             AS distinct_parts_to_date
    FROM per_order
    """,
)
def running_distinct_parts_per_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — the aggregate SQL
    forbids in a window frame, rebuilt with the classic first-seen
    construction: flag each (customer, part)'s chronologically first
    purchase with row_number, then a plain running SUM of flags equals
    the cumulative distinct-part count at every order. Two keyed
    windows (per customer-part, then per customer) — no
    quadratic re-scan of history per row, which is what the naive
    'COUNT(DISTINCT) OVER' would need and why engines reject it."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    w_first = Window.partitionBy("o_custkey", "l_partkey").orderBy(
        "o_orderdate", "o_orderkey", "l_partkey"
    )
    flagged = j.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias(
            "first_seen"
        ),
    )
    per_order = flagged.groupBy(
        "o_custkey", "o_orderdate", "o_orderkey"
    ).agg(F.sum("first_seen").alias("new_parts"))
    w_run = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    ).rowsBetween(Window.unboundedPreceding, 0)
    return per_order.select(
        "o_custkey",
        "o_orderkey",
        # nullable date bridge: VARCHAR on both sides, NULL stays NULL
        F.col("o_orderdate").cast("date").cast("string").alias("order_day"),
        "new_parts",
        F.sum("new_parts").over(w_run).alias("distinct_parts_to_date"),
    )


@register(
    "allocate_order_totals",
    """
    WITH base AS (
      -- CAST DOUBLE first (r14 f32 census): the share division and its
      -- FLOOR/frac split must run in the same lane on both engines
      SELECT l_orderkey, l_linenumber,
             CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT) AS total_cents,
             CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
             SUM(CAST(l_extendedprice AS DOUBLE))
               OVER (PARTITION BY l_orderkey) AS order_ext
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderkey % 97 = 0),
    shares AS (
      SELECT l_orderkey, l_linenumber, total_cents,
             FLOOR(total_cents * l_extendedprice / order_ext) AS floor_cents,
             total_cents * l_extendedprice / order_ext
               - FLOOR(total_cents * l_extendedprice / order_ext) AS frac
      FROM base),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY frac DESC, l_linenumber) AS rnk,
             total_cents - CAST(SUM(floor_cents) OVER (PARTITION BY l_orderkey)
                                AS BIGINT) AS shortfall
      FROM shares)
    SELECT l_orderkey, CAST(l_linenumber AS INT) AS linenumber,
           CAST(CAST(floor_cents AS BIGINT)
                + CASE WHEN rnk <= shortfall THEN 1 ELSE 0 END
                AS VARCHAR) AS allocated_cents
    FROM ranked
    """,
)
def allocate_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder allocation — split each order's total price
    across its line items proportionally to extended price so the
    integer-cent pieces SUM EXACTLY to the total (the invoice/
    settlement requirement a naive per-row ROUND violates by ±n/2
    cents): floor every share, then hand the remaining cents to the
    largest fractional parts with a deterministic line-number
    tie-break. All windows key on the order — bounded frames at any
    scale; the 1-in-97 order sample keeps the gate row count honest
    without changing the plan shape. Cents stringified per the exact-
    money convention."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    # cast("double") at first use (r14 f32 census) — see the oracle note
    ext = F.col("l_extendedprice").cast("double")
    base = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("o_totalprice").cast("double") * 100)
        .cast("long")
        .alias("total_cents"),
        ext.alias("l_extendedprice"),
        F.sum(ext).over(Window.partitionBy("l_orderkey")).alias("order_ext"),
    )
    raw = F.col("total_cents") * F.col("l_extendedprice") / F.col("order_ext")
    shares = base.select(
        "l_orderkey",
        "l_linenumber",
        "total_cents",
        F.floor(raw).alias("floor_cents"),
        (raw - F.floor(raw)).alias("frac"),
    )
    w_rank = Window.partitionBy("l_orderkey").orderBy(
        F.col("frac").desc(), F.col("l_linenumber")
    )
    w_sum = Window.partitionBy("l_orderkey")
    ranked = shares.select(
        "l_orderkey",
        "l_linenumber",
        "floor_cents",
        F.row_number().over(w_rank).alias("rnk"),
        (
            F.col("total_cents")
            - F.sum("floor_cents").over(w_sum).cast("long")
        ).alias("shortfall"),
    )
    return ranked.select(
        "l_orderkey",
        F.col("l_linenumber").cast("int").alias("linenumber"),
        (
            F.col("floor_cents").cast("long")
            + F.when(F.col("rnk") <= F.col("shortfall"), 1).otherwise(0)
        )
        .cast("string")
        .alias("allocated_cents"),
    )


@register(
    "capped_running_balance",
    """
    WITH RECURSIVE o2 AS (
      SELECT o_custkey AS custkey,
             -- COALESCE: an order with no total moves the balance by 0
             -- (a NULL delta would poison the whole remaining fold)
             COALESCE(CASE WHEN o_orderstatus = 'O' THEN o_totalprice
                           ELSE -o_totalprice END, 0.0) AS delta,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY CAST(o_orderdate AS DATE),
                                         o_orderkey) AS rn
      FROM orders),
    r AS (
      SELECT custkey, rn, GREATEST(0.0, delta) AS bal,
             CASE WHEN delta < 0 THEN 1 ELSE 0 END AS hits
      FROM o2 WHERE rn = 1
      UNION ALL
      SELECT o2.custkey, o2.rn, GREATEST(0.0, r.bal + o2.delta),
             r.hits + CASE WHEN r.bal + o2.delta < 0 THEN 1 ELSE 0 END
      FROM r JOIN o2 ON o2.custkey = r.custkey AND o2.rn = r.rn + 1)
    SELECT custkey, CAST(MAX(rn) AS BIGINT) AS n_orders,
           ROUND(arg_max(bal, rn), 2) AS final_balance,
           CAST(arg_max(hits, rn) AS BIGINT) AS n_floor_hits
    FROM r GROUP BY custkey
    """,
)
def capped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-clamped running balance per customer — open orders ('O')
    accrue credit, finished/pending ones draw it down, and the balance
    can never go below zero: balₜ = max(0, balₜ₋₁ + Δₜ). The clamp
    makes this NON-LINEAR — no window frame or prefix-sum identity
    exists (unlike a plain running SUM), which is exactly the class of
    per-key sequential state Spark expresses on the Python side. Cost
    is one keyed shuffle + a linear pass per customer's own history —
    the same posture as any window, with no cross-key state. The oracle
    states the identical recursion as a recursive CTE, so the driver
    proves the sequential fold, clamp tests, and tie-breaks match
    exactly (additions happen in the same order on both engines →
    identical doubles). Floor hits count the clamped steps (an order
    the credit couldn't cover).

    r15 optimization (guide §4.1/§4.5): the per-group ``applyInPandas``
    fold invoked Python once per customer (15k calls at sf0.1, each
    building a 1-row pandas frame — 16.6s of pure call overhead). Same
    shuffle, same per-group addition order, now ONE ``mapInPandas``
    streaming fold over repartition(custkey) + sortWithinPartitions:
    groups are contiguous within a sorted partition, state carries
    across Arrow batch boundaries, results stay bit-identical because
    every group folds the same doubles in the same order."""
    import numpy as np
    import pandas as pd

    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").cast("date").alias("oday"),
        "o_orderkey",
        # COALESCE: an order with no total moves the balance by 0 (a
        # NULL delta would poison the whole remaining pandas fold)
        F.coalesce(
            F.when(
                F.col("o_orderstatus") == "O", F.col("o_totalprice")
            ).otherwise(-F.col("o_totalprice")),
            F.lit(0.0),
        ).alias("delta"),
    )

    def fold_stream(batches):
        cur = None
        bal, hits, n = 0.0, 0, 0
        keys: list = []
        counts: list = []
        bals: list = []
        hit_counts: list = []
        for pdf in batches:
            ck = pdf["custkey"].to_numpy()
            dl = pdf["delta"].to_numpy()
            for k, d in zip(ck, dl):
                if cur is None:
                    cur = k
                elif k != cur:
                    keys.append(cur)
                    counts.append(n)
                    bals.append(bal)
                    hit_counts.append(hits)
                    cur, bal, hits, n = k, 0.0, 0, 0
                nxt = bal + d
                if nxt < 0:
                    hits += 1
                    bal = 0.0
                else:
                    bal = nxt
                n += 1
            if keys:  # flush finished groups per input batch
                yield pd.DataFrame(
                    {
                        "custkey": np.asarray(keys, dtype="int64"),
                        "n_orders": np.asarray(counts, dtype="int64"),
                        "bal_raw": np.asarray(bals, dtype="float64"),
                        "n_floor_hits": np.asarray(hit_counts, dtype="int64"),
                    }
                )
                keys, counts, bals, hit_counts = [], [], [], []
        if cur is not None:
            yield pd.DataFrame(
                {
                    "custkey": np.asarray([cur], dtype="int64"),
                    "n_orders": np.asarray([n], dtype="int64"),
                    "bal_raw": np.asarray([bal], dtype="float64"),
                    "n_floor_hits": np.asarray([hits], dtype="int64"),
                }
            )

    # rounding happens JVM-side (F.round, like every other query) so the
    # parity surface never sees Python's banker's rounding
    return o.repartition("custkey").sortWithinPartitions(
        "custkey", "oday", "o_orderkey"
    ).mapInPandas(
        fold_stream,
        "custkey long, n_orders long, bal_raw double, n_floor_hits long",
    ).select(
        "custkey",
        "n_orders",
        F.round("bal_raw", 2).alias("final_balance"),
        "n_floor_hits",
    )


@register(
    "spearman_qty_discount_by_flag",
    """
    WITH g AS (
      SELECT l_returnflag AS flag, l_quantity AS q, l_discount AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2, 3),
    qr AS (
      SELECT flag, q,
             SUM(nq) OVER (PARTITION BY flag ORDER BY q)
               - nq + (nq + 1) / 2.0 AS rq
      FROM (SELECT flag, q, SUM(n) AS nq FROM g GROUP BY 1, 2)),
    dr AS (
      SELECT flag, d,
             SUM(nd) OVER (PARTITION BY flag ORDER BY d)
               - nd + (nd + 1) / 2.0 AS rd
      FROM (SELECT flag, d, SUM(n) AS nd FROM g GROUP BY 1, 2)),
    j AS (SELECT g.flag, g.n, qr.rq, dr.rd
          FROM g JOIN qr ON g.flag = qr.flag AND g.q = qr.q
                 JOIN dr ON g.flag = dr.flag AND g.d = dr.d),
    m AS (SELECT flag, CAST(SUM(n) AS DOUBLE) AS nn,
                 SUM(n * rq) AS sx, SUM(n * rd) AS sy,
                 SUM(n * rq * rq) AS sxx, SUM(n * rd * rd) AS syy,
                 SUM(n * rq * rd) AS sxy
          FROM j GROUP BY flag)
    SELECT flag AS l_returnflag, CAST(nn AS BIGINT) AS n,
           -- + 0.0 canonicalizes IEEE -0.0 (correlation is signed)
           ROUND((nn * sxy - sx * sy)
                 / sqrt((nn * sxx - sx * sx) * (nn * syy - sy * sy)), 6) + 0.0
             AS spearman
    FROM m
    """,
)
def spearman_qty_discount_by_flag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spearman rank correlation (quantity vs discount per return flag)
    — the tie-aware rank statistic, computed WITHOUT ranking the fact
    table: both variables are low-cardinality (50 quantities, 11
    discounts), so the average tied rank of each value falls out of the
    grouped counts (rows-below + (ties+1)/2), and Pearson over the
    weighted (value-pair, count) table is Spearman exactly. One hash
    aggregate over the fact; every window runs on the ≤|flag|·|values|
    summary — the naive per-row RANK() would instead sort the whole
    fact into 3 giant flag partitions. Formula stated identically on
    both engines (sample-vs-population normalizers cancel in the
    ratio)."""
    li = t(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("q"),
        F.col("l_discount").alias("d"),
    ).agg(F.count(F.lit(1)).alias("n"))

    def avg_ranks(col: str, out: str) -> DataFrame:
        per_val = g.groupBy("flag", col).agg(F.sum("n").alias("nv"))
        w = Window.partitionBy("flag").orderBy(col)
        return per_val.select(
            "flag",
            col,
            (
                F.sum("nv").over(w) - F.col("nv")
                + (F.col("nv") + 1) / 2.0
            ).alias(out),
        )

    j = (
        g.join(avg_ranks("q", "rq"), ["flag", "q"])
        .join(avg_ranks("d", "rd"), ["flag", "d"])
    )
    m = j.groupBy("flag").agg(
        F.sum("n").cast("double").alias("nn"),
        F.sum(F.col("n") * F.col("rq")).alias("sx"),
        F.sum(F.col("n") * F.col("rd")).alias("sy"),
        F.sum(F.col("n") * F.col("rq") * F.col("rq")).alias("sxx"),
        F.sum(F.col("n") * F.col("rd") * F.col("rd")).alias("syy"),
        F.sum(F.col("n") * F.col("rq") * F.col("rd")).alias("sxy"),
    )
    num = F.col("nn") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("nn") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("nn") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    # try_divide: a group with zero rank variance on either variable
    # (every row one value) has den = 0 — NULL spearman like DuckDB,
    # not an ANSI DIVIDE_BY_ZERO abort.
    return m.select(
        F.col("flag").alias("l_returnflag"),
        F.col("nn").cast("long").alias("n"),
        # + 0.0 canonicalizes IEEE -0.0 (correlation is signed)
        (F.round(F.try_divide(num, den), 6) + 0.0).alias("spearman"),
    )


@register(
    "grouped_median_via_counts",
    """
    WITH g AS (
      SELECT l_returnflag AS flag, l_extendedprice AS v,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2),
    c AS (
      SELECT flag, v, n,
             SUM(n) OVER (PARTITION BY flag ORDER BY v) AS cum,
             CAST(SUM(n) OVER (PARTITION BY flag) AS BIGINT) AS total
      FROM g),
    hit AS (
      SELECT flag, total,
             MAX(CASE WHEN cum - n < (total + 1) // 2
                       AND (total + 1) // 2 <= cum THEN v END) AS lo,
             MAX(CASE WHEN cum - n < (total + 2) // 2
                       AND (total + 2) // 2 <= cum THEN v END) AS hi
      FROM c GROUP BY flag, total)
    SELECT flag AS l_returnflag, total AS n,
           (lo + hi) / 2.0 AS median_price
    FROM hit
    """,
)
def grouped_median_via_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT grouped median that scales: Spark's percentile/median
    aggregate buffers every value per group (measured degrading past
    ~10⁶ buffered values — the reason theil_sen bounds its pair table),
    so the k-th-element is instead located on GROUPED VALUE COUNTS: one
    hash aggregate compresses the fact to distinct (group, value) rows,
    a cumulative-count window finds the rows straddling positions
    ⌊(n+1)/2⌋ and ⌈(n+1)/2⌉, and the even-count median is their mean —
    identical to DuckDB's MEDIAN. State is bounded by DISTINCT values
    (prices have cent grain), never raw row count, and the window sorts
    only the per-group distinct-value table. The median is emitted
    UNROUNDED: lo, hi, and their midpoint are bit-identical doubles on
    both engines (single add + divide, no order-dependent sum), whereas
    ROUND(x, 2) at the half-cent boundary the midpoint routinely hits
    disagrees between engines (DuckDB multiplies-then-rounds:
    round(52724.2449…, 2) → .25 there, .24 in Spark)."""
    li = t(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("flag").orderBy("v")
    c = g.select(
        "flag",
        "v",
        "n",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(
            Window.partitionBy("flag").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    lo_pos = F.floor((F.col("total") + 1) / 2)
    hi_pos = F.floor((F.col("total") + 2) / 2)
    prev = F.col("cum") - F.col("n")
    hit = c.groupBy("flag", "total").agg(
        F.max(
            F.when((prev < lo_pos) & (lo_pos <= F.col("cum")), F.col("v"))
        ).alias("lo"),
        F.max(
            F.when((prev < hi_pos) & (hi_pos <= F.col("cum")), F.col("v"))
        ).alias("hi"),
    )
    return hit.select(
        F.col("flag").alias("l_returnflag"),
        F.col("total").cast("long").alias("n"),
        ((F.col("lo") + F.col("hi")) / 2.0).alias("median_price"),
    )


@register(
    "holt_linear_daily",
    f"""
    WITH RECURSIVE d AS ({_DAILY_SQL}),
    idx AS (SELECT rev, row_number() OVER (ORDER BY day) AS rn FROM d),
    h AS (
      SELECT 1 AS rn, (SELECT rev FROM idx WHERE rn = 1) AS l,
             (SELECT rev FROM idx WHERE rn = 2)
               - (SELECT rev FROM idx WHERE rn = 1) AS b
      UNION ALL
      SELECT h.rn + 1,
             0.3 * i.rev + 0.7 * (h.l + h.b),
             0.1 * ((0.3 * i.rev + 0.7 * (h.l + h.b)) - h.l) + 0.9 * h.b
      FROM h JOIN idx i ON i.rn = h.rn + 1)
    -- + 0.0 canonicalizes IEEE -0.0 (trend is sign-indefinite)
    SELECT CAST(MAX(rn) AS BIGINT) AS n_days,
           ROUND(arg_max(l, rn), 2) AS level,
           ROUND(arg_max(b, rn), 4) + 0.0 AS trend,
           ROUND(arg_max(l, rn) + 7 * arg_max(b, rn), 2) AS forecast_7d
    FROM h
    HAVING (SELECT COUNT(*) FROM d) > 0
    """,
)
def holt_linear_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double exponential) smoothing of daily revenue —
    the trend-aware sibling of ses_level_daily. The COUPLED recursion
    lₜ = αxₜ + (1−α)(lₜ₋₁+bₜ₋₁), bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁ has no
    single-weighted-sum unrolling (unlike plain SES), so it runs as a
    sequential fold over the DAY table — bounded by calendar days at
    any fact scale, the same boundedness argument as theil_sen — via a
    singleton-group ``applyInPandas``. The oracle states the identical
    recursion as a recursive CTE; both engines apply the same float
    ops in the same order, so the driver compares exact doubles.
    α=0.3, β=0.1; seed l₁=x₁, b₁=x₂−x₁; forecast_7d = l + 7b."""
    import pandas as pd

    d = _daily_revenue(spark, sf_dir)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        xs = pdf["rev"].tolist()
        if len(xs) < 2:
            # the b₁=x₂−x₁ seed needs two days; mirror the oracle's
            # degenerate row (level = x₁, trend/forecast NULL)
            return pd.DataFrame(
                {"n_days": [len(xs)], "l_raw": [xs[0]], "b_raw": [None]}
            )
        lvl, tr = xs[0], xs[1] - xs[0]
        for x in xs[1:]:
            new_lvl = 0.3 * x + 0.7 * (lvl + tr)
            tr = 0.1 * (new_lvl - lvl) + 0.9 * tr
            lvl = new_lvl
        return pd.DataFrame(
            {"n_days": [len(xs)], "l_raw": [lvl], "b_raw": [tr]}
        )

    # rounding happens JVM-side (F.round, like every other query) so the
    # parity surface never sees Python's banker's rounding
    return (
        d.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(fold, "n_days long, l_raw double, b_raw double")
        .select(
            "n_days",
            F.round("l_raw", 2).alias("level"),
            # + 0.0 canonicalizes IEEE -0.0 (trend is sign-indefinite)
            (F.round("b_raw", 4) + 0.0).alias("trend"),
            F.round(F.col("l_raw") + 7 * F.col("b_raw"), 2).alias(
                "forecast_7d"
            ),
        )
    )


@register(
    "mahalanobis_customer_outliers",
    """
    WITH cust AS (
      SELECT o_custkey AS custkey,
             CAST(COUNT(*) AS DOUBLE) AS x,
             -- CAST DOUBLE first (r14 f32 census) — matches the widened
             -- money_cents scaling lane
             CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS y
      FROM orders GROUP BY 1),
    m AS (SELECT AVG(x) AS mx, AVG(y) AS my,
                 var_pop(x) AS vx, var_pop(y) AS vy,
                 covar_pop(y, x) AS cxy
          FROM cust),
    d AS (SELECT custkey, x, y,
                 ((x - mx) * (x - mx) * vy
                  - 2 * (x - mx) * (y - my) * cxy
                  + (y - my) * (y - my) * vx)
                   / (vx * vy - cxy * cxy) AS d2
          FROM cust CROSS JOIN m)
    SELECT custkey, CAST(x AS BIGINT) AS n_orders,
           ROUND(y, 2) AS total_spend, ROUND(d2, 4) AS mahalanobis_sq
    FROM d WHERE d2 > 9.21
    """,
)
def mahalanobis_customer_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multivariate outlier detection: customers whose (order count,
    total spend) pair sits outside the 99% chi-square ellipse
    (Mahalanobis d² > 9.21, χ²₂ 0.99) — catches the 'few huge orders'
    and 'many tiny orders' shapes a univariate z-score on either axis
    misses. The 2×2 covariance inverts in closed form, so the whole
    thing is ONE customer aggregate + a one-row moment broadcast +
    per-row arithmetic — no MLlib, no iteration. Spend summed as exact
    cents before the double moments; the fixed threshold (not a top-k)
    keeps membership stable against last-ulp moment differences."""
    o = t(spark, sf_dir, "orders")
    from dopams_etl_spark.functions.money import money_cents

    cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).cast("double").alias("x"),
        (F.sum(money_cents("o_totalprice")).cast("double") / 100.0).alias(
            "y"
        ),
    )
    m = cust.agg(
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_pop("x").alias("vx"),
        F.var_pop("y").alias("vy"),
        F.covar_pop("y", "x").alias("cxy"),
    )
    dx = F.col("x") - F.col("mx")
    dy = F.col("y") - F.col("my")
    det = F.col("vx") * F.col("vy") - F.col("cxy") * F.col("cxy")
    # try_divide: a singular covariance (all customers identical, or
    # spend exactly collinear with count) has det = 0 — d² NULL and
    # zero output rows on BOTH engines, not an ANSI abort.
    d2 = F.try_divide(
        dx * dx * F.col("vy") - 2 * dx * dy * F.col("cxy")
        + dy * dy * F.col("vx"),
        det,
    )
    return (
        cust.crossJoin(F.broadcast(m))
        .withColumn("d2", d2)
        .filter(F.col("d2") > 9.21)
        .select(
            "custkey",
            F.col("x").cast("long").alias("n_orders"),
            F.round("y", 2).alias("total_spend"),
            F.round("d2", 4).alias("mahalanobis_sq"),
        )
    )


@register(
    "revenue_max_drawdown",
    f"""
    WITH d AS ({_DAILY_SQL}),
    c AS (SELECT day,
                 SUM(rev) OVER (ORDER BY day) AS cum
          FROM d),
    dd AS (SELECT day, cum,
                  MAX(cum) OVER (ORDER BY day) AS peak,
                  MAX(cum) OVER (ORDER BY day) - cum AS drawdown
           FROM c),
    top AS (SELECT *, row_number() OVER (ORDER BY drawdown DESC, day ASC)
                        AS rn
            FROM dd)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days,
           day AS trough_day,
           ROUND(peak, 2) AS peak_cum,
           ROUND(cum, 2) AS trough_cum,
           ROUND(drawdown, 2) AS max_drawdown
    FROM top WHERE rn = 1
    """,
)
def revenue_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of cumulative daily revenue — the largest
    peak-to-trough drop, the risk/health metric that's NOT a plain
    window aggregate composition in one pass anywhere else: running
    SUM, running MAX of that sum, their gap, then the argmax row
    (earliest day on ties). All three windows run over the bounded DAY
    table (ses/theil_sen's boundedness argument); the cumulative sums
    add the same rounded day-revenues in the same order on both
    engines, so the doubles agree bit-for-bit before the final
    round."""
    d = _daily_revenue(spark, sf_dir)
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = d.select("day", F.sum("rev").over(w).alias("cum"))
    dd = c.select(
        "day",
        "cum",
        F.max("cum").over(w).alias("peak"),
        (F.max("cum").over(w) - F.col("cum")).alias("drawdown"),
    )
    top = dd.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.col("drawdown").desc(), F.col("day").asc())
        ),
    ).filter(F.col("rn") == 1)
    n = d.agg(F.count(F.lit(1)).alias("n_days"))
    return top.crossJoin(F.broadcast(n)).select(
        "n_days",
        F.col("day").alias("trough_day"),
        F.round("peak", 2).alias("peak_cum"),
        F.round("cum", 2).alias("trough_cum"),
        F.round("drawdown", 2).alias("max_drawdown"),
    )


@register(
    "kruskal_wallis_value_by_type",
    """
    WITH ev AS (
      SELECT event_type AS typ, value AS v FROM events
      WHERE value IS NOT NULL),
    g AS (SELECT typ, v, CAST(COUNT(*) AS BIGINT) AS n
          FROM ev GROUP BY 1, 2),
    pv AS (SELECT v, CAST(SUM(n) AS BIGINT) AS nv FROM g GROUP BY v),
    rv AS (SELECT v, nv,
                  SUM(nv) OVER (ORDER BY v) - nv + (nv + 1) / 2.0 AS r
           FROM pv),
    grp AS (SELECT g.typ, CAST(SUM(g.n) AS BIGINT) AS n_g,
                   SUM(g.n * rv.r) AS r_g
            FROM g JOIN rv ON g.v = rv.v GROUP BY g.typ),
    tot AS (SELECT CAST(SUM(n_g) AS DOUBLE) AS nn,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   SUM(r_g * r_g / n_g) AS srr
            FROM grp),
    tie AS (SELECT SUM(CAST(nv AS DOUBLE) * nv * nv - nv) AS t3t FROM pv)
    SELECT CAST(nn AS BIGINT) AS n, k,
           ROUND(12.0 / (nn * (nn + 1)) * srr - 3.0 * (nn + 1), 6)
             AS h_stat,
           ROUND((12.0 / (nn * (nn + 1)) * srr - 3.0 * (nn + 1))
                 / NULLIF(1.0 - t3t / (nn * nn * nn - nn), 0.0), 6)
             AS h_adj
    FROM tot CROSS JOIN tie
    """,
)
def kruskal_wallis_value_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kruskal–Wallis H — the k-sample generalization of
    mann_whitney_value_test (are the per-event-type value distributions
    identically located?), with the standard tie correction
    H' = H / (1 − Σ(t³−t)/(N³−N)). Same rank-compression posture as
    spearman: values collapse to per-distinct-value counts first, the
    single global average-rank window runs over |distinct values| rows
    (value is cent-grain bounded — the grouped_median argument), and the
    per-group rank sums are weighted aggregates of that summary, so no
    per-row RANK() ever sorts the fact. N³ is computed in DOUBLE on
    both engines (it overflows BIGINT near 2×10⁶ rows). NULL values
    dropped on both sides (the ks_test NULL-ordering rationale)."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = ev.groupBy(
        F.col("event_type").alias("typ"), F.col("value").alias("v")
    ).agg(F.count(F.lit(1)).alias("n"))
    pv = g.groupBy("v").agg(F.sum("n").alias("nv"))
    w = Window.orderBy("v")
    rv = pv.select(
        "v",
        (F.sum("nv").over(w) - F.col("nv") + (F.col("nv") + 1) / 2.0)
        .alias("r"),
    )
    grp = (
        g.join(rv, "v")
        .groupBy("typ")
        .agg(
            F.sum("n").alias("n_g"),
            F.sum(F.col("n") * F.col("r")).alias("r_g"),
        )
    )
    tot = grp.agg(
        F.sum("n_g").cast("double").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("r_g") * F.col("r_g") / F.col("n_g")).alias("srr"),
    )
    tie = pv.agg(
        F.sum(
            F.col("nv").cast("double") * F.col("nv") * F.col("nv")
            - F.col("nv")
        ).alias("t3t")
    )
    h = 12.0 / (F.col("nn") * (F.col("nn") + 1)) * F.col("srr") - 3.0 * (
        F.col("nn") + 1
    )
    # try_divide on BOTH divisions: a single-row corpus (nn = 1) zeroes
    # N³−N itself — bare '/' would ANSI-abort where DuckDB's double
    # division yields NULL — and a corpus with ONE distinct value has
    # tie correction exactly 0 (t³−t consumes all of N³−N) — NULL h_adj
    # like the oracle's NULLIF, never a DIVIDE_BY_ZERO abort.
    corr = 1.0 - F.try_divide(
        F.col("t3t"),
        F.col("nn") * F.col("nn") * F.col("nn") - F.col("nn"),
    )
    return tot.crossJoin(F.broadcast(tie)).select(
        F.col("nn").cast("long").alias("n"),
        "k",
        F.round(h, 6).alias("h_stat"),
        F.round(F.try_divide(h, corr), 6).alias("h_adj"),
    )


@register(
    "kendall_tau_qty_discount_by_flag",
    """
    WITH g AS (
      SELECT l_returnflag AS flag, l_quantity AS q, l_discount AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2, 3),
    cd AS (
      SELECT a.flag,
             CAST(SUM(CASE WHEN a.d < b.d THEN a.n * b.n ELSE 0 END)
                  AS DOUBLE) AS c,
             CAST(SUM(CASE WHEN a.d > b.d THEN a.n * b.n ELSE 0 END)
                  AS DOUBLE) AS dd
      FROM g a JOIN g b ON a.flag = b.flag AND a.q < b.q
      GROUP BY a.flag),
    nt AS (
      SELECT flag, CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(SUM(n) AS DOUBLE) * (SUM(n) - 1) / 2.0 AS n0
      FROM g GROUP BY flag),
    t1 AS (
      SELECT flag, SUM(CAST(nq AS DOUBLE) * (nq - 1) / 2.0) AS n1
      FROM (SELECT flag, q, SUM(n) AS nq FROM g GROUP BY 1, 2)
      GROUP BY flag),
    t2 AS (
      SELECT flag, SUM(CAST(nd AS DOUBLE) * (nd - 1) / 2.0) AS n2
      FROM (SELECT flag, d, SUM(n) AS nd FROM g GROUP BY 1, 2)
      GROUP BY flag)
    SELECT nt.flag AS l_returnflag, nt.n_rows AS n,
           -- + 0.0 canonicalizes IEEE -0.0 (tau is sign-indefinite; a
           -- near-zero tau rounding from below would split the engines);
           -- NULLIF mirrors the Spark twin's try_divide (a flag where
           -- either variable is constant zeroes the pair variance) so
           -- the guard does not depend on DuckDB's division-by-zero
           -- setting
           ROUND((cd.c - cd.dd)
                 / NULLIF(sqrt((nt.n0 - t1.n1) * (nt.n0 - t2.n2)), 0.0),
                 6) + 0.0
             AS tau_b
    FROM nt JOIN cd ON nt.flag = cd.flag
            JOIN t1 ON nt.flag = t1.flag
            JOIN t2 ON nt.flag = t2.flag
    """,
)
def kendall_tau_qty_discount_by_flag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kendall's τ-b (quantity vs discount per return flag) — the
    concordant/discordant-pair companion to spearman, computed WITHOUT
    enumerating row pairs: both variables live on a tiny value grid
    (50 quantities × 11 discounts), so the fact compresses to ≤550
    (q, d, count) cells per flag and concordance is a cell-grid
    self-join (≤550²/2 cell pairs per flag, BOUNDED at any row count —
    the pair table never scales with the fact). Tie terms n1/n2 fall
    out of the marginal counts; everything after the cell counts is
    DOUBLE (n0·n0 overflows BIGINT past ~2M rows/flag) and τ is a
    ratio, so summation-order ulps cancel at round-6. try_divide: a
    flag where either variable is constant has zero pair variance —
    NULL τ like DuckDB, not an ANSI abort."""
    li = t(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("q"),
        F.col("l_discount").alias("d"),
    ).agg(F.count(F.lit(1)).alias("n"))
    a, b = g.alias("a"), g.alias("b")
    cd = (
        a.join(
            b,
            (F.col("a.flag") == F.col("b.flag"))
            & (F.col("a.q") < F.col("b.q")),
        )
        .groupBy(F.col("a.flag").alias("flag"))
        .agg(
            F.sum(
                F.when(
                    F.col("a.d") < F.col("b.d"),
                    F.col("a.n") * F.col("b.n"),
                ).otherwise(F.lit(0))
            )
            .cast("double")
            .alias("c"),
            F.sum(
                F.when(
                    F.col("a.d") > F.col("b.d"),
                    F.col("a.n") * F.col("b.n"),
                ).otherwise(F.lit(0))
            )
            .cast("double")
            .alias("dd"),
        )
    )
    nt = g.groupBy("flag").agg(
        F.sum("n").alias("n_rows"),
        (
            F.sum("n").cast("double") * (F.sum("n") - 1) / 2.0
        ).alias("n0"),
    )
    t1 = (
        g.groupBy("flag", "q")
        .agg(F.sum("n").alias("nq"))
        .groupBy("flag")
        .agg(
            F.sum(
                F.col("nq").cast("double") * (F.col("nq") - 1) / 2.0
            ).alias("n1")
        )
    )
    t2 = (
        g.groupBy("flag", "d")
        .agg(F.sum("n").alias("nd"))
        .groupBy("flag")
        .agg(
            F.sum(
                F.col("nd").cast("double") * (F.col("nd") - 1) / 2.0
            ).alias("n2")
        )
    )
    return (
        nt.join(cd, "flag")
        .join(t1, "flag")
        .join(t2, "flag")
        .select(
            F.col("flag").alias("l_returnflag"),
            F.col("n_rows").alias("n"),
            (
                F.round(
                    F.try_divide(
                        F.col("c") - F.col("dd"),
                        F.sqrt(
                            (F.col("n0") - F.col("n1"))
                            * (F.col("n0") - F.col("n2"))
                        ),
                    ),
                    6,
                )
                + 0.0
            ).alias("tau_b"),
        )
    )


@register(
    "trimmed_winsorized_mean_by_flag",
    """
    WITH g AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2),
    c AS (
      SELECT flag, cents, n,
             SUM(n) OVER (PARTITION BY flag ORDER BY cents) AS cum,
             CAST(SUM(n) OVER (PARTITION BY flag) AS BIGINT) AS total
      FROM g),
    k AS (SELECT *, total // 20 AS kt FROM c),
    kept AS (
      SELECT flag, total, kt,
             GREATEST(0, LEAST(cum, total - kt)
                         - GREATEST(cum - n, kt)) AS kn,
             cents,
             CASE WHEN cum - n <= kt AND kt + 1 <= cum
                  THEN cents END AS lo_hit,
             CASE WHEN cum - n < total - kt AND total - kt <= cum
                  THEN cents END AS hi_hit
      FROM k),
    agg AS (
      SELECT flag, total, kt,
             CAST(SUM(kn * cents) AS BIGINT) AS kept_cents,
             CAST(SUM(kn) AS BIGINT) AS kept_n,
             MAX(lo_hit) AS lo_cents, MAX(hi_hit) AS hi_cents
      FROM kept GROUP BY flag, total, kt)
    SELECT flag AS l_returnflag, total AS n,
           CAST(kt AS BIGINT) AS n_trimmed_each_tail,
           ((2 * kept_cents + kept_n) // (2 * kept_n)) / 100.0
             AS trimmed_mean,
           ((2 * (kept_cents + kt * lo_cents + kt * hi_cents) + total)
            // (2 * total)) / 100.0 AS winsorized_mean
    FROM agg
    """,
)
def trimmed_winsorized_mean_by_flag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """5%-trimmed and 5%-winsorized mean of l_extendedprice per return
    flag — the robust-mean pair, computed on GROUPED VALUE COUNTS like
    grouped_median_via_counts: one hash aggregate compresses the fact
    to (flag, value, count) cells, a per-flag cumulative window locates
    each cell's overlap with the kept rank interval [k, total−k]
    (k = ⌊total/20⌋), and the trimmed mean is the overlap-weighted
    value sum; winsorizing adds the k clamped copies of the boundary
    values (the cells covering ranks k+1 and total−k). No per-row rank
    or sort of the fact — the window runs over distinct values only.
    Sums run in exact integer CENTS (l_extendedprice is cent-grain), so
    they are summation-order-independent and both engines divide
    bit-identical integers — the 2-dp rounding is then safe. At ~10¹¹
    rows/flag the cent sum approaches BIGINT range: widen to DECIMAL
    or per-partition partials there (documented, not needed at any
    tested SF)."""
    li = t(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("cents"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("flag").orderBy("cents")
    c = g.select(
        "flag",
        "cents",
        "n",
        F.sum("n").over(w).alias("cum"),
        F.sum("n")
        .over(
            Window.partitionBy("flag").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("total"),
    )
    kt = F.floor(F.col("total") / 20)
    prev = F.col("cum") - F.col("n")
    kept = c.select(
        "flag",
        "total",
        kt.alias("kt"),
        "cents",
        F.greatest(
            F.lit(0),
            F.least(F.col("cum"), F.col("total") - kt)
            - F.greatest(prev, kt),
        ).alias("kn"),
        F.when((prev <= kt) & (kt + 1 <= F.col("cum")), F.col("cents"))
        .alias("lo_hit"),
        F.when(
            (prev < F.col("total") - kt)
            & (F.col("total") - kt <= F.col("cum")),
            F.col("cents"),
        ).alias("hi_hit"),
    )
    agg = kept.groupBy("flag", "total", "kt").agg(
        F.sum(F.col("kn") * F.col("cents")).alias("kept_cents"),
        F.sum("kn").alias("kept_n"),
        F.max("lo_hit").alias("lo_cents"),
        F.max("hi_hit").alias("hi_cents"),
    )
    # the 2-dp value is computed ENTIRELY in integer space —
    # round-half-up(p/q) = (2p + q) DIV (2q) — then divided by 100.0:
    # ROUND(double, 2) on the quotient is the documented engine trap
    # (DuckDB multiplies-then-rounds, Spark rounds the binary value;
    # an exact half-cent mean splits them), while an integer DIV and
    # one division by 100.0 are bit-identical everywhere
    trimmed_c = F.expr(
        "(2 * kept_cents + kept_n) DIV (2 * kept_n)"
    )
    wins_c = F.expr(
        "(2 * (kept_cents + kt * lo_cents + kt * hi_cents) + total)"
        " DIV (2 * total)"
    )
    return agg.select(
        F.col("flag").alias("l_returnflag"),
        F.col("total").cast("long").alias("n"),
        F.col("kt").cast("long").alias("n_trimmed_each_tail"),
        (trimmed_c / 100.0).alias("trimmed_mean"),
        (wins_c / 100.0).alias("winsorized_mean"),
    )


@register(
    "levene_brown_forsythe_value",
    """
    WITH ev AS (
      SELECT event_type AS typ, value AS v FROM events
      WHERE value IS NOT NULL),
    g AS (SELECT typ, v, CAST(COUNT(*) AS BIGINT) AS n
          FROM ev GROUP BY 1, 2),
    c AS (SELECT typ, v, n,
                 SUM(n) OVER (PARTITION BY typ ORDER BY v) AS cum,
                 CAST(SUM(n) OVER (PARTITION BY typ) AS BIGINT) AS total
          FROM g),
    med AS (
      SELECT typ,
             (MAX(CASE WHEN cum - n < (total + 1) // 2
                        AND (total + 1) // 2 <= cum THEN v END)
              + MAX(CASE WHEN cum - n < (total + 2) // 2
                          AND (total + 2) // 2 <= cum THEN v END)) / 2.0
               AS m
      FROM c GROUP BY typ, total),
    z AS (SELECT g.typ, abs(g.v - med.m) AS z, g.n
          FROM g JOIN med ON g.typ = med.typ),
    grp AS (SELECT typ, CAST(SUM(n) AS BIGINT) AS n_g,
                   SUM(n * z) AS sz, SUM(n * z * z) AS szz
            FROM z GROUP BY typ),
    tot AS (SELECT CAST(SUM(n_g) AS DOUBLE) AS nn,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   SUM(sz) AS gsz,
                   SUM(sz * sz / n_g) AS sb,
                   SUM(szz) AS szz
            FROM grp)
    SELECT CAST(nn AS BIGINT) AS n, k,
           ROUND((
             (sb - gsz * gsz / nn) / NULLIF(CAST(k - 1 AS DOUBLE), 0.0))
             / NULLIF((szz - sb) / NULLIF(nn - k, 0.0), 0.0), 6)
             AS f_stat
    FROM tot
    """,
)
def levene_brown_forsythe_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brown–Forsythe (median-centered Levene) test — do the
    per-event-type value distributions share a VARIANCE? (The spread
    companion to kruskal_wallis's location test.) One-way ANOVA F on
    the absolute deviations from each group's median: the medians come
    from the grouped-value-count k-th element (grouped_median pattern,
    bit-identical midpoints), and because |v − med| is a function of
    the (type, value) cell, the deviations stay on the compressed cell
    table — SSB/SSW are weighted sums over cells, never a per-row
    pass. F = (SSB/(k−1)) / (SSW/(N−k)) with SSB = Σ R_g²/n_g − R²/N
    and SSW = Σ n·z² − Σ R_g²/n_g; the final ratio cancels
    summation-order ulps at round-6."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = ev.groupBy(
        F.col("event_type").alias("typ"), F.col("value").alias("v")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("typ").orderBy("v")
    c = g.select(
        "typ",
        "v",
        "n",
        F.sum("n").over(w).alias("cum"),
        F.sum("n")
        .over(
            Window.partitionBy("typ").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("total"),
    )
    lo_pos = F.floor((F.col("total") + 1) / 2)
    hi_pos = F.floor((F.col("total") + 2) / 2)
    prev = F.col("cum") - F.col("n")
    med = c.groupBy("typ", "total").agg(
        (
            (
                F.max(
                    F.when(
                        (prev < lo_pos) & (lo_pos <= F.col("cum")),
                        F.col("v"),
                    )
                )
                + F.max(
                    F.when(
                        (prev < hi_pos) & (hi_pos <= F.col("cum")),
                        F.col("v"),
                    )
                )
            )
            / 2.0
        ).alias("m")
    )
    z = g.join(med.select("typ", "m"), "typ").select(
        "typ", F.abs(F.col("v") - F.col("m")).alias("z"), "n"
    )
    grp = z.groupBy("typ").agg(
        F.sum("n").alias("n_g"),
        F.sum(F.col("n") * F.col("z")).alias("sz"),
        F.sum(F.col("n") * F.col("z") * F.col("z")).alias("szz"),
    )
    tot = grp.agg(
        F.sum("n_g").cast("double").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        F.sum("sz").alias("gsz"),
        F.sum(F.col("sz") * F.col("sz") / F.col("n_g")).alias("sb"),
        F.sum("szz").alias("szz"),
    )
    # try_divide THROUGHOUT the F assembly: k = 1 (one group — the
    # between variance is undefined), n_g ≡ 1 (nn = k — no within
    # variance), and identically-zero within-spread all yield NULL like
    # the oracle's NULLIF chain, never an ANSI DIVIDE_BY_ZERO abort.
    ssb = F.try_divide(
        F.col("sb") - F.col("gsz") * F.col("gsz") / F.col("nn"),
        (F.col("k") - 1).cast("double"),
    )
    ssw = F.try_divide(
        F.col("szz") - F.col("sb"), F.col("nn") - F.col("k")
    )
    return tot.select(
        F.col("nn").cast("long").alias("n"),
        "k",
        F.round(F.try_divide(ssb, ssw), 6).alias("f_stat"),
    )


@register(
    "tukey_hsd_value_by_type",
    """
    WITH ev AS (
      SELECT event_type AS typ, value AS v FROM events
      WHERE value IS NOT NULL),
    g AS (SELECT typ, CAST(COUNT(*) AS BIGINT) AS n_g,
                 SUM(v) AS sv, SUM(v * v) AS svv
          FROM ev GROUP BY typ),
    tot AS (SELECT CAST(SUM(n_g) AS DOUBLE) AS nn,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   SUM(svv - sv * sv / n_g) AS ssw
            FROM g),
    msw AS (SELECT nn, k, ssw / NULLIF(nn - k, 0.0) AS msw FROM tot)
    SELECT a.typ AS type_a, b.typ AS type_b,
           a.n_g AS n_a, b.n_g AS n_b,
           -- + 0.0 canonicalizes IEEE -0.0 (mean_diff is sign-indefinite
           -- and two near-equal group means can round to -0.0)
           ROUND(a.sv / a.n_g - b.sv / b.n_g, 6) + 0.0 AS mean_diff,
           ROUND(abs(a.sv / a.n_g - b.sv / b.n_g)
                 / NULLIF(sqrt(msw / 2.0
                               * (1.0 / a.n_g + 1.0 / b.n_g)), 0.0), 6)
             AS q_stat
    FROM g a JOIN g b ON a.typ < b.typ
    CROSS JOIN msw
    """,
)
def tukey_hsd_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD studentized-range pairs — the post-hoc companion to
    kruskal_wallis/levene: WHICH event-type pairs differ, via
    q = |m_i − m_j| / sqrt(MSW/2 · (1/n_i + 1/n_j)) with the pooled
    within-group variance. One map-side-combined aggregate compresses
    the fact to k group rows (count, Σv, Σv²); the pairwise comparison
    is a k-row self-join (k = |event types|, a domain constant — the
    pair table never scales with the fact) with the one-row MSW
    broadcast on top. NULLIF/try_divide: a single-group corpus or
    n_g ≡ 1 (MSW undefined) yields NULL q like DuckDB."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = ev.groupBy(F.col("event_type").alias("typ")).agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("value").alias("sv"),
        F.sum(F.col("value") * F.col("value")).alias("svv"),
    )
    tot = g.agg(
        F.sum("n_g").cast("double").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        F.sum(
            F.col("svv") - F.col("sv") * F.col("sv") / F.col("n_g")
        ).alias("ssw"),
    )
    msw = tot.select(
        F.try_divide(F.col("ssw"), F.col("nn") - F.col("k")).alias("msw")
    )
    a, b = g.alias("a"), g.alias("b")
    mean_diff = F.col("a.sv") / F.col("a.n_g") - F.col("b.sv") / F.col(
        "b.n_g"
    )
    return (
        a.join(b, F.col("a.typ") < F.col("b.typ"))
        .crossJoin(F.broadcast(msw))
        .select(
            F.col("a.typ").alias("type_a"),
            F.col("b.typ").alias("type_b"),
            F.col("a.n_g").alias("n_a"),
            F.col("b.n_g").alias("n_b"),
            (F.round(mean_diff, 6) + 0.0).alias("mean_diff"),
            F.round(
                F.try_divide(
                    F.abs(mean_diff),
                    F.sqrt(
                        F.col("msw")
                        / 2.0
                        * (1.0 / F.col("a.n_g") + 1.0 / F.col("b.n_g"))
                    ),
                ),
                6,
            ).alias("q_stat"),
        )
    )


@register(
    "partial_corr_qty_discount_given_price",
    """
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             covar_pop(l_quantity, l_discount) AS cxy,
             covar_pop(l_quantity, l_extendedprice) AS cxz,
             covar_pop(l_discount, l_extendedprice) AS cyz,
             var_pop(l_quantity) AS vx,
             var_pop(l_discount) AS vy,
             var_pop(l_extendedprice) AS vz
      FROM lineitem),
    r AS (SELECT n,
                 cxy / NULLIF(sqrt(vx * vy), 0.0) AS rxy,
                 cxz / NULLIF(sqrt(vx * vz), 0.0) AS rxz,
                 cyz / NULLIF(sqrt(vy * vz), 0.0) AS ryz
          FROM m),
    c2 AS (SELECT n, rxy, rxz, ryz,
                  CASE WHEN 1.0 - rxz * rxz < 0.0 THEN 0.0
                       ELSE 1.0 - rxz * rxz END AS oxz,
                  CASE WHEN 1.0 - ryz * ryz < 0.0 THEN 0.0
                       ELSE 1.0 - ryz * ryz END AS oyz
           FROM r)
    -- + 0.0 canonicalizes IEEE -0.0 (both correlations are
    -- sign-indefinite; a near-zero r rounding from below would split
    -- the engines)
    SELECT n, ROUND(rxy, 6) + 0.0 AS r_qty_disc,
           ROUND((rxy - rxz * ryz)
                 / NULLIF(sqrt(oxz * oyz), 0.0), 6) + 0.0
             AS r_qty_disc_given_price
    FROM c2
    """,
)
def partial_corr_qty_discount_given_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order partial correlation — quantity vs discount with
    extendedprice held constant: r_xy·z = (r_xy − r_xz·r_yz) /
    √((1−r_xz²)(1−r_yz²)), the confounder screen
    `lineitem_corr_matrix` can't answer (price = qty × unit price, so
    the raw r_qty_disc is partly a price artifact). One map-side
    combined aggregate (covariance/variance moments), closed-form
    assembly — nothing but a one-row reduction crosses the wire.
    try_divide/NULLIF on every root: a zero-variance column or a
    perfect |r| = 1 confounder yields NULL, never an ANSI abort."""
    li = t(spark, sf_dir, "lineitem")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.covar_pop("l_quantity", "l_discount").alias("cxy"),
        F.covar_pop("l_quantity", "l_extendedprice").alias("cxz"),
        F.covar_pop("l_discount", "l_extendedprice").alias("cyz"),
        F.var_pop("l_quantity").alias("vx"),
        F.var_pop("l_discount").alias("vy"),
        F.var_pop("l_extendedprice").alias("vz"),
    )
    rxy = F.try_divide(
        F.col("cxy"), F.sqrt(F.col("vx") * F.col("vy"))
    )
    rxz = F.try_divide(
        F.col("cxz"), F.sqrt(F.col("vx") * F.col("vz"))
    )
    ryz = F.try_divide(
        F.col("cyz"), F.sqrt(F.col("vy") * F.col("vz"))
    )
    # clamp 1 - r^2 at 0 (CASE on both engines, NULL-safe: a NULL r
    # falls through to the ELSE branch identically): independent moment
    # aggregations don't guarantee Cauchy-Schwarz in floating point, and
    # an exactly-collinear confounder can overshoot to |r| = 1 + 1ulp —
    # sqrt(negative) hard-errors in DuckDB and NaNs in Spark otherwise
    def _clamped(r):
        sq = 1.0 - r * r
        return F.when(sq < 0.0, F.lit(0.0)).otherwise(sq)

    return m.select(
        "n",
        (F.round(rxy, 6) + 0.0).alias("r_qty_disc"),
        (
            F.round(
                F.try_divide(
                    rxy - rxz * ryz,
                    F.sqrt(_clamped(rxz) * _clamped(ryz)),
                ),
                6,
            )
            + 0.0
        ).alias("r_qty_disc_given_price"),
    )


@register(
    "page_hinkley_value_drift",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             ROUND(AVG(value), 6) AS xbar
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1),
    mu AS (SELECT day, xbar,
                  AVG(xbar) OVER (ORDER BY day
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS mu
           FROM d),
    m AS (SELECT day,
                 SUM(xbar - mu - 0.005) OVER (ORDER BY day
                                              ROWS BETWEEN UNBOUNDED
                                              PRECEDING AND CURRENT ROW)
                   AS mt
          FROM mu),
    ph AS (SELECT day,
                  mt - MIN(mt) OVER (ORDER BY day
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS ph
           FROM m)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(MAX(ph), 6) AS max_ph,
           CAST(SUM(CASE WHEN ph > 5.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarm_days,
           strftime(MIN(CASE WHEN ph > 5.0 THEN day END), '%Y-%m-%d')
             AS first_alarm_day
    FROM ph
    """,
)
def page_hinkley_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley sequential drift detector over the daily mean event
    value — the streaming-monitoring primitive (has the data feeding a
    model shifted upward?): mₜ = Σ(x̄ₛ − μₛ − δ) against its running
    minimum, alarm when the gap clears λ (δ=0.005, λ=5). Every window
    is a cumulative frame over the bounded DAY table (the
    revenue_max_drawdown posture), and the daily means are ROUNDED
    before the cumulative chain, so both engines add identical doubles
    in identical order — the PH path is bit-reproducible, no
    summation-order ulps. The same recurrence runs incrementally in
    streaming (mt/min-mt are one-row state), making this the batch
    twin of a monitoring job."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.round(F.avg("value"), 6).alias("xbar")
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    mu = d.select(
        "day", "xbar", F.avg("xbar").over(wc).alias("mu")
    )
    m = mu.select(
        "day",
        F.sum(F.col("xbar") - F.col("mu") - 0.005).over(wc).alias("mt"),
    )
    ph = m.select(
        "day", (F.col("mt") - F.min("mt").over(wc)).alias("ph")
    )
    return ph.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.max("ph"), 6).alias("max_ph"),
        F.sum(F.when(F.col("ph") > 5.0, 1).otherwise(0)).alias(
            "n_alarm_days"
        ),
        # surfaced as a 'yyyy-MM-dd' STRING: an alarm-free corpus has a
        # NULL first alarm, and a NULL DATE bridges as pandas NaT on the
        # DuckDB side vs None on Spark's — the string form is None on both
        F.date_format(
            F.min(F.when(F.col("ph") > 5.0, F.col("day"))), "yyyy-MM-dd"
        ).alias("first_alarm_day"),
    )


@register(
    "dunn_posthoc_value_by_type",
    """
    WITH ev AS (
      SELECT event_type AS typ, value AS v FROM events
      WHERE value IS NOT NULL),
    g AS (SELECT typ, v, CAST(COUNT(*) AS BIGINT) AS n
          FROM ev GROUP BY 1, 2),
    pv AS (SELECT v, CAST(SUM(n) AS BIGINT) AS nv FROM g GROUP BY v),
    rv AS (SELECT v, nv,
                  SUM(nv) OVER (ORDER BY v) - nv + (nv + 1) / 2.0 AS r
           FROM pv),
    grp AS (SELECT g.typ, CAST(SUM(g.n) AS BIGINT) AS n_g,
                   SUM(g.n * rv.r) AS r_g
            FROM g JOIN rv ON g.v = rv.v GROUP BY g.typ),
    tot AS (SELECT CAST(SUM(n_g) AS DOUBLE) AS nn FROM grp),
    tie AS (SELECT SUM(CAST(nv AS DOUBLE) * nv * nv - nv) AS t3t FROM pv),
    braw AS (SELECT nn * (nn + 1) / 12.0
                    - t3t / NULLIF(12.0 * (nn - 1), 0.0) AS b, nn
             FROM tot CROSS JOIN tie),
    brk AS (SELECT CASE WHEN b < 0 THEN 0.0 ELSE b END AS b, nn FROM braw)
    SELECT a.typ AS type_a, c.typ AS type_b,
           a.n_g AS n_a, c.n_g AS n_b,
           ROUND(a.r_g / a.n_g, 6) AS mean_rank_a,
           ROUND(c.r_g / c.n_g, 6) AS mean_rank_b,
           -- + 0.0 canonicalizes IEEE -0.0: engines disagree on the
           -- sign of round(-1e-9, 6) and the gate hashes raw reprs
           ROUND((a.r_g / a.n_g - c.r_g / c.n_g)
                 / NULLIF(sqrt(brk.b * (1.0 / a.n_g + 1.0 / c.n_g)), 0.0),
                 6) + 0.0 AS z_stat
    FROM grp a JOIN grp c ON a.typ < c.typ
    CROSS JOIN brk
    """,
)
def dunn_posthoc_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc test (Dunn 1964) — WHICH event-type pairs differ
    once kruskal_wallis_value_by_type rejects: pairwise z-scores of
    mean-rank differences over the pooled tie-corrected rank variance
    (N(N+1)/12 − Σ(t³−t)/(12(N−1)))·(1/nᵢ+1/nⱼ), the rank-based
    companion to tukey_hsd_value_by_type's parametric pairs. Reuses the
    EXACT rank-compression machinery of kruskal_wallis (one global
    average-rank window over DISTINCT cent-grain values, per-group rank
    sums as weighted aggregates) — the fact is never sorted or
    self-joined; the pairwise grid is k(k−1)/2 rows of a k-row
    aggregate with the one-row variance broadcast (the tukey_hsd
    shape). The variance bracket clamps at 0 via CASE (fp overshoot on
    an all-ties corpus; sqrt(negative) hard-errors DuckDB) and
    try_divide/NULLIF yields NULL z on the degenerate N=1 / zero-
    variance corpora, never an ANSI abort."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = ev.groupBy(
        F.col("event_type").alias("typ"), F.col("value").alias("v")
    ).agg(F.count(F.lit(1)).alias("n"))
    pv = g.groupBy("v").agg(F.sum("n").alias("nv"))
    w = Window.orderBy("v")
    rv = pv.select(
        "v",
        "nv",
        (F.sum("nv").over(w) - F.col("nv") + (F.col("nv") + 1) / 2.0)
        .alias("r"),
    )
    grp = (
        g.join(rv.select("v", "r"), "v")
        .groupBy("typ")
        .agg(
            F.sum("n").alias("n_g"),
            F.sum(F.col("n") * F.col("r")).alias("r_g"),
        )
    )
    tot = grp.agg(F.sum("n_g").cast("double").alias("nn"))
    tie = pv.agg(
        F.sum(
            F.col("nv").cast("double") * F.col("nv") * F.col("nv")
            - F.col("nv")
        ).alias("t3t")
    )
    braw = (
        F.col("nn") * (F.col("nn") + 1) / 12.0
        - F.try_divide(F.col("t3t"), 12.0 * (F.col("nn") - 1))
    )
    brk = (
        tot.crossJoin(F.broadcast(tie))
        .select(
            F.when(braw < 0, F.lit(0.0)).otherwise(braw).alias("b")
        )
    )
    a = grp.select(
        F.col("typ").alias("type_a"),
        F.col("n_g").alias("n_a"),
        F.col("r_g").alias("r_a"),
    )
    c = grp.select(
        F.col("typ").alias("type_b"),
        F.col("n_g").alias("n_b"),
        F.col("r_g").alias("r_b"),
    )
    mra = F.col("r_a") / F.col("n_a")
    mrb = F.col("r_b") / F.col("n_b")
    se = F.sqrt(
        F.col("b") * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return (
        a.join(F.broadcast(c), F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(brk))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            F.round(mra, 6).alias("mean_rank_a"),
            F.round(mrb, 6).alias("mean_rank_b"),
            (F.round(F.try_divide(mra - mrb, se), 6) + 0.0).alias("z_stat"),
        )
    )


@register(
    "friedman_value_by_type_daily",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, event_type AS typ,
             ROUND(AVG(value), 6) AS xbar
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2),
    k_ AS (SELECT CAST(COUNT(DISTINCT typ) AS BIGINT) AS k FROM d),
    full_days AS (
      SELECT day FROM d CROSS JOIN k_
      GROUP BY day, k HAVING COUNT(*) = ANY_VALUE(k)),
    cb AS (SELECT d.* FROM d JOIN full_days USING (day)),
    r AS (SELECT day, typ,
                 RANK() OVER (PARTITION BY day ORDER BY xbar)
                 + (COUNT(*) OVER (PARTITION BY day, xbar) - 1) / 2.0
                   AS rk
          FROM cb),
    rj AS (SELECT typ, SUM(rk) AS r_j FROM r GROUP BY typ),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM full_days),
    ties AS (
      SELECT COALESCE(SUM(CAST(c AS DOUBLE) * c * c - c), 0.0) AS t3t
      FROM (SELECT day, xbar, COUNT(*) AS c FROM cb GROUP BY 1, 2)),
    stat AS (
      SELECT n, k,
             12.0 / (n * k * (k + 1)) * SUM(r_j * r_j)
             - 3.0 * n * (k + 1) AS chi2
      FROM rj CROSS JOIN nb CROSS JOIN k_
      GROUP BY n, k)
    SELECT n AS n_days, k,
           -- + 0.0 canonicalizes IEEE -0.0 (chi2 is >= 0 analytically
           -- but fp cancellation can land in (-5e-7, 0))
           ROUND(chi2, 6) + 0.0 AS chi2_f,
           -- inner NULLIF mirrors the Spark twin's try_divide on the SAME
           -- division (k = 1 zeroes nk(k^2-1) itself): without it the
           -- guard would depend on DuckDB's float-division-by-zero
           -- setting (NULL on this build, NaN with IEEE ops enabled)
           ROUND(chi2 / NULLIF(1.0 - t3t / NULLIF(CAST(n AS DOUBLE) * k
                                                  * (k * k - 1), 0.0),
                               0.0), 6) + 0.0
             AS chi2_f_adj
    FROM stat CROSS JOIN ties
    """,
)
def friedman_value_by_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test (Friedman 1937) — the repeated-measures companion
    to kruskal_wallis: do the event types' DAILY mean values rank
    consistently across days (blocks), removing day-level shifts KW
    would conflate with the treatment effect? Complete blocks only
    (days observing every type — the standard restriction), average
    ranks on ties, and the tie-corrected statistic
    χ²/(1 − Σ(t³−t)/(nk(k²−1))). Scale shape: the fact collapses to the
    |days|×k daily-mean cell grid FIRST (means rounded to 6 before any
    ranking, the page_hinkley convention), every window runs over that
    bounded grid, and the per-type rank sums are exact: average ranks
    are multiples of 0.5 — binary-exact doubles whose sums are
    order-free, so no cumulative-frame choreography is needed.
    try_divide yields NULL on the all-ties degenerate corpus."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    d = ev.groupBy(
        F.col("ts").cast("date").alias("day"),
        F.col("event_type").alias("typ"),
    ).agg(F.round(F.avg("value"), 6).alias("xbar"))
    k_ = d.agg(F.count_distinct("typ").alias("k"))
    full_days = (
        d.crossJoin(F.broadcast(k_))
        .groupBy("day", "k")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") == F.col("k"))
        .select("day")
    )
    cb = d.join(full_days, "day")
    rk = (
        F.rank().over(Window.partitionBy("day").orderBy("xbar"))
        + (
            F.count(F.lit(1)).over(Window.partitionBy("day", "xbar"))
            - 1
        )
        / 2.0
    )
    r = cb.select("day", "typ", rk.alias("rk"))
    rj = r.groupBy("typ").agg(F.sum("rk").alias("r_j"))
    nb = full_days.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        cb.groupBy("day", "xbar")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("c").cast("double") * F.col("c") * F.col("c")
                    - F.col("c")
                ),
                F.lit(0.0),
            ).alias("t3t")
        )
    )
    stat = (
        rj.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(k_))
        .groupBy("n", "k")
        .agg(
            (
                12.0
                / (F.col("n") * F.col("k") * (F.col("k") + 1))
                * F.sum(F.col("r_j") * F.col("r_j"))
                - 3.0 * F.col("n") * (F.col("k") + 1)
            ).alias("chi2")
        )
    )
    corr = 1.0 - F.try_divide(
        F.col("t3t"),
        F.col("n").cast("double")
        * F.col("k")
        * (F.col("k") * F.col("k") - 1),
    )
    return stat.crossJoin(F.broadcast(ties)).select(
        F.col("n").alias("n_days"),
        "k",
        (F.round("chi2", 6) + 0.0).alias("chi2_f"),
        (F.round(F.try_divide(F.col("chi2"), corr), 6) + 0.0).alias(
            "chi2_f_adj"
        ),
    )


@register(
    "cusum_value_drift",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             ROUND(AVG(value), 6) AS xbar
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1),
    mu AS (SELECT SUM(CAST(round(xbar * 1000000) AS BIGINT))
                  / CAST(COUNT(*) AS DOUBLE) / 1000000.0 AS mu0
           FROM d),
    m AS (SELECT day,
                 SUM(xbar - mu0 - 0.005) OVER w AS mp,
                 SUM(mu0 - xbar - 0.005) OVER w AS mn
          FROM d CROSS JOIN mu
          WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)),
    s AS (SELECT day,
                 mp - LEAST(0.0, MIN(mp) OVER w) AS sp,
                 mn - LEAST(0.0, MIN(mn) OVER w) AS sn
          FROM m
          WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(MAX(sp), 6) AS max_cusum_up,
           ROUND(MAX(sn), 6) AS max_cusum_down,
           CAST(SUM(CASE WHEN sp > 5.0 OR sn > 5.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alarm_days,
           strftime(MIN(CASE WHEN sp > 5.0 OR sn > 5.0 THEN day END),
                    '%Y-%m-%d') AS first_alarm_day
    FROM s
    """,
)
def cusum_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift detector (Page 1954) over daily mean event
    values — the classic mean-shift monitor beside page_hinkley_value_
    drift (PH tracks deviation from the RUNNING mean; CUSUM accumulates
    excursions from a fixed target μ₀ with slack k=0.005, alarm at
    h=5): S⁺ᵢ = max(0, S⁺ᵢ₋₁ + xᵢ − μ₀ − k) and the mirrored S⁻. The
    max(0,·) recurrence has no direct cumulative-frame form, but by
    reflection Sᵢ = Mᵢ − min(0, min_{j≤i} Mⱼ) with M the plain
    cumulative sum — two ordered frames over the bounded DAY table,
    the drawdown trick run upside-down. Determinism: daily means round
    to 6 first; μ₀ sums exact integer micro-units (order-free — a
    float AVG's accumulation order would shift every Sᵢ); the
    cumulative chains then add identical doubles in identical order on
    both engines. First alarm surfaced as a 'yyyy-MM-dd' string (NULL
    bridges as None on both engines)."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.round(F.avg("value"), 6).alias("xbar")
    )
    mu = d.agg(
        (
            F.sum(F.round(F.col("xbar") * 1000000).cast("bigint"))
            / F.count(F.lit(1)).cast("double")
            / 1000000.0
        ).alias("mu0")
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    m = d.crossJoin(F.broadcast(mu)).select(
        "day",
        F.sum(F.col("xbar") - F.col("mu0") - 0.005).over(wc).alias("mp"),
        F.sum(F.col("mu0") - F.col("xbar") - 0.005).over(wc).alias("mn"),
    )
    s = m.select(
        "day",
        (F.col("mp") - F.least(F.lit(0.0), F.min("mp").over(wc))).alias(
            "sp"
        ),
        (F.col("mn") - F.least(F.lit(0.0), F.min("mn").over(wc))).alias(
            "sn"
        ),
    )
    alarm = (F.col("sp") > 5.0) | (F.col("sn") > 5.0)
    return s.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.max("sp"), 6).alias("max_cusum_up"),
        F.round(F.max("sn"), 6).alias("max_cusum_down"),
        F.sum(F.when(alarm, 1).otherwise(0)).alias("n_alarm_days"),
        F.date_format(
            F.min(F.when(alarm, F.col("day"))), "yyyy-MM-dd"
        ).alias("first_alarm_day"),
    )
