"""Customer/behavioral analytics queries with DuckDB oracles.

Segmentation, concentration, seasonality, association and trend operators
over the TPC-H-ish tables — the "who are my users and what do they do"
layer a warehouse team builds on top of the relational core (reference
analog: the profile/summary MVs in `etl-crimes/firs_mv.sql`, generalized).
Conventions per ``plans/catalog.py``: identical aliases both sides, money
via ``decimal(18,2)``, ratios rounded to 6, deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dopams_etl_spark.functions.ids import md5_bucket32, md5_cohort
from dopams_etl_spark.functions.money import money_quantize
from dopams_etl_spark.operators.sessionize import with_session_num
from dopams_etl_spark.plans.catalog import (
    ann_notnull,
    md5_bucket32_sql,
    md5_cohort_sql,
    register,
    session_ctes,
    t,
)

DEC = "decimal(18,2)"


@register(
    "customer_rfm_segments",
    """
    WITH cust AS (
      -- portable cents quantizer: floor(x*100 + 0.5) is pure IEEE double
      -- arithmetic, identical on both engines even when a fixture regen
      -- narrows o_totalprice to float32 (a .625 tie rounds HALF_UP in
      -- Spark's double->DECIMAL cast but half-even in DuckDB's)
      SELECT o_custkey AS custkey,
             MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)
                           / 100.0 AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS monetary
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT custkey, last_order, frequency, monetary,
             NTILE(4) OVER (ORDER BY last_order DESC, custkey) AS r_score,
             NTILE(4) OVER (ORDER BY frequency DESC, custkey) AS f_score,
             NTILE(4) OVER (ORDER BY monetary DESC, custkey) AS m_score
      FROM cust)
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(monetary) AS DECIMAL(18,2)) AS VARCHAR)
             AS segment_revenue,
           CAST(MIN(custkey) AS BIGINT) AS min_custkey
    FROM scored GROUP BY r_score, f_score, m_score
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — quartile scores for Recency (latest order),
    Frequency (order count) and Monetary (lifetime spend), the classic
    marketing-segmentation grid. The fact table collapses to customer
    grain FIRST (one hash aggregate over orders), so the three NTILE
    windows sort the dimension-sized aggregate, never the fact; output
    re-aggregates to the 4x4x4 segment grid so the result is small and
    hash-stable. Ties broken by custkey on every score. At 100 TB the
    only global sorts are over |customers| rows of 4 columns."""
    o = t(spark, sf_dir, "orders")
    cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        # portable cents quantizer: floor(x*100 + 0.5) is pure IEEE
        # double arithmetic, identical on both engines even on a
        # float32-narrowed fixture (.625 cent ties round HALF_UP in
        # Spark's double->DECIMAL cast but half-even in DuckDB's)
        F.sum(
            money_quantize("o_totalprice")
        )
        .cast(DEC)
        .alias("monetary"),
    )
    r_w = Window.orderBy(F.col("last_order").desc(), "custkey")
    f_w = Window.orderBy(F.col("frequency").desc(), "custkey")
    m_w = Window.orderBy(F.col("monetary").desc(), "custkey")
    scored = cust.select(
        "custkey",
        "monetary",
        F.ntile(4).over(r_w).alias("r_score"),
        F.ntile(4).over(f_w).alias("f_score"),
        F.ntile(4).over(m_w).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("monetary").cast(DEC).cast("string").alias("segment_revenue"),
        F.min("custkey").alias("min_custkey"),
    )


@register(
    "revenue_pareto_abc",
    """
    WITH cust AS (
      -- portable cents quantizer: floor(x*100 + 0.5) is pure IEEE double
      -- arithmetic, identical on both engines even when a fixture regen
      -- narrows o_totalprice to float32 (.625 cent ties round HALF_UP in
      -- Spark's double->DECIMAL cast but half-even in DuckDB's)
      SELECT o_custkey AS custkey,
             CAST(SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)
                           / 100.0 AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS revenue
      FROM orders GROUP BY o_custkey),
    tot AS (SELECT CAST(SUM(revenue) AS DECIMAL(18,2)) AS total FROM cust),
    ranked AS (
      SELECT custkey, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, custkey
                                ROWS UNBOUNDED PRECEDING) AS cum_revenue
      FROM cust),
    classed AS (
      SELECT custkey, revenue,
             CASE WHEN cum_revenue / total <= 0.80 THEN 'A'
                  WHEN cum_revenue / total <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked CROSS JOIN tot)
    SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(revenue) AS DECIMAL(18,2)) AS VARCHAR)
             AS class_revenue,
           ROUND(SUM(revenue) / ANY_VALUE(tot.total), 6) AS revenue_share
    FROM classed CROSS JOIN tot GROUP BY abc_class
    """,
)
def revenue_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC analysis — customers ranked by revenue, classed A
    (first 80 % of cumulative revenue), B (to 95 %), C (tail): the 80/20
    concentration cut behind inventory and account tiering. Decimal
    revenue keeps the running sum exact, so the class boundary is
    bit-identical on both engines (a double cumsum would drift at the
    0.80 knife-edge). One hash aggregate to customer grain, one global
    sort of that aggregate for the running total, the corpus total as a
    one-row broadcast — nothing fact-sized is sorted."""
    o = t(spark, sf_dir, "orders")
    # portable cents quantizer: floor(x*100 + 0.5) is pure IEEE double
    # arithmetic, identical on both engines even on a float32-narrowed
    # fixture (.625 cent ties round HALF_UP in Spark's double->DECIMAL
    # cast but half-even in DuckDB's)
    cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(
            money_quantize("o_totalprice")
        )
        .cast(DEC)
        .alias("revenue")
    )
    tot = cust.agg(F.sum("revenue").cast(DEC).alias("total"))
    w = (
        Window.orderBy(F.col("revenue").desc(), "custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = cust.withColumn("cum_revenue", F.sum("revenue").over(w))
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "custkey",
        "revenue",
        "total",
        F.when(F.col("cum_revenue") / F.col("total") <= 0.80, "A")
        .when(F.col("cum_revenue") / F.col("total") <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("revenue").cast(DEC).cast("string").alias("class_revenue"),
        F.round(
            (F.sum("revenue") / F.any_value(F.col("total"))).cast("double"), 6
        ).alias("revenue_share"),
    )


@register(
    "customer_spend_gini",
    """
    WITH cust AS (
      -- portable cents quantizer: floor(x*100 + 0.5) is pure IEEE double
      -- arithmetic, identical on both engines even when a fixture regen
      -- narrows o_totalprice to float32 (.625 cent ties round HALF_UP in
      -- Spark's double->DECIMAL cast but half-even in DuckDB's)
      SELECT o_custkey AS custkey,
             CAST(SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)
                           / 100.0 AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS spend
      FROM orders GROUP BY o_custkey),
    ranked AS (
      -- spend IS NOT NULL: a customer with no priced orders has no rank
      -- (Spark sorts NULL spend first, DuckDB last - it must not rank)
      SELECT spend,
             ROW_NUMBER() OVER (ORDER BY spend, custkey) AS i
      FROM cust WHERE spend IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(spend) AS DECIMAL(18,2)) AS VARCHAR) AS total_spend,
           ROUND(2.0 * SUM(i * spend) / (COUNT(*) * SUM(spend))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM ranked
    """,
)
def customer_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the inequality/concentration
    scalar (0 = everyone spends alike, 1 = one whale) via the sorted-rank
    identity G = 2*Sum(i*x_i)/(n*Sum(x)) - (n+1)/n. Rank and the i*x_i
    products are exact (row_number over decimal spend, decimal products),
    so both engines fold identical terms; only the final ratio is
    floating. One customer-grain aggregate, one global sort of that
    aggregate — the fact table is never sorted."""
    o = t(spark, sf_dir, "orders")
    # portable cents quantizer: floor(x*100 + 0.5) is pure IEEE double
    # arithmetic, identical on both engines even on a float32-narrowed
    # fixture (.625 cent ties round HALF_UP in Spark's double->DECIMAL
    # cast but half-even in DuckDB's); spend IS NOT NULL: a customer
    # with no priced orders has no rank (Spark sorts NULL spend first,
    # DuckDB last — it must not rank)
    cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(
            money_quantize("o_totalprice")
        )
        .cast(DEC)
        .alias("spend")
    )
    ranked = cust.filter(F.col("spend").isNotNull()).select(
        "spend",
        F.row_number().over(Window.orderBy("spend", "custkey")).alias("i"),
    )
    n = F.count(F.lit(1))
    return ranked.agg(
        n.alias("n_customers"),
        F.sum("spend").cast(DEC).cast("string").alias("total_spend"),
        F.round(
            F.lit(2.0) * F.sum(F.col("i") * F.col("spend"))
            / (n * F.sum("spend"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )


@register(
    "dow_seasonality_index",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             dayofweek(CAST(ts AS DATE)) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3),
    base AS (
      SELECT event_type, ROUND(AVG(n), 6) AS overall_daily_avg
      FROM daily GROUP BY event_type)
    SELECT daily.event_type, dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(n), 6) AS dow_daily_avg,
           ROUND(AVG(n) / ANY_VALUE(base.overall_daily_avg), 6)
             AS seasonality_index
    FROM daily JOIN base USING (event_type)
    GROUP BY daily.event_type, dow
    """,
)
def dow_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type — avg daily volume on
    each weekday divided by the type's overall daily average (index > 1 =
    busier-than-usual weekday): the multiplicative seasonal profile that
    feeds staffing forecasts and anomaly baselines. Plan: one (type, day)
    count aggregate off the fact, a 5-row per-type baseline joined back
    broadcast-small, second tiny aggregate to the (type, dow) grid. DOW
    normalized to DuckDB's 0=Sunday..6 numbering (Spark's dayofweek is
    1-based)."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("d"),
        (F.dayofweek(F.to_date("ts")) - F.lit(1)).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    base = daily.groupBy("event_type").agg(
        F.round(F.avg("n"), 6).alias("overall_daily_avg")
    )
    return (
        daily.join(F.broadcast(base), "event_type")
        .groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.avg("n"), 6).alias("dow_daily_avg"),
            F.round(
                F.avg("n") / F.any_value(F.col("overall_daily_avg")), 6
            ).alias("seasonality_index"),
        )
    )


@register(
    "brand_basket_lift",
    """
    WITH ob AS (
      SELECT DISTINCT l_orderkey AS orderkey, p_brand AS brand
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    n AS (SELECT CAST(COUNT(DISTINCT orderkey) AS BIGINT) AS n_orders FROM ob),
    bc AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS c FROM ob GROUP BY brand),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM ob a JOIN ob b ON a.orderkey = b.orderkey AND a.brand < b.brand
      GROUP BY 1, 2)
    SELECT brand_a, brand_b, c_ab,
           ROUND(c_ab / CAST(n.n_orders AS DOUBLE), 6) AS support,
           ROUND(c_ab / CAST(ca.c AS DOUBLE), 6) AS confidence,
           ROUND((c_ab * CAST(n.n_orders AS DOUBLE)) / (ca.c * cb.c), 6)
             AS lift
    FROM pairs
    JOIN bc ca ON ca.brand = pairs.brand_a
    JOIN bc cb ON cb.brand = pairs.brand_b
    CROSS JOIN n
    WHERE c_ab >= 5
    """,
)
def brand_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over part brands — support,
    confidence and lift for every brand pair co-purchased in an order
    (min co-support 5): the frequent-itemset primitive behind
    recommendations and cross-sell. Brands are low-cardinality, so the
    pair space is bounded (~25^2) no matter the fact size; the pair join
    is orderkey-keyed (items-per-order fan-out, never all-pairs), brand
    marginals re-join broadcast-small, and the order total is a one-row
    broadcast. This is A-Priori's counting step with the candidate
    pruning done by the dimension's own cardinality."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("p_brand").alias("brand"),
        )
        .distinct()
    )
    n = ob.agg(F.count_distinct("orderkey").alias("n_orders"))
    bc = ob.groupBy("brand").agg(F.count(F.lit(1)).alias("c"))
    # r16 (guide §2.3, the brand_triple_itemsets r15 pattern): per-order
    # sorted brand sets + i<j pair explode replace the ob⋈ob self-join —
    # one orderkey exchange and a C(brands/order, 2) fan-out instead of
    # two distinct-side exchanges feeding an SMJ. collect_set dedups
    # (orderkey, brand) exactly like ob's DISTINCT, the sorted i<j
    # explode emits each unordered pair once with brand_a < brand_b
    # (exactly the old join predicate, which also drops NULL brands just
    # as collect_set skips them), and the NULL-orderkey filter mirrors
    # the old equi-join dropping NULL keys. bc/n keep reading ob: their
    # GROUP BY/COUNT see NULL-key rows the pair join never did.
    from dopams_etl_spark.partitioning import ensure_parallelism

    sets = (
        ensure_parallelism(
            li.filter(F.col("l_orderkey").isNotNull()), "l_orderkey"
        )
        .join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("l_orderkey"))
        .agg(F.sort_array(F.collect_set(F.col("p_brand"))).alias("bs"))
    )
    pairs = (
        sets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "bs",
                        lambda x, i: F.transform(
                            F.slice("bs", i + F.lit(2), F.size("bs") - i - 1),
                            lambda y: F.struct(
                                x.alias("brand_a"), y.alias("brand_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .groupBy(F.col("p.brand_a").alias("brand_a"), F.col("p.brand_b").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
    )
    ca = bc.select(F.col("brand").alias("brand_a"), F.col("c").alias("ca"))
    cb = bc.select(F.col("brand").alias("brand_b"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "c_ab",
            F.round(F.col("c_ab") / F.col("n_orders").cast("double"), 6).alias(
                "support"
            ),
            F.round(F.col("c_ab") / F.col("ca").cast("double"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("c_ab") * F.col("n_orders").cast("double"))
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "daily_autocorr_lags",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2),
    lagged AS (
      SELECT event_type, n,
             lag(n, 1) OVER w AS l1,
             lag(n, 2) OVER w AS l2,
             lag(n, 3) OVER w AS l3
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d))
    SELECT event_type, lag, n_days, autocorr FROM (
      SELECT event_type, 1 AS lag, CAST(COUNT(l1) AS BIGINT) AS n_days,
             ROUND(corr(n, l1), 6) + 0.0 AS autocorr FROM lagged GROUP BY 1
      UNION ALL
      SELECT event_type, 2, CAST(COUNT(l2) AS BIGINT),
             ROUND(corr(n, l2), 6) + 0.0
      FROM lagged GROUP BY 1
      UNION ALL
      SELECT event_type, 3, CAST(COUNT(l3) AS BIGINT),
             ROUND(corr(n, l3), 6) + 0.0
      FROM lagged GROUP BY 1)
    """,
)
def daily_autocorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1/2/3 autocorrelation of daily event volume per type — the
    serial-dependence diagnostic behind seasonality detection and
    forecast-model selection (high lag-1 = momentum; lag-7 would flag
    weekly cycles). The fact collapses to (type, day) counts first; the
    lag window and the three corr() aggregates run over that tiny
    per-type series, so the only fact-sized operation is one hash
    aggregate. corr's null-pair skipping makes the first k days drop out
    of lag k on both engines identically.

    Each coefficient is assembled from the throw-free POPULATION
    moments, pairwise-complete (the event_value_moments pattern):
    under ANSI, Spark's builtin corr ABORTS on a zero-variance series
    (an event type logging the identical daily count) where DuckDB
    yields NULL; try_divide supplies the NULL (r13 review — the same
    diff had already migrated this query's siblings)."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "n",
        F.lag("n", 1).over(w).alias("l1"),
        F.lag("n", 2).over(w).alias("l2"),
        F.lag("n", 3).over(w).alias("l3"),
    )
    def pcorr(x: Column, y: Column) -> Column:
        return F.try_divide(
            F.covar_pop(x, y),
            F.stddev_pop(F.when(y.isNotNull(), x))
            * F.stddev_pop(F.when(x.isNotNull(), y)),
        )

    parts = [
        lagged.groupBy("event_type").agg(
            F.lit(k).alias("lag"),
            F.count(f"l{k}").alias("n_days"),
            # + 0.0 canonicalizes IEEE -0.0 (autocorr is sign-indefinite)
            (F.round(pcorr(F.col("n"), F.col(f"l{k}")), 6) + 0.0).alias(
                "autocorr"
            ),
        )
        for k in (1, 2, 3)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "event_type_trend",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS DOUBLE) AS x,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(regr_slope(n, x), 6) + 0.0 AS slope,
           ROUND(regr_intercept(n, x), 4) + 0.0 AS intercept,
           ROUND(regr_r2(n, x), 6) AS r2
    FROM daily GROUP BY event_type
    """,
)
def event_type_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares linear trend of daily volume per event type —
    slope (events/day of growth), intercept, and R² via the built-in
    regression aggregates: the is-this-metric-growing primitive behind
    dashboards and alert thresholds. Both engines compute the same
    closed-form moments (regr_slope/intercept/r2 are single-pass
    mergeable aggregates, Spark 3.4+/DuckDB parity), so the plan is one
    (type, day) count aggregate plus one skinny per-type fold — nothing
    iterative, nothing sorted."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("double")
        .alias("x"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        # + 0.0 canonicalizes IEEE -0.0 (slope/intercept sign-indefinite)
        (F.round(F.expr("regr_slope(n, x)"), 6) + 0.0).alias("slope"),
        (F.round(F.expr("regr_intercept(n, x)"), 4) + 0.0).alias("intercept"),
        F.round(F.expr("regr_r2(n, x)"), 6).alias("r2"),
    )


@register(
    "cusum_changepoint",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, AVG(value) AS mean_v
      FROM events GROUP BY 1, 2),
    base AS (
      SELECT event_type, AVG(mean_v) AS grand_mean
      FROM daily GROUP BY event_type),
    cus AS (
      SELECT daily.event_type, d,
             SUM(mean_v - grand_mean)
               OVER (PARTITION BY daily.event_type ORDER BY d
                     ROWS UNBOUNDED PRECEDING) AS cusum
      FROM daily JOIN base USING (event_type)),
    ranked AS (
      SELECT event_type, d, cusum,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY abs(cusum) DESC, d) AS rn
      FROM cus)
    SELECT event_type, CAST(d AS VARCHAR) AS changepoint_date,
           ROUND(cusum, 6) + 0.0 AS peak_cusum
    FROM ranked WHERE rn = 1
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type — cumulative sum of
    each day's deviation from the type's grand mean; the day where
    |CUSUM| peaks is the most likely mean-shift point (Page's classic
    control-chart statistic). All heavy lifting happens after the fact
    collapses to (type, day) means: the deviation join is against a
    5-row baseline, the running sum orders a ~360-row per-type series,
    and the argmax is one more window over the same partition. Date
    order makes the double accumulation sequence identical on both
    engines."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.avg("value").alias("mean_v")
    )
    base = daily.groupBy("event_type").agg(
        F.avg("mean_v").alias("grand_mean")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cus = (
        daily.join(F.broadcast(base), "event_type")
        .select(
            "event_type",
            "d",
            F.sum(F.col("mean_v") - F.col("grand_mean")).over(w).alias("cusum"),
        )
    )
    rw = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), "d"
    )
    return (
        cus.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("d").cast("string").alias("changepoint_date"),
            # + 0.0 canonicalizes IEEE -0.0 (CUSUM is sign-indefinite)
            (F.round("cusum", 6) + 0.0).alias("peak_cusum"),
        )
    )


@register(
    "value_histogram_equiwidth",
    """
    -- CAST DOUBLE (r14 f32 census): bin edges and the (value - lo)
    -- subtraction must run in the same lane on both engines — float32
    -- edges flip boundary rows into the neighboring bucket
    WITH ev AS (SELECT CAST(value AS DOUBLE) AS value FROM events),
    b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM ev),
    bucketed AS (
      -- hi = lo (constant or single-row value column) makes the bin
      -- width 0: everything lands in bucket 0 instead of dividing by
      -- zero (ANSI abort Spark-side, NaN->INT cast error DuckDB-side)
      SELECT CASE WHEN hi > lo
                  THEN LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / 20.0))
                                  AS INT), 19)
                  ELSE 0 END AS bucket,
             lo, hi
      FROM ev CROSS JOIN b)
    SELECT bucket,
           ROUND(ANY_VALUE(lo) + bucket * (ANY_VALUE(hi) - ANY_VALUE(lo))
                 / 20.0, 6) AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6)
             AS share
    FROM bucketed GROUP BY bucket
    """,
)
def value_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event value (20 buckets between the
    global min/max) — the distribution profile every data-quality
    report opens with. The min/max bounds are a one-row aggregate
    broadcast back over the fact (the established scalar-broadcast
    shape, structurally whitelisted), bucketing is map-only arithmetic,
    and the result is one 20-row hash aggregate; the share denominator
    is a window over those 20 rows, not the fact."""
    # cast("double") at first use (r14 f32 census) — see the oracle note
    ev = t(spark, sf_dir, "events").select(
        F.col("value").cast("double").alias("value")
    )
    b = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(20.0)
    # zero-width guard (r13, fuzz census tiny1/const): hi = lo would
    # divide by zero under ANSI — everything belongs in bucket 0 then
    bucketed = ev.crossJoin(F.broadcast(b)).select(
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.floor((F.col("value") - F.col("lo")) / width).cast("int"),
                F.lit(19),
            ),
        )
        .otherwise(F.lit(0))
        .alias("bucket"),
        "lo",
        "hi",
    )
    grouped = bucketed.groupBy("bucket").agg(
        F.round(
            F.any_value(F.col("lo"))
            + F.col("bucket")
            * (F.any_value(F.col("hi")) - F.any_value(F.col("lo")))
            / F.lit(20.0),
            6,
        ).alias("bucket_lo"),
        F.count(F.lit(1)).alias("n"),
    )
    total_w = Window.partitionBy()
    return grouped.select(
        "bucket",
        "bucket_lo",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(total_w).cast("double"), 6
        ).alias("share"),
    )


@register(
    "rolling_weekly_active_users",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    mx AS (SELECT MAX(d) AS max_d FROM ud),
    contrib AS (
      SELECT DISTINCT user_id, d + CAST(o AS INT) AS day
      FROM ud, generate_series(0, 6) g(o))
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(COUNT(*) AS BIGINT) AS wau
    FROM contrib CROSS JOIN mx
    WHERE day <= max_d
    GROUP BY day
    """,
)
def rolling_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (trailing WAU) — the
    engagement curve every growth dashboard tracks. Distinct-count over
    a sliding window is not window-expressible in either engine, and a
    range self-join explodes at scale; the scale-correct restatement is
    the offset-explode trick: each (user, active-day) row contributes to
    the 7 calendar days it keeps the user 'active' for, then one
    distinct + one count per day. Shuffle volume is bounded at 7x the
    (user, day) distinct grain — linear in users, independent of
    per-user event volume. The max-date cap is a one-row broadcast."""
    ev = t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    mx = ud.agg(F.max("d").alias("max_d"))
    contrib = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
            "d",
        )
        .select("user_id", F.date_add(F.col("d"), F.col("o")).alias("day"))
        .distinct()
    )
    return (
        contrib.crossJoin(F.broadcast(mx))
        .filter(F.col("day") <= F.col("max_d"))
        .groupBy(F.col("day").cast("string").alias("day"))
        .agg(F.count(F.lit(1)).alias("wau"))
    )


@register(
    "doc_lexical_diversity",
    """
    WITH w AS (
      SELECT doc_id, x AS word, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS u(x)
      WHERE trim(text) <> ''
      GROUP BY doc_id, x)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           ROUND(COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS ttr,
           ROUND(COUNT(*) FILTER (WHERE c = 1)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_ratio
    FROM w GROUP BY doc_id
    """,
)
def doc_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio and hapax-legomena ratio per document — the
    lexical-diversity pair that separates template/boilerplate text
    (low TTR, few hapaxes) from natural prose, a standard pretraining
    quality signal beside the length/punct ratios. One explode to
    (doc, word) counts, one per-doc fold — both shuffles keyed on
    doc_id, no global state."""
    from dopams_etl_spark.functions.textfns import tokens

    docs = t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    w = (
        docs.select("doc_id", F.explode(tokens("text")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return w.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.count(F.lit(1)) / F.sum("c").cast("double"), 6).alias("ttr"),
        F.round(
            F.count_if(F.col("c") == 1) / F.count(F.lit(1)).cast("double"), 6
        ).alias("hapax_ratio"),
    )


@register(
    "corpus_zipf_slope",
    """
    WITH w AS (
      SELECT x AS word, CAST(COUNT(*) AS DOUBLE) AS c
      FROM documents,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS u(x)
      WHERE trim(text) <> ''
      GROUP BY x),
    ranked AS (
      SELECT word, c,
             ROW_NUMBER() OVER (ORDER BY c DESC, word) AS r
      FROM w)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
           ROUND(regr_slope(ln(c), ln(CAST(r AS DOUBLE))), 6) + 0.0
             AS zipf_slope,
           ROUND(regr_r2(ln(c), ln(CAST(r AS DOUBLE))), 6) AS fit_r2,
           ANY_VALUE(CASE WHEN r = 1 THEN word END) AS top_word
    FROM ranked WHERE r <= 100
    """,
)
def corpus_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus: least-squares slope of
    log-frequency vs log-rank for the top-100 words (natural text sits
    near −1; heavily templated or synthetic corpora deviate) — a one-row
    corpus health check beside corpus_profile. The word count is one
    hash aggregate; ranking sorts only the word-frequency table (vocab-
    sized, not corpus-sized) and the top-100 regression folds 100 rows.
    Rank ties broken by word for a deterministic cut at r=100."""
    from dopams_etl_spark.functions.textfns import tokens

    docs = t(spark, sf_dir, "documents").filter(F.trim("text") != "")
    w = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    ranked = w.select(
        "word",
        "c",
        F.row_number().over(Window.orderBy(F.col("c").desc(), "word")).alias("r"),
    ).filter(F.col("r") <= 100)
    lr = F.log(F.col("r").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_words"),
        # + 0.0 canonicalizes IEEE -0.0 (the slope is ~-1, but a flat
        # ranked tail can put the rounded value on a signed-zero boundary)
        (
            F.round(F.expr("regr_slope(ln(c), ln(CAST(r AS DOUBLE)))"), 6)
            + 0.0
        ).alias("zipf_slope"),
        F.round(F.expr("regr_r2(ln(c), ln(CAST(r AS DOUBLE)))"), 6).alias(
            "fit_r2"
        ),
        F.any_value(
            F.when(F.col("r") == 1, F.col("word")), ignoreNulls=True
        ).alias("top_word"),
    )


@register(
    "heaps_vocab_growth",
    """
    WITH tk AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END
               AS n_tokens
      FROM documents),
    first_seen AS (
      SELECT x AS word, MIN(doc_id) AS first_doc
      FROM documents,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS u(x)
      WHERE trim(text) <> ''
      GROUP BY x),
    new_types AS (
      SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS new_t
      FROM first_seen GROUP BY first_doc)
    SELECT tk.doc_id,
           CAST(SUM(tk.n_tokens) OVER w AS BIGINT) AS cum_tokens,
           CAST(SUM(COALESCE(new_t, 0)) OVER w AS BIGINT) AS cum_vocab
    FROM tk LEFT JOIN new_types ON tk.doc_id = new_types.doc_id
    WINDOW w AS (ORDER BY tk.doc_id ROWS UNBOUNDED PRECEDING)
    """,
)
def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve — cumulative distinct
    vocabulary vs cumulative tokens in doc_id order: the
    diminishing-returns curve that answers 'how much new language does
    the next TB of data actually add'. A naive cumulative-distinct is
    quadratic; the scale-correct restatement assigns each word to its
    FIRST document (one min-aggregate on the word key), so the curve
    becomes a per-doc new-type count plus one running sum over the
    doc-grain table. The only corpus-sized shuffle is the word-key
    aggregate — same family as the dedup fingerprint passes."""
    from dopams_etl_spark.functions.textfns import token_count, tokens

    docs = t(spark, sf_dir, "documents")
    tk = docs.select("doc_id", token_count("text").alias("n_tokens"))
    first_seen = (
        docs.filter(F.trim("text") != "")
        .select("doc_id", F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    new_types = first_seen.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("new_t")
    )
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return tk.join(new_types, "doc_id", "left").select(
        "doc_id",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
        F.sum(F.coalesce(F.col("new_t"), F.lit(0))).over(w).alias("cum_vocab"),
    )


@register(
    "lang_char_divergence",
    """
    WITH letters AS (
      SELECT lang, x AS ch
      FROM documents,
           unnest(regexp_extract_all(lower(text), '[a-z]')) AS u(x)),
    lc AS (SELECT lang, ch, CAST(COUNT(*) AS DOUBLE) AS c
           FROM letters GROUP BY 1, 2),
    ln_ AS (SELECT lang, SUM(c) AS n FROM lc GROUP BY lang),
    corpus AS (SELECT ch, CAST(SUM(c) AS DOUBLE) AS cc FROM lc GROUP BY ch),
    corpus_n AS (SELECT SUM(cc) AS cn FROM corpus),
    grid AS (
      SELECT ln_.lang, corpus.ch, COALESCE(lc.c, 0.0) AS c,
             ln_.n, corpus.cc, corpus_n.cn
      FROM ln_ CROSS JOIN corpus CROSS JOIN corpus_n
      LEFT JOIN lc ON lc.lang = ln_.lang AND lc.ch = corpus.ch)
    SELECT lang, CAST(ANY_VALUE(n) AS BIGINT) AS n_letters,
           ROUND(SUM(((c + 1) / (n + 26))
                     * ln(((c + 1) / (n + 26)) / ((cc + 1) / (cn + 26)))), 6)
             AS kl_divergence
    FROM grid GROUP BY lang
    """,
)
def lang_char_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each language's letter distribution from the
    corpus-wide distribution (add-one smoothed over [a-z]) — the
    distribution-shift score behind language-mix monitoring and drift
    alerts (a lang whose KL jumps between snapshots changed character).
    The fact collapses to a (lang, letter) grid of at most 26·|langs|
    cells in one aggregate; the full grid is generated map-side by
    exploding a literal a-z array per language row (no cross join in
    the plan), corpus marginals re-join broadcast-small on the letter
    key, the corpus total is the one-row scalar broadcast, and the left
    join keeps zero-count cells explicit so smoothing matches exactly
    on both engines."""
    import string

    docs = t(spark, sf_dir, "documents")
    letters = docs.select(
        "lang",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]', 0)")
        ).alias("ch"),
    )
    lc = letters.groupBy("lang", "ch").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    ln_ = lc.groupBy("lang").agg(F.sum("c").alias("n"))
    corpus = lc.groupBy("ch").agg(F.sum("c").cast("double").alias("cc"))
    corpus_n = corpus.agg(F.sum("cc").alias("cn"))
    alphabet = F.array(*[F.lit(ch) for ch in string.ascii_lowercase])
    grid = (
        ln_.select("lang", "n", F.explode(alphabet).alias("ch"))
        .join(F.broadcast(corpus), "ch")
        .crossJoin(F.broadcast(corpus_n))
        .join(lc, ["lang", "ch"], "left")
        .select(
            "lang",
            "ch",
            F.coalesce(F.col("c"), F.lit(0.0)).alias("c"),
            "n",
            "cc",
            "cn",
        )
    )
    p = (F.col("c") + 1) / (F.col("n") + 26)
    q = (F.col("cc") + 1) / (F.col("cn") + 26)
    return grid.groupBy("lang").agg(
        F.any_value(F.col("n")).cast("bigint").alias("n_letters"),
        F.round(F.sum(p * F.log(p / q)), 6).alias("kl_divergence"),
    )


@register(
    "trigram_novelty_rate",
    """
    WITH tk AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents WHERE trim(text) <> ''),
    g AS (
      SELECT DISTINCT doc_id,
             toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS gram
      FROM tk, unnest(generate_series(1, len(toks) - 2)) AS s(i)
      WHERE len(toks) >= 3),
    fs AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(*) FILTER (WHERE fs.first_doc = g.doc_id) AS BIGINT)
             AS novel_grams,
           ROUND(COUNT(*) FILTER (WHERE fs.first_doc = g.doc_id)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS novelty_rate
    FROM g JOIN fs USING (gram)
    GROUP BY g.doc_id
    """,
)
def trigram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty rate — the fraction of a doc's distinct word
    trigrams never seen in any earlier document (doc_id order): the
    repetition/memorization signal that flags near-boilerplate additions
    to a growing corpus (novelty ~0 = the doc restates what the corpus
    already has). Trigrams are built map-side from the token array; the
    first-seen pass is one min-aggregate on the gram key (the span-dedup
    shuffle family) and the verdict re-joins on the same key — cost
    linear in total trigrams, never pairwise in documents."""
    from dopams_etl_spark.functions.textfns import tokens
    from dopams_etl_spark.partitioning import ensure_parallelism

    # r15 (guide §2.4): the tokenize + gram explode feeds two references
    # (first-seen aggregate + the verdict join) at one-task scan
    # parallelism. Keyed spread; min/count aggregates order-invariant.
    docs = ensure_parallelism(
        t(spark, sf_dir, "documents").filter(F.trim("text") != ""), "doc_id"
    )
    tk = docs.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= 3
    )
    g = tk.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 3),"
                " i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]))"
            )
        ).alias("gram"),
    ).distinct()
    fs = g.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return (
        g.join(fs, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(F.col("first_doc") == F.col("doc_id")).alias(
                "novel_grams"
            ),
            F.round(
                F.count_if(F.col("first_doc") == F.col("doc_id"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("novelty_rate"),
        )
    )


def _rrf_oracle() -> str:
    from dopams_etl_spark.plans.textops import _BM25_CTES

    return "WITH " + _BM25_CTES + ann_notnull(
        """,
    bm AS (SELECT query_id, doc_id, rank AS bm25_rank FROM r WHERE rank <= 20),
    p AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS pv
          FROM embeddings WHERE vec_id IN (1, 2, 3)),
    c AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS cv FROM embeddings),
    s AS (SELECT p.query_id, c.doc_id,
                 ROUND(list_dot_product(pv, cv)
                       / (sqrt(list_dot_product(pv, pv))
                          * sqrt(list_dot_product(cv, cv))), 6) AS cos_sim
          FROM p JOIN c ON p.query_id <> c.doc_id),
    vr AS (SELECT query_id, doc_id, rn AS vec_rank FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos_sim DESC, doc_id ASC)
                         AS rn
             FROM s) WHERE rn <= 20),
    fused AS (
      SELECT COALESCE(bm.query_id, vr.query_id) AS query_id,
             COALESCE(bm.doc_id, vr.doc_id) AS doc_id,
             CAST(COALESCE(bm25_rank, 0) AS INT) AS bm25_rank,
             CAST(COALESCE(vec_rank, 0) AS INT) AS vec_rank,
             ROUND(COALESCE(1.0 / (60 + bm25_rank), 0.0)
                   + COALESCE(1.0 / (60 + vec_rank), 0.0), 6) AS rrf_score
      FROM bm FULL OUTER JOIN vr
        ON bm.query_id = vr.query_id AND bm.doc_id = vr.doc_id),
    final AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, doc_id ASC) AS rank
      FROM fused)
    SELECT query_id, doc_id, bm25_rank, vec_rank, rrf_score,
           CAST(rank AS INT) AS rank
    FROM final WHERE rank <= 10
    """
    )  # ann_notnull scopes to the vector arm: _BM25_CTES reads documents only


@register("rrf_fused_search", _rrf_oracle())
def rrf_fused_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of lexical and vector retrieval — each
    ranker contributes 1/(60+rank) for its top-20, summed per (query,
    doc), top-10 refused (Cormack et al.'s RRF, the standard
    score-free fusion that needs no calibration between BM25 scores and
    cosines, unlike hybrid_search_docs' weighted blend — the two
    queries cover both fusion families). BM25 candidates come from the
    broadcast-probe inverted index, vector candidates from the
    size-gated exact top-k; the fusion join touches ≤ 40 rows per
    query, so fusion cost is independent of corpus size."""
    from dopams_etl_spark.operators.search import bm25_topk
    from dopams_etl_spark.operators.similarity import cosine_topk

    docs = t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [(1, "spark batch stream"), (2, "window merge sort"),
         (3, "customer vector quality")],
        ["query_id", "query_text"],
    )
    bm = bm25_topk(docs, queries, "doc_id", "text", k=20).select(
        "query_id", "doc_id", F.col("rank").alias("bm25_rank")
    )
    emb = t(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id").isin(1, 2, 3))
    vec = cosine_topk(probe, emb, "vec_id", "vec_id", "embedding", k=20).select(
        F.col("p_id").alias("query_id"),
        F.col("c_id").alias("doc_id"),
        F.col("rank").alias("vec_rank"),
    )
    fused = bm.join(vec, ["query_id", "doc_id"], "full").select(
        "query_id",
        "doc_id",
        F.coalesce(F.col("bm25_rank"), F.lit(0)).cast("int").alias("bm25_rank"),
        F.coalesce(F.col("vec_rank"), F.lit(0)).cast("int").alias("vec_rank"),
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("vec_rank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .withColumn("rank", F.col("rank").cast("int"))
    )


@register(
    "sorted_neighborhood_pairs",
    """
    WITH s AS (
      SELECT c_custkey, lower(trim(c_name)) AS nm,
             ROW_NUMBER() OVER (ORDER BY lower(trim(c_name)), c_custkey)
               AS pos
      FROM customer),
    pairs AS (
      SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
             a.nm AS name_a, b.nm AS name_b,
             CAST(b.pos - a.pos AS INT) AS window_dist,
             ROUND(1.0 - levenshtein(a.nm, b.nm)
                   / CAST(GREATEST(len(a.nm), len(b.nm)) AS DOUBLE), 6)
               AS sim
      FROM s a JOIN s b ON b.pos - a.pos BETWEEN 1 AND 3)
    SELECT custkey_a, custkey_b, window_dist, sim
    FROM pairs WHERE sim >= 0.9
    """,
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity-resolution blocking (Hernández &
    Stolfo) — sort on a normalized name key, compare each record only to
    its next w=3 neighbors, keep candidates at edit-ratio ≥ 0.9: the
    complementary blocking family to soundex blocking (J11), catching
    typo-adjacent names phonetic codes split. Candidate volume is
    w·N by construction, never quadratic. The lead() restatement keeps
    it one window over the sorted dimension — at cluster scale the sort
    becomes a range partition and neighbors stay within ±w of a
    partition boundary (handled by the standard boundary-overlap
    replication)."""
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", F.lower(F.trim("c_name")).alias("nm")
    )
    w = Window.orderBy("nm", "c_custkey")
    s = cust.withColumn("pos", F.row_number().over(w))
    lead_w = Window.orderBy("pos")
    pairs = []
    for d in (1, 2, 3):
        pairs.append(
            s.select(
                F.col("c_custkey").alias("custkey_a"),
                F.col("nm").alias("name_a"),
                F.lead("c_custkey", d).over(lead_w).alias("custkey_b"),
                F.lead("nm", d).over(lead_w).alias("name_b"),
                F.lit(d).alias("window_dist"),
            ).filter(F.col("custkey_b").isNotNull())
        )
    cand = pairs[0]
    for p in pairs[1:]:
        cand = cand.unionByName(p)
    sim = F.round(
        F.lit(1.0)
        - F.levenshtein("name_a", "name_b")
        / F.greatest(F.length("name_a"), F.length("name_b")).cast("double"),
        6,
    )
    return (
        cand.withColumn("sim", sim)
        .filter(F.col("sim") >= 0.9)
        .select("custkey_a", "custkey_b", "window_dist", "sim")
    )


@register(
    "graph_degree_histogram",
    """
    WITH e AS (
      SELECT DISTINCT l_suppkey AS supp, o_custkey AS cust
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    deg AS (
      SELECT 'supplier' AS side, supp AS node,
             CAST(COUNT(*) AS BIGINT) AS degree
      FROM e GROUP BY supp
      UNION ALL
      SELECT 'customer', cust, CAST(COUNT(*) AS BIGINT) FROM e GROUP BY cust),
    n AS (SELECT side, CAST(COUNT(*) AS BIGINT) AS n_side
          FROM deg GROUP BY side)
    SELECT deg.side, degree, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           ROUND(COUNT(*) / CAST(ANY_VALUE(n.n_side) AS DOUBLE), 6) AS share
    FROM deg JOIN n USING (side)
    GROUP BY deg.side, degree
    """,
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the supplier↔customer bipartite graph —
    the first diagnostic before any graph algorithm (PageRank, BFS,
    triangles all live in this module family): a heavy right tail says
    'salt these hub keys before the joins'. One distinct-edge
    aggregate, one degree count per side, one histogram fold — every
    shuffle keyed on node or (side, degree), nothing pairwise."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("l_suppkey").alias("supp"), F.col("o_custkey").alias("cust"))
        .distinct()
    )
    deg = (
        e.groupBy(F.col("supp").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.lit("supplier").alias("side"), "node", "degree")
        .unionByName(
            e.groupBy(F.col("cust").alias("node"))
            .agg(F.count(F.lit(1)).alias("degree"))
            .select(F.lit("customer").alias("side"), "node", "degree")
        )
    )
    n = deg.groupBy("side").agg(F.count(F.lit(1)).alias("n_side"))
    return (
        deg.join(F.broadcast(n), "side")
        .groupBy("side", "degree")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.round(
                F.count(F.lit(1)) / F.any_value(F.col("n_side")).cast("double"),
                6,
            ).alias("share"),
        )
    )


@register(
    "bucketed_order_revenue",
    """
    -- portable 4-dp quantizer (r14 f32 census): the per-row product of
    -- two 2-dp measures sits exactly on the 1e-4 grid, so
    -- floor(x*10000 + 0.5) on the promoted double recovers it exactly
    -- on both engines — the old per-side DECIMAL casts reached Spark
    -- through the shortest float repr but DuckDB through the exact
    -- float value on a float32-narrowed fixture
    SELECT o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(CAST(CAST(SUM(CAST(floor(CAST(l_extendedprice AS DOUBLE)
                                          * (1 - CAST(l_discount AS DOUBLE))
                                          * 10000 + 0.5) AS BIGINT))
                          AS DECIMAL(38,0)) / 10000
                     AS DECIMAL(18,4)) AS VARCHAR) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey
    """,
)
def bucketed_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join with ZERO shuffles — orders and lineitem are
    written as 8-bucket bucketed tables on the order key, then
    sort-merge joined and aggregated per order entirely exchange-free
    (bucket i zips with bucket i; the groupBy inherits the join's
    partitioning). This is THE 100 TB pattern for recurring big-big
    joins: pay the partitioning once at write time, amortize it over
    every downstream join and aggregation.
    ``test_scale_posture.py::test_bucketed_join_no_exchange`` asserts
    the Exchange-free plan, so the property is machine-checked. The
    oracle is the plain join — bucketing must be invisible to results.
    Table names and the warehouse path carry the APPLICATION id, so
    concurrent sessions (driver sampling beside a local check, parallel
    pytest) can't race on shared tables, while repeat calls within one
    session overwrite the same pair instead of leaking a new bucketed
    copy of orders+lineitem per invocation (queries run sequentially in
    a session, so same-session reuse cannot race). This application's
    base dir is removed at interpreter exit (atexit — the returned
    DataFrame is lazy, so cleanup must outlive the query), and stale
    ``dopams_bucketed_*`` dirs abandoned by DEAD prior applications are
    swept when older than a day AND their embedded owner pid no longer
    runs — age alone never kills a live long-running session's
    scratch."""
    import os
    import re
    import tempfile

    from dopams_etl_spark.operators.bucketing import (
        bucketed_equijoin,
        cleanup_bucketed_at_exit,
        sweep_stale_bucketed_dirs,
        write_bucketed,
    )

    orders = t(spark, sf_dir, "orders").select("o_orderkey")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    run = re.sub(r"[^0-9a-zA-Z]", "", spark.sparkContext.applicationId)[-16:]
    base = os.path.join(
        tempfile.gettempdir(), f"dopams_bucketed_{run}_pid{os.getpid()}"
    )
    t_o, t_l = f"b_orders_{run}", f"b_lineitem_{run}"
    write_bucketed(orders, t_o, "o_orderkey", 8, f"{base}/{t_o}")
    write_bucketed(li, t_l, "l_orderkey", 8, f"{base}/{t_l}")
    cleanup_bucketed_at_exit(spark, base, (t_o, t_l))
    sweep_stale_bucketed_dirs(os.path.dirname(base), keep=base)
    joined = bucketed_equijoin(spark, t_o, t_l, "o_orderkey", "l_orderkey")
    # portable 4-dp quantizer (r14 f32 census) — see the oracle note;
    # integer sums are also partitioning-invariant, like money_cents
    dmc = F.floor(
        F.col("l_extendedprice").cast("double")
        * (1 - F.col("l_discount").cast("double"))
        * 10000
        + F.lit(0.5)
    ).cast("long")
    return (
        joined.groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(dmc).alias("_rc"),
        )
        .select(
            "o_orderkey",
            "n_items",
            (F.col("_rc").cast("decimal(38,0)") / 10000)
            .cast("decimal(18,4)")
            .cast("string")
            .alias("revenue"),
        )
    )


@register(
    "part_affinity_topk",
    """
    WITH ob AS (
      SELECT DISTINCT l_orderkey AS orderkey, l_partkey AS partkey
      FROM lineitem),
    m AS (SELECT partkey, CAST(COUNT(*) AS BIGINT) AS c
          FROM ob GROUP BY partkey),
    pairs AS (
      SELECT a.partkey AS part_a, b.partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM ob a JOIN ob b
        ON a.orderkey = b.orderkey AND a.partkey <> b.partkey
      GROUP BY 1, 2),
    scored AS (
      SELECT part_a, part_b, c_ab,
             ROUND(c_ab / CAST(ca.c + cb.c - c_ab AS DOUBLE), 6) AS jaccard
      FROM pairs
      JOIN m ca ON ca.partkey = pairs.part_a
      JOIN m cb ON cb.partkey = pairs.part_b),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY part_a
                                   ORDER BY jaccard DESC, part_b ASC) AS rn
      FROM scored)
    SELECT part_a, part_b, c_ab, jaccard, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= 5
    """,
)
def part_affinity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering — top-5 most-affine parts per
    part by co-purchase Jaccard (bought-together over bought-either):
    the 'customers also bought' neighbor list, and the item-grain
    sibling of brand_basket_lift's rule mining. The pair space never
    materializes all-pairs: candidates form only through the
    orderkey-keyed self-join, so fan-out is items-per-basket squared
    per order (a small constant), and marginals re-join on the item
    key. Ranking windows partition by item — at 100 TB every shuffle
    here is keyed, bounded, and salting-friendly."""
    li = t(spark, sf_dir, "lineitem")
    ob = li.select(
        F.col("l_orderkey").alias("orderkey"), F.col("l_partkey").alias("partkey")
    ).distinct()
    m = ob.groupBy("partkey").agg(F.count(F.lit(1)).alias("c"))
    a = ob.alias("a")
    b = ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.orderkey") == F.col("b.orderkey"))
            & (F.col("a.partkey") != F.col("b.partkey")),
        )
        .groupBy(
            F.col("a.partkey").alias("part_a"), F.col("b.partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    ca = m.select(F.col("partkey").alias("part_a"), F.col("c").alias("ca"))
    cb = m.select(F.col("partkey").alias("part_b"), F.col("c").alias("cb"))
    scored = (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .select(
            "part_a",
            "part_b",
            "c_ab",
            F.round(
                F.col("c_ab")
                / (F.col("ca") + F.col("cb") - F.col("c_ab")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    w = Window.partitionBy("part_a").orderBy(
        F.col("jaccard").desc(), F.col("part_b").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .withColumn("rank", F.col("rank").cast("int"))
    )


@register(
    "user_burstiness",
    """
    WITH g AS (
      SELECT user_id,
             epoch(ts) - lag(epoch(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events)
    SELECT user_id, CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           ROUND(AVG(gap), 4) AS mean_gap_s,
           ROUND(stddev_samp(gap), 4) AS sd_gap_s,
           ROUND((stddev_samp(gap) - AVG(gap))
                 / NULLIF(stddev_samp(gap) + AVG(gap), 0.0), 6) + 0.0
             AS burstiness
    FROM g WHERE gap IS NOT NULL
    GROUP BY user_id HAVING COUNT(gap) >= 2
    """,
)
def user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event burstiness per user — Goh & Barabási's
    B = (σ−μ)/(σ+μ) over the gaps between consecutive events (−1 =
    metronome, 0 = Poisson, →1 = bursty): the temporal-signature
    feature that separates scripted traffic (near-periodic, B≈−1)
    from organic sessions. One user-keyed window for the gaps, one
    user-keyed fold for the moments — no global state. Sub-second
    precision survives via the fractional epoch cast on both
    engines."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("double")
    g = ev.select(
        "user_id", (sec - F.lag(sec).over(w.orderBy("ts", "event_id"))).alias("gap")
    ).filter(F.col("gap").isNotNull())
    sd = F.stddev_samp("gap")
    mu = F.avg("gap")
    return (
        g.groupBy("user_id")
        .agg(
            F.count("gap").alias("n_gaps"),
            F.round(mu, 4).alias("mean_gap_s"),
            F.round(sd, 4).alias("sd_gap_s"),
            # + 0.0 canonicalizes IEEE -0.0 (B < 0 for regular traffic);
            # try_divide/NULLIF: all-zero gaps make sd + mu = 0 (0/0)
            (F.round(F.try_divide(sd - mu, sd + mu), 6) + 0.0).alias(
                "burstiness"
            ),
        )
        .filter(F.col("n_gaps") >= 2)
    )


@register(
    "benford_order_totals",
    """
    WITH d AS (
      SELECT CAST(FLOOR(o_totalprice
                        / power(10, FLOOR(log10(o_totalprice)))) AS INT)
               AS digit
      FROM orders WHERE o_totalprice > 0),
    c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT digit, n,
           ROUND(n / CAST(total AS DOUBLE), 6) AS observed,
           ROUND(log10(1.0 + 1.0 / digit), 6) AS expected,
           ROUND(power(n / CAST(total AS DOUBLE)
                       - log10(1.0 + 1.0 / digit), 2)
                 / log10(1.0 + 1.0 / digit), 6) AS chi2_term
    FROM c CROSS JOIN tot
    """,
)
def benford_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit test over order totals — observed vs
    expected log10(1+1/d) share per leading digit with the chi-square
    contribution: the classic fabricated-numbers screen in financial
    auditing. The digit is pure math (no string formatting, which
    differs across engines): floor(x / 10^floor(log10 x)) on identical
    doubles. One 9-row aggregate; the total is a one-row broadcast."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.floor(
        F.col("o_totalprice") / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("int")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = c.agg(F.sum("n").alias("total"))
    observed = F.col("n") / F.col("total").cast("double")
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return c.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.round(observed, 6).alias("observed"),
        F.round(expected, 6).alias("expected"),
        F.round(F.pow(observed - expected, 2) / expected, 6).alias("chi2_term"),
    )


@register(
    "order_cycle_percentiles",
    """
    WITH cyc AS (
      SELECT o_orderpriority,
             datediff('day', o_orderdate, l_shipdate) AS days
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(days) AS BIGINT) AS min_days,
           ROUND(quantile_cont(days, 0.5), 4) AS p50_days,
           ROUND(quantile_cont(days, 0.9), 4) AS p90_days,
           CAST(MAX(days) AS BIGINT) AS max_days
    FROM cyc GROUP BY o_orderpriority
    """,
)
def order_cycle_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship cycle time percentiles per priority class — the
    operational-SLA metric (does 1-URGENT actually ship faster?).
    Exact interpolated percentiles over the joined fact; one priority-
    keyed aggregate after the orderkey equi-join. The grouped-percentile
    convention follows event_value_percentiles: exact F.percentile here,
    percentile_approx documented as the gigarow-cardinality swap."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cyc = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").alias("days"),
    )
    return cyc.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("days").cast("bigint").alias("min_days"),
        F.round(F.percentile("days", F.lit(0.5)), 4).alias("p50_days"),
        F.round(F.percentile("days", F.lit(0.9)), 4).alias("p90_days"),
        F.max("days").cast("bigint").alias("max_days"),
    )


def _write_binmedia_fixture() -> str:
    """Deterministic binary fixture files (same bytes every run) standing
    in for a media landing directory — the container has no real
    image/audio assets, so the ingest path is exercised on seeded bytes."""
    import os

    d = "/tmp/dopams_binmedia"
    os.makedirs(d, exist_ok=True)
    for name, n in [("a", 64), ("b", 256), ("c", 1024)]:
        path = f"{d}/{name}.bin"
        payload = bytes((i * 7 + n) % 256 for i in range(n))
        if not (os.path.exists(path) and os.path.getsize(path) == n):
            with open(path, "wb") as f:
                f.write(payload)
    return d


@register(
    "binary_file_ingest",
    """
    SELECT regexp_extract(filename, '[^/]+$') AS file_name,
           CAST(size AS BIGINT) AS n_bytes,
           hex(content) AS content_hex
    FROM read_blob('/tmp/dopams_binmedia/*.bin')
    """,
)
def binary_file_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media ingest through Spark's built-in
    ``binaryFile`` source — the landing step of the multimodal pipeline
    (S12 family: the reference's media server stores files and serves
    bytes; here the bytes become a typed (path, length, content) row
    ready for the mapInPandas decode operators in
    ``operators/multimodal.py``). Each file is one row — at scale the
    source parallelizes per-file and prunes with pathGlobFilter;
    content verified byte-for-byte via hex against the oracle's
    read_blob of the same fixture files."""
    d = _write_binmedia_fixture()
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(d)
    )
    return bf.select(
        F.regexp_extract(F.col("path"), "[^/]+$", 0).alias("file_name"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.hex(F.col("content")).alias("content_hex"),
    )


def _lpa_oracle(n_iter: int = 3) -> str:
    """Unrolled-CTE replica of ``graph.label_propagation``: identical
    rounds, identical (count DESC, label ASC) vote ordering."""
    parts = [
        """
    e AS (SELECT DISTINCT l_suppkey AS u, o_custkey + 1000000 AS v
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    nodes AS (SELECT u FROM e UNION SELECT v FROM e),
    sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e
            UNION SELECT u, u FROM nodes),
    l0 AS (SELECT u AS node, u AS label FROM nodes)"""
    ]
    for i in range(n_iter):
        parts.append(
            f"""
    l{i + 1} AS (SELECT u AS node, label FROM (
        SELECT s.u, l.label, COUNT(*) AS c,
               row_number() OVER (PARTITION BY s.u
                                  ORDER BY COUNT(*) DESC, l.label ASC) AS rn
        FROM sym s JOIN l{i} l ON s.v = l.node
        GROUP BY s.u, l.label) WHERE rn = 1)"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT CAST(node AS BIGINT) AS node,
           CAST(community AS BIGINT) AS community
    FROM (SELECT node, label AS community FROM l{n_iter})
    """
    )


@register("label_propagation_communities", _lpa_oracle(3))
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the supplier↔customer graph via
    deterministic synchronous label propagation (3 rounds, min-label
    ties, self-vote damping) — the clustering step between the graph
    diagnostics (degree histogram, triangles) and downstream per-
    community treatment (domain caps, stratified sampling). The oracle
    replays the exact rounds as unrolled CTEs, value-checking the
    iterative DataFrame loop against declarative SQL — same contract as
    pagerank/BFS. One keyed count aggregate + one node-keyed window per
    round."""
    from dopams_etl_spark.operators.graph import label_propagation

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + F.lit(1000000)).alias("dst"),
        )
        .distinct()
    )
    out = label_propagation(edges, n_iter=3)
    return out.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("community").cast("bigint").alias("community"),
    )


@register(
    "seasonal_naive_backtest",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2),
    f AS (
      SELECT event_type, n,
             lag(n, 7) OVER (PARTITION BY event_type ORDER BY d) AS fc
      FROM daily)
    SELECT event_type,
           CAST(COUNT(fc) AS BIGINT) AS n_days_scored,
           ROUND(AVG(abs(n - fc)), 4) AS mae,
           ROUND(sqrt(AVG(power(n - fc, 2))), 4) AS rmse,
           ROUND(AVG(abs(n - fc) / n), 6) AS mape
    FROM f WHERE fc IS NOT NULL
    GROUP BY event_type
    """,
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest — predict each day's volume
    with the value 7 days earlier and score MAE/RMSE/MAPE per event
    type: the baseline every real forecasting model must beat, and the
    cheapest drift alarm (MAPE jumping week-over-week = the series
    changed shape). One (type, day) aggregate, one lag window over the
    tiny per-type series, one scoring fold."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    f = daily.select(
        "event_type", "n", F.lag("n", 7).over(w).alias("fc")
    ).filter(F.col("fc").isNotNull())
    err = F.col("n") - F.col("fc")
    return f.groupBy("event_type").agg(
        F.count("fc").alias("n_days_scored"),
        F.round(F.avg(F.abs(err)), 4).alias("mae"),
        F.round(F.sqrt(F.avg(F.pow(err, 2))), 4).alias("rmse"),
        F.round(F.avg(F.abs(err) / F.col("n")), 6).alias("mape"),
    )


@register(
    "ab_test_proportion_z",
    """
    WITH assign AS (
      SELECT DISTINCT user_id,
             __MD5_COHORT__ AS grp
      FROM events),
    conv AS (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      GROUP BY user_id HAVING COUNT(*) >= 14),
    pergrp AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(conv.user_id) AS BIGINT) AS conversions
      FROM assign LEFT JOIN conv USING (user_id)
      GROUP BY grp),
    wide AS (
      SELECT
        MAX(CASE WHEN grp = 0 THEN n END) AS n_a,
        MAX(CASE WHEN grp = 1 THEN n END) AS n_b,
        MAX(CASE WHEN grp = 0 THEN conversions END) AS conv_a,
        MAX(CASE WHEN grp = 1 THEN conversions END) AS conv_b
      FROM pergrp)
    -- NULLIF: a degenerate experiment (zero or all-converted pool) zeroes
    -- the pooled variance - NULL z on both engines. + 0.0 canonicalizes
    -- IEEE -0.0 (z_stat is sign-indefinite)
    SELECT n_a, n_b, conv_a, conv_b,
           ROUND(conv_a / CAST(n_a AS DOUBLE), 6) AS p_a,
           ROUND(conv_b / CAST(n_b AS DOUBLE), 6) AS p_b,
           ROUND((conv_b / CAST(n_b AS DOUBLE) - conv_a / CAST(n_a AS DOUBLE))
                 / NULLIF(sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                        * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                        * (1.0 / n_a + 1.0 / n_b)), 0.0), 4) + 0.0 AS z_stat
    FROM wide
    """.replace("__MD5_COHORT__", md5_cohort_sql("ab-v1", "user_id")),
)
def ab_test_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout — users deterministically hash-split
    50/50 (the md5 split-key convention shared with
    train_val_test_split), conversion = reached a purchase event, and
    the pooled two-proportion z-statistic scores the lift: the
    experimentation primitive every product pipeline ends at. Under a
    null split the z should hover near 0 — a drifting z on a no-op
    split flags a broken assignment hash (the classic A/A test).
    Conversion is thresholded (≥ 14 purchases, the per-user median) so
    the proportion is non-degenerate — p=0 or 1 puts zero in the
    pooled-variance denominator. Two user-keyed aggregates, one 2-row
    aggregate, one scalar fold."""
    ev = t(spark, sf_dir, "events")
    grp = md5_cohort("ab-v1", "user_id")
    assign = ev.select("user_id").distinct().select("user_id", grp.alias("grp"))
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purch"))
        .filter(F.col("n_purch") >= 14)
        .select("user_id", F.lit(1).alias("converted"))
    )
    pergrp = (
        assign.join(conv, "user_id", "left")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("converted").alias("conversions"),
        )
    )
    wide = pergrp.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("grp") == 0, F.col("conversions"))).alias("conv_a"),
        F.max(F.when(F.col("grp") == 1, F.col("conversions"))).alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a").cast("double")
    p_b = F.col("conv_b") / F.col("n_b").cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    return wide.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        # try_divide: a zero/all-converted pool zeroes the pooled
        # variance — the bare '/' would ANSI-abort where the oracle's
        # NULLIF yields NULL. + 0.0 canonicalizes IEEE -0.0 (z_stat is
        # sign-indefinite)
        (
            F.round(
                F.try_divide(
                    p_b - p_a,
                    F.sqrt(
                        pool
                        * (1 - pool)
                        * (
                            F.lit(1.0) / F.col("n_a")
                            + F.lit(1.0) / F.col("n_b")
                        )
                    ),
                ),
                4,
            )
            + 0.0
        ).alias("z_stat"),
    )


@register(
    "embedding_minmax_scale",
    """
    WITH ex AS (
      SELECT vec_id, (embedding::DOUBLE[])[CAST(i AS INT)] AS val,
             CAST(i AS INT) - 1 AS dim
      FROM embeddings,
           unnest(generate_series(1, len(embedding))) AS s(i)
      WHERE vec_id < 50),
    b AS (SELECT dim, MIN(val) AS lo, MAX(val) AS hi FROM ex GROUP BY dim),
    scaled AS (
      SELECT vec_id, ex.dim,
             CAST(ROUND(1000000 * CASE WHEN hi = lo THEN 0.0
                        ELSE (val - lo) / (hi - lo) END) AS BIGINT) AS s
      FROM ex JOIN b ON ex.dim = b.dim)
    SELECT vec_id,
           to_json(list(s ORDER BY dim)) AS scaled_micro
    FROM scaled GROUP BY vec_id
    """,
)
def embedding_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension min-max feature scaling of embeddings to [0,1] —
    the normalization step before distance-based models mix
    heterogeneous feature scales (and the template for z-score/robust
    variants: swap the bounds aggregate). Restricted to a 50-vector
    probe set here to keep the driver row small; the plan is the
    at-scale shape regardless: posexplode to (vec, dim, val), one
    64-row per-dim bounds aggregate re-joined broadcast-small, and an
    ordered re-assembly keyed on vec_id. Values surface as micro-unit
    integers (round(1e6·s)) because Spark's to_json scientific-notates
    small doubles where DuckDB does not — integer arrays serialize
    identically on both engines."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    ex = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "val"),
    )
    b = ex.groupBy("dim").agg(F.min("val").alias("lo"), F.max("val").alias("hi"))
    scaled = ex.join(F.broadcast(b), "dim").select(
        "vec_id",
        "dim",
        F.round(
            F.lit(1000000)
            * F.when(F.col("hi") == F.col("lo"), F.lit(0.0)).otherwise(
                (F.col("val") - F.col("lo")) / (F.col("hi") - F.col("lo"))
            )
        )
        .cast("bigint")
        .alias("s"),
    )
    return (
        scaled.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "s"))).alias("a"))
        .select(
            "vec_id",
            F.to_json(F.expr("transform(a, x -> x.s)")).alias("scaled_micro"),
        )
    )


@register(
    "rolling_corr_view_purchase",
    """
    WITH daily AS (
      -- ts IS NOT NULL (r12 nullhalf census): a null-timestamp event
      -- would create a NULL day whose position under ORDER BY d the
      -- engines DISAGREE on (Spark windows sort NULLS FIRST on ASC,
      -- DuckDB NULLS LAST), shifting every 14-day frame
      SELECT CAST(ts AS DATE) AS d,
             CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS DOUBLE)
               AS views,
             CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
               AS purchases
      FROM events WHERE ts IS NOT NULL GROUP BY 1),
    r AS (
      SELECT CAST(d AS VARCHAR) AS day,
             ROW_NUMBER() OVER (ORDER BY d) AS rn,
             corr(views, purchases)
               OVER (ORDER BY d ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
               AS c
      FROM daily)
    SELECT day, ROUND(c, 6) + 0.0 AS rolling_corr_14d
    FROM r WHERE rn >= 14
    """,
)
def rolling_corr_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day rolling correlation between daily view and purchase
    volume — the relationship-stability monitor (a correlation that
    collapses mid-series says the funnel decoupled: tracking bug or
    mix shift). The fact collapses to one row per day first; corr runs
    as a frame-bounded window aggregate over that tiny series. Partial
    leading frames are dropped (rn >= 14) so every emitted value
    covers a full window on both engines.

    The correlation is assembled from the throw-free POPULATION window
    moments (covar_pop / stddev_pop divide by n >= 1): under ANSI
    Spark's builtin corr ABORTS on a zero-variance frame (14 flat days
    of either series) where DuckDB's corr yields NULL — the same
    exposure the r12 review fixed in event_value_moments, here in its
    window form. try_divide supplies the NULL; the closed form matches
    the builtin within ~1e-14 relative, far below the 6-dp grain.
    ts IS NOT NULL on both engines (nullhalf census): a NULL day sits
    at a different end of ORDER BY d in each engine. + 0.0
    canonicalizes IEEE -0.0 (near-zero correlations round from below).
    """
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.count_if(F.col("event_type") == "view")
            .cast("double")
            .alias("views"),
            F.count_if(F.col("event_type") == "purchase")
            .cast("double")
            .alias("purchases"),
        )
    )
    w = Window.orderBy("d").rowsBetween(-13, Window.currentRow)
    c = F.try_divide(
        F.covar_pop("views", "purchases").over(w),
        F.stddev_pop("views").over(w) * F.stddev_pop("purchases").over(w),
    )
    r = daily.select(
        F.col("d").cast("string").alias("day"),
        F.row_number().over(Window.orderBy("d")).alias("rn"),
        c.alias("c"),
    )
    return r.filter(F.col("rn") >= 14).select(
        "day", (F.round("c", 6) + 0.0).alias("rolling_corr_14d")
    )


def _xcorr_oracle(max_lag: int = 6) -> str:
    # + 0.0 canonicalizes IEEE -0.0 (xcorr is sign-indefinite; a
    # near-zero correlation rounding from below would split the engines)
    branches = "\n      UNION ALL\n".join(
        f"""      SELECT {k} AS lag, CAST(COUNT(lv) AS BIGINT) AS n_days,
             ROUND(corr(purchases, lv), 6) + 0.0 AS xcorr
      FROM (SELECT purchases, lag(views, {k}) OVER (ORDER BY d) AS lv
            FROM daily) WHERE lv IS NOT NULL"""
        for k in range(max_lag + 1)
    )
    return f"""
    WITH daily AS (
      -- ts IS NOT NULL (r12 nullhalf census): a null-timestamp event
      -- would create a NULL day whose position under ORDER BY d the
      -- engines DISAGREE on (Spark windows sort NULLS FIRST on ASC,
      -- DuckDB NULLS LAST), silently shifting every lagged pair
      SELECT CAST(ts AS DATE) AS d,
             CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS DOUBLE)
               AS views,
             CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
               AS purchases
      FROM events WHERE ts IS NOT NULL GROUP BY 1),
    lags AS (
{branches}),
    best AS (SELECT lag AS best_lag FROM lags
             ORDER BY xcorr DESC, lag ASC LIMIT 1)
    SELECT lag, n_days, xcorr, lag = best.best_lag AS is_best
    FROM lags CROSS JOIN best
    """


@register("cross_corr_best_lag", _xcorr_oracle(6))
def cross_corr_best_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation lag scan — corr(views shifted by k, purchases)
    for k = 0..6 days, flagging the lag that maximizes it: the
    lead-lag diagnostic behind 'does view volume predict purchases k
    days out'. Seven lag branches over the one-row-per-day series (a
    few hundred rows — branch cost is trivial after the fact
    collapses), argmax as a one-row broadcast with a deterministic
    (corr DESC, lag ASC) tie-break."""
    ev = t(spark, sf_dir, "events")
    # ts non-null (r12 nullhalf census): a NULL day would sit at a
    # DIFFERENT end of the lag window's ORDER BY in each engine (Spark
    # NULLS FIRST on ASC, DuckDB NULLS LAST), shifting every lagged pair
    daily = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.count_if(F.col("event_type") == "view")
            .cast("double")
            .alias("views"),
            F.count_if(F.col("event_type") == "purchase")
            .cast("double")
            .alias("purchases"),
        )
    )
    w = Window.orderBy("d")
    parts = []
    # corr assembled from the throw-free population moments: under ANSI
    # Spark's builtin corr ABORTS on a zero-variance series (a flat
    # purchase count across days) where DuckDB yields NULL (r12 review);
    # try_divide supplies the NULL. No nulls survive the lv filter, so
    # the moments are pairwise-complete by construction.
    for k in range(7):
        lagged = daily.select(
            "purchases", F.lag("views", k).over(w).alias("lv")
        ).filter(F.col("lv").isNotNull())
        xcorr = F.try_divide(
            F.covar_pop("purchases", "lv"),
            F.stddev_pop("purchases") * F.stddev_pop("lv"),
        )
        parts.append(
            lagged.agg(
                F.lit(k).alias("lag"),
                F.count("lv").alias("n_days"),
                (F.round(xcorr, 6) + 0.0).alias("xcorr"),
            )
        )
    lags = parts[0]
    for p in parts[1:]:
        lags = lags.unionByName(p)
    best = lags.orderBy(F.col("xcorr").desc(), F.col("lag").asc()).limit(1).select(
        F.col("lag").alias("best_lag")
    )
    return lags.crossJoin(F.broadcast(best)).select(
        "lag",
        "n_days",
        "xcorr",
        (F.col("lag") == F.col("best_lag")).alias("is_best"),
    )


@register(
    "anomaly_days_mad",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type,
             quantile_cont(n, 0.5) AS med
      FROM daily GROUP BY event_type),
    dev AS (
      SELECT daily.event_type, d, n, med, abs(n - med) AS ad
      FROM daily JOIN stats USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(ad, 0.5) AS mad
      FROM dev GROUP BY event_type),
    scored AS (
      -- + 0.0 canonicalizes IEEE -0.0 (robust_z is sign-indefinite)
      SELECT dev.event_type, d, n,
             ROUND((n - med) / (1.4826 * mad), 4) + 0.0 AS robust_z
      FROM dev JOIN mad USING (event_type) WHERE mad > 0),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY abs(robust_z) DESC, d ASC) AS rn
      FROM scored)
    SELECT event_type, CAST(d AS VARCHAR) AS day, CAST(n AS BIGINT) AS n,
           robust_z
    FROM ranked WHERE rn <= 3
    """,
)
def anomaly_days_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most anomalous days per event type by MAD robust z-score —
    (count − median)/(1.4826·MAD), the outlier detector that a single
    spike cannot poison (unlike mean/stddev z, where the anomaly
    inflates its own denominator — the same robustness argument as
    event_value_robust_zscore, applied at the day grain where ops
    actually triage). Two exact-median folds over the (type, day)
    aggregate, top-3 days per type with deterministic ties."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    stats = daily.groupBy("event_type").agg(
        F.percentile("n", F.lit(0.5)).alias("med")
    )
    dev = daily.join(F.broadcast(stats), "event_type").withColumn(
        "ad", F.abs(F.col("n") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("ad", F.lit(0.5)).alias("mad")
    )
    scored = (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .select(
            "event_type",
            "d",
            "n",
            # + 0.0 canonicalizes IEEE -0.0 (robust_z is sign-indefinite)
            (
                F.round(
                    (F.col("n") - F.col("med")) / (F.lit(1.4826) * F.col("mad")),
                    4,
                )
                + 0.0
            ).alias("robust_z"),
        )
    )
    w = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("robust_z")).desc(), F.col("d").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "event_type",
            F.col("d").cast("string").alias("day"),
            F.col("n").cast("bigint").alias("n"),
            "robust_z",
        )
    )


@register(
    "event_sequence_trigrams",
    """
    WITH s AS (
      -- ts IS NOT NULL: un-timestamped events have no sequence position
      -- (Spark sorts NULL ts first, DuckDB last — they must not rank)
      SELECT user_id, event_type,
             lag(event_type, 2) OVER w AS t2,
             lag(event_type, 1) OVER w AS t1
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    g AS (
      -- a trigram needs all three legs typed: Spark's concat_ws skips
      -- NULL legs where || NULL-propagates, so NULL legs are filtered
      SELECT t2 || '>' || t1 || '>' || event_type AS trigram,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE t2 IS NOT NULL AND t1 IS NOT NULL
               AND event_type IS NOT NULL
      GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g)
    SELECT trigram, n, ROUND(n / CAST(total AS DOUBLE), 6) AS share
    FROM (SELECT *, row_number() OVER (ORDER BY n DESC, trigram ASC) AS rn
          FROM g) CROSS JOIN tot
    WHERE rn <= 10
    """,
)
def event_sequence_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step behavioral sequences across all users — the
    sequential-pattern extension of event_transition_matrix's bigram
    view (view>view>purchase vs view>error>view tells very different
    product stories). One user-keyed window for the two lags, one hash
    aggregate over the 125-max trigram space, total as a one-row
    broadcast; the top-10 sorts the tiny aggregate only."""
    # ts IS NOT NULL: un-timestamped events have no sequence position
    # (Spark sorts NULL ts first, DuckDB last — they must not rank); a
    # trigram needs all three legs typed (concat_ws would silently skip
    # a NULL leg where the oracle's || NULL-propagates)
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.lag("event_type", 2).over(w).alias("t2"),
        F.lag("event_type", 1).over(w).alias("t1"),
    ).filter(
        F.col("t2").isNotNull()
        & F.col("t1").isNotNull()
        & F.col("event_type").isNotNull()
    )
    g = s.groupBy(
        F.concat_ws(">", "t2", "t1", "event_type").alias("trigram")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = g.agg(F.sum("n").alias("total"))
    ranked = g.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("trigram").asc()))
    ).filter(F.col("rn") <= 10)
    return ranked.crossJoin(F.broadcast(tot)).select(
        "trigram",
        "n",
        F.round(F.col("n") / F.col("total").cast("double"), 6).alias("share"),
    )


@register(
    "mutual_information_type_dow",
    """
    WITH j AS (
      SELECT event_type AS x, dayofweek(CAST(ts AS DATE)) AS y,
             CAST(COUNT(*) AS DOUBLE) AS n_xy
      FROM events GROUP BY 1, 2),
    mx AS (SELECT x, SUM(n_xy) AS n_x FROM j GROUP BY x),
    my AS (SELECT y, SUM(n_xy) AS n_y FROM j GROUP BY y),
    tot AS (SELECT SUM(n_xy) AS n FROM j),
    hx AS (SELECT -SUM((n_x / n) * ln(n_x / n)) AS h_x FROM mx CROSS JOIN tot),
    hy AS (SELECT -SUM((n_y / n) * ln(n_y / n)) AS h_y FROM my CROSS JOIN tot)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           -- + 0.0 canonicalizes IEEE -0.0 (near-independent grids sum
           -- tiny-negative; r14 review)
           ROUND(SUM((n_xy / n) * ln((n_xy * n) / (n_x * n_y))), 6) + 0.0 AS mi,
           -- NULLIF: a 1-row/1-column grid has zero marginal entropy —
           -- NULL NMI on both engines
           ROUND(SUM((n_xy / n) * ln((n_xy * n) / (n_x * n_y)))
                 / NULLIF(sqrt(ANY_VALUE(h_x) * ANY_VALUE(h_y)), 0.0), 6) + 0.0
             AS nmi
    FROM j JOIN mx USING (x) JOIN my USING (y)
    CROSS JOIN tot CROSS JOIN hx CROSS JOIN hy
    """,
)
def mutual_information_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and day-of-week (plus the
    sqrt-normalized NMI) — the dependence screen for feature selection
    and leakage hunting: MI ≈ 0 says the weekday tells you nothing
    about what users do; a high-NMI pair of 'independent' features is a
    red flag. Everything folds from ONE joint (type, dow) aggregate —
    marginals, entropies and the total are derived CTEs over ≤ 35
    cells, each riding a one-row or tiny broadcast."""
    ev = t(spark, sf_dir, "events")
    j = ev.groupBy(
        F.col("event_type").alias("x"),
        F.dayofweek(F.to_date("ts")).alias("y"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n_xy"))
    mx = j.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    my = j.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    tot = j.agg(F.sum("n_xy").alias("n"))
    hx = mx.crossJoin(F.broadcast(tot)).agg(
        (-F.sum((F.col("n_x") / F.col("n")) * F.log(F.col("n_x") / F.col("n"))))
        .alias("h_x")
    )
    hy = my.crossJoin(F.broadcast(tot)).agg(
        (-F.sum((F.col("n_y") / F.col("n")) * F.log(F.col("n_y") / F.col("n"))))
        .alias("h_y")
    )
    term = (F.col("n_xy") / F.col("n")) * F.log(
        (F.col("n_xy") * F.col("n")) / (F.col("n_x") * F.col("n_y"))
    )
    return (
        j.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            # + 0.0 canonicalizes IEEE -0.0 (the FP-term sum of a
            # near-independent grid can land tiny-negative; r14 review)
            (F.round(F.sum(term), 6) + 0.0).alias("mi"),
            # try_divide: zero marginal entropy (1-row/1-column grid)
            # would ANSI-abort the bare '/' where the oracle's NULLIF
            # yields NULL
            (
                F.round(
                    F.try_divide(
                        F.sum(term),
                        F.sqrt(
                            F.any_value(F.col("h_x")) * F.any_value(F.col("h_y"))
                        ),
                    ),
                    6,
                )
                + 0.0
            ).alias("nmi"),
        )
    )


@register(
    "value_histogram_equidepth",
    """
    WITH b AS (
      -- value IS NOT NULL: a NULL measure has no histogram position
      -- (Spark sorts NULLs first, DuckDB last - they must not bucket)
      SELECT value, NTILE(10) OVER (ORDER BY value, event_id) AS bucket
      FROM events WHERE value IS NOT NULL)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(value), 6) AS lo,
           ROUND(MAX(value), 6) AS hi
    FROM b GROUP BY bucket
    """,
)
def value_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) histogram of event value — ten buckets
    with ~N/10 rows each and their value ranges: the optimizer-style
    histogram that resolves skew equi-width buckets smear (one hot
    bucket hides the whole distribution shape). Exact NTILE needs a
    global sort of the fact; that is the semantics of exact equi-depth.
    At gigarow scale swap the bucket BOUNDS to approx_percentile (one
    pass, mergeable sketch) and assign map-side — same output schema,
    documented trade; ties pinned by event_id so both engines cut
    identical buckets."""
    # value IS NOT NULL: a NULL measure has no histogram position (Spark
    # sorts NULLs first, DuckDB last — they must not bucket)
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    b = ev.select(
        "value", F.ntile(10).over(Window.orderBy("value", "event_id")).alias("bucket")
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


@register(
    "supplier_hhi_by_nation",
    """
    WITH rev AS (
      SELECT s_nationkey AS nationkey, l_suppkey AS suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(18,2))) AS r
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2),
    tot AS (SELECT nationkey, SUM(r) AS total FROM rev GROUP BY nationkey)
    -- NULLIF: a degenerate nation (every revenue 0, e.g. l_discount = 1
    -- on all rows) zeroes the share denominator - NULL hhi on both engines
    SELECT n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(SUM(power(CAST(r AS DOUBLE)
                           / NULLIF(CAST(total AS DOUBLE), 0.0), 2)), 6)
             AS hhi
    FROM rev
    JOIN tot USING (nationkey)
    JOIN nation ON n_nationkey = nationkey
    GROUP BY n_name
    """,
)
def supplier_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman market-concentration index of supplier
    revenue within each nation — Σ share² (1/n = perfect competition,
    1.0 = monopoly): the concentration scalar beside Gini that
    regulators and sourcing teams actually quote. Revenue folds to
    (nation, supplier) grain in one decimal-exact aggregate off the
    fact; nation totals re-join on the nation key and the name dim
    broadcasts. Share ratios go floating only at the final fold."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
            ).alias("r")
        )
    )
    tot = rev.groupBy("nationkey").agg(F.sum("r").alias("total"))
    return (
        rev.join(F.broadcast(tot), "nationkey")
        .join(F.broadcast(nat), rev["nationkey"] == nat["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            # try_divide: a zero nation total (all-zero revenue) would
            # ANSI-abort the bare '/' where the oracle's NULLIF yields NULL
            F.round(
                F.sum(
                    F.pow(
                        F.try_divide(
                            F.col("r").cast("double"),
                            F.col("total").cast("double"),
                        ),
                        2,
                    )
                ),
                6,
            ).alias("hhi"),
        )
    )


@register(
    "clv_monthly_curve",
    """
    WITH first_m AS (
      -- o_orderdate IS NOT NULL: an undated order has no cohort month
      -- (a NULL month_idx would ride the engines' opposite NULL sort
      -- through the cumulative window)
      SELECT o_custkey AS custkey,
             MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS m0
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY o_custkey),
    per_idx AS (
      -- portable cents quantizer: floor(x*100 + 0.5) is pure IEEE double
      -- arithmetic, identical on both engines even when a fixture regen
      -- narrows o_totalprice to float32 (.625 cent ties round HALF_UP in
      -- Spark's double->DECIMAL cast but half-even in DuckDB's)
      SELECT o_custkey AS custkey,
             (year(o_orderdate) * 12 + month(o_orderdate)) - m0 AS month_idx,
             SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)
                      / 100.0 AS DECIMAL(18,2))) AS rev
      FROM orders JOIN first_m ON o_custkey = custkey
      WHERE o_orderdate IS NOT NULL
      GROUP BY 1, 2),
    curve AS (
      SELECT month_idx,
             CAST(COUNT(*) AS BIGINT) AS n_active_customers,
             CAST(SUM(rev) AS DECIMAL(18,2)) AS revenue
      FROM per_idx GROUP BY month_idx)
    SELECT CAST(month_idx AS INT) AS month_idx, n_active_customers,
           CAST(revenue AS VARCHAR) AS revenue,
           CAST(CAST(SUM(revenue) OVER (ORDER BY month_idx
                                        ROWS UNBOUNDED PRECEDING)
                     AS DECIMAL(18,2)) AS VARCHAR) AS cum_revenue
    FROM curve
    """,
)
def clv_monthly_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value curve — revenue by months-since-first-
    order (customer age), with active-customer counts and the running
    total: the cohort-aligned spend trajectory CLV models are fit to.
    Month index is integer arithmetic (y*12+m), immune to the
    date-diff convention drift between engines; revenue stays decimal
    end-to-end (VARCHAR surface per the exact-money convention). First-
    order months come from one customer-grain aggregate joined back on
    the customer key; the cumulative window runs over the ≤ tens-of-
    rows curve."""
    # o_orderdate IS NOT NULL: an undated order has no cohort month (a
    # NULL month_idx would ride the engines' opposite NULL sort through
    # the cumulative window); revenue goes through the portable cents
    # quantizer so a float32-narrowed fixture still sums identical cents
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    first_m = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.min(ym).alias("m0")
    )
    per_idx = (
        o.join(first_m, o["o_custkey"] == first_m["custkey"])
        .groupBy(
            "custkey",
            (ym - F.col("m0")).alias("month_idx"),
        )
        .agg(
            # portable cents quantizer (see customer_spend_gini)
            F.sum(money_quantize("o_totalprice")).alias("rev")
        )
    )
    curve = per_idx.groupBy("month_idx").agg(
        F.count(F.lit(1)).alias("n_active_customers"),
        F.sum("rev").cast(DEC).alias("revenue"),
    )
    w = Window.orderBy("month_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return curve.select(
        F.col("month_idx").cast("int").alias("month_idx"),
        "n_active_customers",
        F.col("revenue").cast("string").alias("revenue"),
        F.sum("revenue").over(w).cast(DEC).cast("string").alias("cum_revenue"),
    )


@register(
    "incremental_join_mv",
    """
    -- CAST DOUBLE first: both engines then quantize the same double to
    -- cents even if a fixture regen narrows the measures to float32
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE) AS DECIMAL(18,2))
                    * CAST(1 - CAST(l_discount AS DOUBLE)
                           AS DECIMAL(18,2)))
                AS VARCHAR) AS revenue,
           CAST(MAX(l_shipdate) AS VARCHAR) AS latest_ship,
           ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE)
                               AS DECIMAL(18,2))
                          * CAST(1 - CAST(l_discount AS DOUBLE)
                                 AS DECIMAL(18,2)))
                      AS DOUBLE) / COUNT(*), 4) AS avg_item_rev
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def incremental_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN materialized view — the
    priority-revenue MV over orders⋈lineitem is built from an 80 %
    base batch, then refreshed with the remaining 20 % delta WITHOUT
    touching the base again: only the delta fact rows join the dim,
    collapse to mergeable state (sum/count/max/avg partials), and fold
    into the stored state — refresh cost ∝ |Δ|, the property that
    makes hourly refresh of a 100 TB MV feasible. The S13/I-family
    extension of incremental_pricing_summary from single-table to
    joined MVs; the oracle is the full recompute, so the
    state(T∪Δ) = merge(state(T), state(Δ)) contract is value-checked
    through the join. The batch split is a deterministic orderkey
    modulo (standing in for the ingest watermark)."""
    from dopams_etl_spark.operators.incremental_agg import (
        agg_state,
        finalize_state,
        merge_states,
    )

    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    # cast("double") first: both engines then quantize the same double
    # to cents even on a float32-narrowed fixture
    rev = (
        F.col("l_extendedprice").cast("double").cast(DEC)
        * (
            F.lit(1).cast(DEC)
            - F.col("l_discount").cast("double").cast(DEC)
        )
    ).alias("rev")
    base_f = li.filter(F.col("l_orderkey") % 5 != 0).select("l_orderkey", rev, "l_shipdate")
    delta_f = li.filter(F.col("l_orderkey") % 5 == 0).select("l_orderkey", rev, "l_shipdate")
    measures = {
        "revenue": ("sum", "rev"),
        "n_items": ("count", None),
        "latest_ship": ("max", "l_shipdate"),
        "avg_item_rev": ("avg", "rev"),
    }
    keys = ["o_orderpriority"]
    base_state = agg_state(
        base_f.join(orders, base_f["l_orderkey"] == orders["o_orderkey"]),
        keys,
        measures,
    )
    delta_state = agg_state(
        delta_f.join(orders, delta_f["l_orderkey"] == orders["o_orderkey"]),
        keys,
        measures,
    )
    merged = merge_states(base_state, delta_state, keys, measures)
    out = finalize_state(merged, keys, measures)
    return out.select(
        "o_orderpriority",
        F.col("n_items").cast("bigint").alias("n_items"),
        F.col("revenue").cast("string").alias("revenue"),
        F.col("latest_ship").cast("string").alias("latest_ship"),
        F.round(
            F.col("revenue").cast("double") / F.col("n_items"), 4
        ).alias("avg_item_rev"),
    )


@register(
    "session_funnel_ordered",
    "WITH "
    + session_ctes("event_type")
    + """,
    v AS (SELECT user_id, session_num, MIN(ts) AS t_v
          FROM s WHERE event_type = 'view' GROUP BY 1, 2),
    c AS (SELECT s.user_id, s.session_num, MIN(s.ts) AS t_c
          FROM s JOIN v USING (user_id, session_num)
          WHERE s.event_type = 'click' AND s.ts > v.t_v
          GROUP BY 1, 2),
    p AS (SELECT s.user_id, s.session_num, MIN(s.ts) AS t_p
          FROM s JOIN c USING (user_id, session_num)
          WHERE s.event_type = 'purchase' AND s.ts > c.t_c
          GROUP BY 1, 2),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions
          FROM (SELECT DISTINCT user_id, session_num FROM s))
    SELECT n.n_sessions,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS reached_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS reached_click,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS reached_purchase,
           -- NULLIF: a funnel with zero view-sessions (single-row/empty
           -- fixture) zeroes the stage base - NULL rate on both engines
           ROUND((SELECT COUNT(*) FROM c)
                 / NULLIF(CAST((SELECT COUNT(*) FROM v) AS DOUBLE), 0.0), 6)
             AS click_rate,
           ROUND((SELECT COUNT(*) FROM p)
                 / CAST(GREATEST((SELECT COUNT(*) FROM c), 1) AS DOUBLE), 6)
             AS purchase_rate
    FROM n
    """,
)
def session_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ORDERED in-session funnel — view, then a click after
    that view, then a purchase after that click, all inside one
    30-minute-gap session: the product-analytics funnel that
    view_click_purchase_funnel's whole-history variant cannot express
    (it counts users who ever did all three, in any order, any day).
    Stage timestamps chain through per-session min-aggregates (t_view →
    first later click → first later purchase), each one session-keyed —
    the whole funnel shuffles on (user, session) only."""
    ev = t(spark, sf_dir, "events")
    s = with_session_num(ev)
    keys = ["user_id", "session_num"]
    v = (
        s.filter(F.col("event_type") == "view")
        .groupBy(*keys)
        .agg(F.min("ts").alias("t_v"))
    )
    c = (
        s.join(v, keys)
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t_v")))
        .groupBy(*keys)
        .agg(F.min("ts").alias("t_c"))
    )
    p = (
        s.join(c, keys)
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_c"))
        )
        .groupBy(*keys)
        .agg(F.min("ts").alias("t_p"))
    )
    n = s.select(*keys).distinct().agg(F.count(F.lit(1)).alias("n_sessions"))
    nv = v.agg(F.count(F.lit(1)).alias("reached_view"))
    nc = c.agg(F.count(F.lit(1)).alias("reached_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("reached_purchase"))
    return (
        n.crossJoin(F.broadcast(nv))
        .crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_sessions",
            "reached_view",
            "reached_click",
            "reached_purchase",
            # try_divide: zero view-sessions would ANSI-abort the bare
            # '/' where the oracle's NULLIF yields NULL
            F.round(
                F.try_divide(
                    F.col("reached_click"),
                    F.col("reached_view").cast("double"),
                ),
                6,
            ).alias("click_rate"),
            F.round(
                F.col("reached_purchase")
                / F.greatest(F.col("reached_click"), F.lit(1)).cast("double"),
                6,
            ).alias("purchase_rate"),
        )
    )


@register(
    "revenue_mix_decomposition",
    """
    WITH pb AS (
      -- CAST DOUBLE first: both engines then quantize the same double
      -- to cents even if a fixture regen narrows the measures to float32
      SELECT p_brand AS brand, year(o_orderdate) AS yr,
             CAST(SUM(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(18,2)))
                  AS DOUBLE) AS q,
             CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE)
                           AS DECIMAL(18,2))) AS DOUBLE)
               AS rev
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE year(o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2),
    wide AS (
      SELECT brand,
             MAX(CASE WHEN yr = 1996 THEN q END) AS q0,
             MAX(CASE WHEN yr = 1997 THEN q END) AS q1,
             MAX(CASE WHEN yr = 1996 THEN rev END) AS r0,
             MAX(CASE WHEN yr = 1997 THEN rev END) AS r1
      FROM pb GROUP BY brand
      HAVING q0 IS NOT NULL AND q1 IS NOT NULL)
    -- + 0.0 canonicalizes IEEE -0.0 (all four effects are sign-indefinite)
    SELECT brand,
           ROUND(r1 - r0, 2) + 0.0 AS delta_rev,
           ROUND((q1 - q0) * (r0 / q0), 2) + 0.0 AS volume_effect,
           ROUND((r1 / q1 - r0 / q0) * q0, 2) + 0.0 AS price_effect,
           ROUND((q1 - q0) * (r1 / q1 - r0 / q0), 2) + 0.0 AS interaction
    FROM wide
    """,
)
def revenue_mix_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/volume decomposition of year-over-year revenue change per
    brand — Δrev = volume effect (Δq at old unit price) + price effect
    (Δprice at old volume) + interaction: the FP&A variance-bridge
    every revenue review runs. Decimal-exact sums collapse the fact to
    (brand, year) grain first; the decomposition is arithmetic over
    that ~50-row table. The identity delta = volume + price +
    interaction holds exactly (before rounding), which
    test_analytics pins."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pb = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.year("o_orderdate").isin(1996, 1997))
        .join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"), F.year("o_orderdate").alias("yr"))
        .agg(
            # cast("double") first: both engines then quantize the same
            # double to cents even on a float32-narrowed fixture
            F.sum(F.col("l_quantity").cast("double").cast(DEC))
            .cast("double")
            .alias("q"),
            F.sum(F.col("l_extendedprice").cast("double").cast(DEC))
            .cast("double")
            .alias("rev"),
        )
    )
    wide = (
        pb.groupBy("brand")
        .agg(
            F.max(F.when(F.col("yr") == 1996, F.col("q"))).alias("q0"),
            F.max(F.when(F.col("yr") == 1997, F.col("q"))).alias("q1"),
            F.max(F.when(F.col("yr") == 1996, F.col("rev"))).alias("r0"),
            F.max(F.when(F.col("yr") == 1997, F.col("rev"))).alias("r1"),
        )
        .filter(F.col("q0").isNotNull() & F.col("q1").isNotNull())
    )
    p0 = F.col("r0") / F.col("q0")
    p1 = F.col("r1") / F.col("q1")
    # + 0.0 canonicalizes IEEE -0.0 (all four effects are sign-indefinite)
    return wide.select(
        "brand",
        (F.round(F.col("r1") - F.col("r0"), 2) + 0.0).alias("delta_rev"),
        (F.round((F.col("q1") - F.col("q0")) * p0, 2) + 0.0).alias(
            "volume_effect"
        ),
        (F.round((p1 - p0) * F.col("q0"), 2) + 0.0).alias("price_effect"),
        (F.round((F.col("q1") - F.col("q0")) * (p1 - p0), 2) + 0.0).alias(
            "interaction"
        ),
    )


@register(
    "degree_assortativity",
    """
    WITH e AS (
      SELECT DISTINCT l_suppkey AS u, o_custkey + 1000000 AS v
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT u AS node, CAST(COUNT(*) AS DOUBLE) AS d
            FROM sym GROUP BY u)
    -- + 0.0 canonicalizes IEEE -0.0 (assortativity is sign-indefinite)
    SELECT CAST(COUNT(*) / 2 AS BIGINT) AS n_edges,
           ROUND(corr(du.d, dv.d), 6) + 0.0 AS assortativity
    FROM sym
    JOIN deg du ON du.node = sym.u
    JOIN deg dv ON dv.node = sym.v
    """,
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the supplier↔customer graph — Pearson
    correlation of endpoint degrees over all (directed-both-ways)
    edges, Newman's mixing coefficient: negative = hubs attach to
    leaves (typical bipartite commerce), positive = rich-club. With
    the degree histogram it decides the partitioning story — strongly
    disassortative graphs concentrate joins on hub keys, which is the
    cue to salt. One degree aggregate + two node-keyed joins + one
    corr fold; nothing pairwise beyond the edge list itself."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("u"),
            (F.col("o_custkey") + F.lit(1000000)).alias("v"),
        )
        .distinct()
    )
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("double").alias("d")
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    return (
        sym.join(du, "u")
        .join(dv, "v")
        .agg(
            (F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"),
            # + 0.0 canonicalizes IEEE -0.0 (assortativity is sign-indefinite)
            (F.round(F.corr("du", "dv"), 6) + 0.0).alias("assortativity"),
        )
    )


@register(
    "python_datasource_scan",
    """
    WITH g AS (
      SELECT i AS id, CAST(i // 250 AS INT) AS part,
             (i * 2654435761) % 4294967296 AS value
      FROM generate_series(0, 999) s(i))
    SELECT part, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(value) AS BIGINT) AS sum_value,
           CAST(MIN(id) AS BIGINT) AS min_id,
           CAST(MAX(id) AS BIGINT) AS max_id
    FROM g GROUP BY part
    """,
)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource scan (Spark 4 DataSource API) — the
    native extension point for systems without a built-in connector
    (the reference's REST/Mongo ingest class): the source declares
    schema + partitions and each partition reads independently on an
    executor, so a wrapped API lands as a first-class parallel scan
    node instead of driver-side collect glue. The in-repo source
    generates a deterministic Knuth-hash value stream
    (`sources/pydatasource.py`), which the oracle reproduces exactly
    from generate_series with the same BIGINT arithmetic — scan
    machinery value-checked end-to-end, per-partition provenance
    verified by the (part, min_id, max_id) ranges."""
    from dopams_etl_spark.sources.pydatasource import register_synthetic_source

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("partitions", 4)
        .option("rows_per_partition", 250)
        .load()
    )
    return df.groupBy("part").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").cast("bigint").alias("sum_value"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


@register(
    "streaming_python_source_counts",
    """
    WITH g AS (
      SELECT i AS id, (i * 2654435761) % 4294967296 AS value
      FROM generate_series(0, 499) s(i))
    SELECT CAST(id // 100 AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(value) AS BIGINT) AS sum_value
    FROM g GROUP BY 1
    """,
)
def streaming_python_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming over the CUSTOM Python stream source — the
    tick source's dict offsets checkpoint between availableNow runs and
    the drain loop restarts until the cursor is exhausted (the
    incremental-batch cadence of a real API/CDC cursor source); the
    landed rows then aggregate batch-side. Exactly-once across the
    restarts is the property under test: the oracle states the full
    deterministic sequence, so any duplicate or dropped batch at a
    restart boundary is a value mismatch, not just a count drift."""
    import tempfile

    from dopams_etl_spark.sources.pydatasource import register_ticks_stream

    register_ticks_stream(spark)
    base = tempfile.mkdtemp(prefix="dopams_pyticks_")
    out = f"{base}/out"
    ck = f"{base}/ck"
    for _ in range(8):
        stream = (
            spark.readStream.format("synthetic_ticks")
            .option("total_rows", 500)
            .option("batch_rows", 100)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if spark.read.parquet(out).count() >= 500:
            break
    landed = spark.read.parquet(out)
    return landed.groupBy(
        (F.col("id") / 100).cast("int").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").cast("bigint").alias("sum_value"),
    )


@register(
    "user_lifecycle_states",
    """
    WITH uw AS (
      -- ts IS NOT NULL: an un-timestamped event is not weekly activity
      -- (a NULL week would ride the engines' opposite NULL sort through
      -- the prev-week lag and the churn ledger)
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
      WHERE ts IS NOT NULL),
    seq AS (
      SELECT user_id, wk,
             MIN(wk) OVER (PARTITION BY user_id) AS first_wk,
             lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk
      FROM uw),
    states AS (
      SELECT wk,
             CASE WHEN wk = first_wk THEN 'new'
                  WHEN datediff('day', prev_wk, wk) = 7 THEN 'retained'
                  ELSE 'resurrected' END AS state
      FROM seq),
    weekly AS (
      SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_active,
             CAST(COUNT(*) FILTER (WHERE state = 'new') AS BIGINT) AS n_new,
             CAST(COUNT(*) FILTER (WHERE state = 'retained') AS BIGINT)
               AS n_retained,
             CAST(COUNT(*) FILTER (WHERE state = 'resurrected') AS BIGINT)
               AS n_resurrected
      FROM states GROUP BY wk)
    SELECT CAST(wk AS DATE) AS week,
           n_active, n_new, n_retained, n_resurrected,
           COALESCE(lag(n_active) OVER (ORDER BY wk), 0)
             - n_retained AS n_churned_from_prev
    FROM weekly
    """,
)
def user_lifecycle_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting — every active user classified new
    (first week ever), retained (active the week before), or
    resurrected (returning after a gap), plus churn from the prior
    week (prev actives − retained): the new/retained/resurrected/
    churned ledger every growth team reports, and the balance-sheet
    identity behind DAU/WAU movements. One (user, week) distinct, one
    user-keyed window pass for first/prev, one week-grain aggregate —
    churn needs no extra scan because prev-week actives arrive by a
    lag over the six-row weekly table. Churn is reported for observed
    weeks only (a fully-dark week would shift the ledger; the events
    span is continuous)."""
    # ts IS NOT NULL: an un-timestamped event is not weekly activity (a
    # NULL week would ride the engines' opposite NULL sort through the
    # prev-week lag and the churn ledger)
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    w_user = Window.partitionBy("user_id")
    seq = uw.select(
        "user_id",
        "wk",
        F.min("wk").over(w_user).alias("first_wk"),
        F.lag("wk").over(w_user.orderBy("wk")).alias("prev_wk"),
    )
    state = (
        F.when(F.col("wk") == F.col("first_wk"), "new")
        .when(
            F.datediff(F.to_date("wk"), F.to_date("prev_wk")) == 7, "retained"
        )
        .otherwise("resurrected")
    )
    weekly = (
        seq.select("wk", state.alias("state"))
        .groupBy("wk")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.count_if(F.col("state") == "new").alias("n_new"),
            F.count_if(F.col("state") == "retained").alias("n_retained"),
            F.count_if(F.col("state") == "resurrected").alias("n_resurrected"),
        )
    )
    return weekly.select(
        F.col("wk").cast("date").alias("week"),
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        (
            F.coalesce(F.lag("n_active").over(Window.orderBy("wk")), F.lit(0))
            - F.col("n_retained")
        ).alias("n_churned_from_prev"),
    )


@register(
    "brand_triple_itemsets",
    """
    WITH ob AS (
      SELECT DISTINCT l_orderkey AS orderkey, p_brand AS brand
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    n AS (SELECT CAST(COUNT(DISTINCT orderkey) AS BIGINT) AS n_orders FROM ob),
    triples AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, c.brand AS brand_c,
             CAST(COUNT(*) AS BIGINT) AS support_count
      FROM ob a
      JOIN ob b ON a.orderkey = b.orderkey AND a.brand < b.brand
      JOIN ob c ON b.orderkey = c.orderkey AND b.brand < c.brand
      GROUP BY 1, 2, 3),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY support_count DESC,
                                   brand_a, brand_b, brand_c) AS rn
      FROM triples WHERE support_count >= 2)
    SELECT brand_a, brand_b, brand_c, support_count,
           ROUND(support_count / CAST(n.n_orders AS DOUBLE), 6) AS support
    FROM ranked CROSS JOIN n WHERE rn <= 20
    """,
)
def brand_triple_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets over brands per order — the next rung of the
    A-Priori ladder above brand_basket_lift's pairs (a pair with lift
    can still be two independent staples; a frequent TRIPLE is a
    genuine bundle). Triples come from each order's sorted distinct
    brand set (collect_set + nested i<j<k transform/explode — r15
    replaced the 3-way self-join), so fan-out is C(brands-per-order, 3)
    per order — a small constant — and the candidate space is bounded
    by the dimension's own cardinality;
    min-support 2 prunes before ranking, top-20 with full-name
    tie-break."""
    from dopams_etl_spark.partitioning import ensure_parallelism

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = li.join(part, li["l_partkey"] == part["p_partkey"]).select(
        F.col("l_orderkey").alias("orderkey"), F.col("p_brand").alias("brand")
    )
    # r15 (guide §2.3/§2.4): generate i<j<k triples from each order's
    # SORTED distinct brand set instead of the 3-way self-join — one
    # orderkey exchange replaces the distinct + two SMJs (A/B: 1.95 →
    # 1.58 s warm at sf0.1, identical rows). NULL handling matches the
    # old join chain exactly: the equi-join dropped NULL orderkeys (the
    # filter), `<` dropped NULL brands (collect_set skips NULLs), and
    # n_orders = count_distinct(orderkey) = one sets row per non-NULL
    # order (empty brand arrays still count, as they did in ob).
    sets = (
        ensure_parallelism(base.filter(F.col("orderkey").isNotNull()), "orderkey")
        .groupBy("orderkey")
        .agg(F.sort_array(F.collect_set("brand")).alias("bs"))
    )
    n = sets.agg(F.count(F.lit(1)).alias("n_orders"))
    triples = (
        sets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "bs",
                        lambda x, i: F.flatten(
                            F.transform(
                                F.slice("bs", i + F.lit(2), F.size("bs") - i - 1),
                                lambda y, j: F.transform(
                                    F.slice(
                                        "bs",
                                        i + j + F.lit(3),
                                        F.size("bs") - i - j - 2,
                                    ),
                                    lambda z: F.struct(
                                        x.alias("brand_a"),
                                        y.alias("brand_b"),
                                        z.alias("brand_c"),
                                    ),
                                ),
                            )
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.*")
        .groupBy("brand_a", "brand_b", "brand_c")
        .agg(F.count(F.lit(1)).alias("support_count"))
        .filter(F.col("support_count") >= 2)
    )
    w = Window.orderBy(
        F.col("support_count").desc(), "brand_a", "brand_b", "brand_c"
    )
    return (
        triples.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "brand_c",
            "support_count",
            F.round(
                F.col("support_count") / F.col("n_orders").cast("double"), 6
            ).alias("support"),
        )
    )


@register(
    "dedup_rate_by_source",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
           ROUND(1.0 - COUNT(DISTINCT md5(text)) / CAST(COUNT(*) AS DOUBLE), 6)
             AS dup_rate
    FROM documents GROUP BY source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per ingest source — the curation scorecard
    that says WHICH feed is polluting the corpus (corpus_profile gives
    the global rate; provenance-resolved rates drive the actual fix).
    Fingerprints via md5 so the distinct count shuffles 16-byte keys,
    not document bodies — the same economy the dedup family uses. At
    gigarow scale the exact COUNT DISTINCT swaps to
    approx_count_distinct per the corpus_profile convention."""
    docs = t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.md5("text")).alias("n_unique"),
        F.round(
            F.lit(1.0)
            - F.count_distinct(F.md5("text")) / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_rate"),
    )


@register(
    "knn_label_accuracy",
    ann_notnull("""
    WITH p AS (SELECT vec_id AS p_id, label AS p_label,
                      embedding::DOUBLE[] AS pv
               FROM embeddings WHERE vec_id < 200),
    c AS (SELECT vec_id AS c_id, label AS c_label, embedding::DOUBLE[] AS cv
          FROM embeddings),
    s AS (SELECT p_id, p_label, c_id, c_label,
                 ROUND(list_dot_product(pv, cv)
                       / (sqrt(list_dot_product(pv, pv))
                          * sqrt(list_dot_product(cv, cv))), 6) AS cos_sim
          FROM p JOIN c ON p_id <> c_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY p_id
                                       ORDER BY cos_sim DESC, c_id ASC) AS rn
          FROM s),
    votes AS (
      SELECT p_id, p_label, c_label, CAST(COUNT(*) AS BIGINT) AS v
      FROM r WHERE rn <= 3 GROUP BY 1, 2, 3),
    pred AS (
      SELECT p_id, p_label, c_label AS predicted
      FROM (SELECT *, row_number() OVER (PARTITION BY p_id
                                         ORDER BY v DESC, c_label ASC) AS pr
            FROM votes) WHERE pr = 1)
    SELECT p_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (WHERE predicted = p_label) AS BIGINT)
             AS n_correct,
           ROUND(COUNT(*) FILTER (WHERE predicted = p_label)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
    FROM pred GROUP BY p_label
    """),
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 3-NN label accuracy over the embedding space — the
    standard embedding-quality probe (high kNN accuracy = classes
    separate in the space; a collapsed or noisy embedding scores near
    chance): majority vote of the 3 nearest neighbors (min-label ties)
    scored against the point's own label, per class. Rides the same
    size-gated exact top-k as cosine_topk (LSH is the documented scale
    path); the vote and scoring folds touch 3 rows per probe."""
    from dopams_etl_spark.operators.similarity import cosine_topk

    emb = t(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") < 200)
    nn = cosine_topk(probe, emb, "vec_id", "vec_id", "embedding", k=3)
    labels = emb.select("vec_id", "label")
    p_lab = labels.select(
        F.col("vec_id").alias("p_id"), F.col("label").alias("p_label")
    )
    c_lab = labels.select(
        F.col("vec_id").alias("c_id"), F.col("label").alias("c_label")
    )
    votes = (
        nn.join(F.broadcast(p_lab), "p_id")
        .join(F.broadcast(c_lab), "c_id")
        .groupBy("p_id", "p_label", "c_label")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    w = Window.partitionBy("p_id").orderBy(
        F.col("v").desc(), F.col("c_label").asc()
    )
    pred = (
        votes.withColumn("pr", F.row_number().over(w))
        .filter(F.col("pr") == 1)
        .select("p_id", "p_label", F.col("c_label").alias("predicted"))
    )
    return pred.groupBy(F.col("p_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("predicted") == F.col("p_label")).alias("n_correct"),
        F.round(
            F.count_if(F.col("predicted") == F.col("p_label"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("accuracy"),
    )


@register(
    "cluster_cohesion_separation",
    """
    WITH ex AS (
      SELECT vec_id, label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)),
    cent AS (
      SELECT label, dim, AVG(x) AS m FROM ex GROUP BY label, dim),
    vec_cos AS (
      SELECT ex.vec_id, ex.label,
             SUM(ex.x * cent.m)
               / (sqrt(SUM(ex.x * ex.x)) * sqrt(SUM(cent.m * cent.m))) AS cos_own
      FROM ex JOIN cent ON ex.label = cent.label AND ex.dim = cent.dim
      GROUP BY ex.vec_id, ex.label),
    pair_cos AS (
      SELECT a.label AS label, b.label AS other,
             SUM(a.m * b.m)
               / (sqrt(SUM(a.m * a.m)) * sqrt(SUM(b.m * b.m))) AS cos_cc
      FROM cent a JOIN cent b ON a.dim = b.dim AND a.label <> b.label
      GROUP BY a.label, b.label),
    sep AS (
      SELECT label, MAX(cos_cc) AS nearest_other_cos
      FROM pair_cos GROUP BY label)
    SELECT vec_cos.label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG(cos_own), 6) AS cohesion,
           ROUND(ANY_VALUE(nearest_other_cos), 6) AS nearest_other_cos,
           -- + 0.0 canonicalizes IEEE -0.0 (margin is sign-indefinite)
           ROUND(AVG(cos_own) - ANY_VALUE(nearest_other_cos), 6) + 0.0 AS margin
    FROM vec_cos JOIN sep USING (label)
    GROUP BY vec_cos.label
    """,
)
def cluster_cohesion_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality scorecard per label — cohesion (mean cosine of
    members to their own centroid) vs separation (cosine to the
    nearest OTHER centroid) and the margin between them: the
    silhouette-style diagnostic that says whether label groups form
    real clusters in embedding space (margin ≤ 0 = the class bleeds
    into a neighbor — expected on synthetic labels, pinned by the
    oracle either way). Everything is (label, dim)-keyed: centroids
    from one hash aggregate, member cosines from a dim-keyed join +
    per-vector fold, centroid-pair cosines over a |labels|²·dims grid
    that is trivially small at any corpus scale (centroids are model
    state, not data)."""
    emb = t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    cent = ex.groupBy("label", "dim").agg(F.avg("x").alias("m"))
    vec_cos = (
        ex.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            (
                F.sum(F.col("x") * F.col("m"))
                / (
                    F.sqrt(F.sum(F.col("x") * F.col("x")))
                    * F.sqrt(F.sum(F.col("m") * F.col("m")))
                )
            ).alias("cos_own")
        )
    )
    a = cent.select(
        F.col("label").alias("label"), "dim", F.col("m").alias("ma")
    )
    b = cent.select(
        F.col("label").alias("other"), F.col("dim").alias("dim_b"), F.col("m").alias("mb")
    )
    pair_cos = (
        a.join(
            F.broadcast(b),
            (F.col("dim") == F.col("dim_b")) & (F.col("label") != F.col("other")),
        )
        .groupBy("label", "other")
        .agg(
            (
                F.sum(F.col("ma") * F.col("mb"))
                / (
                    F.sqrt(F.sum(F.col("ma") * F.col("ma")))
                    * F.sqrt(F.sum(F.col("mb") * F.col("mb")))
                )
            ).alias("cos_cc")
        )
    )
    sep = pair_cos.groupBy("label").agg(
        F.max("cos_cc").alias("nearest_other_cos")
    )
    return (
        vec_cos.join(F.broadcast(sep), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("cos_own"), 6).alias("cohesion"),
            F.round(F.any_value(F.col("nearest_other_cos")), 6).alias(
                "nearest_other_cos"
            ),
            # + 0.0 canonicalizes IEEE -0.0 (margin is sign-indefinite)
            (
                F.round(
                    F.avg("cos_own") - F.any_value(F.col("nearest_other_cos")), 6
                )
                + 0.0
            ).alias("margin"),
        )
    )


@register(
    "dow_hour_heatmap",
    """
    SELECT dayofweek(CAST(ts AS DATE)) AS dow,
           hour(ts) AS hr,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(value), 4) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity grid — the traffic heatmap behind
    capacity planning and maintenance-window choice. One hash
    aggregate to a ≤168-cell grid; DOW in DuckDB's 0=Sunday
    numbering (the dow_seasonality_index convention)."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        (F.dayofweek(F.to_date("ts")) - F.lit(1)).alias("dow"),
        F.hour("ts").alias("hr"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


@register(
    "order_value_iqr_outliers",
    """
    -- CAST DOUBLE first: both engines then interpolate the quartiles in
    -- double even if a fixture regen narrows o_totalprice to float32
    WITH q AS (
      SELECT o_orderpriority,
             quantile_cont(CAST(o_totalprice AS DOUBLE), 0.25) AS q1,
             quantile_cont(CAST(o_totalprice AS DOUBLE), 0.75) AS q3
      FROM orders GROUP BY o_orderpriority)
    SELECT orders.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(ANY_VALUE(q1), 4) AS q1,
           ROUND(ANY_VALUE(q3), 4) AS q3,
           CAST(COUNT(*) FILTER (
             WHERE o_totalprice < q1 - 1.5 * (q3 - q1)
                OR o_totalprice > q3 + 1.5 * (q3 - q1)) AS BIGINT)
             AS n_outliers,
           ROUND(COUNT(*) FILTER (
             WHERE o_totalprice < q1 - 1.5 * (q3 - q1)
                OR o_totalprice > q3 + 1.5 * (q3 - q1))
             / CAST(COUNT(*) AS DOUBLE), 6) AS outlier_rate
    FROM orders JOIN q USING (o_orderpriority)
    GROUP BY orders.o_orderpriority
    """,
)
def order_value_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR outlier fences per priority class — values beyond
    Q1−1.5·IQR / Q3+1.5·IQR, the boxplot rule that needs no
    distribution assumption (the quantile sibling of anomaly_days_mad's
    MAD score). Exact interpolated quartiles fold per class, fences
    re-join broadcast-small, one counting pass — two scans total and
    both collapse map-side."""
    # cast("double") first: both engines then interpolate the quartiles
    # in double even on a float32-narrowed fixture
    o = t(spark, sf_dir, "orders").withColumn(
        "o_totalprice", F.col("o_totalprice").cast("double")
    )
    q = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("o_totalprice") < F.col("q1") - 1.5 * iqr) | (
        F.col("o_totalprice") > F.col("q3") + 1.5 * iqr
    )
    return (
        o.join(F.broadcast(q), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.any_value(F.col("q1")), 4).alias("q1"),
            F.round(F.any_value(F.col("q3")), 4).alias("q3"),
            F.count_if(is_out).alias("n_outliers"),
            F.round(
                F.count_if(is_out) / F.count(F.lit(1)).cast("double"), 6
            ).alias("outlier_rate"),
        )
    )


@register(
    "attribution_first_vs_last",
    """
    WITH ev AS (
      SELECT user_id, event_type, ts, epoch(ts) AS sec, event_id
      FROM events),
    attributed AS (
      SELECT user_id, event_id, sec,
             MIN(CASE WHEN event_type = 'view' THEN sec END)
               OVER w AS first_view_sec,
             MAX(CASE WHEN event_type = 'view' THEN sec END)
               OVER w AS last_view_sec,
             event_type
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY sec
                   RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(first_view_sec) AS BIGINT) AS with_prior_view,
           ROUND(AVG(sec - last_view_sec), 4) AS avg_gap_last_touch_s,
           ROUND(AVG(sec - first_view_sec), 4) AS avg_gap_first_touch_s,
           ROUND(AVG((sec - first_view_sec) - (sec - last_view_sec)), 4)
             AS avg_window_span_s
    FROM attributed WHERE event_type = 'purchase'
    """,
)
def attribution_first_vs_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch attribution windows — for every
    purchase, the earliest and latest view in the preceding 7 days
    (the two endpoints every multi-touch attribution model
    interpolates between), summarized as coverage and average
    time-to-convert under each rule. The RANGE time-frame window
    computes both endpoints in ONE user-keyed pass — no self-join, no
    per-purchase probe — which is the at-scale restatement of the
    as-of-join family (asof_purchase_last_view does last-touch via
    union+carry-forward; this adds the first-touch endpoint and the
    windowed-history bound)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("double").alias("sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-604800, -1)
    )
    view_sec = F.when(F.col("event_type") == "view", F.col("sec"))
    attributed = ev.select(
        "event_type",
        "sec",
        F.min(view_sec).over(w).alias("first_view_sec"),
        F.max(view_sec).over(w).alias("last_view_sec"),
    ).filter(F.col("event_type") == "purchase")
    return attributed.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("first_view_sec").alias("with_prior_view"),
        F.round(F.avg(F.col("sec") - F.col("last_view_sec")), 4).alias(
            "avg_gap_last_touch_s"
        ),
        F.round(F.avg(F.col("sec") - F.col("first_view_sec")), 4).alias(
            "avg_gap_first_touch_s"
        ),
        F.round(
            F.avg(
                (F.col("sec") - F.col("first_view_sec"))
                - (F.col("sec") - F.col("last_view_sec"))
            ),
            4,
        ).alias("avg_window_span_s"),
    )


@register(
    "join_key_skew_report",
    """
    WITH keys AS (
      SELECT 'orders.o_custkey' AS key_col, CAST(o_custkey AS VARCHAR) AS k
      FROM orders
      UNION ALL
      SELECT 'lineitem.l_orderkey', CAST(l_orderkey AS VARCHAR) FROM lineitem
      UNION ALL
      SELECT 'lineitem.l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
      UNION ALL
      SELECT 'events.user_id', CAST(user_id AS VARCHAR) FROM events),
    freq AS (
      SELECT key_col, k, CAST(COUNT(*) AS BIGINT) AS c
      FROM keys GROUP BY key_col, k)
    SELECT key_col,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(c) AS BIGINT) AS max_key_rows,
           ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_key_share,
           ROUND(MAX(c) / (SUM(c) / CAST(COUNT(*) AS DOUBLE)), 4)
             AS max_over_mean
    FROM freq GROUP BY key_col
    """,
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler — per join-key column: cardinality, the
    hottest key's row count and share, and max-over-mean frequency
    (the number AQE's skew-join threshold reasons about): the
    diagnostic that DECIDES between a plain shuffle, salting
    (salted_join_user_enrich), or AQE skew splitting before a 100 TB
    join is launched. One union of per-key counts — each branch is a
    map-side-combined aggregate on its own key, so profiling costs one
    pass per table."""
    o = t(spark, sf_dir, "orders").select(
        F.lit("orders.o_custkey").alias("key_col"),
        F.col("o_custkey").cast("string").alias("k"),
    )
    l1 = t(spark, sf_dir, "lineitem").select(
        F.lit("lineitem.l_orderkey").alias("key_col"),
        F.col("l_orderkey").cast("string").alias("k"),
    )
    l2 = t(spark, sf_dir, "lineitem").select(
        F.lit("lineitem.l_partkey").alias("key_col"),
        F.col("l_partkey").cast("string").alias("k"),
    )
    e = t(spark, sf_dir, "events").select(
        F.lit("events.user_id").alias("key_col"),
        F.col("user_id").cast("string").alias("k"),
    )
    keys = o.unionByName(l1).unionByName(l2).unionByName(e)
    freq = keys.groupBy("key_col", "k").agg(F.count(F.lit(1)).alias("c"))
    return freq.groupBy("key_col").agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_key_rows"),
        F.round(F.max("c") / F.sum("c").cast("double"), 6).alias(
            "top_key_share"
        ),
        F.round(
            F.max("c") / (F.sum("c") / F.count(F.lit(1)).cast("double")), 4
        ).alias("max_over_mean"),
    )


@register(
    "customer_setops_yoy",
    """
    WITH c96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE year(o_orderdate) = 1996),
    c97 AS (SELECT DISTINCT o_custkey FROM orders
            WHERE year(o_orderdate) = 1997),
    both_years AS (SELECT o_custkey FROM c96 INTERSECT
                   SELECT o_custkey FROM c97),
    lost AS (SELECT o_custkey FROM c96 EXCEPT SELECT o_custkey FROM c97),
    gained AS (SELECT o_custkey FROM c97 EXCEPT SELECT o_custkey FROM c96)
    SELECT 'both' AS segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MIN(o_custkey) AS BIGINT) AS min_custkey
    FROM both_years
    UNION ALL
    SELECT 'lost', CAST(COUNT(*) AS BIGINT), CAST(MIN(o_custkey) AS BIGINT)
    FROM lost
    UNION ALL
    SELECT 'gained', CAST(COUNT(*) AS BIGINT), CAST(MIN(o_custkey) AS BIGINT)
    FROM gained
    """,
)
def customer_setops_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year customer movement through the full set-operator
    family — INTERSECT (active both years), EXCEPT both directions
    (lost / newly gained) — the U-family siblings beside
    orders_union_branches' UNION ALL, expressed as the native set
    operators so Catalyst plans them as semi/anti hash joins on the
    distinct key sets (dimension-grain, never fact-sized)."""
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    c96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    c97 = o.filter(F.year("o_orderdate") == 1997).select("o_custkey").distinct()
    both_years = c96.intersect(c97)
    lost = c96.exceptAll(c97)
    gained = c97.exceptAll(c96)

    def seg(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("segment"),
            F.count(F.lit(1)).alias("n_customers"),
            F.min("o_custkey").alias("min_custkey"),
        )

    return (
        seg(both_years, "both")
        .unionByName(seg(lost, "lost"))
        .unionByName(seg(gained, "gained"))
    )


@register(
    "streaming_static_enrich",
    """
    WITH profile AS (
      SELECT user_id,
             CASE WHEN CAST(SUM(CASE WHEN event_type = 'purchase'
                                     THEN 1 ELSE 0 END) AS DOUBLE)
                       / COUNT(*) >= 0.2
                  THEN 'buyer' ELSE 'browser' END AS segment
      FROM events GROUP BY user_id)
    SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events JOIN profile USING (user_id)
    GROUP BY segment
    """,
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join — the live event stream enriched against a
    STATIC dimension (a user-segment profile computed batch-side),
    then aggregated per segment: the standard streaming-enrichment
    topology (stream joins dim without watermark bookkeeping; the
    static side broadcasts and is re-resolvable per micro-batch).
    Replayed through a finite availableNow file stream so the result
    is deterministic and the oracle is the batch equivalence — same
    contract as streaming_hourly_counts."""
    import tempfile

    from dopams_etl_spark.streaming import read_stream_parquet

    ev = t(spark, sf_dir, "events")
    profile = ev.groupBy("user_id").agg(
        F.when(
            F.sum((F.col("event_type") == "purchase").cast("int")).cast("double")
            / F.count(F.lit(1))
            >= 0.2,
            "buyer",
        )
        .otherwise("browser")
        .alias("segment")
    )
    src = tempfile.mkdtemp(prefix="dopams_sse_") + "/events"
    ev.write.parquet(src)
    stream = read_stream_parquet(spark, src, ev.schema)
    enriched = stream.join(F.broadcast(profile), "user_id")
    agg = enriched.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    name = f"sse_sink_{next(_SSE_SEQ)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


import itertools as _itertools  # noqa: E402

_SSE_SEQ = _itertools.count()


@register(
    "population_stability_index",
    """
    -- value/ts IS NOT NULL: a row without a measure or a period has no
    -- PSI position (Spark NULL-propagates the bucket comparisons where
    -- DuckDB's CASE would silently file NULLs into bucket 0 / period B)
    WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events
               WHERE value IS NOT NULL AND ts IS NOT NULL),
    tagged AS (
      SELECT value,
             CAST(ts AS DATE) < d0 + 15 AS in_a
      FROM events CROSS JOIN b
      WHERE value IS NOT NULL AND ts IS NOT NULL),
    cuts AS (
      SELECT quantile_cont(value, 0.1) AS c1, quantile_cont(value, 0.2) AS c2,
             quantile_cont(value, 0.3) AS c3, quantile_cont(value, 0.4) AS c4,
             quantile_cont(value, 0.5) AS c5, quantile_cont(value, 0.6) AS c6,
             quantile_cont(value, 0.7) AS c7, quantile_cont(value, 0.8) AS c8,
             quantile_cont(value, 0.9) AS c9
      FROM tagged WHERE in_a),
    bucketed AS (
      SELECT in_a,
             (CASE WHEN value > c1 THEN 1 ELSE 0 END
              + CASE WHEN value > c2 THEN 1 ELSE 0 END
              + CASE WHEN value > c3 THEN 1 ELSE 0 END
              + CASE WHEN value > c4 THEN 1 ELSE 0 END
              + CASE WHEN value > c5 THEN 1 ELSE 0 END
              + CASE WHEN value > c6 THEN 1 ELSE 0 END
              + CASE WHEN value > c7 THEN 1 ELSE 0 END
              + CASE WHEN value > c8 THEN 1 ELSE 0 END
              + CASE WHEN value > c9 THEN 1 ELSE 0 END) AS bucket
      FROM tagged CROSS JOIN cuts),
    counts AS (
      SELECT bucket,
             CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
      FROM bucketed GROUP BY bucket),
    tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM counts),
    shares AS (
      SELECT bucket, n_a, n_b,
             (n_a + 0.5) / (ta + 5.0) AS p_a,
             (n_b + 0.5) / (tb + 5.0) AS p_b
      FROM counts CROSS JOIN tot)
    SELECT bucket, n_a, n_b,
           ROUND(p_a, 6) AS p_a, ROUND(p_b, 6) AS p_b,
           ROUND((p_b - p_a) * ln(p_b / p_a), 6) AS psi_term,
           ROUND(SUM((p_b - p_a) * ln(p_b / p_a)) OVER (), 6) AS psi_total
    FROM shares
    """,
)
def population_stability_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of event value between the first 15
    days and the rest — Σ (pB−pA)·ln(pB/pA) over period-A deciles, THE
    model-monitoring drift metric (rule of thumb: <0.1 stable, >0.25
    retrain). Decile cut-points are a one-row exact-percentile
    aggregate over period A broadcast onto the fact; bucketing is
    map-only comparisons; Laplace (+0.5) smoothing keeps empty period-B
    buckets finite identically on both engines. At gigarow scale the
    cut-points swap to approx_percentile per the established
    convention."""
    # value/ts IS NOT NULL: a row without a measure or a period has no
    # PSI position (NULL would bucket differently across the engines)
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    b = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    tagged = ev.crossJoin(F.broadcast(b)).select(
        "value",
        (F.to_date("ts") < F.date_add(F.col("d0"), 15)).alias("in_a"),
    )
    cuts = tagged.filter("in_a").agg(
        *[
            F.percentile("value", F.lit(q / 10.0)).alias(f"c{q}")
            for q in range(1, 10)
        ]
    )
    bucket = None
    for q in range(1, 10):
        term = (F.col("value") > F.col(f"c{q}")).cast("int")
        bucket = term if bucket is None else bucket + term
    counts = (
        tagged.crossJoin(F.broadcast(cuts))
        .select("in_a", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.col("in_a").cast("int")).alias("n_a"),
            F.sum((~F.col("in_a")).cast("int")).alias("n_b"),
        )
    )
    tot = counts.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    shares = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_a",
        "n_b",
        ((F.col("n_a") + 0.5) / (F.col("ta") + 5.0)).alias("p_a"),
        ((F.col("n_b") + 0.5) / (F.col("tb") + 5.0)).alias("p_b"),
    )
    psi_term = (F.col("p_b") - F.col("p_a")) * F.log(F.col("p_b") / F.col("p_a"))
    return shares.select(
        "bucket",
        "n_a",
        "n_b",
        F.round("p_a", 6).alias("p_a"),
        F.round("p_b", 6).alias("p_b"),
        F.round(psi_term, 6).alias("psi_term"),
        F.round(F.sum(psi_term).over(Window.partitionBy()), 6).alias(
            "psi_total"
        ),
    )


@register(
    "expected_calibration_error",
    """
    WITH d AS (
      SELECT n_chars, (lang = 'en') AS y,
             percent_rank() OVER (ORDER BY n_chars) AS p_hat
      FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
    binned AS (
      SELECT LEAST(CAST(FLOOR(p_hat * 10) AS INT), 9) AS bin,
             p_hat, CASE WHEN y THEN 1.0 ELSE 0.0 END AS y
      FROM d),
    per_bin AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             AVG(p_hat) AS conf, AVG(y) AS acc
      FROM binned GROUP BY bin),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM per_bin)
    SELECT bin, n, ROUND(conf, 6) AS mean_confidence,
           ROUND(acc, 6) AS positive_rate,
           ROUND(abs(conf - acc), 6) AS gap,
           ROUND(SUM((n / total) * abs(conf - acc)) OVER (), 6) AS ece
    FROM per_bin CROSS JOIN tot
    """,
)
def expected_calibration_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error of a score against a label —
    rank-normalize the score to [0,1] (percent_rank as the pseudo-
    probability), bin into 10 confidence bands, and weight each band's
    |mean confidence − positive rate| gap: the reliability-diagram
    scalar that says whether a score's VALUE is trustworthy, where AUC
    (quality_score_auc, same score/label pair) only certifies its
    ORDER. The rank window sorts the document-grain score column once;
    at gigarow scale the normalization swaps to an approx-percentile
    mapping, same convention as the PSI cut-points."""
    docs = t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    d = docs.select(
        F.percent_rank().over(Window.orderBy("n_chars")).alias("p_hat"),
        (F.col("lang") == "en").cast("double").alias("y"),
    )
    binned = d.select(
        F.least(F.floor(F.col("p_hat") * 10).cast("int"), F.lit(9)).alias("bin"),
        "p_hat",
        "y",
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("p_hat").alias("conf"),
        F.avg("y").alias("acc"),
    )
    tot = per_bin.agg(F.sum("n").cast("double").alias("total"))
    gap = F.abs(F.col("conf") - F.col("acc"))
    return per_bin.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        F.round("conf", 6).alias("mean_confidence"),
        F.round("acc", 6).alias("positive_rate"),
        F.round(gap, 6).alias("gap"),
        F.round(
            F.sum((F.col("n") / F.col("total")) * gap).over(Window.partitionBy()),
            6,
        ).alias("ece"),
    )


def _bootstrap_oracle(reps: int = 50) -> str:
    bucket = md5_bucket32_sql(
        "CAST(r AS VARCHAR) || '|' || CAST(event_id AS VARCHAR)"
    )
    return f"""
    WITH reps AS (SELECT unnest(generate_series(0, {reps - 1})) AS r),
    draws AS (
      SELECT r, value,
             {bucket} / 4294967296.0 AS u
      FROM events CROSS JOIN reps),
    weighted AS (
      SELECT r, value,
             CASE WHEN u < 0.3678794411714423 THEN 0
                  WHEN u < 0.7357588823428846 THEN 1
                  WHEN u < 0.9196986029286058 THEN 2
                  WHEN u < 0.9810118431238462 THEN 3
                  WHEN u < 0.9963401531726563 THEN 4
                  ELSE 5 END AS w
      FROM draws),
    means AS (
      SELECT r, SUM(w * value) / SUM(w) AS m
      FROM weighted GROUP BY r HAVING SUM(w) > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
           ROUND(AVG(m), 6) AS boot_mean,
           ROUND(quantile_cont(m, 0.025), 6) AS ci_lo,
           ROUND(quantile_cont(m, 0.975), 6) AS ci_hi
    FROM means
    """


@register("bootstrap_mean_ci", _bootstrap_oracle(50))
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95 % confidence interval for mean event value —
    the DISTRIBUTED bootstrap (Chamandy et al., Google): classic
    resampling needs N draws per replicate from a shared index
    (unshardable); the Poisson trick gives each row an independent
    Poisson(1) multiplicity per replicate, so 50 replicates become one
    map-side explode + weight column and one (replicate)-keyed
    aggregate — no shared state, any partitioning. Draws are
    md5-deterministic
    (replicate-salted, same inverse-CDF table as repr literals on both
    engines), so the oracle reproduces every replicate exactly."""
    from dopams_etl_spark.partitioning import ensure_parallelism

    # r15 (guide §2): the events parquet scans as ONE partition at bench
    # scale, serializing the 50× fan-out + 5M md5 draws onto one core.
    ev = ensure_parallelism(
        t(spark, sf_dir, "events").select("event_id", "value")
    )
    u = md5_bucket32(
        F.concat(
            F.col("r").cast("string"),
            F.lit("|"),
            F.col("event_id").cast("string"),
        )
    ) / F.lit(4294967296.0)
    # inverse CDF of Poisson(1): P(0)=P(1)=e^-1, P(2)=e^-1/2, ...
    w = (
        F.when(u < 0.3678794411714423, 0)
        .when(u < 0.7357588823428846, 1)
        .when(u < 0.9196986029286058, 2)
        .when(u < 0.9810118431238462, 3)
        .when(u < 0.9963401531726563, 4)
        .otherwise(5)
    )
    fanned = ev.select(
        "event_id",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(49))).alias("r"),
    )
    weighted = fanned.select("r", "value", w.alias("w"))
    means = (
        weighted.groupBy("r")
        .agg(
            (F.sum(F.col("w") * F.col("value")) / F.sum("w")).alias("m"),
            F.sum("w").alias("tw"),
        )
        .filter(F.col("tw") > 0)
    )
    return means.agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.round(F.avg("m"), 6).alias("boot_mean"),
        F.round(F.percentile("m", F.lit(0.025)), 6).alias("ci_lo"),
        F.round(F.percentile("m", F.lit(0.975)), 6).alias("ci_hi"),
    )


@register(
    "kaplan_meier_retention",
    "WITH "
    + session_ctes()
    + """,
    bounds AS (SELECT MAX(ts) AS max_ts FROM events),
    spans AS (
      SELECT user_id, session_num,
             CAST(date_diff('second', MIN(ts), MAX(ts)) // 60 AS BIGINT)
               AS duration,
             epoch_us(MAX(ts)) >= epoch_us(max_ts) - 1800000000 AS censored
      FROM s CROSS JOIN bounds
      GROUP BY user_id, session_num, max_ts),
    n_total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM spans),
    ev AS (
      SELECT duration AS t,
             CAST(COUNT(*) FILTER (WHERE NOT censored) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leaving
      FROM spans GROUP BY duration),
    km AS (
      SELECT t, d,
             n0 - COALESCE(SUM(leaving) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS at_risk
      FROM ev CROSS JOIN n_total)
    SELECT CAST(t AS INT) AS t_minutes, d AS n_ended,
           CAST(at_risk AS BIGINT) AS n_at_risk,
           ROUND(exp(SUM(ln(1.0 - d / CAST(at_risk AS DOUBLE)))
                     OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 6)
             AS survival
    FROM km WHERE d > 0 AND at_risk > d
    """,
)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of SESSION lifetime in minutes
    (30-min-gap sessions; a session whose last event touches the final
    30 minutes of the observation window is right-censored — it may
    still be open) — the churn-analysis estimator that handles
    censoring correctly where a naive average-duration is biased low.
    The running product Π(1−dᵢ/nᵢ) is restated as exp(Σ ln(·)) so it
    becomes one ordered window over the ≤|distinct durations|
    event-time table; sessions collapse from the fact through the
    standard two-window sessionization (user_sessions), and the
    observation bound is a one-row broadcast. Steps with zero ended
    sessions or an exhausted risk set drop out identically on both
    engines."""
    ev = t(spark, sf_dir, "events")
    s = with_session_num(ev)
    bounds = ev.agg(F.max("ts").alias("max_ts"))
    spans = (
        s.crossJoin(F.broadcast(bounds))
        .groupBy("user_id", "session_num", "max_ts")
        .agg(
            F.floor(
                (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
                / 60
            ).alias("duration"),
            (
                # integer MICROSECONDS on both engines: a cast-to-long
                # (second-truncated) comparison vs the oracle's
                # interval arithmetic can disagree on a session ending
                # in the same second as the censoring boundary
                F.max(F.unix_micros(F.col("ts")))
                >= F.unix_micros(F.col("max_ts")) - 1_800_000_000
            ).alias("censored"),
        )
    )
    n_total = spans.agg(F.count(F.lit(1)).alias("n0"))
    evts = spans.groupBy(F.col("duration").alias("t")).agg(
        F.count_if(~F.col("censored")).alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    prior = (
        Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    )
    km = evts.crossJoin(F.broadcast(n_total)).select(
        "t",
        "d",
        (
            F.col("n0")
            - F.coalesce(F.sum("leaving").over(prior), F.lit(0))
        ).alias("at_risk"),
    )
    run = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = km.filter((F.col("d") > 0) & (F.col("at_risk") > F.col("d"))).select(
        F.col("t").cast("int").alias("t_minutes"),
        F.col("d").alias("n_ended"),
        F.col("at_risk").alias("n_at_risk"),
        F.round(
            F.exp(
                F.sum(
                    F.log(
                        F.lit(1.0) - F.col("d") / F.col("at_risk").cast("double")
                    )
                ).over(run)
            ),
            6,
        ).alias("survival"),
    )
    return out


@register(
    "mann_whitney_value_test",
    """
    WITH labeled AS (
      SELECT value, event_type = 'purchase' AS y FROM events
      WHERE event_type IN ('purchase', 'view')),
    ps AS (SELECT value AS s, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
           FROM labeled GROUP BY value),
    r AS (SELECT s, n, n_pos,
                 COALESCE(SUM(n) OVER (ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + (n + 1.0) / 2.0 AS avg_rank
          FROM ps),
    agg AS (
      SELECT SUM(n_pos * avg_rank) AS r1,
             CAST(SUM(n_pos) AS DOUBLE) AS n1,
             CAST(SUM(n - n_pos) AS DOUBLE) AS n2
      FROM r)
    SELECT CAST(n1 AS BIGINT) AS n_purchase,
           CAST(n2 AS BIGINT) AS n_view,
           ROUND(r1 - n1 * (n1 + 1) / 2, 2) AS u_stat,
           -- + 0.0 canonicalizes IEEE -0.0 (z_stat is sign-indefinite)
           ROUND(((r1 - n1 * (n1 + 1) / 2) - n1 * n2 / 2)
                 / sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0), 4) + 0.0 AS z_stat
    FROM agg
    """,
)
def mann_whitney_value_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney rank-sum test — do purchase events carry
    systematically different values than views? The NONPARAMETRIC
    two-sample test (no normality assumption, unlike
    ab_test_proportion_z's pooled z), via the same midrank machinery as
    quality_score_auc (U = n₁n₂·AUC): scores collapse to
    per-distinct-value counts, ONE rank window over |distinct values|
    rows, closed-form normal approximation for z. Never the pairwise
    comparison."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    labeled = ev.select(
        "value", (F.col("event_type") == "purchase").alias("y")
    )
    ps = labeled.groupBy(F.col("value").alias("s")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("int")).alias("n_pos"),
    )
    prior = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    r = ps.select(
        "n",
        "n_pos",
        (
            F.coalesce(F.sum("n").over(prior), F.lit(0))
            + (F.col("n") + 1.0) / 2.0
        ).alias("avg_rank"),
    )
    agg = r.agg(
        F.sum(F.col("n_pos") * F.col("avg_rank")).alias("r1"),
        F.sum("n_pos").cast("double").alias("n1"),
        F.sum(F.col("n") - F.col("n_pos")).cast("double").alias("n2"),
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2
    return agg.select(
        F.col("n1").cast("bigint").alias("n_purchase"),
        F.col("n2").cast("bigint").alias("n_view"),
        F.round(u, 2).alias("u_stat"),
        # + 0.0 canonicalizes IEEE -0.0 (z_stat is sign-indefinite)
        (
            F.round(
                (u - F.col("n1") * F.col("n2") / 2)
                / F.sqrt(
                    F.col("n1")
                    * F.col("n2")
                    * (F.col("n1") + F.col("n2") + 1)
                    / 12.0
                ),
                4,
            )
            + 0.0
        ).alias("z_stat"),
    )


@register(
    "chi_square_type_dow",
    """
    WITH j AS (
      SELECT event_type AS x, dayofweek(CAST(ts AS DATE)) AS y,
             CAST(COUNT(*) AS DOUBLE) AS n_xy
      FROM events GROUP BY 1, 2),
    mx AS (SELECT x, SUM(n_xy) AS n_x FROM j GROUP BY x),
    my AS (SELECT y, SUM(n_xy) AS n_y FROM j GROUP BY y),
    tot AS (SELECT SUM(n_xy) AS n FROM j),
    dims AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM mx) AS r,
                    (SELECT CAST(COUNT(*) AS BIGINT) FROM my) AS c)
    -- NULLIF: a single-row/column grid (e.g. a 1-row fixture) makes the
    -- Cramér denominator n * LEAST(r-1, c-1) zero — NULL V on both engines
    SELECT ROUND(SUM(power(n_xy - n_x * n_y / n, 2)
                     / (n_x * n_y / n)), 4) AS chi2,
           CAST((dims.r - 1) * (dims.c - 1) AS BIGINT) AS dof,
           ROUND(sqrt(SUM(power(n_xy - n_x * n_y / n, 2) / (n_x * n_y / n))
                      / NULLIF(ANY_VALUE(n) * LEAST(dims.r - 1, dims.c - 1),
                               0.0)), 6)
             AS cramers_v
    FROM j JOIN mx USING (x) JOIN my USING (y)
    CROSS JOIN tot CROSS JOIN dims
    GROUP BY dims.r, dims.c
    """,
)
def chi_square_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test + Cramér's V between event type and
    weekday — the classical significance companion to
    mutual_information_type_dow's information-theoretic view (same
    ≤35-cell joint aggregate; chi² answers 'is the dependence real at
    this sample size', V gives the effect size in [0,1]). Expected
    counts from broadcast marginals; degrees of freedom from the
    observed grid dimensions."""
    ev = t(spark, sf_dir, "events")
    j = ev.groupBy(
        F.col("event_type").alias("x"),
        F.dayofweek(F.to_date("ts")).alias("y"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n_xy"))
    mx = j.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    my = j.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    tot = j.agg(F.sum("n_xy").alias("n"))
    dims = mx.agg(F.count(F.lit(1)).alias("r")).crossJoin(
        my.agg(F.count(F.lit(1)).alias("c"))
    )
    expected = F.col("n_x") * F.col("n_y") / F.col("n")
    chi2 = F.sum(F.pow(F.col("n_xy") - expected, 2) / expected)
    return (
        j.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(dims))
        .groupBy("r", "c")
        .agg(
            F.round(chi2, 4).alias("chi2"),
            ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
            # try_divide: a 1-row/1-column grid zeroes the Cramér
            # denominator — the bare '/' would ANSI-abort where the
            # oracle's NULLIF yields NULL
            F.round(
                F.sqrt(
                    F.try_divide(
                        chi2,
                        F.any_value(F.col("n"))
                        * F.least(F.col("r") - 1, F.col("c") - 1),
                    )
                ),
                6,
            ).alias("cramers_v"),
        )
        .drop("r", "c")
    )


@register(
    "woe_information_value",
    """
    WITH b AS (
      -- o_totalprice IS NOT NULL: an unpriced order has no quintile
      -- (Spark sorts NULLs first, DuckDB last - it must not bin)
      SELECT NTILE(5) OVER (ORDER BY o_totalprice, o_orderkey) AS bin,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS pos
      FROM orders WHERE o_totalprice IS NOT NULL),
    c AS (SELECT bin,
                 CAST(SUM(pos) AS DOUBLE) AS np,
                 CAST(SUM(1 - pos) AS DOUBLE) AS nn,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM b GROUP BY bin),
    tot AS (SELECT SUM(np) AS tp, SUM(nn) AS tn FROM c)
    -- + 0.0 canonicalizes IEEE -0.0 (woe is sign-indefinite)
    SELECT bin, n, CAST(np AS BIGINT) AS n_pos,
           ROUND(LN((np / tp) / (nn / tn)), 6) + 0.0 AS woe,
           ROUND((np / tp - nn / tn) * LN((np / tp) / (nn / tn)), 6) AS iv_term
    FROM c CROSS JOIN tot
    WHERE np > 0 AND nn > 0
    """,
)
def woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value binning — the
    credit-scoring feature diagnostic: o_totalprice quintiles scored by
    how strongly each separates urgent/high-priority orders from the
    rest (woe = ln(bin's share of positives / share of negatives);
    IV = sum of iv_terms). The NTILE sorts only (price, key) pairs —
    the same bounded global sort as the RFM grid — and the totals ride
    along as a one-row broadcast. Degenerate all-pos/all-neg bins are
    excluded identically on both sides (LN would diverge)."""
    # o_totalprice IS NOT NULL: an unpriced order has no quintile (Spark
    # sorts NULLs first, DuckDB last — it must not bin)
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    b = o.select(
        F.ntile(5)
        .over(Window.orderBy("o_totalprice", "o_orderkey"))
        .alias("bin"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("pos"),
    )
    c = b.groupBy("bin").agg(
        F.sum("pos").cast("double").alias("np"),
        F.sum(F.lit(1) - F.col("pos")).cast("double").alias("nn"),
        F.count(F.lit(1)).alias("n"),
    )
    tot = c.agg(F.sum("np").alias("tp"), F.sum("nn").alias("tn"))
    share = (F.col("np") / F.col("tp")) / (F.col("nn") / F.col("tn"))
    return (
        c.crossJoin(F.broadcast(tot))
        .filter((F.col("np") > 0) & (F.col("nn") > 0))
        .select(
            "bin",
            "n",
            F.col("np").cast("bigint").alias("n_pos"),
            # + 0.0 canonicalizes IEEE -0.0 (woe is sign-indefinite)
            (F.round(F.log(share), 6) + 0.0).alias("woe"),
            F.round(
                (F.col("np") / F.col("tp") - F.col("nn") / F.col("tn"))
                * F.log(share),
                6,
            ).alias("iv_term"),
        )
    )


@register(
    "lineitem_corr_matrix",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(corr(l_quantity, l_extendedprice), 6) + 0.0 AS r_qty_price,
           ROUND(corr(l_quantity, l_discount), 6) + 0.0 AS r_qty_disc,
           ROUND(corr(l_extendedprice, l_discount), 6) + 0.0 AS r_price_disc
    FROM lineitem
    """,
)
def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem measures —
    the collinearity screen a feature pipeline runs before model
    training. All three coefficients come out of ONE map-side-combined
    aggregate pass (each corr is a handful of running sums), so the
    fact table is scanned once and nothing but a single one-row
    reduction crosses the wire — the cheapest possible shape at any
    scale.

    Each coefficient is assembled from the throw-free POPULATION
    moments, pairwise-complete (the r12 ``event_value_moments``
    pattern): under ANSI, Spark's builtin corr ABORTS on a
    zero-variance column (a constant measure — the fuzz census's
    ``const`` shape) where DuckDB yields NULL; try_divide supplies the
    NULL. + 0.0 canonicalizes IEEE -0.0 on the sign-indefinite rounded
    coefficients (both engines)."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    p = F.col("l_extendedprice").cast("double")
    d = F.col("l_discount").cast("double")

    def pcorr(x: Column, y: Column) -> Column:
        return F.try_divide(
            F.covar_pop(x, y),
            F.stddev_pop(F.when(y.isNotNull(), x))
            * F.stddev_pop(F.when(x.isNotNull(), y)),
        )

    return li.agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(pcorr(q, p), 6) + 0.0).alias("r_qty_price"),
        (F.round(pcorr(q, d), 6) + 0.0).alias("r_qty_disc"),
        (F.round(pcorr(p, d), 6) + 0.0).alias("r_price_disc"),
    )


@register(
    "stratified_kfold_assign",
    """
    WITH f AS (
      SELECT label,
             __MD5_BUCKET__ % 5 AS fold
      FROM embeddings),
    tot AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_label
            FROM f GROUP BY label)
    SELECT f.label, CAST(fold AS INT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) / CAST(ANY_VALUE(n_label) AS DOUBLE), 6) AS share
    FROM f JOIN tot ON f.label = tot.label
    GROUP BY f.label, fold
    """.replace(
        "__MD5_BUCKET__",
        md5_bucket32_sql(
            "COALESCE(CAST(label AS VARCHAR), '') || ':' ||"
            " COALESCE(CAST(vec_id AS VARCHAR), '')"
        ),
    ),
)
def stratified_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified k-fold split — every labeled embedding
    hashed (md5 of label:id) into one of 5 folds, reported as the
    (label, fold) balance grid: the train/eval split machinery an ML
    data pipeline needs to be REPRODUCIBLE across runs, engines, and
    partitionings (no rand(), no row_number over an arbitrary order —
    the fold is a pure function of the row's identity, the same
    convention as the weighted/temperature samplers). Map-only
    assignment into a ≤ |labels|×5 aggregate; per-label totals join
    back broadcast-small."""
    emb = t(spark, sf_dir, "embeddings")
    # COALESCE('') on both engines: concat_ws SKIPS nulls while SQL ||
    # null-propagates — explicit empty-string defaults make a null label
    # or id hash identically everywhere instead of diverging
    fold = (
        md5_bucket32(
            F.concat(
                F.coalesce(F.col("label").cast("string"), F.lit("")),
                F.lit(":"),
                F.coalesce(F.col("vec_id").cast("string"), F.lit("")),
            )
        )
        % 5
    )
    f = emb.select("label", fold.alias("fold"))
    tot = f.groupBy("label").agg(F.count(F.lit(1)).alias("n_label"))
    return (
        f.groupBy("label", "fold")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(tot), "label")
        .select(
            "label",
            F.col("fold").cast("int").alias("fold"),
            "n",
            F.round(F.col("n") / F.col("n_label").cast("double"), 6).alias(
                "share"
            ),
        )
    )


@register(
    "nation_revenue_pct_of_parent",
    """
    WITH nrev AS (
      SELECT r_name AS region_name, n_name AS nation_name,
             -- CAST DOUBLE first (r14 f32 census) — matches the widened
             -- money_cents scaling lane
             CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2),
    w AS (SELECT *,
                 CAST(SUM(cents) OVER (PARTITION BY region_name) AS BIGINT)
                   AS region_cents,
                 CAST(SUM(cents) OVER () AS BIGINT) AS total_cents
          FROM nrev)
    SELECT region_name, nation_name,
           CAST(CAST(cents AS DECIMAL(38,0)) / 100 AS DECIMAL(18,2))::VARCHAR
             AS nation_rev,
           ROUND(CAST(cents AS DOUBLE) / region_cents, 6) AS pct_of_region,
           ROUND(CAST(cents AS DOUBLE) / total_cents, 6) AS pct_of_total
    FROM w
    """,
)
def nation_revenue_pct_of_parent(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Percent-of-parent hierarchical rollup — each nation's revenue as
    a share of its region and of the whole, the drill-down reporting
    primitive a plain ROLLUP/CUBE (cube_region_priority_revenue) does
    not give (it emits parent SUBTOTAL rows; this emits parent-relative
    RATIOS on the leaf rows). Money summed as exact integer cents
    (functions/money.py — partitioning-invariant, so the window re-sums
    over the 25-row nation table are order-independent integers, where
    a double re-sum could flip the last ulp per engine); ratios leave
    cents for double division only at the end."""
    from dopams_etl_spark.functions.money import (
        cents_to_money_string,
        money_cents,
    )

    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    j = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    nrev = j.groupBy(
        F.col("r_name").alias("region_name"),
        F.col("n_name").alias("nation_name"),
    ).agg(F.sum(money_cents("o_totalprice")).alias("cents"))
    wr = Window.partitionBy("region_name")
    wt = Window.partitionBy()
    return nrev.select(
        "region_name",
        "nation_name",
        cents_to_money_string("cents").alias("nation_rev"),
        F.round(
            F.col("cents").cast("double") / F.sum("cents").over(wr), 6
        ).alias("pct_of_region"),
        F.round(
            F.col("cents").cast("double") / F.sum("cents").over(wt), 6
        ).alias("pct_of_total"),
    )


@register(
    "nation_order_day_gaps",
    """
    WITH nd AS (
      SELECT DISTINCT n_name AS nation_name, CAST(o_orderdate AS DATE) AS day
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey),
    g AS (SELECT nation_name,
                 date_diff('day',
                           lag(day) OVER (PARTITION BY nation_name
                                          ORDER BY day),
                           day) - 1 AS gap
          FROM nd)
    SELECT nation_name,
           CAST(COUNT(*) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) FILTER (WHERE gap > 0) AS BIGINT) AS n_gaps,
           CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_days,
           CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS total_missing_days
    FROM g GROUP BY nation_name
    """,
)
def nation_order_day_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage-gap profiling (the islands construction's inverse): per
    nation, how continuous is the order-day record — count, size, and
    total of the holes between consecutive active days. The freshness/
    completeness monitor a pipeline runs on its own output. One
    distinct-day reduction (bounded by |nations|·|calendar days| at any
    fact scale), one per-nation lag window over that bounded table.
    The first active day's NULL gap row is KEPT (aggregates skip it; a
    filter would silently drop every single-active-day nation — the
    most degenerate entity a completeness monitor exists to surface)."""
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nd = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation_name"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .distinct()
    )
    w = Window.partitionBy("nation_name").orderBy("day")
    g = nd.select(
        "nation_name",
        (F.datediff(F.col("day"), F.lag("day").over(w)) - 1).alias("gap"),
    )
    return g.groupBy("nation_name").agg(
        F.count(F.lit(1)).alias("n_active_days"),
        F.count_if(F.col("gap") > 0).alias("n_gaps"),
        F.coalesce(F.max("gap"), F.lit(0)).cast("long").alias("max_gap_days"),
        F.coalesce(F.sum("gap"), F.lit(0)).cast("long").alias(
            "total_missing_days"
        ),
    )


@register(
    "logrank_retention_test",
    ("WITH "
    + session_ctes()
    + """,
    bounds AS (SELECT MAX(ts) AS max_ts FROM events),
    spans AS (
      SELECT user_id, session_num,
             __MD5_COHORT__ AS grp,
             CAST(date_diff('second', MIN(ts), MAX(ts)) // 60 AS BIGINT)
               AS duration,
             epoch_us(MAX(ts)) >= epoch_us(max_ts) - 1800000000 AS censored
      FROM s CROSS JOIN bounds
      GROUP BY user_id, session_num, max_ts),
    n0 AS (SELECT CAST(COUNT(*) FILTER (WHERE grp = 1) AS BIGINT) AS n0_1,
                  CAST(COUNT(*) AS BIGINT) AS n0_all
           FROM spans),
    ev AS (
      SELECT duration AS t,
             CAST(COUNT(*) FILTER (WHERE NOT censored AND grp = 1) AS BIGINT)
               AS d1,
             CAST(COUNT(*) FILTER (WHERE NOT censored) AS BIGINT) AS d,
             CAST(COUNT(*) FILTER (WHERE grp = 1) AS BIGINT) AS leaving1,
             CAST(COUNT(*) AS BIGINT) AS leaving
      FROM spans GROUP BY duration),
    risk AS (
      SELECT t, d1, d,
             n0_1 - COALESCE(SUM(leaving1) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n1,
             n0_all - COALESCE(SUM(leaving) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n
      FROM ev CROSS JOIN n0),
    terms AS (
      SELECT t, d1,
             d * (n1 / CAST(n AS DOUBLE)) AS e1,
             d * (n1 / CAST(n AS DOUBLE)) * (1.0 - n1 / CAST(n AS DOUBLE))
               * ((n - d) / CAST(NULLIF(n - 1, 0) AS DOUBLE)) AS v
      FROM risk WHERE d >= 1 AND n >= 2),
    acc AS (
      SELECT CAST(SUM(d1) OVER wt AS BIGINT) AS o1,
             SUM(e1) OVER wt AS e1s,
             SUM(v) OVER wt AS vs,
             row_number() OVER (ORDER BY t DESC) AS rn
      FROM terms
      WINDOW wt AS (ORDER BY t ROWS UNBOUNDED PRECEDING)),
    last AS (SELECT o1, e1s, vs FROM acc WHERE rn = 1)
    SELECT (SELECT CAST(COUNT(*) FILTER (WHERE grp = 1) AS BIGINT)
            FROM spans) AS n_sessions_b,
           (SELECT CAST(COUNT(*) FILTER (WHERE grp = 0) AS BIGINT)
            FROM spans) AS n_sessions_a,
           o1 AS observed_b,
           ROUND(e1s, 6) AS expected_b,
           ROUND(vs, 6) AS variance_b,
           ROUND((o1 - e1s) * (o1 - e1s) / NULLIF(vs, 0.0), 6) AS chi2
    FROM last
    """).replace("__MD5_COHORT__", md5_cohort_sql("logrank-v1", "user_id")),
)
def logrank_retention_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel–Cox) test — do two user cohorts' SESSION
    lifetimes follow the same survival curve? The censoring-correct
    companion to ``kaplan_meier_retention`` (same 30-min sessionization,
    same right-censoring of sessions touching the final 30 minutes) and
    the survival twin of ``ab_test_proportion_z`` (same deterministic
    md5 cohort split, salt ``logrank-v1``): at each distinct session
    duration t, cohort B's observed deaths are compared to the
    hypergeometric expectation d·n₁/n, with variance
    d·(n₁/n)(1−n₁/n)(n−d)/(n−1); χ² = (O−E)²/V on the sums. Shape: the
    fact collapses to a ≤|distinct durations| event-time table; at-risk
    counts are two cumulative windows; O/E/V accumulate through ONE
    ordered cumulative frame (last row taken), so both engines add the
    per-term doubles — themselves bit-identical, integer inputs through
    one shared expression shape — in identical order: no
    summation-order ulps, the ``page_hinkley_value_drift`` posture.
    NULLIF guards: a single-session time step (n=1) contributes no
    variance term, and a zero total variance yields NULL χ², never an
    ANSI abort."""
    ev = t(spark, sf_dir, "events")
    s = with_session_num(ev)
    bounds = ev.agg(F.max("ts").alias("max_ts"))
    grp = md5_cohort("logrank-v1", "user_id")
    spans = (
        s.crossJoin(F.broadcast(bounds))
        .groupBy("user_id", "session_num", "max_ts")
        .agg(
            F.floor(
                (
                    F.max(F.col("ts").cast("long"))
                    - F.min(F.col("ts").cast("long"))
                )
                / 60
            ).alias("duration"),
            (
                # integer MICROSECONDS on both engines: a cast-to-long
                # (second-truncated) comparison vs the oracle's
                # interval arithmetic can disagree on a session ending
                # in the same second as the censoring boundary
                F.max(F.unix_micros(F.col("ts")))
                >= F.unix_micros(F.col("max_ts")) - 1_800_000_000
            ).alias("censored"),
        )
        .select("duration", "censored", grp.alias("grp"))
    )
    n0 = spans.agg(
        F.count_if(F.col("grp") == 1).alias("n0_1"),
        F.count(F.lit(1)).alias("n0_all"),
        F.count_if(F.col("grp") == 0).alias("n0_0"),
    )
    evt = spans.groupBy(F.col("duration").alias("t")).agg(
        F.count_if(~F.col("censored") & (F.col("grp") == 1)).alias("d1"),
        F.count_if(~F.col("censored")).alias("d"),
        F.count_if(F.col("grp") == 1).alias("leaving1"),
        F.count(F.lit(1)).alias("leaving"),
    )
    prior = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = evt.crossJoin(F.broadcast(n0)).select(
        "t",
        "d1",
        "d",
        "n0_1",
        "n0_0",
        (
            F.col("n0_1")
            - F.coalesce(F.sum("leaving1").over(prior), F.lit(0))
        ).alias("n1"),
        (
            F.col("n0_all")
            - F.coalesce(F.sum("leaving").over(prior), F.lit(0))
        ).alias("n"),
    )
    frac = F.col("n1") / F.col("n").cast("double")
    terms = risk.filter((F.col("d") >= 1) & (F.col("n") >= 2)).select(
        "t",
        "d1",
        "n0_1",
        "n0_0",
        (F.col("d") * frac).alias("e1"),
        (
            F.col("d")
            * frac
            * (F.lit(1.0) - frac)
            * (
                (F.col("n") - F.col("d"))
                / F.nullif(F.col("n") - 1, F.lit(0)).cast("double")
            )
        ).alias("v"),
    )
    wt = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    acc = terms.select(
        "n0_1",
        "n0_0",
        F.sum("d1").over(wt).alias("o1"),
        F.sum("e1").over(wt).alias("e1s"),
        F.sum("v").over(wt).alias("vs"),
        F.row_number().over(Window.orderBy(F.col("t").desc())).alias("rn"),
    )
    return acc.filter(F.col("rn") == 1).select(
        F.col("n0_1").alias("n_sessions_b"),
        F.col("n0_0").alias("n_sessions_a"),
        F.col("o1").alias("observed_b"),
        F.round("e1s", 6).alias("expected_b"),
        F.round("vs", 6).alias("variance_b"),
        F.round(
            (F.col("o1") - F.col("e1s"))
            * (F.col("o1") - F.col("e1s"))
            / F.nullif(F.col("vs"), F.lit(0.0)),
            6,
        ).alias("chi2"),
    )


@register(
    "nelson_aalen_hazard",
    ("WITH "
    + session_ctes()
    + """,
    bounds AS (SELECT MAX(ts) AS max_ts FROM events),
    spans AS (
      SELECT user_id, session_num,
             CAST(date_diff('second', MIN(ts), MAX(ts)) // 60 AS BIGINT)
               AS duration,
             epoch_us(MAX(ts)) >= epoch_us(max_ts) - 1800000000 AS censored
      FROM s CROSS JOIN bounds
      GROUP BY user_id, session_num, max_ts),
    n_total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM spans),
    ev AS (
      SELECT duration AS t,
             CAST(COUNT(*) FILTER (WHERE NOT censored) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leaving
      FROM spans GROUP BY duration),
    na AS (
      SELECT t, d,
             n0 - COALESCE(SUM(leaving) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS at_risk
      FROM ev CROSS JOIN n_total)
    SELECT CAST(t AS INT) AS t_minutes, d AS n_ended,
           CAST(at_risk AS BIGINT) AS n_at_risk,
           ROUND(SUM(d / CAST(at_risk AS DOUBLE))
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING), 6)
             AS cum_hazard,
           ROUND(SUM((d * (at_risk - d))
                     / (CAST(at_risk AS DOUBLE) * at_risk * at_risk))
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING), 6)
             AS hazard_var
    FROM na WHERE d > 0 AND at_risk > 0
    """).replace("__UNUSED__", ""),
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard of session lifetime — the third
    leg of the survival family (``kaplan_meier_retention`` estimates
    S(t) multiplicatively; this estimates H(t) = Σ d/n additively, the
    better-behaved estimator at small risk sets, with the standard
    variance Σ d(n−d)/n³). Same shared 30-min sessionization and
    microsecond-exact right-censoring; the fact collapses to the
    ≤|distinct durations| event-time table, at-risk counts are one
    cumulative window, and both H and its variance accumulate through
    ordered cumulative frames — per-term doubles are bit-identical
    (integer inputs through one shared expression shape) and both
    engines add them in t-order: the ``page_hinkley_value_drift``
    posture, no summation-order ulps."""
    ev = t(spark, sf_dir, "events")
    s = with_session_num(ev)
    bounds = ev.agg(F.max("ts").alias("max_ts"))
    spans = (
        s.crossJoin(F.broadcast(bounds))
        .groupBy("user_id", "session_num", "max_ts")
        .agg(
            F.floor(
                (
                    F.max(F.col("ts").cast("long"))
                    - F.min(F.col("ts").cast("long"))
                )
                / 60
            ).alias("duration"),
            (
                F.max(F.unix_micros(F.col("ts")))
                >= F.unix_micros(F.col("max_ts")) - 1_800_000_000
            ).alias("censored"),
        )
    )
    n_total = spans.agg(F.count(F.lit(1)).alias("n0"))
    evt = spans.groupBy(F.col("duration").alias("t")).agg(
        F.count_if(~F.col("censored")).alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    prior = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    na = evt.crossJoin(F.broadcast(n_total)).select(
        "t",
        "d",
        (
            F.col("n0")
            - F.coalesce(F.sum("leaving").over(prior), F.lit(0))
        ).alias("at_risk"),
    )
    run = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ar = F.col("at_risk").cast("double")
    return na.filter((F.col("d") > 0) & (F.col("at_risk") > 0)).select(
        F.col("t").cast("int").alias("t_minutes"),
        F.col("d").alias("n_ended"),
        F.col("at_risk").alias("n_at_risk"),
        F.round(
            F.sum(F.col("d") / ar).over(run), 6
        ).alias("cum_hazard"),
        F.round(
            F.sum(
                (F.col("d") * (F.col("at_risk") - F.col("d")))
                / (ar * F.col("at_risk") * F.col("at_risk"))
            ).over(run),
            6,
        ).alias("hazard_var"),
    )


@register(
    "brier_decomposition",
    """
    WITH d AS (
      SELECT CAST(lang = 'en' AS BIGINT) AS y,
             RANK() OVER (ORDER BY n_chars) - 1 AS rk,
             percent_rank() OVER (ORDER BY n_chars) AS p_hat
      FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
    binned AS (
      SELECT LEAST(CAST(FLOOR(p_hat * 10) AS INT), 9) AS bin, rk, y
      FROM d),
    -- conf is derived from the EXACT integer rank sum (p_hat = rk/(N-1),
    -- so AVG(p_hat) = SUM(rk)/(n*(N-1)) with one closed-form division),
    -- never a float AVG whose summation order each engine picks; HUGEINT
    -- (Spark: DECIMAL(38,0)) keeps the rank sum exact at any corpus size
    per_bin AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             SUM(CAST(rk AS HUGEINT)) AS sum_rk
      FROM binned GROUP BY bin),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total,
                   SUM(n_pos) / CAST(SUM(n) AS DOUBLE) AS ybar
            FROM per_bin),
    terms AS (
      SELECT bin, total, ybar,
             (n / total) * (CAST(sum_rk AS DOUBLE)
                            / NULLIF(CAST(n AS DOUBLE) * (total - 1), 0.0)
                            - CAST(n_pos AS DOUBLE) / n)
                         * (CAST(sum_rk AS DOUBLE)
                            / NULLIF(CAST(n AS DOUBLE) * (total - 1), 0.0)
                            - CAST(n_pos AS DOUBLE) / n) AS rel_term,
             (n / total) * (CAST(n_pos AS DOUBLE) / n - ybar)
                         * (CAST(n_pos AS DOUBLE) / n - ybar) AS res_term
      FROM per_bin CROSS JOIN tot),
    -- rel/res accumulate through ONE ordered cumulative frame over the
    -- <=10 bin rows (per-term doubles are bit-identical, both engines
    -- add them in bin order), then the last row is taken: the logrank
    -- posture, no summation-order ulps
    cum AS (
      SELECT bin, total, ybar,
             SUM(rel_term) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW) AS cum_rel,
             SUM(res_term) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW) AS cum_res
      FROM terms)
    SELECT CAST(total AS BIGINT) AS n,
           ROUND(ybar, 6) AS base_rate,
           ROUND(MAX_BY(cum_rel, bin), 6) AS reliability,
           ROUND(MAX_BY(cum_res, bin), 6) AS resolution,
           ROUND(ybar * (1 - ybar), 6) AS uncertainty,
           -- + 0.0 canonicalizes IEEE -0.0: REL-RES+UNC is >= 0
           -- analytically but fp cancellation can land in (-5e-7, 0)
           ROUND(MAX_BY(cum_rel, bin) - MAX_BY(cum_res, bin)
                 + ybar * (1 - ybar), 6) + 0.0 AS brier_binned
    FROM cum
    GROUP BY total, ybar
    """,
)
def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score (Murphy 1973) —
    reliability − resolution + uncertainty, the three numbers that say
    WHY a probabilistic score is good or bad where
    expected_calibration_error (same score/label/binning) reports only
    the calibration gap: reliability (want LOW) penalizes bins whose
    confidence misses their hit rate, resolution (want HIGH) rewards
    bins that separate outcomes from the base rate, uncertainty is the
    irreducible ȳ(1−ȳ) of the label. For bin-constant forecasts the
    identity Brier = REL − RES + UNC is exact — asserted against a
    direct quantized-forecast Brier in tests. Scale shape: identical
    to ECE — one rank window normalizes the score, ten bin rows carry
    everything. Every driver-hashed float is summation-order-safe: the
    base rate and per-bin accuracy sum INTEGER positives, per-bin
    confidence is the EXACT integer rank sum (p_hat = rk/(N−1) makes
    AVG(p_hat) a closed-form division of exact integers — never a
    float AVG whose partial-sum order each engine picks), and the
    rel/res totals accumulate through one ordered cumulative frame
    over the bin rows (the logrank posture)."""
    docs = t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    wr = Window.orderBy("n_chars")
    d = docs.select(
        F.percent_rank().over(wr).alias("p_hat"),
        (F.rank().over(wr) - 1).alias("rk"),
        (F.col("lang") == "en").cast("bigint").alias("y"),
    )
    binned = d.select(
        F.least(F.floor(F.col("p_hat") * 10).cast("int"), F.lit(9)).alias(
            "bin"
        ),
        "rk",
        "y",
    )
    # conf from the EXACT integer rank sum (p_hat = rk/(N-1), so
    # AVG(p_hat) = SUM(rk)/(n*(N-1))) -- never a float AVG whose
    # summation order each engine picks; DECIMAL(38,0) (DuckDB: HUGEINT)
    # keeps the rank sum exact at any corpus size
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("n_pos"),
        F.sum(F.col("rk").cast("decimal(38,0)")).alias("sum_rk"),
    )
    tot = per_bin.agg(
        F.sum("n").cast("double").alias("total"),
        (F.sum("n_pos") / F.sum("n").cast("double")).alias("ybar"),
    )
    conf = F.try_divide(
        F.col("sum_rk").cast("double"),
        F.col("n").cast("double") * (F.col("total") - 1),
    )
    acc = F.col("n_pos").cast("double") / F.col("n")
    rel_term = (F.col("n") / F.col("total")) * (conf - acc) * (conf - acc)
    res_term = (
        (F.col("n") / F.col("total"))
        * (acc - F.col("ybar"))
        * (acc - F.col("ybar"))
    )
    # rel/res accumulate through ONE ordered cumulative frame over the
    # <=10 bin rows, last row taken via max_by: the logrank posture --
    # per-term doubles are bit-identical and both engines add them in
    # bin order, so no summation-order ulps reach the rounded output
    wb = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_bin.crossJoin(F.broadcast(tot)).select(
        "bin",
        "total",
        "ybar",
        F.sum(rel_term).over(wb).alias("cum_rel"),
        F.sum(res_term).over(wb).alias("cum_res"),
    )
    return (
        cum.groupBy("total", "ybar")
        .agg(
            F.max_by("cum_rel", "bin").alias("rel"),
            F.max_by("cum_res", "bin").alias("res"),
        )
        .select(
            F.col("total").cast("long").alias("n"),
            F.round("ybar", 6).alias("base_rate"),
            F.round("rel", 6).alias("reliability"),
            F.round("res", 6).alias("resolution"),
            F.round(F.col("ybar") * (1 - F.col("ybar")), 6).alias(
                "uncertainty"
            ),
            (
                F.round(
                    F.col("rel")
                    - F.col("res")
                    + F.col("ybar") * (1 - F.col("ybar")),
                    6,
                )
                + 0.0
            ).alias("brier_binned"),
        )
    )
