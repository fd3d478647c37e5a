"""TPC-H-shape decision-support sweep (beyond-reference breadth).

The reference's workload (five MVs + search/aggregation surfaces) never
exercises several classic optimizer patterns a complete analytics engine
must handle: EXISTS/NOT EXISTS decorrelation, correlated scalar
subqueries, scalar-max views, IN-subquery semijoins over aggregates, and
disjunctive multi-table predicates. This module adapts the canonical
TPC-H queries that express those patterns to the driver testdata's
reduced schema (no partsupp / commitdate / receiptdate / shipmode /
container — each adaptation keeps the ORIGINAL query's plan shape and
documents the substitution). q1/q3/q5 already live in
``plans/relational.py``.

Scale posture: every join here keys on orderkey/partkey/suppkey/custkey
(shuffle-partitionable, AQE-skew-safe); fixed-cardinality dims
(nation=25, region=5, and part/supplier at their SF ratios) carry
broadcast hints; correlated subqueries are decorrelated into keyed
aggregates BEFORE their join (never a per-row rescan); top-k outputs
sort bounded post-aggregate rows. Oracles state the textbook correlated
form so the driver proves the decorrelated Spark plan equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dopams_etl_spark.plans.catalog import register, t


def _rev() -> F.Column:
    # cast("double") at first use (r14 f32 census): identity on the live
    # float64 fixtures, but on a float32-narrowed fixture it keeps the
    # product in the double lane — Spark otherwise multiplies in float32
    # (24-bit rounding per row) while DuckDB promotes to double first,
    # drifting revenue sums in the cents. Every oracle that restates
    # this product carries the matching CAST(... AS DOUBLE).
    return F.col("l_extendedprice").cast("double") * (
        1 - F.col("l_discount").cast("double")
    )


@register(
    "q4_priority_late_exists",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): correlated EXISTS with
    an inequality on BOTH relations' columns, decorrelated into a left
    SEMI join carrying the cross-relation predicate in the join
    condition — one pass over lineitem, no per-order rescan. Original
    predicate l_commitdate < l_receiptdate is adapted to "shipped >60
    days after order date" (those columns don't exist in this schema);
    the EXISTS→semijoin plan shape is identical. The date filter prunes
    orders BEFORE the join, so the semi probe side is one quarter."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q6_forecast_revenue_delta",
    """
    -- CAST DOUBLE first (r14 f32 census): the BETWEEN boundaries decide
    -- inclusion in the comparison lane — float32 0.07 sits ABOVE the
    -- double literal 0.07, so the engines disagreed on the row set
    -- (n_lines 106 vs 152) until both compare the same promoted double
    SELECT ROUND(SUM(CAST(l_extendedprice AS DOUBLE) * CAST(l_discount AS DOUBLE)), 2)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND CAST(l_discount AS DOUBLE) BETWEEN 0.05 AND 0.07
      AND CAST(l_quantity AS DOUBLE) < 24
    """,
)
def q6_forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-aggregate
    — the query whose entire cost is the scan, so the plan MUST show all
    three predicates pushed into the parquet reader and a single partial
    +final hash aggregate with no shuffle of row data (only the one-row
    partials). At 100 TB this is the pattern where min/max row-group
    pruning on l_shipdate does the heavy lifting."""
    li = t(spark, sf_dir, "lineitem")
    # cast("double") before comparing/multiplying (r14 f32 census): both
    # engines then decide the BETWEEN boundaries and compute the product
    # in the same double lane; identity on the live float64 fixtures.
    # The casts wrap pushdown-eligible columns, but parquet min/max
    # pruning on l_shipdate (the selective predicate) is unaffected.
    disc = F.col("l_discount").cast("double")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (disc >= 0.05)
        & (disc <= 0.07)
        & (F.col("l_quantity").cast("double") < 24)
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("double") * disc), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE)) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_11')
          OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_12'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): the two-role dimension pattern — the
    SAME nation table joins twice under different aliases (supplier side
    and customer side) with a disjunctive cross-alias predicate. Both
    nation joins broadcast (25 rows); the nation-pair filter applies
    AFTER both joins but Catalyst pushes each disjunct's single-sided
    implication (n_name IN two values) into both broadcast builds, so
    the fact rows surviving to the disjunction check are already
    nation-filtered."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = ("NATION_12", "NATION_11")
    n1 = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
        )
    )
    sup = t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key")
    )
    cust = t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key")
    )
    df = (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (
                (F.col("supp_nation") == pair[0])
                & (F.col("cust_nation") == pair[1])
            )
            | (
                (F.col("supp_nation") == pair[1])
                & (F.col("cust_nation") == pair[0])
            )
        )
    )
    return df.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.round(F.sum(_rev()), 2).alias("revenue"))


@register(
    "q8_market_share",
    """
    -- NULLIF: a degenerate market (every volume 0, e.g. l_discount = 1
    -- on all rows) makes the denominator 0 - NULL share on both engines
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
                 / NULLIF(SUM(volume), 0.0), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE)) AS volume,
             n2.n_name AS supp_nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01')
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): 7-table star with a conditional
    numerator over the full denominator — share of one supplier nation's
    revenue inside a region+part-type market per year. All dims
    (part-filtered, supplier, nation×2, region, region-filtered
    customer) broadcast against the lineitem fact; the share is one
    conditional-sum ratio per year, never two passes."""
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    sup = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    df = (
        t(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
    )
    vol = _rev()
    # try_divide: a degenerate market (every volume 0) would ANSI-abort
    # the bare '/' where the oracle's NULLIF yields NULL
    return df.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(
            F.try_divide(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_5", vol
                    ).otherwise(0.0)
                ),
                F.sum(vol),
            ),
            6,
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    """
    SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
    FROM (
      -- CAST DOUBLE on the cost term too (r14 f32 census): DuckDB's
      -- DECIMAL-literal 0.6 * FLOAT stays in the float32 lane
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE))
               - 0.6 * CAST(p_retailprice AS DOUBLE)
                     * CAST(l_quantity AS DOUBLE) AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%')
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit per supplier nation
    per year over a part-name LIKE filter. The schema has no partsupp,
    so ps_supplycost is substituted by 0.6×p_retailprice (documented
    cost proxy — the join/aggregate shape, a 5-table star grouped by a
    two-role derived key, is what's under test). Nation broadcasts (25 rows);
    the LIKE-filtered part and supplier joins are AQE-decided (both
    scale with SF); profit is computed per lineitem then
    hash-aggregated by (nation, year)."""
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    nat = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    sup = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "nation")
    )
    # cast("double") on the cost factors (r14 f32 census) — identity on
    # live fixtures, matches the oracle's double-lane cost term
    amount = _rev() - 0.6 * F.col("p_retailprice").cast("double") * F.col(
        "l_quantity"
    ).cast("double")
    return (
        t(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           ROUND(SUM(CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE))), 2) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): which customers returned the
    most revenue in a quarter — selective fact filter (returnflag='R' +
    one quarter) feeding a star join, grouped at customer grain, global
    top-20. The returnflag and date predicates push to the scans; the
    final order-by runs on the aggregated (≤|customers|) rows with a
    deterministic custkey tie-break on the ROUNDED revenue so the limit
    is stable across engines and partitionings."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = t(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q12_late_shipment_priority",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 45 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes & priority): join with a
    cross-table inequality (shipped >45 days after order), then
    conditional counts splitting urgent/high priorities from the rest.
    l_shipmode doesn't exist in this schema, so the outer grouping is
    adapted to l_returnflag — the join-then-CASE-pivot shape, where the
    priority CASE evaluates on the joined row, is unchanged."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 45 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey
           AND o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order distribution): LEFT OUTER join with the
    filter in the JOIN CONDITION (not the WHERE — moving it would drop
    the zero-order customers that are the query's point), then a
    two-level aggregate: orders-per-customer, then customers-per-count.
    COUNT(o_orderkey) counts non-null matches only, so unmatched
    customers land in the c_count=0 bucket."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue_share",
    """
    -- NULLIF: a month whose revenue is all zero (l_discount = 1 on
    -- every row) makes the denominator 0 - NULL share on both engines
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE))
                                  ELSE 0 END)
                 / NULLIF(SUM(CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE))), 0.0), 6)
             AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): one month's revenue share from
    promo-typed parts — conditional-sum ratio in a single aggregate
    after the part join (AQE-decided — part scales with SF); the month
    filter pushes to the lineitem scan so the join input is ~1/60th of
    the fact."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev()
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            # try_divide: an all-zero-revenue month would ANSI-abort the
            # bare '/' where the oracle's NULLIF yields NULL
            F.round(
                F.try_divide(
                    100.0
                    * F.sum(
                        F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
                    ),
                    F.sum(rev),
                ),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE))), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): a revenue view consumed TWICE — once as
    the join input, once reduced to a scalar MAX that filters it. The
    quarter's per-supplier revenue is computed once, the one-row max
    broadcasts back against it (scalar-subquery decorrelation), and the
    supplier dim joins the surviving row(s). The max compares ROUNDED
    revenue so engine float noise can't pick different winners."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_rev"))
        .join(
            t(spark, sf_dir, "supplier"),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): THE correlated-scalar-
    subquery benchmark — each lineitem compares against half the average
    quantity of ITS part. Decorrelated: per-part averages computed once
    over the UNFILTERED lineitem (the subquery has no brand filter — a
    common rewrite bug this oracle would catch), joined back on partkey,
    filtered, single-row aggregate. The per-part aggregate keys on
    partkey, so at 100 TB it is one keyed shuffle, not |parts| rescans.
    Threshold formula is written identically (0.5 * AVG) on both sides
    so boundary cells agree bit-for-bit."""
    li = t(spark, sf_dir, "lineitem")
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    """
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
           CAST(SUM(l_quantity) AS BIGINT) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c_custkey, c_name, o_orderkey, order_date, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): IN-subquery over a HAVING
    aggregate — orders whose total quantity tops 300. The subquery
    becomes a per-order aggregate semi-joined (here: inner-joined, the
    aggregate is already distinct on orderkey) back to the fact; quantity
    sums are integral doubles, cast BIGINT identically on both engines.
    Top-20 by totalprice with orderkey tie-break."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select(F.col("l_orderkey").alias("big_key"), "qty")
    )
    return (
        t(spark, sf_dir, "orders")
        .join(big, F.col("o_orderkey") == F.col("big_key"))
        .join(
            t(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
            F.col("qty").cast("long").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_revenue",
    """
    SELECT ROUND(SUM(CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE))), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): disjunction of three
    brand/size/quantity conjunctions SPANNING both join sides — the
    stress test for predicate analysis. Catalyst extracts the
    join-key equi-condition and evaluates the residual OR post-join;
    the derivable single-sided implications (brand IN 3 values,
    p_size ≤ 35, l_quantity ≤ 30) prune each scan."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#2") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(_rev()), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q21_suppliers_kept_waiting",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 45 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o3.o_orderdate + INTERVAL 45 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 20
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): the hardest
    decorrelation in the suite — EXISTS (another supplier touched the
    order) AND NOT EXISTS (another supplier was ALSO late). Instead of
    two correlated rescans of lineitem, ONE per-order aggregate computes
    (distinct suppliers, distinct late suppliers, late line count, the
    sole late supplier); an order qualifies when n_supp > 1 AND
    n_late_supp = 1, contributing its late-line count to that supplier —
    exactly the original's per-l1-row semantics (the oracle IS the
    textbook correlated form, so the driver proves the rewrite).
    'Late' adapts commitdate/receiptdate to shipped >45 days after
    order date. One keyed shuffle over lineitem at any scale."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "late",
            (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 45 DAYS")).cast(
                "int"
            ),
        )
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
        F.sum("late").alias("n_late_lines"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    waits = (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .groupBy("late_supp")
        .agg(F.sum("n_late_lines").alias("numwait"))
    )
    return (
        waits.join(
            t(spark, sf_dir, "supplier"),
            F.col("late_supp") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.sum("numwait").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@register(
    "q22_dormant_customers",
    """
    SELECT CAST(c_nationkey AS INT) AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 9)
      AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                       WHERE c_acctbal > 0.0
                         AND c_nationkey IN (1, 3, 5, 7, 9))
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers in selected geographies with no RECENT order (the
    testdata gives every customer at least one historical order, so the
    original's never-ordered predicate is adapted to dormant-since-2000
    — the NOT EXISTS anti-join shape is identical, now with a pushed
    date filter on the anti side). A scalar AVG subquery (one-row
    broadcast) gates balances; the anti-join probes only the filtered
    customer slice; orders never aggregates. The phone-prefix country
    code of the original maps to c_nationkey (no phone column)."""
    nations = [1, 3, 5, 7, 9]
    c = t(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("int").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Round-8 second wave (r9 driver queue): the partsupp-dependent TPC-H
# patterns, emulated through lineitem-derived supply offers so the PLAN
# SHAPES (correlated min, HAVING-vs-global-scalar, NOT-IN anti join,
# nested IN + correlated scalar) are exercised against this schema.
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    """
    WITH offers AS (
      -- CAST DOUBLE first (r14 f32 census): DuckDB otherwise divides and
      -- ROUNDs in the float32 lane (ROUND(FLOAT, 2) stays FLOAT), so the
      -- rounded cost reaches the comparator as float32 where Spark's is
      -- the rounded double
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             ROUND(MIN(CAST(l_extendedprice AS DOUBLE)
                       / CAST(l_quantity AS DOUBLE)), 2) AS unit_cost
      FROM lineitem GROUP BY 1, 2),
    eligible AS (
      SELECT o.partkey, o.suppkey, o.unit_cost, s_name
      FROM offers o
      JOIN supplier ON s_suppkey = o.suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE')
    SELECT p_partkey, p_name, s_name, unit_cost
    FROM part JOIN eligible e ON p_partkey = e.partkey
    WHERE p_size BETWEEN 10 AND 20
      AND unit_cost = (SELECT MIN(e2.unit_cost) FROM eligible e2
                       WHERE e2.partkey = p_partkey)
    ORDER BY unit_cost, p_partkey, s_name LIMIT 50
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the correlated-MIN
    subquery — for each part, the European supplier(s) matching the
    part's cheapest offer. partsupp is emulated by per-(part, supplier)
    MIN unit price observed in lineitem (documented proxy; the
    correlated-min-then-equality-join plan shape is the original's).
    Decorrelated: the eligible offers aggregate ONCE per part into
    min_cost, equality-joined back on (partkey, rounded cost) — one
    keyed shuffle, not a per-part rescan. Deterministic top-50."""
    offers = (
        t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            # cast("double") first (r14 f32 census) — identity on live
            # fixtures, keeps the division in the double lane on a
            # float32-narrowed one (matches the oracle's CASTs)
            F.round(
                F.min(
                    F.col("l_extendedprice").cast("double")
                    / F.col("l_quantity").cast("double")
                ),
                2,
            ).alias("unit_cost")
        )
    )
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sup = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )
    eligible = offers.join(sup, F.col("suppkey") == F.col("s_suppkey"))
    min_cost = eligible.groupBy(F.col("partkey").alias("mc_key")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 20))
        .select("p_partkey", "p_name")
    )
    return (
        eligible.join(
            min_cost,
            (F.col("partkey") == F.col("mc_key"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(part, F.col("partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_name", "s_name", "unit_cost")
        .orderBy("unit_cost", "p_partkey", "s_name")
        .limit(50)
    )


@register(
    "q11_important_parts",
    """
    WITH pv AS (
      SELECT l_partkey AS partkey, ROUND(SUM(l_extendedprice), 2) AS value
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey)
    SELECT partkey, value
    FROM pv
    WHERE value > (SELECT 2.0 * AVG(value) FROM pv)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-part value
    within one nation's suppliers, kept only where it exceeds a
    GLOBAL-SCALAR threshold — the HAVING-against-scalar-subquery
    pattern. The original's SUM×fraction cut is restated as 2× the
    average part value (TPC-H itself scales the fraction by 1/SF; the
    avg form keeps selectivity scale-invariant without a knob). The
    value table aggregates once; the one-row threshold broadcasts back
    against it (ps_supplycost×availqty proxied by
    lineitem extendedprice volume). Both engines sum the SAME rounded
    per-part values into the threshold."""
    nat = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    sup = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    pv = (
        t(spark, sf_dir, "lineitem")
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("value"))
    )
    thr = pv.agg((2.0 * F.avg("value")).alias("thr"))
    return pv.join(F.broadcast(thr), F.col("value") > F.col("thr")).select(
        "partkey", "value"
    )


@register(
    "q16_parts_supplier_counts",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_name LIKE '%7%')
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many distinct
    suppliers serve each surviving (brand, type, size) bucket, with a
    NOT-IN blacklist subquery (the 'customer complaints' stand-in:
    suppliers whose name contains '7'). NOT IN over a non-null key
    plans as a left ANTI join — never a per-row subquery — and the
    distinct count shuffles once on the group key."""
    part = (
        t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = t(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%7%")
    ).select("s_suppkey")
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_dominant_part_suppliers",
    """
    WITH sold AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2)
    SELECT DISTINCT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT suppkey FROM sold
      WHERE partkey IN (SELECT p_partkey FROM part
                        WHERE p_name LIKE '%widget%')
        AND qty > (SELECT 0.3 * SUM(s2.qty) FROM sold s2
                   WHERE s2.partkey = sold.partkey))
    """,
)
def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): NESTED IN subqueries
    + a correlated scalar — suppliers who moved more than 30% of a
    widget-part's yearly volume (availqty>half-of-sold emulated as
    dominant-share-of-sold; the doubly-nested semijoin plan shape is
    the original's). Decorrelated: per-(part,supplier) sales aggregate,
    per-part totals joined back on partkey, the widget filter as a
    semi join, and the supplier IN as a final semi join — every step a
    keyed shuffle or broadcast, no rescans."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    sold = li.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
    ).agg(F.sum("l_quantity").alias("qty"))
    widgets = t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    totals = sold.groupBy(F.col("partkey").alias("t_key")).agg(
        F.sum("qty").alias("total_qty")
    )
    dominant = (
        sold.join(widgets, F.col("partkey") == F.col("p_partkey"), "left_semi")
        .join(totals, F.col("partkey") == F.col("t_key"))
        .filter(F.col("qty") > 0.3 * F.col("total_qty"))
        .select("suppkey")
    )
    nat = t(spark, sf_dir, "nation")
    return (
        t(spark, sf_dir, "supplier")
        .join(dominant, F.col("s_suppkey") == F.col("suppkey"), "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .distinct()
    )


@register(
    "cube_region_priority_revenue",
    """
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(r_name) * 2 + GROUPING(o_orderpriority) AS INT)
             AS gid,
           ROUND(SUM(o_totalprice), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    -- Empty-input grouping-set convention (r13): no rows in, no rows
    -- out. Over ZERO joined rows the SQL standard (and DuckDB) still
    -- emits the grand-total () row while Spark emits none; HAVING
    -- COUNT(*) > 0 states Spark's shape in SQL - it drops ONLY that
    -- zero-input row (every real group aggregates >= 1 row).
    GROUP BY CUBE (r_name, o_orderpriority)
    HAVING COUNT(*) > 0
    """,
)
def cube_region_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE completion of the multi-grain family (order_grouping_sets
    covers GROUPING SETS, event_rollup_multigrain covers ROLLUP): all
    four (region × priority) grains in ONE Expand pass, with GROUPING()
    flags composed into the same gid on both engines (never relying on
    engine-specific grouping_id bit order) and NULL grain labels
    COALESCEd so the 'ALL' rows hash identically."""
    o = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return (
        o.cube("r_name", "o_orderpriority")
        .agg(
            (
                F.grouping("r_name") * 2 + F.grouping("o_orderpriority")
            ).cast("int").alias("gid"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias(
                "priority"
            ),
            "gid",
            "revenue",
            "n_orders",
        )
    )
