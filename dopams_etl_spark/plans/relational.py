"""Relational operator queries (SURVEY §2.1–§2.6, §2.9) with DuckDB oracles.

Each ``@register`` entry exercises one named operator from the inventory on
the driver testdata. Conventions (see ``plans/catalog.py``): identical
aliases both sides, money sums via ``decimal(18,2)`` casts (exact,
partition-order-independent — a raw double sum is not), ratios rounded to
6, timestamps surfaced as DATE, deterministic tie-breaks everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dopams_etl_spark.operators.aggregates import (
    collect_distinct_sorted,
    collect_sorted_structs,
    count_if,
    decorrelated_agg,
    map_agg_entries,
)
from dopams_etl_spark.operators.joins import (
    anti_join,
    broadcast_dim_join,
    fuzzy_join_levenshtein,
    latest_per_key,
    semi_join,
    soundex_blocked_candidates,
    top1_by_score,
)
from dopams_etl_spark.functions.money import money_quantize
from dopams_etl_spark.operators.merge import (
    classify_merge,
    merge_stats,
    smart_merge,
    upsert_latest_wins,
)
from dopams_etl_spark.operators.quarantine import fk_validate, quarantine_retry
from dopams_etl_spark.operators.watermark import compute_watermark, incremental_filter
from dopams_etl_spark.operators.sessionize import with_session_num
from dopams_etl_spark.plans.catalog import register, session_ctes, t

DEC = "decimal(18,2)"


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           -- cents scaling mirrors money_cents (r14 f32 census): a
           -- float32-narrowed price lands on exact half-cent ties
           -- (m/128 grid) where the old DECIMAL cast rounds half-even
           -- but Spark's ROUND goes half-up
           CAST(CAST(CAST(SUM(CAST(ROUND(CAST(l_quantity AS DOUBLE) * 100) AS BIGINT))
                          AS DECIMAL(38,0)) / 100 AS DECIMAL(18,2)) AS VARCHAR)
             AS sum_qty,
           CAST(CAST(CAST(SUM(CAST(ROUND(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT))
                          AS DECIMAL(38,0)) / 100 AS DECIMAL(18,2)) AS VARCHAR)
             AS sum_base_price,
           -- CAST DOUBLE first (r14 f32 census): both engines then
           -- multiply the same promoted doubles on a narrowed fixture
           ROUND(SUM(CAST(l_extendedprice AS DOUBLE)
                     * (1 - CAST(l_discount AS DOUBLE))), 2) AS sum_disc_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A5 flagship aggregate (TPC-H Q1 shape): hash groupBy with map-side
    partials; money summed as exact integer CENTS (``functions/money.py``
    — same partitioning-invariant exactness as a decimal sum, measured
    1.7× faster because the hot aggregate runs on longs; the decimal
    formatting happens post-aggregate on 4 rows)."""
    from dopams_etl_spark.functions.money import cents_to_money_string, money_cents

    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(money_cents("l_quantity")).alias("_sq"),
            F.sum(money_cents("l_extendedprice")).alias("_sb"),
            # double sum + round(2): the product has 3-4 decimals, and casting
            # each to decimal hits .005 ties where the engines' rounding modes
            # differ; the rounded total is stable (error ~1e-8 vs 0.01 grain).
            # cast("double") first (r14 f32 census) — identity on live
            # fixtures, double-lane product on a float32-narrowed one.
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("double")
                    * (1 - F.col("l_discount").cast("double"))
                ),
                2,
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            cents_to_money_string("_sq").alias("sum_qty"),
            cents_to_money_string("_sb").alias("sum_base_price"),
            "sum_disc_price",
            "avg_disc",
            "count_order",
        )
    )


@register(
    "regional_revenue",
    """
    SELECT r_name,
           -- CAST DOUBLE first (r14 f32 census): double-lane product on
           -- a float32-narrowed fixture, identity on the live one
           ROUND(SUM(CAST(l_extendedprice AS DOUBLE)
                     * (1 - CAST(l_discount AS DOUBLE))), 2) AS revenue,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2/J7: star join, pre-aggregated to order grain first.

    lineitem is reduced to (l_orderkey, order_revenue) BEFORE the star
    join — the join input shrinks by the lineitem-per-order fan-out (~4×)
    and, because each order then appears exactly once, the per-region
    COUNT(DISTINCT o_orderkey) degrades to a plain COUNT: no distinct
    Expand, one hash aggregate per grain. Both shuffles key on join/agg
    columns with map-side partials. Only the fixed-cardinality dims
    (nation=25, region=5) carry an explicit broadcast hint; customer
    scales with SF, so its join is left to AQE, which broadcasts it at
    small scale and switches to shuffle join when the measured size
    outgrows the threshold."""
    li = t(spark, sf_dir, "lineitem")
    # r15 (guide §2.4): hash-repartition on the order key so the
    # per-order revenue products run at full width off a one-row-group
    # scan; the groupBy reuses the partitioning (still one exchange).
    # Bitwise stability (A/B verified exact on the ONE-partition scans
    # this fires on, where each order's rows reach the aggregate in scan
    # order): for 1 < input partitions < defaultParallelism an order's
    # rows can arrive from several mappers in fetch order, so the
    # per-order double sum is deterministic only up to the partial-agg
    # merge order Spark already has (ADVICE r15); the downstream grain
    # sums and ROUND(…, 2) absorb that class. No-op at real scan
    # parallelism.
    from dopams_etl_spark.partitioning import ensure_parallelism

    li = ensure_parallelism(li, "l_orderkey")
    per_order = li.groupBy("l_orderkey").agg(
        # cast("double") first (r14 f32 census) — see the oracle note
        F.sum(
            F.col("l_extendedprice").cast("double")
            * (1 - F.col("l_discount").cast("double"))
        ).alias("order_rev")
    )
    fact = per_order.join(
        t(spark, sf_dir, "orders"), per_order.l_orderkey == F.col("o_orderkey")
    )
    fact = fact.join(t(spark, sf_dir, "customer"), on=[fact.o_custkey == F.col("c_custkey")])
    fact = broadcast_dim_join(fact, t(spark, sf_dir, "nation"), on=[fact.c_nationkey == F.col("n_nationkey")])
    fact = broadcast_dim_join(fact, t(spark, sf_dir, "region"), on=[fact.n_regionkey == F.col("r_regionkey")])
    return fact.groupBy("r_name").agg(
        F.round(F.sum("order_rev"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "customers_with_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/P5 left-semi (EXISTS) — ``criminal_profiles_mv.sql:126–128``."""
    return semi_join(
        t(spark, sf_dir, "customer"),
        t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
    ).select("c_custkey", "c_name")


@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 left-anti (work-queue pattern, ``brief_facts_ai/db.py:49–74``)."""
    return anti_join(
        t(spark, sf_dir, "customer"),
        t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
    ).select("c_custkey", "c_name")


@register(
    "latest_order_per_customer",
    """
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS latest_orderdate
    FROM (SELECT *, row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate DESC NULLS LAST, o_orderkey ASC) AS rn
          FROM orders)
    WHERE rn = 1
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13/W1 DISTINCT ON / latest-per-key: one window pass, no self-join
    (``criminal_profiles_mv.sql:56–70``)."""
    return latest_per_key(
        t(spark, sf_dir, "orders"), "o_custkey", "o_orderdate", tiebreak="o_orderkey"
    ).select(
        "o_custkey",
        F.col("o_orderkey").alias("latest_orderkey"),
        # nullable date bridge: a customer whose only orders carry NULL
        # dates surfaces a NULL latest date as VARCHAR on both sides.
        F.col("o_orderdate").cast("date").cast("string").alias("latest_orderdate"),
    )


@register(
    "best_order_per_customer",
    """
    SELECT o_custkey, o_orderkey AS best_orderkey, ROUND(o_totalprice, 2) AS best_price
    FROM (SELECT *, row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC) AS rn
          FROM orders)
    WHERE rn = 1
    """,
)
def best_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/W4 correlated top-1 by score, decorrelated to a window."""
    return top1_by_score(
        t(spark, sf_dir, "orders"), ["o_custkey"], "o_totalprice", tiebreak="o_orderkey"
    ).select(
        "o_custkey",
        F.col("o_orderkey").alias("best_orderkey"),
        F.round("o_totalprice", 2).alias("best_price"),
    )


@register(
    "order_priority_stats",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
)
def order_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A3: count, conditional count (``firs_mv.sql:78–83``), exact
    distinct count."""
    return t(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        count_if(F.col("o_orderstatus") == "F").cast("long").alias("n_finished"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "latest_finished_order_date",
    """
    SELECT o_custkey, CAST(MAX(o_orderdate) AS DATE) AS last_f_date
    FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    """,
)
def latest_finished_order_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 max/latest with pre-filter (``criminal_profiles_mv.sql:90–94``).
    The status filter is pushed to the parquet scan."""
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.max("o_orderdate").cast("date").alias("last_f_date"))
    )


@register(
    "order_lineitems_sorted",
    """
    SELECT l_orderkey,
           -- null-payload convention: a NULL-quantity line contributes no
           -- entry (string_agg would skip the NULL concat anyway); an
           -- all-NULL group surfaces NULL, not ''
           string_agg(CAST(l_linenumber AS VARCHAR) || ':' || CAST(CAST(l_quantity AS INT) AS VARCHAR),
                      ';' ORDER BY l_linenumber, CAST(l_quantity AS INT))
             FILTER (WHERE l_quantity IS NOT NULL) AS items
    FROM lineitem GROUP BY l_orderkey
    """,
)
def order_lineitems_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 ordered struct-collect (``jsonb_agg(... ORDER BY seq)``,
    ``firs_mv.sql:43–54``), surfaced as a canonical string for hashing."""
    li = t(spark, sf_dir, "lineitem")
    # r15 (guide §2.4): keyed spread of the one-row-group scan — the
    # groupBy reuses the partitioning (one exchange) and the struct
    # building runs at full width; the collect is explicitly sorted ⇒
    # partitioning-invariant. Measured 1.08 → 0.62 s. No-op at scale.
    from dopams_etl_spark.partitioning import ensure_parallelism

    li = ensure_parallelism(li, "l_orderkey")
    # (l_orderkey, l_linenumber) is NOT unique in the testdata — qty joins
    # the sort key so tie order is deterministic on both engines.
    arr = collect_sorted_structs(
        ["l_linenumber", F.col("l_quantity").cast("int")],
        {"ln": F.col("l_linenumber"), "qty": F.col("l_quantity").cast("int")},
        keep=F.col("l_quantity").isNotNull(),
    )
    return li.groupBy("l_orderkey").agg(
        # all entries dropped (all-NULL qty) → NULL, the string_agg shape
        F.nullif(
            F.array_join(
                F.transform(arr, lambda s: F.concat_ws(":", s["ln"], s["qty"])),
                ";",
            ),
            F.lit(""),
        ).alias("items")
    )


@register(
    "order_flags_distinct",
    """
    SELECT l_orderkey,
           COALESCE((SELECT string_agg(f, ',' ORDER BY f)
                     FROM (SELECT DISTINCT upper(l_returnflag) AS f
                           FROM lineitem li2
                           WHERE li2.l_orderkey = li.l_orderkey AND l_returnflag <> 'N')), '')
             AS flags
    FROM (SELECT DISTINCT l_orderkey FROM lineitem) li
    """,
)
def order_flags_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/A8 distinct collect with FILTER + COALESCE-to-empty
    (``firs_mv.sql:55–57``)."""
    li = t(spark, sf_dir, "lineitem")
    flags = collect_distinct_sorted(
        F.when(F.col("l_returnflag") != "N", F.upper("l_returnflag"))
    )
    return li.groupBy("l_orderkey").agg(F.array_join(flags, ",").alias("flags"))


@register(
    "customer_status_map",
    """
    SELECT o_custkey,
           -- null-payload convention: the NULL-status group contributes no
           -- entry (jsonb_object_agg skips NULL keys); all-NULL → NULL
           string_agg(s || '=' || CAST(n AS VARCHAR), ';' ORDER BY s)
             FILTER (WHERE s IS NOT NULL) AS status_counts
    FROM (SELECT o_custkey, o_orderstatus AS s, CAST(COUNT(*) AS BIGINT) AS n
          FROM orders GROUP BY o_custkey, o_orderstatus)
    GROUP BY o_custkey
    """,
)
def customer_status_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 map-aggregate (``jsonb_object_agg``, ``firs_mv.sql:90–95``) as a
    key-sorted entries string."""
    counts = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    entries = map_agg_entries("o_orderstatus", "n")
    return counts.groupBy("o_custkey").agg(
        # all-NULL statuses → NULL, the string_agg shape
        F.nullif(
            F.array_join(
                F.transform(
                    entries, lambda e: F.concat_ws("=", e["key"], e["value"])
                ),
                ";",
            ),
            F.lit(""),
        ).alias("status_counts")
    )


@register(
    "orders_union_branches",
    """
    SELECT o_orderkey, 'finished' AS branch FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, 'urgent' AS branch FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def orders_union_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 UNION ALL branch assembly (``firs_mv.sql:120–166``)."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", F.lit("finished").alias("branch")
    )
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("urgent").alias("branch")
    )
    return a.unionByName(b)


@register(
    "customer_order_stats",
    """
    SELECT c_custkey, c_name,
           CAST((SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS BIGINT)
             AS order_count,
           -- portable cents quantizer (r14 f32 census): floor(x*100+0.5)
           -- on the promoted double — a float32-narrowed o_totalprice
           -- otherwise reaches Spark's decimal cast through the shortest
           -- float repr but DuckDB's through the exact float value
           CAST(COALESCE((SELECT SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5)
                                          / 100.0 AS DECIMAL(18,2)))
                          FROM orders o WHERE o.o_custkey = c.c_custkey), 0) AS VARCHAR)
             AS total_spent
    FROM customer c
    """,
)
def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: the core MV rewrite — correlated scalar subqueries (the oracle
    keeps them correlated) decorrelated into one groupBy + left join."""
    cust = t(spark, sf_dir, "customer")
    stats = decorrelated_agg(
        t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey"),
        "c_custkey",
        {
            "order_count": F.count(F.lit(1)),
            # portable cents quantizer (r14 f32 census) — see the oracle
            "total_spent": F.sum(
                money_quantize("o_totalprice")
            ).cast(DEC),
        },
    )
    return cust.join(stats, "c_custkey", "left").select(
        "c_custkey",
        "c_name",
        F.coalesce("order_count", F.lit(0)).alias("order_count"),
        F.coalesce(F.col("total_spent"), F.lit(0).cast(DEC)).cast("string").alias("total_spent"),
    )


@register(
    "top50_orders",
    """
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
    """,
)
def top50_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 global sort + limit — Spark runs this as TakeOrderedAndProject
    (per-partition top-k, no full sort)."""
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(50)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@register(
    "upsert_latest_wins",
    """
    -- CAST DOUBLE at first use (r14 f32 census): DuckDB's ROUND(FLOAT, 2)
    -- stays float32 where Spark rounds the promoted double
    WITH ev AS (SELECT event_id, ts, CAST(value AS DOUBLE) AS value FROM events),
    existing AS (SELECT event_id, ts, value FROM ev WHERE ts < TIMESTAMP '2024-01-15'),
    incoming AS (SELECT event_id, ts, value * 2 AS value FROM ev WHERE ts >= TIMESTAMP '2024-01-10'),
    u AS (SELECT *, 0 AS src FROM existing UNION ALL SELECT *, 1 AS src FROM incoming),
    r AS (SELECT *, row_number() OVER (PARTITION BY event_id
                                       ORDER BY ts DESC NULLS LAST, src DESC) AS rn FROM u)
    SELECT event_id, ROUND(value, 2) AS value FROM r WHERE rn = 1
    """,
)
def upsert_latest_wins_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/I2: dedup-union MERGE, latest version wins, incoming wins ties
    (overlapping-chunk semantics, ``etl_crimes.py:853–871``)."""
    # cast("double") at first use (r14 f32 census) — see the oracle note
    ev = t(spark, sf_dir, "events").select(
        "event_id", "ts", F.col("value").cast("double").alias("value")
    )
    existing = ev.filter(F.col("ts") < F.lit("2024-01-15").cast("timestamp"))
    incoming = ev.filter(F.col("ts") >= F.lit("2024-01-10").cast("timestamp")).withColumn(
        "value", F.col("value") * 2
    )
    merged = upsert_latest_wins(existing, incoming, "event_id", "ts")
    return merged.select("event_id", F.round("value", 2).alias("value"))


@register(
    "smart_merge_customers",
    """
    WITH incoming AS (
      SELECT c_custkey, c_name || '_new' AS c_name, CAST(NULL AS DOUBLE) AS c_acctbal,
             'NEWSEG' AS c_mktsegment
      FROM customer WHERE c_custkey % 3 = 0)
    SELECT e.c_custkey,
           COALESCE(i.c_name, e.c_name) AS c_name,
           -- + 0.0 canonicalizes IEEE -0.0 (acctbal is signed; a stored
           -- near-zero negative rounds sign-indefinitely)
           ROUND(COALESCE(i.c_acctbal, e.c_acctbal), 2) + 0.0 AS c_acctbal,
           CASE WHEN i.c_custkey IS NOT NULL THEN i.c_mktsegment ELSE e.c_mktsegment END
             AS c_mktsegment
    FROM customer e LEFT JOIN incoming i ON e.c_custkey = i.c_custkey
    """,
)
def smart_merge_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 field-level smart merge: new non-null wins, old kept under new
    null, ``always_take_new`` columns authoritative from the batch
    (``etl_accused.py:1349–1388``)."""
    cust = t(spark, sf_dir, "customer")
    incoming = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("_new")).alias("c_name"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit("NEWSEG").alias("c_mktsegment"),
    )
    merged = smart_merge(cust, incoming, "c_custkey", always_take_new=("c_mktsegment",))
    return merged.select(
        "c_custkey",
        "c_name",
        # + 0.0 canonicalizes IEEE -0.0 (acctbal is signed)
        (F.round("c_acctbal", 2) + 0.0).alias("c_acctbal"),
        "c_mktsegment",
    )


@register(
    "merge_classify_stats",
    """
    WITH incoming AS (
      SELECT o_orderkey, o_totalprice + 10 AS o_totalprice FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 5 = 1
      UNION ALL
      SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 5 = 2)
    SELECT merge_op, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT CASE WHEN e.o_orderkey IS NULL THEN 'inserted'
                  WHEN i.o_totalprice IS DISTINCT FROM e.o_totalprice THEN 'updated'
                  ELSE 'no_change' END AS merge_op
      FROM incoming i LEFT JOIN orders e ON i.o_orderkey = e.o_orderkey)
    GROUP BY merge_op
    """,
)
def merge_classify_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11/S7: inserted/updated/no_change accounting derived from the merge
    join's change predicate, not rowcounts (``etl_crimes.py:727–773``)."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    incoming = (
        o.filter(F.col("o_orderkey") % 5 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 10)
        .unionByName(o.filter(F.col("o_orderkey") % 5 == 1))
        .unionByName(
            o.filter(F.col("o_orderkey") % 5 == 2).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10000000
            )
        )
    )
    classified = classify_merge(o, incoming, "o_orderkey", ["o_totalprice"])
    return merge_stats(classified).select("merge_op", F.col("count").alias("n"))


@register(
    "fk_validate_lineitems",
    """
    SELECT fk_status, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT CASE WHEN EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
                  THEN 'valid' ELSE 'reject' END AS fk_status
      FROM lineitem l)
    GROUP BY fk_status
    """,
)
def fk_validate_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 FK validation split — one left join produces both halves
    (``etl_crimes.py:661–670``)."""
    li = t(spark, sf_dir, "lineitem")
    parent = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    valid, rejects = fk_validate(li, parent, "l_orderkey")
    return (
        valid.select(F.lit("valid").alias("fk_status"))
        .unionByName(rejects.select(F.lit("reject").alias("fk_status")))
        .groupBy("fk_status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "quarantine_retry_stats",
    """
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT CASE WHEN EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus <> 'F')
                  THEN 'resolved' ELSE 'still_pending' END AS bucket
      FROM lineitem l WHERE l.l_orderkey % 7 = 0)
    GROUP BY bucket
    """,
)
def quarantine_retry_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I5 deferred-FK queue replay (``etl_fk_retry_queue.py:38–130``)."""
    pending = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 7 == 0)
    parent = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    resolved, still = quarantine_retry(pending, parent, "l_orderkey")
    return (
        resolved.select(F.lit("resolved").alias("bucket"))
        .unionByName(still.select(F.lit("still_pending").alias("bucket")))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "watermark_incremental_events",
    """
    SELECT event_id FROM events
    WHERE ts > (SELECT MAX(ts) FROM events WHERE ts < TIMESTAMP '2024-01-20')
    """,
)
def watermark_incremental_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1 high-water-mark incremental read: watermark is one scalar agg on
    the target; the feed filter is an exact predicate pushed to the scan."""
    ev = t(spark, sf_dir, "events")
    target = ev.filter(F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
    wm = compute_watermark(target, "ts", "ts")
    return incremental_filter(ev, wm, "ts", "ts").select("event_id")


@register(
    "fuzzy_match_event_types",
    """
    WITH dict AS (SELECT DISTINCT event_type AS matched FROM events),
    probe AS (SELECT DISTINCT substr(event_type, 1, length(event_type) - 1) AS token FROM events),
    cand AS (
      SELECT p.token, d.matched,
             CAST(levenshtein(lower(trim(p.token)), lower(trim(d.matched))) AS INT) AS match_distance
      FROM probe p JOIN dict d
        ON levenshtein(lower(trim(p.token)), lower(trim(d.matched))) <= 2
       AND substr(lower(trim(p.token)), 1, 1) = substr(lower(trim(d.matched)), 1, 1)),
    r AS (SELECT *, row_number() OVER (PARTITION BY token
                                       ORDER BY match_distance ASC, lower(trim(matched)) ASC) AS rn
          FROM cand)
    SELECT token, matched, match_distance FROM r WHERE rn = 1
    """,
)
def fuzzy_match_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/J9/J10 fuzzy dictionary join: broadcast dict + JVM levenshtein with
    a first-letter block, best match per probe row
    (``drug_standardization.py:60–106``)."""
    ev = t(spark, sf_dir, "events")
    probe = ev.select(
        F.expr("substring(event_type, 1, length(event_type) - 1)").alias("token")
    ).distinct()
    dim = ev.select(F.col("event_type").alias("matched")).distinct()
    out = fuzzy_join_levenshtein(
        probe, dim, "token", "matched", max_distance=2, keep_best=True, block="prefix1"
    )
    return out.select("token", "matched", F.col("match_distance").cast("int").alias("match_distance"))


@register(
    "replace_children",
    """
    WITH incoming AS (
      SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity + 1000 AS l_quantity
      FROM lineitem WHERE l_orderkey % 10 = 0 AND l_linenumber <= 2),
    kept AS (SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
             WHERE l_orderkey NOT IN (SELECT DISTINCT l_orderkey FROM incoming)),
    merged AS (SELECT * FROM kept UNION ALL SELECT * FROM incoming)
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS total_qty
    FROM merged GROUP BY l_returnflag
    """,
)
def replace_children_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 delete-and-replace child sink: parents in the batch get their
    children dropped wholesale, then the batch appends — note the replaced
    parents end up with FEWER children (2 ≤ old count), which the oracle's
    totals verify (``etl-ir/ir_etl.py:743–773``)."""
    from dopams_etl_spark.operators.merge import replace_children

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    incoming = (
        li.filter((F.col("l_orderkey") % 10 == 0) & (F.col("l_linenumber") <= 2))
        .withColumn("l_quantity", F.col("l_quantity") + 1000)
    )
    merged = replace_children(li, incoming, "l_orderkey")
    return merged.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast(DEC)).cast("string").alias("total_qty"),
    )


@register(
    "insert_if_absent",
    """
    WITH incoming AS (
      SELECT o_orderkey, 0.0 AS o_totalprice FROM orders WHERE o_orderkey % 4 = 0
      UNION ALL
      SELECT o_orderkey + 20000000 AS o_orderkey, 1.0 AS o_totalprice
      FROM orders WHERE o_orderkey % 4 = 1),
    -- DISTINCT (dup2 census): insert-if-absent collapses in-batch
    -- duplicate keys — a replayed batch inserts each absent key ONCE
    fresh AS (SELECT DISTINCT * FROM incoming i
              WHERE NOT EXISTS (SELECT 1 FROM orders e WHERE e.o_orderkey = i.o_orderkey)),
    merged AS (SELECT o_orderkey, o_totalprice FROM orders UNION ALL SELECT * FROM fresh)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM merged
    """,
)
def insert_if_absent_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 insert-if-absent (ON CONFLICT DO NOTHING): existing keys keep
    their rows untouched — the zeroed prices for conflicting keys must NOT
    appear in the total (``files_loader.py:113–119``)."""
    from dopams_etl_spark.operators.merge import insert_if_absent

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    incoming = (
        o.filter(F.col("o_orderkey") % 4 == 0)
        .withColumn("o_totalprice", F.lit(0.0))
        .unionByName(
            o.filter(F.col("o_orderkey") % 4 == 1).select(
                (F.col("o_orderkey") + 20000000).alias("o_orderkey"),
                F.lit(1.0).alias("o_totalprice"),
            )
        )
    )
    merged = insert_if_absent(o, incoming, "o_orderkey")
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"), F.round(F.sum("o_totalprice"), 2).alias("total_price")
    )


@register(
    "hourly_event_stats",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    -- shared null-ts convention: an event with no event-time cannot be
    -- windowed (Spark's time-window plans this exact isnotnull filter)
    WHERE ts IS NOT NULL
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference event-time tumbling window (the batch shape of
    ``streaming.windowed_event_counts``): one hash aggregate on
    (window, key) — window assignment is a pure projection, no shuffle
    beyond the aggregation itself."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@register(
    "user_sessions",
    "WITH "
    + session_ctes("value")
    + """
    SELECT user_id, CAST(session_num AS INT) AS session_num,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec,
           ROUND(SUM(value), 2) AS total_value
    FROM s GROUP BY user_id, session_num
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference: gap-based event-time sessionization (30-min
    inactivity gap) via lag + running sum — two window passes over one
    partitioning, then a hash aggregate; the whole thing shuffles once on
    user_id."""
    ev = t(spark, sf_dir, "events")
    sessions = with_session_num(ev).withColumn(
        "session_num", F.col("session_num").cast("int")
    )
    return sessions.groupBy("user_id", "session_num").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias("duration_sec"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "approx_distinct_users",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS approx_within_3sigma
    FROM events
    GROUP BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference (SURVEY §7.3 step 7): approximate distinct counts
    via HyperLogLog++ — at 100 TB an exact countDistinct shuffles every
    distinct value, a sketch shuffles a few KB per group. The HLL++
    register values are engine-specific, so the hash-checkable contract
    row is the accuracy bound itself: ``approx_within_3sigma`` asserts
    |approx − exact|/exact < 3·rsd per group. rsd is a 1-sigma RELATIVE
    STANDARD ERROR, not a maximum — asserting the 1-sigma value itself
    would legitimately fail on ~1/3 of groups — so the contract states
    the 3-sigma envelope (P(violation) ≈ 0.3% per group), with an
    explicit empty-group guard (exact = 0 ⟺ approx = 0). The oracle
    states it as TRUE against DuckDB's exact COUNT(DISTINCT); the exact
    side here exists only to state the contract — the production path is
    the sketch alone."""
    rsd = 0.02
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "n_events",
            F.when(F.col("exact_users") == 0, F.col("approx_users") == 0)
            .otherwise(
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                < F.lit(3 * rsd)
            )
            .alias("approx_within_3sigma"),
        )
    )


_SX_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_SX_CODES = {**{c: "0" for c in "AEIOUY"}, **{c: "7" for c in "HW"},
             **{c: "1" for c in "BFPV"}, **{c: "2" for c in "CGJKQSXZ"},
             **{c: "3" for c in "DT"}, "L": "4", **{c: "5" for c in "MN"}, "R": "6"}
_SX_MAP = "".join(_SX_CODES[c] for c in _SX_ALPHA)


def soundex_sql(e: str) -> str:
    """DuckDB replica of Spark's ``F.soundex`` (verified char-for-char in
    tests/test_functions.py::test_soundex_sql_matches_spark): classic
    American soundex with H/W transparent, vowels AND non-letters resetting
    the last code, first-char-non-letter returning the input unchanged,
    zero-padded/truncated to 4. State machine runs as a ``list_reduce``
    whose accumulator is ``out || last_code``."""
    u = f"upper({e})"
    first = f"substr({u}, 1, 1)"
    acc0 = f"({first} || translate({first}, '{_SX_ALPHA}', '{_SX_MAP}'))"
    chars = f"list_transform(range(2, length({u}) + 1), i -> substr({u}, CAST(i AS INT), 1))"
    code = f"(CASE WHEN x BETWEEN 'A' AND 'Z' THEN translate(x, '{_SX_ALPHA}', '{_SX_MAP}') ELSE 'n' END)"
    step = (
        f"(CASE WHEN {code} = '7' THEN acc "
        f"WHEN {code} = '0' OR {code} = 'n' THEN substr(acc, 1, length(acc) - 1) || '0' "
        f"WHEN {code} = substr(acc, length(acc), 1) THEN acc "
        f"ELSE (CASE WHEN length(acc) - 1 < 4 "
        f"THEN substr(acc, 1, length(acc) - 1) || {code} "
        f"ELSE substr(acc, 1, length(acc) - 1) END) || {code} END)"
    )
    reduced = f"list_reduce(list_prepend({acc0}, {chars}), (acc, x) -> {step})"
    out = f"rpad(substr({reduced}, 1, length({reduced}) - 1), 4, '0')"
    return f"(CASE WHEN {first} BETWEEN 'A' AND 'Z' THEN {out} ELSE {e} END)"


@register(
    "nation_soundex_pairs",
    """
    WITH s AS (SELECT n_nationkey AS id, {sx} AS blk FROM nation)
    SELECT a.id AS id_a, b.id AS id_b
    FROM s a JOIN s b ON a.blk = b.blk AND a.id < b.id
    """.replace("{sx}", soundex_sql("trim(n_name)")),
)
def nation_soundex_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 phonetic-blocked candidate pairs (``brief_facts_ai/db.py:147–169``).
    Pairwise comparison never leaves a soundex block."""
    n = t(spark, sf_dir, "nation")
    left = n.select(F.col("n_nationkey").alias("id_a"), F.col("n_name").alias("name_a"))
    right = n.select(F.col("n_nationkey").alias("id_b"), F.col("n_name").alias("name_b"))
    pairs = soundex_blocked_candidates(left, right, "name_a", "name_b")
    return pairs.filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")


@register(
    "salted_event_totals",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def salted_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated aggregation: ``events.event_type`` has a handful of
    hot keys (the heavy-hitter GROUP BY shape), so the aggregate runs as
    the two-phase salted rewrite — partial on (key, salt), final on key —
    which spreads each hot key over ``salt_buckets`` reduce partitions.
    The oracle is the PLAIN group-by: salting must be invisible in the
    result. Sums are integer cents (floor before sum) so the value is
    partition-order-independent on both engines."""
    from dopams_etl_spark.operators.skew import salted_aggregate

    ev = t(spark, sf_dir, "events")
    return salted_aggregate(
        ev,
        "event_type",
        {
            "n": F.count(F.lit(1)),
            "total_cents": F.sum(F.floor(F.col("value").cast("double") * 100).cast("long")),
            "max_value": F.max("value"),
        },
        salt_buckets=16,
    ).select("event_type", F.col("n").cast("long").alias("n"), "total_cents", "max_value")


@register(
    "asof_purchase_last_view",
    """
    WITH v AS (SELECT user_id, ts, event_id AS view_id FROM events WHERE event_type = 'view'),
         p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id,
           (SELECT v.view_id FROM v
             WHERE v.user_id = p.user_id AND v.ts <= p.ts
             ORDER BY v.ts DESC, v.view_id DESC LIMIT 1) AS asof_view_id
    FROM p
    """,
)
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (a custom operator Spark lacks natively): each purchase
    gets the user's latest view event at-or-before it. Implemented as the
    union + carry-forward-window rewrite — one shuffle on user_id, linear
    per key, no inequality nested loop. The oracle keeps the declarative
    correlated-subquery form."""
    from dopams_etl_spark.operators.joins import asof_join

    ev = t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(purchases, views, "user_id", "ts", "ts", ["view_id"])
    return out.select("event_id", "user_id", F.col("asof_view_id"))


@register(
    "range_error_click_pairs",
    """
    SELECT e.event_id AS err_id, c.event_id AS click_id
    FROM events e JOIN events c
      ON e.user_id = c.user_id
     AND e.event_type = 'error' AND c.event_type = 'click'
     AND CAST(floor(epoch(c.ts)) AS BIGINT) >= CAST(floor(epoch(e.ts)) AS BIGINT)
     AND CAST(floor(epoch(c.ts)) AS BIGINT) < CAST(floor(epoch(e.ts)) AS BIGINT) + 3600
    """,
)
def range_error_click_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join via time bucketing: every click within one
    hour at-or-after an error by the same user. The inequality predicate
    becomes an EQUI-join on (user_id, hour-bucket) — left rows probe
    buckets b and b+1, the exact range filter removes ±1-bucket false
    positives — a hash join that shuffles on the key instead of the
    nested loop Spark would plan for the raw inequality."""
    from dopams_etl_spark.operators.joins import range_join_bucketed

    ev = t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    out = range_join_bucketed(errors, clicks, "user_id", "err_ts", "click_ts", 3600)
    return out.select("err_id", "click_id")


@register(
    "event_rollup_multigrain",
    """
    SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day, event_type,
           CAST(GROUPING(CAST(date_trunc('day', ts) AS DATE), event_type) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS total_cents
    -- Empty-input grouping-set convention (r13): no rows in, no rows
    -- out. Over ZERO input rows the SQL standard (and DuckDB) still
    -- emits the grand-total () row while Spark emits none; HAVING
    -- COUNT(*) > 0 states Spark's shape in SQL - it drops ONLY that
    -- zero-input row (every real group aggregates >= 1 row).
    FROM events
    GROUP BY ROLLUP (CAST(date_trunc('day', ts) AS DATE), event_type)
    HAVING COUNT(*) > 0
    """,
)
def event_rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain time rollup (the hypertable-rollup shape): one pass
    produces per-(day, type), per-day, and grand-total rows via ROLLUP —
    a single aggregation with grouping-set expansion instead of three
    separate scans/aggregates unioned. Exact integer-cent sums."""
    ev = t(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts").cast("date")
    )
    return (
        ev.rollup("day", "event_type")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value").cast("double") * 100).cast("long")).alias("total_cents"),
        )
        .select(F.col("day").cast("string").alias("day"), "event_type", "gid", "n", "total_cents")
    )


@register(
    "user_rolling_event_value",
    """
    -- ts IS NOT NULL (r14 nullhalf census): a null-time event has no
    -- position in the 3-row frame (Spark sorts it NULLS FIRST, DuckDB
    -- NULLS LAST, silently shifting every frame); COALESCE 0: an
    -- all-null-value frame has zero measured cents on both engines
    -- (a bare NULL sum also flips the pandas dtype bridge to float)
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_frame,
           CAST(COALESCE(SUM(CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT)) OVER w, 0)
                AS BIGINT) AS moving_cents
    FROM events WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def user_rolling_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based rolling aggregate: per user, the 3-event moving sum of
    event value (integer cents — partition-order-independent and exactly
    comparable). One window pass, shuffle on user_id only; the full
    (ts, event_id) sort key makes the frame deterministic."""
    # ts non-null + COALESCE 0 (r14 nullhalf census) — see the oracle note
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    cents = F.floor(F.col("value").cast("double") * 100).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_frame"),
        F.coalesce(F.sum(cents).over(w), F.lit(0)).cast("long").alias("moving_cents"),
    )


@register(
    "salted_join_user_enrich",
    """
    WITH dim AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS first_seen,
                        CAST(COUNT(*) AS BIGINT) AS lifetime_events
                 FROM events GROUP BY user_id)
    SELECT e.event_id, e.user_id, d.first_seen, d.lifetime_events
    FROM events e JOIN dim d ON e.user_id = d.user_id
    """,
)
def salted_join_user_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join: events.user_id is low-cardinality (hot
    keys), so the fact⋈dim enrichment runs through the replicate-and-salt
    rewrite — the big side salts randomly, the dim side explodes all
    salts, and the join key becomes (user_id, salt), spreading each hot
    key over 8 reduce partitions. The oracle is the PLAIN join: salting
    must be invisible in the result."""
    from dopams_etl_spark.operators.skew import salted_broadcast_left

    ev = t(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("first_seen"),
        F.count(F.lit(1)).alias("lifetime_events"),
    )
    out = salted_broadcast_left(ev, dim, "user_id", salt_buckets=8)
    return out.select("event_id", "user_id", "first_seen", "lifetime_events")


@register(
    "sliding_event_stats",
    """
    -- ts IS NOT NULL (r14 nullhalf census): a null-time event belongs
    -- to no time window; COALESCE 0: an all-null-value window has zero
    -- measured cents on both engines (a bare NULL sum also flips the
    -- pandas dtype bridge to float)
    WITH w AS (
      SELECT event_type, value,
             date_trunc('hour', ts) + CASE WHEN minute(ts) >= 30
                  THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS b
      FROM events WHERE ts IS NOT NULL),
    x AS (
      SELECT event_type, value, ws AS window_start
      FROM w, LATERAL (SELECT unnest([b, b - INTERVAL 30 MINUTE]) AS ws))
    SELECT window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT)), 0)
                AS BIGINT) AS total_cents
    FROM x GROUP BY window_start, event_type
    """,
)
def sliding_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time window (1 h wide, 30 min slide): each event lands
    in exactly two windows; one hash aggregate on (window, key) after the
    window-assignment projection. The oracle decomposes the slide into
    half-width buckets and a 2-element unnest — same window set, same
    exact integer-cent sums."""
    # ts non-null + COALESCE 0 (r14 nullhalf census) — see the oracle note
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.floor(F.col("value").cast("double") * 100).cast("long")),
                F.lit(0),
            ).alias("total_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_cents")
    )


@register(
    "event_value_percentiles",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT), 0.5), 6) AS p50_cents,
           ROUND(quantile_cont(CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT), 0.9), 6) AS p90_cents,
           ROUND(quantile_cont(CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT), 0.99), 6) AS p99_cents
    FROM events
    GROUP BY event_type
    """,
)
def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family addition: exact interpolated percentiles per group — one
    hash-partial + sort-based exact percentile per key (Spark
    ``percentile`` == DuckDB ``quantile_cont``, both linear interpolation
    at rank p·(n−1); integer-cent inputs keep the interpolation arithmetic
    bit-identical). At 100 TB the per-key state is the sorted value
    multiset — for gigarow keys swap in ``percentile_approx`` (t-digest,
    mergeable partials); that approx variant is deliberately NOT the
    oracled path since its sketch is engine-specific."""
    ev = t(spark, sf_dir, "events")
    cents = F.floor(F.col("value").cast("double") * 100).cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile(cents, F.lit(0.5)), 6).alias("p50_cents"),
        F.round(F.percentile(cents, F.lit(0.9)), 6).alias("p90_cents"),
        F.round(F.percentile(cents, F.lit(0.99)), 6).alias("p99_cents"),
    )


@register(
    "order_status_pivot",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'O'
                    THEN CAST(floor(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT) END) AS BIGINT) AS status_o_cents,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(floor(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT) END) AS BIGINT) AS status_f_cents,
           CAST(SUM(CASE WHEN o_orderstatus = 'P'
                    THEN CAST(floor(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT) END) AS BIGINT) AS status_p_cents
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (crosstab) aggregation: one groupBy with an explicit pivot
    value list — explicit values keep the plan single-pass (no extra
    distinct-values job) and the output schema static, which is also the
    100 TB posture: never let a pivot infer its columns from a full scan.
    The oracle is the standard conditional-aggregation rewrite."""
    orders = t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice").cast("double") * 100).cast("long")
    return (
        orders.withColumn("cents", cents)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum("cents"))
        .withColumnRenamed("O", "status_o_cents")
        .withColumnRenamed("F", "status_f_cents")
        .withColumnRenamed("P", "status_p_cents")
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(floor(CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE)) * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-01-01'
      AND l_shipdate > DATE '1998-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue_cents DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (top unshipped-revenue orders for one segment):
    both selective filters reach their scans (PushedFilters on mktsegment
    and the two date bounds) BEFORE the joins, so the join input is the
    filtered minority; top-10 is TakeOrderedAndProject (per-partition
    heap + driver merge), never a full sort. Integer-cent revenue keeps
    the double product deterministic under any partitioning."""
    cents = F.floor(
        F.col("l_extendedprice").cast("double")
        * (1 - F.col("l_discount").cast("double"))
        * 100
    ).cast("long")
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(cents).alias("revenue_cents"))
        .select(
            "l_orderkey", "revenue_cents",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(SUM(CAST(floor(CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE)) * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue_cents DESC
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (6-way join with the customer-nation == supplier-
    nation co-location predicate): the region filter prunes through the
    broadcast nation/region dims; fact-side joins stay plain for AQE.
    The c_nationkey = s_nationkey equality is part of the supplier join
    key — it cuts the join output 25× before the aggregate."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cents = F.floor(
        F.col("l_extendedprice").cast("double")
        * (1 - F.col("l_discount").cast("double"))
        * 100
    ).cast("long")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(cents).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc())
    )


@register(
    "snapshot_diff_orders",
    """
    WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
    n AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_totalprice FROM orders WHERE o_orderkey % 101 = 0),
    j AS (SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                 CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
                      WHEN n.o_orderkey IS NULL THEN 'deleted'
                      WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'updated'
                 END AS change_type
          FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
    SELECT o_orderkey, change_type FROM j WHERE change_type IS NOT NULL
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot audit diff (the set-operation restatement of
    the reference's row-at-a-time change detection, and the dry-run
    preview of any MERGE): the 'new' snapshot is derived deterministically
    (keys %97 deleted, %13 price-bumped, %101 re-inserted under shifted
    keys), then one FULL OUTER join classifies inserted/deleted/updated
    with null-safe value comparison."""
    from dopams_etl_spark.operators.merge import snapshot_diff

    orders = t(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    new = orders.filter(key % 97 != 0).withColumn(
        "o_totalprice",
        F.when(key % 13 == 0, F.col("o_totalprice") + 1).otherwise(F.col("o_totalprice")),
    ).unionByName(
        orders.filter(key % 101 == 0).withColumn("o_orderkey", key + 10_000_000)
    )
    return snapshot_diff(orders, new, ["o_orderkey"], ["o_totalprice"])


@register(
    "incremental_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS sum_qty,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           CAST(COUNT(*) AS BIGINT) AS count_order,
           CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS distinct_lines
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def incremental_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MV maintenance (beyond-reference; the scale answer to
    S13's full re-refresh, ``views_refresh_sql.py:1–81``): lineitem is
    split into a 15/16 "already ingested" base and a 1/16 "new delta" by
    an md5 nibble of the row key, each side aggregated into mergeable
    state (sum/cnt/min/max partials) with ``agg_state``, the two states
    merged by one groupBy, then finalized. The oracle is the PLAIN full
    aggregation — state merge is only correct if the merged result is
    bit-equal to a from-scratch rebuild, which is exactly what the value
    hash checks. At 100 TB each refresh aggregates only the delta and a
    key-count-sized state table; the fact table is never rescanned."""
    from dopams_etl_spark.operators.incremental_agg import (
        agg_state,
        finalize_state,
        merge_states,
    )

    li = t(spark, sf_dir, "lineitem").withColumn(
        "__qty_dec", F.col("l_quantity").cast(DEC)
    )
    tag = F.substring(
        F.md5(
            F.concat_ws(
                "|",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ),
        1,
        1,
    )
    keys = ["l_returnflag", "l_linestatus"]
    measures = {
        "sum_qty": ("sum", "__qty_dec"),
        "avg_disc": ("avg", "l_discount"),
        "max_qty": ("max", "l_quantity"),
        "count_order": ("count", None),
        # HLL sketch state: mergeable distinct count. l_linenumber's
        # per-group cardinality is bounded (1..7 at any SF), so the
        # sketch stays in exact sparse mode and the oracle can state
        # plain COUNT(DISTINCT).
        "distinct_lines": ("approx_distinct", "l_linenumber"),
    }
    base = agg_state(li.filter(tag != "f"), keys, measures)
    delta = agg_state(li.filter(tag == "f"), keys, measures)
    merged = merge_states(base, delta, keys, measures)
    out = finalize_state(merged, keys, measures)
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("string").alias("sum_qty"),
        F.round("avg_disc", 6).alias("avg_disc"),
        F.col("max_qty").cast("double").alias("max_qty"),
        F.col("count_order").cast("long").alias("count_order"),
        F.col("distinct_lines").cast("long").alias("distinct_lines"),
    )


@register(
    "event_value_rank_stats",
    """
    SELECT event_id, event_type,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def event_value_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window breadth (the ranking kit the MV rewrite relies on,
    SURVEY §2.5 note): rank / dense_rank / ntile / cume_dist over one
    per-type ordering — ONE shuffle keyed by event_type serves all four
    (a single WindowExec; the tie-break on event_id makes every function
    deterministic). At 100 TB the partition key bounds the sort, and a
    hot event_type is the documented skew hazard (salting applies when
    rank-within-salt is acceptable)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "order_grouping_sets",
    """
    SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN '(all)' ELSE o_orderstatus END
             AS status,
           CASE WHEN GROUPING(o_orderpriority) = 1 THEN '(all)' ELSE o_orderpriority END
             AS priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total_price
    -- Empty-input grouping-set convention (r13): no rows in, no rows
    -- out. Over ZERO input rows the SQL standard (and DuckDB) still
    -- emits the grand-total () row while Spark emits none; HAVING
    -- COUNT(*) > 0 states Spark's shape in SQL - it drops ONLY that
    -- zero-input row (every real group aggregates >= 1 row).
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    HAVING COUNT(*) > 0
    """,
)
def order_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain aggregation via GROUPING SETS (§2.4 beyond-reference
    companion to the ROLLUP in event_rollup_multigrain): detail,
    per-status, and grand-total grains in ONE pass — Spark's Expand
    replicates each input row once per grain before a single hash
    aggregate, so the fact table is scanned once, not three times.
    GROUPING() flags are folded into '(all)' sentinels so the NULL-group
    ambiguity (a real NULL vs a rolled-up level) never reaches the
    output."""
    ev = t(spark, sf_dir, "orders")
    ev.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN '(all)' ELSE o_orderstatus END
                 AS status,
               CASE WHEN GROUPING(o_orderpriority) = 1 THEN '(all)' ELSE o_orderpriority END
                 AS priority,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "hourly_gapfill_locf",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h, ROUND(SUM(value), 2) AS v
      FROM events WHERE user_id < 50 GROUP BY 1, 2),
    span AS (SELECT user_id, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
             FROM span),
    joined AS (SELECT g.user_id, g.h, hourly.v
               FROM grid g LEFT JOIN hourly ON hourly.user_id = g.user_id
                                           AND hourly.h = g.h)
    SELECT user_id,
           CAST(floor(epoch(h)) AS BIGINT) AS hour_epoch,
           last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
                                            ROWS UNBOUNDED PRECEDING) AS v_filled,
           v IS NULL AS was_gap
    FROM joined
    """,
)
def hourly_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + last-observation-carried-forward
    (beyond-reference; the TimescaleDB ``time_bucket_gapfill``/``locf``
    shape a hypertable rollup needs): each user's hourly aggregate is
    densified onto a regular hourly grid over their own observed span
    (``sequence`` + explode — the grid is generated, never stored) and
    gaps forward-fill via ``last(ignorenulls)`` over one per-user window.
    Two shuffles total (hourly aggregate, user window), both keyed on
    user_id; the grid fan-out is bounded by span-hours per user, not by
    corpus size."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    span = hourly.groupBy("user_id").agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    w = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "user_id",
        F.col("h").cast("long").alias("hour_epoch"),
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


@register(
    "weekly_cohort_retention",
    """
    WITH first AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
                   FROM events GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
    SELECT CAST(floor(epoch(f.cohort)) AS BIGINT) AS cohort_epoch,
           CAST(date_diff('day', f.cohort, a.wk) / 7 AS INT) AS week_n,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM act a JOIN first f ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (beyond-reference analytics breadth): users
    bucketed by first-seen week, activity counted per (cohort,
    weeks-since) cell — the standard retention triangle. Two aggregates
    keyed on user_id (first-seen, distinct active weeks) then one on the
    cohort cell; every shuffle key is either the user or the bounded
    (cohort, week) grid."""
    ev = t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort"))
    act = ev.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            F.col("cohort").cast("long").alias("cohort_epoch"),
            (F.datediff("wk", "cohort") / 7).cast("int").alias("week_n"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "view_click_purchase_funnel",
    """
    WITH t1 AS (SELECT user_id, MIN(ts) AS v_ts FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    t2 AS (SELECT e.user_id, MIN(e.ts) AS c_ts
           FROM events e JOIN t1 ON t1.user_id = e.user_id
           WHERE e.event_type = 'click' AND e.ts > t1.v_ts GROUP BY e.user_id),
    t3 AS (SELECT e.user_id, MIN(e.ts) AS p_ts
           FROM events e JOIN t2 ON t2.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts > t2.c_ts GROUP BY e.user_id)
    SELECT CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM t2) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM t3) AS BIGINT) AS n_view_click_purchase
    """,
)
def view_click_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (view → click → purchase, strictly
    increasing timestamps): each stage is a per-user MIN over events
    AFTER the previous stage's first occurrence — three aggregates all
    keyed on user_id, so at scale they share one partitioning. The three
    stage counts come from ONE global aggregate over the left-joined
    per-user funnel frame (t2 ⊆ t1 and t3 ⊆ t2 by construction, so
    count(c_ts)/count(p_ts) ARE the stage counts) — no scalar
    crossJoins, one single-row reduce. The strict ordering matters: a
    click before any view does not advance the funnel."""
    ev = t(spark, sf_dir, "events")
    t1 = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("v_ts")
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_view"),
            F.count("c_ts").alias("n_view_click"),
            F.count("p_ts").alias("n_view_click_purchase"),
        )
    )


@register(
    "hourly_gapfill_interpolate",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h, ROUND(SUM(value), 2) AS v
      FROM events WHERE user_id < 50 GROUP BY 1, 2),
    span AS (SELECT user_id, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
             FROM span),
    j AS (SELECT g.user_id, g.h, hourly.v
          FROM grid g LEFT JOIN hourly ON hourly.user_id = g.user_id
                                      AND hourly.h = g.h),
    ctx AS (SELECT user_id, h, v,
                   last_value(v IGNORE NULLS) OVER w_prev AS pv,
                   last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                     OVER w_prev AS pt,
                   first_value(v IGNORE NULLS) OVER w_next AS nv,
                   first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                     OVER w_next AS nt
            FROM j
            WINDOW w_prev AS (PARTITION BY user_id ORDER BY h
                              ROWS UNBOUNDED PRECEDING),
                   w_next AS (PARTITION BY user_id ORDER BY h
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, CAST(floor(epoch(h)) AS BIGINT) AS hour_epoch,
           floor((CASE WHEN v IS NOT NULL THEN v
                       WHEN pt = nt THEN pv
                       ELSE pv + (nv - pv) * date_diff('second', pt, h)
                                  / CAST(date_diff('second', pt, nt) AS DOUBLE)
                  END) * 1000000 + 0.5) / 1000000 AS v_interp,
           v IS NULL AS was_gap
    FROM ctx
    """,
)
def hourly_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap-fill (companion to hourly_gapfill_locf —
    TimescaleDB's ``interpolate``): each gap hour takes the line between
    its previous and next real observation. Two frame-bounded windows
    over ONE per-user ordering (preceding last / following first, both
    ignore-nulls) supply the bracketing points; span edges can't be null
    because the grid starts and ends on observations. Same two-shuffle
    plan as locf."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    span = hourly.groupBy("user_id").agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    j = grid.join(hourly, ["user_id", "h"], "left")
    w_prev = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # r16 (guide §1/§2): the next-observation lookups ran over a
    # CurrentRow..UnboundedFollowing frame, which Spark executes as
    # UnboundedFollowingWindowFunctionFrame — the aggregate recomputes
    # over the whole remaining frame PER ROW, O(rows²) per user (0.7 s
    # of the 1.0 s warm total on 35k grid rows). first_value(x IGNORE
    # NULLS) over (CURRENT ROW .. UNBOUNDED FOLLOWING, h ASC) is
    # value-identical to last_value over the RUNNING frame of the h DESC
    # ordering (grid hours are unique per user, so the reversed order is
    # total) — an O(rows) incremental frame. Costs one extra in-partition
    # sort (desc then back asc for w_prev); no new exchange.
    w_next_rev = Window.partitionBy("user_id").orderBy(F.col("h").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ts_obs = F.when(F.col("v").isNotNull(), F.col("h"))
    pv = F.last("v", ignorenulls=True).over(w_prev)
    pt = F.last(ts_obs, ignorenulls=True).over(w_prev)
    nv = F.last("v", ignorenulls=True).over(w_next_rev)
    nt = F.last(ts_obs, ignorenulls=True).over(w_next_rev)
    # multiply-then-divide, matching the oracle's left-to-right float
    # evaluation — computing the fraction first rounds differently in the
    # last ulp and can flip the 6-decimal rounding at a half boundary
    num = (F.col("h").cast("long") - pt.cast("long")).cast("double")
    den = (nt.cast("long") - pt.cast("long")).cast("double")
    interp = F.when(F.col("v").isNotNull(), F.col("v")).when(
        pt == nt, pv
    ).otherwise(pv + (nv - pv) * num / den)
    # explicit floor(x*1e6 + 0.5) instead of round(…, 6): the bracketing
    # fractions terminate in binary, so interpolated values land on exact
    # 6-decimal halves where the engines' round() half-modes disagree —
    # the same formula on both sides is deterministic
    return j.select(
        "user_id",
        F.col("h").cast("long").alias("hour_epoch"),
        (F.floor(interp * 1000000 + F.lit(0.5)) / 1000000).alias("v_interp"),
        F.col("v").isNull().alias("was_gap"),
    )


@register(
    "variant_props_stats",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS k_present,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type: one
    ``parse_json`` per row, typed ``try_variant_get`` extraction, then a
    plain aggregate. VARIANT parses once into a binary-encoded tree and
    each path access is an O(depth) walk — repeated ``get_json_object``
    calls re-parse the string per extraction, which at 100 TB is the
    difference between one parse and N parses per row. Missing keys
    surface as NULL (try_ semantics), mirrored by the oracle's
    json_extract_string."""
    ev = t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select("event_type", F.try_variant_get(v, "$.k", "long").alias("k")).groupBy(
        "event_type"
    ).agg(
        F.sum("k").alias("k_sum"),
        F.count("k").alias("k_present"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "scd2_user_event_history",
    """
    WITH e AS (SELECT user_id, event_id, event_type,
                      CAST(floor(epoch(ts)) AS BIGINT) AS s
               FROM events
               -- shared null-ts convention: an event with no timestamp
               -- cannot open or order a version
               WHERE ts IS NOT NULL),
    chg AS (SELECT user_id, event_type, s,
                   lag(event_type) OVER w AS prev_type
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)),
    v AS (SELECT user_id, event_type, s AS valid_from
          FROM chg WHERE prev_type IS NULL OR event_type <> prev_type)
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             AS valid_to,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             IS NULL AS is_current
    FROM v
    """,
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 history (beyond-reference
    warehouse pattern; the reference keeps only current state + audit
    columns): each user's event-type change stream collapses to one row
    per RUN (a version opens only when the attribute actually changes),
    with [valid_from, valid_to) intervals from a lead window and an
    is_current flag on the open version. Two window passes over ONE
    per-user ordering — at 100 TB the shuffle key is the dimension key,
    exactly like the latest-per-key family."""
    # shared null-ts convention: an event with no timestamp cannot open
    # or order a version (oracle states ts IS NOT NULL)
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").cast("long"), "event_id"
    )
    chg = ev.select(
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("s"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
    w2 = Window.partitionBy("user_id").orderBy("s")
    return chg.select(
        "user_id",
        "event_type",
        F.col("s").alias("valid_from"),
        F.lead("s").over(w2).alias("valid_to"),
        F.lead("s").over(w2).isNull().alias("is_current"),
    )


@register(
    "event_value_moments",
    """
    SELECT event_type,
           ROUND(stddev_samp(value), 6) AS sd,
           ROUND(var_samp(value), 6) AS variance,
           -- + 0.0 canonicalizes IEEE -0.0 on the sign-indefinite pair
           -- (corr/covar can be negative; sd/variance cannot)
           ROUND(corr(value, CAST(floor(epoch(ts)) AS BIGINT)), 6) + 0.0
             AS corr_time,
           ROUND(covar_samp(value, user_id), 6) + 0.0 AS covar_user
    FROM events
    GROUP BY event_type
    """,
)
def event_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate breadth (A-family): sample stddev/variance,
    Pearson correlation against event time, and sample covariance — all
    single-pass mergeable moment sketches in Spark's hash aggregate
    (sum, sum-of-squares, cross-sums per partial), so they scale exactly
    like SUM. Both engines use numerically-stable single-pass updates;
    agreement at 6 decimals is part of what the oracle checks.

    Degenerate-group guard (r12 review): under ANSI, Spark's builtin
    corr/covar_samp/stddev_samp ABORT on a zero-variance or single-row
    group (the final n−1 / √variance division throws DIVIDE_BY_ZERO)
    where DuckDB yields NULL — so each statistic is assembled from the
    throw-free population moments (var_pop/covar_pop divide by n ≥ 1)
    with try_divide supplying the NULL. The corr moments are computed
    PAIRWISE-COMPLETE (x conditioned on y's non-nullness and vice
    versa), matching SQL corr's null semantics exactly."""
    ev = t(spark, sf_dir, "events")
    x, yn, un = F.col("value"), F.col("ts"), F.col("user_id")
    y = yn.cast("long")
    u = un.cast("double")
    n_x = F.count("value")
    n_xu = F.count(
        F.when(x.isNotNull() & un.isNotNull(), F.lit(1))
    )
    var_samp = F.try_divide(F.var_pop("value") * n_x, n_x - 1)
    corr_time = F.try_divide(
        F.covar_pop(x, y),
        F.stddev_pop(F.when(yn.isNotNull(), x))
        * F.stddev_pop(F.when(x.isNotNull(), y)),
    )
    covar_samp = F.try_divide(F.covar_pop(x, u) * n_xu, n_xu - 1)
    return ev.groupBy("event_type").agg(
        F.round(F.sqrt(var_samp), 6).alias("sd"),
        F.round(var_samp, 6).alias("variance"),
        (F.round(corr_time, 6) + 0.0).alias("corr_time"),
        (F.round(covar_samp, 6) + 0.0).alias("covar_user"),
    )


@register(
    "heavy_hitter_users",
    """
    SELECT CAST(user_id AS VARCHAR) AS user_id,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) >= CAST(ceil(0.007 * (SELECT COUNT(*) FROM events)) AS BIGINT)
    """,
)
def heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items query: every user producing ≥ 0.7% of all events,
    with exact counts — computed with the Misra-Gries candidate-then-verify
    plan (``operators/sketches.py``): per-partition bounded summaries union
    to a guaranteed superset of the true heavy hitters, then one exact
    count pass over the broadcast candidate set. The oracle states the
    naive GROUP BY/HAVING answer the plan must exactly equal. At 100 TB the
    naive form shuffles one row per distinct key; this plan's phase-1
    output is ≤ capacity × partitions rows regardless of key cardinality
    (reference analog: the per-entity frequency dashboards its MV layer
    recounts in full each refresh)."""
    from dopams_etl_spark.operators.sketches import heavy_hitters

    ev = t(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", 0.007)


@register(
    "supplier_customer_pagerank",
    """
    WITH e0 AS (SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                                'c' || CAST(o_custkey AS VARCHAR) AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    e AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
    r1 AS (SELECT nodes.node,
                  0.15 / (SELECT n FROM nn)
                  + 0.85 * COALESCE(f.inflow, 0) AS rank
           FROM nodes LEFT JOIN (
               SELECT e.dst AS node, SUM(r.rank / deg.outdeg) AS inflow
               FROM e JOIN r0 r ON r.node = e.src JOIN deg ON deg.src = e.src
               GROUP BY e.dst) f USING (node)),
    r2 AS (SELECT nodes.node,
                  0.15 / (SELECT n FROM nn)
                  + 0.85 * COALESCE(f.inflow, 0) AS rank
           FROM nodes LEFT JOIN (
               SELECT e.dst AS node, SUM(r.rank / deg.outdeg) AS inflow
               FROM e JOIN r1 r ON r.node = e.src JOIN deg ON deg.src = e.src
               GROUP BY e.dst) f USING (node)),
    r3 AS (SELECT nodes.node,
                  0.15 / (SELECT n FROM nn)
                  + 0.85 * COALESCE(f.inflow, 0) AS rank
           FROM nodes LEFT JOIN (
               SELECT e.dst AS node, SUM(r.rank / deg.outdeg) AS inflow
               FROM e JOIN r2 r ON r.node = e.src JOIN deg ON deg.src = e.src
               GROUP BY e.dst) f USING (node))
    SELECT node, ROUND(rank, 6) AS rank FROM r3
    """,
)
def supplier_customer_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank (3 power iterations, d=0.85) over the symmetrized
    supplier↔customer bipartite graph derived from lineitem⋈orders —
    influence scoring over an entity-relationship graph (reference analog:
    the criminal-network 'linked entities' views). Exercises the engine's
    iterative-algorithm machinery: one keyed shuffle per iteration with
    localCheckpoint lineage truncation (``operators/graph.py:pagerank``).
    The oracle unrolls the same three iterations as chained SQL CTEs —
    identical simple-formulation semantics (dangling mass not
    redistributed; symmetrizing leaves no dangling nodes here anyway)."""
    from dopams_etl_spark.operators.graph import pagerank

    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    e0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    pr = pagerank(edges, iterations=3, damping=0.85)
    return pr.select("node", F.round("rank", 6).alias("rank"))


@register(
    "approx_percentile_rank_contract",
    """
    SELECT event_type,
           CAST(COUNT(value) AS BIGINT) AS n,
           TRUE AS rank_ok
    FROM events
    GROUP BY event_type
    """,
)
def approx_percentile_rank_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract row for the t-digest-style approximate median
    (``percentile_approx``, the 100 TB swap-in the exact-percentile
    queries document): per event_type the approx p50's TRUE rank must lie
    within the Greenwald-Khanna envelope ⌈p·n⌉ ± (n/accuracy + 1). The
    oracle asserts the boolean — the same upgrade pattern as
    ``approx_distinct_users`` (the sketch value itself is engine-specific
    and never compared; its accuracy guarantee is). Two passes: the
    grouped sketch (mergeable partials), then a broadcast join back to
    count values ≤ the approx median."""
    ev = t(spark, sf_dir, "events")
    ap = ev.groupBy(F.col("event_type").alias("a_type")).agg(
        F.count("value").alias("n"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("ap50"),
    )
    eps_slack = F.col("n").cast("double") / 10000.0 + 1.0
    target = F.ceil(F.col("n").cast("double") * 0.5).cast("double")
    # null-safe join: the NULL-event-type group is a real group
    joined = ev.join(
        F.broadcast(ap), F.col("event_type").eqNullSafe(F.col("a_type"))
    )
    ranks = joined.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.count(F.when(F.col("value") <= F.col("ap50"), 1)).cast("double").alias("rank_le"),
        F.count(F.when(F.col("value") < F.col("ap50"), 1)).cast("double").alias("rank_lt"),
    )
    # Tie-aware rank contract (decided r15): a value tied many times
    # occupies the whole rank interval [count(<v)+1, count(<=v)] — the
    # GK guarantee holds iff that interval INTERSECTS the envelope
    # target ± slack (under total ties rank_le = n, and the upper rank
    # alone would sit far outside the envelope while the returned value
    # is still an exact median).
    return ranks.select(
        "event_type",
        F.col("n"),
        (
            (F.col("rank_lt") + 1 <= target + eps_slack)
            & (F.col("rank_le") >= target - eps_slack)
        ).alias("rank_ok"),
    )


from dopams_etl_spark.operators.layout import (  # noqa: E402
    zorder_bounds_sql,
    zorder_code,
    zorder_code_sql,
)

_ZORDER_ORACLE = f"""
    WITH b AS ({zorder_bounds_sql(["user_id", "value"], "events")})
    SELECT event_id, {zorder_code_sql(["user_id", "value"], 8)} AS zcode
    FROM events, b
"""


@register("zorder_layout_events", _ZORDER_ORACLE)
def zorder_layout_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering codes over (user_id, value) — the
    data-layout half of scan pruning (Delta OPTIMIZE ZORDER / Iceberg
    sort-order analog, ``operators/layout.py``). Quantize each column to
    8 bits against the global min/max (a one-row broadcast aggregate),
    bit-interleave into a 16-bit curve position; writing
    ``repartitionByRange + sortWithinPartitions`` on this code gives every
    file a tight min/max span in BOTH dimensions, so column statistics
    prune files for predicates on either column (the multi-dimension
    complement of `partitioned_scan_prune`'s one-column hive pruning;
    locality measured in test_layout). The oracle replays the identical
    quantize/shift/OR arithmetic generated from the same spec — the curve
    is checked bit-for-bit."""
    ev = t(spark, sf_dir, "events")
    return zorder_code(ev, ["user_id", "value"], bits=8).select("event_id", "zcode")


@register(
    "event_value_zscore",
    """
    WITH s AS (SELECT event_type, AVG(value) AS mu, stddev_samp(value) AS sd,
                      COUNT(*) AS n
               FROM events GROUP BY event_type)
    SELECT e.event_id,
           e.event_type,
           -- + 0.0 canonicalizes IEEE -0.0 (z is sign-indefinite; a value
           -- a hair under its group mean rounds to -0.0 in DuckDB only)
           ROUND(CASE WHEN s.sd > 0 THEN (e.value - s.mu) / s.sd END, 6) + 0.0
             AS z
    FROM events e JOIN s USING (event_type)
    """,
)
def event_value_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise feature standardization (z-score per event_type) — the
    normalization step quality-classifier features and embedding scalar
    features need before thresholding or training. Plan: ONE grouped
    moment aggregate (mergeable sum/sum-of-squares partials), broadcast
    back onto the fact — not a window function, which would sort the
    entire fact inside each partition for what is a two-scalar-per-group
    computation. Degenerate groups (zero variance) yield NULL rather than
    ±inf; six-decimal rounding makes the FP associativity of the
    distributed mean/stddev engine-portable."""
    ev = t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            (
                F.round(
                    F.when(
                        F.col("sd") > 0,
                        (F.col("value") - F.col("mu")) / F.col("sd"),
                    ),
                    6,
                )
                + 0.0
            ).alias("z"),
        )
    )


@register(
    "interval_overlap_merge",
    """
    -- ts IS NOT NULL (r13 nullhalf census): a null-time event opens no
    -- interval; without the filter the engines island it at OPPOSITE
    -- ends of the s-ordering (Spark NULLS FIRST, DuckDB NULLS LAST) and
    -- the null island's NULL bounds float64-bridge the whole column
    WITH iv AS (SELECT user_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS s,
                       CAST(floor(epoch(ts)) AS BIGINT) + 1800 AS e
                FROM events WHERE ts IS NOT NULL),
    f AS (SELECT user_id, s, e,
                 CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                        OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      THEN 1 ELSE 0 END AS ni
          FROM iv),
    g AS (SELECT user_id, s, e,
                 SUM(ni) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
          FROM f)
    SELECT user_id, MIN(s) AS island_start, MAX(e) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id, island
    """,
)
def interval_overlap_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union (gap-and-island): each event opens a 30-minute
    activity interval; overlapping-or-touching intervals per user merge
    into maximal busy periods (start, end, member count) — downtime
    reports, coalesced session windows with explicit durations,
    retention bookkeeping. ONE window pass per user (running max of
    interval ends detects island boundaries) + one groupBy — no
    self-join, no O(n²)-per-key overlap pairing, no transitive-closure
    chase; the only shuffle is keyed on user_id (`operators/
    intervals.py:merge_intervals`)."""
    from dopams_etl_spark.operators.intervals import merge_intervals

    ev = t(spark, sf_dir, "events")
    # ts non-null (r13 nullhalf census): a null-time event opens no
    # interval — see the oracle note
    iv = ev.filter(F.col("ts").isNotNull()).select(
        "user_id",
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long") + F.lit(1800)).alias("e"),
    )
    return merge_intervals(iv, "user_id", "s", "e").select(
        "user_id",
        F.col("island_start"),
        F.col("island_end"),
        F.col("n_intervals").alias("n_events"),
    )


@register(
    "event_transition_matrix",
    """
    -- ts IS NOT NULL (r13 nullhalf census): an event with no time has
    -- no position in the per-user sequence; the engines' opposite NULL
    -- orderings would otherwise shift every lag pair
    WITH seq AS (SELECT user_id, event_type,
                        lag(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS prev_type
                 FROM events WHERE ts IS NOT NULL),
    c AS (SELECT prev_type, event_type AS next_type,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM seq WHERE prev_type IS NOT NULL
          GROUP BY prev_type, next_type)
    SELECT prev_type, next_type, cnt,
           ROUND(cnt / CAST(SUM(cnt) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
             AS prob
    FROM c
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event sequences —
    the behavioral model behind next-action prediction, funnel-anomaly
    scoring, and bot detection (uniform transition rows are a strong bot
    signal). Plan: one lag window keyed on user (each user sorts only
    its own events), one (prev, next) count aggregate, and the
    normalizing row-sum window over the |event_types|² transition grid —
    a bounded frame no matter the event volume."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wn = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(wn).cast("double"), 6).alias("prob"),
    )


@register(
    "event_value_robust_zscore",
    """
    -- CAST DOUBLE at first use (r14 f32 census): DuckDB otherwise keeps
    -- the whole score expression in the float32 lane (DECIMAL-literal
    -- 0.6745 * FLOAT stays FLOAT) where Spark's percentile/arithmetic
    -- promote to double
    WITH ev AS (SELECT event_id, event_type, CAST(value AS DOUBLE) AS value
                FROM events),
    med AS (SELECT event_type, ROUND(median(value), 6) AS med
                 FROM ev GROUP BY event_type),
    mad AS (SELECT e.event_type,
                   ROUND(median(abs(e.value - m.med)), 6) AS mad
            FROM ev e JOIN med m USING (event_type)
            GROUP BY e.event_type),
    s AS (SELECT med.event_type, med.med, mad.mad FROM med JOIN mad USING (event_type))
    SELECT e.event_id, e.event_type,
           -- + 0.0 canonicalizes IEEE -0.0 (rz is sign-indefinite)
           ROUND(CASE WHEN s.mad > 0
                      THEN 0.6745 * (e.value - s.med) / s.mad END, 6) + 0.0
             AS rz
    FROM ev e JOIN s USING (event_type)
    """,
)
def event_value_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust z-score per event_type — the outlier score that
    survives the outliers themselves (a fat-fingered 10^9 value drags a
    mean/stddev z-score's own baseline; the median and MAD don't move).
    0.6745·(x−med)/MAD is the standard consistency-scaled form. Plan:
    two grouped exact-percentile aggregates (median, then median of
    absolute deviations) broadcast back onto the fact — same
    moment-broadcast shape as event_value_zscore, never a window sort
    over the fact; at gigarow groups swap percentile for
    percentile_approx (the checked contract in
    approx_percentile_rank_contract). Median and MAD are rounded to 6
    on both sides BEFORE the score so cross-engine quantile
    interpolation can't flip the rounded result."""
    ev = t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad"))
    )
    stats = med.join(mad, "event_type")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            # + 0.0 canonicalizes IEEE -0.0 (rz is sign-indefinite)
            (
                F.round(
                    F.when(
                        F.col("mad") > 0,
                        F.lit(0.6745)
                        * (F.col("value") - F.col("med"))
                        / F.col("mad"),
                    ),
                    6,
                )
                + 0.0
            ).alias("rz"),
        )
    )


@register(
    "rolling_median_event_value",
    """
    -- ts IS NOT NULL (r13 nullhalf census): a null-time event has no
    -- position in the 5-row frame (Spark sorts it NULLS FIRST, DuckDB
    -- NULLS LAST, silently shifting every frame)
    -- CAST DOUBLE (r14 f32 census): DuckDB's median/ROUND otherwise stay
    -- in the float32 lane where Spark's percentile promotes to double
    SELECT event_id, user_id,
           ROUND(median(CAST(value AS DOUBLE))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
             AS med5
    FROM events WHERE ts IS NOT NULL
    """,
)
def rolling_median_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 5-event median of value per user — the denoised activity
    baseline rate-limiting and anomaly alerts compare against (a rolling
    MEAN is exactly as corrupted by the spike it's supposed to detect).
    Plan: one user-keyed window with a 5-row frame; the exact percentile
    re-sorts only the frame, and the shuffle is keyed on user_id. Both
    engines interpolate even-length frames identically
    (quantile_cont semantics)."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.expr(
                "percentile(value, 0.5) OVER (PARTITION BY user_id "
                "ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)"
            ),
            6,
        ).alias("med5"),
    )


@register(
    "skyline_orders_pareto",
    """
    WITH o AS (SELECT o_orderkey,
                      CAST(floor(epoch(o_orderdate)) AS BIGINT) AS d,
                      o_totalprice AS p
               FROM orders),
    g AS (SELECT d, max(p) AS pmax FROM o GROUP BY d),
    w AS (SELECT d, pmax,
                 max(pmax) OVER (ORDER BY d
                     RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
          FROM g),
    fr AS (SELECT d, pmax FROM w WHERE m1 IS NULL OR pmax > m1)
    SELECT o.o_orderkey, o.d AS order_epoch, o.p AS totalprice
    FROM o JOIN fr ON o.d = fr.d AND o.p = fr.pmax
    """,
)
def skyline_orders_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) of orders: earliest date vs highest
    price — every order not dominated by one both earlier-or-equal and
    pricier (strictly better on at least one axis). The multi-objective
    'best trade-offs' query behind price/latency curves and
    quality-vs-cost corpus triage. Plan: collapse to one max-price
    candidate per DISTINCT date first (only the per-date maximum can be
    on the frontier), run the strictly-earlier running-max window over
    that skinny date grid, and join winners back to pick up exact
    (date, price) ties — the naive NOT-EXISTS domination join is O(n²)
    and the window-over-the-fact variant sorts every row; this sorts
    |distinct dates| rows no matter the order volume."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        # NTZ → LTZ is identity under the session's pinned UTC zone, and
        # the long epoch then matches DuckDB's epoch() on the naive value
        F.col("o_orderdate").cast("timestamp").cast("long").alias("d"),
        F.col("o_totalprice").alias("p"),
    )
    g = o.groupBy("d").agg(F.max("p").alias("pmax"))
    wspec = (
        Window.orderBy("d").rangeBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        g.withColumn("m1", F.max("pmax").over(wspec))
        .filter(F.col("m1").isNull() | (F.col("pmax") > F.col("m1")))
        .select(F.col("d").alias("fd"), F.col("pmax").alias("fp"))
    )
    return (
        o.join(
            F.broadcast(frontier),
            (o["d"] == F.col("fd")) & (o["p"] == F.col("fp")),
        )
        .select("o_orderkey", F.col("d").alias("order_epoch"), F.col("p").alias("totalprice"))
    )


@register(
    "supplier_cooccur_triangles",
    """
    WITH pair AS (SELECT DISTINCT l1.l_suppkey AS u, l2.l_suppkey AS v
                  FROM lineitem l1 JOIN lineitem l2
                    ON l1.l_orderkey = l2.l_orderkey
                   AND l1.l_suppkey < l2.l_suppkey),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM (SELECT u AS node FROM pair UNION ALL SELECT v FROM pair)
            GROUP BY node),
    o AS (SELECT CASE WHEN (du.deg, p.u) < (dv.deg, p.v) THEN p.u ELSE p.v END AS a,
                 CASE WHEN (du.deg, p.u) < (dv.deg, p.v) THEN p.v ELSE p.u END AS b
          FROM pair p
          JOIN deg du ON du.node = p.u
          JOIN deg dv ON dv.node = p.v),
    wed AS (SELECT o1.a, o1.b AS b1, o2.b AS b2
            FROM o o1 JOIN o o2 ON o1.a = o2.a AND o1.b < o2.b),
    tri AS (SELECT 1 FROM wed WHERE EXISTS
              (SELECT 1 FROM o WHERE least(o.a, o.b) = wed.b1
                                 AND greatest(o.a, o.b) = wed.b2)),
    s AS (SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM pair) AS n_edges,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM wed) AS n_wedges,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles)
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           ROUND(CASE WHEN n_wedges > 0
                      THEN n_triangles / CAST(n_wedges AS DOUBLE) END, 6)
             AS clustering_coeff
    FROM s
    """,
)
def supplier_cooccur_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the supplier co-purchase graph (suppliers
    co-occurring in an order are adjacent): nodes, edges, oriented
    wedges, triangles, and the global clustering coefficient — the
    cohesion profile of any co-occurrence graph (dedup-pair graphs,
    entity-mention graphs, user-item projections). Degree-ordered
    orientation (Suri & Vassilvitskii, WWW'11) bounds every out-list by
    O(√m) so the wedge self-join survives power-law degree skew — the
    celebrity node's edges all point INTO it (`operators/
    graph.py:triangle_stats`). Edge generation is per-order pairing,
    bounded by TPC-H's ≤7 items/order (≤21 pairs/order at any SF)."""
    from dopams_etl_spark.operators.graph import triangle_stats

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # r15 (guide §2.3/§2.4): pair generation via per-order sorted supplier
    # sets instead of the lineitem self-join — one scan + one exchange on
    # the order key replaces two scans, two exchanges and an SMJ; the
    # ≤7-item order bound caps the explode at C(7,2)=21 pairs. The sorted
    # collect_set makes every emitted pair src<dst (exactly the old join
    # predicate), and triangle_stats canonicalizes+distincts, so the
    # wrapper's own distinct is dropped rather than paid twice.
    # NULL keys: the old equi-join dropped NULL order keys and the `<`
    # predicate dropped NULL suppkeys — filter + collect_set (which skips
    # NULLs) reproduce both, so degenerate null fixtures stay identical.
    # The hash repartition on the order key spreads the one-row-group
    # scan AND pre-satisfies the groupBy (guide §2.4); no-op at real
    # scan parallelism, AQE-exempt so tiny shuffle bytes can't collapse
    # the pair-generation stage to one task.
    from dopams_etl_spark.partitioning import ensure_parallelism

    sups = (
        ensure_parallelism(li.filter(F.col("l_orderkey").isNotNull()), "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("ss"))
    )
    edges = (
        sups.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ss",
                        lambda x, i: F.transform(
                            F.slice(
                                "ss", i + F.lit(2), F.size("ss") - i - 1
                            ),
                            lambda y: F.struct(
                                x.alias("src"), y.alias("dst")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
    )
    return triangle_stats(edges)


def _hits_oracle(iterations: int = 2) -> str:
    """DuckDB replica of ``graph.hits`` over the supplier→customer edge
    list: uniform init, h = Σ a over out-edges then a = Σ h over
    in-edges, L1 normalization with ROUND(x, 12) after every step —
    the same intermediate-rounding pin as the kmeans/pagerank oracles,
    so the two-iteration chain is value-identical cross-engine."""
    parts = [
        """WITH e AS (SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 1000000 AS dst
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    h0 AS (SELECT node, 1.0 AS s FROM nodes),
    a0 AS (SELECT node, 1.0 AS s FROM nodes)"""
    ]
    prev_a, prev_h = "a0", "h0"
    for it in range(1, iterations + 1):
        parts.append(
            f"""hr{it} AS (SELECT e.src AS node, SUM({prev_a}.s) AS s
             FROM e JOIN {prev_a} ON {prev_a}.node = e.dst GROUP BY e.src),
    hf{it} AS (SELECT n.node, COALESCE(hr{it}.s, 0.0) AS s
               FROM nodes n LEFT JOIN hr{it} ON hr{it}.node = n.node),
    h{it} AS (SELECT node, ROUND(s / (SELECT SUM(s) FROM hf{it}), 12) AS s FROM hf{it}),
    ar{it} AS (SELECT e.dst AS node, SUM(h{it}.s) AS s
             FROM e JOIN h{it} ON h{it}.node = e.src GROUP BY e.dst),
    af{it} AS (SELECT n.node, COALESCE(ar{it}.s, 0.0) AS s
               FROM nodes n LEFT JOIN ar{it} ON ar{it}.node = n.node),
    a{it} AS (SELECT node, ROUND(s / (SELECT SUM(s) FROM af{it}), 12) AS s FROM af{it})"""
        )
        prev_a, prev_h = f"a{it}", f"h{it}"
    parts.append(
        f"""SELECT h.node, ROUND(h.s, 6) AS hub, ROUND(a.s, 6) AS auth
    FROM {prev_h} h JOIN {prev_a} a ON h.node = a.node"""
    )
    return ",\n    ".join(parts[:-1]) + "\n    " + parts[-1]


@register("supplier_customer_hits", _hits_oracle(2))
def supplier_customer_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the directed supplier→customer supply
    graph (who supplies whom, via lineitem⋈orders; customer ids offset
    by 1e6 into a shared node space) — PageRank's directional
    complement: hub score ranks influential suppliers, authority score
    ranks well-sourced customers, two numbers one symmetric rank can't
    give. Two L1-normalized power iterations, every normalized score
    rounded to 12 so the oracle replays the chain value-for-value
    (`operators/graph.py:hits`). Per half-iteration: one keyed
    aggregation + one join against the checkpoint-pinned edge list; the
    norm is a ONE-ROW broadcast."""
    from dopams_etl_spark.operators.graph import hits

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
    return hits(edges, iterations=2)


@register(
    "cms_user_counts",
    """
    WITH h AS (SELECT CAST(user_id AS VARCHAR) AS key,
                      ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h1,
                      ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 9, 8))::BIGINT AS h2,
                      user_id
               FROM events),
    cells AS (SELECT i.i AS row, CAST((h1 + i.i * h2) % 64 AS INT) AS col,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM h, (SELECT unnest(range(0, 3)) AS i) i
              GROUP BY 1, 2),
    k AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact,
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h1,
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 9, 8))::BIGINT AS h2
          FROM events GROUP BY user_id),
    est AS (SELECT k.user_id, k.exact, MIN(c.cnt) AS est
            FROM k, (SELECT unnest(range(0, 3)) AS i) i
            JOIN cells c ON c.row = i.i
                        AND c.col = CAST((k.h1 + i.i * k.h2) % 64 AS INT)
            GROUP BY k.user_id, k.exact)
    SELECT user_id, exact, est, est >= exact AS no_undercount FROM est
    """,
)
def cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch point-frequency estimates for every user against
    their exact counts — the fixed-size frequency summary (depth 3 ×
    width 64 cells here, deliberately undersized so collisions are
    visible) whose one-sided guarantee the oracle checks PER KEY:
    ``no_undercount`` must be TRUE everywhere, and the estimate values
    themselves hash-match because both engines build the identical
    md5-double-hashed sketch (`operators/sketches.py:cms_counters/
    cms_estimate`). MG (heavy_hitter_users) answers 'which keys are
    heavy'; CMS answers 'how often is THIS key' in depth·width integers
    at ANY cardinality, and two sketches merge by cell-wise addition —
    the reason it composes with incremental ingest where exact per-key
    counts force a full shuffle."""
    from dopams_etl_spark.operators.sketches import cms_counters, cms_estimate

    ev = t(spark, sf_dir, "events")
    counters = cms_counters(ev.select("user_id"), "user_id", width=64, depth=3)
    keys = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(keys, "user_id", counters, width=64, depth=3)
    return est.select(
        "user_id",
        "exact",
        "est",
        (F.col("est") >= F.col("exact")).alias("no_undercount"),
    )


@register(
    "supplier_customer_bfs",
    """
    WITH RECURSIVE e AS (SELECT DISTINCT l.l_suppkey AS u,
                                o.o_custkey + 1000000 AS v
                         FROM lineitem l
                         JOIN orders o ON l.l_orderkey = o.o_orderkey),
    sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
    walk(node, dist) AS (
        SELECT CAST(1 AS BIGINT) AS node, 0 AS dist
        UNION
        SELECT sym.v, walk.dist + 1
        FROM walk JOIN sym ON sym.u = walk.node
        WHERE walk.dist < 6
    )
    SELECT node, CAST(MIN(dist) AS INT) AS dist FROM walk GROUP BY node
    """,
)
def supplier_customer_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop BFS distances from supplier 1 over the undirected
    supplier↔customer graph (hop cap 6) — the 'within-k-hops'
    reachability primitive behind neighborhood blocking, influence
    radii, and link-distance features. The engine runs frontier-only
    Pregel rounds (per-round cost ∝ frontier, one keyed shuffle each,
    checkpoint-pinned edges — `operators/graph.py:bfs_distances`); the
    oracle states the SAME answer as a recursive CTE, so the iterative
    DataFrame loop is value-checked against SQL's declarative
    transitive closure."""
    from dopams_etl_spark.operators.graph import bfs_distances

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
    sources = spark.range(1, 2).select(F.col("id").alias("node"))
    return bfs_distances(edges, sources, max_depth=6).select(
        "node", F.col("dist").cast("int").alias("dist")
    )


@register(
    "user_event_entropy",
    """
    WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
               FROM events GROUP BY 1, 2),
    n AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
                 CAST(COUNT(*) AS BIGINT) AS n_types
          FROM c GROUP BY user_id)
    SELECT c.user_id, ANY_VALUE(n.n_types) AS n_types,
           ROUND(-SUM((c.c / CAST(n.n AS DOUBLE))
                      * ln(c.c / CAST(n.n AS DOUBLE))) + 0.0, 6) AS entropy
    FROM c JOIN n USING (user_id)
    GROUP BY c.user_id
    """,
)
def user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity feature bot detection leans on (scripted
    traffic is low-entropy, one or two event types on repeat; organic
    users spread). Plan: one (user, type) count aggregate, per-user
    totals as a second skinny aggregate joined back on the same user
    key (no second fact scan), one entropy fold — all shuffles keyed on
    user_id. ``+ 0.0`` canonicalizes IEEE −0.0 for single-type users on
    both engines."""
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    n = c.groupBy("user_id").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_types")
    )
    p = F.col("c") / F.col("n").cast("double")
    return (
        c.join(n, "user_id")
        .groupBy("user_id")
        .agg(
            F.any_value(F.col("n_types")).alias("n_types"),
            F.round(-F.sum(p * F.log(p)) + F.lit(0.0), 6).alias("entropy"),
        )
    )


@register(
    "lineitem_metrics_unpivot",
    """
    WITH m AS (
      -- CAST DOUBLE at unpivot: both engines then sum/average the same
      -- doubles even if a fixture regen narrows the measures to float32
      SELECT 'quantity' AS metric, CAST(l_quantity AS DOUBLE) AS value
      FROM lineitem
      UNION ALL
      SELECT 'extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
      UNION ALL
      SELECT 'discount', CAST(l_discount AS DOUBLE) FROM lineitem)
    SELECT metric, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS VARCHAR) AS total,
           ROUND(AVG(value), 6) AS mean
    FROM m GROUP BY metric
    """,
)
def lineitem_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide metric columns to long (metric, value) rows
    via ``stack`` — the reshape every metrics warehouse needs between
    storage layout and per-metric analysis, and the inverse surface of
    order_status_pivot. Map-only reshape (3× row fan-out, no shuffle)
    into one hash aggregate; money totals in DECIMAL(18,2) per the
    engine's exact-sum convention."""
    li = t(spark, sf_dir, "lineitem")
    # CAST DOUBLE at unpivot: both engines then sum/average the same
    # doubles even on a float32-narrowed fixture
    melted = li.select(
        F.expr(
            "stack(3, 'quantity', CAST(l_quantity AS DOUBLE), "
            "'extendedprice', CAST(l_extendedprice AS DOUBLE), "
            "'discount', CAST(l_discount AS DOUBLE)) AS (metric, value)"
        )
    )
    return melted.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .cast("string")
        .alias("total"),
        F.round(F.avg("value"), 6).alias("mean"),
    )


_EWMA_DECAY = 0.8
_EWMA_LAGS = 8


def _ewma_oracle() -> str:
    """DuckDB replica of user_value_ewma: the decay weights are Python
    repr literals embedded in BOTH the SQL and the Spark plan, so the
    two engines multiply by bit-identical doubles."""
    num = " + ".join(
        f"COALESCE(lag(value, {k}) OVER w * {_EWMA_DECAY**k!r}, 0.0)"
        for k in range(_EWMA_LAGS)
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {k}) OVER w IS NOT NULL THEN {_EWMA_DECAY**k!r} ELSE 0.0 END"
        for k in range(_EWMA_LAGS)
    )
    # ts IS NOT NULL + NULLIF (r13 nullhalf census): a null-time event
    # has no position in the lag window (opposite NULL orderings), and a
    # row whose 8-lag window holds no non-null value has weight 0 - the
    # bare division ANSI-aborts Spark-side where NULLIF yields NULL
    return f"""
    SELECT event_id, user_id,
           ROUND(({num}) / NULLIF(({den}), 0.0), 6) AS ewma
    -- CAST DOUBLE (r14 f32 census): lag(FLOAT) * decay-literal otherwise
    -- stays in DuckDB's float32 lane where Spark promotes to double
    FROM (SELECT event_id, user_id, ts, CAST(value AS DOUBLE) AS value
          FROM events WHERE ts IS NOT NULL)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@register("user_value_ewma", _ewma_oracle())
def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of event value per user
    (decay 0.8 over the last 8 events, weights renormalized over the
    lags that exist) — the recency-biased activity baseline that reacts
    faster than a flat rolling mean but still damps single spikes. A
    true infinite-history EWMA is a sequential recurrence no engine
    parallelizes; the 8-term truncation (weight tail 0.8⁸ ≈ 0.17 of
    mass, renormalized away) restates it as ONE user-keyed window with
    8 lag expressions — all JVM, one shuffle, and bit-portable because
    the decay powers enter both engines as identical repr literals."""
    # ts non-null + try_divide (r13 nullhalf census) - see the oracle note
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    den = None
    for k in range(_EWMA_LAGS):
        lagk = F.lag("value", k).over(w)
        wk = F.lit(_EWMA_DECAY**k)
        nk = F.coalesce(lagk * wk, F.lit(0.0))
        dk = F.when(lagk.isNotNull(), wk).otherwise(F.lit(0.0))
        num = nk if num is None else num + nk
        den = dk if den is None else den + dk
    return ev.select(
        "event_id", "user_id", F.round(F.try_divide(num, den), 6).alias("ewma")
    )
