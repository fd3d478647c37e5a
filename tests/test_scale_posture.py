"""Scale-posture assertions: partition pruning on gold tables, salting
equivalence, broadcast gating — the plans we'd need at 1000× the data."""

from pyspark.sql import functions as F

from dopams_etl_spark.operators.skew import salted_aggregate, salted_broadcast_left


def test_gold_partition_pruning(spark, tmp_path):
    """The 100 TB read-path guarantee on the flagship gold table
    (reference analog: `firs_mv.sql:5` keyed by registration year): a
    year-filtered read of firs_mv must prune `fir_year` partitions AT
    THE SCAN — the equality predicate lands in the scan's
    PartitionFilters, and only that year's files are listed."""
    from dopams_etl_spark.gold import refresh_gold

    out = str(tmp_path / "gold")
    refresh_gold(spark, "/root/testdata/sf0.001", out, ("firs_mv",))
    df = spark.read.parquet(f"{out}/firs_mv")
    years = sorted(r["fir_year"] for r in df.select("fir_year").distinct().collect())
    # pruning is only meaningful against multiple partitions
    assert len(years) >= 2, f"need >=2 fir_year partitions, got {years}"
    pruned = df.filter(F.col("fir_year") == years[0])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # pruning happens at the source: the year filter appears as a
    # PartitionFilter on the scan (isnotnull guard + the equality
    # itself), not as a post-scan Filter over all partitions
    assert "PartitionFilters: [isnotnull(fir_year" in plan
    assert f"(fir_year#" in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0], plan
    part_filters = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert f"= {years[0]})" in part_filters, part_filters
    # physical evidence: after execution the scan's runtime metrics show
    # exactly ONE partition read (inputFiles()/plan stats both list the
    # whole relation pre-pruning, so only the executed metric proves it)
    pruned.collect()
    scan = pruned._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    metrics = {}
    it = scan.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        metrics[kv._1()] = kv._2().value()
    assert metrics["numPartitions"] == 1, metrics


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Co-located join: both sides bucketed by the join key → the join
    plans with zero Exchange (the bucketing-for-co-location strategy big
    fact⋈fact joins need at 100 TB)."""
    from dopams_etl_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets")
    try:
        load_table(spark, "orders", sf).write.bucketBy(8, "o_orderkey").sortBy(
            "o_orderkey"
        ).mode("overwrite").saveAsTable("buckets.orders_b")
        load_table(spark, "lineitem", sf).withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable("buckets.lineitem_b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("buckets.lineitem_b").join(
            spark.table("buckets.orders_b"), "o_orderkey"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # bucketing co-locates
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS buckets.orders_b")
        spark.sql("DROP TABLE IF EXISTS buckets.lineitem_b")
        spark.sql("DROP DATABASE IF EXISTS buckets")


def test_salted_aggregate_equals_plain(spark):
    rows = [(i % 3, i % 7, float(i)) for i in range(500)]
    df = spark.createDataFrame(rows, "k int, m int, v double")
    plain = {
        (r["k"]): (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"])
        for r in salted_aggregate(
            df, "k", {"n": F.count(F.lit(1)), "s": F.sum("v")}, salt_buckets=8
        ).collect()
    }
    assert plain == salted


def test_salted_broadcast_left_equals_plain(spark):
    big = spark.createDataFrame([(i % 2, i) for i in range(200)], "k int, payload int")
    small = spark.createDataFrame([(0, "a"), (1, "b")], "k int, tag string")
    plain = sorted(map(tuple, big.join(small, "k").select("k", "payload", "tag").collect()))
    salted = sorted(
        map(tuple, salted_broadcast_left(big, small, "k").select("k", "payload", "tag").collect())
    )
    assert plain == salted


def test_compact_table_merges_small_files(spark, tmp_path):
    """Compaction: a fragmented table (one file per task per refresh)
    collapses to few right-sized files, data identical, partition
    directories preserved for pruning."""
    from pyspark.sql import functions as F

    from dopams_etl_spark.catalog import load_table
    from dopams_etl_spark.gold import compact_table

    path = str(tmp_path / "frag")
    orders = load_table(spark, "orders", "/root/testdata/sf0.001").withColumn(
        "yr", F.year("o_orderdate")
    )
    # simulate many tiny refresh outputs
    orders.repartition(40).write.partitionBy("yr").mode("overwrite").parquet(path)
    before_rows = spark.read.parquet(path).count()
    stats = compact_table(spark, path, target_file_bytes=8 * 1024 * 1024,
                          partition_cols=("yr",))
    assert stats["files_after"] < stats["files_before"] / 3
    after = spark.read.parquet(path)
    assert after.count() == before_rows == stats["rows"]
    # partition pruning still works on the compacted layout
    plan = after.filter(F.col("yr") == 1997)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(yr" in plan or "yr#" in plan


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Bucketed SMJ co-location: orders and lineitem written bucketed on
    the order key join + aggregate with ZERO Exchange nodes in the
    physical plan, and results equal the plain join."""
    from pyspark.sql import functions as F

    from dopams_etl_spark.catalog import load_table
    from dopams_etl_spark.operators.bucketing import bucketed_equijoin, write_bucketed

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, "orders", sf).select("o_orderkey")
    li = load_table(spark, "lineitem", sf).select("l_orderkey", "l_quantity")
    write_bucketed(orders, "t_b_orders", "o_orderkey", 4, str(tmp_path / "bo"))
    write_bucketed(li, "t_b_lineitem", "l_orderkey", 4, str(tmp_path / "bl"))
    joined = bucketed_equijoin(spark, "t_b_orders", "t_b_lineitem",
                               "o_orderkey", "l_orderkey")
    agg = joined.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # correctness: identical to the plain (shuffled) join
    plain = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, plain.collect()))


def test_q6_predicates_reach_parquet_scan(spark):
    """q6 is the scan-bound TPC-H query: its entire cost is the parquet
    read, so ALL three predicates (shipdate range, discount range,
    quantity bound) must appear as PushedFilters on the scan node and
    the read schema must carry only the referenced columns — the
    min/max row-group-pruning contract that does the heavy lifting at
    100 TB."""
    from dopams_etl_spark.plans.tpch import q6_forecast_revenue_delta

    df = q6_forecast_revenue_delta(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(
        block
        for block in plan.split("\n\n")
        if "PushedFilters" in block and "lineitem" in block
    )
    pushed = scan.split("PushedFilters:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed to the scan: {pushed}"
    read_schema = scan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_orderkey", "l_partkey", "l_returnflag"):
        assert col not in read_schema, (
            f"unreferenced column {col} survives pruning: {read_schema}"
        )
