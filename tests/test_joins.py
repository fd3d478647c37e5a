from pyspark.sql import functions as F

from dopams_etl_spark.operators.joins import (
    anti_join,
    fuzzy_join_levenshtein,
    latest_per_key,
    semi_join,
    soundex_blocked_candidates,
    top1_by_score,
)


def test_semi_anti_partition(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    right = spark.createDataFrame([(2,), (3,), (4,)], ["k"])
    assert {r["k"] for r in semi_join(left, right, "k").collect()} == {2, 3}
    assert {r["k"] for r in anti_join(left, right, "k").collect()} == {1}


def test_latest_per_key_ties_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-02", "a"), (1, "2024-01-02", "b"), (1, "2024-01-01", "c"), (2, None, "d")],
        ["k", "ts", "v"],
    )
    out = {r["k"]: r["v"] for r in latest_per_key(df, "k", "ts", tiebreak="v").collect()}
    assert out == {1: "a", 2: "d"}  # tie at max ts broken by v asc; null-only group kept


def test_top1_by_score(spark):
    df = spark.createDataFrame([(1, 0.5, "x"), (1, 0.9, "y"), (2, 0.1, "z")], ["k", "s", "v"])
    out = {r["k"]: r["v"] for r in top1_by_score(df, ["k"], "s").collect()}
    assert out == {1: "y", 2: "z"}


def test_fuzzy_join_keeps_duplicate_probe_values(spark):
    # advisor's regression fixture: two probes sharing the value 'john'
    probe = spark.createDataFrame([(1, "john"), (2, "john"), (3, "mary")], ["pid", "name"])
    dim = spark.createDataFrame([("jon",), ("marie",)], ["dname"])
    out = fuzzy_join_levenshtein(probe, dim, "name", "dname", max_distance=2, block=None)
    assert sorted(r["pid"] for r in out.collect()) == [1, 2, 3]


def test_fuzzy_join_blocking_prunes_candidates(spark):
    probe = spark.createDataFrame([(1, "delta")], ["pid", "name"])
    dim = spark.createDataFrame([("delte",), ("belta",)], ["dname"])
    # both within distance 1, but prefix1 block keeps only the d-candidate
    out = fuzzy_join_levenshtein(
        probe, dim, "name", "dname", max_distance=2, keep_best=False, block="prefix1"
    )
    assert {r["dname"] for r in out.collect()} == {"delte"}


def test_soundex_blocking_pairs_within_block_only(spark):
    left = spark.createDataFrame([(1, "smith"), (2, "smyth"), (3, "jones")], ["id_a", "name_a"])
    right = spark.createDataFrame([(4, "smithe"), (5, "jonas")], ["id_b", "name_b"])
    pairs = {
        (r["id_a"], r["id_b"])
        for r in soundex_blocked_candidates(left, right, "name_a", "name_b").collect()
    }
    assert (1, 4) in pairs and (2, 4) in pairs
    assert (3, 4) not in pairs  # jones never compared against the smith block


def test_asof_join_inclusive_and_ties(spark):
    """Edge semantics: equal-ts right row IS visible (inclusive); among
    equal-ts right rows the greatest carry value wins; left rows before any
    right row get null."""
    from dopams_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 50, "p0"), (2, 10, "p2")], "k long, t long, pid string"
    ).select("k", F.to_timestamp(F.from_unixtime("t")).alias("t"), "pid")
    right = spark.createDataFrame(
        [(1, 100, 7), (1, 100, 9), (1, 60, 5), (2, 99, 1)], "k long, t long, rid int"
    ).select("k", F.to_timestamp(F.from_unixtime("t")).alias("t"), "rid")
    out = {
        r["pid"]: r["asof_rid"]
        for r in asof_join(left, right, "k", "t", "t", ["rid"]).collect()
    }
    assert out == {"p1": 9, "p0": None, "p2": None}


def test_range_join_bucket_boundaries(spark):
    """Rows exactly at interval start (included), end (excluded), and in
    the next bucket but inside the window (the b+1 probe) all behave."""
    from dopams_etl_spark.operators.joins import range_join_bucketed

    left = spark.createDataFrame([(1, 1000, "L")], "k long, t long, id string").select(
        "k", F.to_timestamp(F.from_unixtime("t")).alias("lt"), F.col("id").alias("lid")
    )
    right = spark.createDataFrame(
        [(1, 1000, "start"), (1, 1059, "in"), (1, 1060, "end"), (1, 999, "before")],
        "k long, t long, id string",
    ).select("k", F.to_timestamp(F.from_unixtime("t")).alias("rt"), F.col("id").alias("rid"))
    got = {
        r["rid"]
        for r in range_join_bucketed(left, right, "k", "lt", "rt", 60).collect()
    }
    assert got == {"start", "in"}
