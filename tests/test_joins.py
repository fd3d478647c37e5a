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
