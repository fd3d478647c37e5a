from pyspark.sql import functions as F

from dopams_etl_spark.operators.merge import classify_merge, smart_merge, upsert_latest_wins


def test_upsert_latest_wins_incoming_wins_ties(spark):
    existing = spark.createDataFrame([(1, 10, "old"), (2, 10, "keep")], ["k", "v", "tag"])
    incoming = spark.createDataFrame([(1, 10, "new"), (3, 5, "ins")], ["k", "v", "tag"])
    out = {r["k"]: r["tag"] for r in upsert_latest_wins(existing, incoming, "k", "v").collect()}
    assert out == {1: "new", 2: "keep", 3: "ins"}


def test_upsert_newer_existing_survives(spark):
    existing = spark.createDataFrame([(1, 20, "old")], ["k", "v", "tag"])
    incoming = spark.createDataFrame([(1, 10, "stale")], ["k", "v", "tag"])
    assert upsert_latest_wins(existing, incoming, "k", "v").collect()[0]["tag"] == "old"


def test_smart_merge_field_matrix(spark):
    existing = spark.createDataFrame(
        [(1, "a", 1.0, "d1"), (2, "b", 2.0, "d2")], ["k", "name", "bal", "dt"]
    )
    incoming = spark.createDataFrame(
        [(1, None, 9.0, None), (3, "c", None, "d3")], ["k", "name", "bal", "dt"]
    )
    rows = {r["k"]: r for r in smart_merge(existing, incoming, "k", always_take_new=("dt",)).collect()}
    assert rows[1]["name"] == "a"       # new null never overwrites old non-null
    assert rows[1]["bal"] == 9.0        # new non-null wins
    assert rows[1]["dt"] is None        # always_take_new: batch authoritative even when null
    assert rows[2]["dt"] == "d2"        # untouched row keeps everything
    assert rows[3]["name"] == "c"       # pure insert


def test_classify_merge_stats(spark):
    existing = spark.createDataFrame([(1, 10), (2, 20)], ["k", "v"])
    incoming = spark.createDataFrame([(1, 10), (2, 99), (3, 30)], ["k", "v"])
    out = {r["k"]: r["merge_op"] for r in classify_merge(existing, incoming, "k", ["v"]).collect()}
    assert out == {1: "no_change", 2: "updated", 3: "inserted"}


def test_classify_merge_null_safe(spark):
    existing = spark.createDataFrame([(1, None)], "k int, v int")
    incoming = spark.createDataFrame([(1, None)], "k int, v int")
    assert classify_merge(existing, incoming, "k", ["v"]).collect()[0]["merge_op"] == "no_change"


def test_snapshot_diff_classification(spark):
    """snapshot_diff: inserted/deleted/updated classification with
    null-safe value compares; unchanged rows excluded."""
    from dopams_etl_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(1, "a"),          # unchanged -> excluded
         (2, "B"),          # updated
         (3, "c"),          # null -> value = updated
         (5, None)],        # inserted (4 deleted)
        ["k", "v"],
    )
    got = {r["k"]: r["change_type"]
           for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {2: "updated", 3: "updated", 4: "deleted", 5: "inserted"}


def test_apply_changelog_semantics(spark):
    from dopams_etl_spark.operators.merge import apply_changelog

    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    changes = spark.createDataFrame(
        [
            (1, "a1", 1, "U"), (1, "a2", 2, "U"),   # seq 2 wins
            (2, None, 1, "D"),                        # tombstone removes
            (4, "d", 1, "I"),                         # brand-new key
            (5, "e", 1, "I"), (5, None, 2, "D"),      # inserted then deleted
        ],
        ["k", "v", "seq", "op"],
    )
    out = {r["k"]: r["v"] for r in apply_changelog(base, changes, "k", "seq").collect()}
    assert out == {1: "a2", 3: "c", 4: "d"}

    import pytest
    from pyspark.errors import PySparkException

    # Validation is lazy (raise_error inside the plan — no eager changelog
    # scan at plan-build time): building the plan succeeds, the first
    # action surfaces the bad op.
    bad = spark.createDataFrame([(1, "x", 1, "UPSERT")], ["k", "v", "seq", "op"])
    plan = apply_changelog(base, bad, "k", "seq")
    with pytest.raises(PySparkException, match="unknown changelog op"):
        plan.collect()


def test_apply_changelog_seq_tie_deterministic(spark):
    from dopams_etl_spark.operators.merge import apply_changelog

    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    # Equal seq: op descending breaks the tie, so U outranks D — the
    # update survives regardless of partitioning or input order.
    changes = spark.createDataFrame(
        [(1, None, 1, "D"), (1, "u", 1, "U")], ["k", "v", "seq", "op"]
    )
    out = {r["k"]: r["v"] for r in apply_changelog(base, changes, "k", "seq").collect()}
    assert out == {1: "u"}
