from __future__ import annotations

from pyspark.sql import functions as F

from dopams_etl_spark.caching import _CACHE, clear_bounded_cache, persist_bounded


def _frame(spark, n):
    return spark.range(n).select(F.col("id"), (F.col("id") * 2).alias("v"))


def test_repeat_call_reuses_persisted_frame(spark):
    clear_bounded_cache()
    a = persist_bounded(_frame(spark, 10))
    b = persist_bounded(_frame(spark, 10))  # same semantics, new object
    assert a is b  # one cache entry, not two references to one storage slot
    assert len(_CACHE) == 1
    clear_bounded_cache()


def test_eviction_is_bounded_and_oldest_first(spark):
    clear_bounded_cache()
    frames = [persist_bounded(_frame(spark, 10 + i), cap=2) for i in range(3)]
    assert len(_CACHE) == 2
    assert frames[0].storageLevel.useMemory is False  # evicted → unpersisted
    assert frames[2].storageLevel.useMemory is True
    # evicted frame still computes correctly (lineage intact, just uncached)
    assert frames[0].count() == 10
    clear_bounded_cache()
    assert len(_CACHE) == 0
    assert frames[2].storageLevel.useMemory is False


def test_lsh_pairs_do_not_accumulate_storage(spark):
    from dopams_etl_spark.operators.dedup import lsh_candidate_pairs

    clear_bounded_cache()
    df = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " + str(i % 3)) for i in range(12)],
        ["id", "text"],
    )
    for _ in range(4):
        lsh_candidate_pairs(df, "id", "text", num_hashes=8, bands=4).count()
    # four invocations, identical plan → exactly one tracked intermediate
    assert len(_CACHE) == 1
    clear_bounded_cache()
