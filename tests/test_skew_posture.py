"""Skew posture (r16, VERDICT item 7 / guide §2.5).

The engine's skew story has three layers; this file pins each one on a
skewed-key fixture (one hot key owning ~10% of all rows — the "one
customer with 10% of lineitems" shape the uniform TPC-H testdata never
exercises):

1. Round-robin spreads (``ensure_parallelism`` with no key) balance rows
   EVENLY regardless of key skew — the hot key cannot serialize a
   map-only stage.
2. Keyed spreads (``ensure_parallelism(df, k)``) colocate each key on
   purpose (the downstream groupBy needs it); the hot KEY's rows land
   together by design, but the exchange is the same one the aggregate
   would pay anyway (no extra exchange in the plan), and per-key work
   above it still leaves the single scan task.
3. Joins on skewed keys stay correct, and the session ships with AQE
   skew-join splitting enabled — at the 256 MB/5x-median thresholds it
   fires on real-scale partitions, not on test fixtures, so what is
   assertable here is the posture (config) plus correctness under skew.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    """200k rows, key 1 owns ~10%, the rest spread over 10k keys; built
    as ONE partition to model the single-row-group parquet scan."""
    n = 200_000
    df = (
        spark.range(n)
        .coalesce(1)
        .select(
            F.when(F.col("id") % 10 == 0, F.lit(1))
            .otherwise((F.col("id") % 9973) + 2)
            .alias("k"),
            (F.col("id") * 7 % 1000).alias("v"),
        )
    )
    assert df.rdd.getNumPartitions() == 1
    return df


def test_round_robin_spread_balances_hot_key(spark, skewed):
    from dopams_etl_spark.partitioning import ensure_parallelism

    spread = ensure_parallelism(skewed)
    sizes = [
        r["n"]
        for r in spread.select(F.spark_partition_id().alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    target = spark.sparkContext.defaultParallelism
    assert len(sizes) == target
    # round-robin ignores the key entirely: even the 10%-hot-key fixture
    # splits evenly (max within 2x of the mean is generous; round robin
    # is near-exact)
    assert max(sizes) <= 2 * (sum(sizes) / len(sizes))


def test_keyed_spread_adds_no_exchange_beyond_the_groupby(spark, skewed):
    from dopams_etl_spark.partitioning import ensure_parallelism

    plain = skewed.groupBy("k").agg(F.sum("v").alias("s"))
    spread = ensure_parallelism(skewed, "k").groupBy("k").agg(F.sum("v").alias("s"))
    n_plain = plain._jdf.queryExecution().executedPlan().toString().count("Exchange")
    n_spread = spread._jdf.queryExecution().executedPlan().toString().count("Exchange")
    # the ONE-partition input satisfies any clustering, so the plain
    # aggregate plans ZERO exchanges and the whole pipeline serializes
    # on a single task — exactly the trap ensure_parallelism exists for;
    # the keyed spread adds exactly one exchange which the groupBy then
    # reuses (never repartition + aggregate exchange stacked)
    assert n_plain == 0
    assert n_spread == 1
    # and the results are the exchange-invariant aggregate
    assert sorted(map(tuple, spread.collect())) == sorted(map(tuple, plain.collect()))


def test_skewed_join_correct_and_skew_posture_enabled(spark, skewed):
    conf = spark.conf
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    dim = spark.range(10_000).select(
        (F.col("id") + 1).alias("k"), (F.col("id") % 7).alias("grp")
    )
    joined = (
        skewed.join(dim, "k")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r["grp"]: r["n"] for r in joined.collect()}
    # hot key 1 -> grp 0 carries the 10% block on top of its uniform share
    assert sum(got.values()) == 200_000
    assert got[0] > max(v for g, v in got.items() if g != 0)


def test_partition_probe_memoizes_per_plan(spark, skewed):
    from dopams_etl_spark.partitioning import _NPART_CACHE, probed_num_partitions

    _NPART_CACHE.clear()
    assert probed_num_partitions(skewed) == 1
    assert len(_NPART_CACHE) == 1
    # semantically identical plan -> cache hit, no second RDD conversion
    again = skewed.sparkSession.range(10)  # unrelated df must not collide
    assert probed_num_partitions(skewed) == 1
    assert len(_NPART_CACHE) == 1
    assert probed_num_partitions(again.select((F.col("id") + 1).alias("x"))) >= 1
    assert len(_NPART_CACHE) == 2
