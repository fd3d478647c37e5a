"""Property tests (hypothesis): the scale-safe as-of and bucketed range
join rewrites must match a brute-force per-row reference on arbitrary
small inputs — ties, equal timestamps, empty sides, bucket boundaries."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dopams_etl_spark.operators.joins import asof_join, range_join_bucketed

# (key, epoch-second, id) triples; tight ranges force key/ts collisions
row = st.tuples(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=200),
    st.integers(min_value=1, max_value=10_000),
)


def _df(spark, rows, ts_name, id_name):
    return spark.createDataFrame(
        [(k, t, i) for k, t, i in rows], f"k long, __e long, {id_name} long"
    ).select("k", F.to_timestamp(F.from_unixtime("__e")).alias(ts_name), id_name, F.col("__e"))


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(row, max_size=12, unique_by=lambda r: r[2]),
       st.lists(row, max_size=12, unique_by=lambda r: r[2]))
def test_asof_join_matches_bruteforce(spark_global, lrows, rrows):
    spark = spark_global
    left = _df(spark, lrows, "lt", "lid").drop("__e")
    right = _df(spark, rrows, "rt", "rid").drop("__e")
    got = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(left, right, "k", "lt", "rt", ["rid"]).collect()
    }
    want = {}
    for lk, lt_, lid in lrows:
        cands = [(t, i) for rk, t, i in rrows if rk == lk and t <= lt_]
        want[lid] = max(cands)[1] if cands else None
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(row, max_size=12, unique_by=lambda r: r[2]),
       st.lists(row, max_size=12, unique_by=lambda r: r[2]),
       st.integers(min_value=1, max_value=60))
def test_range_join_matches_bruteforce(spark_global, lrows, rrows, window):
    spark = spark_global
    left = _df(spark, lrows, "lt", "lid").drop("__e")
    right = _df(spark, rrows, "rt", "rid").drop("__e")
    got = {
        (r["lid"], r["rid"])
        for r in range_join_bucketed(left, right, "k", "lt", "rt", window).collect()
    }
    want = {
        (lid, rid)
        for lk, lt_, lid in lrows
        for rk, rt_, rid in rrows
        if lk == rk and lt_ <= rt_ < lt_ + window
    }
    assert got == want
