import pytest
from pyspark.sql import functions as F

from dopams_etl_spark.operators.incremental_agg import (
    agg_state,
    finalize_state,
    merge_states,
)

MEASURES = {
    "total": ("sum", "v"),
    "mean": ("avg", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
    "n": ("count", None),
    "nd": ("approx_distinct", "v"),
}


def _rows(df):
    return {
        r["k"]: (r["total"], round(r["mean"], 9), r["lo"], r["hi"], r["n"], r["nd"])
        for r in df.collect()
    }


def test_merged_state_equals_full_rebuild(spark):
    data = [(i % 3, float(i)) for i in range(30)]
    df = spark.createDataFrame(data, ["k", "v"])
    full = finalize_state(agg_state(df, ["k"], MEASURES), ["k"], MEASURES)

    a = df.filter(F.col("v") < 11)
    b = df.filter(F.col("v") >= 11)
    merged = finalize_state(
        merge_states(agg_state(a, ["k"], MEASURES), agg_state(b, ["k"], MEASURES), ["k"], MEASURES),
        ["k"],
        MEASURES,
    )
    assert _rows(merged) == _rows(full)


def test_merge_is_associative_and_handles_disjoint_keys(spark):
    # three deltas, grouped two ways; delta c carries keys a/b never saw
    a = spark.createDataFrame([(1, 2.0), (1, 4.0)], ["k", "v"])
    b = spark.createDataFrame([(1, 6.0), (2, 1.0)], ["k", "v"])
    c = spark.createDataFrame([(3, 9.0)], ["k", "v"])
    sa, sb, sc = (agg_state(x, ["k"], MEASURES) for x in (a, b, c))
    left = merge_states(merge_states(sa, sb, ["k"], MEASURES), sc, ["k"], MEASURES)
    right = merge_states(sa, merge_states(sb, sc, ["k"], MEASURES), ["k"], MEASURES)
    l, r = (
        _rows(finalize_state(s, ["k"], MEASURES)) for s in (left, right)
    )
    assert l == r
    assert l[3] == (9.0, 9.0, 9.0, 9.0, 1, 1)
    # sketch union counts each distinct value once across deltas (key 1
    # sees 2.0/4.0/6.0 in two different deltas)
    assert l[1][5] == 3
    # exact avg through the merge: (2+4+6)/3, not avg-of-avgs (3+6)/2
    assert l[1][1] == 4.0


def test_non_mergeable_measure_raises(spark):
    df = spark.createDataFrame([(1, 1.0)], ["k", "v"])
    with pytest.raises(ValueError, match="not mergeable"):
        agg_state(df, ["k"], {"d": ("count_distinct", "v")})
