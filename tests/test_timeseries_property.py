"""Property tests (hypothesis): the one-window time-series operators in
``operators/timeseries.py`` must match brute-force per-key references on
arbitrary small inputs — ties on the timestamp, same-timestamp bursts,
single-event keys, zero gaps."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dopams_etl_spark.operators.timeseries import (
    ohlc_bars,
    throttle_events,
    time_weighted_avg,
)

# (key, epoch-second, id, value) — tight ranges force ts collisions
row = st.tuples(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=120),
    st.integers(min_value=1, max_value=10_000),
    st.integers(min_value=-5, max_value=5),
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k long, e long, id long, v long"
    ).select(
        "k",
        F.to_timestamp(F.from_unixtime("e")).alias("ts"),
        "id",
        F.col("v").cast("double").alias("v"),
        "e",
    )


def _ordered(rows):
    by_key: dict[int, list] = {}
    for k, e, i, v in rows:
        by_key.setdefault(k, []).append((e, i, v))
    return {k: sorted(vs) for k, vs in by_key.items()}


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(row, max_size=14, unique_by=lambda r: r[2]),
       st.integers(min_value=0, max_value=30))
def test_throttle_matches_bruteforce(spark_global, rows, gap_s):
    got = {
        r["id"]: r["kept"]
        for r in throttle_events(
            _df(spark_global, rows).drop("e"), ["k"], "ts", "id", gap_s * 1_000_000
        ).collect()
    }
    want = {}
    for _, vs in _ordered(rows).items():
        prev = None
        for e, i, _v in vs:
            want[i] = prev is None or (e - prev) * 1_000_000 > gap_s * 1_000_000
            prev = e  # predecessor EVENT, kept or not
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(row, max_size=14, unique_by=lambda r: r[2]))
def test_twap_matches_bruteforce(spark_global, rows):
    got = {
        r["k"]: (r["n_intervals"], round(r["twap"], 9))
        for r in time_weighted_avg(
            _df(spark_global, rows).drop("e"), ["k"], "ts", "id", "v"
        ).collect()
    }
    want = {}
    for k, vs in _ordered(rows).items():
        num = den = 0.0
        n = 0
        for (e, _i, v), (e2, _i2, _v2) in zip(vs, vs[1:]):
            dur = (e2 - e) * 1_000_000
            if dur > 0:
                num += v * dur
                den += dur
                n += 1
        if n:
            want[k] = (n, round(num / den, 9))
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(row, min_size=1, max_size=14, unique_by=lambda r: r[2]))
def test_ohlc_matches_bruteforce(spark_global, rows):
    got = {
        r["k"]: (r["n_events"], r["open"], r["high"], r["low"], r["close"])
        for r in ohlc_bars(
            _df(spark_global, rows).drop("e"), ["k"], "ts", "id", "v"
        ).collect()
    }
    want = {}
    for k, vs in _ordered(rows).items():
        vals = [v for _e, _i, v in vs]
        want[k] = (len(vs), float(vals[0]), float(max(vals)),
                   float(min(vals)), float(vals[-1]))
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=40),
              st.integers(min_value=0, max_value=20)),
    min_size=1, max_size=14))
def test_interval_depth_matches_bruteforce(spark_global, raw):
    """Sweep-line depth == per-day brute-force stab count (open <= d <=
    close, inclusive), for arbitrary overlapping/degenerate spans."""
    import datetime

    from dopams_etl_spark.operators.timeseries import interval_depth_daily

    base = datetime.date(2024, 1, 1)
    spans = [(base + datetime.timedelta(days=o), base + datetime.timedelta(days=o + dur))
             for o, dur in raw]
    df = spark_global.createDataFrame(spans, "open_d date, close_d date")
    got = {
        r["d"]: r["open_count"]
        for r in interval_depth_daily(df, "open_d", "close_d").collect()
    }
    lo = min(o for o, _c in spans)
    hi = max(c for _o, c in spans)
    d = lo
    while d <= hi + datetime.timedelta(days=1):
        want = sum(1 for o, c in spans if o <= d <= c)
        # only days present in the delta output carry a row; absent days
        # inherit the previous running depth, so assert on emitted days
        if d in got:
            assert got[d] == want, (d, got[d], want)
        d += datetime.timedelta(days=1)
    # conservation: last emitted day is one past the max close, depth 0
    assert got[max(got)] == 0
