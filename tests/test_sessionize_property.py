"""Property tests (hypothesis): the SHARED sessionization contract —
``operators/sessionize.py:with_session_num`` and its SQL twin
``plans/catalog.py:session_ctes`` — must agree row-for-row on ARBITRARY
event streams, not just the fixed testdata. Randomized inputs sweep
what the corpora can't: same-timestamp ties (the (ts, event_id)
tie-break), gaps landing exactly ON the 1800 s threshold, NULL
timestamps (dropped identically on both engines — their default NULL
orderings differ), and single-event users. The structural invariants
(gap law, monotone numbering, partition invariance) are asserted on the
Spark side independently of the parity check."""

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dopams_etl_spark.operators.sessionize import (
    SESSION_GAP_SECONDS,
    with_session_num,
)
from dopams_etl_spark.plans.catalog import session_ctes

# (user, second-offset-or-None, event_id): tight user/second ranges force
# same-user collisions, exact-threshold gaps, and same-ts ties; offsets
# are scaled so both sub-threshold and super-threshold gaps occur
event = st.tuples(
    st.integers(min_value=1, max_value=3),
    st.one_of(st.none(), st.integers(min_value=0, max_value=8)),
    st.integers(min_value=1, max_value=10_000),
)

BASE = pd.Timestamp("2024-03-01 00:00:00")


def _frame(rows):
    # scale offsets by 900 s so consecutive values straddle the 1800 s
    # threshold (0, 900, 1800, 2700, ...), including the exact boundary
    uniq = {}
    for u, off, eid in rows:
        uniq[eid] = (u, off)  # event_id must be unique: last wins
    recs = [
        (
            u,
            None if off is None else BASE + pd.Timedelta(seconds=900 * off),
            eid,
        )
        for eid, (u, off) in uniq.items()
    ]
    pdf = pd.DataFrame(recs, columns=["user_id", "ts", "event_id"])
    # force the dtype even when every ts is NaT: an object column of
    # NaTs registers as DuckDB's untyped NULL and date_diff can't bind
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf["user_id"] = pdf["user_id"].astype("int64")
    pdf["event_id"] = pdf["event_id"].astype("int64")
    return pdf


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(event, min_size=1, max_size=40))
def test_sessionize_spark_duckdb_parity_and_invariants(spark, rows):
    pdf = _frame(rows)
    sdf = spark.createDataFrame(
        pdf, "user_id long, ts timestamp, event_id long"
    )
    got = (
        with_session_num(sdf)
        .select("user_id", "ts", "event_id", "session_num")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )

    # SQL twin on the identical frame
    con = duckdb.connect()
    con.register("events_pd", pdf)
    con.execute("CREATE VIEW events AS SELECT * FROM events_pd")
    want = (
        con.execute(
            "WITH "
            + session_ctes()
            + " SELECT user_id, ts, event_id, session_num FROM s"
        )
        .df()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["user_id"].values == want["user_id"].values).all()
    assert (got["event_id"].values == want["event_id"].values).all()
    assert (
        got["session_num"].astype("int64").values
        == want["session_num"].astype("int64").values
    ).all()

    # structural invariants, Spark side
    assert got["ts"].notna().all()  # NULL ts dropped
    for _, g in got.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        nums = g["session_num"].tolist()
        assert nums[0] == 1
        gaps = g["ts"].diff().dt.total_seconds().fillna(0.0).tolist()
        for i in range(1, len(nums)):
            if gaps[i] > SESSION_GAP_SECONDS:
                assert nums[i] == nums[i - 1] + 1  # new session
            else:
                assert nums[i] == nums[i - 1]  # same session (<= incl.)

    # partition invariance: a 7-way repartition yields the same map
    re = (
        with_session_num(sdf.repartition(7))
        .select("user_id", "ts", "event_id", "session_num")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    assert (
        re["session_num"].astype("int64").values
        == got["session_num"].astype("int64").values
    ).all()


cohort_case = st.tuples(
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz-0123456789",
        min_size=1,
        max_size=12,
    ),
    st.lists(
        st.integers(min_value=0, max_value=10**12),
        min_size=1,
        max_size=30,
        unique=True,
    ),
    st.integers(min_value=2, max_value=10),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(cohort_case)
def test_md5_cohort_spark_duckdb_parity(spark, case):
    """The md5_cohort / md5_cohort_sql pair must assign identical
    cohorts for arbitrary salts, keys, and moduli — and be roughly
    balanced (every cohort id in range)."""
    from dopams_etl_spark.functions.ids import md5_cohort
    from dopams_etl_spark.plans.catalog import md5_cohort_sql

    salt, keys, mod = case
    pdf = pd.DataFrame({"user_id": pd.Series(keys, dtype="int64")})
    sdf = spark.createDataFrame(pdf, "user_id long")
    got = (
        sdf.select("user_id", md5_cohort(salt, "user_id", mod).alias("g"))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = (
        con.execute(
            f"SELECT user_id, {md5_cohort_sql(salt, 'user_id', mod)} AS g"
            " FROM t ORDER BY user_id"
        )
        .df()
        .reset_index(drop=True)
    )
    assert (got["g"].astype("int64").values
            == want["g"].astype("int64").values).all()
    assert got["g"].between(0, mod - 1).all()

bucket_case = st.lists(
    st.one_of(
        st.integers(min_value=-(10**12), max_value=10**12),
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz|:-0123456789",
            min_size=0,
            max_size=20,
        ),
    ),
    min_size=1,
    max_size=30,
    unique=True,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(bucket_case)
def test_md5_bucket32_spark_duckdb_parity(spark, keys):
    """The md5_bucket32 / md5_bucket32_sql pair — the primitive every
    split/cohort/fold/replicate assignment derives from — must yield
    the identical 32-bit value for arbitrary int AND string keys
    (including empty strings and ':'/'|' separators), always within
    [0, 2^32), matching Python's reference md5."""
    import hashlib

    from pyspark.sql import functions as F

    from dopams_etl_spark.functions.ids import md5_bucket32
    from dopams_etl_spark.plans.catalog import md5_bucket32_sql

    svals = [str(k) for k in keys]
    pdf = pd.DataFrame({"k": pd.Series(svals, dtype="object")})
    sdf = spark.createDataFrame(pdf, "k string")
    got = (
        sdf.select("k", md5_bucket32(F.col("k")).alias("v"))
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = (
        con.execute(
            f"SELECT k, {md5_bucket32_sql('k')} AS v FROM t ORDER BY k"
        )
        .df()
        .reset_index(drop=True)
    )
    ref = {
        s: int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in svals
    }
    assert (got["v"].astype("int64").values
            == want["v"].astype("int64").values).all()
    assert got.set_index("k")["v"].astype("int64").to_dict() == ref
    assert got["v"].between(0, (1 << 32) - 1).all()
