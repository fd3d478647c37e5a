"""Property tests (hypothesis): the sequential-fold operators backed by
RECURSIVE-CTE oracles (capped_running_balance, holt_linear_daily) must
hash-match DuckDB on ARBITRARY small order tables — not just the fixed
testdata. Randomized inputs sweep the conventions the fixed corpora
can't: single-order customers, all-debit histories pinned to the floor,
same-day orderkey tie-breaks, single-day and empty series, and float
accumulation over adversarial cent values."""

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dopams_etl_spark.plans import catalog
from tools.check import compare
from tests.test_stats_invariants import _duck, _oracle

# (custkey, day-offset, orderkey, status-idx, price-cents); tight key and
# day ranges force same-customer and same-day collisions
order = st.tuples(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=40),
    st.integers(min_value=1, max_value=5000),
    st.integers(min_value=0, max_value=2),
    st.integers(min_value=1, max_value=100_000),
)

_SCHEMA = (
    "o_custkey long, o_orderkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate string, o_orderpriority string"
)


def _write_orders(spark, rows):
    # day offsets applied via date_add so dates stay well-formed
    df = spark.createDataFrame(
        [
            (ck, okey, "OFP"[s], cents / 100.0, day, "1-URGENT")
            for ck, day, okey, s, cents in rows
        ],
        "o_custkey long, o_orderkey long, o_orderstatus string, "
        "o_totalprice double, day_off int, o_orderpriority string",
    ).select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_add(F.lit("1995-01-01").cast("date"), F.col("day_off")).alias(
            "o_orderdate"
        ),
        "o_orderpriority",
    )
    tmp = tempfile.mkdtemp(prefix="fold_prop_")
    df.write.parquet(f"{tmp}/orders.parquet")
    return tmp


def _roundtrip(spark, name, rows):
    tmp = _write_orders(spark, rows)
    try:
        got = catalog.queries()[name](spark, tmp)
        want = _duck(_oracle(name), {"orders": f"{tmp}/orders.parquet"})
        return compare(name, got, want)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(st.lists(order, max_size=14, unique_by=lambda r: r[2]))
def test_capped_balance_matches_recursive_cte(spark_global, rows):
    verdict = _roundtrip(spark_global, "capped_running_balance", rows)
    assert verdict.startswith("PASS"), f"{rows}: {verdict}"


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(st.lists(order, max_size=14, unique_by=lambda r: r[2]))
def test_holt_matches_recursive_cte(spark_global, rows):
    verdict = _roundtrip(spark_global, "holt_linear_daily", rows)
    assert verdict.startswith("PASS"), f"{rows}: {verdict}"


li_row = st.tuples(
    st.integers(min_value=0, max_value=2),      # flag index
    st.integers(min_value=-50_000, max_value=50_000),  # price cents
)


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(st.lists(li_row, min_size=1, max_size=25))
def test_grouped_median_matches_native_median(spark_global, rows):
    """grouped_median_via_counts vs DuckDB's NATIVE MEDIAN() — unlike
    the registered oracle (which states the same counts construction),
    MEDIAN is a fully independent implementation, so this is the
    semantic check that the k-th-element-on-counts rewrite IS the
    median: odd/even group sizes, heavy ties, negative values, and
    single-row groups, on arbitrary inputs."""
    spark = spark_global
    df = spark.createDataFrame(
        [( "ANR"[f], cents / 100.0) for f, cents in rows],
        "l_returnflag string, l_extendedprice double",
    )
    tmp = tempfile.mkdtemp(prefix="median_prop_")
    try:
        df.write.parquet(f"{tmp}/lineitem.parquet")
        got = catalog.queries()["grouped_median_via_counts"](spark, tmp)
        want = _duck(
            """
            SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                   MEDIAN(l_extendedprice) AS median_price
            FROM lineitem GROUP BY 1
            """,
            {"lineitem": f"{tmp}/lineitem.parquet"},
        )
        verdict = compare("grouped_median_vs_native", got, want)
        assert verdict.startswith("PASS"), f"{rows}: {verdict}"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


sp_row = st.tuples(
    st.integers(min_value=0, max_value=1),   # flag index
    st.integers(min_value=1, max_value=6),   # quantity (heavy ties)
    st.integers(min_value=0, max_value=4),   # discount bucket (heavy ties)
)


def _avg_ranks(vals):
    """Average tied ranks (1-based), the textbook Spearman convention."""
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[order[k]] = avg
        i = j
    return ranks


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(st.lists(sp_row, min_size=2, max_size=30))
def test_spearman_rank_compression_is_spearman(spark_global, rows):
    """The grouped-counts rank compression must equal textbook Spearman
    (average tied ranks + Pearson) computed row-by-row in plain Python
    — an implementation the two engines do NOT share, so a formula bug
    common to the query and its oracle cannot hide here."""
    import math

    spark = spark_global
    df = spark.createDataFrame(
        [("AB"[f], float(q), b / 20.0) for f, q, b in rows],
        "l_returnflag string, l_quantity double, l_discount double",
    )
    tmp = tempfile.mkdtemp(prefix="spear_prop_")
    try:
        df.write.parquet(f"{tmp}/lineitem.parquet")
        got = {
            r["l_returnflag"]: r["spearman"]
            for r in catalog.queries()["spearman_qty_discount_by_flag"](
                spark, tmp
            ).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    by_flag: dict = {}
    for f, q, b in rows:
        by_flag.setdefault("AB"[f], []).append((float(q), b / 20.0))
    for flag, pairs in by_flag.items():
        rq = _avg_ranks([p[0] for p in pairs])
        rd = _avg_ranks([p[1] for p in pairs])
        n = len(pairs)
        mq, md = sum(rq) / n, sum(rd) / n
        cov = sum((a - mq) * (b - md) for a, b in zip(rq, rd))
        vq = sum((a - mq) ** 2 for a in rq)
        vd = sum((b - md) ** 2 for b in rd)
        want = cov / math.sqrt(vq * vd) if vq > 0 and vd > 0 else None
        if want is None:
            assert got[flag] is None, f"{flag}: {got[flag]} vs None"
        else:
            assert got[flag] is not None, f"{flag}: None vs {want}"
            assert abs(got[flag] - want) <= 5e-6, f"{flag}: {got[flag]} vs {want}"
