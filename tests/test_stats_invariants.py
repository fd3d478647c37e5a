"""Mathematical invariants of the plans/stats.py family — properties
that must hold for ANY input, checked on the real testdata (the oracle
gate proves engine parity; these prove the statistics themselves are
well-formed, catching formula regressions both engines would share)."""

from __future__ import annotations

import pytest

from dopams_etl_spark.plans import catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return catalog.queries()


def test_ks_stat_is_a_probability_distance(spark, qs):
    row = qs["ks_test_two_sample"](spark, SF).collect()[0]
    assert 0.0 <= row["ks_stat"] <= 1.0
    assert row["n_purchase"] > 0 and row["n_view"] > 0


def test_mann_kendall_z_sign_follows_s(spark, qs):
    row = qs["mann_kendall_trend"](spark, SF).collect()[0]
    if row["s_stat"] > 0:
        assert row["z_stat"] > 0
    elif row["s_stat"] < 0:
        assert row["z_stat"] < 0
    else:
        assert row["z_stat"] == 0.0
    # |S| can never exceed the number of pairs
    n = row["n_days"]
    assert abs(row["s_stat"]) <= n * (n - 1) / 2


def test_precision_recall_deciles_shape(spark, qs):
    rows = sorted(
        qs["precision_recall_deciles"](spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # recall is nondecreasing and reaches exactly 1 at the last decile
    recalls = [r["recall_at"] for r in rows]
    assert all(b >= a for a, b in zip(recalls, recalls[1:]))
    assert recalls[-1] == 1.0
    for r in rows:
        assert 0.0 <= r["precision_at"] <= 1.0


def test_jsd_is_bounded_and_zero_free_days_exist(spark, qs):
    rows = qs["js_divergence_daily_drift"](spark, SF).collect()
    assert rows
    for r in rows:
        # JSD with log2 is bounded by 1; numerically allow rounding edge
        assert -1e-9 <= r["jsd"] <= 1.0 + 1e-9


def test_kappa_bounded_by_agreement(spark, qs):
    row = qs["cohens_kappa_priority_value"](spark, SF).collect()[0]
    assert -1.0 <= row["kappa"] <= 1.0
    assert 0.0 <= row["observed_agreement"] <= 1.0
    # chance correction can only lower the score
    assert row["kappa"] <= row["observed_agreement"] + 1e-9


def test_time_decay_credit_sums_to_purchases(spark, qs):
    """Per-purchase normalization means total credit across buckets
    equals the number of attributed purchases (each purchase hands out
    exactly 1.0 credit)."""
    from pyspark.sql import functions as F

    df = qs["attribution_time_decay"](spark, SF)
    total = df.agg(F.sum("credit")).collect()[0][0]
    assert abs(total - round(total)) < 1e-2  # sums of per-purchase 1.0s
    assert total >= 1


def test_trailing_range_frame_bounds_rows_frame(spark, qs):
    """The RANGE-frame 7-day sum can never exceed the sum of ALL rows in
    the trailing week and always includes the current day itself."""
    rows = qs["trailing_week_range_frame"](spark, SF).collect()
    by_day = {r["day"]: r for r in rows}
    for r in rows:
        assert r["rev_7d"] >= r["rev"] - 1e-6
        week = [
            by_day[d]["rev"]
            for d in by_day
            if 0 <= (r["day"] - d).days <= 6
        ]
        assert abs(r["rev_7d"] - round(sum(week), 2)) < 0.05


def test_asof_nearest_within_tolerance(spark, qs):
    rows = qs["asof_nearest_tolerance_join"](spark, SF).collect()
    for r in rows:
        assert 0 <= r["abs_seconds"] <= 1800
    # one match per purchase
    pids = [r["purchase_id"] for r in rows]
    assert len(pids) == len(set(pids))


def test_dsir_weights_rank_candidates_only(spark, qs):
    """DSIR scores only the non-target (non-English) candidates, top-20
    in weight order."""
    rows = qs["dsir_importance_weights"](spark, SF).collect()
    assert 0 < len(rows) <= 20
    weights = [r["dsir_weight"] for r in rows]
    assert weights == sorted(weights, reverse=True)
