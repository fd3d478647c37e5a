"""Invariant tests for the analytics layer (plans/analytics.py).

The oracle checks pin exact values; these pin the MATH — bounds and
structural properties that must hold for any input, so a future edit
that stays value-consistent with a buggy oracle still gets caught.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q(spark):
    from dopams_etl_spark.plans import catalog

    return {name: fn for name, fn in catalog.queries().items()}


def test_gini_bounds(spark, q):
    row = q["customer_spend_gini"](spark, SF).collect()[0]
    assert 0.0 <= row["gini"] < 1.0


def test_pareto_abc_shares_sum_to_one(spark, q):
    rows = q["revenue_pareto_abc"](spark, SF).collect()
    assert {r["abc_class"] for r in rows} == {"A", "B", "C"}
    assert abs(sum(float(r["revenue_share"]) for r in rows) - 1.0) < 1e-4


def test_rfm_scores_in_quartile_range(spark, q):
    for r in q["customer_rfm_segments"](spark, SF).collect():
        assert 1 <= r["r_score"] <= 4
        assert 1 <= r["f_score"] <= 4
        assert 1 <= r["m_score"] <= 4


def test_hhi_bounds(spark, q):
    for r in q["supplier_hhi_by_nation"](spark, SF).collect():
        n = r["n_suppliers"]
        # HHI of n equal shares is 1/n; concentration only raises it
        assert (1.0 / n) - 1e-6 <= r["hhi"] <= 1.0 + 1e-6


def test_benford_shares_and_digits(spark, q):
    rows = q["benford_order_totals"](spark, SF).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["observed"] for r in rows) - 1.0) < 1e-4
    assert all(r["chi2_term"] >= 0 for r in rows)


def test_mutual_information_nonnegative(spark, q):
    row = q["mutual_information_type_dow"](spark, SF).collect()[0]
    # MI >= 0 always; NMI <= 1 up to rounding
    assert row["mi"] >= -1e-9
    assert row["nmi"] <= 1.0 + 1e-6


def test_equidepth_buckets_balanced(spark, q):
    rows = q["value_histogram_equidepth"](spark, SF).collect()
    counts = [r["n"] for r in rows]
    assert len(rows) == 10
    # NTILE guarantee: bucket sizes differ by at most one
    assert max(counts) - min(counts) <= 1
    # bucket value ranges are ordered and non-overlapping
    by_bucket = sorted(rows, key=lambda r: r["bucket"])
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a["hi"] <= b["lo"] + 1e-9


def test_burstiness_bounds(spark, q):
    for r in q["user_burstiness"](spark, SF).collect():
        assert -1.0 - 1e-9 <= r["burstiness"] <= 1.0 + 1e-9


def test_rrf_ranks_dense_per_query(spark, q):
    rows = q["rrf_fused_search"](spark, SF).collect()
    by_query: dict[int, list[int]] = {}
    for r in rows:
        by_query.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_query.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_rolling_wau_at_least_daily_active(spark, q):
    """Trailing 7-day actives can never be fewer than that day's actives."""
    from pyspark.sql import functions as F

    from dopams_etl_spark.catalog import load_table

    ev = load_table(spark, "events", SF)
    dau = {
        r["day"]: r["n"]
        for r in ev.select(F.to_date("ts").cast("string").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in q["rolling_weekly_active_users"](spark, SF).collect():
        assert r["wau"] >= dau.get(r["day"], 0)


def test_heaps_curve_monotone(spark, q):
    rows = sorted(
        q["heaps_vocab_growth"](spark, SF).collect(), key=lambda r: r["doc_id"]
    )
    for a, b in zip(rows, rows[1:]):
        assert b["cum_tokens"] >= a["cum_tokens"]
        assert b["cum_vocab"] >= a["cum_vocab"]


def test_incremental_join_mv_matches_full_recompute(spark, q):
    """The incremental path must equal a one-shot groupBy over the join."""
    from pyspark.sql import functions as F

    from dopams_etl_spark.catalog import load_table

    got = {
        r["o_orderpriority"]: (r["n_items"], r["revenue"])
        for r in q["incremental_join_mv"](spark, SF).collect()
    }
    orders = load_table(spark, "orders", SF)
    li = load_table(spark, "lineitem", SF)
    full = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("string")
            .alias("revenue"),
        )
    )
    want = {
        r["o_orderpriority"]: (r["n_items"], r["revenue"]) for r in full.collect()
    }
    assert got == want


def test_mix_decomposition_identity(spark, q):
    """delta_rev == volume + price + interaction (exactly, pre-rounding:
    here within the 2dp rounding slack of the four terms)."""
    for r in q["revenue_mix_decomposition"](spark, SF).collect():
        recomposed = r["volume_effect"] + r["price_effect"] + r["interaction"]
        assert abs(r["delta_rev"] - recomposed) < 0.03, r


def test_session_funnel_monotone(spark, q):
    row = q["session_funnel_ordered"](spark, SF).collect()[0]
    assert (
        row["n_sessions"]
        >= row["reached_view"]
        >= row["reached_click"]
        >= row["reached_purchase"]
    )
    assert 0.0 <= row["click_rate"] <= 1.0
    assert 0.0 <= row["purchase_rate"] <= 1.0


def test_assortativity_bounds(spark, q):
    row = q["degree_assortativity"](spark, SF).collect()[0]
    assert -1.0 - 1e-9 <= row["assortativity"] <= 1.0 + 1e-9


def test_psi_terms_nonnegative(spark, q):
    """Each PSI term (pB-pA)ln(pB/pA) is individually >= 0."""
    rows = q["population_stability_index"](spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["psi_term"] >= -1e-9
    assert rows[0]["psi_total"] >= -1e-9


def test_ece_bounds(spark, q):
    rows = q["expected_calibration_error"](spark, SF).collect()
    for r in rows:
        assert 0.0 <= r["gap"] <= 1.0 + 1e-9
        assert 0.0 <= r["ece"] <= 1.0 + 1e-9


def test_bootstrap_ci_orders(spark, q):
    row = q["bootstrap_mean_ci"](spark, SF).collect()[0]
    assert row["n_replicates"] == 50
    assert row["ci_lo"] <= row["boot_mean"] <= row["ci_hi"]


def test_kaplan_meier_monotone(spark, q):
    rows = sorted(
        q["kaplan_meier_retention"](spark, SF).collect(),
        key=lambda r: r["t_minutes"],
    )
    assert rows, "KM curve should have at least one step"
    prev = 1.0
    for r in rows:
        assert 0.0 < r["survival"] <= prev + 1e-9
        prev = r["survival"]


def test_chi_square_consistency(spark, q):
    row = q["chi_square_type_dow"](spark, SF).collect()[0]
    assert row["chi2"] >= 0
    assert row["dof"] == (5 - 1) * (7 - 1)
    assert 0.0 <= row["cramers_v"] <= 1.0 + 1e-9


def test_ohlc_bounds(spark, q):
    rows = q["ohlc_hourly_bars"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["low"] <= r["high"]
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        if r["n_events"] == 1:
            assert r["open"] == r["close"] == r["high"] == r["low"]


def test_twap_within_value_range(spark, q):
    from pyspark.sql import functions as F

    from dopams_etl_spark.catalog import load_table

    rows = q["time_weighted_avg_value"](spark, SF).collect()
    assert rows
    e = load_table(spark, "events", SF)
    bounds = {
        (r["user_id"], str(r["d"])): (r["lo"], r["hi"])
        for r in e.groupBy("user_id", F.col("ts").cast("date").alias("d"))
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        lo, hi = bounds[(r["user_id"], r["day"])]
        # a convex time-weighted combination can't leave the value hull
        assert lo - 1e-6 <= r["twap"] <= hi + 1e-6


def test_throttle_partitions_every_event(spark, q):
    from dopams_etl_spark.catalog import load_table

    rows = q["throttle_dedup_events"](spark, SF).collect()
    total = load_table(spark, "events", SF).count()
    assert sum(r["kept"] + r["dropped"] for r in rows) == total
    assert all(r["kept"] >= 1 for r in rows)  # first event always kept


def test_new_returning_sums_to_active(spark, q):
    from dopams_etl_spark.catalog import load_table
    from pyspark.sql import functions as F

    rows = q["daily_new_vs_returning"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["new_users"] + r["returning_users"] == r["active_users"]
    # every user is new exactly once across all days
    n_users = (
        load_table(spark, "events", SF).select("user_id").distinct().count()
    )
    assert sum(r["new_users"] for r in rows) == n_users


def test_woe_iv_consistency(spark, q):
    import math

    rows = q["woe_information_value"](spark, SF).collect()
    assert rows
    for r in rows:
        # iv_term = (p_share - n_share) * woe is nonnegative by sign
        # agreement (both factors share the sign of woe)
        assert r["iv_term"] >= -1e-9
        assert math.isfinite(r["woe"])


def test_corr_matrix_bounds(spark, q):
    row = q["lineitem_corr_matrix"](spark, SF).collect()[0]
    for c in ("r_qty_price", "r_qty_disc", "r_price_disc"):
        assert -1.0 - 1e-9 <= row[c] <= 1.0 + 1e-9


def test_embedding_dim_stats_shape(spark, q):
    rows = q["embedding_dim_stats"](spark, SF).collect()
    assert len(rows) == 64  # one row per dimension, none dropped
    n = {r["n"] for r in rows}
    assert len(n) == 1  # every dim observed in every vector
    for r in rows:
        assert r["vmin"] <= r["mean"] <= r["vmax"]
        assert r["sd"] >= 0


def test_vocab_jaccard_bounds(spark, q):
    rows = q["vocab_jaccard_sources"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["src_a"] < r["src_b"]  # canonical pair orientation
        assert 0.0 <= r["jaccard"] <= 1.0 + 1e-9
        assert r["n_common"] >= 1  # pairs only exist via shared tokens


def test_queue_depth_conserves(spark, q):
    rows = sorted(q["queue_depth_daily"](spark, SF).collect(), key=lambda r: r["day"])
    assert rows
    # every +1 open has a matching -1 close: net deltas sum to zero and
    # the running depth is never negative
    assert sum(r["net"] for r in rows) == 0
    assert rows[-1]["open_orders"] == 0
    assert all(r["open_orders"] >= 0 for r in rows)


def test_seasonal_decompose_identity(spark, q):
    rows = q["seasonal_decompose_daily"](spark, SF).collect()
    assert rows
    for r in rows:
        assert abs(r["n"] - (r["trend"] + r["seasonal"] + r["resid"])) < 1e-4


def test_linear_attribution_credit_conserved(spark, q):
    rows = q["multi_touch_attribution_linear"](spark, SF).collect()
    assert rows
    total_credit = sum(r["linear_credit"] for r in rows)
    # credit splits 1/n per conversion: the total equals the number of
    # conversions that received at least one touch (an integer)
    assert abs(total_credit - round(total_credit)) < 1e-3
    assert total_credit > 0


def test_funnel_ttc_monotone(spark, q):
    r = q["funnel_time_to_convert"](spark, SF).collect()[0]
    assert r["n_converted"] > 0
    assert 0 <= r["p25_min"] <= r["p50_min"] <= r["p75_min"] <= r["p90_min"]


def test_weighted_median_in_hull(spark, q):
    from pyspark.sql import functions as F

    from dopams_etl_spark.catalog import load_table

    rows = q["time_weighted_median_value"](spark, SF).collect()
    assert rows
    bounds = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in load_table(spark, "events", SF)
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        lo, hi = bounds[r["event_type"]]
        assert lo - 1e-6 <= r["weighted_median"] <= hi + 1e-6


def test_confusion_matrix_partitions_corpus(spark, q):
    from dopams_etl_spark.catalog import load_table

    rows = q["lang_id_confusion_matrix"](spark, SF).collect()
    n_docs = load_table(spark, "documents", SF).count()
    assert sum(r["n"] for r in rows) == n_docs
    by_true = {}
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0 + 1e-9
        by_true.setdefault(r["true_lang"], 0.0)
        by_true[r["true_lang"]] += r["recall"]
    for lang, s in by_true.items():
        assert abs(s - 1.0) < 1e-4, (lang, s)


def test_bigram_pmi_support_floor(spark, q):
    rows = q["bigram_pmi_topk"](spark, SF).collect()
    assert 0 < len(rows) <= 50
    assert all(r["c_bi"] >= 5 for r in rows)
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_norm_outliers_ranked(spark, q):
    rows = q["embedding_norm_outliers"](spark, SF).collect()
    assert len(rows) == 10
    azs = [abs(r["z"]) for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(azs, azs[1:]))
    assert all(r["norm"] >= 0 for r in rows)


def test_minhash_error_bounds(spark, q):
    rows = q["minhash_jaccard_estimate_error"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["exact_jaccard"] <= 1.0 + 1e-9
        # an LSH candidate shares at least one full band: >= 4/32 agreement
        assert r["est_jaccard"] >= 4 / 32 - 1e-9
        assert abs(r["abs_err"] - abs(r["est_jaccard"] - r["exact_jaccard"])) < 2e-6


def test_kfold_shares_partition_labels(spark, q):
    rows = q["stratified_kfold_assign"](spark, SF).collect()
    assert rows
    by_label = {}
    for r in rows:
        assert 0 <= r["fold"] <= 4
        by_label.setdefault(r["label"], 0.0)
        by_label[r["label"]] += r["share"]
    for label, s in by_label.items():
        assert abs(s - 1.0) < 1e-4, (label, s)
