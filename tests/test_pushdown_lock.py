"""Registry-wide pushdown regression lock (VERDICT r8 task 4).

PLANS.md records per-query pushed-filter / partition-filter counts, but
nothing FAILED if a refactor silently dropped one — a filter that stops
reaching the parquet scan is invisible to the correctness gate (same
rows, 100× the bytes read at scale). This table pins the minimum number
of scans with non-empty PushedFilters / PartitionFilters for every
query family whose plan carries scan-level pruning; breaking any single
pushdown (e.g. wrapping a filtered column in a cast) drops the count
below its floor and fails here.

Counts extracted with ``tools.plan_audit.scan_pushdown_counts`` from
the executed (AQE-final) plan — the truncation-proof extraction; scan
metadata truncates at spark.sql.maxMetadataStringLength, which loses
the closing bracket of exactly the scans with the most filters.
"""

from __future__ import annotations

import pytest

from tools.plan_audit import pushed_predicate_totals, scan_pushdown_counts

SF = "/root/testdata/sf0.001"

# query -> (min scans with PushedFilters, min scans with PartitionFilters,
#           min TOTAL pushed predicates, min TOTAL partition predicates)
# measured on the current plans; these are FLOORS (a new filter may
# legitimately raise a count, never silently lower it). The predicate
# totals are the sharp edge: breaking one comparison usually leaves its
# IsNotNull guard pushed, so the scan count holds while the total drops.
EXPECTED_MIN = {
    # gold MVs / star joins: every dim + fact scan carries its pushdown
    "regional_revenue": (5, 0, 8, 0),
    "firs_mv": (5, 0, 6, 0),
    "accuseds_mv": (6, 0, 8, 0),
    "criminal_profiles_mv": (6, 0, 9, 0),
    "advanced_search_accuseds": (7, 0, 9, 0),
    "advanced_search_firs": (5, 0, 7, 0),
    # TPC-H decision-support family
    "q3_shipping_priority": (3, 0, 10, 0),
    "q5_local_supplier_volume": (6, 0, 16, 0),
    "q6_forecast_revenue_delta": (1, 0, 8, 0),
    "q19_disjunctive_revenue": (2, 0, 6, 0),
    "q21_suppliers_kept_waiting": (3, 0, 5, 0),
    "q22_dormant_customers": (3, 0, 6, 0),
    # event/temporal family
    "hourly_event_stats": (1, 0, 1, 0),
    "asof_purchase_last_view": (2, 0, 4, 0),
    "range_error_click_pairs": (2, 0, 6, 0),
    "view_click_purchase_funnel": (4, 0, 11, 0),
    "weekly_cohort_retention": (2, 0, 2, 0),
    "attribution_time_decay": (2, 0, 6, 0),
    # dedup / similarity / ER
    "entity_resolution_blocked": (2, 0, 2, 0),
    "lsh_topk_embeddings": (2, 0, 3, 0),
    "simhash_dups": (1, 0, 1, 0),
    "decontaminate_docs": (3, 0, 3, 0),
    # partition pruning on a partitioned layout (gold-table read path;
    # the firs_mv gold scan twin is asserted in test_scale_posture)
    "partitioned_scan_prune": (0, 1, 0, 3),
}


@pytest.fixture(scope="module")
def audited(spark):
    from dopams_etl_spark.plans import catalog

    qs = catalog.queries()
    # full filter lists in the plan string (see module docstring)
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    try:
        out = {}
        for name in EXPECTED_MIN:
            df = qs[name](spark, SF)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            plan = plan.split("== Initial Plan ==")[0]
            out[name] = scan_pushdown_counts(plan) + pushed_predicate_totals(plan)
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    return out


@pytest.mark.parametrize("name", sorted(EXPECTED_MIN))
def test_pushdown_floor(name, audited):
    pushed, partf, npred, npart = audited[name]
    min_pushed, min_partf, min_npred, min_npart = EXPECTED_MIN[name]
    assert pushed >= min_pushed, (
        f"{name}: {pushed} scans carry PushedFilters, floor is "
        f"{min_pushed} — a predicate stopped reaching the parquet scan"
    )
    assert partf >= min_partf, (
        f"{name}: {partf} scans carry PartitionFilters, floor is "
        f"{min_partf} — partition pruning regressed"
    )
    assert npred >= min_npred, (
        f"{name}: {npred} total pushed predicates, floor is {min_npred} "
        f"— one comparison stopped pushing (its IsNotNull guard likely "
        f"kept the scan count green)"
    )
    assert npart >= min_npart, (
        f"{name}: {npart} total partition predicates, floor is {min_npart}"
    )
