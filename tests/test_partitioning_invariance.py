"""Partitioning-invariance: the driver's correctness gate hashes raw
cell values, and the driver builds its own session — so a query whose
output depends on ``spark.sql.shuffle.partitions`` (double-sum order,
unstable collect order, nondeterministic tie-breaks) is a latent red
row even if it passes locally. Run representative queries under two
different shuffle-partition settings and require bit-identical rows.

Representatives cover the risk classes: exact integer-cents sums (q1),
the wide fused MV with ordered/distinct collects (firs_mv), a
double-sum + NTILE pipeline (customer_rfm_segments), double-weighted
window math (time_weighted_avg_value), corr() machinery
(lineitem_corr_matrix), and — round 9 — the applyInPandas sequential
folds (capped_running_balance: per-key pandas groups must see the SAME
rows in ANY partitioning; holt_linear_daily: a singleton group built
from a shuffled day aggregate), the one-row moment broadcast
(mahalanobis_customer_outliers), and the double-sum drawdown windows
(revenue_max_drawdown).
"""

from __future__ import annotations

import pytest

from dopams_etl_spark.plans import catalog

SF = "/root/testdata/sf0.001"

REPRESENTATIVES = (
    "q1_pricing_summary",
    "firs_mv",
    "customer_rfm_segments",
    "time_weighted_avg_value",
    "lineitem_corr_matrix",
    "capped_running_balance",
    "holt_linear_daily",
    "mahalanobis_customer_outliers",
    "revenue_max_drawdown",
)


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_output_invariant_to_shuffle_partitions(spark, name):
    qs = catalog.queries()
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = sorted(map(tuple, qs[name](spark, SF).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = sorted(map(tuple, qs[name](spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b, f"{name} output depends on shuffle partitioning"
