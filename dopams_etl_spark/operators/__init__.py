"""Relational operator layer — thin, tested conventions over DataFrame ops.

Each SURVEY.md §2 inventory row is a named function here so pipelines read
as the reference's operator vocabulary while executing as idiomatic Spark
plans (broadcast hash joins, decorrelated aggregations, window top-1s).
"""

from dopams_etl_spark.operators.aggregates import (
    collect_distinct_sorted,
    collect_sorted_structs,
    count_if,
    map_agg_entries,
)
from dopams_etl_spark.operators.joins import (
    anti_join,
    broadcast_dim_join,
    fuzzy_join_levenshtein,
    latest_per_key,
    semi_join,
    top1_by_score,
)
from dopams_etl_spark.operators.merge import (
    classify_merge,
    smart_merge,
    upsert_latest_wins,
)
from dopams_etl_spark.operators.quarantine import fk_validate

__all__ = [
    "anti_join",
    "broadcast_dim_join",
    "classify_merge",
    "collect_distinct_sorted",
    "collect_sorted_structs",
    "count_if",
    "fk_validate",
    "fuzzy_join_levenshtein",
    "latest_per_key",
    "map_agg_entries",
    "semi_join",
    "smart_merge",
    "top1_by_score",
    "upsert_latest_wins",
]
