"""NL→SQL guardrail layer (SURVEY §2.11 N1–N5, W5).

The engine's SQL entry point is ``spark.sql`` over the registered catalog
views; this package is the thin planner/validator shell around it —
keyword intent detection, table matching via ``spark.catalog``
introspection, limit extraction with defaults/caps, and the SELECT-only
safety validator. LLM SQL generation itself stays out of the
correctness-critical path (a generator plugs in between ``plan`` and
``validate``).
"""

from dopams_etl_spark.nlq.planner import QueryPlan, extract_limit, match_tables, plan_query
from dopams_etl_spark.nlq.validator import ThreatLevel, ValidationResult, validate_sql

__all__ = [
    "QueryPlan",
    "ThreatLevel",
    "ValidationResult",
    "extract_limit",
    "match_tables",
    "plan_query",
    "validate_sql",
]
