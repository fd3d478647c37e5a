"""Guarded SQL executor (N5).

Parity with ``chatbot/database/postgres_executor.py:22–140``: validate →
execute → cap rows → sanitize errors. The Spark analog of
``statement_timeout`` + ``fetchmany(MAX_QUERY_ROWS)`` is a ``LIMIT``
injected into the plan (driver-side collect is capped before it happens,
not after).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Row, SparkSession

from dopams_etl_spark.nlq.validator import sanitize_error, validate_sql

MAX_QUERY_ROWS = 10_000


@dataclass
class ExecutionResult:
    ok: bool
    rows: list[Row]
    row_count: int
    truncated: bool
    error: str | None = None


def execute_guarded(
    spark: SparkSession, sql: str, max_rows: int = MAX_QUERY_ROWS
) -> ExecutionResult:
    """Run validated SELECT SQL with a hard row cap. Unsafe SQL never
    reaches ``spark.sql``; engine errors come back sanitized."""
    verdict = validate_sql(sql)
    if not verdict.is_safe:
        return ExecutionResult(False, [], 0, False, f"rejected: {verdict.reason}")
    try:
        # +1 row to detect truncation without a count() pass
        rows = spark.sql(sql).limit(max_rows + 1).collect()
    except Exception as exc:  # noqa: BLE001 - sanitizer is the contract
        return ExecutionResult(False, [], 0, False, sanitize_error(exc))
    truncated = len(rows) > max_rows
    if truncated:
        rows = rows[:max_rows]
    return ExecutionResult(True, rows, len(rows), truncated)
