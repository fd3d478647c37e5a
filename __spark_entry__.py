"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ``firs_mv`` gold pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` delegate to the engine's registered query
catalog (``dopams_etl_spark/plans/catalog.py``) — one entry per implemented
operator from SURVEY.md §2, each paired with the ANSI-SQL oracle DuckDB
runs on the same parquet tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dopams_etl_spark.plans import catalog as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.queries()["firs_mv"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return _catalog.oracle_sql()
