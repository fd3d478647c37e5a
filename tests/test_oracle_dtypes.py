"""Registry-wide decimal-hash sweep (VERDICT r6 items 1–2).

The driver's correctness gate hashes raw cell reprs after a column sort.
DuckDB's pandas bridge converts bare DECIMAL results to float64, while
Spark's toPandas surfaces DecimalType as ``decimal.Decimal`` objects — so
a DECIMAL-typed output column on EITHER side makes the hash a coin flip
on trailing-zero cells (``Decimal('1524135.00')`` vs ``1524135.0``): the
exact root cause of the three round-6 driver failures. The catalog's
convention (``plans/catalog.py`` docstring, practiced by
``q1_pricing_summary``) is to stringify exact decimals on BOTH sides;
these tests make that convention machine-enforced for every registered
query, so the bug class cannot re-enter.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql.types import DecimalType

from dopams_etl_spark.catalog import TABLES
from dopams_etl_spark.plans import catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def test_no_bare_decimal_oracle_outputs(duck):
    """DESCRIBE every oracle in DuckDB: no output column may be
    DECIMAL-typed — stringify exact money columns (CAST ... AS VARCHAR)
    or cast ratios to DOUBLE, per the q1 convention."""
    offenders = {}
    for name, sql in catalog.oracle_sql().items():
        desc = duck.execute("DESCRIBE " + sql).df()
        dec = [
            (r.column_name, r.column_type)
            for r in desc.itertuples()
            if r.column_type.startswith("DECIMAL")
        ]
        if dec:
            offenders[name] = dec
    assert not offenders, f"bare DECIMAL oracle outputs: {offenders}"


def test_no_decimal_spark_outputs(spark):
    """Compile every registered Spark query's schema: no output column
    may be DecimalType — toPandas would surface Decimal objects that
    hash differently from the oracle's float64 bridge."""
    offenders = {}
    for name, fn in catalog.queries().items():
        dec = [
            f.name
            for f in fn(spark, SF).schema.fields
            if isinstance(f.dataType, DecimalType)
        ]
        if dec:
            offenders[name] = dec
    assert not offenders, f"DecimalType Spark outputs: {offenders}"
