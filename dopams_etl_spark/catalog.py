"""Table catalog over the parquet test tables (TESTDATA.md).

The reference keeps a fixed DDL catalog in PostgreSQL (``DB-schema.sql``)
with runtime schema evolution via ``ALTER TABLE ADD COLUMN``
(``etl-crimes/etl_crimes.py:231–244``). Here the catalog is a thin typed
layer over parquet: Spark's parquet reader already gives column pruning and
predicate pushdown; schema evolution is reader-side schema union
(``mergeSchema``) plus a JSON-overflow column convention (see
``functions.cleaning.with_json_overflow``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# TPC-H-ish star schema + event stream + text/embedding corpora.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions: always broadcast-join these against fact tables.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one catalog table. Schema evolution: mergeSchema on."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    return spark.read.option("mergeSchema", "true").parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` works directly."""
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
