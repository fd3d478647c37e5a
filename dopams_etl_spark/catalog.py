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
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

# Fixed-cardinality dimensions (region=5, nation=25 at ANY scale factor):
# the only tables safe to broadcast-hint explicitly. customer/part/supplier/
# orders all grow linearly with SF — at 100 TB they are billions of rows, and
# an explicit hint would bypass AQE's size check and OOM the executors; their
# joins stay plain so AQE picks broadcast-vs-shuffle from measured size.
BROADCAST_TABLES = frozenset({"region", "nation"})


# session -> {(sf_dir, table): DataFrame}. ``spark.read.parquet`` does a
# file listing + footer/schema read EVERY call (~70 ms per table); across
# a 247-query catalog that re-reads identical metadata thousands of
# times. DataFrames are immutable lazy plans, so handing back the same
# object is semantically identical — this is the parquet analog of a
# metastore's cached table definition. Keyed WEAKLY by the SparkSession
# object itself: a ``newSession()`` (same applicationId, different conf)
# gets its own entries, and a collected session's plans evict with it.
# The cached plan snapshots the file listing at first read — correct for
# the fixed read-only testdata this catalog fronts; callers loading a
# directory they mutate must pass ``cache=False``.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def load_table(
    spark: SparkSession,
    name: str,
    sf_dir: str = DEFAULT_SF_DIR,
    cache: bool = True,
) -> DataFrame:
    """Read one catalog table (memoized per session — see _TABLE_CACHE;
    pass ``cache=False`` when reading a directory whose files change,
    since the cached plan pins its first file listing).

    No ``mergeSchema`` — the testdata schemas are fixed, and footer merging
    costs a full file listing + footer read per query. Schema evolution is
    opt-in at the ingest layer, not ambient on every scan.

    ``events.ts`` is TIMESTAMP(NANOS) parquet. Depending on the Spark
    build/conf it scans as long nanos (``nanosAsLong``), TIMESTAMP_NTZ
    (native nanos→ntz read, this build), or TIMESTAMP. All three are
    normalized here to session-zoned TIMESTAMP — NTZ breaks
    ``withWatermark`` (requires LTZ) and ``cast(ts as bigint)``, and
    leaving the type session-dependent would make every downstream
    operator re-handle it. The harness runs UTC, where NTZ→LTZ is
    value-identical to DuckDB's naive ns→us read of the same file.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    per_session = _TABLE_CACHE.setdefault(spark, {}) if cache else None
    if per_session is not None:
        cached = per_session.get((sf_dir, name))
        if cached is not None:
            return cached
    if name == "events":
        # Harmless where the native ntz read applies; required on builds
        # where the TIMESTAMP(NANOS) scan would otherwise raise
        # PARQUET_TYPE_ILLEGAL. Runtime-settable, so this works on ANY
        # caller-provided session (the driver builds its own).
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    # Note: the testdata files are single-row-group parquet → 1-partition
    # scans. Blanket repartition here measured as a net LOSS for the
    # relational queries (shuffling raw rows costs more than the map side
    # saves when per-row work is cheap); only the per-row-expensive
    # text/vector operators repartition, via partitioning.ensure_parallelism.
    if per_session is not None:
        per_session[(sf_dir, name)] = df
    return df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` works directly."""
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
