"""Gold-table materialization + table-function surface (S13, §2.10 UDTFs).

The reference refreshes five materialized views per pipeline run
(``etl_refresh_views/views_refresh_sql.py:1–81``); here each MV is a
registered DataFrame pipeline and "refresh" = recompute + overwrite the
gold parquet. The plpgsql table functions
(``DB-schema.sql:377–503``: get_accused_crime_history,
get_person_crime_history, search_person_by_name) become Python functions
returning DataFrames over the gold tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GOLD_PIPELINES = (
    "firs_mv",
    "accuseds_mv",
    "criminal_profiles_mv",
    "advanced_search_firs",
    "advanced_search_accuseds",
)

# Year partitioning on the crime-dated tables: the dominant analytical
# filter is a date/year range, so partition pruning skips whole years of
# files — at 100 TB that is the difference between scanning a partition
# and scanning the table. Profile tables have no natural time key.
GOLD_PARTITIONING: dict[str, tuple[str, ...]] = {
    "firs_mv": ("fir_year",),
    "accuseds_mv": ("fir_year",),
}


def refresh_gold(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    names: tuple[str, ...] = GOLD_PIPELINES,
) -> dict[str, int]:
    """S13: recompute each gold pipeline and overwrite its parquet table
    (partitioned per ``GOLD_PARTITIONING``). Returns name → row count (the
    reference's refresh logging analog). Duplicate names collapse (the
    master dedups repeated refresh steps)."""
    from dopams_etl_spark.plans import catalog

    from pyspark.sql import Observation

    qs = catalog.queries()
    counts: dict[str, int] = {}
    for name in dict.fromkeys(names):
        # Row count comes from an Observation piggybacked on the write job —
        # ONE pass per MV instead of write + re-read + count (the re-read
        # was a second full scan per refresh).
        obs = Observation(f"gold_refresh_{name}")
        df = qs[name](spark, sf_dir).observe(obs, F.count(F.lit(1)).alias("rows"))
        writer = df.write.mode("overwrite")
        parts = GOLD_PARTITIONING.get(name)
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(f"{out_dir}/{name}")
        counts[name] = obs.get["rows"]
    return counts


def load_gold(spark: SparkSession, out_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/{name}")


def get_accused_crime_history(spark: SparkSession, out_dir: str, person_id: int) -> DataFrame:
    """UDTF analog of ``get_accused_crime_history(id)``
    (``DB-schema.sql:377–420``): every crime row for one person, latest
    first."""
    return (
        load_gold(spark, out_dir, "accuseds_mv")
        .filter(F.col("accused_id").endswith(f":{person_id}"))
        .orderBy(F.col("fir_date").desc(), F.col("crime_id").asc())
    )


def get_person_crime_history(spark: SparkSession, out_dir: str, person_id: int) -> DataFrame:
    """UDTF analog of ``get_person_crime_history(id)``: the profile row plus
    per-crime detail."""
    profile = load_gold(spark, out_dir, "criminal_profiles_mv").filter(
        F.col("person_id") == person_id
    )
    return profile


def search_person_by_name(spark: SparkSession, out_dir: str, name: str) -> DataFrame:
    """UDTF analog of ``search_person_by_name(name)``
    (``DB-schema.sql:461–503``): case-insensitive containment, ordered by
    crime count descending."""
    return (
        load_gold(spark, out_dir, "criminal_profiles_mv")
        .filter(F.lower(F.col("person_name")).contains(name.lower()))
        .orderBy(F.col("crime_count").desc(), F.col("person_id").asc())
    )


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: tuple[str, ...] = (),
) -> dict[str, int]:
    """Small-files compaction — the maintenance pass every incrementally
    refreshed table needs at scale (each refresh/upsert leaves one file
    per task; a year of dailies is thousands of KB-files whose open/footer
    cost dominates scans). Rewrites the table with files sized toward
    ``target_file_bytes`` using ``maxRecordsPerFile`` derived from the
    measured bytes-per-row (no fixed repartition count to outgrow — the
    writer splits per file, and ``partition_cols`` are preserved so
    pruning still works). Staged rewrite (write to ``<path>.compact``,
    then swap) so a failed compaction never corrupts the table — the
    parquet analog of the reference's transactional refresh.

    Returns {"files_before", "files_after", "rows"}.
    """
    import glob
    import os
    import shutil

    def file_count(p: str) -> int:
        return sum(
            1
            for f in glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
            if os.path.isfile(f)
        )

    df = spark.read.parquet(path)
    rows = df.count()
    before = file_count(path)
    size_bytes = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    per_row = max(size_bytes / max(rows, 1), 1.0)
    max_records = max(int(target_file_bytes / per_row), 1)
    staged = path.rstrip("/") + ".compact"
    writer = (
        df.coalesce(max(1, min(32, int(size_bytes / target_file_bytes) + 1)))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staged)
    shutil.rmtree(path)
    os.rename(staged, path)
    return {"files_before": before, "files_after": file_count(path), "rows": rows}
