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
