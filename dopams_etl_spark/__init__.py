"""dopams_etl_spark — a PySpark-native analytics/ETL engine.

Brand-new implementation of the query and data-processing capabilities of
the DOPAMS-ETL reference system (see SURVEY.md), re-expressed as idiomatic
Spark DataFrame / Spark-SQL pipelines designed for 100 TB scale:

- ``session``     — tuned SparkSession builder (AQE, Arrow, broadcast joins)
- ``catalog``     — typed readers over the parquet test tables
- ``functions``   — scalar column-expression library (cleaning, status
                    normalization, date math, ids, units, text analysis)
- ``operators``   — relational operator layer (joins, aggregates, merge,
                    quarantine, dedup, similarity, watermark)
- ``plans``       — gold analytic pipelines (decorrelated MV-style jobs)
- ``streaming``   — Structured Streaming incremental-ingest wrappers
"""

__version__ = "0.1.0"
