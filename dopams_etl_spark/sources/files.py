"""File/reference sources and the media sink (S4/S5/S12).

- ``read_json_dump``: document-dump ingestion (the Mongo-migration analog,
  ``etl-mongo-to-postgresql/etl_migration.py:86–135``) — ``spark.read.json``
  plus an UPPER_SNAKE → lower_snake field mapping (P1).
- ``load_csv_reference``: small reference CSVs destined for broadcast
  (``etl_migration.py:66–85``).
- ``media_download_sink``: S12 — fetch binary payloads for file rows and
  write them into a source_type/field directory tree, returning a status
  frame (is_downloaded, attempts, path). The getter is pluggable; tests
  use a deterministic byte stub instead of HTTP.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# getter(url) -> payload bytes; raises on failure
ByteGetter = Callable[[str], bytes]


def load_csv_reference(spark: SparkSession, path: str) -> DataFrame:
    """S5: header CSV → typed frame (inferSchema for small reference data
    is fine — it is read once and broadcast)."""
    return spark.read.option("header", "true").option("inferSchema", "true").csv(path)


def read_json_dump(
    spark: SparkSession, path: str, field_map: dict[str, str] | None = None
) -> DataFrame:
    """S4: JSON-lines document dump → relational frame; ``field_map``
    renames source fields (P1 projection mapping)."""
    df = spark.read.json(path)
    for src, dst in (field_map or {}).items():
        if src in df.columns:
            df = df.withColumnRenamed(src, dst)
    return df


def media_download_sink(
    files: DataFrame,
    url_col: str,
    path_col: str,
    dest_root: str,
    getter: ByteGetter,
    max_attempts: int = 3,
) -> DataFrame:
    """S12: executor-side download+write with per-row status accounting
    (``etl_files_media_server/main.py:137–400``). Runs in ``mapInPandas``
    so downloads parallelize per partition; the returned frame is the
    bookkeeping update (is_downloaded / attempts / local_path)."""
    schema = f"{url_col} string, local_path string, is_downloaded boolean, attempts int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for url, rel in zip(batch[url_col], batch[path_col]):
                dest = os.path.join(dest_root, rel.lstrip("/"))
                attempts, ok = 0, False
                while attempts < max_attempts and not ok:
                    attempts += 1
                    try:
                        payload = getter(url)
                        os.makedirs(os.path.dirname(dest), exist_ok=True)
                        with open(dest, "wb") as fh:
                            fh.write(payload)
                        ok = True
                    except Exception:
                        pass
                out.append(
                    {url_col: url, "local_path": dest if ok else None,
                     "is_downloaded": ok, "attempts": attempts}
                )
            yield pd.DataFrame(out)

    return files.select(url_col, path_col).mapInPandas(run, schema)
