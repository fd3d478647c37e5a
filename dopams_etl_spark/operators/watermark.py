"""Incremental-ingest core: watermarks, chunk planning, checkpoints
(SURVEY §2.9 I1–I3).

Reference: effective start = GREATEST(max(date_created), max(date_modified))
clamped to a floor (``etl-crimes/etl_crimes.py:246–290``); 5-day chunks with
1-day overlap (``:354–379``); ``etl_run_state`` checkpoint table
(``etl-accused/etl_accused.py:331–397``).

Spark restatement: the watermark is one agg over the target table (or the
checkpoint table when present); chunking survives as a *planning* helper for
API-bound feeds — a parquet/Delta batch read needs no overlap because the
predicate is exact; late rows are handled by latest-wins dedup (I2).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FLOOR = datetime(2022, 1, 1)


def compute_watermark(
    target: DataFrame, created_col: str = "date_created", modified_col: str = "date_modified",
    floor: datetime = FLOOR,
) -> datetime:
    """I1: GREATEST(max(created), max(modified)) clamped to >= floor.
    Empty table → floor (full backfill)."""
    row = target.agg(
        F.max(created_col).alias("c"), F.max(modified_col).alias("m")
    ).collect()[0]
    candidates = [v for v in (row["c"], row["m"]) if v is not None]
    if not candidates:
        return floor
    return max(max(candidates), floor)


def plan_chunks(
    start: datetime, end: datetime, chunk_days: int = 5, overlap_days: int = 1
) -> list[tuple[datetime, datetime]]:
    """I2: overlapping date-range windows for API-bound extraction."""
    chunks: list[tuple[datetime, datetime]] = []
    cur = start
    step = timedelta(days=chunk_days)
    overlap = timedelta(days=overlap_days)
    while cur < end:
        chunk_end = min(cur + step, end)
        chunks.append((cur, chunk_end))
        if chunk_end >= end:
            break
        cur = chunk_end - overlap
    return chunks


def incremental_filter(
    feed: DataFrame, watermark: datetime, created_col: str = "date_created",
    modified_col: str = "date_modified",
) -> DataFrame:
    """Exact-predicate incremental read — pushed to the parquet scan."""
    return feed.filter(
        (F.col(created_col) > F.lit(watermark)) | (F.col(modified_col) > F.lit(watermark))
    )


class CheckpointStore:
    """I3: ``etl_run_state`` analog — module_name → last_successful_end.

    JSON file store (single small state object; a Delta table on a real
    cluster). Writes are atomic via rename."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> dict[str, str]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def get(self, module: str) -> datetime | None:
        raw = self.load().get(module)
        return datetime.fromisoformat(raw) if raw else None

    def set(self, module: str, end: datetime) -> None:
        state = self.load()
        state[module] = end.isoformat()
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=2, sort_keys=True)
        os.replace(tmp, self.path)
