"""Source / extraction layer (SURVEY §2.1 S1–S5, S12).

API-bound feeds are driver-planned, executor-fetched; file/reference data
goes through plain ``spark.read``. Every network-touching step takes a
pluggable fetcher callable so tests run on deterministic stubs.
"""

from dopams_etl_spark.sources.api import (
    RetryPolicy,
    fetch_chunked,
    point_lookup_enrich,
    should_retry,
)
from dopams_etl_spark.sources.files import (
    load_csv_reference,
    media_download_sink,
    read_json_dump,
)

__all__ = [
    "RetryPolicy",
    "fetch_chunked",
    "load_csv_reference",
    "media_download_sink",
    "point_lookup_enrich",
    "read_json_dump",
    "should_retry",
]
