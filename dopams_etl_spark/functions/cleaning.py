"""Null/blank normalization, coercion, truncation (SURVEY §2.2 P2/P3).

Reference behaviors reproduced as pure column expressions:
- ``normalize_blank``: '' and 'na'/'n/a'/'none'/'null' tokens → NULL
  (``etl-properties/etl_properties.py:617–623``).
- ``truncate_str``: VARCHAR(n) manual truncation parity
  (``etl-persons/etl_persons.py:1043–1054``).
- ``coerce_bool``: permissive boolean parsing
  (``etl-properties/etl_properties.py:578–657``).
- ``strip_alias``: drop '@alias' suffix from names
  (``brief_facts_ai/main.py:136–144``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NULL_TOKENS = ("", "na", "n/a", "none", "null", "-")


def normalize_blank(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.lower(trimmed).isin(*NULL_TOKENS), F.lit(None)).otherwise(trimmed)


def truncate_str(col: Column | str, n: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n)


def collapse_whitespace(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def coerce_bool(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(F.trim(c.cast("string")))
    return (
        F.when(lowered.isin("true", "t", "yes", "y", "1"), F.lit(True))
        .when(lowered.isin("false", "f", "no", "n", "0"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def strip_alias(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.split(c, "@").getItem(0))


def with_json_overflow(df, known_cols: list[str], overflow_col: str = "additional_json_data"):
    """Schema-evolution overflow convention (SURVEY §1.3,
    ``etl_crimes.py:499–524``): keep the known columns typed, pack every
    unknown column into one JSON-string column so no field is ever
    dropped. Reader-side schema union (``mergeSchema``) covers additive
    typed columns; this covers the truly unknown tail."""
    from pyspark.sql import functions as F  # local to avoid cycle confusion

    unknown = [c for c in df.columns if c not in known_cols]
    keep = [c for c in known_cols if c in df.columns]
    if not unknown:
        return df.select(*keep).withColumn(overflow_col, F.lit(None).cast("string"))
    return df.select(*keep, F.to_json(F.struct(*unknown)).alias(overflow_col))


def coerce_numeric(col: Column | str) -> Column:
    """P3 numeric coercion (``etl_properties.py:578–657``): strip currency
    symbols / thousand separators / spaces, then try-cast — unparseable
    input becomes NULL, never an error."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.trim(c.cast("string")), r"[,₹$\s]", "")
    return F.nullif(cleaned, F.lit("")).try_cast("double")
