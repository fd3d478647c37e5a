"""Deterministic id generation (SURVEY §2.7 F9).

Reference: ``uuid5(namespace, crime_id|name|seq)`` synthetic accused ids
(``brief_facts_ai/main.py:72–79``), ``uuid_generate_v5`` flat-view ids
(``unified_brief_facts_etl.sql:74–75``), MD5 fingerprints for dedup tiers
(``fix_fullname/create_person_deduplication_table.py:516–560``).

``fingerprint`` is a pure JVM expression (md5 of '|'-joined parts, null-safe)
— the workhorse for dedup blocking keys at scale. ``uuid5_expr`` formats the
md5 digest as an RFC-4122-shaped uuid5 string, also JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fingerprint(*cols: Column | str, sep: str = "|") -> Column:
    """md5 over lower/trimmed, null-safe '|'-joined parts."""
    parts = [
        F.coalesce(F.lower(F.trim((F.col(c) if isinstance(c, str) else c).cast("string"))), F.lit(""))
        for c in cols
    ]
    return F.md5(F.concat_ws(sep, *parts))


def uuid5_expr(*cols: Column | str, namespace: str = "dopams") -> Column:
    """Deterministic uuid5-shaped id from md5(namespace|parts)."""
    digest = fingerprint(F.lit(namespace), *cols)
    return F.concat_ws(
        "-",
        F.substring(digest, 1, 8),
        F.substring(digest, 9, 4),
        F.concat(F.lit("5"), F.substring(digest, 14, 3)),
        F.substring(digest, 17, 4),
        F.substring(digest, 21, 12),
    )
