"""Geo imputation (SURVEY §2.8 D13) — mandal/locality lookup from address
text against a broadcast geo reference dimension.

Reference (``update-mandal/mandal_imputation_from_address.py:82–300``):
token containment against a geo cache first, SequenceMatcher fuzzy second.
Spark restatement: explode address tokens → equi-join the broadcast geo
dim on the token (the containment stage — a hash join, no scan per row),
deterministic best-match pick; the fuzzy tail reuses
``fuzzy_join_levenshtein`` with its blocking key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def impute_geo_from_address(
    df: DataFrame,
    id_col: str,
    addr_col: str,
    geo: DataFrame,
    geo_name_col: str,
    out_col: str = "imputed_geo",
) -> DataFrame:
    """Token-containment stage: an address token equal to a geo name is a
    hit; ties pick the longest geo name, then alphabetical. Rows with no
    hit carry NULL (route those to the fuzzy stage)."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.lower(F.trim(F.col(addr_col))), r"\s+")).alias("tok")
    )
    g = geo.select(F.lower(F.trim(F.col(geo_name_col))).alias("tok")).dropDuplicates(["tok"])
    hits = toks.join(F.broadcast(g), "tok")
    w = Window.partitionBy(id_col).orderBy(F.length("tok").desc(), F.col("tok").asc())
    best = (
        hits.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col("tok").alias(out_col))
    )
    return df.join(best, id_col, "left")
