"""NDPS section classification + domicile rules (SURVEY §2.8 D9/D10).

Rule classifiers as pure column expressions over an exploded section-token
column:

- D9 (``section-wise-case-clarification/process_sections.py:44–310``):
  normalize tokens ('27-A' → '27a', '20(b)(ii)(C)' → '20biic'), classify
  each (numbers-only → small, '8c' → small, '20a' → cultivation,
  '27*' → small, trailing a/b/c → small/intermediate/commercial), then roll
  up per row by priority cultivation > commercial > intermediate > small.
- D10 (``domicile_classification/domicile_classifier.py:163–220``):
  country(permanent → present → nationality) ≠ india → international;
  home state → native; other Indian state → inter-state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CLASS_PRIORITY = ("cultivation", "commercial", "intermediate", "small")


def normalize_section_token(col: Column | str) -> Column:
    """'27-A' → '27a'; '20(b)(ii)(C)' → '20biic' (keep [a-z0-9] only)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"[^a-z0-9]", "")


def classify_section_token(norm: Column) -> Column:
    """Per-token NDPS class (D9 token rules)."""
    last = F.substring(norm, -1, 1)
    return (
        F.when(norm.rlike(r"^[0-9]+$"), F.lit("small"))
        .when(norm == "8c", F.lit("small"))
        .when(norm == "20a", F.lit("cultivation"))
        .when(norm.startswith("27"), F.lit("small"))
        .when(last == "a", F.lit("small"))
        .when(last == "b", F.lit("intermediate"))
        .when(last == "c", F.lit("commercial"))
        .otherwise(F.lit("small"))
    )


def classify_sections(df: DataFrame, sections_col: str, key_col: str) -> DataFrame:
    """Split an 'acts_sections' list column, classify tokens, roll up per key
    by priority. Returns (key, class_classification)."""
    toks = df.select(
        F.col(key_col),
        F.explode(F.split(F.col(sections_col), r",")).alias("raw_token"),
    ).withColumn("norm", normalize_section_token(F.col("raw_token")))
    classified = toks.withColumn("cls", classify_section_token(F.col("norm")))
    rank = None
    for i, label in enumerate(CLASS_PRIORITY):
        cond = F.col("cls") == label
        rank = F.when(cond, F.lit(i)) if rank is None else rank.when(cond, F.lit(i))
    classified = classified.withColumn("rank", rank.otherwise(F.lit(len(CLASS_PRIORITY))))
    best = classified.groupBy(key_col).agg(F.min("rank").alias("best_rank"))
    label_expr = None
    for i, label in enumerate(CLASS_PRIORITY):
        cond = F.col("best_rank") == i
        label_expr = (
            F.when(cond, F.lit(label)) if label_expr is None else label_expr.when(cond, F.lit(label))
        )
    return best.select(
        F.col(key_col), label_expr.otherwise(F.lit("small")).alias("class_classification")
    )


def classify_domicile(
    perm_country: Column,
    pres_country: Column,
    nationality: Column,
    state: Column,
    home_state: str = "telangana",
) -> Column:
    """D10 domicile cascade."""
    country = F.lower(F.trim(F.coalesce(perm_country, pres_country, nationality)))
    st = F.lower(F.trim(state))
    return (
        F.when(country.isNotNull() & (country != "india"), F.lit("international"))
        .when(st == home_state, F.lit("native"))
        .when(st.isNotNull(), F.lit("inter_state"))
        .otherwise(F.lit("unknown"))
    )
