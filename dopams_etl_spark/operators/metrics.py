"""Model-evaluation metrics as distributed aggregates.

The training-data side of the engine produces scores (quality model,
perplexity, fuzzy-match confidence — the reference thresholds its
pairwise dedup scorer at 0.82/0.60 without ever validating those cuts);
this module closes the loop with the standard threshold-free validation
metric. Everything is expressed as grouped/window aggregates over the
score distribution — never a pairwise positives×negatives comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranking_auc(df: DataFrame, score: str, label: Column | str) -> DataFrame:
    """ROC AUC of ``score`` against boolean ``label`` via the
    Mann-Whitney rank formulation, with midranks for ties:

        AUC = (Σ_{positives} avg_rank − P(P+1)/2) / (P·N)

    Returns ONE row (auc, n_pos, n_neg). Plan shape: scores collapse to
    per-distinct-value (n, n_pos) counts first — the only shuffle keyed
    on the score — then one window over the DISTINCT score values
    computes cumulative ranks (|distinct scores| rows, not |rows|), and
    a final global aggregate folds the rank sum. A naive pairwise
    AUC join is P·N comparisons; this is two aggregations and a skinny
    window, the shape that survives a 100 TB score column. Rows with a
    NULL score or label are excluded. AUC is rounded to 6 decimals;
    degenerate inputs (no positives or no negatives) yield NULL.
    """
    lab: Column = (F.col(label) if isinstance(label, str) else label).cast("boolean")
    per_score = (
        df.filter(F.col(score).isNotNull() & lab.isNotNull())
        .groupBy(F.col(score).alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(lab.cast("long")).alias("n_pos"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_score.withColumn(
        "avg_rank",
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("double")
        + (F.col("n").cast("double") + F.lit(1.0)) / F.lit(2.0),
    )
    return ranked.agg(
        F.sum(F.col("n_pos") * F.col("avg_rank")).alias("rank_sum"),
        F.sum("n_pos").alias("n_pos"),
        F.sum(F.col("n") - F.col("n_pos")).alias("n_neg"),
    ).select(
        F.round(
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                (
                    F.col("rank_sum")
                    - F.col("n_pos").cast("double")
                    * (F.col("n_pos").cast("double") + F.lit(1.0))
                    / F.lit(2.0)
                )
                / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double")),
            ),
            6,
        ).alias("auc"),
        "n_pos",
        "n_neg",
    )
