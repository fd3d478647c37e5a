"""Declarative data-quality expectations — the generic form of the
reference's ad-hoc validation layer (FK checks ``etl_crimes.py:661–670``,
blank/type normalization, dedup guards), stated as rules and evaluated in
ONE aggregate pass.

Rule kinds:
- ``not_null``      — column must be non-null
- ``unique``        — column values must be distinct
- ``range``         — numeric column within [lo, hi] (inclusive)
- ``in_set``        — column value in an allowed literal set
- ``matches``       — string column matches a regex (fully)

Evaluation is a single ``agg`` over the table: each rule contributes one
conditional-count expression, so a 50-rule contract costs one scan and
one one-row result regardless of table size (uniqueness is the
exception: it needs its own count-distinct pass, and the operator keeps
it to ONE extra aggregate however many unique rules there are). The
report is long-form (rule, column, violations, pass) — the shape a
quality dashboard or a circuit-breaker ingest gate consumes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Rule = tuple  # (kind, column, *params)


def _violation_expr(rule: Rule) -> Column:
    kind, col = rule[0], rule[1]
    c = F.col(col)
    if kind == "not_null":
        bad = c.isNull()
    elif kind == "range":
        lo, hi = rule[2], rule[3]
        bad = c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))
    elif kind == "in_set":
        allowed = list(rule[2])
        bad = c.isNull() | ~c.isin(allowed)
    elif kind == "matches":
        # anchored: the whole value must match (rlike alone is find-anywhere)
        pat = rule[2]
        bad = c.isNull() | ~c.rlike(f"^(?:{pat})$")
    else:
        raise ValueError(f"unknown rule kind {kind!r}")
    # COALESCE(…, 0): on an EMPTY table SUM is NULL, which used to
    # int(None)-crash the report (r13 fuzz census) — an empty table has
    # zero violations and every rule vacuously passes, the same
    # convention the SQL oracle states with COALESCE.
    return F.coalesce(
        F.sum(F.when(bad, 1).otherwise(0)).cast("long"), F.lit(0).cast("long")
    )


def expect(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate a rule contract; returns (rule, column, violations, pass)
    rows in rule order."""
    scalar_rules = [r for r in rules if r[0] != "unique"]
    unique_rules = [r for r in rules if r[0] == "unique"]

    aggs = [
        _violation_expr(r).alias(f"__v{i}") for i, r in enumerate(scalar_rules)
    ]
    aggs.append(F.count(F.lit(1)).alias("__total"))
    # the same aggregate pass covers every unique rule via count-distinct
    for j, r in enumerate(unique_rules):
        aggs.append(F.countDistinct(F.col(r[1])).alias(f"__d{j}"))
    row = df.agg(*aggs).collect()[0]

    out = []
    si = ui = 0
    for r in rules:
        if r[0] == "unique":
            # violations = EXCESS rows: total minus distinct non-null keys
            # (every row past the first with its key, plus null-key rows)
            viol = int(row["__total"] - row[f"__d{ui}"])
            ui += 1
        else:
            viol = int(row[f"__v{si}"])
            si += 1
        out.append((r[0], r[1], viol, viol == 0))
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "rule string, column string, violations long, pass boolean"
    )
