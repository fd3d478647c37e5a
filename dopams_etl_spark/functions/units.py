"""Unit conversion / standardization (SURVEY §2.7 F7).

Reference: drug-quantity standardization g↔kg, ml↔L, bottles→ml, and
liquid reclassification weight→volume for syrups/injections
(``brief_facts_ai/extractor_drugs.py:692–811``,
``etl-mongo-to-postgresql/etl_migration.py:227–267``). Pure ``F.when``
arithmetic chains — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# raw unit token → (canonical dimension, factor to canonical base unit)
# base units: weight → grams, volume → ml, count → units
UNIT_MAP: dict[str, tuple[str, float]] = {
    "g": ("weight", 1.0),
    "gm": ("weight", 1.0),
    "gms": ("weight", 1.0),
    "gram": ("weight", 1.0),
    "grams": ("weight", 1.0),
    "kg": ("weight", 1000.0),
    "kgs": ("weight", 1000.0),
    "mg": ("weight", 0.001),
    "ml": ("volume", 1.0),
    "l": ("volume", 1000.0),
    "ltr": ("volume", 1000.0),
    "litre": ("volume", 1000.0),
    "litres": ("volume", 1000.0),
    "bottle": ("volume", 100.0),
    "bottles": ("volume", 100.0),
    "tab": ("count", 1.0),
    "tabs": ("count", 1.0),
    "tablet": ("count", 1.0),
    "tablets": ("count", 1.0),
    "pcs": ("count", 1.0),
    "units": ("count", 1.0),
}

LIQUID_FORMS = ("syrup", "injection", "liquid", "solution")


def _dimension(unit: Column) -> Column:
    expr = None
    for tok, (dim, _) in UNIT_MAP.items():
        cond = unit == tok
        expr = F.when(cond, F.lit(dim)) if expr is None else expr.when(cond, F.lit(dim))
    return expr.otherwise(F.lit("unknown"))


def _factor(unit: Column) -> Column:
    expr = None
    for tok, (_, fac) in UNIT_MAP.items():
        cond = unit == tok
        expr = F.when(cond, F.lit(fac)) if expr is None else expr.when(cond, F.lit(fac))
    return expr.otherwise(F.lit(None).cast("double"))


def standardize_quantity(
    qty_col: Column | str,
    unit_col: Column | str,
    form_col: Column | str | None = None,
) -> list[Column]:
    """Return [dimension, weight_g, weight_kg, volume_ml, volume_l, count_total]
    columns. Liquid forms reclassify a weight reading into volume (parity with
    ``extractor_drugs.py:760–811``)."""
    qty = (F.col(qty_col) if isinstance(qty_col, str) else qty_col).cast("double")
    unit = F.lower(F.trim(F.col(unit_col) if isinstance(unit_col, str) else unit_col))
    dim = _dimension(unit)
    base = qty * _factor(unit)

    if form_col is not None:
        form = F.lower(F.trim(F.col(form_col) if isinstance(form_col, str) else form_col))
        is_liquid = form.isin(*LIQUID_FORMS)
        dim = F.when(is_liquid & (dim == "weight"), F.lit("volume")).otherwise(dim)

    weight_g = F.when(dim == "weight", F.round(base, 6)).alias("weight_g")
    weight_kg = F.when(dim == "weight", F.round(base / 1000.0, 6)).alias("weight_kg")
    volume_ml = F.when(dim == "volume", F.round(base, 6)).alias("volume_ml")
    volume_l = F.when(dim == "volume", F.round(base / 1000.0, 6)).alias("volume_l")
    count_total = F.when(dim == "count", F.round(base, 6)).alias("count_total")
    return [dim.alias("dimension"), weight_g, weight_kg, volume_ml, volume_l, count_total]


def display_unit(weight_g: Column, volume_ml: Column, count_total: Column) -> Column:
    """CASE cascade picking the display unit (``firs_mv.sql:58–71``)."""
    return (
        F.when(weight_g >= 1000.0, F.lit("kg"))
        .when(weight_g.isNotNull(), F.lit("g"))
        .when(volume_ml >= 1000.0, F.lit("L"))
        .when(volume_ml.isNotNull(), F.lit("ml"))
        .when(count_total.isNotNull(), F.lit("count"))
        .otherwise(F.lit(None).cast("string"))
    )
