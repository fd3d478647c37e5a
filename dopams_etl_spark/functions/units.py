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
# Token sets mirror ``extractor_drugs.py:715–764`` — in particular
# bottle/bottles are COUNT units there (no invented ml-per-bottle factor).
UNIT_MAP: dict[str, tuple[str, float]] = {
    **{u: ("weight", 1.0) for u in ("g", "gm", "gms", "gram", "grams", "grm", "grms", "gr")},
    **{u: ("weight", 1000.0) for u in ("kg", "kgs", "kilogram", "kilograms", "kilo", "kilos")},
    **{u: ("weight", 0.001) for u in ("mg", "milligram", "milligrams")},
    **{u: ("volume", 1000.0) for u in ("l", "ltr", "ltrs", "liter", "liters", "litre", "litres")},
    **{u: ("volume", 1.0) for u in ("ml", "milliliter", "milliliters", "millilitre", "millilitres")},
    **{
        u: ("count", 1.0)
        for u in (
            "no", "nos", "number", "numbers", "piece", "pieces", "pcs",
            "tab", "tabs", "tablet", "tablets", "pill", "pills", "strip", "strips",
            "box", "boxes", "packet", "packets", "sachet", "sachets",
            "blot", "blots", "dot", "dots", "bottle", "bottles",
            "unit", "units", "count", "counts",
            "plant", "plants", "tree", "trees", "sapling", "saplings",
            "seedling", "seedlings", "bush", "bushes",
            "cover", "covers", "polythene", "wrap", "bundle", "bundles",
            "puri", "puris", "katta", "kattas", "pouch", "pouches",
            "vial", "vials", "ampule", "ampules", "ampoule", "ampoules",
            "injection", "injections", "capsule", "capsules",
        )
    },
}

LIQUID_FORMS = ("syrup", "injection", "liquid", "solution")


def _dimension(unit: Column) -> Column:
    # Literal map lookup — one expression, not a 60-branch CASE chain.
    m = F.create_map(*[F.lit(x) for tok, (dim, _) in UNIT_MAP.items() for x in (tok, dim)])
    return F.coalesce(m[unit], F.lit("unknown"))


def _factor(unit: Column) -> Column:
    m = F.create_map(*[F.lit(x) for tok, (_, fac) in UNIT_MAP.items() for x in (tok, fac)])
    return m[unit]


def standardize_quantity(
    qty_col: Column | str,
    unit_col: Column | str,
    form_col: Column | str | None = None,
) -> list[Column]:
    """Return [dimension, weight_g, weight_kg, volume_ml, volume_l, count_total]
    columns. Liquid forms reclassify a weight reading into volume (parity with
    ``extractor_drugs.py:760–811``)."""
    qty = (F.col(qty_col) if isinstance(qty_col, str) else qty_col).cast("double")
    # Strict normalization parity: lowercase, strip, remove non-alpha
    # (``extractor_drugs.py:713``).
    unit = F.regexp_replace(
        F.lower(F.trim(F.col(unit_col) if isinstance(unit_col, str) else unit_col)), "[^a-z]", ""
    )
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
