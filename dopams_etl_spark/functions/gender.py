"""Gender inference (SURVEY §2.8 D11) as pure column expressions.

Parity with ``etl-persons/etl_persons.py:158–283``:

- API-gender normalization map (m/f/t tokens → Male/Female/Transgender;
  None → Unknown; unmapped → invalid).
- Name-validity gate: ≥2 alpha chars, alpha ratio ≥ 0.35, placeholder
  phrases ('unknown person', 'name not known', …) rejected.
- Suffix heuristics on the first alpha token (len>1): female
  (a/i/ya/ika/ita) 0.8, male (esh/endra/kumar/raj/veer) 0.8; a small rule
  map wins at 0.9.
- Source-priority: a valid API gender is never overridden.

Returns (gender, confidence, source) columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GENDER_MAP = {
    "m": "Male", "male": "Male", "man": "Male", "boy": "Male",
    "f": "Female", "female": "Female", "woman": "Female", "girl": "Female",
    "t": "Transgender", "tg": "Transgender", "transgender": "Transgender",
    "trans": "Transgender", "third gender": "Transgender",
    "unknown": "Unknown", "u": "Unknown", "not known": "Unknown", "": "Unknown",
}

# Tiny default rule map (the reference loads a configurable one).
NAME_GENDER_RULES = {"ramesh": "Male", "suresh": "Male", "sita": "Female", "gita": "Female"}

FEMALE_SUFFIXES = ("a", "i", "ya", "ika", "ita")
MALE_SUFFIXES = ("esh", "endra", "kumar", "raj", "veer")

PLACEHOLDER_RX = r"\b(name\s+not\s+known|unknown\s+person(s)?|absconding\s+accused|dead\s+body|unidentified)\b"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_api_gender(col: Column | str) -> Column:
    """None → 'Unknown'; mapped token → canonical; unmapped → NULL (invalid)."""
    raw = F.lower(F.trim(F.regexp_replace(_c(col).cast("string"), r"\s+", " ")))
    m = F.create_map(*[F.lit(x) for k, v in GENDER_MAP.items() for x in (k, v)])
    return F.when(_c(col).isNull(), F.lit("Unknown")).otherwise(m[raw])


def is_valid_person_name(col: Column | str) -> Column:
    name = F.lower(F.trim(_c(col)))
    alpha = F.regexp_replace(name, r"[^a-z]", "")
    alpha_ratio = F.length(alpha) / F.greatest(F.length(name), F.lit(1)).cast("double")
    return (
        name.isNotNull()
        & (name != "")
        & (F.length(alpha) >= 2)
        & (alpha_ratio >= 0.35)
        & ~name.rlike(PLACEHOLDER_RX)
    )


def _first_token(col: Column | str) -> Column:
    toks = F.filter(
        F.regexp_extract_all(F.lower(_c(col)), F.lit(r"[a-z]+"), 0),
        lambda x: F.length(x) > 1,
    )
    return F.when(F.size(toks) > 0, toks.getItem(0))


def infer_gender_from_name(col: Column | str) -> tuple[Column, Column, Column]:
    """(gender|NULL, confidence, source) from the first name token."""
    first = _first_token(col)
    rules = F.create_map(*[F.lit(x) for k, v in NAME_GENDER_RULES.items() for x in (k, v)])
    rule_hit = rules[first]
    female = F.lit(False)
    for s in FEMALE_SUFFIXES:
        female = female | first.endswith(s)
    male = F.lit(False)
    for s in MALE_SUFFIXES:
        male = male | first.endswith(s)
    gender = (
        F.when(first.isNull(), F.lit(None).cast("string"))
        .when(rule_hit.isNotNull(), rule_hit)
        .when(female, F.lit("Female"))
        .when(male, F.lit("Male"))
    )
    conf = (
        F.when(first.isNull(), F.lit(0.0))
        .when(rule_hit.isNotNull(), F.lit(0.9))
        .when(female | male, F.lit(0.8))
        .otherwise(F.lit(0.0))
    )
    source = F.when(rule_hit.isNotNull(), F.lit("rule")).otherwise(F.lit("heuristic"))
    return gender, conf, source


def resolve_gender(
    name_col: Column | str,
    api_gender_col: Column | str,
    threshold: float = 0.6,
) -> list[Column]:
    """Full D11 cascade → [gender, gender_confidence, gender_source]."""
    api = normalize_api_gender(api_gender_col)
    api_valid = api.isin("Male", "Female", "Transgender")
    name_ok = is_valid_person_name(name_col)
    inferred, conf, src = infer_gender_from_name(name_col)
    use_inferred = inferred.isNotNull() & (conf >= threshold)

    gender = (
        F.when(api_valid, api)
        .when(~name_ok, F.lit("Unknown"))
        .when(use_inferred, inferred)
        .otherwise(F.lit("Unknown"))
    )
    confidence = (
        F.when(api_valid, F.lit(1.0))
        .when(~name_ok, F.lit(0.0))
        .when(use_inferred, conf)
        .when(api == "Unknown", conf)
        .otherwise(conf)
    )
    source = (
        F.when(api_valid, F.lit("api"))
        .when(~name_ok, F.lit("invalid_name"))
        .otherwise(src)
    )
    return [
        gender.alias("gender"),
        F.round(confidence, 2).alias("gender_confidence"),
        source.alias("gender_source"),
    ]
