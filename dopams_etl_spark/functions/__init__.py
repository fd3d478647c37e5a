"""Scalar column-expression library.

Everything here is a pure Column expression (JVM-side, whole-stage-codegen
friendly). Python/pandas UDFs are quarantined in ``operators`` where the
semantics genuinely need them (rapidfuzz-style scoring, embeddings).
"""

from dopams_etl_spark.functions.cleaning import (
    coerce_bool,
    collapse_whitespace,
    normalize_blank,
    strip_alias,
    truncate_str,
)
from dopams_etl_spark.functions.datetime_utils import (
    days_since,
    due_date,
    overdue_bucket,
    to_ist,
)
from dopams_etl_spark.functions.ids import fingerprint, uuid5_expr
from dopams_etl_spark.functions.status import normalize_status
from dopams_etl_spark.functions.textfns import (
    char_ngrams,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    word_shingles,
)
from dopams_etl_spark.functions.units import standardize_quantity

__all__ = [
    "char_ngrams",
    "coerce_bool",
    "collapse_whitespace",
    "days_since",
    "due_date",
    "fingerprint",
    "lang_id",
    "normalize_blank",
    "normalize_status",
    "overdue_bucket",
    "punct_ratio",
    "quality_score",
    "standardize_quantity",
    "stopword_ratio",
    "strip_alias",
    "to_ist",
    "token_count",
    "truncate_str",
    "uuid5_expr",
    "word_shingles",
]
