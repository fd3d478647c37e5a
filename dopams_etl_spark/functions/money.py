"""Exact money aggregation via integer cents.

Summing DECIMAL(18,2) columns keeps money exact under any partitioning,
but Spark's decimal aggregate runs ~2× slower than a long sum (measured
0.62 s vs 0.36 s for the q1 aggregate at sf0.1). For 2-decimal money
the same exactness comes cheaper: scale to integer CENTS before the
aggregate (``round(x*100)`` — the input is 2-dp so the rounding only
strips float representation noise, never a real digit), SUM the longs
(integer addition is associative: partitioning-invariant), and format
back through DECIMAL(18,2) AFTER the aggregate, on group-count rows.
The output strings are bit-identical to the decimal-sum path, so DuckDB
oracles that sum DECIMAL directly still match value-for-value.

Overflow headroom: 9.2e18 long ÷ (1e7 cents/row avg) ≈ 9e11 rows per
GROUP — beyond that (or for >2-dp currencies) fall back to the decimal
sum.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(18,2)"


def money_cents(col: Column | str) -> Column:
    """2-dp money column → exact integer cents (long).

    cast("double") before scaling (r14 f32 census): identity on the live
    float64 fixtures, but on a float32-narrowed fixture the bare
    ``c * 100`` multiplies in the float32 lane (24-bit rounding loses
    whole cents above ~2^18 dollars) while every DECIMAL-summing oracle
    promotes through double — q1's sum_base_price drifted 4 cents until
    both sides scaled the same promoted double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double") * 100, 0).cast("long")


def cents_to_money_string(col: Column | str) -> Column:
    """Summed cents (long) → canonical '1234.00'-style string, exact
    (decimal division, never a double). Post-aggregate only: runs on
    group-count rows."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("decimal(38,0)") / 100).cast(_DEC).cast("string")


def money_quantize(col: Column | str) -> Column:
    """2-dp money column → exact DECIMAL(18,2) via the PORTABLE cents
    quantizer: ``floor(x*100 + 0.5)`` on the promoted double is pure
    IEEE arithmetic, identical on both engines even when a fixture
    regen narrows the column to float32 (a .625 half-cent tie rounds
    HALF_UP in Spark's double→DECIMAL cast but half-even in DuckDB's).
    One implementation for every engine restatement — the SQL twins
    spell the same ``floor(CAST(x AS DOUBLE) * 100 + 0.5) / 100.0``.

    POSITIVE-DOMAIN ONLY: ``floor(x*100 + 0.5)`` rounds a NEGATIVE
    half-cent toward +infinity (-1.005 → -1.00), not the HALF_UP that
    DECIMAL casts apply (-1.01). Engine/oracle parity still holds
    (both sides share the formula), but for signed money (refunds,
    adjustments) use ``floor(abs(x)*100 + 0.5) * sign(x)`` on BOTH
    sides instead. All current callers quantize TPC-H prices/revenues,
    which are strictly positive."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        (F.floor(c.cast("double") * 100 + F.lit(0.5)) / F.lit(100.0)).cast(_DEC)
    )
