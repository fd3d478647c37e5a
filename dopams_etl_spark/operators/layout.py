"""Data-layout optimization: Morton (Z-order) interleaving for
multi-dimensional file clustering.

At 100 TB the dominant cost of a selective query is how many files its
predicates let the scanner SKIP. Partitioning prunes on one column;
queries that filter on several (user AND time, district AND date) need the
row→file mapping to cluster in every filtered dimension at once. The
standard answer (Delta OPTIMIZE ZORDER BY, Iceberg sort orders) is to sort
by a space-filling curve: quantize each clustering column to b bits and
bit-interleave them so file-contiguous row ranges are hypercubes — every
file then carries a TIGHT min/max span in each dimension and column
statistics prune it for predicates on any clustered column, not just the
leading sort key.

Everything here is plain column arithmetic (quantize, shift, OR), fully
portable: the same formula is replayable in any SQL engine, which is how
the oracle checks it bit-for-bit. The only non-map step is the global
min/max aggregate fixing the quantization bounds — a one-row broadcast
(the same bounded-scalar class as the watermark/centroid fetches); write
paths that know their domain statically pass explicit bounds instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale ``col`` from [lo, hi] to an integer cell in [0, 2^bits − 1].

    Cell = floor((x − lo) / (hi − lo) · 2^bits), clamped so x = hi lands in
    the top cell and a degenerate domain (hi = lo) maps everything to 0.
    Double math with explicit floor — portable across engines.
    """
    cells = float(2**bits)
    span = hi.cast("double") - lo.cast("double")
    raw = F.floor((col.cast("double") - lo.cast("double")) / span * cells).cast("long")
    return (
        F.when(span <= 0, F.lit(0))
        .otherwise(F.greatest(F.lit(0), F.least(F.lit(int(cells) - 1), raw)))
        .cast("long")
    )


def morton_interleave(cells: Sequence[Column], bits: int) -> Column:
    """Bit-interleave k quantized cells (each in [0, 2^bits)) into one
    Z-order code: output bit (i·k + j) takes bit i of cell j, so
    ascending-code order walks the Z curve. Built as a constant-folded
    sum of shift/mask terms — k·bits JVM integer ops per row, no UDF."""
    code: Column = F.lit(0).cast("long")
    k = len(cells)
    for j, c in enumerate(cells):
        for i in range(bits):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            code = code + F.shiftleft(bit, i * k + j)
    return code


def zorder_code(
    df: DataFrame, cols: Sequence[str], bits: int = 8, bounds: dict[str, tuple] | None = None
) -> DataFrame:
    """Append a ``zcode`` column interleaving ``cols`` at ``bits`` bits
    each. Bounds default to the frame's global min/max per column (one
    single-row aggregate, broadcast back — constant-size build side);
    pass ``bounds`` to pin them statically and make the op map-only.

    Writing with ``df.repartitionByRange(n, "zcode").sortWithinPartitions
    ("zcode")`` then yields files whose per-column min/max spans shrink by
    ~2^bits/n per dimension — the layout the scan-pruning tests measure.
    """
    if bounds is None:
        agg = df.agg(
            *[F.min(c).alias(f"__lo_{c}") for c in cols],
            *[F.max(c).alias(f"__hi_{c}") for c in cols],
        )
        out = df.crossJoin(F.broadcast(agg))
        lo = {c: F.col(f"__lo_{c}") for c in cols}
        hi = {c: F.col(f"__hi_{c}") for c in cols}
    else:
        out = df
        lo = {c: F.lit(bounds[c][0]) for c in cols}
        hi = {c: F.lit(bounds[c][1]) for c in cols}
    cells = [quantize(F.col(c), lo[c], hi[c], bits) for c in cols]
    out = out.withColumn("zcode", morton_interleave(cells, bits))
    return out.drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])


def zorder_bounds_sql(cols: Sequence[str], table: str) -> str:
    """SQL for the one-row bounds CTE body the oracle shares with
    ``zorder_code``'s broadcast aggregate."""
    bounds = ", ".join(
        f"MIN(CAST({c} AS DOUBLE)) AS lo_{c}, MAX(CAST({c} AS DOUBLE)) AS hi_{c}"
        for c in cols
    )
    return f"SELECT {bounds} FROM {table}"


def zorder_code_sql(cols: Sequence[str], bits: int) -> str:
    """The DuckDB restatement of ``zorder_code``'s zcode expression —
    the same quantize + interleave arithmetic generated as one SQL
    expression (referencing lo_<col>/hi_<col> from the bounds CTE), so
    the oracle checks the curve bit-for-bit."""
    k = len(cols)
    cells = []
    for c in cols:
        cells.append(
            f"CAST(CASE WHEN (hi_{c} - lo_{c}) <= 0 THEN 0 "
            f"ELSE GREATEST(0, LEAST({2**bits - 1}, "
            f"CAST(floor((CAST({c} AS DOUBLE) - lo_{c}) / (hi_{c} - lo_{c}) "
            f"* {float(2**bits)}) AS BIGINT))) END AS BIGINT)"
        )
    terms = []
    for j, cell in enumerate(cells):
        for i in range(bits):
            terms.append(f"((({cell} >> {i}) & 1) << {i * k + j})")
    return " + ".join(terms)
