"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry and its DuckDB oracle on the
same parquet tables, canonicalizes (columns sorted by name, rows sorted),
and compares row count, column names, and values. Float cells compare
within 1e-9 after the query's own rounding — anything bigger is a FAIL,
mirroring the driver's value-hash check.

Usage:
    python tools/check.py             # all queries, sf0.001
    python tools/check.py q1 firs_mv  # subset
    python tools/check.py --sample 50 # first N of the driver's
                                      # priority order (what the round
                                      # driver will actually sample)
    CHECK_SF_DIR=/root/testdata/sf0.01 python tools/check.py
    CHECK_STRICT=1 python tools/check.py
                                      # float cells must be repr-IDENTICAL
                                      # (bitwise), not merely within 1e-9 —
                                      # the driver hashes raw cell reprs, so
                                      # a query that needs the tolerance
                                      # here is a latent driver-gate red
                                      # (the r10 MMR mu=1-lam ulp bug)
"""

from __future__ import annotations

import decimal
import math
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dopams_etl_spark.catalog import TABLES  # noqa: E402

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.001")
STRICT = os.environ.get("CHECK_STRICT", "") not in ("", "0")


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: None
                if v is None or (isinstance(v, float) and math.isnan(v))
                else str(v)
            )
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def _is_null(v) -> bool:
    return v is None or (isinstance(v, float) and math.isnan(v))


def cells_equal(a, b) -> bool:
    if _is_null(a) or _is_null(b):
        return _is_null(a) and _is_null(b)
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if STRICT:
            return repr(fa) == repr(fb)
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if (a is None) != (b is None):
        # pandas NaN-vs-None noise
        af = a is None or (isinstance(a, float) and math.isnan(a))
        bf = b is None or (isinstance(b, float) and math.isnan(b))
        return af and bf
    return str(a) == str(b)


def _col_kind(series) -> str:
    """First non-null value's kind: 'decimal' | 'float' | type name."""
    for v in series:
        if _is_null(v):
            continue
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, float):  # covers numpy float64 (subclass)
            return "float"
        return type(v).__name__
    return "empty"


def compare(name: str, spark_df, oracle_pd: pd.DataFrame) -> str:
    got_raw = pd.DataFrame(spark_df.toPandas())
    # Driver strictness: the driver hashes raw cell reprs, so a Spark
    # DECIMAL column (pandas object of Decimal) vs DuckDB's float64
    # bridge differs on any trailing-zero cell even when values match
    # within 1e-9. Flag the dtype divergence itself (VERDICT r6 item 2)
    # instead of coercing Decimals through the float branch.
    for c in set(got_raw.columns) & set(oracle_pd.columns):
        gk, wk = _col_kind(got_raw[c]), _col_kind(oracle_pd[c])
        if gk != wk and "decimal" in (gk, wk) and "empty" not in (gk, wk):
            return (
                f"FAIL dtype col={c}: spark={gk} oracle={wk} — stringify "
                "exact decimals on BOTH sides (q1 convention) or the "
                "driver hash will coin-flip on trailing zeros"
            )
        # int-vs-float divergence (e.g. DuckDB HUGEINT → float64 bridge,
        # the r7 kaplan_meier_retention failure): the driver's raw-repr
        # hash sees ``3`` vs ``3.0`` on EVERY row. Flag it even though
        # the float-tolerance branch would call the values equal.
        def _num(k):
            if k == "int" or k.startswith(("int8", "int16", "int32",
                                           "int64", "uint")):
                return "int"
            if k.startswith("float"):
                return "float"
            return k
        if (
            "empty" not in (gk, wk)
            and {_num(gk), _num(wk)} == {"int", "float"}
        ):
            return (
                f"FAIL dtype col={c}: spark={gk} oracle={wk} — integer "
                "column on one side, float on the other: CAST both sides "
                "to the same family (BIGINT/DOUBLE) or the driver hash "
                "mismatches on every row"
            )
    got = canon(got_raw)
    want = canon(oracle_pd)
    if sorted(got.columns) != sorted(want.columns):
        return f"FAIL cols: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    if len(got) != len(want):
        return f"FAIL rows: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        ga, wa = got[c].tolist(), want[c].tolist()
        for i, (a, b) in enumerate(zip(ga, wa)):
            if not cells_equal(a, b):
                return f"FAIL value col={c} row={i}: spark={a!r} oracle={b!r}"
    return f"PASS ({len(got)} rows)"


def main() -> int:
    from dopams_etl_spark.session import get_spark

    import __spark_entry__ as se

    spark = get_spark("check")
    spark.sparkContext.setLogLevel("ERROR")

    args = sys.argv[1:]
    qs = se.queries()
    if args[:1] == ["--sample"]:
        n = int(args[1]) if len(args) > 1 else 50
        wanted = set(list(qs)[:n])
    else:
        wanted = set(args)
    oracles = se.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if wanted and name not in wanted:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            if name in oracles:
                verdict = compare(name, sdf, duck_run(oracles[name], SF_DIR))
            else:
                n = sdf.count()
                verdict = f"ROWS-ONLY ({n} rows)" if n >= 0 else "FAIL"
        except Exception:
            verdict = "ERROR\n" + traceback.format_exc(limit=8)
        dt = time.time() - t0
        status = verdict.split()[0]
        if status not in ("PASS", "ROWS-ONLY"):
            fails += 1
        print(f"{name:36s} {verdict}   [{dt:.1f}s]")
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
