"""Measure the signed-zero latent class across the whole registry.

The r11 review established the cross-engine rounding split: DuckDB
``round(CAST(x AS DOUBLE), 6)`` keeps IEEE −0.0 where Spark ``F.round``
normalizes to 0.0, and the driver hashes raw cell reprs — so every
SIGN-INDEFINITE rounded double needs ``+ 0.0`` on BOTH engine and
oracle sides (catalog header convention). This tool re-measures the
latent list so each round's migration wave works from data, not memory:

- runs every registered oracle in DuckDB at sf0.001 (no Spark needed —
  the oracle and engine are value-identical wherever the driver is
  green, so the oracle alone locates negative float cells);
- reports, per query, the float64 columns that emit at least one
  NEGATIVE value (a future near-zero in such a column could round to
  −0.0 on fixture drift) and whether the oracle text already
  canonicalizes that column (a ``+ 0.0`` within the 300 characters
  before its ``AS <col>`` alias — loose on purpose; treat "maybe" as
  "go read the SQL");
- also flags any column emitting −0.0 TODAY (live driver risk: must be
  fixed immediately, not queued).

The latent list is SF-DEPENDENT (measured r13: sf0.01 adds spearman
and theil_sen, sf0.1 adds mann_kendall — a statistic can be
all-positive at one scale and signed at another), so pass several
fixture dirs and the tool reports the per-SF lists AND their union;
migration waves should work from the union.

Usage:
    python tools/scan_signed_zero.py            # sf0.001 only
    python tools/scan_signed_zero.py /root/testdata/sf0.001 \
        /root/testdata/sf0.01 /root/testdata/sf0.1   # tri-SF union
    CHECK_SF_DIR=/root/testdata/sf0.01 python tools/scan_signed_zero.py
"""

from __future__ import annotations

import math
import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dopams_etl_spark.catalog import TABLES  # noqa: E402
from dopams_etl_spark.plans import catalog  # noqa: E402

SF_DIRS = sys.argv[1:] or [
    os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.001")
]


def column_canonicalized(sql: str, col: str) -> bool:
    """True if a ``+ 0.0`` appears shortly before ``AS <col>`` in the
    oracle — the catalog's canonicalization convention. Loose textual
    check (aliases can be re-selected through CTEs); a False on a
    column you believe is safe means: read the SQL."""
    for m in re.finditer(rf"\bAS\s+{re.escape(col)}\b", sql, re.IGNORECASE):
        window = sql[max(0, m.start() - 300) : m.start()]
        # The convention always reads `... + 0.0 AS col` (possibly
        # across a line break), so the token must be the LAST thing
        # before the alias — a trailing-anchored match. A windowed
        # "appears nearby" check would also accept the NEIGHBORING
        # select item's `+ 0.0` and silently drop a genuinely
        # un-migrated column from the worklist (r12 review). Full-token:
        # '+ 0.0' must not be the prefix of another literal ('+ 0.005').
        if re.search(r"\+\s*0\.0(?![0-9])\s*$", window.rstrip()):
            return True
    return False


def scan_one(sf_dir: str) -> tuple[dict, dict, list]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    latent: dict[str, list[str]] = {}
    live: dict[str, list[str]] = {}
    failures: list[str] = []
    for name, sql in catalog.oracle_sql().items():
        try:
            df = con.execute(sql).df()
        except Exception as e:  # degenerate-at-SF oracles: report, move on
            failures.append(f"{name}: {type(e).__name__}: {e}")
            continue
        neg_cols, neg_zero_cols = [], []
        for c in df.columns:
            if str(df[c].dtype) not in ("float64", "float32"):
                continue
            vals = df[c].dropna()
            if len(vals) == 0:
                continue
            if any(v < 0 for v in vals):
                neg_cols.append(c)
            if any(v == 0.0 and math.copysign(1.0, v) < 0 for v in vals):
                neg_zero_cols.append(c)
        pending = [c for c in neg_cols if not column_canonicalized(sql, c)]
        if pending:
            latent[name] = pending
        if neg_zero_cols:
            live[name] = neg_zero_cols
    return latent, live, failures


def main() -> None:
    union_latent: dict[str, set[str]] = {}
    union_live: dict[str, set[str]] = {}
    for sf_dir in SF_DIRS:
        latent, live, failures = scan_one(sf_dir)
        print(f"# signed-zero scan at {sf_dir}")
        print(
            f"# oracles run: {len(catalog.oracle_sql())}, "
            f"failures: {len(failures)}"
        )
        for f in failures:
            print(f"#   ORACLE FAILED — {f}")
        print(f"\nLIVE -0.0 emitters (fix NOW): {len(live)}")
        for name, cols in sorted(live.items()):
            print(f"  {name}: {cols}")
        print(
            f"\nLatent signed-float class (un-canonicalized negative "
            f"float columns): {len(latent)}"
        )
        for name, cols in sorted(latent.items()):
            print(f"  {name}: {cols}")
        print()
        for name, cols in latent.items():
            union_latent.setdefault(name, set()).update(cols)
        for name, cols in live.items():
            union_live.setdefault(name, set()).update(cols)
    if len(SF_DIRS) > 1:
        print(f"== UNION across {len(SF_DIRS)} SFs ==")
        print(f"LIVE -0.0 emitters: {len(union_live)}")
        for name, cols in sorted(union_live.items()):
            print(f"  {name}: {sorted(cols)}")
        print(f"Latent signed-float class: {len(union_latent)}")
        for name, cols in sorted(union_latent.items()):
            print(f"  {name}: {sorted(cols)}")


if __name__ == "__main__":
    main()
