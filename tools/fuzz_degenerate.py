"""Degenerate-fixture robustness census over the whole registry.

The r12 review found a correctness class the per-round driver gate
cannot see on healthy data: under ANSI (Spark 4 default) the builtin
corr/covar_samp/stddev_samp aggregates THROW on a zero-variance or
single-row group where DuckDB yields NULL — so a query that is
strict-green at every tested SF is still a hard driver `err` on the
first fixture whose groups degenerate. Two queries were fixed in-round
(event_value_moments, cross_corr_best_lag) after being found BY READING
CODE; this tool replaces reading with measurement, the same move
scan_signed_zero.py made for the −0.0 class.

It builds degenerate variants of the sf0.001 tables (schema-preserving
pyarrow rewrite, so `events.ts` keeps whatever timestamp physical type
the driver wrote) and runs every registered query AND its DuckDB oracle
on each variant, comparing with the check.py harness:

- ``tiny1``  — exactly 1 row per table: every group is single-row
  (n−1 = 0 denominators), every join is near-empty, every window frame
  is width-1.
- ``const``  — full sf0.001 row counts, every float64 measure column
  set to the constant 1.0 and every float-list (embedding) column set
  to one shared vector: zero-variance groups at real cardinality,
  total ties in every ranking, cosine ≡ 1 everywhere, and
  `1 − l_discount = 0` denominators.
- ``empty``  — 0 rows, schema intact: empty aggregates, driver-side
  pools collected from nothing, `first()`/`head()` returning None.
- ``nullhalf`` — full sf0.001 row counts, every NON-KEY column (keys =
  ``*_id`` / ``*key`` / ``l_linenumber``) nulled on every 2nd row: the
  NULL-semantics parity axis — pairwise-complete moments, COUNT(col)
  vs COUNT(*), GROUP BY NULL keys, null-safe joins, watermarks over
  null event times. The other variants never inject nulls, so this is
  the only probe of the null-handling class.
- ``dup2``   — every row EXACTLY duplicated (r15): the at-least-once
  upstream axis — a replayed batch or retried load lands the same rows
  twice. Probes PK-uniqueness assumptions (merge/upsert incoming keys,
  ER canonical ids, latest-per-key over exact ties) and COUNT vs
  COUNT DISTINCT conflation. Exact duplicates are value-identical, so
  tie-breaks among them cannot diverge — a FAIL is real
  duplicate-sensitivity, not sort noise.
- ``f32``    — full row counts, every float64 column physically
  rewritten as float32 (values round-tripped through float32, schema
  narrowed): the TYPE-DRIFT parity axis. A query that does arithmetic
  in the file's float lane diverges from the double-math oracle the
  moment a fixture regen narrows a measure column — the embedding
  column (already float32 in the real fixtures) taught exactly this
  lesson, which is why ``similarity._dot`` casts per-element BEFORE
  multiplying. This variant measures which scalar-measure queries
  still skip the widening.

Signal ranking (this is a CENSUS, not a gate — the registry is only
required to be green on driver data):

1. ``SPARK_ERR``  — the query ABORTS: a guaranteed driver `err` on any
   future fixture shaped like the variant. The ANSI-throw class. Fix
   with priority (each fix costs a changed-query sample slot).
2. ``ORACLE_ERR`` — the DuckDB twin aborts: same exposure, oracle side.
3. ``FAIL …``     — engines disagree on the degenerate input (tie
   ordering, NULL-vs-NaN, empty-input semantics). Latent only if the
   driver could plausibly generate such data; triage before queueing.
4. ``PASS``/``ROWS-ONLY`` — robust.

Float cells compare within 1e-9 (non-strict): the census hunts
structural divergence; the repr-identity (−0.0) class is
scan_signed_zero.py's job.

Usage:
    python tools/fuzz_degenerate.py                  # all 5 variants
    python tools/fuzz_degenerate.py tiny1 empty      # subset of variants
    FUZZ_QUERIES="q1 firs_mv" python tools/fuzz_degenerate.py
Variants are (re)built under .fuzz/ (gitignored) from
``FUZZ_BASE_SF_DIR`` (default /root/testdata/sf0.001).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import check  # noqa: E402  (tools/check.py — the driver-gate replica)

from dopams_etl_spark.catalog import TABLES  # noqa: E402

BASE = os.environ.get("FUZZ_BASE_SF_DIR", "/root/testdata/sf0.001")
ROOT = os.path.join(os.path.dirname(__file__), "..", ".fuzz")

VARIANTS = ("tiny1", "const", "empty", "nullhalf", "f32", "dup2")


def _is_key(name: str) -> bool:
    """Join/identity columns stay intact in ``nullhalf`` so the census
    measures null-VALUE semantics, not just rows vanishing from every
    equi-join at once."""
    return name.endswith(("_id", "key")) or name == "l_linenumber"


def _nullify_half(table: pa.Table) -> pa.Table:
    for i, field in enumerate(table.schema):
        if _is_key(field.name):
            continue
        vals = table.column(i).to_pylist()
        new = pa.array(
            [None if j % 2 == 1 else v for j, v in enumerate(vals)],
            type=field.type,
        )
        table = table.set_column(i, field, new)
    return table


def _constify(table: pa.Table) -> pa.Table:
    """Replace float64 columns with 1.0 and float-list columns with the
    first row's vector (zero variance at full cardinality). Nulls stay
    null so null-handling paths keep their shape."""
    for i, field in enumerate(table.schema):
        col = table.column(i)
        if pa.types.is_float64(field.type):
            new = pa.array(
                [None if v is None else 1.0 for v in col.to_pylist()],
                type=field.type,
            )
        elif pa.types.is_list(field.type) and pa.types.is_floating(
            field.type.value_type
        ):
            vals = col.to_pylist()
            shared = next((v for v in vals if v is not None), None)
            new = pa.array(
                [None if v is None else shared for v in vals],
                type=field.type,
            )
        else:
            continue
        table = table.set_column(i, field, new)
    return table


def _f32_narrow(table: pa.Table) -> pa.Table:
    """Physically narrow every float64 column to float32 (the embedding
    list column is float32 already in the real fixtures)."""
    for i, field in enumerate(table.schema):
        if pa.types.is_float64(field.type):
            new_field = pa.field(field.name, pa.float32(), field.nullable)
            table = table.set_column(
                i, new_field, table.column(i).cast(pa.float32())
            )
    return table


def build_variant(variant: str) -> str:
    out = os.path.join(ROOT, variant)
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = pq.read_table(os.path.join(BASE, f"{t}.parquet"))
        if variant == "tiny1":
            dst = src.slice(0, 1)
        elif variant == "empty":
            dst = src.slice(0, 0)
        elif variant == "const":
            dst = _constify(src)
        elif variant == "nullhalf":
            dst = _nullify_half(src)
        elif variant == "f32":
            dst = _f32_narrow(src)
        elif variant == "dup2":
            # every row EXACTLY duplicated — the at-least-once-upstream
            # shape (a replayed batch, a retried load): probes PK-unique
            # assumptions (merge/upsert incoming keys, ER canonical ids,
            # latest-per-key over exact ties) and COUNT vs COUNT DISTINCT
            # conflation. Exact duplicates are value-identical, so
            # tie-breaks among them cannot diverge — a FAIL here is a
            # real duplicate-sensitivity, not sort noise.
            dst = pa.concat_tables([src, src])
        else:
            raise ValueError(variant)
        pq.write_table(dst, os.path.join(out, f"{t}.parquet"))
    return os.path.abspath(out)


def main() -> int:
    from dopams_etl_spark.session import get_spark

    import __spark_entry__ as se

    variants = [v for v in sys.argv[1:] if v in VARIANTS] or list(VARIANTS)
    only = set(os.environ.get("FUZZ_QUERIES", "").split())

    spark = get_spark("fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    qs = se.queries()
    oracles = se.oracle_sql()

    # summary[kind] -> list of "query@variant"
    summary: dict[str, list[str]] = {
        "SPARK_ERR": [], "ORACLE_ERR": [], "FAIL": []
    }
    for variant in variants:
        sf_dir = build_variant(variant)
        print(f"\n=== variant {variant} ({sf_dir}) ===")
        for name, fn in qs.items():
            if only and name not in only:
                continue
            t0 = time.time()
            kind = "PASS"
            try:
                sdf = fn(spark, sf_dir)
                if name in oracles:
                    try:
                        want = check.duck_run(oracles[name], sf_dir)
                    except Exception as e:
                        # The Spark plan is lazy — without forcing it here
                        # an oracle abort would short-circuit before the
                        # engine ever executed, and a query that ALSO
                        # aborts Spark-side (rank-1 signal) would be
                        # tallied only as ORACLE_ERR (rank 2). count()
                        # is NOT enough: column pruning strips ANSI-
                        # throwing select items under count() (verified:
                        # count() returns where collect() throws
                        # DIVIDE_BY_ZERO), so materialize every projected
                        # column; a Spark throw here propagates to the
                        # outer except as SPARK_ERR.
                        sdf.toPandas()
                        kind, verdict = "ORACLE_ERR", f"ORACLE_ERR {type(e).__name__}: {e}"
                    else:
                        verdict = check.compare(name, sdf, want)
                        kind = verdict.split()[0]
                        if kind.startswith("FAIL"):
                            kind = "FAIL"
                else:
                    # Full materialization for the same reason as above:
                    # count() would let pruning skip throwing columns and
                    # report robust a query the driver would abort on.
                    verdict = f"ROWS-ONLY ({len(sdf.toPandas())} rows)"
            except Exception as e:
                kind = "SPARK_ERR"
                verdict = "SPARK_ERR " + traceback.format_exc(limit=6).splitlines()[-1]
            if kind in summary:
                summary[kind].append(f"{name}@{variant}")
            print(f"{name:40s} {verdict[:160]}   [{time.time() - t0:.1f}s]")

    print("\n=== census summary ===")
    for kind in ("SPARK_ERR", "ORACLE_ERR", "FAIL"):
        print(f"{kind} ({len(summary[kind])}):")
        for item in summary[kind]:
            print(f"  {item}")
    return 0  # census, not a gate


if __name__ == "__main__":
    sys.exit(main())
