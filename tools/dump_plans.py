"""Dump ``explain("formatted")`` for named queries to plans/r15/<q>_<tag>.txt.

Usage:
    python tools/dump_plans.py before q1_pricing_summary firs_mv ...
    python tools/dump_plans.py after q1_pricing_summary ...
    DUMP_SF_DIR=/root/testdata/sf0.1 python tools/dump_plans.py before all
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("DUMP_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "plans", os.environ.get("DUMP_ROUND", "r16")
)


def main() -> None:
    from dopams_etl_spark.plans import catalog
    from dopams_etl_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    if names == ["all"]:
        names = list(qs)
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
