"""Time every registered query with the noop sink (guide §1.4).

Per query: build the DataFrame once, execute N times (default 2), report
the min — warm execution time, mirroring bench.py's protocol. Output is
one JSON line per query on stdout (plus a sorted summary at the end), so
a run can be resumed/diffed cheaply.

Usage:
    python tools/time_all.py                 # all queries, $TIME_SF_DIR
    python tools/time_all.py q1 firs_mv      # subset
    TIME_SF_DIR=/root/testdata/sf0.1 TIME_RUNS=2 python tools/time_all.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("TIME_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("TIME_RUNS", "2"))


def main() -> None:
    from dopams_etl_spark.plans import catalog
    from dopams_etl_spark.session import get_spark

    spark = get_spark("time-all")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    subset = sys.argv[1:]
    if subset:
        qs = {k: v for k, v in qs.items() if any(s in k for s in subset)}

    results: dict[str, float] = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"time_all: {name}")
        try:
            t_build0 = time.time()
            df = fn(spark, SF_DIR)
            build_s = time.time() - t_build0
            best = float("inf")
            first = None
            for _ in range(RUNS):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                if first is None:
                    first = dt
                best = min(best, dt)
            results[name] = round(best, 3)
            print(
                json.dumps(
                    {
                        "q": name,
                        "warm_s": round(best, 3),
                        "first_s": round(first, 3),
                        "build_s": round(build_s, 3),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # keep sweeping; a broken query is its own finding
            print(json.dumps({"q": name, "error": f"{type(e).__name__}: {e}"}), flush=True)
            traceback.print_exc(file=sys.stderr)
        finally:
            spark.sparkContext.setJobDescription(None)

    ranked = sorted(results.items(), key=lambda kv: -kv[1])
    print("\n=== slowest 40 (warm seconds) ===", file=sys.stderr)
    for name, s in ranked[:40]:
        print(f"{s:8.3f}  {name}", file=sys.stderr)
    print(json.dumps({"total_warm_s": round(sum(results.values()), 3), "n": len(results)}))


if __name__ == "__main__":
    main()
