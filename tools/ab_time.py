"""Interleaved A/B timer: min-of-N warm noop-sink seconds for named queries,
run against THIS tree (whichever repo root the script is invoked from).

Usage:
    python tools/ab_time.py lsh_topk_embeddings minhash_lsh_pairs
    AB_RUNS=5 AB_SF_DIR=/root/testdata/sf0.1 python tools/ab_time.py q1 ...

Prints one JSON line {"root": ..., "queries": {name: sec}}. Pair it with a
worktree of the comparison commit and alternate invocations so both trees
see the same ambient conditions (this box drifts ±20% across hours).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("AB_RUNS", "5"))


def main() -> None:
    from dopams_etl_spark.plans import catalog
    from dopams_etl_spark.session import get_spark

    spark = get_spark("ab-time")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    names = sys.argv[1:]
    out: dict[str, float] = {}
    for name in names:
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()  # warm (plan+codegen)
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    print(json.dumps({"root": ROOT, "queries": out}))


if __name__ == "__main__":
    main()
