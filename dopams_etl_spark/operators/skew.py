"""Skew mitigation utilities (north-star scale posture).

AQE's skew-join splitting (on in ``session.py``) handles most runtime
skew; these helpers cover the cases AQE cannot re-plan:

- ``salted_aggregate``: two-phase aggregation for heavy-hitter GROUP BY
  keys — partial aggregate on (key, salt), final on key. Spark's hash
  aggregate already does map-side partials per task; salting additionally
  splits a hot key ACROSS reducers when one key's partials alone overwhelm
  a single reduce partition.
- ``salted_broadcast_left``: replicate-and-salt pattern for joining a
  skewed big side against a small side too large to broadcast whole but
  small enough ×salt — big side salts randomly, small side explodes all
  salts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: str | Sequence[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase GROUP BY for skewed keys. ``aggs`` must be decomposable
    (sum/count/min/max — partials of the same function recombine with the
    same function; count recombines with sum)."""
    klist = [keys] if isinstance(keys, str) else list(keys)
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*klist, "__salt").agg(
        *[c.alias(f"__p_{n}") for n, c in aggs.items()]
    )
    finals = []
    for n, c in aggs.items():
        fn_name = c._jc.toString().split("(")[0].lower()
        combiner = F.sum if fn_name in ("count", "sum") else (
            F.min if fn_name == "min" else F.max
        )
        finals.append(combiner(f"__p_{n}").alias(n))
    return partial.groupBy(*klist).agg(*finals)


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skewed equi-join: big side gets a random salt, small side is
    replicated once per salt value; the join key becomes (on, salt) so a
    hot key spreads over ``salt_buckets`` reduce partitions."""
    b = big.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return b.join(s, [on, "__salt"]).drop("__salt")
