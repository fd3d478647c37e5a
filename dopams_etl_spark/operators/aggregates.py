"""Aggregation operators (SURVEY §2.4 A1–A10).

The reference's MV workload is ~20 correlated scalar subqueries per row
(``firs_mv.sql:40–229``). Here every child aggregate is a decorrelated
``groupBy(key).agg(...)`` joined back to the spine (J6 rewrite) — one
shuffle per child table with map-side partial aggregation, instead of a
per-row nested loop.

Determinism: ``collect_list`` order is partition-dependent, so every
collected array is ``array_sort``-ed with the sort key leading the struct
(SURVEY §7.4 "Ordered aggregation determinism").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_if(cond: Column) -> Column:
    """A2: conditional count (``firs_mv.sql:78–83``)."""
    return F.sum(F.when(cond, 1).otherwise(0))


def collect_sorted_structs(
    sort_cols: Sequence[Column | str],
    payload: dict[str, Column | str],
    descending: bool = False,
    keep: Column | None = None,
) -> Column:
    """A6: ordered struct-collect — ``jsonb_agg(jsonb_build_object(...)
    ORDER BY ...)`` (``firs_mv.sql:43–54``).

    Builds structs with the sort key(s) as the leading fields, collects,
    and ``array_sort``s — deterministic regardless of partitioning.
    ``keep``: optional predicate; rows failing it contribute NO entry
    (``collect_list`` skips the NULL struct) while the group itself
    survives — the ``string_agg``-over-NULL-element shape, the shared
    null-payload convention.
    """
    fields = []
    for i, sc in enumerate(sort_cols):
        c = F.col(sc) if isinstance(sc, str) else sc
        fields.append(c.alias(f"_sort{i}"))
    for name, c in payload.items():
        fields.append((F.col(c) if isinstance(c, str) else c).alias(name))
    entry = F.struct(*fields)
    if keep is not None:
        entry = F.when(keep, entry)
    arr = F.array_sort(F.collect_list(entry))
    if descending:
        arr = F.reverse(arr)
    # Strip the sort prefix, keep the payload fields.
    return F.transform(
        arr, lambda s: F.struct(*[s.getField(name).alias(name) for name in payload])
    )


def collect_distinct_sorted(col: Column | str) -> Column:
    """A7/A8: distinct scalar-collect, order-canonical, with COALESCE-to-empty
    (``firs_mv.sql:55–57``: ``COALESCE(array_agg(DISTINCT ...), '{}')``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.array_sort(F.collect_set(c)), F.array())


def map_agg_entries(key: Column | str, value: Column | str) -> Column:
    """A9: ``jsonb_object_agg(k, v)`` (``firs_mv.sql:90–95``) as a
    key-sorted array of (k, v) structs — order-canonical and
    oracle-comparable (a MapType has no stable order for hashing).
    A NULL key contributes no entry (``jsonb_object_agg`` and
    ``string_agg`` both skip it) — the shared null-payload convention."""
    k = F.col(key) if isinstance(key, str) else key
    v = F.col(value) if isinstance(value, str) else value
    entry = F.when(k.isNotNull(), F.struct(k.alias("key"), v.alias("value")))
    return F.array_sort(F.collect_list(entry))


def decorrelated_agg(
    child: DataFrame, key: str | Sequence[str], aggs: dict[str, Column]
) -> DataFrame:
    """J6: one groupBy per child table; join the result to the spine with a
    left join and COALESCE defaults at the call site."""
    keys = [key] if isinstance(key, str) else list(key)
    return child.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])
