"""Bounded persist cache for intermediate tables reused across calls.

The problem it solves (flagged in round-4 advice): an operator that
``persist()``s an intermediate (e.g. the MinHash signature table — three
consumers inside one query) has no hook to ``unpersist()`` afterwards,
because it returns a lazy plan and the caller decides when (and how often)
to materialize it. Plain ``persist()`` therefore pins one copy of the
intermediate in executor storage per call, for the life of the session.
Plain ``localCheckpoint()`` releases blocks with the plan reference, but
forfeits Spark's CacheManager plan-matching — REPEATED calls with the same
inputs (a dedup pass re-run per batch, a bench loop, an interactive
session) recompute the intermediate every time (~1 s per call for the
sf0.1 signature table).

``persist_bounded`` keeps both properties: it ``persist()``s the plan so
identical later plans hit the CacheManager, and it tracks live entries in
a small FIFO keyed by the plan's semantics — inserting beyond the capacity
unpersists the oldest entry, so executor storage holds at most ``cap``
intermediates no matter how many times operators are invoked. Repeat calls
are matched via ``semanticHash``/``sameSemantics`` (canonicalized-plan
equality, the same test the CacheManager applies) and return the ALREADY
persisted frame instead of inserting a duplicate — two references to one
cache entry would otherwise let an eviction of the "old" one drop the data
out from under the "new" one.

Storage bound: cap(=2 default) × the per-intermediate footprint; the
signature table is num_hashes longs per doc, so ~a few hundred MB per
billion docs — small against executor storage, and evictable (MEMORY_AND_
DISK blocks are dropped block-by-block under memory pressure anyway).
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame

_CACHE: OrderedDict[int, DataFrame] = OrderedDict()
_DEFAULT_CAP = 2


def persist_bounded(df: DataFrame, cap: int = _DEFAULT_CAP) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK), evicting the oldest bounded-cache
    entry beyond ``cap`` live intermediates. Returns the persisted frame —
    the semantically-identical earlier one when this plan was already
    cached by a prior call."""
    key = df.semanticHash()
    hit = _CACHE.get(key)
    # semanticHash can collide; sameSemantics is exact (canonicalized
    # plans) — on a true hit reuse the existing persisted frame, on a
    # collision fall through and let the CacheManager sort out storage.
    if hit is not None and hit.sameSemantics(df):
        _CACHE.move_to_end(key)
        return hit
    if hit is not None:
        # hash collision: the slot is being replaced — unpersist the
        # displaced frame so every persist() issued here stays tracked
        # by the bound (it would otherwise pin storage untracked).
        hit.unpersist(blocking=False)
    df = df.persist()
    _CACHE[key] = df
    _CACHE.move_to_end(key)
    while len(_CACHE) > cap:
        _, old = _CACHE.popitem(last=False)
        old.unpersist(blocking=False)
    return df


def clear_bounded_cache() -> None:
    """Unpersist and forget every tracked intermediate (test hook)."""
    while _CACHE:
        _, old = _CACHE.popitem(last=False)
        old.unpersist(blocking=False)
