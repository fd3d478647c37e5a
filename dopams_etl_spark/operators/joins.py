"""Join operators (SURVEY §2.3 J1–J13, §2.5 W1–W4).

Scale notes (the 100 TB posture):
- Dimension joins are explicit ``F.broadcast`` — never let a 25-row nation
  table shuffle a 100 TB lineitem (J1/J7).
- Fuzzy joins broadcast the small side and keep the similarity predicate
  JVM-side (``F.levenshtein``) so the cross-candidate space never
  materializes through Python (J8–J10).
- latest-per-key is a single window pass — no self-join (J13/W1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """J1/J7: fact ⋈ small-dimension with an explicit broadcast hint."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """J5/P5: rows of ``left`` having a match in ``right`` (EXISTS)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """J4: rows of ``left`` with no match in ``right`` (work-queue pattern,
    ``brief_facts_ai/db.py:49–74``)."""
    return left.join(right, on=on, how="left_anti")


def latest_per_key(
    df: DataFrame,
    keys: str | Sequence[str],
    order_col: Column | str,
    tiebreak: Column | str | None = None,
) -> DataFrame:
    """J13/W1: DISTINCT ON (keys) ORDER BY order_col DESC NULLS LAST.

    ``tiebreak`` makes the pick deterministic when ``order_col`` ties
    (the reference relies on Postgres's arbitrary-but-stable heap order;
    we require determinism for oracle tests).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    order = [oc.desc_nulls_last()]
    if tiebreak is not None:
        tc = F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
        order.append(tc.asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top1_by_score(
    df: DataFrame, probe_keys: Sequence[str], score_col: str, tiebreak: str | None = None
) -> DataFrame:
    """W4: best candidate per probe key by descending score."""
    return latest_per_key(df, probe_keys, score_col, tiebreak)


def fuzzy_join_levenshtein(
    probe: DataFrame,
    dim: DataFrame,
    probe_col: str,
    dim_col: str,
    max_distance: int = 3,
    keep_best: bool = True,
    probe_id: str | None = None,
    block: str | None = "soundex",
) -> DataFrame:
    """J8/J9/J10: broadcast the dictionary, join on a similarity predicate,
    optionally keep the best (min-distance) match per probe ROW.

    Mirrors the reference's PS-name / geo / drug-dictionary fuzzy matches
    (``etl-mongo-to-postgresql/etl_migration.py:145–216``,
    ``drug_standardization/drug_standardization.py:60–106``) but as a
    broadcast join with a JVM ``levenshtein`` predicate instead of a
    per-row Python loop.

    ``probe_id``: column identifying a probe row; when None a synthetic row
    id is stamped so duplicate probe *values* never collapse to one output
    row. ``block``: equality blocking key added to the join condition so the
    candidate space is |probe|×|bucket| instead of |probe|×|dict| —
    'soundex' (phonetic) or 'prefix1' (first letter); None disables
    (full nested loop — only for tiny dictionaries).
    """
    rid = probe_id
    if rid is None:
        rid = "__probe_rid"
        probe = probe.withColumn(rid, F.monotonically_increasing_id())
    p = F.lower(F.trim(probe[probe_col]))
    d = F.lower(F.trim(dim[dim_col]))
    cond = F.levenshtein(p, d) <= max_distance
    if block == "soundex":
        cond = cond & (F.soundex(F.upper(F.trim(probe[probe_col]))) == F.soundex(F.upper(F.trim(dim[dim_col]))))
    elif block == "prefix1":
        cond = cond & (F.substring(p, 1, 1) == F.substring(d, 1, 1))
    elif block is not None:
        raise ValueError(f"unknown block strategy {block!r}")
    joined = probe.join(F.broadcast(dim), cond, "inner").withColumn(
        "match_distance", F.levenshtein(p, d)
    )
    if not keep_best:
        return joined if probe_id is not None else joined.drop("__probe_rid")
    w = Window.partitionBy(rid).orderBy(
        F.col("match_distance").asc(), F.lower(F.trim(F.col(dim_col))).asc()
    )
    out = joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    return out if probe_id is not None else out.drop("__probe_rid")


def trigram_similarity(a: Column, b: Column) -> Column:
    """J9: pg_trgm-style similarity — Jaccard over distinct character
    trigrams of the lowercased strings (``update-state-country.py:288–348``
    uses Postgres ``similarity()``; same definition). Pure JVM."""
    from dopams_etl_spark.functions.textfns import char_ngrams

    ta = char_ngrams(a, 3)
    tb = char_ngrams(b, 3)
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union.cast("double"))


def trigram_join(
    probe: DataFrame,
    dim: DataFrame,
    probe_col: str,
    dim_col: str,
    threshold: float = 0.3,
    probe_id: str | None = None,
) -> DataFrame:
    """J9 trigram-similarity best-match join: broadcast dictionary,
    JVM trigram Jaccard, best (max-similarity) match per probe ROW with a
    deterministic tie-break. Same row-identity handling as
    ``fuzzy_join_levenshtein``."""
    rid = probe_id
    if rid is None:
        rid = "__probe_rid"
        probe = probe.withColumn(rid, F.monotonically_increasing_id())
    sim = trigram_similarity(probe[probe_col], dim[dim_col])
    joined = probe.join(F.broadcast(dim), sim >= threshold, "inner").withColumn(
        "similarity", F.round(trigram_similarity(probe[probe_col], dim[dim_col]), 6)
    )
    w = Window.partitionBy(rid).orderBy(
        F.col("similarity").desc(), F.lower(F.trim(F.col(dim_col))).asc()
    )
    out = joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    return out if probe_id is not None else out.drop("__probe_rid")


def soundex_blocked_candidates(
    left: DataFrame, right: DataFrame, left_name: str, right_name: str
) -> DataFrame:
    """J11: phonetic-blocked candidate pairs for entity resolution —
    block on ``F.soundex`` so pairwise scoring never crosses blocks
    (``brief_facts_ai/db.py:147–169``)."""
    lb = left.withColumn("__blk", F.soundex(F.upper(F.trim(F.col(left_name)))))
    rb = right.withColumn("__blk", F.soundex(F.upper(F.trim(F.col(right_name)))))
    return lb.join(rb, on="__blk", how="inner").drop("__blk")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
) -> DataFrame:
    """As-of join (Spark has no native one): for each left row, attach the
    LATEST right row of the same ``key`` with ``right_ts <= left_ts``
    (inclusive; ties broken by the last ``right_cols`` order position, i.e.
    the sort below).

    Scale-safe plan: instead of an inequality join (which Spark plans as a
    nested loop), both sides union into one stream tagged by side, sorted
    per key by (ts, side, …) inside ONE window pass — right rows carry
    forward via ``last(..., ignorenulls=True)``. One shuffle on ``key``, no
    cross product, linear in |left|+|right| per key.

    Skew note: the window partitions by the join key, so one hot key (a
    bot user, a null-ish default id) serializes onto one task. The sort is
    linear, which keeps a hot key survivable, but at 100 TB pre-split such
    keys by a coarse time bucket (partition on (key, date(ts)), carrying
    the last value of the previous bucket in) or route them through
    ``operators.skew.salted_broadcast_left`` when the right side is small.
    """
    clash = set(left.columns) & set(right_cols)
    if clash:
        raise ValueError(
            f"right_cols {sorted(clash)} collide with left columns — alias "
            "the right side before the asof join"
        )
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = right.withColumn("__side", F.lit(0)).withColumn("__ts", F.col(right_ts))
    # align schemas: left keeps its columns, right contributes right_cols
    carry = [f"__r_{c}" for c in right_cols]
    lt2 = lt.select(
        key, "__side", "__ts", *[c for c in left.columns if c != key],
        *[F.lit(None).cast(right.schema[c].dataType).alias(rc) for c, rc in zip(right_cols, carry)],
    )
    rt2 = rt.select(
        key, "__side", "__ts",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != key],
        *[F.col(c).alias(rc) for c, rc in zip(right_cols, carry)],
    )
    # at equal ts the right row sorts first (side 0 < 1) → inclusive <=;
    # among equal-ts right rows the LAST in carry-column order wins.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), *[F.col(c).asc_nulls_first() for c in carry])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lt2.unionByName(rt2)
    for c in carry:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return (
        merged.filter(F.col("__side") == 1)
        .drop("__side", "__ts")
        .withColumnsRenamed(dict(zip(carry, [f"asof_{c}" for c in right_cols])))
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Range (interval) join: pair each left row with every right row of the
    same ``key`` whose ``right_ts`` falls in ``[left_ts, left_ts +
    window_seconds)``.

    A naive ``l.ts <= r.ts < l.ts + w`` predicate plans as a nested loop in
    Spark. The scale path buckets time into ``window_seconds`` slots: the
    left row joins buckets b and b+1 (the interval spans at most two), the
    bucket becomes an EQUI-join key (hash join, shuffle on (key, bucket)),
    and the exact range predicate filters the ±1-bucket false positives.
    """
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / window_seconds)
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / window_seconds)
    lt = left.withColumn(
        "__bucket", F.explode(F.array(lb.cast("long"), (lb + 1).cast("long")))
    )
    rt = right.withColumn("__bucket", rb.cast("long"))
    cond = (
        (F.unix_timestamp(rt[right_ts]) >= F.unix_timestamp(lt[left_ts]))
        & (F.unix_timestamp(rt[right_ts]) < F.unix_timestamp(lt[left_ts]) + window_seconds)
    )
    return lt.join(rt, on=[key, "__bucket"]).filter(cond).drop("__bucket")
