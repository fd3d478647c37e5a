"""Plan invariants over the ENTIRE query catalog: compile every registered
query's physical plan and assert the scale-killers are absent.

This is the enforcement half of PLANS.md — a new query that sneaks in an
unbounded cartesian (the `embedding_near_dups` bug class from round 1) or
an accidental nested-loop join fails CI here, before any bench regression.
Plan compilation only; nothing executes.
"""

from dopams_etl_spark.plans import catalog

SF = "/root/testdata/sf0.001"

# Nested-loop joins that are deliberate and bounded:
# - cosine_topk_embeddings: the documented EXACT brute-force baseline —
#   corpus is broadcast and size-gated (operators/similarity.py); the scale
#   path is lsh_topk/ivf_topk, which plan as hash joins on bucket keys.
# - trigram_match_event_types: probe × a handful-row broadcast dictionary;
#   candidate space is |probe| × |dict| with a tiny constant dict.
BNLJ_ALLOWED = {"cosine_topk_embeddings", "trigram_match_event_types"}


def _plans(spark):
    for name, fn in catalog.queries().items():
        df = fn(spark, SF)
        yield name, df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_products_anywhere(spark):
    offenders = [n for n, plan in _plans(spark) if "CartesianProduct" in plan]
    assert not offenders, f"unbounded cartesian in: {offenders}"


def test_nested_loop_joins_only_where_intended(spark):
    offenders = [
        n
        for n, plan in _plans(spark)
        if "BroadcastNestedLoopJoin" in plan and n not in BNLJ_ALLOWED
    ]
    assert not offenders, f"unplanned nested-loop join in: {offenders}"


def test_allowlist_is_tight(spark):
    """The allowlist shrinks if a listed query stops needing its BNLJ."""
    qs = catalog.queries()
    still = {
        n
        for n in BNLJ_ALLOWED
        if "BroadcastNestedLoopJoin"
        in qs[n](spark, SF)._jdf.queryExecution().executedPlan().toString()
    }
    assert still == BNLJ_ALLOWED, (
        f"allowlist stale: {BNLJ_ALLOWED - still} no longer plan a BNLJ — remove them"
    )
