"""Unit tests for the round-5 operators: Misra-Gries heavy hitters,
power-iteration PageRank, and group centroids."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


# ---------- heavy_hitters ----------


def test_heavy_hitters_equals_naive(spark):
    from dopams_etl_spark.operators.sketches import heavy_hitters

    rng = random.Random(7)
    # skewed: a few hot keys + a long uniform tail
    rows = (
        [("hot_a",)] * 400
        + [("hot_b",)] * 250
        + [("warm",)] * 60
        + [(f"tail_{rng.randrange(500)}",) for _ in range(1290)]
    )
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, ["k"]).repartition(8)

    frac = 0.02  # threshold 40 of 2000
    got = {(r["k"], r["cnt"]) for r in heavy_hitters(df, "k", frac).collect()}

    n = len(rows)
    thr = math.ceil(frac * n)
    naive = {
        (r["k"], r["cnt"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= thr)
        .collect()
    }
    assert got == naive
    assert ("hot_a", 400) in got and ("hot_b", 250) in got and ("warm", 60) in got


def test_heavy_hitters_no_false_negatives_property(spark):
    """Superset guarantee: for several random skew profiles, candidate+verify
    must return exactly the naive answer (in particular, never MISS a true
    heavy hitter across partition boundaries)."""
    from dopams_etl_spark.operators.sketches import heavy_hitters

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        rows = [(f"k{int(rng.paretovariate(1.2)) % 97}",) for _ in range(3000)]
        df = spark.createDataFrame(rows, ["k"]).repartition(16)
        frac = 0.03
        thr = math.ceil(frac * len(rows))
        naive = {
            (r["k"], r["cnt"])
            for r in df.groupBy("k")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= thr)
            .collect()
        }
        got = {(r["k"], r["cnt"]) for r in heavy_hitters(df, "k", frac).collect()}
        assert got == naive


def test_heavy_hitters_rejects_bad_threshold(spark):
    from dopams_etl_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([("a",)], ["k"])
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", 0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", 1.5)


# ---------- pagerank ----------


def _pagerank_reference(edges, iters, d):
    """Independent pure-Python implementation of the simple formulation."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    adj = {}
    for u, v in set(edges):
        out[u] = out.get(u, 0) + 1
        adj.setdefault(u, []).append(v)
    rank = {x: 1.0 / n for x in nodes}
    for _ in range(iters):
        inflow = {x: 0.0 for x in nodes}
        for u, vs in adj.items():
            share = rank[u] / out[u]
            for v in vs:
                inflow[v] += share
        rank = {x: (1 - d) / n + d * inflow[x] for x in nodes}
    return rank


def test_pagerank_matches_reference(spark):
    from dopams_etl_spark.operators.graph import pagerank

    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),  # 3-cycle
        ("d", "a"), ("d", "b"),              # feeder
        ("e", "f"),                          # separate pair, f dangling
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=4, damping=0.85).collect()}
    want = _pagerank_reference(edges, 4, 0.85)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])
    # cycle members outrank the feeder, which only teleports
    assert got["a"] > got["d"]


def test_pagerank_rank_mass_without_dangling(spark):
    """On a graph with no dangling nodes the simple formulation conserves
    total rank mass = 1 every iteration."""
    from dopams_etl_spark.operators.graph import pagerank

    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    total = (
        pagerank(df, iterations=3, damping=0.85)
        .agg(F.sum("rank").alias("s"))
        .collect()[0]["s"]
    )
    assert abs(total - 1.0) < 1e-9


# ---------- group_centroids ----------


def test_group_centroids_values_and_null_handling(spark):
    from dopams_etl_spark.operators.similarity import group_centroids

    rows = [
        ("a", [1.0, 2.0, 3.0]),
        ("a", [3.0, 4.0, 5.0]),
        ("b", [10.0, 0.0, -2.0]),
        ("b", None),          # ignored
        ("b", []),            # ignored
    ]
    df = spark.createDataFrame(rows, ["g", "embedding"])
    got = {r["g"]: (r["n_vecs"], r["centroid"]) for r in group_centroids(df, "g").collect()}
    assert got["a"] == (2, [2.0, 3.0, 4.0])
    assert got["b"] == (1, [10.0, 0.0, -2.0])


# ---------- label_propagation ----------


def test_label_propagation_two_triangles(spark):
    """Two triangles joined by a bridge: each triangle must agree on one
    community, and the result must be deterministic across runs."""
    from dopams_etl_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        ["src", "dst"],
    )
    got = {r["node"]: r["community"] for r in label_propagation(edges, n_iter=3).collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}
    assert got[1] == got[2] == got[3]
    assert got[5] == got[6]
    again = {r["node"]: r["community"] for r in label_propagation(edges, n_iter=3).collect()}
    assert got == again


def test_label_propagation_disconnected_components(spark):
    """Disconnected cliques never share a community."""
    from dopams_etl_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        ["src", "dst"],
    )
    got = {r["node"]: r["community"] for r in label_propagation(edges, n_iter=4).collect()}
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11] == got[12]
    assert got[1] != got[10]
