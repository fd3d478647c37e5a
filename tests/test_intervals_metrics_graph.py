"""Unit tests for the round-6 operators: interval union, triangle
census, ranking AUC, and TF-IDF keyword extraction — each pinned to an
independent pure-Python reference."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


# ---------- merge_intervals ----------


def test_merge_intervals_islands_and_touching(spark):
    from dopams_etl_spark.operators.intervals import merge_intervals

    rows = [
        # key a: [0,10] [5,20] overlap -> [0,20]; [20,30] touches -> joins
        ("a", 0, 10),
        ("a", 5, 20),
        ("a", 20, 30),
        ("a", 40, 50),  # separate island
        # key b: nested interval swallowed
        ("b", 0, 100),
        ("b", 10, 20),
        # key c: single
        ("c", 7, 8),
    ]
    df = spark.createDataFrame(rows, ["k", "s", "e"]).repartition(5)
    got = {
        (r["k"], r["island_start"], r["island_end"]): r["n_intervals"]
        for r in merge_intervals(df, "k", "s", "e").collect()
    }
    assert got == {
        ("a", 0, 30): 3,
        ("a", 40, 50): 1,
        ("b", 0, 100): 2,
        ("c", 7, 8): 1,
    }


def test_merge_intervals_partition_invariant(spark):
    import random

    from dopams_etl_spark.operators.intervals import merge_intervals

    rng = random.Random(13)
    rows = [
        (f"u{rng.randrange(5)}", s := rng.randrange(1000), s + rng.randrange(1, 60))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    a = sorted(map(tuple, merge_intervals(df, "k", "s", "e").collect()))
    b = sorted(map(tuple, merge_intervals(df.repartition(17), "k", "s", "e").collect()))
    assert a == b
    # islands are disjoint and ordered per key
    per_key: dict[str, list[tuple[int, int]]] = {}
    for k, s, e, _ in a:
        per_key.setdefault(k, []).append((s, e))
    for spans in per_key.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1  # strictly disjoint, no touching remains


# ---------- triangle_stats ----------


def _brute_triangles(edges):
    adj: dict[int, set[int]] = {}
    es = set()
    for u, v in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        es.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = 0
    nodes = sorted(adj)
    for a, b in es:
        tri += len(adj[a] & adj[b] & {n for n in nodes if n > b})
    return len(nodes), len(es), tri


def test_triangle_stats_matches_bruteforce(spark):
    import random

    from dopams_etl_spark.operators.graph import triangle_stats

    rng = random.Random(3)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(150)]
    df = spark.createDataFrame(edges, ["src", "dst"]).repartition(7)
    row = triangle_stats(df).collect()[0]
    n_nodes, n_edges, n_tri = _brute_triangles(edges)
    assert row["n_nodes"] == n_nodes
    assert row["n_edges"] == n_edges
    assert row["n_triangles"] == n_tri
    if row["n_wedges"]:
        assert row["clustering_coeff"] == round(n_tri / row["n_wedges"], 6)


def test_triangle_stats_known_graphs(spark):
    from dopams_etl_spark.operators.graph import triangle_stats

    # K4: 4 triangles; star S4: 0 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    star = [(0, i) for i in range(1, 5)]
    r1 = triangle_stats(spark.createDataFrame(k4, ["src", "dst"])).collect()[0]
    assert (r1["n_triangles"], r1["n_edges"], r1["n_nodes"]) == (4, 6, 4)
    r2 = triangle_stats(spark.createDataFrame(star, ["src", "dst"])).collect()[0]
    assert r2["n_triangles"] == 0


# ---------- ranking_auc ----------


def _brute_auc(pairs):
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None
    wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    return round(wins / (len(pos) * len(neg)), 6)


def test_ranking_auc_matches_pairwise(spark):
    import random

    from dopams_etl_spark.operators.metrics import ranking_auc

    rng = random.Random(11)
    # ties on purpose: integer scores, positives skew high
    pairs = [
        (rng.randrange(20) + (3 if rng.random() < 0.5 else 0), rng.random() < 0.4)
        for _ in range(400)
    ]
    pairs = [(s, y or s > 15) for s, y in pairs]
    df = spark.createDataFrame(pairs, ["s", "y"]).repartition(9)
    row = ranking_auc(df, "s", "y").collect()[0]
    assert row["auc"] == _brute_auc(pairs)
    assert row["n_pos"] == sum(1 for _, y in pairs if y)
    assert row["n_neg"] == sum(1 for _, y in pairs if not y)


def test_ranking_auc_edge_cases(spark):
    from dopams_etl_spark.operators.metrics import ranking_auc

    # perfect separation -> 1.0; all-one-class -> NULL; nulls excluded
    df = spark.createDataFrame(
        [(1.0, False), (2.0, False), (3.0, True), (4.0, True), (None, True)],
        "s double, y boolean",
    )
    row = ranking_auc(df, "s", "y").collect()[0]
    assert row["auc"] == 1.0 and (row["n_pos"], row["n_neg"]) == (2, 2)
    one_class = spark.createDataFrame([(1.0, True), (2.0, True)], "s double, y boolean")
    assert ranking_auc(one_class, "s", "y").collect()[0]["auc"] is None


# ---------- tfidf_topk ----------


def test_tfidf_topk_matches_reference(spark):
    from dopams_etl_spark.operators.search import tfidf_topk

    docs = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry durian apple"),
    ]
    df = spark.createDataFrame(docs, ["id", "text"])
    got = {
        (r["doc"], r["rank"]): (r["term"], r["score"])
        for r in tfidf_topk(df, "id", "text", k=2).collect()
    }
    # independent reference
    import collections

    tf = {i: collections.Counter(t.split()) for i, t in docs}
    dfreq = collections.Counter(w for c in tf.values() for w in c)
    n = len(docs)
    for i, c in tf.items():
        scored = sorted(
            ((round(cnt * (math.log((n + 1) / (dfreq[w] + 1)) + 1), 6), w) for w, cnt in c.items()),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (score, w) in enumerate(scored[:2], 1):
            assert got[(i, rank)] == (w, score), (i, rank)


# ---------- cms ----------


def test_cms_never_undercounts_and_merges(spark):
    import collections
    import random

    from dopams_etl_spark.operators.sketches import cms_counters, cms_estimate

    rng = random.Random(5)
    vals = [f"k{rng.randrange(200)}" for _ in range(3000)]
    exact = collections.Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], ["k"]).repartition(8)
    counters = cms_counters(df, "k", width=32, depth=3)
    keys = spark.createDataFrame([(k, c) for k, c in exact.items()], ["k", "exact"])
    got = cms_estimate(keys, "k", counters, width=32, depth=3).collect()
    assert len(got) == len(exact)
    overcounts = 0
    for r in got:
        assert r["est"] >= exact[r["k"]], r  # one-sided guarantee
        overcounts += r["est"] > exact[r["k"]]
    assert overcounts > 0  # width 32 over 200 keys MUST collide

    # mergeability: sketch(A) + sketch(B) cell-wise == sketch(A ∪ B)
    half = len(vals) // 2
    a = cms_counters(spark.createDataFrame([(v,) for v in vals[:half]], ["k"]), "k", 32, 3)
    b = cms_counters(spark.createDataFrame([(v,) for v in vals[half:]], ["k"]), "k", 32, 3)
    merged = (
        a.unionByName(b)
        .groupBy("row", "col")
        .sum("cnt")
        .withColumnRenamed("sum(cnt)", "cnt")
    )
    whole = {(r["row"], r["col"]): r["cnt"] for r in counters.collect()}
    assert {(r["row"], r["col"]): r["cnt"] for r in merged.collect()} == whole

    # unknown key estimates 0 unless it collides (never negative)
    unk = cms_estimate(
        spark.createDataFrame([("never-seen-xyz",)], ["k"]), "k", counters, 32, 3
    ).collect()[0]
    assert unk["est"] >= 0


# ---------- hits ----------


def test_hits_matches_numpy_reference(spark):
    import numpy as np

    from dopams_etl_spark.operators.graph import hits

    edges = [(0, 10), (0, 11), (1, 10), (2, 10), (2, 12), (3, 11), (11, 0)]
    df = spark.createDataFrame(edges, ["src", "dst"]).repartition(4)
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(df, iterations=2).collect()}

    nodes = sorted({u for e in edges for u in e})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for u, v in edges:
        A[idx[u], idx[v]] = 1.0
    h = np.ones(len(nodes))
    a = np.ones(len(nodes))
    for _ in range(2):
        h = np.round((A @ a) / (A @ a).sum(), 12)
        a = np.round((A.T @ h) / (A.T @ h).sum(), 12)
    for n in nodes:
        assert got[n] == (round(float(h[idx[n]]), 6), round(float(a[idx[n]]), 6)), n
    # probability masses: each score vector sums to ~1
    assert abs(sum(v[0] for v in got.values()) - 1.0) < 1e-6
    assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-6


# ---------- random_projection ----------


def test_random_projection_matches_numpy_and_preserves_geometry(spark):
    import numpy as np

    from dopams_etl_spark.operators.similarity import _hyperplanes, random_projection

    rng = np.random.default_rng(21)
    vecs = [(i, [float(x) for x in rng.standard_normal(32)]) for i in range(40)]
    df = spark.createDataFrame(vecs, ["id", "embedding"])
    got = {r["id"]: r["proj"] for r in random_projection(df, "id", in_dim=32, out_dim=8, seed=7).collect()}

    M = np.array(_hyperplanes(32, 8, 7))
    for i, v in vecs:
        expect = np.round(M @ np.array(v) / np.sqrt(8), 6)
        assert got[i] == [float(x) for x in expect], i

    # JL sanity: projected pairwise distances correlate with originals
    ids = [i for i, _ in vecs]
    orig = {i: np.array(v) for i, v in vecs}
    d_orig, d_proj = [], []
    for x in ids[:15]:
        for y in ids[:15]:
            if x < y:
                d_orig.append(np.linalg.norm(orig[x] - orig[y]))
                d_proj.append(np.linalg.norm(np.array(got[x]) - np.array(got[y])))
    corr = np.corrcoef(d_orig, d_proj)[0, 1]
    assert corr > 0.5, corr


# ---------- bfs_distances ----------


def test_bfs_distances_matches_reference(spark):
    import collections
    import random

    from dopams_etl_spark.operators.graph import bfs_distances

    rng = random.Random(19)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(70)]
    df = spark.createDataFrame(edges, ["src", "dst"]).repartition(6)
    srcs = spark.createDataFrame([(0,), (7,)], ["node"])
    got = {r["node"]: r["dist"] for r in bfs_distances(df, srcs, max_depth=6).collect()}

    # reference BFS
    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    dist = {0: 0, 7: 0}
    frontier = [0, 7]
    for d in range(1, 7):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    assert got == dist


def test_bfs_distances_depth_cap_and_chain(spark):
    from dopams_etl_spark.operators.graph import bfs_distances

    chain = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(chain, ["src", "dst"])
    srcs = spark.createDataFrame([(0,)], ["node"])
    got = {r["node"]: r["dist"] for r in bfs_distances(df, srcs, max_depth=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # nodes past the cap absent
