import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dopams_etl_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dups,
    lsh_topk,
)


def _vecs(n=30, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim))
    # make 0/1 near-duplicates
    base[1] = base[0] + rng.standard_normal(dim) * 0.01
    return [(i, [float(x) for x in row]) for i, row in enumerate(base)]


def test_cosine_topk_matches_numpy(spark):
    rows = _vecs()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = cosine_topk(df.filter(F.col("vec_id") < 3), df, "vec_id", "vec_id", k=2)
    got = {(r["p_id"], r["rank"]): (r["c_id"], r["cos_sim"]) for r in out.collect()}

    mat = np.array([r[1] for r in rows])
    norms = np.linalg.norm(mat, axis=1)
    for p in range(3):
        sims = mat @ mat[p] / (norms * norms[p])
        sims[p] = -np.inf
        order = sorted(range(len(rows)), key=lambda i: (-round(sims[i], 6), i))
        for rank in (1, 2):
            c_id, cos = got[(p, rank)]
            assert c_id == order[rank - 1]
            assert math.isclose(cos, round(float(sims[c_id]), 6), abs_tol=1e-6)


def test_cosine_topk_size_gate(spark):
    rows = _vecs(5)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="lsh_topk"):
        cosine_topk(df, df, "vec_id", "vec_id", corpus_rows=3_000_000)


def test_lsh_topk_recall_on_near_dup(spark):
    rows = _vecs()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = lsh_topk(df.filter(F.col("vec_id") == 0), df, "vec_id", "vec_id", k=1, dim=8, planes=4)
    got = out.collect()
    # near-identical vector 1 shares every hyperplane sign with vector 0
    assert got and got[0]["c_id"] == 1


def test_lsh_candidates_is_what_lsh_topk_ranks(spark):
    """r12: lsh_candidates' docstring claim — 'what lsh_topk ranks, this
    counts' — pinned until the r13 refactor single-sources the stage:
    at the SAME (dim, planes, tables, seed), lsh_topk's ranked output
    pairs must be EXACTLY the candidate pairs when k >= |corpus| (same
    bucket join, same self-filter, same cross-table dedup), and always
    a subset for small k. Trips if either copy's bucketing convention
    drifts."""
    rows = _vecs(40, dim=8)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    probe = df.filter(F.col("vec_id") < 5)
    from dopams_etl_spark.operators.similarity import lsh_candidates

    for planes, tables in ((4, 1), (3, 4)):
        cand = {
            (r["p_id"], r["c_id"])
            for r in lsh_candidates(
                probe, df, "vec_id", "vec_id", dim=8,
                planes=planes, tables=tables,
            ).collect()
        }
        ranked_all = {
            (r["p_id"], r["c_id"])
            for r in lsh_topk(
                probe, df, "vec_id", "vec_id", k=len(rows), dim=8,
                planes=planes, tables=tables,
            ).collect()
        }
        assert ranked_all == cand, (planes, tables)
        ranked_k2 = {
            (r["p_id"], r["c_id"])
            for r in lsh_topk(
                probe, df, "vec_id", "vec_id", k=2, dim=8,
                planes=planes, tables=tables,
            ).collect()
        }
        assert ranked_k2 <= cand


def test_lsh_candidates_table_amplification_is_monotone(spark):
    """Adding tables can only ADD candidates: table 0 hashes with seed
    42 in both configs, so the tables=4 union is a superset of the
    tables=1 set at the same planes — the monotonicity that makes the
    ann_cost_recall_tradeoff's cost axis meaningful."""
    rows = _vecs(40, dim=8)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    probe = df.filter(F.col("vec_id") < 5)
    from dopams_etl_spark.operators.similarity import lsh_candidates

    one = {
        (r["p_id"], r["c_id"])
        for r in lsh_candidates(
            probe, df, "vec_id", "vec_id", dim=8, planes=3, tables=1
        ).collect()
    }
    four = {
        (r["p_id"], r["c_id"])
        for r in lsh_candidates(
            probe, df, "vec_id", "vec_id", dim=8, planes=3, tables=4
        ).collect()
    }
    assert one <= four
    assert len(four) > len(one)  # amplification genuinely adds pairs


def test_ivf_topk_recall_vs_exact(spark):
    from dopams_etl_spark.operators.similarity import ivf_topk

    rows = _vecs(60, dim=8)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    probes = df.filter(F.col("vec_id") < 10)
    exact = {
        (r["p_id"], r["rank"]): r["c_id"]
        for r in cosine_topk(probes, df, "vec_id", "vec_id", k=3).collect()
    }
    approx = {
        (r["p_id"], r["rank"]): r["c_id"]
        for r in ivf_topk(probes, df, "vec_id", "vec_id", k=3, n_centroids=8, nprobe=4).collect()
    }
    exact_sets = {p: {exact[(p, r)] for r in (1, 2, 3)} for p in range(10)}
    approx_sets = {p: {v for (pp, _), v in approx.items() if pp == p} for p in range(10)}
    recall = sum(len(exact_sets[p] & approx_sets[p]) for p in range(10)) / 30.0
    assert recall >= 0.5  # nprobe=4 of 8 cells on random data
    # near-identical vector 1 must be vector 0's top hit
    assert approx[(0, 1)] == 1


def test_embedding_near_dups_bucketed(spark):
    rows = _vecs()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = embedding_near_dups(df, "vec_id", threshold=0.99, dim=8, planes=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    # and the plan has no cartesian: the join is on the bucket key
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_ivf_topk_non_contiguous_and_string_ids(spark):
    """The md5-ordered centroid sample must not assume dense integer ids:
    same vectors under sparse ints and under string ids both keep the
    near-duplicate pair as each other's top hit."""
    from dopams_etl_spark.operators.similarity import ivf_topk

    base = _vecs(40, dim=8)
    sparse = [(i * 7 + 1_000_003, v) for i, v in base]
    df = spark.createDataFrame(sparse, ["vec_id", "embedding"])
    out = ivf_topk(df.filter(F.col("vec_id") == 1_000_003), df, "vec_id", "vec_id",
                   k=1, n_centroids=8, nprobe=4).collect()
    assert out and out[0]["c_id"] == 1 * 7 + 1_000_003

    strs = [(f"doc-{i:03d}", v) for i, v in base]
    dfs = spark.createDataFrame(strs, ["vec_id", "embedding"])
    outs = ivf_topk(dfs.filter(F.col("vec_id") == "doc-000"), dfs, "vec_id", "vec_id",
                    k=1, n_centroids=8, nprobe=4).collect()
    assert outs and outs[0]["c_id"] == "doc-001"


def test_lsh_topk_amplified_recall_sf001(spark):
    """Recall floor vs the EXACT brute-force baseline on the real
    embeddings table (random vectors — ANN's worst case). Single-table
    planes=6 measures ~0.08 here; the OR-amplification knob (planes=3,
    tables=16) measured 0.983 — floor set at 0.9 with margin. Independent
    ground truth for the mirrored LSH oracle: a seed/banding bug that
    reproduces in SQL still tanks recall and fails here."""
    from dopams_etl_spark.catalog import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.01")
    probe = emb.filter(F.col("vec_id") < 20)
    exact = {(r["p_id"], r["rank"]): r["c_id"]
             for r in cosine_topk(probe, emb, "vec_id", "vec_id", k=3).collect()}
    es = {p: {exact[(p, r)] for r in (1, 2, 3)} for p in range(20)}
    got = {}
    for r in lsh_topk(probe, emb, "vec_id", "vec_id", k=3,
                      dim=64, planes=3, tables=16).collect():
        got.setdefault(r["p_id"], set()).add(r["c_id"])
    recall = sum(len(es[p] & got.get(p, set())) for p in range(20)) / 60.0
    assert recall >= 0.9, f"LSH recall@3 {recall:.3f} < 0.9"


def test_ivf_topk_recall_sf001(spark):
    """IVF recall floor vs exact on the real sf0.01 embeddings
    (n_centroids=16, nprobe=4 — the registered query's config; measured
    0.65 on random data, floor 0.55 with margin)."""
    from dopams_etl_spark.catalog import load_table
    from dopams_etl_spark.operators.similarity import ivf_topk

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.01")
    probe = emb.filter(F.col("vec_id") < 20)
    exact = {(r["p_id"], r["rank"]): r["c_id"]
             for r in cosine_topk(probe, emb, "vec_id", "vec_id", k=3).collect()}
    es = {p: {exact[(p, r)] for r in (1, 2, 3)} for p in range(20)}
    got = {}
    for r in ivf_topk(probe, emb, "vec_id", "vec_id", k=3,
                      n_centroids=16, nprobe=4).collect():
        got.setdefault(r["p_id"], set()).add(r["c_id"])
    recall = sum(len(es[p] & got.get(p, set())) for p in range(20)) / 60.0
    assert recall >= 0.55, f"IVF recall@3 {recall:.3f} < 0.55"


def test_ivf_refinement_recall_and_determinism(spark):
    """Lloyd-refined IVF (refine_iters>0): valid ranked output, recall@3
    vs exact at least as good as the documented unrefined floor, and
    deterministic across invocations (no RNG in the refinement loop)."""
    from dopams_etl_spark.catalog import load_table
    from dopams_etl_spark.operators.similarity import cosine_topk, ivf_topk

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    probe = emb.filter(F.col("vec_id") < 20)

    def run():
        return ivf_topk(
            probe, emb, "vec_id", "vec_id", "embedding",
            k=3, n_centroids=16, nprobe=4, refine_iters=2,
        )

    got = {(r["p_id"], r["rank"]): r["c_id"] for r in run().collect()}
    exact = {
        (r["p_id"], r["rank"]): r["c_id"]
        for r in cosine_topk(probe, emb, "vec_id", "vec_id", "embedding", k=3).collect()
    }
    recall = sum(got.get(k2) == v for k2, v in exact.items()) / len(exact)
    assert recall >= 0.5, recall
    assert got == {(r["p_id"], r["rank"]): r["c_id"] for r in run().collect()}


def test_semantic_dedup_drops_perturbed_copies(spark):
    """Perturbed near-copies (cosine ~1 to their source) must be dropped
    when co-celled with the source; originals all survive (each original's
    only >=0.99 neighbor has a HIGHER id). Output covers every input row
    exactly once."""
    import random

    from dopams_etl_spark.operators.similarity import semantic_dedup

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    rows += [(i + 1000, [x * 1.0005 for x in v]) for i, v in rows[:20]]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["id"]: r for r in
           semantic_dedup(df, "vec_id", "embedding", threshold=0.99, n_centroids=4).collect()}
    assert len(got) == 60
    assert all(got[i]["keep"] for i in range(40))
    cell_of = {i: got[i]["cell"] for i in got}
    for i in range(20):
        if cell_of[i + 1000] == cell_of[i]:
            assert not got[i + 1000]["keep"], i


def test_cosine_topk_exclude_same_label(spark):
    # vec 1 is a near-copy of vec 0; give them the SAME label so the
    # hard-negative predicate must skip it and surface a different-label
    # neighbor instead
    rows = [(i, v, 0 if i <= 1 else 1) for i, v in _vecs()]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    probe = df.filter(F.col("vec_id") == 0)

    plain = cosine_topk(probe, df, "vec_id", "vec_id", k=1).collect()
    assert plain[0]["c_id"] == 1  # sanity: the near-copy wins without exclusion

    hard = cosine_topk(probe, df, "vec_id", "vec_id", k=5, exclude_same="label").collect()
    got = {r["c_id"] for r in hard}
    assert 1 not in got and 0 not in got
    assert all(r["c_id"] >= 2 for r in hard)  # only label-1 corpus rows

    # null labels disqualify nothing: a NULL-label corpus row may appear
    # for a labeled probe
    rows_null = rows + [(99, [float(x) for x in np.asarray(rows[0][1]) * 0.99], None)]
    df2 = spark.createDataFrame(rows_null, ["vec_id", "embedding", "label"])
    hard2 = cosine_topk(
        df2.filter(F.col("vec_id") == 0), df2, "vec_id", "vec_id", k=1, exclude_same="label"
    ).collect()
    assert hard2[0]["c_id"] == 99


def test_int8_quantize_error_bound_and_edge_cases(spark):
    from dopams_etl_spark.operators.similarity import int8_quantize

    rows = _vecs(20, 16, seed=3) + [(100, [2.5] * 16)]  # constant vector edge
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in int8_quantize(df, "vec_id").collect()}
    for vid, vec in rows:
        r = out[vid]
        if vid == 100:
            assert r["qscale"] == 0.0 and r["mean_abs_err"] == 0.0
        else:
            # affine rounding error is at most scale/2 per lane
            assert r["mean_abs_err"] <= r["qscale"] / 2 + 1e-6
            assert r["qmin"] == round(min(vec), 6)


def test_int8_quantize_empty_vector(spark):
    from dopams_etl_spark.operators.similarity import int8_quantize

    # An empty embedding must not divide by zero (ANSI mode would throw);
    # it surfaces as NULL error instead.
    df = spark.createDataFrame([(1, [])], "vec_id int, embedding array<float>")
    [r] = int8_quantize(df, "vec_id").collect()
    assert r["mean_abs_err"] is None


def test_kmeans_assign_matches_numpy_lloyd(spark):
    import hashlib

    from dopams_etl_spark.operators.similarity import kmeans_assign

    rows = _vecs(40, 8, seed=11)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r["cluster"] for r in kmeans_assign(df, "vec_id", k=4, iters=2).collect()}
    assert set(out) == {i for i, _ in rows}
    assert set(out.values()) <= set(range(4))

    # independent pure-numpy replay: md5-ordered seeds, cosine argmax with
    # lowest-label tie-break, ROUND(mean, 6) updates, empty cells keep the
    # previous centroid
    vecs = {i: np.array(v) for i, v in rows}
    seed_ids = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:4]
    cents = [vecs[i].copy() for i in seed_ids]

    def assign_all():
        a = {}
        for i, v in vecs.items():
            sims = [
                float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c))) for c in cents
            ]
            a[i] = max(range(4), key=lambda j: (sims[j], -j))
        return a

    for _ in range(2):
        a = assign_all()
        for j in range(4):
            members = [vecs[i] for i, c in a.items() if c == j]
            if members:
                cents[j] = np.round(np.mean(members, axis=0), 6)
    assert out == assign_all()


def test_kmeans_assign_deterministic_and_empty_typed(spark):
    from dopams_etl_spark.operators.similarity import kmeans_assign

    rows = _vecs(25, 8, seed=5)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    r1 = sorted(map(tuple, kmeans_assign(df, "vec_id", k=3, iters=1).collect()))
    r2 = sorted(map(tuple, kmeans_assign(df.repartition(7), "vec_id", k=3, iters=1).collect()))
    assert r1 == r2  # partition-invariant

    # r14 typed-empty convention (the pagerank empty-graph recipe): an
    # empty corpus clusters to zero rows with the (id, cluster) schema,
    # never a driver-side ValueError
    empty = spark.createDataFrame([], "vec_id int, embedding array<float>")
    out = kmeans_assign(empty, "vec_id")
    assert out.columns == ["vec_id", "cluster"]
    assert out.count() == 0


def test_kmeans_assign_explicit_seeds_lazy_and_consistent(spark):
    from dopams_etl_spark.operators.similarity import kmeans_assign

    rows = _vecs(30, 8, seed=9)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    seeds = [[1.0] * 8, [float(i % 3 - 1) for i in range(8)], [-1.0] * 8]

    # seeds= + iters=0 is a fully lazy map-only plan: no job may run at
    # plan-build time (the eager seed collect is skipped).
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    plan = kmeans_assign(df, "vec_id", iters=0, seeds=seeds)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "kmeans_assign(seeds=) ran a job at plan-build"

    # Assignment equals brute-force numpy cosine argmax over the codebook.
    import numpy as np

    got = dict(map(tuple, plan.collect()))
    for i, v in rows:
        v = np.array(v)
        sims = [
            float(v @ np.array(s) / (np.linalg.norm(v) * np.linalg.norm(s)))
            for s in seeds
        ]
        assert got[i] == max(range(3), key=lambda j: (sims[j], -j)), i

    # The trained path is unchanged: seeds=None still self-seeds.
    trained = kmeans_assign(df, "vec_id", k=3, iters=1)
    assert trained.count() == 30


def test_margin_mining_demotes_hub_vectors(spark):
    """The semantic reason margin_mined_pairs exists (Artetxe & Schwenk):
    a HUB vector — closer to every query than their true matches — wins
    raw cosine top-1 for every x, but the ratio margin (cos over the
    pair's k-NN backgrounds) demotes it and recovers each x's true
    match. Constructed geometry: x_i = 1 + 0.35 e_i; true y_i adds an
    orthogonal noise dim (so cos(x_i, y_i) < cos(x_i, hub)); hub = the
    all-ones centroid."""
    import numpy as np

    from dopams_etl_spark.operators.similarity import (
        cosine_topk,
        margin_mined_pairs,
    )

    n, dim = 6, 18
    c = np.ones(dim)
    e = np.eye(dim)
    xs = [c + 0.35 * e[i] for i in range(n)]
    ys = [c + 0.35 * e[i] + 0.45 * e[n + i] for i in range(n)]
    hub_id = 100
    x_df = spark.createDataFrame(
        [(i, [float(v) for v in x]) for i, x in enumerate(xs)],
        "vec_id long, embedding array<double>",
    )
    y_df = spark.createDataFrame(
        [(10 + i, [float(v) for v in y]) for i, y in enumerate(ys)]
        + [(hub_id, [float(v) for v in c])],
        "vec_id long, embedding array<double>",
    )
    # raw cosine top-1: the hub wins EVERY query
    raw = {
        r["p_id"]: r["c_id"]
        for r in cosine_topk(
            x_df, y_df, "vec_id", "vec_id", "embedding", k=1
        ).collect()
    }
    assert all(raw[i] == hub_id for i in range(n)), raw
    # margin re-score: every x recovers its true match; the hub is
    # never kept
    mined = {
        r["x_id"]: (r["y_id"], r["margin"])
        for r in margin_mined_pairs(
            x_df, y_df, "vec_id", "embedding", k=4, threshold=1.0
        ).collect()
    }
    assert set(mined) == set(range(n))
    for i in range(n):
        y_id, margin = mined[i]
        assert y_id == 10 + i, (i, mined[i])
        assert margin >= 1.0


def test_kmeans_assign_empty_seed_list_raises(spark):
    """r14 review: an explicit seeds=[] is a caller bug and must fail
    loudly — it used to fall through to the typed-empty guard and
    silently discard a non-empty corpus."""
    import pytest as _pytest

    from dopams_etl_spark.operators.similarity import kmeans_assign

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="empty explicit codebook"):
        kmeans_assign(df, "vec_id", seeds=[])


def test_ann_notnull_rejects_unwrappable_reads():
    """r14 review: the guard must reject an oracle whose embeddings read
    is line-broken (regex-visible but not verbatim-replaceable) — it
    would otherwise stay silently unwrapped."""
    import pytest as _pytest

    from dopams_etl_spark.plans.catalog import ann_notnull

    ok = ann_notnull("SELECT * FROM embeddings")
    assert "embedding IS NOT NULL" in ok
    with _pytest.raises(ValueError, match="verbatim"):
        ann_notnull("SELECT * FROM\nembeddings")
    with _pytest.raises(ValueError, match="verbatim"):
        # one verbatim read must not excuse a second line-broken one
        ann_notnull(
            "SELECT * FROM embeddings UNION ALL SELECT * FROM\nembeddings"
        )
