from pyspark.sql import functions as F

from dopams_etl_spark.operators.resolution import (
    age_score,
    name_similarity,
    resolve_canonical,
    score_pairs,
    token_set_similarity,
)


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "pid long, name_a string, addr_a string, age_a int, alias_a string, "
        "cand_id long, name_b string, addr_b string, age_b int, alias_b string, "
        "canonical_person_id string"
    )


def test_identical_pair_merges_tier1(spark):
    df = _pairs(spark, [(1, "ravi teja", "ward 5 hyd", 30, "chotu",
                         9, "ravi teja", "ward 5 hyd", 30, "chotu", "canon_9")])
    scored = score_pairs(df, same_ps=F.lit(True))
    r = resolve_canonical(scored, "pid", "canonical_person_id", ("name_a", "addr_a", "age_a")).collect()[0]
    assert r["best_score"] >= 0.82
    assert r["tier"] == 1 and r["canonical_id"] == "canon_9" and not r["needs_review"]


def test_partial_match_tier2_review(spark):
    # same name, different address/age/alias → lands in the 0.60–0.82 band
    df = _pairs(spark, [(1, "ravi teja", "odd colony", 30, None,
                         9, "ravi teja", "far away place", 55, "pinky", "canon_9")])
    r = resolve_canonical(
        score_pairs(df), "pid", "canonical_person_id", ("name_a", "addr_a", "age_a")
    ).collect()[0]
    assert 0.60 <= r["best_score"] < 0.82
    assert r["tier"] == 2 and r["needs_review"] and r["canonical_id"] != "canon_9"


def test_unrelated_pair_tier3(spark):
    df = _pairs(spark, [(1, "ravi teja", "hyd", 30, None,
                         9, "mohammed irfan", "warangal", 55, None, "canon_9")])
    r = resolve_canonical(
        score_pairs(df), "pid", "canonical_person_id", ("name_a", "addr_a", "age_a")
    ).collect()[0]
    assert r["tier"] == 3 and not r["needs_review"] and r["canonical_id"] != "canon_9"


def test_common_single_name_penalty(spark):
    plain = _pairs(spark, [(1, "mahesh", "x", 30, None, 9, "mahesh", "x", 30, None, "c")])
    common = _pairs(spark, [(1, "kumar", "x", 30, None, 9, "kumar", "x", 30, None, "c")])
    s_plain = score_pairs(plain).collect()[0]["score"]
    s_common = score_pairs(common).collect()[0]["score"]
    assert s_common < s_plain  # ×0.85 penalty for common single-token names


def test_component_similarities(spark):
    df = spark.createDataFrame([("ravi kumar", "kumar ravi"), ("ravi", "rovi")], ["a", "b"])
    rows = df.select(
        F.round(token_set_similarity(F.col("a"), F.col("b")), 2).alias("tok"),
        F.round(name_similarity(F.col("a"), F.col("b")), 2).alias("name"),
    ).collect()
    assert rows[0]["tok"] == 1.0          # token sets identical despite order
    assert 0.5 <= rows[1]["name"] < 1.0   # one substitution


def test_age_score_decay(spark):
    df = spark.createDataFrame([(30, 30), (30, 33), (30, 45), (None, 30)], "a int, b int")
    got = [r["s"] for r in
           df.select(F.round(age_score(F.col("a"), F.col("b")), 2).alias("s")).collect()]
    assert got == [0.8, 0.7, 0.0, 0.5]


def test_jaro_winkler_known_values(spark):
    """Textbook values: MARTHA/MARHTA 0.9611, DIXON/DICKSONX 0.8133,
    identical 1.0, disjoint 0.0."""
    from dopams_etl_spark.operators.resolution import jaro_winkler

    df = spark.createDataFrame(
        [("martha", "marhta"), ("dixon", "dicksonx"), ("abc", "abc"), ("abc", "xyz")],
        "a string, b string",
    )
    got = [round(r["jw"], 4) for r in df.select(jaro_winkler("a", "b").alias("jw")).collect()]
    assert got == [0.9611, 0.8133, 1.0, 0.0]


def test_weighted_score_hand_computed(spark):
    """Independent ground truth for the D2 scorer: expected totals computed
    BY HAND from the reference weight vector (0.35 name / 0.20 token /
    0.15 phonetic / 0.12 addr / 0.10 age / 0.08 alias,
    ``brief_facts_ai/main.py:269–276``) — not mirrored from the engine, so
    a weight or component bug fails here even if the SQL oracle (which
    replays the same algorithm) stays green."""
    df = _pairs(spark, [
        # all components maximal: 1,1,1,1·0.12 + 0.8·0.10 + 1·0.08 = 0.98
        (1, "asha devi", "ward 5 hyd", 40, "chinni",
         9, "asha devi", "ward 5 hyd", 40, "chinni", "c"),
        # addr Jaccard {mg,road,12}∩{mg,road,77} = 2/4 → 0.06; age |30−35|
        # decays to 0.5 → 0.05; alias NULL → 0: 0.70 + 0.06 + 0.05 = 0.81
        (2, "asha devi", "mg road 12", 30, None,
         9, "asha devi", "mg road 77", 35, None, "c"),
        # common single token: (0.70 + 0.12 + 0.08) × 0.85 = 0.765
        (3, "kumar", "x", 30, None, 9, "kumar", "x", 30, None, "c"),
    ])
    got = {r["pid"]: r["score"] for r in score_pairs(df).collect()}
    assert abs(got[1] - 0.98) <= 0.011
    assert abs(got[2] - 0.81) <= 0.011
    assert abs(got[3] - 0.765) <= 0.011


def test_skew_collapse_matches_naive_pipeline(spark, tmp_path):
    """r14 scale pass: entity_resolution_blocked collapses duplicate
    attribute tuples before pairwise scoring (the naive blocked join is
    quadratic in block size — sf0.01→sf0.1 blew up 16 s → ~20 min). The
    collapse must be RESULT-IDENTICAL to the naive pipeline, including
    the pid != cand_id self-exclusion and the (score DESC, canonical
    ASC) tie-break — both exercised here because the synthetic roster
    maps many pids onto the same attribute tuple."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as se
    from dopams_etl_spark.operators.joins import soundex_blocked_candidates
    from dopams_etl_spark.operators.resolution import (
        resolve_canonical,
        score_pairs,
    )
    from dopams_etl_spark.plans.domain import _NAMES

    n = 150
    table = pa.table(
        {
            "c_custkey": pa.array(range(1, n + 1), type=pa.int64()),
            "c_name": pa.array([f"Customer#{i}" for i in range(1, n + 1)]),
            "c_acctbal": pa.array([float(i) for i in range(1, n + 1)]),
            "c_mktsegment": pa.array(["BUILDING"] * n),
            "c_nationkey": pa.array([i % 25 for i in range(1, n + 1)], type=pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "customer.parquet"))

    got = (
        se.queries()["entity_resolution_blocked"](spark, str(tmp_path))
        .orderBy("pid")
        .collect()
    )

    # the naive pipeline, verbatim pre-rewrite
    cust = spark.read.parquet(str(tmp_path / "customer.parquet"))
    names = F.array(*[F.lit(x) for x in _NAMES])
    k = F.col("c_custkey")
    base = cust.select(
        k.alias("pid"),
        names[(k % 8).cast("int")].alias("name"),
        F.concat(
            F.lit("district_"), (k % 5).cast("string"),
            F.lit(" ward "), (k % 11).cast("string"),
        ).alias("addr"),
        (k % 40 + 18).cast("int").alias("age"),
        F.when(k % 3 == 0, F.lit("chotu")).alias("alias"),
    )
    probe = base.select(
        "pid",
        F.expr("substring(name, 1, length(name) - 1)").alias("name_a"),
        F.col("addr").alias("addr_a"),
        F.col("age").alias("age_a"),
        F.col("alias").alias("alias_a"),
    )
    cand = base.select(
        F.col("pid").alias("cand_id"),
        F.col("name").alias("name_b"),
        F.col("addr").alias("addr_b"),
        F.col("age").alias("age_b"),
        F.col("alias").alias("alias_b"),
        F.concat(F.lit("canon_"), F.col("pid").cast("string")).alias(
            "canonical_person_id"
        ),
    )
    pairs = soundex_blocked_candidates(probe, cand, "name_a", "name_b").filter(
        F.col("pid") != F.col("cand_id")
    )
    scored = score_pairs(pairs, same_ps=F.col("pid") % 2 == F.col("cand_id") % 2)
    want = (
        resolve_canonical(
            scored, "pid", "canonical_person_id", ("name_a", "addr_a", "age_a")
        )
        .select("pid", "canonical_id", "best_score", "tier", "needs_review")
        .orderBy("pid")
        .collect()
    )

    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g.asDict() == w.asDict(), (g, w)


def test_er_cand_canonical_ids_unique(spark):
    """r14 ADVICE precondition pin: the skew-collapse rewrite's
    min_by('cand_id', 'canonical_person_id') and min1/min2 self-pair
    exclusion are only deterministic/correct because each cand row
    carries a UNIQUE canonical id ('canon_' + pid over unique pids).
    Assert that invariant on the real roster construction so any future
    re-keying (e.g. a roster joining in canonicals from a prior run)
    trips this test instead of silently going nondeterministic."""
    from dopams_etl_spark.catalog import load_table

    cust = load_table(spark, "customer", "/root/testdata/sf0.001")
    cand = cust.select(
        F.concat(F.lit("canon_"), F.col("c_custkey").cast("string")).alias(
            "canonical_person_id"
        )
    )
    total = cand.count()
    distinct = cand.distinct().count()
    assert total == distinct > 0
