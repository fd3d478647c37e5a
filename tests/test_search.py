"""BM25 retrieval and bigram-LM scoring against hand-computed values —
independent ground truth for the SQL-mirrored oracles (the oracle proves
engine parity; these prove the math)."""

import math

from dopams_etl_spark.operators.quality import lm_score
from dopams_etl_spark.operators.search import bm25_topk


def test_bm25_hand_computed_single_term(spark):
    """3-doc corpus, 1-term query: score must equal the textbook formula.

    Corpus: d1 = "cat" (dl=1, tf=1), d2 = "cat cat dog" (dl=3, tf=2),
    d3 = "dog" (dl=1). N=3, df(cat)=2, avgdl=5/3.
    idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6).
    """
    docs = spark.createDataFrame(
        [(1, "cat"), (2, "cat cat dog"), (3, "dog")], ["doc_id", "text"]
    )
    qs = spark.createDataFrame([(7, "cat")], ["query_id", "query_text"])
    got = {r["doc_id"]: r for r in
           bm25_topk(docs, qs, "doc_id", "text", k=10).collect()}
    assert set(got) == {1, 2}
    idf = math.log(1.6)
    avgdl = 5 / 3
    k1, b = 1.2, 0.75

    def s(tf, dl):
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

    assert got[1]["score"] == s(1, 1)
    assert got[2]["score"] == s(2, 3)
    # Length normalization beats raw tf here: d1 (tf=1, dl=1) outranks
    # d2 (tf=2, dl=3) — s(1,1)≈1.196 > s(2,3)≈1.122.
    assert got[1]["rank"] == 1 and got[2]["rank"] == 2


def test_bm25_multi_term_sum_and_k(spark):
    """Multi-term scores are per-term sums; k truncates; query terms are
    deduplicated (repeating a term does not double its contribution)."""
    docs = spark.createDataFrame(
        [(i, "alpha beta") for i in range(1, 4)] + [(4, "alpha"), (5, "gamma")],
        ["doc_id", "text"],
    )
    qs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha")], ["query_id", "query_text"]
    )
    out = bm25_topk(docs, qs, "doc_id", "text", k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q[1]) == 2 and len(by_q[2]) == 2  # k=2 truncation
    # q2: doc 4 ("alpha", dl=1) outranks the dl=2 alpha-beta docs.
    top_q2 = min(by_q[2], key=lambda r: r["rank"])
    assert top_q2["doc_id"] == 4
    # dedup of query terms: q2's score for doc 4 equals a single-term query's.
    single = {r["doc_id"]: r["score"] for r in
              bm25_topk(docs, spark.createDataFrame([(9, "alpha")],
                        ["query_id", "query_text"]), "doc_id", "text").collect()}
    got_q2 = {r["doc_id"]: r["score"] for r in by_q[2]}
    assert got_q2[4] == single[4]


def test_lm_score_hand_computed(spark):
    """2-doc corpus: bigram add-one model checked against hand math.

    Corpus: d1 = "a b a b", d2 = "a b". Vocab = {a, b}, V=2.
    C(a)=3, C(b)=3; C(a b)=3, C(b a)=1.
    P(b|a) = (3+1)/(3+2) = 0.8;  P(a|b) = (1+1)/(3+2) = 0.4.
    d1 avg_ll = (ln.8 + ln.4 + ln.8)/3; d2 avg_ll = ln 0.8.
    """
    docs = spark.createDataFrame([(1, "a b a b"), (2, "a b")], ["doc_id", "text"])
    got = {r["id"]: r for r in lm_score(docs, "doc_id", "text").collect()}
    d1 = (math.log(0.8) + math.log(0.4) + math.log(0.8)) / 3
    assert got[1]["n_bigrams"] == 3
    assert got[1]["avg_ll"] == round(d1, 6)
    assert got[1]["ppl_proxy"] == round(math.exp(-d1), 6)
    assert got[2]["n_bigrams"] == 1
    assert got[2]["avg_ll"] == round(math.log(0.8), 6)


def test_lm_score_short_docs_null(spark):
    """Docs with <2 tokens (including blank) get NULL scores, not fake
    perfect ones — and still appear in the output exactly once."""
    docs = spark.createDataFrame(
        [(1, "only"), (2, "   "), (3, "two tokens")], ["doc_id", "text"]
    )
    got = {r["id"]: r for r in lm_score(docs, "doc_id", "text").collect()}
    assert set(got) == {1, 2, 3}
    for i in (1, 2):
        assert got[i]["n_bigrams"] == 0
        assert got[i]["avg_ll"] is None and got[i]["ppl_proxy"] is None
    assert got[3]["n_bigrams"] == 1 and got[3]["avg_ll"] is not None
