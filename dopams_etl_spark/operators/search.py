"""Full-text relevance search over a document corpus (BM25).

Training-data curation needs corpus-scale retrieval (e.g. "find the
documents most relevant to these probe queries" for targeted sampling or
eval-set construction). The reference's closest analog is its ILIKE-based
``advanced_search`` endpoints (substring match, no ranking); this adds the
standard ranked retrieval operator, built as an inverted index entirely in
DataFrame ops:

- postings = explode(tokens) → groupBy(doc, term) count — ONE shuffle
  keyed by (doc, term), map-side combined;
- document frequency = groupBy(term) over the postings — keys are terms,
  so frequent-term skew spreads across reducers;
- the query side is human-written probe queries — KBs at any corpus scale
  — so it broadcasts; corpus postings never shuffle for the probe join;
- scoring is pure JVM arithmetic (whole-stage codegen), top-k per query
  via one window over the (tiny) matched subset.

At 100 TB the postings table is the only big intermediate (~tokens per
corpus); it is reusable across query batches — materialize it once and
amortize (``build_postings`` is public for exactly that).

BM25 constants k1=1.2, b=0.75 (Robertson & Zaragoza 2009 defaults); idf is
the Lucene-style always-positive ``ln(1 + (N - df + .5)/(df + .5))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dopams_etl_spark.functions.textfns import _c, tokens


def _safe_tokens(col) -> "F.Column":
    """tokens(), but blank/whitespace-only text yields [] (split('') is [''])."""
    return F.when(F.trim(_c(col)) == "", F.array().cast("array<string>")).otherwise(
        tokens(col)
    )


def build_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Inverted-index postings: (doc, dl, term, tf) — one row per distinct
    term per document, carrying the document length for BM25 normalization."""
    base = docs.select(F.col(id_col).alias("doc"), _safe_tokens(text_col).alias("tk"))
    return (
        base.select("doc", F.size("tk").alias("dl"), F.explode("tk").alias("term"))
        .groupBy("doc", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    query_id: str = "query_id",
    query_text: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents per query by BM25.

    Returns (query_id, doc_id, score, rank); ``score`` rounded to 6 so the
    window order (rounded score desc, doc_id asc) is engine-portable —
    ranking on the unrounded double could disagree with an oracle in the
    last ulp. Query terms are deduplicated (standard bag-of-words query).
    """
    postings = build_postings(docs, id_col, text_col)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        # avgdl as exact-int sum / count: deterministic under any partition
        # order, unlike avg() over doubles.
        F.sum(F.size(_safe_tokens(text_col))).alias("sum_dl"),
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        F.col(query_id).alias("qid"),
        F.explode(F.array_distinct(_safe_tokens(query_text))).alias("term"),
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)
    )
    scored = (
        postings.join(dfreq, "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc")
        .agg(F.round(F.sum(idf * tf_norm), 6).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id),
            F.col("doc").alias("doc_id"),
            "score",
            "rank",
        )
    )


def tfidf_topk(docs: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Top-``k`` characteristic terms per document by smoothed TF-IDF —
    the keyword-extraction / topic-tagging primitive (score =
    tf · (ln((N+1)/(df+1)) + 1), the scikit-learn smoothing that keeps
    corpus-universal terms finite and positive).

    Plan shape: the same postings table BM25 builds (one exploded
    groupBy), document frequencies as a second skinny aggregate keyed on
    the term, the corpus size as a ONE-ROW broadcast, and a per-doc
    row_number window over ≤ |postings| rows. Nothing pairwise, nothing
    driver-side; the doc-keyed window is the only per-doc sort and its
    groups are vocabulary-bounded. Scores rounded to 6 so the
    (score DESC, term ASC) ranking is engine-portable."""
    postings = build_postings(docs, id_col, text_col)
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        postings.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf").cast("double")
                * (
                    F.log(
                        (F.col("n_docs").cast("double") + F.lit(1.0))
                        / (F.col("df").cast("double") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("doc"), "term", "score", "rank")
    )
