"""Document-quality signals beyond scalar ratios.

Complements ``functions.textfns`` (scalar, per-row quality ratios) with the
repetition family from the Gopher corpus-filtering rules (Rae et al. 2021,
Table A1) — the standard "remove boilerplate/spam" pass of a training-data
pipeline. The reference has no analog (its documents are court texts with
per-field cleaning); this is part of the LLM-pipeline surface the engine
adds on top of reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token-level restatement of Gopher's repetition fractions:

    - ``top2_frac``: tokens covered by the most frequent 2-gram —
      ``min(1, 2 * max-2-gram-count / n_tokens)`` (the paper's "fraction
      of characters in most common n-gram", over tokens; overlapping
      occurrences can overcount, hence the cap).
    - ``dup5_frac``: fraction of token *positions* covered by at least one
      5-gram occurring more than once in the document (the paper's
      "fraction of characters in duplicated n-grams", exact interval
      union, not the overcounting sum).

    Plan shape: one explode of per-row derived gram arrays (JVM array
    math), gram counts as a window over (id, gram) — a single shuffle
    whose key includes the gram, so frequency skew spreads across
    reducers; the interval union is explode→distinct→count on (id, pos),
    bounded by 5× the token count. All whole-stage-codegen expressions;
    at 100 TB each document's state stays proportional to its own length.
    """
    from dopams_etl_spark.partitioning import ensure_parallelism

    txt = F.trim(F.lower(F.col(text_col)))
    # r15 (guide §2.4): the tokenized base is referenced three times
    # (top2 branch, dup5 branch, final join) and a small corpus scans as
    # one task — spread on the doc id so the per-branch tokenize+gram
    # work parallelizes. Per-doc aggregates are order-invariant (counts,
    # max, first over a per-doc constant). No-op at real parallelism.
    df = ensure_parallelism(df, id_col)
    # NULL text scores like an empty doc: 0 tokens, 0.0 fractions
    base = df.select(
        F.col(id_col).alias("id"),
        F.when(
            txt.isNull() | (txt == ""), F.array().cast("array<string>")
        ).otherwise(F.split(txt, r"\s+")).alias("tk"),
    ).withColumn("n", F.size("tk"))

    def gram(start, width):
        return F.concat_ws(
            " ", *[F.element_at(F.col("tk"), start + j) for j in range(width)]
        )

    g2 = base.filter(F.col("n") >= 2).select(
        "id", "n",
        F.explode(
            F.transform(F.sequence(F.lit(1), F.col("n") - 1), lambda i: gram(i, 2))
        ).alias("gram"),
    )
    top2 = (
        g2.groupBy("id", "n", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("id")
        .agg(
            F.round(
                F.least(F.lit(1.0), F.max("cnt") * 2.0 / F.first("n")), 6
            ).alias("top2_frac")
        )
    )

    g5 = base.filter(F.col("n") >= 5).select(
        "id", "n",
        F.posexplode(
            F.transform(F.sequence(F.lit(1), F.col("n") - 4), lambda i: gram(i, 5))
        ).alias("pos", "gram"),
    )
    w = Window.partitionBy("id", "gram")
    dup5 = (
        g5.withColumn("cnt", F.count(F.lit(1)).over(w))
        .filter(F.col("cnt") >= 2)
        .select(
            "id", "n",
            F.explode(F.sequence(F.col("pos") + 1, F.col("pos") + 5)).alias("p"),
        )
        .distinct()
        .groupBy("id")
        .agg(F.round(F.count(F.lit(1)) / F.first("n"), 6).alias("dup5_frac"))
    )

    return (
        base.join(top2, "id", "left")
        .join(dup5, "id", "left")
        .select(
            F.col("id"),
            F.col("n").cast("int").alias("n_tokens"),
            F.coalesce("top2_frac", F.lit(0.0)).alias("top2_frac"),
            F.coalesce("dup5_frac", F.lit(0.0)).alias("dup5_frac"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    standard pre-packing step of an LLM training pipeline (context-length
    budgeting). Chunk k covers tokens [k·stride, k·stride + chunk_tokens)
    with stride = chunk_tokens − overlap; the last chunk is the remainder
    (never empty, never duplicated: a doc shorter than one chunk yields
    exactly one chunk).

    One-to-many fan-out as a JVM array transform + posexplode — no Python
    boundary, and the explode happens AFTER the scan projection so only
    (id, tokens) ever shuffles. Returns (id, chunk_idx, n_tokens, chunk)
    rows; chunk is the space-rejoined token window.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    txt = F.trim(F.lower(F.col(text_col)))
    # NULL text chunks like an empty doc: zero chunks (shared convention)
    base = df.select(
        F.col(id_col).alias("id"),
        F.when(
            txt.isNull() | (txt == ""), F.array().cast("array<string>")
        ).otherwise(F.split(txt, r"\s+")).alias("tk"),
    ).withColumn("n", F.size("tk"))
    # number of chunks: 1 + ceil(max(0, n - chunk) / stride); empty doc -> 0
    n_chunks = F.when(F.col("n") <= 0, F.lit(0)).otherwise(
        1 + F.ceil(F.greatest(F.col("n") - chunk_tokens, F.lit(0)) / stride).cast("int")
    )
    return (
        base.withColumn("nc", n_chunks)
        .filter(F.col("nc") > 0)
        .select(
            "id", "tk", "n",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("nc") - 1),
                    lambda k: F.slice(F.col("tk"), k * stride + 1, chunk_tokens),
                )
            ).alias("chunk_idx", "ck"),
        )
        .select(
            "id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size("ck").cast("int").alias("n_tokens"),
            F.concat_ws(" ", "ck").alias("chunk"),
        )
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic stratified downsampling — the mixture-weighting step
    of training-corpus assembly (upweight/downweight sources to hit a
    target composition). Membership is a pure function of the row key:
    keep a row iff the first two hex chars of ``md5(stratum|id)`` fall
    below ``round(rate·256)`` — granularity 1/256, no RNG state, no
    engine-specific sampler, so the sample is reproducible across runs,
    partitionings, AND engines (``sampleBy`` is seeded but its row walk
    is engine/partition-dependent; this is the honest distributed
    contract). Filters are a narrow map — no shuffle; at 100 TB the
    sample decision rides the scan.
    """
    def thr(rate: float) -> str:
        n = round(rate * 256)
        # "g" sorts after every hex pair -> keep-all; hex pairs are
        # compared lexicographically against the 2-char key.
        return "g" if n >= 256 else format(max(n, 0), "02x")

    key = F.md5(
        F.concat(F.col(stratum_col).cast("string"), F.lit("|"), F.col(id_col).cast("string"))
    ).substr(1, 2)
    expr = F.lit(thr(default_rate))
    for stratum, rate in sorted(rates.items()):
        expr = F.when(F.col(stratum_col) == stratum, F.lit(thr(rate))).otherwise(expr)
    return df.filter(key < expr)


def assign_split(
    df: DataFrame,
    id_col: str,
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test routing: the first 8 hex chars of
    ``md5(salt|id)`` are a 32-bit uniform; cumulative fraction thresholds
    carve [0, 2³²) into ordered buckets. Assignment is a pure function of
    (salt, id) — reproducible across runs, partitionings, and engines
    (the same honest-distributed contract as ``mixture_sample``), and the
    salt versions the split so re-running a grown corpus never moves an
    already-assigned row between splits. Thresholds compare as exact
    integers (no float division), so a SQL oracle agrees bit-for-bit.
    A narrow map — the split decision rides the scan, no shuffle.
    """
    from dopams_etl_spark.functions.ids import md5_bucket32

    v = md5_bucket32(
        F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))
    )
    expr = F.lit(fractions[-1][0])
    for name, cut in reversed(split_cuts(fractions)):
        expr = F.when(v < F.lit(cut), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def split_cuts(
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
) -> list[tuple[str, int]]:
    """The exact-integer cumulative thresholds ``assign_split`` carves
    [0, 2³²) with: ``int(cum_fraction * 2³²)`` per non-final split,
    TRUNCATED like Python int() (a SQL CAST would round 0.8·2³² UP by
    one). Exposed so oracle SQL interpolates the SAME literals the
    Spark side compares against — the constants can't drift per-query."""
    total = sum(f for _, f in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    cum = 0.0
    cuts: list[tuple[str, int]] = []
    for name, frac in fractions[:-1]:
        cum += frac
        cuts.append((name, int(cum * (1 << 32))))
    return cuts


def assign_shards(
    df: DataFrame, key_cols: list[str], n_shards: int, out_col: str = "shard"
) -> DataFrame:
    """Deterministic shard assignment for training-data output: shard =
    (first two md5 hex nibbles of the '|'-joined key) mod ``n_shards``.
    Hash-uniform keys spread chunks evenly (each shard within a few
    percent of mean — asserted in tests), with no RNG, no engine-specific
    partitioner, so a re-run or a different engine lands every record in
    the same shard; downstream, ``df.write.partitionBy(out_col)`` makes
    the shard the physical output unit. Pure projection — rides the scan.
    """
    key = F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols]))
    val = F.conv(key.substr(1, 2), 16, 10).cast("int")
    return df.withColumn(out_col, (val % n_shards).cast("int"))


def lm_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Perplexity-proxy quality scoring with a corpus-trained bigram LM —
    the KenLM-style "how typical is this document of the corpus" signal
    (CCNet, Wenzek et al. 2020) used to rank training data, restated as a
    self-contained DataFrame job: train the model and score every document
    in one plan, no external LM artifact.

    Model: add-one-smoothed bigram probabilities
    ``P(w2|w1) = (C(w1 w2) + 1) / (C(w1) + V)`` with V = corpus vocabulary
    size; document score = mean log-probability over its bigram positions,
    ``ppl_proxy = exp(-avg_ll)``. Documents with fewer than 2 tokens carry
    NULL scores (no bigram evidence) rather than a fake perfect score.

    Scale shape: the "model" is two count tables — unigrams (≈vocab) and
    bigrams (≈distinct word pairs) — built by map-side-combined groupBys
    whose keys are the grams themselves, so hot-gram skew spreads across
    reducers. Scoring joins each document's bigram positions to those
    tables on the gram key (shuffle bounded by corpus token count, NOT
    corpus²), then one per-doc aggregation. V rides along as a broadcast
    scalar. Everything is JVM expressions; sums of a few hundred doubles
    round to 6 well inside IEEE noise.
    """
    from dopams_etl_spark.partitioning import ensure_parallelism

    txt = F.trim(F.lower(F.col(text_col)))
    # r15 (guide §2.4): the tokenized base feeds four references
    # (positions, unigrams, the scoring join, the final left join) —
    # spread on the doc id so each branch's tokenize runs at full
    # width off a one-row-group scan. No-op at real parallelism.
    base = ensure_parallelism(df, id_col).select(
        F.col(id_col).alias("id"),
        F.when(txt == "", F.array().cast("array<string>")).otherwise(
            F.split(txt, r"\s+")
        ).alias("tk"),
    ).withColumn("n", F.size("tk"))

    positions = base.filter(F.col("n") >= 2).select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("tk"), i).alias("w1"),
                    F.element_at(F.col("tk"), i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    unigrams = (
        base.select(F.explode("tk").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = unigrams.agg(F.count(F.lit(1)).alias("v"))
    bigrams = positions.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))

    ll = F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v")))
    scored = (
        positions.join(bigrams, ["w1", "w2"])
        .join(unigrams, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            # + 0.0 canonicalizes IEEE -0.0 (a ~zero mean log-prob —
            # every bigram near-certain — rounds sign-indefinitely)
            (F.round(F.avg(ll), 6) + 0.0).alias("avg_ll"),
            F.round(F.exp(-F.avg(ll)), 6).alias("ppl_proxy"),
        )
    )
    return (
        base.select("id")
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "avg_ll",
            "ppl_proxy",
        )
    )
