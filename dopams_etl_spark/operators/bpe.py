"""BPE tokenizer training at corpus scale (iterative merge induction).

Classic byte-pair-encoding training (Sennrich et al. 2016, public): start
from character symbols, repeatedly (1) count adjacent symbol pairs
weighted by word frequency, (2) merge the most frequent pair everywhere.
The reference ships no tokenizer; a training-data engine needs one —
token budgets, packing, and dedup shingles all assume a tokenizer exists.

Spark shape per iteration:
- the corpus collapses to the DISTINCT-word frequency table ONCE
  (``localCheckpoint`` so the scan never re-runs) — every subsequent cost
  is vocabulary-sized, not corpus-sized;
- pair counting is an explode over per-word symbol-pair arrays + one
  weighted-sum aggregate; the argmax pair is a ONE-ROW driver collect
  (the legitimate kind of ``collect``: a scalar decision per iteration,
  same pattern as the watermark scalar);
- the merge applies as a pure higher-order fold over each word's symbol
  array (no UDF); ``localCheckpoint`` every iteration truncates the
  otherwise-exponential expression lineage (same discipline as
  ``operators/graph.py`` connected components).

Determinism: ties break on (count DESC, pair ASC), so the merge sequence
is reproducible across runs, partitionings, and engines — tests verify
against an independent pure-Python reference implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dopams_etl_spark.functions.textfns import tokens


def _adjacent_pairs(sym: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs (empty for 1-symbol words)."""
    return F.when(
        F.size(sym) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(sym) - 1),
            lambda i: F.struct(
                F.element_at(sym, i).alias("a"), F.element_at(sym, i + 1).alias("b")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def _apply_merge(sym: Column, a: str, b: str) -> Column:
    """Fold that rewrites every adjacent (a, b) into the fused symbol.

    Left-to-right with greedy non-overlap (after fusing, the fused symbol
    can itself pair with the next b — matching the standard
    implementation's scan order).
    """
    fused = a + b
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(fused))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 10, min_word_len: int = 1
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a text column.

    Returns the ordered merge list [(a, b, weighted_count), ...] — the
    tokenizer artifact. Stops early when no pair remains.
    """
    wf = (
        df.filter(F.trim(text_col) != "")
        .select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.length("w") >= min_word_len)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("sym", F.split("w", ""))
        .select("sym", "freq")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    cur = wf
    for _ in range(n_merges):
        top = (
            cur.select(F.explode(_adjacent_pairs(F.col("sym"))).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        cur = cur.select(
            _apply_merge(F.col("sym"), a, b).alias("sym"), "freq"
        ).localCheckpoint(eager=True)
    return merges


def bpe_encode_counts(
    df: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """Tokenize a corpus with a learned merge list — the ENCODE half of the
    tokenizer loop (``bpe_train`` is the other). Returns per-document
    (id, n_words, n_symbols): the post-merge symbol count is the token
    budget the packing/chunking operators consume.

    Spark shape: the merge folds run over the DISTINCT vocabulary, not the
    token stream (the same corpus→vocab collapse as training — at 100 TB
    the vocabulary is orders of magnitude smaller than the corpus), then
    one hash join keyed on the word rides the per-word symbol count back
    onto the exploded token stream and a single groupBy re-aggregates per
    document. The merge application itself is the pure higher-order fold
    ``_apply_merge`` — JVM codegen, no UDF.
    """
    from dopams_etl_spark.functions.textfns import tokens

    words = (
        df.filter(F.trim(text_col) != "")
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("w"))
        .filter(F.length("w") >= 1)
    )
    vocab = words.select("w").distinct().withColumn("sym", F.split("w", ""))
    for a, b, _ in merges:
        vocab = vocab.select("w", _apply_merge(F.col("sym"), a, b).alias("sym"))
    enc = vocab.select("w", F.size("sym").alias("__n_sym"))
    return words.join(enc, "w").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("__n_sym").cast("long").alias("n_symbols"),
    )


def bpe_reference_py(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str, int]]:
    """Independent brute-force reference (tests only): plain dict/loop
    implementation of the same greedy algorithm with the same tie-break."""
    syms = {w: list(w) for w in word_freqs}
    out: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, freq in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + freq
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((a, b, n))
        for w in syms:
            s, new = syms[w], []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(s[i])
                    i += 1
            syms[w] = new
    return out
