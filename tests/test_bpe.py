from dopams_etl_spark.operators.bpe import bpe_reference_py, bpe_train


def test_bpe_matches_independent_reference(spark):
    # Sennrich-style corpus: merges must follow weighted pair frequency
    words = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    rows = [(" ".join([w] * f),) for w, f in words.items()]
    df = spark.createDataFrame(rows, ["text"])

    got = bpe_train(df, "text", n_merges=6)
    want = bpe_reference_py(words, 6)
    assert got == want
    # the classic first merge on this corpus: ('e','s') with 6+3=9
    assert got[0] == ("e", "s", 9)


def test_bpe_overlapping_runs_fold_left_greedy(spark):
    # 'aaaa' under merge (a,a): left-to-right non-overlap -> [aa, aa],
    # so iteration 2 counts (aa,aa), never the overlapping middle pair
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], ["text"])
    got = bpe_train(df, "text", n_merges=2)
    want = bpe_reference_py({"aaaa": 3}, 2)
    assert got == want
    assert got[0][:2] == ("a", "a")
    assert got[1][:2] == ("aa", "aa")


def test_bpe_stops_when_no_pairs_remain(spark):
    df = spark.createDataFrame([("ab ab",)], ["text"])
    got = bpe_train(df, "text", n_merges=10)
    # one merge fuses the whole 2-char word; nothing pairable remains
    assert got == [("a", "b", 2)]


def test_bpe_encode_counts_matches_reference_apply(spark):
    """Encode with learned merges: per-doc symbol counts equal applying the
    pure-Python reference merges word-by-word."""
    from dopams_etl_spark.operators.bpe import (
        bpe_encode_counts,
        bpe_reference_py,
        bpe_train,
    )

    rows = [(1, "low lower lowest"), (2, "new newer newest low"), (3, "wide wider")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = bpe_train(df, "text", n_merges=4)

    # independent apply: reference merge loop over each word
    def encode(word: str) -> int:
        s = list(word)
        for a, b, _ in merges:
            new, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(s[i])
                    i += 1
            s = new
        return len(s)

    expect = {
        doc_id: (len(text.split()), sum(encode(w) for w in text.lower().split()))
        for doc_id, text in rows
    }
    got = {
        r["doc_id"]: (r["n_words"], r["n_symbols"])
        for r in bpe_encode_counts(df, "doc_id", "text", merges).collect()
    }
    assert got == expect


def test_bpe_encode_oracle_survives_merge_exhaustion(spark):
    """A corpus with fewer learnable merges than oracle stages must not
    wipe the vocabulary in the SQL restatement (LEFT JOIN guard): both
    engines return full per-doc counts."""
    import duckdb
    import pandas as pd

    from dopams_etl_spark.operators.bpe import bpe_encode_counts, bpe_train
    from dopams_etl_spark.plans.textops import _bpe_encode_oracle

    rows = [(1, "ab ab cd"), (2, "ab cd")]  # pairs dry up after ~2 merges
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = bpe_train(df, "text", n_merges=4)
    assert len(merges) < 4  # the early-stop actually triggers
    got = {
        r["doc_id"]: (r["n_words"], r["n_symbols"])
        for r in bpe_encode_counts(df, "doc_id", "text", merges).collect()
    }

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    oracle = {
        int(d): (int(w), int(s))
        for d, w, s in con.sql(_bpe_encode_oracle(4)).fetchall()
    }
    assert got == oracle and len(got) == 2
