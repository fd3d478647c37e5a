import json

from pyspark.sql import functions as F

from dopams_etl_spark.operators.packing import pack_sequences


def _collect(df):
    return sorted(
        (r["shard"], r["seq_num"], r["n_docs"], r["seq_tokens"], r["doc_ids"])
        for r in df.collect()
    )


def test_packing_invariants(spark):
    # token counts chosen to force mid-bin closes and an oversize singleton
    data = [(i, [5, 40, 100, 300, 17][i % 5]) for i in range(60)]
    df = spark.createDataFrame(data, ["doc_id", "tok"])
    out = pack_sequences(df, "doc_id", "tok", budget=256, shards=4).collect()

    packed = []
    for r in out:
        ids = json.loads(r["doc_ids"])
        assert r["n_docs"] == len(ids)
        toks = {i: t for i, t in data}
        assert r["seq_tokens"] == sum(toks[i] for i in ids)
        # a bin only exceeds the budget when it holds one oversize doc
        if r["seq_tokens"] > 256:
            assert len(ids) == 1
        # pack order is doc order
        assert ids == sorted(ids)
        packed.extend(ids)
    # exactly-once: every doc in exactly one sequence
    assert sorted(packed) == [i for i, _ in data]


def test_packing_next_fit_boundaries(spark):
    # one shard -> the fold is fully predictable: 100+100 fits, +100 closes
    df = spark.createDataFrame([(i, 100) for i in range(5)], ["doc_id", "tok"])
    out = _collect(pack_sequences(df, "doc_id", "tok", budget=256, shards=1))
    assert [(r[1], r[3], r[4]) for r in out] == [
        (1, 200, "[0,1]"),
        (2, 200, "[2,3]"),
        (3, 100, "[4]"),
    ]


def test_packing_partitioning_invariant(spark):
    data = [(i, 1 + (i * 37) % 200) for i in range(200)]
    df = spark.createDataFrame(data, ["doc_id", "tok"])
    a = _collect(pack_sequences(df, "doc_id", "tok", budget=256, shards=8))
    b = _collect(pack_sequences(df.repartition(13), "doc_id", "tok", budget=256, shards=8))
    assert a == b


def test_packing_rejects_non_integral_ids(spark):
    import pytest

    df = spark.createDataFrame([("a", 10)], ["doc_id", "tok"])
    with pytest.raises(TypeError, match="integral id column"):
        pack_sequences(df, "doc_id", "tok")
