"""llm_map / multimodal / watermark / quarantine stage tests."""

import datetime

from pyspark.sql import functions as F

from dopams_etl_spark.operators.llm_map import llm_map, regex_extract_stub
from dopams_etl_spark.operators.multimodal import (
    attach_media_meta,
    decode_media,
    stub_decoder,
    unsupported_decoder,
)
from dopams_etl_spark.operators.quarantine import fk_validate, quarantine_retry
from dopams_etl_spark.operators.watermark import (
    CheckpointStore,
    compute_watermark,
    plan_chunks,
)


def test_llm_map_stub_extraction(spark):
    df = spark.createDataFrame(
        [(1, "the runner and the keeper"), (2, "nothing here")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["extracted"] for r in llm_map(
        df, ["doc_id", "text"], "extracted string, doc_id long",
        regex_extract_stub(r"[a-z]*er\b", "text"), ["doc_id"],
    ).collect()}
    assert out[1] == "keeper,runner" and out[2] == ""


def test_media_decode_stub_and_meta(spark):
    df = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"]).withColumn(
        "payload", F.encode("text", "UTF-8")
    )
    meta = attach_media_meta(df, "payload").collect()[0]
    assert meta["media_bytes"] == 11 and len(meta["media_sha"]) == 64
    dec = decode_media(df, "doc_id", "payload", decoder=stub_decoder).collect()[0]
    assert dec["n_bytes"] == 11 and dec["width"] == 11 and dec["height"] == 11


def test_media_unsupported_decoder_raises():
    try:
        unsupported_decoder(b"x")
        raise AssertionError("should raise")
    except NotImplementedError:
        pass


def test_watermark_floor_and_chunks(spark):
    empty = spark.createDataFrame([], "date_created timestamp, date_modified timestamp")
    assert compute_watermark(empty) == datetime.datetime(2022, 1, 1)
    chunks = plan_chunks(datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 12),
                         chunk_days=5, overlap_days=1)
    assert chunks[0] == (datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 6))
    assert chunks[1][0] == datetime.datetime(2024, 1, 5)  # 1-day overlap
    assert chunks[-1][1] == datetime.datetime(2024, 1, 12)


def test_checkpoint_store_roundtrip(tmp_path):
    store = CheckpointStore(str(tmp_path / "state.json"))
    assert store.get("crimes") is None
    store.set("crimes", datetime.datetime(2024, 2, 1, 12, 0))
    assert store.get("crimes") == datetime.datetime(2024, 2, 1, 12, 0)


def test_fk_validate_and_retry(spark):
    child = spark.createDataFrame([(1, "a"), (2, "b"), (9, "orphan")], ["fk", "v"])
    parent = spark.createDataFrame([(1,), (2,)], ["fk"])
    valid, rejects = fk_validate(child, parent, "fk")
    assert valid.count() == 2 and rejects.count() == 1
    resolved, still = quarantine_retry(rejects, parent, "fk")
    assert resolved.count() == 0 and still.collect()[0]["retry_count"] == 1


def test_expectations_contract(spark):
    from dopams_etl_spark.operators.expectations import expect

    df = spark.createDataFrame(
        [(1, 5.0, "A", "ab"), (2, 99.0, "X", "zz9"), (2, None, "N", "cd"), (None, 3.0, "R", "ef")],
        ["k", "v", "flag", "code"],
    )
    rep = {(r["rule"], r["column"]): (r["violations"], r["pass"]) for r in expect(
        df,
        [
            ("not_null", "k"),
            ("range", "v", 0, 50),
            ("in_set", "flag", ("A", "N", "R")),
            ("matches", "code", "[a-z]+"),
            ("unique", "k"),
        ],
    ).collect()}
    assert rep[("not_null", "k")] == (1, False)
    assert rep[("range", "v")] == (2, False)        # 99 out of range + null
    assert rep[("in_set", "flag")] == (1, False)     # X
    assert rep[("matches", "code")] == (1, False)    # zz9 fails the FULL match
    assert rep[("unique", "k")] == (2, False)        # dup 2 + null key
