"""KeyedTableSink: Delta-gated MERGE with atomic parquet fallback."""

import pytest
from pyspark.sql import functions as F

from dopams_etl_spark.sinks import KeyedTableSink, delta_available


def _sink(spark, tmp_path, fmt="auto"):
    return KeyedTableSink(spark, str(tmp_path / "tbl"), "id", "version", fmt=fmt)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, version long, val string")


def test_initial_write_dedups_batch(spark, tmp_path):
    s = _sink(spark, tmp_path)
    s.upsert(_batch(spark, [(1, 1, "a"), (1, 2, "b"), (2, 1, "c")]))
    got = {(r["id"], r["version"], r["val"]) for r in s.read().collect()}
    assert got == {(1, 2, "b"), (2, 1, "c")}


def test_upsert_latest_wins_and_insert(spark, tmp_path):
    s = _sink(spark, tmp_path)
    s.upsert(_batch(spark, [(1, 1, "a"), (2, 1, "c")]))
    s.upsert(_batch(spark, [(1, 5, "new"), (2, 0, "stale"), (3, 1, "ins")]))
    got = {(r["id"], r["val"]) for r in s.read().collect()}
    # id=1 updated (newer), id=2 kept (older incoming loses), id=3 inserted
    assert got == {(1, "new"), (2, "c"), (3, "ins")}


def test_equal_version_resend_replaces_in_place(spark, tmp_path):
    """I4 guard is >=, not >: a re-sent row with the same version replaces
    (the reference processes in-chunk duplicates rather than skipping)."""
    s = _sink(spark, tmp_path)
    s.upsert(_batch(spark, [(1, 3, "first")]))
    s.upsert(_batch(spark, [(1, 3, "resent")]))
    assert [r["val"] for r in s.read().collect()] == ["resent"]


def test_swap_leaves_no_staging_dirs(spark, tmp_path):
    s = _sink(spark, tmp_path)
    s.upsert(_batch(spark, [(1, 1, "a")]))
    s.upsert(_batch(spark, [(1, 2, "b")]))
    leftovers = [p.name for p in tmp_path.iterdir() if "__" in p.name]
    assert leftovers == []
    assert s.read().count() == 1


def test_delta_fmt_raises_without_delta(spark, tmp_path):
    if delta_available():  # pragma: no cover - not in this container
        pytest.skip("delta installed; gate not exercisable")
    with pytest.raises(RuntimeError, match="delta-spark is not installed"):
        _sink(spark, tmp_path, fmt="delta")


def test_auto_falls_back_to_parquet_here(spark, tmp_path):
    s = _sink(spark, tmp_path)
    assert s.fmt == ("delta" if delta_available() else "parquet")


def test_matches_upsert_latest_wins_oracle_semantics(spark, tmp_path):
    """The sink's on-disk result must equal the oracle-checked
    upsert_latest_wins operator applied to the same batches."""
    from dopams_etl_spark.operators.merge import upsert_latest_wins

    b1 = _batch(spark, [(1, 1, "a"), (2, 2, "b"), (3, 1, "c")])
    b2 = _batch(spark, [(2, 3, "b2"), (3, 0, "old"), (4, 1, "d")])
    s = _sink(spark, tmp_path)
    s.upsert(b1)
    s.upsert(b2)
    expect = {
        tuple(r) for r in upsert_latest_wins(b1, b2, "id", "version").collect()
    }
    got = {tuple(r) for r in s.read().select("id", "version", "val").collect()}
    assert got == expect
