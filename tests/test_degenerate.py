"""Degenerate-fixture regression tests (r12).

tools/fuzz_degenerate.py measures robustness across the whole registry;
queries FIXED for a degenerate shape get a pin here so the guard cannot
silently regress. Each test builds the minimal table set the query
loads, at the driver testdata's exact physical schema, and asserts the
query returns (never stack-traces) with the same NULL shape as its
DuckDB oracle. The r13 robustness-worklist fixes (COVERAGE.md census
section) should land with a pin in this file each.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(path, rows) -> None:
    """events.parquet at the driver schema: event_id int64,
    ts timestamp[us], user_id int64, event_type string, value double,
    props string. ``rows`` = list of (event_id, ts_or_None, user_id,
    event_type, value)."""
    import datetime

    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array(
                [
                    None
                    if r[1] is None
                    else datetime.datetime(2024, 1, 1) + datetime.timedelta(days=r[1])
                    for r in rows
                ],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    pq.write_table(table, str(path / "events.parquet"))


def _write_embeddings(path, n_rows: int) -> None:
    """embeddings.parquet at the driver schema: vec_id int64,
    embedding list<float>, label int32."""
    vecs = [[float(i + j) for j in range(64)] for i in range(n_rows)]
    table = pa.table(
        {
            "vec_id": pa.array(range(n_rows), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(n_rows)], type=pa.int32()),
        }
    )
    pq.write_table(table, str(path / "embeddings.parquet"))


@pytest.fixture(scope="module")
def qs():
    import __spark_entry__ as se

    return se.queries(), se.oracle_sql()


@pytest.mark.parametrize("n_rows", [0, 1])
def test_ann_cost_tradeoff_survives_degenerate_corpus(
    spark, qs, tmp_path_factory, n_rows
):
    """r12 fuzz census fix: with <=1 embedding the probe set or the
    exact top-3 is empty, so mean_candidates / recall3 divide by zero —
    under ANSI the bare '/' ABORTED where DuckDB yielded NULL. Pinned:
    the query returns its 3 operating-point rows with NULL ratios, and
    the DuckDB oracle agrees cell-for-cell."""
    queries, oracles = qs
    sf_dir = tmp_path_factory.mktemp(f"deg_emb_{n_rows}")
    _write_embeddings(sf_dir, n_rows)

    got = queries["ann_cost_recall_tradeoff"](spark, str(sf_dir)).collect()
    assert len(got) == 3  # one row per (planes, tables) operating point
    for row in got:
        assert row["n_probes"] == n_rows
        assert row["n_candidates"] == 0
        assert row["recall3"] is None  # 0-row exact top-3 -> NULL, not abort
        if n_rows == 0:
            assert row["mean_candidates"] is None
        else:
            assert row["mean_candidates"] == 0.0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = con.execute(oracles["ann_cost_recall_tradeoff"]).df()
    assert len(want) == 3
    want = want.sort_values(["planes", "tables"]).reset_index(drop=True)
    got_sorted = sorted(got, key=lambda r: (r["planes"], r["tables"]))
    for i, row in enumerate(got_sorted):
        for col in ("n_probes", "n_candidates"):
            assert row[col] == want[col][i]
        for col in ("mean_candidates", "recall3"):
            spark_null = row[col] is None
            duck_null = want[col].isna()[i]
            assert spark_null == duck_null, (col, row[col], want[col][i])
            if not spark_null:
                assert row[col] == want[col][i]


def test_cross_corr_null_day_window_parity(spark, qs, tmp_path_factory):
    """r12 nullhalf census fix: a null-timestamp event used to create a
    NULL day whose position under the lag window's ORDER BY the engines
    DISAGREE on (Spark NULLS FIRST on ASC, DuckDB NULLS LAST), silently
    shifting every lagged pair. Pinned: with null timestamps present,
    the query and its oracle still agree cell-for-cell, and the null-ts
    events contribute to NO day bucket on either engine."""
    queries, oracles = qs
    sf_dir = tmp_path_factory.mktemp("deg_null_ts")
    rows, eid = [], 0
    # 10 days of views/purchases with varying counts, plus null-ts noise
    for day in range(10):
        for _ in range(2 + day % 3):
            rows.append((eid, day, eid % 5, "view", 1.0)); eid += 1
        for _ in range(1 + (day * 7) % 4):
            rows.append((eid, day, eid % 5, "purchase", 2.0)); eid += 1
        rows.append((eid, None, eid % 5, "view", 3.0)); eid += 1
        rows.append((eid, None, eid % 5, "purchase", 4.0)); eid += 1
    _write_events(sf_dir, rows)

    got = sorted(
        queries["cross_corr_best_lag"](spark, str(sf_dir)).collect(),
        key=lambda r: r["lag"],
    )
    assert len(got) == 7
    # null-ts rows excluded -> 10 real days drive every lag branch
    assert got[0]["n_days"] == 10

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = (
        con.execute(oracles["cross_corr_best_lag"])
        .df()
        .sort_values("lag")
        .reset_index(drop=True)
    )
    assert len(want) == 7
    for i, row in enumerate(got):
        assert row["lag"] == want["lag"][i]
        assert row["n_days"] == want["n_days"][i]
        assert bool(row["is_best"]) == bool(want["is_best"][i])
        sx, ox = row["xcorr"], want["xcorr"][i]
        if sx is None:
            assert want["xcorr"].isna()[i]
        else:
            assert repr(float(sx)) == repr(float(ox)), (i, sx, ox)
