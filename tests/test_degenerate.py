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
