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


# --------------------------------------------------------------------------
# r13 robustness-worklist pins (fuzz census classes 1-4, VERDICT r12)

_SF001 = "/root/testdata/sf0.001"


def _empty_tables(path, names) -> None:
    """0-row copies of the driver tables, schema intact (the census's
    ``empty`` variant, scoped to just the tables a query loads)."""
    for t in names:
        src = pq.read_table(f"{_SF001}/{t}.parquet")
        pq.write_table(src.slice(0, 0), str(path / f"{t}.parquet"))


def _write_embeddings_nullable(path, n_rows: int, null_every: int) -> None:
    """embeddings.parquet with every ``null_every``-th VECTOR nulled —
    the nullhalf census shape for the ANN family."""
    vecs = [
        None if i % null_every == 1 else [float(i + j) for j in range(64)]
        for i in range(n_rows)
    ]
    table = pa.table(
        {
            "vec_id": pa.array(range(n_rows), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(n_rows)], type=pa.int32()),
        }
    )
    pq.write_table(table, str(path / "embeddings.parquet"))


def test_pagerank_empty_graph_returns_empty(spark):
    """r13 census class 2: pagerank on an empty edge list used to
    ZeroDivisionError on the driver-side teleport term (1/n_nodes).
    Pinned: the empty graph returns the empty typed result."""
    from dopams_etl_spark.operators.graph import pagerank

    edges = spark.createDataFrame([], "src string, dst string")
    out = pagerank(edges)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_quality_report_empty_table_vacuously_passes(spark, qs, tmp_path_factory):
    """r13 census class 2: expect() on an EMPTY table used to int(None)-
    crash on the NULL violation sums. Pinned convention (both engines):
    an empty table has zero violations and every rule vacuously passes."""
    queries, oracles = qs
    sf_dir = tmp_path_factory.mktemp("deg_quality_empty")
    _empty_tables(sf_dir, ["lineitem"])

    got = queries["lineitem_quality_report"](spark, str(sf_dir)).collect()
    assert len(got) == 5
    assert all(r["violations"] == 0 and r["pass"] for r in got)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    want = con.execute(oracles["lineitem_quality_report"]).df()
    assert len(want) == 5
    assert (want["violations"] == 0).all() and want["pass"].all()


@pytest.mark.parametrize(
    "name,tables",
    [
        ("order_grouping_sets", ["orders"]),
        ("event_rollup_multigrain", ["events"]),
        (
            "cube_region_priority_revenue",
            ["orders", "customer", "nation", "region"],
        ),
    ],
)
def test_grouping_sets_empty_input_convention(
    spark, qs, tmp_path_factory, name, tables
):
    """r13 census class 4, decided convention: NO ROWS IN, NO ROWS OUT.
    Over zero input rows the SQL standard (and DuckDB) still emits the
    grand-total () grouping-set row while Spark emits none; the oracle
    states Spark's shape with HAVING COUNT(*) > 0, which drops ONLY the
    zero-input grand-total row. Pinned: both engines return 0 rows on
    empty input (and the live non-empty outputs are unchanged, which the
    strict tri-SF sweep asserts)."""
    queries, oracles = qs
    sf_dir = tmp_path_factory.mktemp(f"deg_gs_{name}")
    _empty_tables(sf_dir, tables)

    assert queries[name](spark, str(sf_dir)).count() == 0

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    assert len(con.execute(oracles[name]).df()) == 0


def test_value_histogram_zero_width_bins(spark, qs, tmp_path_factory):
    """r13 census class 1: a constant value column makes the equi-width
    bin width (max-min)/20 zero — the bare division ANSI-aborted
    Spark-side and NaN->INT-cast-errored DuckDB-side. Pinned convention:
    everything lands in bucket 0 on both engines."""
    queries, oracles = qs
    sf_dir = tmp_path_factory.mktemp("deg_hist_const")
    _write_events(sf_dir, [(i, i % 5, i % 3, "view", 7.5) for i in range(40)])

    got = queries["value_histogram_equiwidth"](spark, str(sf_dir)).collect()
    assert len(got) == 1
    assert got[0]["bucket"] == 0 and got[0]["n"] == 40
    assert got[0]["share"] == 1.0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = con.execute(oracles["value_histogram_equiwidth"]).df()
    assert len(want) == 1 and want["bucket"][0] == 0 and want["n"][0] == 40


def test_ann_null_vector_convention(spark, qs, tmp_path_factory):
    """r13 nullhalf census class: a NULL embedding vector used to split
    the engines structurally (Spark NULLS-LAST-ranked or silently
    dropped it; DuckDB's list_dot_product ABORTS on a NULL list). Pinned
    convention: NULL vectors are excluded from probe AND corpus on both
    engines — operators filter at entry, oracles read the shared
    ann_notnull relation — so outputs agree cell-for-cell and no
    null-vector id ever surfaces."""
    queries, oracles = qs
    sf_dir = tmp_path_factory.mktemp("deg_ann_null")
    _write_embeddings_nullable(sf_dir, 40, null_every=2)
    null_ids = {i for i in range(40) if i % 2 == 1}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    for name in ("cosine_topk_embeddings", "lsh_topk_embeddings"):
        got = queries[name](spark, str(sf_dir)).collect()
        assert got, name  # non-null vectors still rank
        ids = {r["p_id"] for r in got} | {r["c_id"] for r in got}
        assert not (ids & null_ids), name
        want = con.execute(oracles[name]).df()
        assert len(want) == len(got), name
        got_k = sorted((r["p_id"], r["c_id"], repr(float(r["cos_sim"]))) for r in got)
        want_k = sorted(
            zip(
                want["p_id"],
                want["c_id"],
                (repr(float(v)) for v in want["cos_sim"]),
            )
        )
        assert got_k == want_k, name


def test_xml_roundtrip_empty_source(spark, qs, tmp_path_factory):
    """r13 census class 3: the XML reader cannot infer a schema from a
    0-row dump (UNABLE_TO_INFER_SCHEMA). Pinned: an empty nation dim
    degrades to the typed empty result on both engines."""
    queries, oracles = qs
    sf_dir = tmp_path_factory.mktemp("deg_xml_empty")
    _empty_tables(sf_dir, ["nation", "region"])

    out = queries["xml_source_roundtrip"](spark, str(sf_dir))
    assert out.columns == ["n_nationkey", "n_name", "region_name"]
    assert out.count() == 0

    con = duckdb.connect()
    for t in ("nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    assert len(con.execute(oracles["xml_source_roundtrip"]).df()) == 0


def test_corpus_profile_empty_corpus(spark, qs, tmp_path_factory):
    """r13 census class 3: the exact-dup rate divided 0/0 on an empty
    corpus (ANSI abort Spark-side, NaN DuckDB-side). Pinned: one profile
    row with n_docs = 0 and a NULL rate on both engines."""
    queries, oracles = qs
    sf_dir = tmp_path_factory.mktemp("deg_profile_empty")
    _empty_tables(sf_dir, ["documents"])

    got = queries["corpus_profile"](spark, str(sf_dir)).collect()
    assert len(got) == 1
    assert got[0]["n_docs"] == 0 and got[0]["exact_dup_rate"] is None

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(oracles["corpus_profile"]).df()
    assert len(want) == 1
    assert want["n_docs"][0] == 0 and want["exact_dup_rate"].isna()[0]


def _duck(sf_dir, tables, sql):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _cells(df_rows, cols):
    def canon(v):
        import datetime as _dt

        if v is None:
            return "<null>"
        # repr the PYTHON float, never the NumPy scalar:
        # repr(np.float64(0.5)) becomes 'np.float64(0.5)' under NumPy 2
        if isinstance(v, float) or "float" in type(v).__name__:
            f = float(v)
            return "<null>" if f != f else repr(f)
        # a DuckDB DATE arrives through pandas as a midnight Timestamp
        # while Spark hands back datetime.date — canon both to the date
        if hasattr(v, "to_pydatetime"):
            v = v.to_pydatetime()
        if isinstance(v, _dt.datetime) and (
            v.hour, v.minute, v.second, v.microsecond
        ) == (0, 0, 0, 0):
            v = v.date()
        return str(v)

    return sorted(tuple(canon(r[c]) for c in cols) for r in df_rows)


@pytest.mark.parametrize(
    "name",
    [
        "rolling_median_event_value",
        "event_transition_matrix",
        "interval_overlap_merge",
        "user_value_ewma",
        "streaming_session_window_counts",
        # r14: frame/window cents sums joined the convention (plus
        # COALESCE 0 for all-null-value frames)
        "user_rolling_event_value",
        "sliding_event_stats",
    ],
)
def test_null_ts_event_series_parity(spark, qs, tmp_path_factory, name):
    """r13 nullhalf census, window NULL-ordering class: a null-timestamp
    event used to sit at OPPOSITE ends of every per-user ORDER BY ts
    (Spark NULLS FIRST on ASC, DuckDB NULLS LAST), silently shifting
    frames, lags, islands, and sessions — and user_value_ewma's all-null
    8-lag window additionally ANSI-aborted on its zero weight sum.
    Pinned convention (both engines): an event with no time has no
    position in a per-user time series — ts IS NOT NULL filters mirror
    on both sides, so outputs agree cell-for-cell with nulls present."""
    queries, oracles = qs
    sf_dir = tmp_path_factory.mktemp(f"deg_nullts_{name}")
    rows, eid = [], 0
    for day in range(8):
        for u in range(3):
            for j in range(2 + (day + u) % 3):
                # sub-day spacing so sessions/frames are non-trivial
                val = None if eid % 2 == 1 else float(10 + (eid * 7) % 90)
                rows.append((eid, day + j * 0.01 + u * 0.2, u, "view", val))
                eid += 1
        rows.append((eid, None, eid % 3, "view", 5.0)); eid += 1
        rows.append((eid, None, eid % 3, None, None)); eid += 1
    _write_events(sf_dir, rows)

    got = queries[name](spark, str(sf_dir))
    cols = got.columns
    got_rows = got.collect()
    want = _duck(sf_dir, ["events"], oracles[name])
    assert len(want) == len(got_rows), name
    want_rows = [
        {c: (None if want[c].isna()[i] else want[c][i]) for c in cols}
        for i in range(len(want))
    ]
    assert _cells(got_rows, cols) == _cells(want_rows, cols), name


def _write_documents_null_text(path, n_docs: int) -> None:
    """documents.parquet at the driver schema with every 3rd text NULL —
    the nullhalf census shape for the dedup/fingerprint family."""
    texts = [
        None if i % 3 == 1 else f"alpha beta gamma delta token{i % 11} epsilon zeta"
        for i in range(n_docs)
    ]
    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n_docs, type=pa.string()),
            "source": pa.array(
                [f"s{i % 3}" for i in range(n_docs)], type=pa.string()
            ),
            "n_chars": pa.array(
                [0 if t is None else len(t) for t in texts], type=pa.int64()
            ),
        }
    )
    pq.write_table(table, str(path / "documents.parquet"))


@pytest.mark.parametrize(
    "name",
    [
        "bloom_decontaminate_docs",
        "decontaminate_docs",
        "minhash_lsh_pairs",
        "ngram_jaccard_dups",
        "shingle_containment_pairs",
        "doc_winnow_fingerprints",
        "dedup_incremental_batch",
        "train_test_overlap_report",
        "dedup_rate_by_source",
    ],
)
def test_dedup_family_null_text(spark, qs, tmp_path_factory, name):
    """r13/r14 nullhalf census, null-text class: a NULL document text
    used to manufacture a '' shingle engine-side (concat_ws over a NULL
    token array) that could exact-match or bloom-hit while every SQL
    oracle's NULL-propagating || saw no shingle at all — and winnowing's
    NULL-ignoring greatest() manufactured an all-NULL gram. Pinned
    convention (ONE shared rule, functions/textfns.py:word_shingles +
    the winnow entry filter): NULL text produces NO shingles or
    fingerprints on both engines, exactly like blank text."""
    queries, oracles = qs
    sf_dir = tmp_path_factory.mktemp(f"deg_nulltext_{name}")
    _write_documents_null_text(sf_dir, 30)

    got = queries[name](spark, str(sf_dir))
    cols = got.columns
    got_rows = got.collect()
    want = _duck(sf_dir, ["documents"], oracles[name])
    assert len(want) == len(got_rows), name
    want_rows = [
        {c: (None if want[c].isna()[i] else want[c][i]) for c in cols}
        for i in range(len(want))
    ]
    assert _cells(got_rows, cols) == _cells(want_rows, cols), name


# --------------------------------------------------------------------------
# r14 robustness-worklist pins (fuzz census classes, VERDICT r13)


def _write_orders_nullable(path, n_rows: int) -> None:
    """orders.parquet at the driver schema with the nullhalf census
    shape: every 2nd row's non-key columns nulled (keys o_orderkey /
    o_custkey stay populated)."""
    import datetime

    def null2(i, v):
        return None if i % 2 == 1 else v

    prio = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    table = pa.table(
        {
            "o_orderkey": pa.array(range(n_rows), type=pa.int64()),
            "o_custkey": pa.array(
                [i % 7 for i in range(n_rows)], type=pa.int64()
            ),
            "o_orderstatus": pa.array(
                [null2(i, "F") for i in range(n_rows)], type=pa.string()
            ),
            "o_totalprice": pa.array(
                [
                    null2(i, round(100.0 + (i * 37.5) % 900, 2))
                    for i in range(n_rows)
                ],
                type=pa.float64(),
            ),
            "o_orderdate": pa.array(
                [
                    null2(
                        i,
                        datetime.datetime(2024, 1, 1)
                        + datetime.timedelta(days=i % 45),
                    )
                    for i in range(n_rows)
                ],
                type=pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                [null2(i, prio[i % 5]) for i in range(n_rows)],
                type=pa.string(),
            ),
        }
    )
    pq.write_table(table, str(path / "orders.parquet"))


@pytest.mark.parametrize(
    "name",
    [
        "woe_information_value",
        "customer_spend_gini",
        "clv_monthly_curve",
        "customer_rfm_segments",
        "revenue_pareto_abc",
        "order_value_iqr_outliers",
        "holt_linear_daily",
        "theil_sen_daily_trend",
        "mann_kendall_trend",
        "ses_level_daily",
        "revenue_max_drawdown",
    ],
)
def test_null_orders_parity(spark, qs, tmp_path_factory, name):
    """r14 nullhalf census, orders-table class: NULL o_totalprice rows
    used to rank at OPPOSITE ends of every NTILE/ORDER BY (Spark NULLS
    FIRST, DuckDB NULLS LAST), and NULL o_orderdate rows used to create
    a NULL day/cohort month that rode the same opposite sort through
    lag windows and cumulative sums — NaN-poisoning the sequential
    daily-series folds. Pinned convention (both engines): an unpriced
    order has no rank/bin/revenue and an undated order has no
    day/cohort — outputs agree cell-for-cell with nulls present."""
    queries, oracles = qs
    sf_dir = tmp_path_factory.mktemp(f"deg_nullorders_{name}")
    _write_orders_nullable(sf_dir, 90)

    got = queries[name](spark, str(sf_dir))
    cols = got.columns
    got_rows = got.collect()
    want = _duck(sf_dir, ["orders"], oracles[name])
    assert len(want) == len(got_rows), name
    want_rows = [
        {c: (None if want[c].isna()[i] else want[c][i]) for c in cols}
        for i in range(len(want))
    ]
    assert _cells(got_rows, cols) == _cells(want_rows, cols), name


def test_money_cents_tie_quantization_parity(spark, qs, tmp_path_factory):
    """r14 f32 census class: a float32-narrowed o_totalprice lands on
    exact half-cent ties (.625-style values) that Spark's
    double->DECIMAL cast rounds HALF_UP while DuckDB's rounds half-even
    — money sums drifted cents apart. Pinned: the portable
    floor(x*100 + 0.5) cents quantizer is pure IEEE double arithmetic,
    so both engines sum identical cents on tie-laden input."""
    import datetime

    queries, oracles = qs
    sf_dir = tmp_path_factory.mktemp("deg_cents_ties")
    n = 80
    # .625 / .125 / .375 endings: exactly representable, all half-cent ties
    prices = [float(1000 + i) + [0.625, 0.125, 0.375, 0.875][i % 4] for i in range(n)]
    prio = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    table = pa.table(
        {
            "o_orderkey": pa.array(range(n), type=pa.int64()),
            "o_custkey": pa.array([i % 5 for i in range(n)], type=pa.int64()),
            "o_orderstatus": pa.array(["F"] * n, type=pa.string()),
            "o_totalprice": pa.array(prices, type=pa.float64()),
            "o_orderdate": pa.array(
                [
                    datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i % 30)
                    for i in range(n)
                ],
                type=pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                [prio[i % 5] for i in range(n)], type=pa.string()
            ),
        }
    )
    pq.write_table(table, str(sf_dir / "orders.parquet"))

    for name in (
        "customer_spend_gini",
        "revenue_pareto_abc",
        "customer_rfm_segments",
        "clv_monthly_curve",
    ):
        got = queries[name](spark, str(sf_dir))
        cols = got.columns
        got_rows = got.collect()
        want = _duck(sf_dir, ["orders"], oracles[name])
        assert len(want) == len(got_rows), name
        want_rows = [
            {c: (None if want[c].isna()[i] else want[c][i]) for c in cols}
            for i in range(len(want))
        ]
        assert _cells(got_rows, cols) == _cells(want_rows, cols), name


def test_single_event_contingency_stats_null_not_abort(
    spark, qs, tmp_path_factory
):
    """r14 tiny1 census class: a 1-row events table makes a 1x1
    contingency grid — the Cramér denominator n*LEAST(r-1, c-1) and
    both marginal entropies are zero, and the ordered funnel has zero
    view-sessions. The bare '/' ANSI-aborted Spark-side where DuckDB
    yielded NULL. Pinned: chi2/MI/funnel return their row with the NULL
    ratio on BOTH engines."""
    queries, oracles = qs
    sf_dir = tmp_path_factory.mktemp("deg_tiny_contingency")
    _write_events(sf_dir, [(0, 3, 1, "click", 5.0)])

    got = queries["chi_square_type_dow"](spark, str(sf_dir)).collect()
    assert len(got) == 1 and got[0]["cramers_v"] is None
    want = _duck(sf_dir, ["events"], oracles["chi_square_type_dow"])
    assert len(want) == 1 and want["cramers_v"].isna()[0]

    got = queries["mutual_information_type_dow"](spark, str(sf_dir)).collect()
    assert len(got) == 1 and got[0]["nmi"] is None
    want = _duck(sf_dir, ["events"], oracles["mutual_information_type_dow"])
    assert len(want) == 1 and want["nmi"].isna()[0]

    got = queries["session_funnel_ordered"](spark, str(sf_dir)).collect()
    assert len(got) == 1 and got[0]["click_rate"] is None
    want = _duck(sf_dir, ["events"], oracles["session_funnel_ordered"])
    assert len(want) == 1 and want["click_rate"].isna()[0]


def test_ab_test_degenerate_pool_null_z(spark, qs, tmp_path_factory):
    """r14 nullhalf census class: an experiment where NO user converts
    (or every user does) zeroes the pooled variance — the z denominator
    ANSI-aborted Spark-side where DuckDB yielded NULL. Pinned: zero
    conversions -> NULL z_stat on both engines."""
    queries, oracles = qs
    sf_dir = tmp_path_factory.mktemp("deg_ab_zero_pool")
    # every user well below the >=14-purchase conversion threshold
    rows = [(i, i % 9, i % 6, "purchase" if i % 3 == 0 else "view", 1.0) for i in range(36)]
    _write_events(sf_dir, rows)

    got = queries["ab_test_proportion_z"](spark, str(sf_dir)).collect()
    assert len(got) == 1 and got[0]["z_stat"] is None
    want = _duck(sf_dir, ["events"], oracles["ab_test_proportion_z"])
    assert len(want) == 1 and want["z_stat"].isna()[0]


@pytest.mark.parametrize(
    "name,id_cols",
    [
        ("embedding_int8_quantize", ("vec_id",)),
        ("embedding_random_projection", ("vec_id",)),
        ("kmeans_embedding_clusters", ("vec_id",)),
        ("kmeans_fixed_seed_assign", ("vec_id",)),
        ("semantic_dedup_embeddings", ("id",)),
        # r14 review: rides the same kmeans_assign entry filter; its
        # oracle now reads through ann_notnull like every sibling
        ("cluster_representatives", ("vec_id",)),
    ],
)
def test_ann_null_vector_convention_extended(
    spark, qs, tmp_path_factory, name, id_cols
):
    """r14 extension of the shared ANN null-vector convention to the
    quantize/project/cluster/dedup family: a NULL vector used to poison
    the md5-ordered seed collects (TypeError engine-side), hash '' codes
    where the oracle saw NULL, or abort DuckDB's list_dot_product.
    Pinned: NULL vectors are excluded at entry on both engines, outputs
    agree cell-for-cell, and no null-vector id ever surfaces."""
    queries, oracles = qs
    sf_dir = tmp_path_factory.mktemp(f"deg_ann_null_{name}")
    _write_embeddings_nullable(sf_dir, 40, null_every=2)
    null_ids = {i for i in range(40) if i % 2 == 1}

    got = queries[name](spark, str(sf_dir))
    cols = got.columns
    got_rows = got.collect()
    assert got_rows, name
    for idc in id_cols:
        # semantic_dedup's perturbed copies sit at id + 1e6
        ids = {r[idc] % 1_000_000 for r in got_rows}
        assert not (ids & null_ids), name
    want = _duck(sf_dir, ["embeddings"], oracles[name])
    assert len(want) == len(got_rows), name
    want_rows = [
        {c: (None if want[c].isna()[i] else want[c][i]) for c in cols}
        for i in range(len(want))
    ]
    assert _cells(got_rows, cols) == _cells(want_rows, cols), name


@pytest.mark.parametrize(
    "name", ["kmeans_embedding_clusters", "semantic_dedup_embeddings"]
)
def test_embedding_ops_empty_corpus_typed_empty(
    spark, qs, tmp_path_factory, name
):
    """r14 empty census class: an empty embeddings table used to raise
    driver-side (ValueError: empty corpus / an untyped-lambda
    AnalysisException) because the seed collect came back empty. Pinned
    (the pagerank empty-graph recipe): both return the typed EMPTY
    result, matching the oracle's zero rows."""
    queries, oracles = qs
    sf_dir = tmp_path_factory.mktemp(f"deg_emb_empty_{name}")
    _empty_tables(sf_dir, ["embeddings"])

    out = queries[name](spark, str(sf_dir))
    assert out.count() == 0
    want = _duck(sf_dir, ["embeddings"], oracles[name])
    assert len(want) == 0


_F32_QUERIES = [
    # one per r14 f32-census mechanism: money_cents tie grid, filter-
    # boundary lane, product lane, decimal-cast shortest-repr, share
    # division lane, cents floor, float-lane statistic, pass-through
    "q1_pricing_summary",
    "q6_forecast_revenue_delta",
    "regional_revenue",
    "customer_order_stats",
    "allocate_order_totals",
    "sliding_event_stats",
    "event_value_robust_zscore",
    "upsert_latest_wins",
]


@pytest.fixture(scope="module")
def f32_sf_dir(tmp_path_factory):
    """The driver sf0.001 tables with every float64 column physically
    narrowed to float32 — the r14 type-drift census shape (the embedding
    column already ships as float32 in the real fixtures)."""
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("deg_f32")
    from dopams_etl_spark.catalog import TABLES

    for name in TABLES:
        table = pq.read_table(f"{src}/{name}.parquet")
        for i, field in enumerate(table.schema):
            if pa.types.is_float64(field.type):
                table = table.set_column(
                    i,
                    pa.field(field.name, pa.float32(), field.nullable),
                    table.column(i).cast(pa.float32()),
                )
        pq.write_table(table, str(dst / f"{name}.parquet"))
    return dst


@pytest.mark.parametrize("name", _F32_QUERIES)
def test_f32_narrowed_fixture_parity(spark, qs, f32_sf_dir, name):
    """r14 f32 census class: a float32-narrowed measure column used to
    split the engines' arithmetic lanes — Spark multiplied/floored in
    float32 (24-bit rounding loses whole cents) while DuckDB promoted to
    double, and DuckDB's ROUND/median on FLOAT stayed on the float32
    grid while Spark rounded the promoted double. Pinned convention:
    cast("double") at first use on BOTH sides, so the engines compute
    identical double math from the same float32 bit patterns."""
    queries, oracles = qs
    from dopams_etl_spark.catalog import TABLES

    got = queries[name](spark, str(f32_sf_dir))
    cols = got.columns
    got_rows = got.collect()
    want = _duck(f32_sf_dir, TABLES, oracles[name])
    assert len(want) == len(got_rows), name
    want_rows = [
        {c: (None if want[c].isna()[i] else want[c][i]) for c in cols}
        for i in range(len(want))
    ]
    assert _cells(got_rows, cols) == _cells(want_rows, cols), name


@pytest.fixture(scope="module")
def nullhalf_sf_dir(tmp_path_factory):
    """The driver sf0.001 tables with every NON-KEY column nulled on
    every 2nd row — the census nullhalf shape (keys stay intact so the
    MV joins keep their rows and the probe measures null-VALUE
    semantics)."""
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("deg_nullhalf_mv")
    from dopams_etl_spark.catalog import TABLES

    def is_key(name):
        return name.endswith(("_id", "key")) or name == "l_linenumber"

    for name in TABLES:
        table = pq.read_table(f"{src}/{name}.parquet")
        for i, field in enumerate(table.schema):
            if is_key(field.name):
                continue
            vals = table.column(i).to_pylist()
            table = table.set_column(
                i,
                field,
                pa.array(
                    [None if j % 2 == 1 else v for j, v in enumerate(vals)],
                    type=field.type,
                ),
            )
        pq.write_table(table, str(dst / f"{name}.parquet"))
    return dst


@pytest.mark.parametrize(
    "name",
    [
        "firs_mv",
        "criminal_profiles_mv",
        "accuseds_mv",
        "advanced_search_firs",
        "advanced_search_accuseds",
    ],
)
def test_mv_nullhalf_parity(spark, qs, nullhalf_sf_dir, name):
    """r14 nullhalf census, MV-family class: three divergences used to
    split the engines on half-null fixtures — (1) a NULL date in a
    datetime64 pandas column bridges as the string 'NaT' from DuckDB
    where Spark's date objects bridge as None (fixed: nullable date
    outputs surfaced as VARCHAR on both sides); (2) the NULL-linestatus
    group rendered as a dangling '0'/trailing-separator fragment in the
    engine's disposal/chargesheet strings where the oracle's string_agg
    skipped its NULL concat (fixed: NULL linestatus contributes no
    entry); (3) Spark's array_sort puts a NULL struct field FIRST on
    ASC where DuckDB's ORDER BY defaults NULLS LAST, flipping
    accused_details tie order (fixed: NULLS FIRST stated in the
    oracle)."""
    queries, oracles = qs
    from dopams_etl_spark.catalog import TABLES

    got = queries[name](spark, str(nullhalf_sf_dir))
    cols = got.columns
    got_rows = got.collect()
    want = _duck(nullhalf_sf_dir, TABLES, oracles[name])
    assert len(want) == len(got_rows), name
    # pandas bridges an int column holding NULLs as float64 ('1997.0');
    # fold integral floats back to int where Spark's schema says integer
    int_cols = {
        f.name for f in got.schema.fields if f.dataType.typeName() in
        ("integer", "long", "short", "byte")
    }

    def unbridge(c, v):
        if c in int_cols and isinstance(v, float) and v.is_integer():
            return int(v)
        return v

    want_rows = [
        {c: (None if want[c].isna()[i] else unbridge(c, want[c][i])) for c in cols}
        for i in range(len(want))
    ]
    assert _cells(got_rows, cols) == _cells(want_rows, cols), name


@pytest.mark.parametrize(
    "name",
    [
        "pack_training_sequences",
        "media_decode_meta",
        "media_resize",
        "media_frame_sample",
        "frame_dup_videos",
        "streaming_user_sessions",
    ],
)
def test_null_payload_abort_class(spark, qs, nullhalf_sf_dir, name):
    """r14 nullhalf census, the SPARK_ERR abort class: a NULL text/ts row
    used to hard-abort the Python stage — bytes(None) in the media
    mapInPandas operators, int(NaN) in the packing fold, and
    NaT.timestamp() in the stateful sessionizer. Pinned conventions: a
    NULL payload decodes to NULL metadata / resizes to zero bytes (NULL
    md5 marks it) / yields no frames; a doc with no token count packs as
    zero tokens; an event with no time has no session position. Each
    query returns (never stack-traces) and matches its oracle
    cell-for-cell on the half-null fixture."""
    queries, oracles = qs
    from dopams_etl_spark.catalog import TABLES

    got = queries[name](spark, str(nullhalf_sf_dir))
    cols = got.columns
    got_rows = got.collect()
    want = _duck(nullhalf_sf_dir, TABLES, oracles[name])
    assert len(want) == len(got_rows), name
    int_cols = {
        f.name for f in got.schema.fields if f.dataType.typeName() in
        ("integer", "long", "short", "byte")
    }

    def unbridge(c, v):
        if c in int_cols and isinstance(v, float) and v.is_integer():
            return int(v)
        return v

    want_rows = [
        {c: (None if want[c].isna()[i] else unbridge(c, want[c][i])) for c in cols}
        for i in range(len(want))
    ]
    assert _cells(got_rows, cols) == _cells(want_rows, cols), name


@pytest.mark.parametrize(
    "name",
    [
        # date-bridge class (NaT vs None): nullable dates as VARCHAR
        "order_due_dates",
        "parse_dates_multi",
        "latest_order_per_customer",
        "customer_golden_record",
        "js_divergence_daily_drift",
        "trailing_week_range_frame",
        "running_distinct_parts_per_customer",
        # null-payload collect class: NULL element contributes no entry
        "order_lineitems_sorted",
        "customer_status_map",
        "deterministic_ids",
        # shared null-ts / null-date timeline class
        "hourly_event_stats",
        "scd2_user_event_history",
        "queue_depth_daily",
        "markov_next_event_accuracy",
        "capped_running_balance",
        # null-text doc class + landing-format classes
        "doc_chunks",
        "doc_repetition_stats",
        "llm_extract_docs",
        "text_corpus_ingest",
        "trigram_match_event_types",
        "csv_badrecord_quarantine",
        "streaming_dedup_counts",
        "approx_percentile_rank_contract",
    ],
)
def test_nullhalf_divergence_class(spark, qs, nullhalf_sf_dir, name):
    """r15 nullhalf census burn-down — the 23-row FAIL (divergence)
    class, closed this round. Pinned conventions: nullable date outputs
    surface as VARCHAR on both engines (NaT-vs-None bridge); a NULL
    collect element contributes no entry and all-NULL groups surface
    NULL (the string_agg shape); un-timestamped/untyped events have no
    timeline position; undated orders sort before recorded history
    (NULLS FIRST stated in the oracle) or never enter the sweep; a NULL
    order total moves the running balance by 0; NULL text chunks/scores
    like an empty doc and extracts ''; the .txt/.csv landing formats
    have no NULL representation (empty line / empty field); NULL group
    keys survive via null-safe joins; and the approx-median rank
    contract is tie-aware (the rank INTERVAL must intersect the GK
    envelope). Each query matches its oracle cell-for-cell on the
    half-null fixture."""
    queries, oracles = qs
    from dopams_etl_spark.catalog import TABLES

    got = queries[name](spark, str(nullhalf_sf_dir))
    cols = got.columns
    got_rows = got.collect()
    want = _duck(nullhalf_sf_dir, TABLES, oracles[name])
    assert len(want) == len(got_rows), name
    int_cols = {
        f.name for f in got.schema.fields if f.dataType.typeName() in
        ("integer", "long", "short", "byte")
    }

    def unbridge(c, v):
        if c in int_cols and isinstance(v, float) and v.is_integer():
            return int(v)
        return v

    want_rows = [
        {c: (None if want[c].isna()[i] else unbridge(c, want[c][i])) for c in cols}
        for i in range(len(want))
    ]
    assert _cells(got_rows, cols) == _cells(want_rows, cols), name
