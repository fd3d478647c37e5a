"""Sources (S1-S5, S12), gold refresh (S13), orchestration (I7), D4."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dopams_etl_spark.pipeline import Stage, normalize_stages, run_pipeline
from dopams_etl_spark.sources import (
    RetryPolicy,
    fetch_chunked,
    load_csv_reference,
    media_download_sink,
    point_lookup_enrich,
    read_json_dump,
    should_retry,
)

SCHEMA = StructType([StructField("id", LongType()), StructField("v", StringType())])


def test_fetch_chunked_with_retries(spark):
    calls = {"n": 0}

    def flaky(start, end):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConnectionError("boom")
        return [{"id": int(start.day), "v": str(end.day)}]

    chunks = [
        (datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 6)),
        (datetime.datetime(2024, 1, 5), datetime.datetime(2024, 1, 10)),
    ]
    slept = []
    out = fetch_chunked(spark, flaky, chunks, SCHEMA, RetryPolicy(2, 1.0), slept.append)
    assert out.count() == 2
    assert slept == [1.0]  # 2**0 backoff after the single failure


def test_retry_matrix():
    assert should_retry(None) and should_retry(500) and should_retry(503)
    assert not should_retry(404) and not should_retry(400)


def test_point_lookup_enrich_drops_missing(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (3,)], ["pid"])

    out = point_lookup_enrich(
        df, "pid", lambda pid: None if pid == 2 else {"name": f"p{pid}"}, "pid long, name string"
    )
    rows = {r["pid"]: r["name"] for r in out.collect()}
    assert rows == {1: "p1", 3: "p3"}  # id 2 dropped, id 3 deduped


def test_csv_and_json_sources(spark, tmp_path):
    csv = tmp_path / "ref.csv"
    csv.write_text("state,district\nTS,Hyderabad\nAP,Guntur\n")
    ref = load_csv_reference(spark, str(csv))
    assert ref.count() == 2 and set(ref.columns) == {"state", "district"}

    js = tmp_path / "dump.json"
    js.write_text('{"CRIME_ID": 1, "PS_CODE": "x"}\n{"CRIME_ID": 2, "PS_CODE": "y"}\n')
    dump = read_json_dump(spark, str(js), {"CRIME_ID": "crime_id", "PS_CODE": "ps_code"})
    assert {r["crime_id"] for r in dump.collect()} == {1, 2}


def test_media_download_sink_status(spark, tmp_path):
    files = spark.createDataFrame(
        [("u://a", "/crimes/a.bin"), ("u://bad", "/crimes/b.bin")], ["url", "path"]
    )

    def getter(url):
        if url.endswith("bad"):
            raise OSError("404")
        return b"payload"

    status = {r["url"]: r for r in
              media_download_sink(files, "url", "path", str(tmp_path), getter, 2).collect()}
    assert status["u://a"]["is_downloaded"] and status["u://a"]["attempts"] == 1
    assert not status["u://bad"]["is_downloaded"] and status["u://bad"]["attempts"] == 2
    assert (tmp_path / "crimes" / "a.bin").read_bytes() == b"payload"


def test_gold_refresh_and_udtfs(spark, tmp_path):
    from dopams_etl_spark.gold import (
        get_accused_crime_history,
        refresh_gold,
        search_person_by_name,
    )

    out = str(tmp_path / "gold")
    counts = refresh_gold(spark, "/root/testdata/sf0.001", out,
                          ("firs_mv", "accuseds_mv", "criminal_profiles_mv"))
    assert counts["firs_mv"] == 1500 and counts["accuseds_mv"] == 6000
    hist = get_accused_crime_history(spark, out, 7)
    assert hist.count() > 0
    found = search_person_by_name(spark, out, "widget")
    assert found.count() > 0


def test_pipeline_retry_and_refresh_dedup():
    order = []

    def ok(name):
        def fn():
            order.append(name)
        return fn

    flaky_calls = {"n": 0}

    def flaky():
        flaky_calls["n"] += 1
        if flaky_calls["n"] < 2:
            raise RuntimeError("transient")
        order.append("flaky")

    stages = [
        Stage("refresh_views", ok("refresh1"), is_refresh=True),
        Stage("crimes", ok("crimes")),
        Stage("flaky", flaky),
        Stage("refresh_views", ok("refresh2"), is_refresh=True),
    ]
    report = run_pipeline(stages, sleeper=lambda _: None)
    assert report.ok
    assert order == ["crimes", "flaky", "refresh1"]  # dedup kept first refresh, moved to end
    assert report.results[1].attempts == 2           # flaky retried once


def test_pipeline_stops_on_exhausted_retries():
    def dead():
        raise RuntimeError("always")

    report = run_pipeline(
        [Stage("dead", dead, retries=1), Stage("after", lambda: None)],
        sleeper=lambda _: None,
    )
    assert not report.ok
    assert [r.name for r in report.results] == ["dead"]


def test_transliterate_basic(spark):
    from dopams_etl_spark.functions.translit import transliterate_basic

    df = spark.createDataFrame([("राम कुमार",), ("రవి",), ("plain",)], ["n"])
    got = [r["t"] for r in df.select(transliterate_basic("n").alias("t")).collect()]
    assert got[0] == "ram kumar" and got[1] == "rvi" and got[2] == "plain"


def test_python_datasource_partitioned_scan(spark):
    """Spark-4 Python DataSource: declared schema, per-partition reads,
    deterministic content."""
    from pyspark.sql import functions as F

    from dopams_etl_spark.sources.pydatasource import (
        KNUTH,
        MOD,
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("partitions", 3)
        .option("rows_per_partition", 10)
        .load()
    )
    assert df.columns == ["id", "part", "value"]
    rows = sorted(map(tuple, df.collect()))
    assert len(rows) == 30
    assert rows == [(i, i // 10, (i * KNUTH) % MOD) for i in range(30)]
    # the scan really parallelizes: each declared partition reads itself
    nparts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert nparts == 3


def test_python_datasource_filter_pushdown(spark):
    """Range predicates on id push into the source: partitions wholly
    outside the range are never planned or read."""
    from pyspark.sql import functions as F

    from dopams_etl_spark.sources.pydatasource import register_synthetic_source

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("partitions", 4)
        .option("rows_per_partition", 100)
        .load()
        .filter((F.col("id") >= 150) & (F.col("id") < 320))
    )
    rows = sorted(r["id"] for r in df.collect())
    assert rows == list(range(150, 320))
    # only partitions 1..3 overlap [150, 320) -> 3 planned partitions
    nparts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert nparts == 3
    # fully-out-of-range scan still plans (one empty partition)
    empty = (
        spark.read.format("synthetic_events")
        .option("partitions", 2)
        .option("rows_per_partition", 10)
        .load()
        .filter(F.col("id") > 1000)
    )
    assert empty.count() == 0


def test_python_datasource_jsonl_writer(spark, tmp_path):
    """Write side of the DataSource API: per-partition shards + an
    all-or-nothing manifest, content roundtrips."""
    import json
    import os

    from dopams_etl_spark.sources.pydatasource import register_jsonl_sink

    register_jsonl_sink(spark)
    out = str(tmp_path / "jsonl_out")
    df = spark.range(0, 20).selectExpr("id", "id * 3 AS triple").repartition(4)
    df.write.format("jsonl_sink").option("path", out).mode("append").save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["rows"] == 20
    got = []
    for shard in manifest["shards"]:
        with open(shard) as fh:
            got += [json.loads(line) for line in fh]
    assert sorted((r["id"], r["triple"]) for r in got) == [
        (i, 3 * i) for i in range(20)
    ]


def test_python_datasource_jsonl_writer_overwrite(spark, tmp_path):
    """Two-phase commit semantics: overwrite clears stale shards from a
    wider prior run (4 shards -> 2), non-overwrite into a non-empty sink
    fails instead of mixing runs, and no .tmp attempt files survive a
    successful commit."""
    import glob
    import json
    import os

    import pytest

    from dopams_etl_spark.sources.pydatasource import register_jsonl_sink

    register_jsonl_sink(spark)
    out = str(tmp_path / "jsonl_ow")
    # (the Python DataSource write API only accepts Append/Overwrite;
    # append into an EMPTY dir is the fresh-write path)
    wide = spark.range(0, 40).selectExpr("id").repartition(4)
    wide.write.format("jsonl_sink").option("path", out).mode("append").save()
    assert len(glob.glob(os.path.join(out, "part-*.jsonl"))) == 4

    narrow = spark.range(0, 10).selectExpr("id").repartition(2)
    narrow.write.format("jsonl_sink").option("path", out).mode(
        "overwrite"
    ).save()
    shards = sorted(glob.glob(os.path.join(out, "part-*.jsonl")))
    assert len(shards) == 2, "stale shards from the 4-partition run remain"
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert sorted(manifest["shards"]) == shards
    assert manifest["rows"] == 10
    assert not glob.glob(os.path.join(out, ".part-*.tmp"))

    with pytest.raises(Exception, match="overwrite"):
        narrow.write.format("jsonl_sink").option("path", out).mode(
            "append"
        ).save()


def test_jsonl_writer_sweep_is_job_scoped(spark, tmp_path):
    """A commit's orphan sweep must delete ONLY its own job's attempt
    temps: a concurrent writer's in-flight ``.part-*.tmp`` for the same
    sink path survives (deleting it would fail that job's later commit
    renames)."""
    import glob
    import os

    from dopams_etl_spark.sources.pydatasource import register_jsonl_sink

    register_jsonl_sink(spark)
    out = str(tmp_path / "jsonl_cc")
    os.makedirs(out)
    foreign = os.path.join(out, ".part-00000.fedcba987654.7.tmp")
    with open(foreign, "w") as fh:
        fh.write('{"id": 999}\n')
    legacy = os.path.join(out, ".part-00002.41.tmp")
    with open(legacy, "w") as fh:
        fh.write('{"id": 998}\n')

    df = spark.range(0, 6).selectExpr("id").repartition(2)
    df.write.format("jsonl_sink").option("path", out).mode("append").save()

    assert os.path.exists(foreign), "swept a concurrent job's temp file"
    # ... while this job's own temps AND pre-format legacy orphans
    # (4 dot-fields — no current writer produces them) are gone
    assert not os.path.exists(legacy)
    leftovers = set(glob.glob(os.path.join(out, ".part-*.tmp"))) - {foreign}
    assert not leftovers


def test_python_datasource_stream_reader(spark, tmp_path):
    """Streaming side: the micro-batch tick source drains its offset
    range under availableNow and the batches reassemble the exact
    deterministic sequence."""
    from dopams_etl_spark.sources.pydatasource import (
        KNUTH,
        MOD,
        register_ticks_stream,
    )

    register_ticks_stream(spark)
    # each availableNow run drains the batches prefetched at trigger
    # time and checkpoints its offset; re-running from the same
    # checkpoint continues where the last run stopped — the standard
    # incremental-batch cadence for a cursor-style source.
    out = str(tmp_path / "ticks_out")
    for _ in range(6):
        stream = (
            spark.readStream.format("synthetic_ticks")
            .option("total_rows", 60)
            .option("batch_rows", 25)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if spark.read.parquet(out).count() >= 60:
            break
    rows = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert rows == [(i, (i * KNUTH) % MOD) for i in range(60)]


def test_python_datasource_pushdown_property(spark):
    """Property: for any id range, the pushed-down scan returns exactly
    the Python-range slice of the full deterministic sequence."""
    from pyspark.sql import functions as F

    from dopams_etl_spark.sources.pydatasource import (
        KNUTH,
        MOD,
        register_synthetic_source,
    )

    register_synthetic_source(spark)

    def scan(lo, hi):
        df = (
            spark.read.format("synthetic_events")
            .option("partitions", 5)
            .option("rows_per_partition", 20)
            .load()
            .filter((F.col("id") >= lo) & (F.col("id") <= hi))
        )
        return sorted((r["id"], r["value"]) for r in df.collect())

    # deterministic probe grid instead of hypothesis: bounds on, inside,
    # and outside partition edges, inverted, and degenerate
    for lo, hi in [(0, 99), (20, 39), (19, 20), (55, 55), (90, 200), (-5, 3),
                   (60, 59), (100, 300)]:
        want = [(i, (i * KNUTH) % MOD) for i in range(max(lo, 0), min(hi, 99) + 1)]
        assert scan(lo, hi) == want, (lo, hi)
