"""Z-order layout: code correctness + the file-skipping property it buys."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_morton_interleave_known_bits(spark):
    from dopams_etl_spark.operators.layout import morton_interleave

    # 2-D, 2 bits: cell (x=0b10, y=0b01) -> bits x1 y1 x0 y0 interleaved as
    # code bit (i*k + j): x contributes bits 0,2 ; y bits 1,3
    df = spark.range(1).select(
        morton_interleave([F.lit(2).cast("long"), F.lit(1).cast("long")], 2).alias("z")
    )
    # x=0b10: bit0=0 -> code bit0, bit1=1 -> code bit2 (value 4)
    # y=0b01: bit0=1 -> code bit1 (value 2), bit1=0 -> code bit3
    assert df.collect()[0]["z"] == 6


def test_zorder_code_monotone_in_quantized_cells(spark):
    """Locality sanity: points in the same quantization cell share a code,
    and codes cover [0, 2^(k*bits)) without collisions across cells."""
    from dopams_etl_spark.operators.layout import zorder_code

    rows = [(i, float(i % 16), float(i // 16)) for i in range(256)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    out = zorder_code(df, ["x", "y"], bits=4, bounds={"x": (0, 15), "y": (0, 15)})
    codes = [r["zcode"] for r in out.collect()]
    assert len(set(codes)) == 256  # 16x16 grid, distinct cell per point
    assert min(codes) >= 0 and max(codes) < 256


def test_zorder_layout_skips_files(spark, tmp_path):
    """Writing range-partitioned on zcode gives every file tight min/max
    spans in BOTH dimensions, so a 2-D box predicate prunes most files;
    a round-robin layout makes every file overlap the box."""
    from dopams_etl_spark.operators.layout import zorder_code

    n, files = 20_000, 16
    base = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 997).cast("double").alias("x"),
        ((F.col("id") * 7919) % 1009).cast("double").alias("y"),
    )
    coded = zorder_code(base, ["x", "y"], bits=8, bounds={"x": (0, 996), "y": (0, 1008)})

    z_dir, rr_dir = str(tmp_path / "z"), str(tmp_path / "rr")
    coded.repartitionByRange(files, "zcode").sortWithinPartitions("zcode").write.parquet(
        z_dir
    )
    coded.repartition(files).write.parquet(rr_dir)

    def overlapping_files(path: str) -> int:
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("x").alias("xlo"), F.max("x").alias("xhi"),
                F.min("y").alias("ylo"), F.max("y").alias("yhi"),
            )
        )
        # the file-skipping decision a parquet reader makes from footer stats
        box = (
            (F.col("xhi") >= 100) & (F.col("xlo") <= 250)
            & (F.col("yhi") >= 100) & (F.col("ylo") <= 250)
        )
        return per_file.filter(box).count()

    z_hit, rr_hit = overlapping_files(z_dir), overlapping_files(rr_dir)
    assert rr_hit == files  # round-robin: every file spans the whole domain
    assert z_hit <= files // 2, (z_hit, rr_hit)  # z-order: most files skipped

    # and the layout loses no rows
    assert spark.read.parquet(z_dir).count() == n
