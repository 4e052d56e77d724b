"""Range-clustered writer and streaming dedup: layout + state
properties (sinks/clustered.py, streaming/dedup.py)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from omfietser_etl_spark.session import load
from omfietser_etl_spark.sinks.clustered import (
    write_range_clustered,
    write_z_clustered,
    z_order_key,
)
from omfietser_etl_spark.streaming.dedup import dedup_stream

from .conftest import SF_SMOKE


def test_range_clustered_files_have_disjoint_bands(spark, tmp_path):
    orders = load(spark, SF_SMOKE, "orders")
    out = str(tmp_path / "clustered")
    write_range_clustered(orders, out, ["o_orderkey"], n_files=8)

    bands = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.read_metadata(f)
        col_ix = md.schema.names.index("o_orderkey")
        lo = min(md.row_group(i).column(col_ix).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(col_ix).statistics.max for i in range(md.num_row_groups))
        bands.append((lo, hi))
    assert len(bands) == 8
    bands.sort()
    # disjoint min/max bands: every file prunable by a key predicate
    for (_, hi_a), (lo_b, _) in zip(bands, bands[1:]):
        assert hi_a <= lo_b

    # round-trip completeness
    assert spark.read.parquet(out).count() == orders.count()

    # a point predicate must reach the scan as a pushed filter
    plan = (
        spark.read.parquet(out)
        .filter(F.col("o_orderkey") == bands[0][0])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey" in plan


def test_z_order_key_interleaves_bits(spark):
    df = spark.createDataFrame([(0b11, 0b00), (0b00, 0b11), (0b10, 0b01)], ["a", "b"])
    got = [r.z for r in df.select(z_order_key("a", "b", 2).alias("z")).collect()]
    # a bits at even positions, b bits at odd positions
    assert got == [0b0101, 0b1010, 0b0110]


def _file_bands(path: str, col: str) -> list[tuple]:
    bands = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.read_metadata(f)
        ix = md.schema.names.index(col)
        lo = min(md.row_group(i).column(ix).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(ix).statistics.max for i in range(md.num_row_groups))
        bands.append((lo, hi))
    return bands


def test_z_clustered_layout_bounds_both_dimensions(spark, tmp_path):
    # full 32x32 grid; 4 z-range files ≈ the four quadrants, so BOTH
    # x and y spans per file are about half the domain
    grid = spark.range(32 * 32).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    out = str(tmp_path / "zclustered")
    write_z_clustered(grid, out, "x", "y", bits=5, n_files=4)
    for col in ("x", "y"):
        for lo, hi in _file_bands(out, col):
            assert hi - lo <= 24, (col, lo, hi)  # never the full 0..31 span
    assert spark.read.parquet(out).count() == 32 * 32


def test_dedup_stream_batch_degrades_to_drop_duplicates(spark):
    df = spark.createDataFrame(
        [("AH", "1", 100), ("AH", "1", 200), ("AH", "2", 100)],
        "shop string, ext string, ts long",
    )
    out = dedup_stream(df, ["shop", "ext"], ts_col="ts")
    assert out.count() == 2
    assert "_event_time" not in out.columns


def test_dedup_stream_suppresses_cross_batch_duplicates(spark, tmp_path):
    src = str(tmp_path / "src")
    # two files -> two micro-batches (maxFilesPerTrigger=1); the same
    # key appears in both, within the watermark horizon
    base = 1_700_000_000_000_000_000  # epoch nanos
    spark.createDataFrame(
        [("AH", "1", base), ("AH", "2", base)], "shop string, ext string, ts long"
    ).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(
        [("AH", "1", base + 60_000_000_000), ("AH", "3", base + 60_000_000_000)],
        "shop string, ext string, ts long",
    ).coalesce(1).write.parquet(src + "/f2")

    schema = "shop string, ext string, ts long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        dedup_stream(stream, ["shop", "ext"], ts_col="ts", watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted((r.shop, r.ext) for r in spark.read.parquet(out_dir).collect())
    # AH/1's re-delivery suppressed; AH/2 and AH/3 pass through once
    assert got == [("AH", "1"), ("AH", "2"), ("AH", "3")]


def test_z_order_key_rejects_sign_bit_geometry(spark):
    """bits > 31 silently corrupts the Morton order (position 63 is
    the int64 sign bit; shifts >= 64 wrap mod 64 in the JVM) — must
    raise instead (review round-6 finding)."""
    import pytest

    from omfietser_etl_spark.sinks.clustered import z_order_key

    for bad in (0, 32, 33, 64):
        with pytest.raises(ValueError, match="bits"):
            z_order_key("a", "b", bad)
    z_order_key("a", "b", 31)  # boundary accepted
