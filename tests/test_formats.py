"""Format breadth (CSV dead-letter, ORC round-trip) and small-file
compaction."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from omfietser_etl_spark.session import load
from omfietser_etl_spark.sinks.clustered import compact_parquet
from omfietser_etl_spark.sources.files import read_csv, read_orc, write_orc

from .conftest import SF_SMOKE


def test_csv_schema_and_dead_letter(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,price\n1,2.50\n2,notanumber\n3,4.00\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    good, corrupt = read_csv(spark, str(p), schema)
    assert {(r.id, r.price) for r in good.collect()} == {(1, 2.5), (3, 4.0)}
    bad = corrupt.collect()
    assert len(bad) == 1 and "notanumber" in bad[0].raw_text


def test_orc_round_trip_preserves_rows(spark, tmp_path):
    orders = load(spark, SF_SMOKE, "orders")
    out = str(tmp_path / "orders_orc")
    write_orc(orders, out)
    back = read_orc(spark, out)
    assert back.count() == orders.count()
    assert sorted(back.columns) == sorted(orders.columns)
    # columnar pushdown works on ORC like parquet
    plan = (
        back.filter(F.col("o_orderkey") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "o_orderkey" in plan


def test_audited_write_observes_metrics_in_one_job(spark, tmp_path):
    import pytest

    from omfietser_etl_spark.sinks.audit import audited_write

    orders = load(spark, SF_SMOKE, "orders")
    out = str(tmp_path / "audited")
    got = audited_write(
        orders,
        out,
        metrics={
            "n_rows": F.count(F.lit(1)),
            "null_prices": F.sum(F.col("o_totalprice").isNull().cast("long")),
            "max_price_cents": F.max(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ),
        },
    )
    n = orders.count()
    assert got["n_rows"] == n
    assert got["null_prices"] == 0
    assert got["max_price_cents"] > 0
    assert spark.read.parquet(out).count() == n

    with pytest.raises(ValueError, match="below min_rows"):
        audited_write(
            orders.filter(F.lit(False)), str(tmp_path / "empty"), min_rows=1
        )


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    orders = load(spark, SF_SMOKE, "orders")
    orders.repartition(40).write.parquet(src)  # simulate small-file debris
    n_in = len(glob.glob(src + "/*.parquet"))
    assert n_in >= 40

    out = str(tmp_path / "compacted")
    total = sum(os.path.getsize(f) for f in glob.glob(src + "/*.parquet"))
    n_out = compact_parquet(spark, src, out, target_file_bytes=total)
    assert n_out <= 2  # everything fits one target-size file (+rounding)
    files = glob.glob(out + "/*.parquet")
    assert len(files) == n_out
    assert spark.read.parquet(out).count() == orders.count()


def test_evolved_parquet_merges_schema_versions(spark, tmp_path):
    from omfietser_etl_spark.sources.files import read_evolved_parquet

    path = str(tmp_path / "evolving")
    # v1 writer: two columns
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, payload string"
    ).write.mode("append").parquet(path)
    # v2 writer: adds a column (schema evolution)
    spark.createDataFrame(
        [(3, "c", 9.5)], "id long, payload string, score double"
    ).write.mode("append").parquet(path)

    out = read_evolved_parquet(spark, path)
    assert set(out.columns) == {"id", "payload", "score"}
    rows = {r.id: r for r in out.collect()}
    assert rows[1].score is None and rows[3].score == 9.5
    # pruning/pushdown still hold on the merged schema
    assert read_evolved_parquet(spark, path).filter("score > 9").count() == 1
