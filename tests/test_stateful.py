"""applyInPandasWithState change-stream operator + progress listener."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from omfietser_etl_spark.streaming.incremental import (
    read_landing_stream,
    with_content_hash,
)
from omfietser_etl_spark.streaming.progress import JobProgressListener
from omfietser_etl_spark.streaming.stateful import changed_rows_stream

SCHEMA = T.StructType(
    [
        T.StructField("shop_type", T.StringType()),
        T.StructField("external_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("current_price", T.DoubleType()),
        T.StructField("scraped_at", T.LongType()),
    ]
)


def _land(path: str, name: str, rows: list[dict]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain_changes(spark, landing, ckpt, out_dir):
    stream = read_landing_stream(spark, landing, SCHEMA)
    hashed = with_content_hash(stream, "title", "current_price")
    changes = changed_rows_stream(
        hashed, keys=["shop_type", "external_id"], order_col="scraped_at"
    )
    q = (
        changes.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


def test_changed_rows_stream_state_survives_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")

    _land(landing, "b1.json", [
        {"shop_type": "AH", "external_id": "1", "title": "Cola",
         "current_price": 2.0, "scraped_at": 100},
        {"shop_type": "AH", "external_id": "1", "title": "Cola",
         "current_price": 2.5, "scraped_at": 150},  # same key, newer, changed
        {"shop_type": "AH", "external_id": "2", "title": "Sap",
         "current_price": 3.0, "scraped_at": 100},
    ])
    out1 = _drain_changes(spark, landing, ckpt, str(tmp_path / "out"))
    got1 = {(r.shop_type, r.external_id, r.scraped_at) for r in out1.collect()}
    # both versions of AH/1 changed state in-batch; both emitted
    assert got1 == {("AH", "1", 100), ("AH", "1", 150), ("AH", "2", 100)}

    # second drain against the SAME checkpoint: state store remembers
    _land(landing, "b2.json", [
        {"shop_type": "AH", "external_id": "1", "title": "Cola",
         "current_price": 2.5, "scraped_at": 200},  # unchanged hash → skip
        {"shop_type": "AH", "external_id": "2", "title": "Sap",
         "current_price": 9.9, "scraped_at": 50},   # LATE (50 < 100) → drop
        {"shop_type": "AH", "external_id": "2", "title": "Sap",
         "current_price": 4.0, "scraped_at": 300},  # real change → emit
    ])
    out2 = _drain_changes(spark, landing, ckpt, str(tmp_path / "out"))
    got2 = {(r.shop_type, r.external_id, r.scraped_at) for r in out2.collect()}
    assert got2 == got1 | {("AH", "2", 300)}  # only the real change appended


def test_job_progress_listener_counts_rows(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    _land(landing, "b1.json", [
        {"shop_type": "AH", "external_id": str(i), "title": "T",
         "current_price": 1.0, "scraped_at": 1}
        for i in range(7)
    ])

    listener = JobProgressListener()
    spark.streams.addListener(listener)
    try:
        stream = read_landing_stream(spark, landing, SCHEMA)
        q = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener callbacks are async — poll briefly
        deadline = time.time() + 30
        while time.time() < deadline:
            if any(e["batch_rows"] == 7 for e in listener.progress_events()):
                break
            time.sleep(0.5)
        evs = listener.progress_events(str(q.id))
        assert any(e["batch_rows"] == 7 for e in evs)
        assert max(e["total_rows"] for e in evs) == 7
        assert {e["event"] for e in listener.events} >= {"job_started", "job_progress"}
    finally:
        spark.streams.removeListener(listener)
