"""Streaming exact deduplication with bounded state (watermark TTL).

The reference dedupes within one batch file via a driver-side
keep-first pass (`src/utils/dedupe.ts:23-52`) and across runs via the
DB upsert's primary key. A streaming engine needs a third form: drop
re-deliveries of the same key *across micro-batches* without keeping
every key ever seen. Spark's `dropDuplicatesWithinWatermark` is
exactly that — per-key state lives in the state store and is evicted
once the watermark passes, so state size is bounded by (keys per
watermark horizon), not by stream history.

Scale shape: the dedup is a stateful exchange hash-partitioned on the
key columns — one shuffle, same as a batch groupBy — and the state
store is RocksDB-backed on a real cluster. At 100 TB/day with a
30-minute watermark, state holds ~20 GB of keys instead of the
unbounded full-history set an unwatermarked `dropDuplicates` would
accumulate (which OOMs the state store at scale — that variant is
only safe on finite replays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    ts_is_nanos: bool = True,
) -> DataFrame:
    """Keep the first-seen row per key within the watermark horizon.

    ``keys`` are the identity columns (e.g. shop_type + external_id,
    the reference's PK). ``ts_col`` is the event-time column used for
    the watermark; for the events table it's epoch-nanos (LongType),
    converted here. Duplicates arriving within ``watermark`` of each
    other are suppressed; a re-delivery later than the horizon is
    treated as a new observation (by design — the horizon IS the
    dedup contract, matching how re-scrapes re-observe a product).

    On a batch frame the same call degrades to plain
    ``dropDuplicates(keys)`` (watermarks are streaming-only), so the
    operator is usable in both the replay and live paths.
    """
    with_ts = stream.withColumn(
        "_event_time",
        F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        if ts_is_nanos
        else F.col(ts_col).cast("timestamp"),
    )
    if not with_ts.isStreaming:
        return with_ts.dropDuplicates(keys).drop("_event_time")
    return (
        with_ts.withWatermark("_event_time", watermark)
        .dropDuplicatesWithinWatermark(keys)
        .drop("_event_time")
    )
