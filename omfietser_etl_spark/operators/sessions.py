"""Gap-based sessionization over an event stream.

The reference tracks per-job activity windows only implicitly
(`first_seen`/`last_updated`, init-processor-schema.sql:36-38); a
training-data / behavioral pipeline needs true sessions: consecutive
events of one key belong to the same session while the inter-event
gap stays under a threshold.

Batch shape: two window functions partitioned by the session key —
``lag`` to flag boundaries, running ``sum`` of the boundary flags to
number sessions — then one aggregation on (key, session). All three
steps share the same hash partitioning on the key, so Spark plans ONE
shuffle; no global ordering is ever required. The streaming
equivalent is ``applyInPandasWithState`` with a session-window state
(see streaming/stateful.py); semantics here are identical and
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default gap: one hour, in microseconds (event time as epoch-µs).
DEFAULT_GAP_US = 3_600_000_000


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap: int = DEFAULT_GAP_US,
) -> DataFrame:
    """Per-key session assignment: (key, session_idx) on every event.

    ``session_idx`` is 1-based in (ts, order) order; a new session
    starts when the gap to the previous event exceeds ``gap`` (same
    unit as ``ts_col``).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    boundary = (
        F.when(F.lag(ts_col).over(w).isNull(), 1)
        .when(F.col(ts_col) - F.lag(ts_col).over(w) > gap, 1)
        .otherwise(0)
    )
    return events.withColumn("_b", boundary).withColumn(
        "session_idx", F.sum("_b").over(run)
    ).drop("_b")


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap: int = DEFAULT_GAP_US,
) -> DataFrame:
    """One row per session: event count, span, exact value total.

    Money totals are summed as exact integer cents (see
    functions/exact.py — cross-engine double-sum rounding is
    order-dependent; integer sums are not).
    """
    s = sessionize(events, key_col, ts_col, order_col, gap)
    return s.groupBy(F.col(key_col), F.col("session_idx")).agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sum_value_cents"),
    )
