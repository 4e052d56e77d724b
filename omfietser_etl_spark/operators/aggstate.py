"""Mergeable aggregate state: incremental rollup maintenance.

The reference keeps running job statistics by incrementing DB counters
per batch (postgres-adapter.ts:936-972; job-manager progress tallies).
The Spark-native generalization is an explicit PARTIAL-AGGREGATE
state table: each batch reduces to one row per key holding mergeable
accumulators (count, sum, min, max), and updating the rollup is
`merge(state, batch_state)` — an aggregate over dimension-sized
inputs. History is NEVER rescanned; a 100 TB table's running totals
cost one map-side combine per new batch plus a key-sized merge.

Accumulator choice is what makes this correct: count/sum/min/max are
associative+commutative, so merge order (and Spark's partial/final
split inside each call) cannot change results. Sums over money ride
integer cents (functions/exact.py convention) — double sums would
drift by accumulation order, breaking the merge-vs-recompute
equivalence this module's tests assert. Averages are DERIVED
(sum/count) at read time, never stored.

Exactly-once feeding is the caller's contract (each batch merged
once); pair with the idempotent MERGE sink
(streaming/incremental.py) or checkpointed foreachBatch for delivery
guarantees.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _state_cols(num_cols: Sequence[str]) -> list[str]:
    out = ["n_rows"]
    for c in num_cols:
        out += [f"sum_{c}_cents", f"min_{c}_cents", f"max_{c}_cents"]
    return out


def agg_state(df: DataFrame, keys: Sequence[str], num_cols: Sequence[str]) -> DataFrame:
    """Reduce a batch to one mergeable state row per key.

    For every column in ``num_cols`` (doubles in data units) the
    state holds sum/min/max in integer cents plus the shared row
    count. One hash aggregate with map-side combine — the batch
    leaves each executor pre-reduced to its distinct keys.
    """
    cents = lambda c: F.round(F.col(c) * 100, 0).cast("long")  # noqa: E731
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in num_cols:
        aggs += [
            F.sum(cents(c)).alias(f"sum_{c}_cents"),
            F.min(cents(c)).alias(f"min_{c}_cents"),
            F.max(cents(c)).alias(f"max_{c}_cents"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_state(
    state: DataFrame, batch_state: DataFrame, keys: Sequence[str], num_cols: Sequence[str]
) -> DataFrame:
    """Fold a batch's state into the running state (same schema).

    Union + one key-sized aggregate: counts and sums add, mins/maxes
    combine — per accumulator algebra, `merge(s, b)` equals the state
    of the concatenated inputs, which the tests assert against a
    direct recompute.
    """
    u = state.unionByName(batch_state)
    aggs = [F.sum("n_rows").alias("n_rows")]
    for c in num_cols:
        aggs += [
            F.sum(f"sum_{c}_cents").alias(f"sum_{c}_cents"),
            F.min(f"min_{c}_cents").alias(f"min_{c}_cents"),
            F.max(f"max_{c}_cents").alias(f"max_{c}_cents"),
        ]
    return u.groupBy(*keys).agg(*aggs)


def state_report(state: DataFrame, num_cols: Sequence[str]) -> DataFrame:
    """Read-time derived metrics: floor-ratio average per column
    (exact integer basis, engine-portable)."""
    out = state
    for c in num_cols:
        out = out.withColumn(
            f"avg_{c}_cents",
            F.floor(F.col(f"sum_{c}_cents") * 1.0 / F.col("n_rows")).cast("long"),
        )
    return out
