"""Skew diagnostics: find the keys that will break your shuffle.

Before salting a join or sizing AQE skew thresholds
(operators/joins.py::salted_join, session confs) you need to KNOW the
key distribution — at 100 TB a single hot key is the difference
between a 10-minute and a 10-hour stage. This report is the
measurement step: per-key counts (one map-side-combined hash
aggregate — the same shuffle the real join would do, but carrying
only counters), top-k heaviest keys with their share, and the
skew ratio (max key count / mean key count) that tells you whether
the default hash partitioning is even viable.

Rule of thumb the docstring encodes rather than hides: skew_ratio
under ~4 is AQE territory (spark.sql.adaptive.skewJoin handles it);
hundreds means explicit salting of the listed keys; a share_bp in the
thousands (>10% on one key) means rethink the key itself.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skew_report(df: DataFrame, keys: Sequence[str], top_k: int = 10) -> DataFrame:
    """Top-k heaviest keys with share and skew ratio.

    Output per heavy key: the key columns, ``cnt``, ``share_bp``
    (floor basis points of total rows), ``rank`` (1 = heaviest;
    count-desc, then key asc for determinism), and ``skew_ratio_x100``
    (max-key count ×100 / mean-key count, floor — global, repeated on
    every row for a self-contained report).

    Scale shape: one hash aggregate over the keys; the top-k is a
    TakeOrderedAndProject over the (distinct-key-sized) counts, and
    the two global scalars ride a single-row broadcast — no window
    over the full key set, no second scan of the fact table.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("_total"),
        F.max("cnt").alias("_max_cnt"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    order = [F.col("cnt").desc()] + [F.col(k) for k in keys]
    top = counts.orderBy(*order).limit(top_k)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(totals))
        .select(
            *keys,
            "cnt",
            F.floor(F.col("cnt") * 10000.0 / F.col("_total")).cast("long").alias("share_bp"),
            "rank",
            F.floor(F.col("_max_cnt") * 100.0 * F.col("_n_keys") / F.col("_total"))
            .cast("long")
            .alias("skew_ratio_x100"),
        )
    )
