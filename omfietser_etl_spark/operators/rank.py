"""Distributed exact global rank — the scale-safe replacement for
``row_number() OVER (ORDER BY ...)`` with no PARTITION BY.

A partition-less window forces every row through ONE task (Spark's
WindowExec warns about exactly this); at corpus scale that is a
single-machine wall no cluster size fixes. The classic fix keeps the
rank EXACT while staying fully parallel:

1. ``repartitionByRange`` on the total order — the range partitioner
   samples split points, so partition *p*'s rows all precede
   partition *p+1*'s rows in the global order, with balanced row
   counts even under skewed values (a unique tiebreak column makes
   the order total);
2. local ``row_number`` per range partition — the window partitions
   by ``spark_partition_id()``, so every partition sorts and ranks
   independently in parallel;
3. per-partition row counts → prefix-sum offsets. The counts frame
   has at most ``n_parts`` rows (a bounded driver collect, the same
   contract as the k-means codebook), broadcast back as an offset
   lookup; ``rank = offset[pid] + local_rank``.

Two thin shuffles of the projection being ranked (range exchange +
the pid hash exchange feeding the window), both parallel — versus one
shuffle into a single task for the naive window. The repartitioned
frame is cached (scoped, self-releasing) so the partition identity
seen by the counts job and by the final plan is pinned; range-bound
sampling is additionally deterministic per RDD id, so even a cache
eviction recomputes identical bounds.

No reference equivalent: the reference ranks in Postgres
(`row_number` over B-tree order); this module exists purely for the
100 TB posture of ts13/ts15 (round-5 verdict items).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..cacheutil import release_then_register


def distributed_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
    n_parts: int | None = None,
    scope: str = "operators.distributed_rank",
) -> DataFrame:
    """Append ``rank_col`` = exact 1-based global row_number under the
    total order ``order_cols`` (must be total — include a unique
    tiebreak). Output columns: input columns + ``rank_col``.

    ``n_parts`` defaults to ``spark.sql.shuffle.partitions``; it is
    passed explicitly to ``repartitionByRange`` so AQE cannot re-plan
    the exchange between the counts job and the ranking job.
    """
    return distributed_rank_n(df, order_cols, rank_col, n_parts, scope)[0]


def distributed_rank_n(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
    n_parts: int | None = None,
    scope: str = "operators.distributed_rank",
) -> tuple[DataFrame, int]:
    """:func:`distributed_rank` plus the TOTAL row count, which the
    offset prefix-sum already computes — consumers that need N for
    quantile-style bucketing (e.g. thirds) get it without a separate
    ``count()`` job (the ts15 sentinel-row discipline)."""
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rp = release_then_register(
        scope,
        df.repartitionByRange(n_parts, *order_cols).cache(),
    ).withColumn("_pid", F.spark_partition_id())

    counts = rp.groupBy("_pid").agg(F.count("*").alias("_c")).collect()
    off, acc = [], 0
    for r in sorted(counts, key=lambda r: r._pid):
        off.append((r._pid, acc))
        acc += r._c
    off_df = spark.createDataFrame(off, "_pid int, _off long")

    local = F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols))
    ranked = (
        rp.join(F.broadcast(off_df), "_pid")
        .withColumn(rank_col, (F.col("_off") + local).cast("long"))
        .drop("_pid", "_off")
    )
    return ranked, acc
