"""Range-clustered parquet writer: layout for data skipping.

The reference's tables are heap tables with btree indexes
(init-processor-schema.sql:41-55); Spark's equivalent of an index is
FILE LAYOUT — parquet footers carry per-column min/max, and the scan
skips whole files/row-groups whose range cannot match a pushed
predicate. That only works if the write CLUSTERS rows so ranges are
disjoint: `repartitionByRange` (one range-exchange using a sampled
histogram of the key) followed by `sortWithinPartitions` gives every
output file a tight, non-overlapping min/max band.

Scale: this is the difference between a time/key-filtered query
scanning 100 TB and scanning the one-in-a-thousand files whose band
overlaps the predicate. The range exchange is a single shuffle at
write time, amortized over every subsequent read; the sampled range
boundaries also make output file sizes uniform (no skewed-partition
giant files, unlike hash layouts under a skewed key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_order_key(col_a: Column | str, col_b: Column | str, bits: int) -> Column:
    """Morton (Z-order) interleave of two non-negative integer keys.

    Bit i of ``col_a`` lands at position 2i, bit i of ``col_b`` at
    2i+1 — locality in EITHER dimension maps to locality in the
    single z value. Clustering files by z therefore gives BOTH
    columns tight min/max footer bands, so predicates on either (or
    both) dimensions skip files — the two-dimensional generalization
    of `write_range_clustered`, same trick Delta/Iceberg OPTIMIZE
    ZORDER uses.

    Pure bitwise expressions (whole-stage codegen); ``bits`` bounds
    each input (values must fit in ``bits`` bits — pre-bucket raw
    domains first, e.g. `F.floor(x / bucket_width)`).
    """
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    a, b = a.cast("long"), b.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def write_z_clustered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by the Morton key of two columns.

    The z column itself is dropped before writing — it exists only to
    drive the range exchange; the payoff lives in the per-file
    min/max stats of the ORIGINAL columns.
    """
    (
        df.withColumn("_z", z_order_key(col_a, col_b, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered into ``n_files`` disjoint key ranges.

    ``cluster_cols`` should lead with the dominant filter column of
    downstream queries (scan pruning uses the FIRST column's band
    most effectively; later columns tighten row-group stats within a
    file). ``n_files`` sets the target file count explicitly — size
    it so files land near the 128–1024 MB sweet spot at your scale;
    an explicit number also keeps AQE from coalescing the range
    exchange into fewer, fatter files.
    """
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )
