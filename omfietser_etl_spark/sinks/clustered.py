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
    if not 0 < bits <= 31:
        # 2·bits interleaved bit positions must stay below the int64
        # sign bit: bits=32 puts col_b's top bit at position 63
        # (negative z values break the Morton sort order), and ≥33
        # wraps the JVM shift count mod 64 — both silently corrupt
        # the clustering (review round-6 finding).
        raise ValueError(f"z_order_key: bits={bits} out of range 1..31")
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


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files
    near ``target_file_bytes``. Returns the output file count.

    Streaming sinks and per-batch upserts accrete small files; at
    100 TB a 10⁶-file table spends more time in footer reads and task
    scheduling than in data. Compaction sizes output from the
    ACTUAL input bytes (cheap driver-side listing via the Hadoop FS,
    no data read), then rewrites in one job — with an optional
    re-sort to restore clustering (pair with `write_range_clustered`
    keys so compaction preserves data-skipping bands).

    Writes to ``out_path`` rather than in place: object stores have
    no atomic directory swap, so publish-then-repoint (or a table
    format's commit protocol) is the safe pattern.
    """
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)  # noqa: SLF001
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    total = fs.getContentSummary(jvm_path).getLength()
    n_files = max(1, int(total // target_file_bytes) + (1 if total % target_file_bytes else 0))
    df = spark.read.parquet(path)
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_path)
    return n_files


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
