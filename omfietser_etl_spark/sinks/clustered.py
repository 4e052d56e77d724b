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

from pyspark.sql import DataFrame


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
