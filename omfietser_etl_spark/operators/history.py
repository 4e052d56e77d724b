"""SCD2 (slowly-changing-dimension type 2) interval construction.

The reference keeps only the *latest* row per product plus
``first_seen``/``last_updated`` bookkeeping
(init-processor-schema.sql:36-38, postgres-adapter.ts:637-788 — the
upsert overwrites history). A warehouse consumer of the same data
usually wants the full type-2 history instead: one row per
*state run* of a key, with a half-open validity interval and a
current flag. This operator builds that history from an event/
snapshot log in one pass.

Scale shape: every step — change-boundary flag (``lag``), run start
filter, validity chaining (``lead``) — is a window partitioned by the
SAME key, so Spark plans a single hash shuffle on the key and runs
all three windows inside one sort within those partitions. No
groupBy on a composite (key, run) ever happens (that would be a
second shuffle); run length is recovered from row-number arithmetic
instead. At 100 TB the cost is one shuffle of the change-relevant
columns — prune to (key, ts, state) before calling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_cols: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """Collapse a per-key change log into type-2 validity intervals.

    Consecutive rows (ordered by ``ts_col``, then ``order_col`` as a
    deterministic tiebreak) whose ``state_cols`` are all equal form
    one *run*. Output: one row per run with

    - ``valid_from``  — first ``ts_col`` of the run,
    - ``valid_to``    — first ``ts_col`` of the NEXT run (null for
      the key's last run; intervals are half-open ``[from, to)``),
    - ``n_rows``      — events collapsed into the run,
    - ``is_current``  — true on the key's last run,

    plus ``key_col`` and the run's ``state_cols`` values. Null state
    values compare equal to null (a null→null transition is NOT a
    change), via null-safe equality.
    """
    order = [ts_col] + ([order_col] if order_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for c in state_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    boundary = F.lag(ts_col).over(w).isNull() | changed
    flagged = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n_key", F.count("*").over(Window.partitionBy(key_col)))
        .withColumn("_b", boundary)
    )
    starts = flagged.filter(F.col("_b"))
    ws = Window.partitionBy(key_col).orderBy(*order)
    return (
        starts.select(
            key_col,
            *state_cols,
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(ws).alias("valid_to"),
            (
                F.coalesce(F.lead("_rn").over(ws), F.col("_n_key") + 1) - F.col("_rn")
            ).alias("n_rows"),
            F.lead(ts_col).over(ws).isNull().alias("is_current"),
        )
    )
