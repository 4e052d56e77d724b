"""Audited writes: data-quality metrics that ride the write job.

The reference counts successes/failures as it loops rows
(processors/base.ts:35-48) — free when you're already iterating in
JS, but the naive Spark translation (`df.count()` then `df.write`)
SCANS TWICE, and at 100 TB the audit costs as much as the write.
`Observation` attaches aggregate metrics to the write job itself:
executors accumulate them while writing, the driver reads them after
— one pass, zero extra jobs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def audited_write(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column] | None = None,
    mode: str = "overwrite",
    min_rows: int = 0,
) -> dict:
    """Write parquet and return observed metrics from the SAME job.

    ``metrics`` maps output names to aggregate expressions (defaults
    to a row count). ``min_rows`` is a write-time invariant: an
    unexpectedly empty/truncated output raises AFTER the write (the
    caller decides whether to repoint consumers — on object stores
    the partial output is in place either way; pair with the
    publish-then-repoint pattern of compact_parquet).
    """
    obs = Observation()
    cols = dict(metrics) if metrics else {}
    if "n_rows" not in cols:
        cols["n_rows"] = F.count(F.lit(1))
    observed = df.observe(obs, *[c.alias(n) for n, c in cols.items()])
    observed.write.mode(mode).parquet(path)
    got = obs.get
    if got["n_rows"] < min_rows:
        raise ValueError(
            f"audited_write: n_rows={got['n_rows']} below min_rows={min_rows}"
        )
    return got
