"""Join strategy utilities for skew and co-location (SURVEY §7.7).

AQE's skew-join splitting (on in `session.get_spark`) handles most
runtime skew; `salted_join` is the explicit weapon for EXTREME key
skew — one key holding a double-digit percentage of a 100 TB fact
table — where even a split partition floods its executors, or where
AQE is unavailable (streaming joins, forced shuffle-hash plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    facts: DataFrame,
    ranges: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Bin-blocked range join: facts whose ``ts_col`` falls in a
    range's half-open ``[start_col, end_col)`` window.

    A naive range join is a theta join — Catalyst plans it as
    broadcast-nested-loop, which is fine only while one side fits in
    memory. This operator makes the range predicate *equi-joinable*:

    - each fact maps to exactly one time bin (``ts div bin_width``);
    - each range explodes to the bins it overlaps
      (``sequence(start div w, (end-1) div w)``);
    - the join runs on the bin key, with the exact interval predicate
      as a residual filter.

    The shuffle key is the bin, so both sides can be arbitrarily
    large; no pair is formed unless the two rows share a bin. Each
    (fact, range) pair is produced at most once — the fact's single
    bin either is or isn't in the range's bin list — so no distinct
    pass is needed. Choose ``bin_width`` near the typical range span:
    cost scales with ranges' span/bin_width replication factor on one
    side and bin skew on the other (AQE skew-join splits hot bins).

    For a small range dimension, ``F.broadcast(ranges)`` + the theta
    predicate is simpler and Catalyst handles it; this operator is
    the big×big path.
    """
    if how not in ("inner",):
        raise ValueError("interval_join supports inner joins")
    f = facts.withColumn("_bin", F.expr(f"{ts_col} div {bin_width}"))
    r = ranges.withColumn(
        "_bin",
        F.explode(
            F.expr(f"sequence({start_col} div {bin_width}, ({end_col} - 1) div {bin_width})")
        ),
    )
    joined = f.join(
        r,
        (f["_bin"] == r["_bin"])
        & (f[ts_col] >= r[start_col])
        & (f[ts_col] < r[end_col]),
    )
    return joined.drop("_bin")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Shuffle-join with salted keys: the big side scatters each key
    over ``n_salts`` sub-keys (deterministic row hash, so re-runs
    place rows identically), the small side replicates every row
    ``n_salts`` times. The hot key's rows land on ``n_salts``
    reducers instead of one; the price is a ``n_salts``× blow-up of
    the SMALL side only.

    Use when the small side is too big to broadcast and a key is too
    hot to split. Supports inner and left joins (right/full would
    need de-dup of the replicated side's unmatched rows).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    non_key = [c for c in big.columns if c not in on] or big.columns
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in non_key]), F.lit(n_salts))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {n_salts - 1})"))
    )
    return salted_big.join(salted_small, [*on, "_salt"], how).drop("_salt")


def enable_runtime_bloom_filters(
    spark,
    application_side_scan_threshold: str = "0",
    creation_side_threshold: str = "100MB",
) -> None:
    """Turn on Catalyst's runtime bloom-filter join pruning for
    big×big shuffle joins the planner cannot broadcast.

    When one side of a SortMergeJoin carries a selective filter,
    Catalyst builds a bloom filter over that side's join keys at
    runtime and injects ``might_contain(...)`` into the OTHER side's
    scan — rows that cannot match are dropped before the shuffle,
    which is the dominant cost of a fact×fact join at 100 TB (the
    dynamic-filter analogue of static partition pruning; same idea
    Trino/Photon apply). Spark gates the rewrite behind size
    thresholds tuned for clusters; the defaults here open it up for
    the local gate so the plan shape is testable —
    ``test_plans.py::test_runtime_bloom_filter_prunes_fact_scan``
    locks the injection.

    Runtime-settable confs only (safe on a live session).
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        application_side_scan_threshold,
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        creation_side_threshold,
    )
