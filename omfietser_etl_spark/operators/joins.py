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
