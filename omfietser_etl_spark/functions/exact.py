"""Cross-engine tie-free numeric output conventions.

A ``round(sum(double), 2)`` output is a correctness hazard in a
dual-engine (Spark + DuckDB oracle) setting for two independent
reasons:

1. **Accumulation order.** Floating-point addition is not
   associative; Spark's partial-aggregate tree and DuckDB's scan
   order sum the same values in different orders, so the final
   double can differ in the last ulp — and ``round(x, 2)`` amplifies
   a 1-ulp difference into a whole cent whenever the sum lands on a
   ``.xx5`` boundary.
2. **Rounding implementation.** Even on bitwise-identical doubles,
   Spark rounds via ``BigDecimal.valueOf(d)`` (the shortest decimal
   representation) with HALF_UP, while DuckDB rounds the binary
   value directly; near-tie values at scale > 0 can round apart.

Both hazards vanish with integer bases:

* ``cents(col)`` / ``bp(col)`` convert each VALUE to an exact
  integer (``round(x * 100, 0)`` at scale 0 is safe: ``x.5`` is
  exactly representable, so the shortest repr and the binary value
  are always on the same side of the boundary — and both engines
  round ties away from zero). Summing longs is exact and
  order-independent.
* ``floor_ratio(num, den, k)`` emits ``floor(num * k / den)`` for
  exact-integer ``num``/``den``: both engines compute the same IEEE
  quotient from the same integers, and a floor of such a quotient
  can only straddle an integer boundary when the true quotient IS
  that integer, in which case IEEE division returns it exactly.

Use these for every aggregate money/ratio output under the
correctness gate (SURVEY §6 parity discipline; the reference stores
money as numeric cents for the same reason —
init-processor-schema.sql:24-33 price columns).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col) -> Column:
    """Exact integer cents of a price-like double (scale-0 round is
    cross-engine safe; see module docstring)."""
    return F.round(F.col(col) * 100 if isinstance(col, str) else col * 100, 0).cast("long")


def bp(col) -> Column:
    """Exact integer basis points (4 implied decimals) of a double."""
    return F.round((F.col(col) if isinstance(col, str) else col) * 10000, 0).cast("long")


def sum_cents(col) -> Column:
    """Order-independent exact sum, in cents, of a 2-dp double column."""
    return F.sum(cents(col))


def sum_bp(col) -> Column:
    """Order-independent exact sum, in basis points, of a ≤4-dp double."""
    return F.sum(bp(col))


def floor_ratio(num: Column, den: Column, k: int = 10000) -> Column:
    """``floor(num * k / den)`` as BIGINT — tie-free scaled ratio of
    two exact integers (percentages: k=10000 → basis points)."""
    return F.floor(num * float(k) / den).cast("long")


# DuckDB oracle-side spellings of the same conventions (keep the
# arithmetic order identical to the Spark expressions above).
SQL_CENTS = "CAST(round(({x}) * 100, 0) AS BIGINT)"
SQL_BP = "CAST(round(({x}) * 10000, 0) AS BIGINT)"
SQL_FLOOR_RATIO = "CAST(floor(({num}) * {k}.0 / ({den})) AS BIGINT)"
