"""Distributed ordinary least squares via normal equations — the
classic "one aggregate, closed-form solve" pattern (ref analogue: the
reference computes per-shop price trend lines driver-side over
collected rows, src/scripts/analyze-data.ts price-stats section; here
the whole fit is a single distributed plan).

Why this shape at 100 TB: a 3-parameter OLS fit needs only the Gram
matrix XᵀX and the moment vector Xᵀy — k(k+1)/2 + k = 9 numbers. Both
are SUMS of per-row products, so Spark computes them as ONE map-side
partially-aggregated pass over the fact table (no shuffle of data
rows — the exchange carries 9 numbers per map task), and the 3×3
solve happens IN the plan via Cramer's rule on the aggregated row:
zero driver actions, zero collect, the model coefficients are a
1-row DataFrame. Contrast gradient descent: k passes per epoch and a
driver round-trip per step for the same closed-form answer.

EXACTNESS (the gate contract): inputs are 2-decimal money/quantity
columns, so each is scaled ×100 to an exact BIGINT; every sum is then
exact integer arithmetic — bit-identical in Spark and DuckDB — and
the float part is confined to the final Cramer expressions, which
both engines evaluate from the SAME textual formula (shared here)
over the SAME doubles: IEEE 754 ops on identical inputs in identical
order give identical bits. The betas are emitted as INTEGER
micro-units (round(β·10⁶) AS BIGINT) rather than round(β, 6): a
decimal-scale round of a double is engine-specific on exact-tie
representations (Spark detours through BigDecimal HALF_UP of the
shortest-decimal string; DuckDB rounds the binary value), whereas an
integer round's only tie point k+0.5 is exactly representable and
both engines break it away from zero — no residual flake point
(round-9 advisor finding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed-point input scale: 2-decimal columns → exact integers.
OLS_SCALE = 100

# Cramer's rule for the symmetric 3×3 system
#   [[a, b, c], [b, d, e], [c, e, f]] · β = [p, q, r]
# with a=n, b=Σx1, c=Σx2, d=Σx1², e=Σx1x2, f=Σx2², p=Σy, q=Σx1y,
# r=Σx2y (design matrix rows [1, x1, x2]). ONE formula text, used
# verbatim by BOTH engines — structural identity is what makes the
# double arithmetic replay bit-for-bit.
_DET = "(a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c))"
_DET0 = "(p*(d*f - e*e) - b*(q*f - e*r) + c*(q*e - d*r))"
_DET1 = "(a*(q*f - r*e) - p*(b*f - c*e) + c*(b*r - c*q))"
_DET2 = "(a*(d*r - e*q) - b*(b*r - c*q) + p*(b*e - c*d))"

#: output column -> formula over the aggregated sums a..f, p..r.
#: Integer micro-unit betas (see EXACTNESS above); nullif guards the
#: singular det=0 case to NULL identically in both engines (a double
#: inf/NaN would cast to BIGINT differently: Spark 0, DuckDB error).
OLS3_BETA_EXPRS = {
    "beta0_x1e6": f"cast(round({_DET0} * 1000000.0 / nullif({_DET}, 0.0)) as bigint)",
    "beta1_x1e6": f"cast(round({_DET1} * 1000000.0 / nullif({_DET}, 0.0)) as bigint)",
    "beta2_x1e6": f"cast(round({_DET2} * 1000000.0 / nullif({_DET}, 0.0)) as bigint)",
}

#: aggregate alias -> (lhs, rhs) product of input columns; "1" = the
#: intercept regressor (count / plain sums).
_SUM_TERMS = {
    "a": ("1", "1"),
    "b": ("x1", "1"),
    "c": ("x2", "1"),
    "d": ("x1", "x1"),
    "e": ("x1", "x2"),
    "f": ("x2", "x2"),
    "p": ("y", "1"),
    "q": ("x1", "y"),
    "r": ("x2", "y"),
}


def scaled_long(col: Column, scale: int = OLS_SCALE) -> Column:
    """Exact-integer fixed-point cast: round(col·scale) as BIGINT.
    The ×scale product of a 2-dp value lands within 1 ulp of an
    integer, so round() (not truncation) recovers it exactly and
    identically in both engines."""
    return F.round(col * scale).cast("long")


def ols3_fit(df: DataFrame, x1: str, x2: str, y: str) -> DataFrame:
    """1-row (n_rows, beta0_x1e6, beta1_x1e6, beta2_x1e6) OLS fit of
    ``y ~ 1 + x1 + x2`` — all three columns must already be exact
    BIGINTs (see :func:`scaled_long`); betas are integer micro-units
    (round(β·10⁶)) in that scaled space. One map-side-combined
    aggregate + an in-plan Cramer solve: the only exchange in the
    whole plan carries 9 longs per task."""

    def term(alias: str) -> Column:
        lhs, rhs = _SUM_TERMS[alias]
        if (lhs, rhs) == ("1", "1"):
            return F.count(F.lit(1)).alias(alias)
        if rhs == "1":
            return F.sum(F.col(lhs)).alias(alias)
        return F.sum(F.col(lhs) * F.col(rhs)).alias(alias)

    sums = df.select(
        F.col(x1).alias("x1"), F.col(x2).alias("x2"), F.col(y).alias("y")
    ).agg(*[term(k) for k in _SUM_TERMS])
    as_dbl = sums.select(
        F.col("a").cast("long").alias("n_rows"),
        *[F.col(k).cast("double").alias(k) for k in _SUM_TERMS],
    )
    return as_dbl.select(
        "n_rows",
        *[F.expr(e).alias(k) for k, e in OLS3_BETA_EXPRS.items()],
    )


def ols3_oracle_sql(source_sql: str) -> str:
    """DuckDB twin of :func:`ols3_fit`: ``source_sql`` must yield
    exact-BIGINT columns (x1, x2, y). Identical formula text, sums
    cast to DOUBLE at the same point as the engine side."""
    aggs = []
    for alias, (lhs, rhs) in _SUM_TERMS.items():
        if (lhs, rhs) == ("1", "1"):
            aggs.append(f"count(*) AS {alias}")
        elif rhs == "1":
            aggs.append(f"sum({lhs}) AS {alias}")
        else:
            aggs.append(f"sum({lhs} * {rhs}) AS {alias}")
    betas = ", ".join(f"{e} AS {k}" for k, e in OLS3_BETA_EXPRS.items())
    dbls = ", ".join(f"CAST({k} AS DOUBLE) AS {k}" for k in _SUM_TERMS)
    return (
        f"WITH ols_src AS ({source_sql}), "
        f"ols_sums AS (SELECT {', '.join(aggs)} FROM ols_src), "
        f"ols_dbl AS (SELECT CAST(a AS BIGINT) AS n_rows, {dbls} "
        "FROM ols_sums) "
        f"SELECT n_rows, {betas} FROM ols_dbl"
    )
