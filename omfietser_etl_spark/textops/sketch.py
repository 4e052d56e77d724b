"""Mergeable count-min sketch for streaming-side heavy hitters.

`tv1_top_terms` is the exact batch path: one full term-keyed shuffle,
fine for a bounded vocabulary. A 100 TB *streaming* pipeline can't
re-shuffle the corpus per micro-batch; the standard answer (Cormode &
Muthukrishnan 2005) is a count-min sketch — a d×w integer table where
every term increments one cell per row and the estimate is the min
over its d cells. Estimates never undercount (est ≥ true) and
overcount by ≤ εN with probability 1−δ for w = e/ε, d = ln(1/δ).

Spark-first shape:
- **Build** is one pass: the token stream fans out to d (row, col)
  cells via ``posexplode`` of a d-hash array (pure codegen — the
  salted mixed poly-hash already used by the deterministic samplers,
  so the DuckDB oracle replays the sketch bit-for-bit), then ONE
  groupBy((row, col)) with map-side combine. The shuffle carries at
  most d·w cells per map partition regardless of corpus size — this
  is the whole point vs. the exact top-k's term-cardinality shuffle.
- **Merge** is cell-wise addition — associative and commutative, so
  per-batch / per-partition / per-day sketches combine freely
  (`union → groupBy(row, col) → sum`), the property that makes the
  sketch a streaming/state-store citizen.
- **Estimate** joins candidate terms' d cells against the sketch
  (d·w rows ≈ 40k cells → broadcast) and takes the min — a map-side
  join, no shuffle of the sketch.

Candidate generation still needs *some* term stream (a sketch alone
cannot enumerate keys); the intended composition is per-batch local
top-k candidates + a merged global sketch to score them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .constants import CHAR_SEED, MOD
from .sampling import BUCKETS, mix_sql

#: sketch depth (independent hash rows). With w = BUCKETS = 10 000,
#: overcount ≤ e/10000 ≈ 0.03% of the stream per row, δ = e^-4 ≈ 2%.
CMS_DEPTH = 4
#: sketch width — reuses the sampler bucket space so the portable
#: mixed poly-hash (and its DuckDB twin) indexes columns directly.
CMS_WIDTH = BUCKETS
#: xor constant deriving the second hash for double hashing.
CMS_H2_XOR = 0x5BD1E995


def _cell_hashes(term_col: str) -> F.Column:
    """d column indexes from ONE char-level fold per term.

    Kirsch–Mitzenmacher double hashing: g_r = (h1 + r·h2) mod w with
    h1 = mix31(poly(t)), h2 = mix31(poly(t) xor C) — the standard
    bloom/CMS construction that preserves the error guarantees while
    hashing the string once.

    The fold result is LET-BOUND through single-element ``transform``
    lambdas (`transform(array(fold), p -> ...)`) so every downstream
    reference reads the lambda VARIABLE. Building the same thing from
    Column objects duplicates the fold subtree at every reference
    (mix31 alone expands its argument 8×, and CollapseProject undoes
    any staging projection), which made the naive build ~30× slower —
    per-token cost must be a handful of integer ops, not 8-64 string
    folds.
    """
    fold = (
        f"aggregate(split({term_col}, ''), CAST({CHAR_SEED} AS BIGINT), "
        f"(a, c) -> (a * 31 + ascii(c)) % {MOD})"
    )
    cells = ", ".join(
        f"CAST(pmod(hh.h1 + {r} * hh.h2, {CMS_WIDTH}) AS INT)"
        for r in range(CMS_DEPTH)
    )
    return F.expr(
        f"transform(array({fold}), p -> "
        f"transform(array(named_struct("
        f"'h1', {mix_sql('p')}, 'h2', {mix_sql(f'(p ^ {CMS_H2_XOR})')})), "
        f"hh -> array({cells}))[0])[0]"
    )


def cms_build(terms: DataFrame, term_col: str = "term") -> DataFrame:
    """Sketch a token stream: returns (row, col, cnt) cells — at most
    CMS_DEPTH·CMS_WIDTH rows after ONE map-side-combined groupBy."""
    return (
        terms.select(F.posexplode(_cell_hashes(term_col)).alias("row", "col"))
        .groupBy("row", "col")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of sketches built with the same (d, w, salts) —
    the mergeability that lets per-batch sketches roll up."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, candidates: DataFrame, term_col: str = "term"
) -> DataFrame:
    """Point estimates for candidate terms: min over the d cells.
    The sketch broadcasts (≤ d·w rows); absent cells count 0 (a term
    the stream never touched estimates 0, not null)."""
    lookup = candidates.select(
        F.col(term_col).alias("term"),
        F.posexplode(_cell_hashes(term_col)).alias("row", "col"),
    )
    return (
        lookup.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_tf"))
    )
