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


def km_cells(key_col: str, depth: int, width: int) -> F.Column:
    """``depth`` hash cells in [0, width) from ONE char-level fold.

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
    per-key cost must be a handful of integer ops, not 8-64 string
    folds.
    """
    fold = (
        f"aggregate(split({key_col}, ''), CAST({CHAR_SEED} AS BIGINT), "
        f"(a, c) -> (a * 31 + ascii(c)) % {MOD})"
    )
    cells = ", ".join(
        f"CAST(pmod(hh.h1 + {r} * hh.h2, {width}) AS INT)" for r in range(depth)
    )
    return F.expr(
        f"transform(array({fold}), p -> "
        f"transform(array(named_struct("
        f"'h1', {mix_sql('p')}, 'h2', {mix_sql(f'(p ^ {CMS_H2_XOR})')})), "
        f"hh -> array({cells}))[0])[0]"
    )


def _cell_hashes(term_col: str) -> F.Column:
    return km_cells(term_col, CMS_DEPTH, CMS_WIDTH)


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


# -------------------------------------------------------------- #
# Bloom filter: the MEMBERSHIP sibling of the count sketch — used
# where exact broadcast sets outgrow executor memory (e.g. the
# decontamination shingle set of a very large benchmark suite).
# -------------------------------------------------------------- #

#: bloom geometry: k hashes over m bits. At n = m·ln2/k keys the
#: false-positive rate is ~(1/2)^k ≈ 6% (k=4); size m to ~2.9 bits
#: per expected key per point of 2^-k target.
BLOOM_K = 4
BLOOM_M = 1 << 17


def bloom_build(
    keys: DataFrame, key_col: str, k: int = BLOOM_K, m: int = BLOOM_M
) -> DataFrame:
    """Build a Bloom filter as a DataFrame of SET BIT positions —
    at most min(k·|keys|, m) rows after one distinct. Representing
    the bitset relationally keeps it engine-portable (the DuckDB
    oracle replays it row for row), mergeable (union+distinct ORs
    two filters), and broadcastable (≤ m rows ≈ a few MB)."""
    return (
        keys.select(F.posexplode(km_cells(key_col, k, m)).alias("_r", "pos"))
        .select("pos")
        .distinct()
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Bitwise OR of filters with the same (k, m): union + distinct."""
    if not blooms:
        raise ValueError("bloom_merge needs at least one filter")
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.distinct()


def bloom_hits(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """Per-row membership test: a key "might be present" iff ALL k of
    its bit positions are set. Adds ``might_contain`` (boolean; false
    negatives impossible, false-positive rate set by the geometry).

    Scale shape: probing runs over DISTINCT keys (repeats get their
    verdict by the join-back), the bloom broadcasts, and the probe is
    explode(k cells) → broadcast join → key-keyed count.

    NULL keys get ``might_contain = false`` (not silently dropped):
    km_cells(NULL) emits no probe rows, and NULL is definitionally
    absent from the filter (bloom_build sets no bits for it)."""
    keys = df.select(F.col(key_col).alias("_key")).distinct()
    probes = keys.select(
        "_key", F.posexplode(km_cells("_key", k, m)).alias("_r", "pos")
    )
    hits = (
        probes.join(F.broadcast(bloom.withColumn("_set", F.lit(1))), "pos", "left")
        .groupBy("_key")
        .agg((F.count(F.col("_set")) == k).alias("might_contain"))
    )
    return (
        df.join(hits, df[key_col].eqNullSafe(hits["_key"]), "left")
        .drop("_key")
        .withColumn("might_contain", F.coalesce("might_contain", F.lit(False)))
    )
