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
#: per expected key per point of 2^-k target. The gate literal below
#: is bloom_m_for(22_700) — certified for eval suites up to ~22k
#: distinct shingles; a larger benchmark must re-derive m through the
#: helper AND regenerate the oracle constant with it (the
#: ivf_centroid_mod_for discipline: never scale by copying the
#: literal).
BLOOM_K = 4
BLOOM_M = 1 << 17


def bloom_m_for(n_keys: int, k: int = BLOOM_K) -> int:
    """Bits for a k-hash Bloom filter holding ``n_keys`` at the
    ~(1/2)^k false-positive operating point: m = n·k/ln2, rounded up
    to a power of two. Holding m FIXED as the key set grows pushes the
    filter past its operating point and the false-positive rate toward
    1 — over-flagging every training doc (false negatives stay
    impossible, but the filter stops discriminating)."""
    import math

    need = max(1, math.ceil(int(n_keys) * k / math.log(2.0)))
    return 1 << (need - 1).bit_length()


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


# ---------------------------------------------------------------------------
# Portable HyperLogLog (Flajolet et al. 2007) — engine-replayable
# distinct sketch: unlike approx_count_distinct (whose HLL++ registers
# are a JVM implementation detail), every register and the estimate
# derive from the repo's portable salted mixed hash, so a DuckDB
# oracle — or a sketch built by ANY other engine — reproduces them
# bit-for-bit. Mergeable: registers combine with max() per (group,
# bucket), the same contract as cms_merge/bloom_merge.
# ---------------------------------------------------------------------------

HLL_M = 256                    # registers (b = 8 bucket bits)
HLL_SENTINEL_BIT = 24          # caps rho at 25 (hash has 31 usable bits)
#: alpha_256 = 0.7213 / (1 + 1.079/256) as a fixed rational — part of
#: THIS sketch's spec (both engines replay the same constant).
HLL_ALPHA_NUM, HLL_ALPHA_DEN = 71827, 100000
HLL_S_SCALE = 30               # 2^-M_j terms scaled by 2^30 (exact)
HLL_LN2_NUM, HLL_LN2_DEN = 693147, 1000000


def _hll_salted_mix(salt: str, key_expr: str) -> str:
    """31-bit salted mixed hash of a key as ONE let-bound SQL expr
    (the hash_bucket discipline: the fold is computed once, the mixer
    references a lambda variable)."""
    from .constants import CHAR_SEED, MOD
    from .sampling import mix_sql

    fold = (
        f"aggregate(split(concat('{salt}', ':', cast({key_expr} as string)), ''), "
        f"CAST({CHAR_SEED} AS BIGINT), (a, c) -> (a * 31 + ascii(c)) % {MOD})"
    )
    return f"transform(array({fold}), p -> {mix_sql('p')})[0]"


def hll_rows(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(g, bkt, rho) per input row: bucket from one salted hash, rho =
    trailing-zero rank (lowest-set-bit position, 1-based) of a second
    independent salted hash with a sentinel bit capping it at
    HLL_SENTINEL_BIT + 1 — pure codegen integer ops (y & -y isolates
    the lowest bit; length(bin(·)) is its 1-based position)."""
    sb = 1 << HLL_SENTINEL_BIT
    rho = (
        f"transform(transform(array({_hll_salted_mix('hllr', key_col)}), "
        f"p -> p | {sb}), h -> length(bin(h & -h)))[0]"
    )
    return df.select(
        F.col(group_col).alias("g"),
        F.expr(f"pmod({_hll_salted_mix('hllb', key_col)}, {HLL_M})").alias("bkt"),
        F.expr(rho).cast("long").alias("rho"),
    )


def hll_estimate(rows: DataFrame) -> DataFrame:
    """(g, hll_est) from (g, bkt, rho) rows: max-rho registers, the
    2^30-scaled harmonic sum over all HLL_M registers (absent
    registers contribute 2^30 exactly), the alpha·m²/S raw estimate
    staged DECIMAL(38,0), and Flajolet's small-range correction
    switched EXACTLY: when raw ≤ 5m/2 and V > 0 empty registers,
    est = m·ln(m/V) computed as m·(ilog2_q(m) − ilog2_q(V))·ln2 with
    the exact integer log2 and a fixed rational ln2 — no float
    anywhere, so the estimate (not just its error bound) replays
    cross-engine."""
    from .selection import DSIR_Q, ilog2_q, ilog2_q_expr

    dec = "decimal(38,0)"
    m, sc = HLL_M, HLL_S_SCALE
    il_m = ilog2_q(m)
    regs = rows.groupBy("g", "bkt").agg(F.max("rho").alias("mj"))
    per_g = regs.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.sum(F.expr(f"shiftleft(1L, {sc} - CAST(mj AS INT))"))
        .cast("long").alias("s_present"),
    )
    return per_g.select(
        "g",
        F.expr(
            f"CAST(CASE WHEN "
            # raw ≤ 5m/2 AND V > 0 → linear counting
            f"(CAST({HLL_ALPHA_NUM * m * m} AS {dec}) * {1 << sc}) div "
            f"(CAST({HLL_ALPHA_DEN} AS {dec}) * "
            f"(s_present + ({m} - n_present) * CAST({1 << sc} AS BIGINT))) "
            f"<= {5 * m // 2} AND n_present < {m} THEN "
            f"({m} * ({il_m} - {ilog2_q_expr(f'greatest({m} - n_present, 1)')}) "
            f"* {HLL_LN2_NUM}) div (CAST({1 << DSIR_Q} AS BIGINT) * {HLL_LN2_DEN}) "
            f"ELSE (CAST({HLL_ALPHA_NUM * m * m} AS {dec}) * {1 << sc}) div "
            f"(CAST({HLL_ALPHA_DEN} AS {dec}) * "
            f"(s_present + ({m} - n_present) * CAST({1 << sc} AS BIGINT))) "
            f"END AS BIGINT)"
        ).alias("hll_est"),
    )


def hll_distinct(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Self-certifying per-group distinct estimate: (group, exact
    n_distinct, hll_est, err_bp, within_3sigma) — the a13 contract
    with a fully portable sketch. 3σ for m=256 is 3·1.04/√256 ≈
    19.5% → 1950 bp.

    Round 12 (guide §1.2/§2.3): the exact count and the sketch both
    derive from ONE persisted distinct-(g, k) frame — before, the
    input was scanned twice (countDistinct expansion + the sketch's
    row pass). Equivalence: rho/bkt are functions of k, so register
    maxima over distinct keys equal maxima over all rows, and
    count(k) over the distinct frame is countDistinct (both skip
    NULL keys; a NULL-key row forms its own (g, NULL) distinct row,
    feeding the sketch exactly as its source rows did)."""
    from ..cacheutil import persist_replannable

    d = persist_replannable(
        "sketch.hll_distinct",
        df.select(
            F.col(group_col).alias("g"), F.col(key_col).alias("k")
        ).distinct(),
    )
    est = hll_estimate(hll_rows(d, "g", "k"))
    exact = d.groupBy("g").agg(F.count("k").cast("long").alias("n_exact"))
    return exact.join(est, "g").select(
        F.col("g").alias(group_col),
        "n_exact",
        "hll_est",
        F.expr(
            "CAST((abs(hll_est - n_exact) * 10000) div greatest(n_exact, 1) "
            "AS BIGINT)"
        ).alias("err_bp"),
        F.expr(
            "(abs(hll_est - n_exact) * 10000) div greatest(n_exact, 1) <= 1950"
        ).alias("within_3sigma"),
    )
