"""Training-data pipeline queries: dedup, similarity search, text
analysis — over the ``documents`` and ``embeddings`` tables.

Every oracle below is *generated from the same constants module* as
the Spark builder (`omfietser_etl_spark.textops.constants`), so both
engines compute identical integers (polynomial char hash, affine
MinHash maps, SimHash bits) and bit-identical doubles (left-fold dot
products). The LSH oracle replicates the banding pipeline itself —
not an all-pairs shortcut — so LSH false negatives match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from omfietser_etl_spark.session import load
from omfietser_etl_spark.textops import dedup as dd
from omfietser_etl_spark.textops import similarity as sim
from omfietser_etl_spark.textops.analysis import (
    bpe_ish_token_count,
    lang_id,
    norm_text,
    poly_hash,
    tokens,
    ws_token_count,
)
from omfietser_etl_spark.textops.constants import (
    BANDS,
    CHAR_SEED,
    JACCARD_THRESHOLD,
    LANG_STOPWORDS,
    MINHASH_A,
    MINHASH_B,
    MOD,
    ROWS,
    SHINGLE_N,
    SIMHASH_A,
    SIMHASH_B,
    SIMHASH_BITS,
    SIMHASH_SPACE,
)

from . import QuerySpec

# ---------------------------------------------------------------- #
# DuckDB SQL fragments mirroring textops.analysis (generated from
# the same constants; list_reduce == Spark aggregate: left folds).
# ---------------------------------------------------------------- #

DK_NORM = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)
DK_TOKENS = "list_filter(string_split(" + DK_NORM + ", ' '), x -> x <> '')"


def dk_shingles(t: str, n: int = SHINGLE_N) -> str:
    return (
        f"CASE WHEN len({t}) >= {n} THEN "
        f"list_distinct([array_to_string({t}[i:i+{n - 1}], ' ') "
        f"for i in range(1, len({t}) - {n - 2})]) "
        f"ELSE [] END"
    )


def dk_poly(s: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST({CHAR_SEED} AS BIGINT), "
        f"list_transform(string_split_regex({s}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(a, b) -> (a * 31 + b) % {MOD})"
    )


def dk_mix31(x: str) -> str:
    """DuckDB twin of sampling.mix31 (same xor-shift-multiply rounds)."""
    from omfietser_etl_spark.textops import sampling as _sp

    for shift, c in zip(_sp.MIX_SHIFTS, (_sp.MIX_C1, _sp.MIX_C2)):
        x = f"(xor({x}, ({x}) >> {shift}) * {c}) % {_sp.M31}"
    return f"xor({x}, ({x}) >> 16)"


def dk_bucket_expr(salt_sql: str, id_expr: str) -> str:
    """DuckDB twin of sampling.hash_bucket where the salt is an
    arbitrary SQL expression (e.g. a per-row sketch row index)."""
    from omfietser_etl_spark.textops import sampling as _sp

    poly = dk_poly(f"({salt_sql}) || ':' || CAST({id_expr} AS VARCHAR)")
    return f"({dk_mix31(poly)}) % {_sp.BUCKETS}"


def dk_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, len({a}) + 1), "
        f"k -> {a}[k]::DOUBLE * {b}[k]::DOUBLE)), (x, y) -> x + y)"
    )


_DOCS_CTE = (
    "WITH d AS (SELECT doc_id AS doc, "
    + DK_TOKENS.format(c="text")
    + " AS t FROM documents), "
    "sh AS (SELECT doc, unnest(" + dk_shingles("t") + ") AS s FROM d)"
)

_JACCARD_TAIL = f"""
, sz AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc)
, inter AS (SELECT x.doc_lo, x.doc_hi, count(*) AS n_inter
    FROM cand x
    JOIN sh a ON a.doc = x.doc_lo
    JOIN sh b ON b.doc = x.doc_hi AND b.s = a.s
    GROUP BY 1, 2)
SELECT i.doc_lo, i.doc_hi,
       round(i.n_inter / (za.n_sh + zb.n_sh - i.n_inter), 4) AS jaccard
FROM inter i
JOIN sz za ON za.doc = i.doc_lo
JOIN sz zb ON zb.doc = i.doc_hi
WHERE round(i.n_inter / (za.n_sh + zb.n_sh - i.n_inter), 4) >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------- #
# td1 — exact dedup stats (DD2 generalized)
# ---------------------------------------------------------------- #

def td1_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-dup profile per source: one hash-agg shuffle on the
    normalized-text key (dedupe.ts:100-124 normalized-title key)."""
    docs = load(spark, sf, "documents")
    keyed = docs.select("source", norm_text("text").alias("k"))
    return keyed.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("k").alias("n_distinct"),
        (F.count("*") - F.countDistinct("k")).alias("n_dup"),
    )


TD1_ORACLE = (
    "SELECT source, count(*) AS n_docs, count(DISTINCT k) AS n_distinct, "
    "count(*) - count(DISTINCT k) AS n_dup FROM (SELECT source, "
    + DK_NORM.format(c="text")
    + " AS k FROM documents) GROUP BY source"
)


# ---------------------------------------------------------------- #
# td2 — n-gram Jaccard near-dup pairs (blocking join on shingle)
# ---------------------------------------------------------------- #

def td2_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return dd.jaccard_pairs(load(spark, sf, "documents"), "doc_id", "text")


TD2_ORACLE = (
    _DOCS_CTE
    + ", cand AS (SELECT a.doc AS doc_lo, b.doc AS doc_hi FROM sh a "
    "JOIN sh b ON a.s = b.s AND a.doc < b.doc GROUP BY 1, 2)"
    + _JACCARD_TAIL
)


def td2h_ngram_jaccard_hashed(spark: SparkSession, sf: str) -> DataFrame:
    """td2's 100 TB twin: the SAME query through the 8-byte
    ``hash_shingles=True`` shuffle path (xxhash64 shingle keys,
    textops/dedup.py doc_shingles) — ~5-10× less shuffle bytes than
    string shingles. The output (doc pairs + Jaccard) is identical to
    the string path modulo 64-bit collisions, so the string-shingle
    DuckDB oracle gates it end-to-end: a green row proves the hashed
    shuffle path produces the exact same answer, not just that the
    unit equivalence holds (round-4 verdict item: gate the scale
    path)."""
    return dd.jaccard_pairs(
        load(spark, sf, "documents"), "doc_id", "text", hash_shingles=True
    )


# ---------------------------------------------------------------- #
# td28 — asymmetric shingle containment (onion/quote direction):
# |A∩B| / |A|, the metric that catches a snippet embedded in a long
# page where Jaccard stays tiny (union dominated by the page).
# ---------------------------------------------------------------- #

def td28_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Through the 8-byte hashed-shingle shuffle path (the 100 TB
    configuration, td2h's contract): the string-shingle oracle gating
    it end-to-end proves the hashed candidate join + exact integer
    argmax produce the identical containment report."""
    return dd.containment_flags(
        load(spark, sf, "documents"), "doc_id", "text", hash_shingles=True
    )


TD28_ORACLE = (
    _DOCS_CTE
    + f"""
, c_sz AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc)
, c_inter AS (SELECT a.doc AS doc, b.doc AS other, count(*) AS n_inter
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc <> b.doc
    GROUP BY 1, 2)
, c_best AS (SELECT doc, other, n_inter,
    row_number() OVER (PARTITION BY doc
                       ORDER BY n_inter DESC, other ASC) AS rn
    FROM c_inter)
SELECT b.doc, b.other AS contained_in,
       round(b.n_inter / z.n_sh, 4) AS containment
FROM c_best b JOIN c_sz z USING (doc)
WHERE rn = 1 AND round(b.n_inter / z.n_sh, 4) >= {dd.CONTAINMENT_THRESHOLD}
"""
)


# ---------------------------------------------------------------- #
# td12 — Jaccard with the degenerate-shingle guard (document-
# frequency cap). The scale-correct variant of td2: shingles in more
# than max(3, ceil(1% of docs)) documents are boilerplate and would
# emit O(k²) candidates each, so they are dropped before the
# blocking self-join. At 100 TB this is what keeps the join
# sub-quadratic on stopword-heavy corpora.
# ---------------------------------------------------------------- #

_GUARD_FRAC = 0.01
_GUARD_MIN = 3


def td12_jaccard_guarded(spark: SparkSession, sf: str) -> DataFrame:
    """Guard + 8-byte hashed-shingle keys together — the configuration
    a 100 TB corpus would actually run (the hot-shingle DF guard works
    identically on hashed keys; output is representation-agnostic, so
    the string-shingle oracle still replays it bit-for-bit)."""
    return dd.jaccard_pairs(
        load(spark, sf, "documents"), "doc_id", "text",
        max_df_frac=_GUARD_FRAC, min_df_cap=_GUARD_MIN,
        hash_shingles=True,
    )


# Same shape as TD2 but sh is pre-filtered by the hot-shingle anti-
# join; sizes/intersections use the filtered shingle space (mirrors
# dedup.jaccard_pairs exactly).
TD12_ORACLE = (
    _DOCS_CTE.replace("sh AS (", "sh0 AS (")
    + f""", nd AS (SELECT count(DISTINCT doc) AS n_docs FROM sh0)
, hot AS (SELECT s FROM sh0 GROUP BY s
          HAVING count(*) > (SELECT greatest({_GUARD_MIN},
                             CAST(ceil({_GUARD_FRAC} * n_docs) AS BIGINT))
                             FROM nd))
, sh AS (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot))
, cand AS (SELECT a.doc AS doc_lo, b.doc AS doc_hi FROM sh a
           JOIN sh b ON a.s = b.s AND a.doc < b.doc GROUP BY 1, 2)"""
    + _JACCARD_TAIL
)


# ---------------------------------------------------------------- #
# td3 — MinHash + LSH banding, exact-Jaccard verified
# ---------------------------------------------------------------- #

def td3_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    return dd.minhash_lsh_pairs(load(spark, sf, "documents"), "doc_id", "text")


def _td3_ctes() -> str:
    """The MinHash-LSH oracle CTE chain through ``sig`` (per-doc
    signatures) and ``cand`` (banded candidate pairs) — shared by td3
    (exact-Jaccard verify) and td23 (signature-agreement estimate)."""
    mins = ", ".join(
        f"min(({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {MOD}) AS mh{i}"
        for i in range(len(MINHASH_A))
    )
    bands = " UNION ALL ".join(
        "SELECT doc, {b} AS band_id, concat_ws('_', {cols}) AS key FROM sig".format(
            b=b, cols=", ".join(f"mh{b * ROWS + r}" for r in range(ROWS))
        )
        for b in range(BANDS)
    )
    return (
        _DOCS_CTE
        + f", hh AS (SELECT doc, {dk_poly('s')} AS h FROM sh)"
        + f", sig AS (SELECT doc, {mins} FROM hh GROUP BY doc)"
        + f", bands AS ({bands})"
        + ", cand AS (SELECT DISTINCT a.doc AS doc_lo, b.doc AS doc_hi FROM bands a "
        "JOIN bands b ON a.band_id = b.band_id AND a.key = b.key AND a.doc < b.doc)"
    )


def _td3_oracle() -> str:
    return _td3_ctes() + _JACCARD_TAIL


# ---------------------------------------------------------------- #
# td23 — MinHash signature-agreement estimation: td3 without the
# exact-verify join back to shingle sets. At 100 TB the verify join
# is td3's dominant shuffle (O(doc length) bytes per doc); the
# estimate reads only the constant-width signature frame.
# ---------------------------------------------------------------- #


def td23_minhash_est_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup pairs by MinHash signature agreement
    (textops/dedup.py::minhash_estimate_pairs): Broder's estimator —
    P[min-hashes agree] = Jaccard — scored as the exact integer
    agreement count over the 16-hash signature, so the gate replays
    it bit-for-bit (no float estimate under the hash)."""
    return dd.minhash_estimate_pairs(
        load(spark, sf, "documents"), "doc_id", "text"
    )


def _td23_oracle() -> str:
    n = len(MINHASH_A)
    agree = " + ".join(
        f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(n)
    )
    return (
        _td3_ctes()
        + f""", est AS (SELECT c.doc_lo, c.doc_hi, CAST({agree} AS BIGINT) AS agree
       FROM cand c JOIN sig a ON a.doc = c.doc_lo
                   JOIN sig b ON b.doc = c.doc_hi)
SELECT doc_lo, doc_hi, agree FROM est WHERE agree >= {n // 2}"""
    )


# ---------------------------------------------------------------- #
# td19 — winnowing fingerprints (MOSS; Schleimer et al. 2003):
# position-robust LOCAL near-dup pairs. Fingerprint density ~2/(w+1)
# of the gram count → the blocking join shuffles (w+1)/2× fewer keys
# than shingle-Jaccard for the same corpus, with a guarantee that any
# shared run of ≥ w+k-1 tokens produces a shared fingerprint.
# ---------------------------------------------------------------- #

_WIN_THR = 0.5


def td19_winnowing_pairs(spark: SparkSession, sf: str) -> DataFrame:
    return dd.winnowing_pairs(
        load(spark, sf, "documents"), "doc_id", "text", _WIN_THR
    )


def _td19_oracle() -> str:
    k, w = dd.WINNOW_K, dd.WINNOW_W
    # two-level fold, identical to winnow_fingerprints: per-token poly
    # hash once, then fold the k token hashes per positional gram
    gram_fold = (
        f"list_reduce(list_prepend(CAST({CHAR_SEED} AS BIGINT), "
        f"th[i:i+{k - 1}]), (a, b) -> (a * 31 + b) % {MOD})"
    )
    return f"""
WITH d AS (SELECT doc_id AS doc, {DK_TOKENS.format(c="text")} AS t FROM documents),
dh AS (SELECT doc, list_transform(t, x -> {dk_poly('x')}) AS th FROM d),
h AS (SELECT doc,
  CASE WHEN len(th) >= {k} THEN
    [{gram_fold} for i in range(1, len(th) - {k - 2})]
  ELSE [] END AS hs FROM dh),
f0 AS (SELECT doc,
  CASE WHEN len(hs) >= {w} THEN
    list_distinct([list_aggregate(hs[j:j+{w - 1}], 'min')
                   for j in range(1, len(hs) - {w - 2})])
  WHEN len(hs) >= 1 THEN [list_aggregate(hs, 'min')]
  ELSE [] END AS fps FROM h),
fp AS (SELECT doc, unnest(fps) AS fp FROM f0),
sz AS (SELECT doc, count(*) AS n FROM fp GROUP BY doc),
inter AS (SELECT a.doc AS doc_lo, b.doc AS doc_hi, count(*) AS n_inter
          FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc < b.doc
          GROUP BY 1, 2)
SELECT i.doc_lo, i.doc_hi,
       round(i.n_inter / (za.n + zb.n - i.n_inter), 4) AS sim
FROM inter i
JOIN sz za ON za.doc = i.doc_lo
JOIN sz zb ON zb.doc = i.doc_hi
WHERE round(i.n_inter / (za.n + zb.n - i.n_inter), 4) >= {_WIN_THR}
"""


# ---------------------------------------------------------------- #
# ts15 — DSIR importance selection (Xie et al. 2023): keep the top
# fraction of the pool by hashed-n-gram importance weight toward a
# target slice (lang='en'). Every log is the exact integer ilog2_q
# (square-and-compare), so the oracle replays the ENTIRE model fit +
# scoring + selection bit-for-bit — no float logs anywhere.
# ---------------------------------------------------------------- #

_DSIR_FRAC = (1, 4)  # keep top ceil(N/4)


def ts15_dsir_select(spark: SparkSession, sf: str) -> DataFrame:
    from omfietser_etl_spark.textops.selection import dsir_select

    docs = load(spark, sf, "documents").withColumn("_t", F.col("lang") == "en")
    return dsir_select(docs, "doc_id", "text", "_t",
                       frac_num=_DSIR_FRAC[0], frac_den=_DSIR_FRAC[1])


def dk_ilog2_chain(src: str, q: int, f: int) -> str:
    """CTE chain computing il = floor(2^q·log2 x) for every row of
    ``src`` (a CTE with an integer column x ≥ 1) — the DuckDB twin of
    selection.ilog2_q, property-tested equal in tests/test_selection."""
    steps = [
        f"il0 AS (SELECT x, CAST(length(printf('%b', x)) - 1 AS BIGINT) AS p FROM {src})",
        f"il0b AS (SELECT x, p, CASE WHEN p >= {f} THEN CAST(x AS BIGINT) >> (p - {f}) "
        f"ELSE CAST(x AS BIGINT) << ({f} - p) END AS y, CAST(0 AS BIGINT) AS r FROM il0)",
    ]
    prev = "il0b"
    for i in range(q):
        steps.append(
            f"il{i + 1} AS (SELECT x, p, "
            f"CASE WHEN ((y*y) >> {f}) >= (CAST(1 AS BIGINT) << {f + 1}) "
            f"THEN ((y*y) >> {f}) >> 1 ELSE (y*y) >> {f} END AS y, "
            f"r*2 + CASE WHEN ((y*y) >> {f}) >= (CAST(1 AS BIGINT) << {f + 1}) "
            f"THEN 1 ELSE 0 END AS r FROM {prev})"
        )
        prev = f"il{i + 1}"
    steps.append(f"il AS (SELECT x, (p << {q}) + r AS il FROM {prev})")
    return ", ".join(steps)


def ts16_dsir_threshold(spark: SparkSession, sf: str) -> DataFrame:
    """The corpus-scale DSIR selection path (sketch-bracketed cutoff +
    exact boundary-band rank — selection.dsir_select_threshold): same
    selected SET as ts15 with no global rank over the pool. Gated
    under the same DuckDB model-fit replay; the oracle ranks (DuckDB
    runs at gate scale) but emits only the selected flag, which is
    exactly what the threshold path guarantees."""
    from omfietser_etl_spark.textops.selection import dsir_select_threshold

    docs = load(spark, sf, "documents").withColumn("_t", F.col("lang") == "en")
    return dsir_select_threshold(docs, "doc_id", "text", "_t",
                                 frac_num=_DSIR_FRAC[0], frac_den=_DSIR_FRAC[1])


def _ts15_oracle(with_rank: bool = True) -> str:
    from omfietser_etl_spark.textops.selection import DSIR_DIM, DSIR_F, DSIR_Q

    dim, q, f = DSIR_DIM, DSIR_Q, DSIR_F
    num, den = _DSIR_FRAC
    rk_col = "rk," if with_rank else ""
    return f"""
WITH d AS (SELECT doc_id AS doc, lang = 'en' AS is_t,
                  {DK_TOKENS.format(c="text")} AS t FROM documents),
dh AS (SELECT doc, list_transform(t, x -> {dk_poly('x')}) AS th FROM d),
g AS (SELECT doc, unnest(list_concat(th,
        CASE WHEN len(th) >= 2 THEN
          [(th[i] * 31 + th[i + 1]) % {MOD} for i in range(1, len(th))]
        ELSE [] END)) AS h FROM dh),
cnt AS (SELECT doc, h % {dim} AS b, count(*) AS c
        FROM g GROUP BY 1, 2),
bk AS (SELECT b,
         SUM(CASE WHEN d.is_t THEN c ELSE 0 END) AS ct,
         SUM(c) AS cr
       FROM cnt JOIN d USING (doc) GROUP BY b),
tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS t_tot,
               CAST(SUM(cr) AS BIGINT) AS r_tot FROM bk),
vals AS (SELECT DISTINCT CAST(ct + 1 AS BIGINT) AS x FROM bk
         UNION SELECT DISTINCT CAST(cr + 1 AS BIGINT) FROM bk
         UNION SELECT t_tot + {dim} FROM tot
         UNION SELECT r_tot + {dim} FROM tot),
{dk_ilog2_chain('vals', q, f)},
lam AS (SELECT bk.b, it.il - ir.il AS lam
        FROM bk JOIN il it ON it.x = bk.ct + 1
                JOIN il ir ON ir.x = bk.cr + 1),
kc AS (SELECT ir.il - it.il AS k_const
       FROM tot JOIN il it ON it.x = tot.t_tot + {dim}
                JOIN il ir ON ir.x = tot.r_tot + {dim}),
contrib AS (SELECT cnt.doc, SUM(cnt.c * lam.lam) AS dsum,
                   CAST(SUM(cnt.c) AS BIGINT) AS n_grams
            FROM cnt JOIN lam USING (b) GROUP BY 1),
scored AS (SELECT d.doc,
                  COALESCE(ct.n_grams, 0) AS n_grams,
                  CAST(COALESCE(ct.dsum, 0)
                       + COALESCE(ct.n_grams, 0) * (SELECT k_const FROM kc)
                       AS BIGINT) AS score_q
           FROM d LEFT JOIN contrib ct ON ct.doc = d.doc),
ranked AS (SELECT doc, n_grams, score_q,
                  CAST(row_number() OVER (ORDER BY score_q DESC, doc ASC)
                       AS BIGINT) AS rk
           FROM scored),
n AS (SELECT count(*) AS n FROM d)
SELECT doc, n_grams, score_q, {rk_col}
       rk <= (SELECT (n * {num} + {den - 1}) // {den} FROM n) AS selected
FROM ranked
"""


# ---------------------------------------------------------------- #
# td17 — incremental dedup: new batch vs corpus signature state
# ---------------------------------------------------------------- #

TD17_MOD = 3  # doc_id % 3 == 0 → the arriving batch; else corpus state


def td17_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Production-shaped dedup: a new batch checked against the
    stored MinHash signature table of the existing corpus — per-batch
    cost O(batch + collisions), never O(corpus); old×old pairs are
    excluded by construction. Pairs carry the integer signature-
    agreement Jaccard estimate, so no old raw text is ever read."""
    docs = load(spark, sf, "documents")
    new = docs.filter(F.col("doc_id") % TD17_MOD == 0)
    state = docs.filter(F.col("doc_id") % TD17_MOD != 0)
    state_sigs = dd.minhash_signatures(state, "doc_id", "text")
    return dd.incremental_lsh_pairs(new, state_sigs, "doc_id", "text")


def _td17_oracle() -> str:
    n_hashes = len(MINHASH_A)
    mins = ", ".join(
        f"min(({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {MOD}) AS mh{i}"
        for i in range(n_hashes)
    )
    bands = " UNION ALL ".join(
        "SELECT doc, src, {b} AS band_id, concat_ws('_', {cols}) AS key FROM tagged".format(
            b=b, cols=", ".join(f"mh{b * ROWS + r}" for r in range(ROWS))
        )
        for b in range(BANDS)
    )
    matches = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)"
        for i in range(n_hashes)
    )
    return (
        _DOCS_CTE
        + f", hh AS (SELECT doc, {dk_poly('s')} AS h FROM sh)"
        + f", sig AS (SELECT doc, {mins} FROM hh GROUP BY doc)"
        + f", tagged AS (SELECT *, CASE WHEN doc % {TD17_MOD} = 0 THEN 'new'"
        " ELSE 'old' END AS src FROM sig)"
        + f", bands AS ({bands})"
        + ", cand AS (SELECT DISTINCT a.doc AS doc_lo, b.doc AS doc_hi,"
        " CASE WHEN a.src = 'new' AND b.src = 'new' THEN 'new-new'"
        " ELSE 'new-old' END AS pair_origin"
        " FROM bands a JOIN bands b ON a.band_id = b.band_id"
        " AND a.key = b.key AND a.doc < b.doc"
        " AND NOT (a.src = 'old' AND b.src = 'old'))"
        + f" SELECT doc_lo, doc_hi, pair_origin,"
        f" CAST((10000 * ({matches})) // {n_hashes} AS BIGINT) AS est_bp"
        " FROM cand JOIN tagged sa ON sa.doc = cand.doc_lo"
        " JOIN tagged sb ON sb.doc = cand.doc_hi"
    )


# ---------------------------------------------------------------- #
# td4 — SimHash fingerprints
# ---------------------------------------------------------------- #

def td4_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return dd.simhash(load(spark, sf, "documents"), "doc_id", "text")


def _td4_oracle() -> str:
    votes = ", ".join(
        f"sum(CASE WHEN (h32 >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(SIMHASH_BITS)
    )
    recombine = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return (
        "WITH d AS (SELECT doc_id AS doc, "
        + DK_TOKENS.format(c="text")
        + " AS t FROM documents)"
        ", tk AS (SELECT doc, unnest(list_distinct(t)) AS tok FROM d)"
        f", hh AS (SELECT doc, {dk_poly('tok')} AS h FROM tk)"
        f", h3 AS (SELECT doc, ({SIMHASH_A} * h + {SIMHASH_B}) % {SIMHASH_SPACE} AS h32 FROM hh)"
        f", v AS (SELECT doc, {votes} FROM h3 GROUP BY doc) "
        f"SELECT doc, {recombine} AS simhash FROM v"
    )


# ---------------------------------------------------------------- #
# td5/td6/td7 — embedding similarity
# ---------------------------------------------------------------- #

NEARDUP_TAU = 0.45
ANN_K = 5
ANN_QUERY_BOUND = 10  # vec_id < bound → query set
#: Gate certification scale for the embeddings table (sf0.01 = 500
#: vectors). Every embedding-family key-space constant below derives
#: from it through the measured sizing rules, so a lifted spec can't
#: silently saturate: re-evaluate the helper at the new N instead of
#: copying the literal (SCALING.md round-6, td21 12.3× wall).
EMB_GATE_N = 500
#: vec_id % mod == 0 → codebook member. √N geometry via the sizing
#: helper the round-6 stress certified (C ≈ √N, faiss nlist rule) —
#: evaluated at the gate N so the oracle literal and the Spark build
#: can never diverge.
IVF_CENTROID_MOD = sim.ivf_centroid_mod_for(EMB_GATE_N)
assert IVF_CENTROID_MOD == 22, "gate codebook rule is certified at 22"
IVF_PROBES = 2


def td5_embed_neardup(spark: SparkSession, sf: str) -> DataFrame:
    return sim.cosine_neardup_pairs(
        load(spark, sf, "embeddings"), "vec_id", "embedding", NEARDUP_TAU
    )


TD5_ORACLE = f"""
SELECT a.vec_id AS id_lo, b.vec_id AS id_hi,
       round({dk_dot('a.embedding', 'b.embedding')}, 4) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round({dk_dot('a.embedding', 'b.embedding')}, 4) >= {NEARDUP_TAU}
"""


#: td26 — semantic decontamination: per-training-doc BEST-matching
#: eval doc above τ. vec_id % 7 slices the eval set (the td25
#: convention); τ = 0.40. The output is the TOP-1 per doc, never the
#: full pair set: a raw ≥ τ pair dump below the dim-64 noise floor
#: (6/√64 = 0.75) grows ∝ |corpus|·|eval| in NOISE pairs (the round-7
#: stress measured 107× output at 10× data for the pair form —
#: random cosines clear 3.2σ with p ≈ 7e-4), while the per-doc argmax
#: is ≤ |corpus| rows by construction at any τ. Flagging a doc only
#: says "inspect against THIS eval doc", which is the actual
#: decontam workflow.
TD26_MOD = 7
TD26_TAU = 0.40


def td26_semantic_decontam(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-space eval-leak check (textops/similarity.py::
    bipartite_cosine_pairs + per-doc argmax): for every training vec
    whose best benchmark cosine ≥ τ, the best-matching eval doc and
    that similarity — the dense complement of td25's shingle Jaccard
    (a paraphrase sharing few shingles still lands next to its eval
    source in embedding space; the phi-4-style semantic decontam
    pass). Benchmark matrix collected once (bounded: eval suites are
    small by contract) and shipped by value in the mapInPandas
    closure; the training side is a ZERO-shuffle map-side scan, and
    the argmax is one doc-keyed partial agg — output ≤ |corpus| rows
    at any τ (see the noise note above). Ties at the max (rounded)
    sim break to the SMALLEST bench id via the (sim, −bench) struct
    max, replayed two-step in the oracle (the LPA discipline)."""
    from omfietser_etl_spark.textops.similarity import bipartite_cosine_pairs

    emb = load(spark, sf, "embeddings")
    # on_subnoise='warn': τ=0.40 is ABOVE the gate-scale floor
    # (bipartite_tau_floor(64, 71) ≈ 0.37) but a grown eval slice
    # raises the floor past it — the helper is what a lifted spec
    # must re-evaluate (the rh_params_for discipline).
    pairs = bipartite_cosine_pairs(
        emb.filter(F.col("vec_id") % TD26_MOD != 0),
        emb.filter(F.col("vec_id") % TD26_MOD == 0),
        "vec_id",
        "embedding",
        TD26_TAU,
        on_subnoise="warn",
    )
    return (
        pairs.groupBy("doc")
        .agg(F.max(F.struct(F.col("sim"), (-F.col("bench")).alias("nb"))).alias("m"))
        .select("doc", (-F.col("m.nb")).cast("long").alias("bench"),
                F.col("m.sim").alias("sim"))
    )


TD26_ORACLE = f"""
WITH p AS (
  SELECT a.vec_id AS doc, b.vec_id AS bench,
         round({dk_dot('a.embedding', 'b.embedding')}, 4) AS sim
  FROM embeddings a JOIN embeddings b
    ON a.vec_id % {TD26_MOD} <> 0 AND b.vec_id % {TD26_MOD} = 0
  WHERE round({dk_dot('a.embedding', 'b.embedding')}, 4) >= {TD26_TAU}
), m AS (SELECT doc, max(sim) AS ms FROM p GROUP BY doc)
SELECT p.doc, CAST(min(p.bench) AS BIGINT) AS bench, m.ms AS sim
FROM p JOIN m ON p.doc = m.doc AND p.sim = m.ms
GROUP BY p.doc, m.ms
"""


#: td27 — the LARGE-eval-suite fallback for td26: td26's dense scan is
#: |corpus|·|eval|·d flops by construction (fine at eval suites of
#: 10³–10⁴; the wall at 10⁵+), so probes route through the td7 IVF
#: machinery instead — centroids sized ≈ √|eval| over the BENCHMARK
#: (the ivf_centroid_mod_for rule applied to the eval count, NOT the
#: corpus count: the cell geometry partitions the bench side).
#: Gate eval slice = 72 ids (multiples of 7 in 0..499), isqrt(72) = 8
#: → every 8th bench id is a centroid: vec_id % (7·8) == 0.
TD26_EVAL_GATE_N = 72
TD27_CENT_MOD = TD26_MOD * sim.ivf_centroid_mod_for(TD26_EVAL_GATE_N)
assert TD27_CENT_MOD == 56, "gate bench-codebook rule is certified at 56"


def td27_semantic_decontam_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-routed semantic decontamination (textops/similarity.py::
    bipartite_cosine_pairs_ivf): td26's check for benchmarks too large
    to dense-scan — benchmark vectors are assigned to ≈√|eval|
    centroid cells, each training doc probes its n_probe nearest cells
    and computes exact dots only there, cutting per-doc flops from
    |eval|·d to (C + n_probe·|eval|/C)·d. Recall < 1 by design (td7's
    contract); the oracle replays the identical assignment + probe
    set, so parity is exact. Still a ZERO-shuffle corpus scan: cells,
    codebook, and routing ship by value in the mapInPandas closure.
    Output is the ≥ τ pair set within probed cells — bounded per doc
    by the probed cells' bench rows, the structural analogue of td26's
    argmax bound."""
    from omfietser_etl_spark.textops.similarity import bipartite_cosine_pairs_ivf

    emb = load(spark, sf, "embeddings")
    # on_subnoise='warn', not 'raise': τ=0.40 clears the gate-scale
    # floor (bipartite_tau_floor(64, 72) ≈ 0.37) but the sf0.1 eval
    # slice (286 ids) raises the floor to ≈ 0.42 — the sweep must
    # still run there, with the signal fired (td26's discipline).
    return bipartite_cosine_pairs_ivf(
        emb.filter(F.col("vec_id") % TD26_MOD != 0),
        emb.filter(F.col("vec_id") % TD26_MOD == 0),
        emb.filter(F.col("vec_id") % TD27_CENT_MOD == 0),
        "vec_id",
        "embedding",
        TD26_TAU,
        n_probe=IVF_PROBES,
        on_subnoise="warn",
    )


TD27_ORACLE = f"""
WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
           WHERE vec_id % {TD27_CENT_MOD} = 0),
b AS (SELECT vec_id AS bid, embedding AS bv FROM embeddings
      WHERE vec_id % {TD26_MOD} = 0),
asg AS (SELECT bid, bv, cid FROM (
    SELECT b.bid, b.bv, c.cid,
           row_number() OVER (PARTITION BY b.bid
               ORDER BY {dk_dot('b.bv', 'c.cv')} DESC, c.cid ASC) AS r
    FROM b CROSS JOIN c) WHERE r = 1),
t AS (SELECT vec_id AS doc, embedding AS tv FROM embeddings
      WHERE vec_id % {TD26_MOD} <> 0),
probes AS (SELECT doc, tv, cid FROM (
    SELECT t.doc, t.tv, c.cid,
           row_number() OVER (PARTITION BY t.doc
               ORDER BY {dk_dot('t.tv', 'c.cv')} DESC, c.cid ASC) AS pr
    FROM t CROSS JOIN c) WHERE pr <= {IVF_PROBES})
SELECT p.doc, a.bid AS bench, round({dk_dot('p.tv', 'a.bv')}, 4) AS sim
FROM probes p JOIN asg a ON a.cid = p.cid
WHERE round({dk_dot('p.tv', 'a.bv')}, 4) >= {TD26_TAU}
"""


EMB_DIM = 64  # embeddings table vector dimension (TESTDATA.md)


def td16_rh_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Random-hyperplane LSH cosine near-dup (textops/similarity.py):
    the sub-quadratic candidate path complementing td5's exact
    block-pair baseline. Signatures are map-side literal-coefficient
    folds; the candidate shuffle is (band, key) — 16 bytes per vector
    per band regardless of dim; verification is exact, so the output
    is the recall<1 SUBSET of td5's pairs, replayed identically by
    the oracle (same ±1 matrix inlined as literals)."""
    # Gate scale: NEARDUP_TAU=0.45 sits below the dim-64 noise floor
    # (0.75 ≈ sqrt(2·ln N / dim) at corpus N) — a DELIBERATE
    # small-corpus choice: at ≤2k vectors random-pair cosines
    # concentrate near 0, so 0.45 still separates signal; at corpus
    # scale the same tau drowns in noise matches and the guard
    # (default 'raise') exists precisely to stop that. 'off' here
    # because the contract path must not trip its own alarm on every
    # gate run (round-9 verdict); production sizing: bands, rows =
    # sim.rh_params_for(corpus_n) and tau ≥ the floor.
    return sim.rh_neardup_pairs(
        load(spark, sf, "embeddings"), "vec_id", "embedding", NEARDUP_TAU,
        EMB_DIM, on_subnoise="off",
    )


def _td16_oracle() -> str:
    coeffs = sim.rh_coefficients(EMB_DIM)
    # coefficient arrays hoisted into a one-row CTE: DuckDB would
    # otherwise re-build each 64-element list literal per element
    # access inside the fold (O(dim²) per plane per row — a 10s vs
    # 0.5s difference at sf0.01)
    coef_cols = ", ".join(
        "[" + ", ".join(f"{c:.1f}" for c in coeffs[p]) + f"] AS c{p}"
        for p in range(sim.RH_PLANES)
    )

    def proj(p: int, v: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0, list_transform(range(1, {EMB_DIM} + 1), "
            f"k -> {v}[k]::DOUBLE * c{p}[k])), (x, y) -> x + y)"
        )

    def band_key(b: int, v: str) -> str:
        parts = " + ".join(
            f"(CASE WHEN {proj(b * sim.RH_ROWS + r, v)} >= 0.0 THEN 1 ELSE 0 END) * {1 << r}"
            for r in range(sim.RH_ROWS)
        )
        return f"({parts})"

    bands = ", ".join(
        f"struct_pack(band := {b}, key := {band_key(b, 'embedding')})"
        for b in range(sim.RH_BANDS)
    )
    return f"""
WITH coef AS (SELECT {coef_cols}),
sig0 AS (SELECT vec_id, unnest([{bands}]) AS s FROM embeddings CROSS JOIN coef),
sig AS (SELECT vec_id, s.band AS band, s.key AS key FROM sig0),
cand AS (SELECT DISTINCT a.vec_id AS id_lo, b.vec_id AS id_hi
         FROM sig a JOIN sig b
           ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
v AS (SELECT id_lo, id_hi,
             round({dk_dot('ea.embedding', 'eb.embedding')}, 4) AS sim
      FROM cand
      JOIN embeddings ea ON ea.vec_id = cand.id_lo
      JOIN embeddings eb ON eb.vec_id = cand.id_hi)
SELECT id_lo, id_hi, sim FROM v WHERE sim >= {NEARDUP_TAU}
"""


def td6_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return sim.brute_topk(
        emb, emb.filter(F.col("vec_id") < ANN_QUERY_BOUND), "vec_id", "embedding", ANN_K
    )


TD6_ORACLE = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {ANN_QUERY_BOUND}),
s AS (SELECT qid, vec_id AS nid, {dk_dot('qv', 'embedding')} AS dot
      FROM q JOIN embeddings ON qid <> vec_id),
r AS (SELECT qid, nid, dot,
      row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid ASC) AS rank FROM s)
SELECT qid, rank, nid, round(dot, 6) AS sim FROM r WHERE rank <= {ANN_K}
"""


X10_QUERY_BOUND = 50


def x10_knn_label_eval(spark: SparkSession, sf: str) -> DataFrame:
    """kNN majority-vote classifier eval over the embeddings table:
    for each held-out query vector, the exact top-k cosine neighbors
    (td6's gated brute_topk — broadcast query side, bit-stable dot,
    id tiebreaks) vote with their labels; majority with a
    (votes desc, label asc) tiebreak; emit prediction vs true label
    per query. The standard embedding-quality probe run before
    trusting vectors for dedup/selection (SemDeDup-style pipelines).

    Scale shape: the corpus is scanned once map-side against the
    broadcast queries; votes/argmax run on the q×k frame. Oracle
    replays ranking, votes, and tiebreak bit-for-bit."""
    from omfietser_etl_spark.textops import similarity as sim

    emb = load(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < X10_QUERY_BOUND)
    nn = sim.brute_topk(emb, q, "vec_id", "embedding", ANN_K)
    lab = emb.select(F.col("vec_id").alias("nid"), F.col("label").alias("n_label"))
    votes = nn.join(lab, "nid").groupBy("qid", "n_label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    pred = (
        votes.groupBy("qid")
        .agg(
            F.max(
                F.struct(F.col("votes"), (-F.col("n_label")).alias("nl"))
            ).alias("m")
        )
        .select(
            "qid",
            (-F.col("m.nl")).cast("long").alias("pred_label"),
            F.col("m.votes").cast("long").alias("votes"),
        )
    )
    truth = emb.select(
        F.col("vec_id").alias("qid"), F.col("label").alias("true_label")
    )
    return pred.join(truth, "qid").select(
        "qid",
        F.col("true_label").cast("long").alias("true_label"),
        "pred_label",
        "votes",
        (F.col("pred_label") == F.col("true_label")).cast("int").alias("correct"),
    )


X10_ORACLE = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
           WHERE vec_id < {X10_QUERY_BOUND}),
s AS (SELECT qid, vec_id AS nid, {dk_dot('qv', 'embedding')} AS dot
      FROM q JOIN embeddings ON qid <> vec_id),
r AS (SELECT qid, nid FROM (
        SELECT qid, nid,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY dot DESC, nid ASC) AS rank
        FROM s) WHERE rank <= {ANN_K}),
v AS (SELECT qid, e.label AS n_label, CAST(count(*) AS BIGINT) AS votes
      FROM r JOIN embeddings e ON e.vec_id = r.nid GROUP BY 1, 2),
p AS (SELECT qid, n_label, votes,
             row_number() OVER (PARTITION BY qid
                                ORDER BY votes DESC, n_label ASC) AS rr
      FROM v)
SELECT p.qid, CAST(t.label AS BIGINT) AS true_label,
       CAST(p.n_label AS BIGINT) AS pred_label, p.votes,
       CAST(p.n_label = t.label AS INT) AS correct
FROM p JOIN embeddings t ON t.vec_id = p.qid
WHERE p.rr = 1
"""


def a22_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Portable HyperLogLog distinct sketch (textops/sketch.py::
    hll_distinct): per-group estimate whose REGISTERS AND ESTIMATE —
    not just an error bound — replay bit-for-bit in DuckDB, unlike
    a13's opaque JVM HLL++. The gate unions a high-cardinality rollup
    (lineitem partkeys per returnflag → raw harmonic-mean branch) and
    a low-cardinality one (event users per type → Flajolet linear-
    counting branch via exact ilog2 + rational ln2), so BOTH estimate
    branches certify."""
    from omfietser_etl_spark.textops.sketch import hll_distinct

    li = load(spark, sf, "lineitem").select(
        F.concat(F.lit("li:"), "l_returnflag").alias("g"),
        F.col("l_partkey").cast("long").alias("k"),
    )
    ev = load(spark, sf, "events").select(
        F.concat(F.lit("ev:"), "event_type").alias("g"),
        F.col("user_id").cast("long").alias("k"),
    )
    return hll_distinct(li.unionByName(ev), "g", "k")


def _a22_oracle() -> str:
    from omfietser_etl_spark.textops.selection import DSIR_F, DSIR_Q, ilog2_q
    from omfietser_etl_spark.textops.sketch import (
        HLL_ALPHA_DEN,
        HLL_ALPHA_NUM,
        HLL_LN2_DEN,
        HLL_LN2_NUM,
        HLL_M,
        HLL_S_SCALE,
        HLL_SENTINEL_BIT,
    )

    m, sb, sc = HLL_M, 1 << HLL_SENTINEL_BIT, HLL_S_SCALE
    il_m = ilog2_q(m)
    pb = dk_poly("'hllb:' || CAST(k AS VARCHAR)")
    pr = dk_poly("'hllr:' || CAST(k AS VARCHAR)")
    return f"""
WITH u AS MATERIALIZED (
  SELECT 'li:' || l_returnflag AS g, CAST(l_partkey AS BIGINT) AS k FROM lineitem
  UNION ALL
  SELECT 'ev:' || event_type, CAST(user_id AS BIGINT) FROM events),
p AS (SELECT g, {pb} AS polyb, {pr} AS polyr FROM u),
h AS (SELECT g, {dk_mix31('polyb')} AS hb, {dk_mix31('polyr')} AS hr FROM p),
r AS (SELECT g, hb % {m} AS bkt,
             length(bin((hr | {sb}) & -(hr | {sb}))) AS rho FROM h),
regs AS (SELECT g, bkt, max(rho) AS mj FROM r GROUP BY 1, 2),
pg AS (SELECT g, CAST(count(*) AS BIGINT) AS np,
              CAST(SUM(CAST(1 AS BIGINT) << ({sc} - mj)) AS BIGINT) AS sp
       FROM regs GROUP BY g),
vals AS (SELECT DISTINCT CAST(greatest({m} - np, 1) AS BIGINT) AS x FROM pg),
{dk_ilog2_chain('vals', DSIR_Q, DSIR_F)},
est AS (SELECT g, np,
         (CAST({HLL_ALPHA_NUM * m * m} AS HUGEINT) * {1 << sc})
           // (CAST({HLL_ALPHA_DEN} AS HUGEINT)
               * (sp + ({m} - np) * CAST({1 << sc} AS BIGINT))) AS raw,
         il.il AS ilv
        FROM pg JOIN il ON il.x = greatest({m} - np, 1)),
fin AS (SELECT g,
         CASE WHEN raw <= {5 * m // 2} AND np < {m}
              THEN ({m} * ({il_m} - ilv) * {HLL_LN2_NUM})
                   // (CAST({1 << DSIR_Q} AS BIGINT) * {HLL_LN2_DEN})
              ELSE raw END AS hll_est
        FROM est),
ex AS (SELECT g, CAST(count(DISTINCT k) AS BIGINT) AS n_exact FROM u GROUP BY g)
SELECT ex.g, ex.n_exact, CAST(fin.hll_est AS BIGINT) AS hll_est,
       CAST((abs(fin.hll_est - ex.n_exact) * 10000)
            // greatest(ex.n_exact, 1) AS BIGINT) AS err_bp,
       (abs(fin.hll_est - ex.n_exact) * 10000)
         // greatest(ex.n_exact, 1) <= 1950 AS within_3sigma
FROM ex JOIN fin USING (g)
"""


def td7_ivf_ann(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    centroids = emb.filter(F.col("vec_id") % IVF_CENTROID_MOD == 0)
    queries = emb.filter(F.col("vec_id") < ANN_QUERY_BOUND)
    return sim.ivf_topk(
        emb, centroids, queries, "vec_id", "embedding", ANN_K, IVF_PROBES
    )


TD7_ORACLE = f"""
WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
           WHERE vec_id % {IVF_CENTROID_MOD} = 0),
asg AS (SELECT vid, cid FROM (
    SELECT e.vec_id AS vid, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {dk_dot('e.embedding', 'c.cv')} DESC, c.cid ASC) AS r
    FROM embeddings e CROSS JOIN c) WHERE r = 1),
q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {ANN_QUERY_BOUND}),
probes AS (SELECT qid, qv, cid FROM (
    SELECT q.qid, q.qv, c.cid,
           row_number() OVER (PARTITION BY q.qid
               ORDER BY {dk_dot('q.qv', 'c.cv')} DESC, c.cid ASC) AS pr
    FROM q CROSS JOIN c) WHERE pr <= {IVF_PROBES}),
s AS (SELECT p.qid, a.vid AS nid, {dk_dot('p.qv', 'e.embedding')} AS dot
      FROM probes p JOIN asg a ON a.cid = p.cid AND a.vid <> p.qid
      JOIN embeddings e ON e.vec_id = a.vid),
r AS (SELECT qid, nid, dot,
      row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid ASC) AS rank FROM s)
SELECT qid, rank, nid, round(dot, 6) AS sim FROM r WHERE rank <= {ANN_K}
"""


PQ_M = 4  # subspaces → 4-byte codes for 64-dim (256-byte) vectors
PQ_KSUB = 16  # centroids per subspace; codebook = vec_id < 16 slices
PQ_RERANK = 3 * ANN_K  # ADC shortlist size for the exact re-rank stage


def td20_pq_adc_topk(spark: SparkSession, sf: str) -> DataFrame:
    """PQ-ADC approximate top-k (textops/pq.py::pq_adc_topk): the
    memory-bound billion-vector path — M-byte codes instead of
    d-float vectors, per-query broadcast LUT, corpus codes never
    shuffle. Deterministic codebook (ksub lowest-id vectors' slices,
    td8's convention); int64 micro-unit distances so the M-way sum is
    order-free and the oracle replays it bit-for-bit."""
    from omfietser_etl_spark.textops.pq import pq_adc_topk

    emb = load(spark, sf, "embeddings")
    return pq_adc_topk(
        emb, emb.filter(F.col("vec_id") < ANN_QUERY_BOUND),
        "vec_id", "embedding", ANN_K, EMB_DIM, PQ_M, PQ_KSUB,
    )


def _pq_l2(a: str, b: str, n: int) -> str:
    # td8's engine-portable left fold, parameterized to slice length.
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {n} + 1), "
        f"k -> ({a}[k]::DOUBLE - {b}[k]::DOUBLE) * ({a}[k]::DOUBLE - {b}[k]::DOUBLE))), "
        f"(x, y) -> x + y)"
    )


def _td20_oracle() -> str:
    sub = EMB_DIM // PQ_M
    l2 = _pq_l2("es", "cs", sub)
    l2q = _pq_l2("qs", "cs", sub)
    return f"""
WITH ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
cb AS (SELECT ms.m, CAST(vec_id AS INT) AS cid,
              embedding[ms.m*{sub}+1 : ms.m*{sub}+{sub}] AS cs
       FROM embeddings CROSS JOIN ms WHERE vec_id < {PQ_KSUB}),
enc0 AS (SELECT e.vec_id AS vid, cb.m, cb.cid, cb.cs,
                e.embedding[cb.m*{sub}+1 : cb.m*{sub}+{sub}] AS es
         FROM embeddings e CROSS JOIN cb),
enc1 AS (SELECT vid, m, cid, {l2} AS d2 FROM enc0),
codes AS (SELECT vid, m, cid AS code FROM (
    SELECT vid, m, cid,
           row_number() OVER (PARTITION BY vid, m ORDER BY d2 ASC, cid ASC) AS r
    FROM enc1) WHERE r = 1),
q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE vec_id < {ANN_QUERY_BOUND}),
lut0 AS (SELECT q.qid, cb.m, cb.cid, q.qv[cb.m*{sub}+1 : cb.m*{sub}+{sub}] AS qs, cb.cs
         FROM q CROSS JOIN cb),
lut AS (SELECT qid, m, cid,
               CAST(floor({l2q} * 1000000) AS BIGINT) AS pd2_q
        FROM lut0),
s AS (SELECT l.qid, c.vid AS nid, CAST(SUM(l.pd2_q) AS BIGINT) AS d2adc_q
      FROM codes c JOIN lut l ON l.m = c.m AND l.cid = c.code AND c.vid <> l.qid
      GROUP BY l.qid, c.vid),
r AS (SELECT qid, nid, d2adc_q,
      CAST(row_number() OVER (PARTITION BY qid ORDER BY d2adc_q ASC, nid ASC) AS INT) AS rank
      FROM s)
SELECT qid, rank, nid, d2adc_q FROM r WHERE rank <= {ANN_K}
"""


def td21_ivfpq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ top-k (textops/pq.py::ivfpq_topk): faiss's deployment
    composition of td7's coarse probe (prune to n_probe clusters)
    with td20's ADC code scoring (M-byte codes, broadcast LUT) — the
    index table (vid, cid, codes) is ONE corpus shuffle and at scale
    is stored cid-bucketed for partition-pruned probes."""
    from omfietser_etl_spark.textops.pq import ivfpq_topk

    emb = load(spark, sf, "embeddings")
    return ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") % IVF_CENTROID_MOD == 0),
        emb.filter(F.col("vec_id") < ANN_QUERY_BOUND),
        "vec_id", "embedding", ANN_K, EMB_DIM, PQ_M, PQ_KSUB, IVF_PROBES,
    )


def _td21_oracle() -> str:
    sub = EMB_DIM // PQ_M
    l2 = _pq_l2("es", "cs", sub)
    l2q = _pq_l2("qs", "cs", sub)
    return f"""
WITH ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
cb AS (SELECT ms.m, CAST(vec_id AS INT) AS pqc,
              embedding[ms.m*{sub}+1 : ms.m*{sub}+{sub}] AS cs
       FROM embeddings CROSS JOIN ms WHERE vec_id < {PQ_KSUB}),
enc0 AS (SELECT e.vec_id AS vid, cb.m, cb.pqc, cb.cs,
                e.embedding[cb.m*{sub}+1 : cb.m*{sub}+{sub}] AS es
         FROM embeddings e CROSS JOIN cb),
enc1 AS (SELECT vid, m, pqc, {l2} AS d2 FROM enc0),
codes AS (SELECT vid, m, pqc AS code FROM (
    SELECT vid, m, pqc,
           row_number() OVER (PARTITION BY vid, m ORDER BY d2 ASC, pqc ASC) AS r
    FROM enc1) WHERE r = 1),
c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
      WHERE vec_id % {IVF_CENTROID_MOD} = 0),
asg AS (SELECT vid, cid FROM (
    SELECT e.vec_id AS vid, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {dk_dot('e.embedding', 'c.cv')} DESC, c.cid ASC) AS r
    FROM embeddings e CROSS JOIN c) WHERE r = 1),
q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE vec_id < {ANN_QUERY_BOUND}),
probes AS (SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           row_number() OVER (PARTITION BY q.qid
               ORDER BY {dk_dot('q.qv', 'c.cv')} DESC, c.cid ASC) AS pr
    FROM q CROSS JOIN c) WHERE pr <= {IVF_PROBES}),
lut0 AS (SELECT q.qid, cb.m, cb.pqc, q.qv[cb.m*{sub}+1 : cb.m*{sub}+{sub}] AS qs, cb.cs
         FROM q CROSS JOIN cb),
lut AS (SELECT qid, m, pqc,
               CAST(floor({l2q} * 1000000) AS BIGINT) AS pd2_q
        FROM lut0),
s AS (SELECT p.qid, a.vid AS nid, CAST(SUM(l.pd2_q) AS BIGINT) AS d2adc_q
      FROM probes p
      JOIN asg a ON a.cid = p.cid AND a.vid <> p.qid
      JOIN codes cd ON cd.vid = a.vid
      JOIN lut l ON l.qid = p.qid AND l.m = cd.m AND l.pqc = cd.code
      GROUP BY p.qid, a.vid),
r AS (SELECT qid, nid, d2adc_q,
      CAST(row_number() OVER (PARTITION BY qid ORDER BY d2adc_q ASC, nid ASC) AS INT) AS rank
      FROM s)
SELECT qid, rank, nid, d2adc_q FROM r WHERE rank <= {ANN_K}
"""


def td22_pq_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage retrieval (textops/pq.py::pq_rerank_topk): td20's
    ADC shortlist (3k candidates, M-byte codes, corpus never
    shuffles) re-ranked EXACTLY by full-precision dot product —
    faiss's IndexRefineFlat serving shape. Output schema ≡ td6, so
    the oracle re-ranks the replayed ADC shortlist with the same
    left-fold dot td6 gates."""
    from omfietser_etl_spark.textops.pq import pq_rerank_topk

    emb = load(spark, sf, "embeddings")
    return pq_rerank_topk(
        emb, emb.filter(F.col("vec_id") < ANN_QUERY_BOUND),
        "vec_id", "embedding", ANN_K, PQ_RERANK, EMB_DIM, PQ_M, PQ_KSUB,
    )


def _td22_oracle() -> str:
    sub = EMB_DIM // PQ_M
    l2 = _pq_l2("es", "cs", sub)
    l2q = _pq_l2("qs", "cs", sub)
    return f"""
WITH ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
cb AS (SELECT ms.m, CAST(vec_id AS INT) AS cid,
              embedding[ms.m*{sub}+1 : ms.m*{sub}+{sub}] AS cs
       FROM embeddings CROSS JOIN ms WHERE vec_id < {PQ_KSUB}),
enc0 AS (SELECT e.vec_id AS vid, cb.m, cb.cid, cb.cs,
                e.embedding[cb.m*{sub}+1 : cb.m*{sub}+{sub}] AS es
         FROM embeddings e CROSS JOIN cb),
enc1 AS (SELECT vid, m, cid, {l2} AS d2 FROM enc0),
codes AS (SELECT vid, m, cid AS code FROM (
    SELECT vid, m, cid,
           row_number() OVER (PARTITION BY vid, m ORDER BY d2 ASC, cid ASC) AS r
    FROM enc1) WHERE r = 1),
q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE vec_id < {ANN_QUERY_BOUND}),
lut0 AS (SELECT q.qid, cb.m, cb.cid, q.qv[cb.m*{sub}+1 : cb.m*{sub}+{sub}] AS qs, cb.cs
         FROM q CROSS JOIN cb),
lut AS (SELECT qid, m, cid,
               CAST(floor({l2q} * 1000000) AS BIGINT) AS pd2_q
        FROM lut0),
s AS (SELECT l.qid, c.vid AS nid, CAST(SUM(l.pd2_q) AS BIGINT) AS d2adc_q
      FROM codes c JOIN lut l ON l.m = c.m AND l.cid = c.code AND c.vid <> l.qid
      GROUP BY l.qid, c.vid),
sl AS (SELECT qid, nid FROM (
    SELECT qid, nid,
           row_number() OVER (PARTITION BY qid ORDER BY d2adc_q ASC, nid ASC) AS r
    FROM s) WHERE r <= {PQ_RERANK}),
x AS (SELECT sl.qid, sl.nid, {dk_dot('q.qv', 'e.embedding')} AS dot
      FROM sl JOIN q ON q.qid = sl.qid
      JOIN embeddings e ON e.vec_id = sl.nid),
rr AS (SELECT qid, nid, dot,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid ASC) AS INT) AS rank
       FROM x)
SELECT qid, rank, nid, round(dot, 6) AS sim FROM rr WHERE rank <= {ANN_K}
"""


#: Codebook size derived from the sizing rule the 10× stress proved
#: (k ∝ N — clustering.semdedup_k_for), evaluated at the shared
#: EMB_GATE_N defined with the embedding-family constants above.
from omfietser_etl_spark.textops.clustering import semdedup_k_for  # noqa: E402

KMEANS_K = semdedup_k_for(EMB_GATE_N)
assert KMEANS_K == 8, "gate codebook size is certified at 8"


def td8_kmeans_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-centroid assignment step of k-means clustering
    (textops/clustering.py::assign_clusters) with a deterministic
    codebook — the k lowest-id vectors, exactly Lloyd's init.

    Gate-checks the deterministic half of the algorithm: the centroid
    MEANS of a full Lloyd run depend on float accumulation order (any
    fixed point is valid), so the oracle verifies assignment, which is
    an exact left-fold L2 both engines compute bit-identically (same
    shape as td6/td7's dot fold). Lloyd convergence itself is covered
    by tests/test_clustering.py.
    """
    from omfietser_etl_spark.textops.clustering import assign_clusters

    emb = load(spark, sf, "embeddings")
    centroids = emb.filter(F.col("vec_id") < KMEANS_K).select(
        (F.col("vec_id") + 1).cast("int").alias("cid"),
        F.col("embedding").alias("cv"),
    )
    out = assign_clusters(
        emb, centroids, "vec_id", "embedding", "cid", "cv", keep_vec=False
    )
    return out.select("vec_id", "cid", F.round(F.col("_d2"), 6).alias("d2"))


def _td8_l2(a: str, b: str) -> str:
    # Same left-fold shape as dk_dot: bit-identical to Spark's
    # aggregate(zip_with(...)) squared-L2 in clustering.l2_expr.
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, len({a}) + 1), "
        f"k -> ({a}[k]::DOUBLE - {b}[k]::DOUBLE) * ({a}[k]::DOUBLE - {b}[k]::DOUBLE))), "
        f"(x, y) -> x + y)"
    )


TD8_ORACLE = f"""
WITH c AS (SELECT CAST(vec_id + 1 AS INTEGER) AS cid, embedding AS cv
           FROM embeddings WHERE vec_id < {KMEANS_K}),
a AS (SELECT e.vec_id, c.cid, {_td8_l2('e.embedding', 'c.cv')} AS d2,
             row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_td8_l2('e.embedding', 'c.cv')} ASC, c.cid ASC) AS r
      FROM embeddings e CROSS JOIN c)
SELECT vec_id, cid, round(d2, 6) AS d2 FROM a WHERE r = 1
"""


TS19_K = 5  # coreset size for the k-center gate


def ts19_kcenter_coreset(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy k-center coreset (textops/similarity.py::
    kcenter_coreset): maximally-diverse k-vector subset by
    farthest-point traversal over exact int8-quantized distances —
    the data-pruning complement to ts17's per-cluster quotas. The
    oracle unrolls the k−1 greedy steps as CTE chains over the same
    quantization."""
    return sim.kcenter_coreset(
        load(spark, sf, "embeddings"), "vec_id", "embedding", TS19_K
    )


def _ts19_oracle() -> str:
    dist = (
        "list_sum(list_transform(range(1, {dim} + 1), "
        "i -> CAST(q.qv[i] - c.qv[i] AS BIGINT) * "
        "CAST(q.qv[i] - c.qv[i] AS BIGINT)))"
    ).format(dim=EMB_DIM)
    steps = [
        """q AS (SELECT vec_id AS vid,
       CASE WHEN ma = 0 THEN list_transform(embedding, x -> 0)
            ELSE list_transform(embedding,
                 x -> CAST(floor(x::DOUBLE / ma * 127.0) AS INTEGER)) END AS qv
     FROM (SELECT vec_id, embedding,
           list_aggregate(list_transform(embedding, x -> abs(x::DOUBLE)), 'max') AS ma
           FROM embeddings))""",
        "c1 AS (SELECT vid, qv FROM q ORDER BY vid LIMIT 1)",
    ]
    finals = ["SELECT CAST(1 AS BIGINT) AS ord, vid AS vec_id, "
              "CAST(0 AS BIGINT) AS dmin_q FROM c1"]
    for j in range(1, TS19_K):
        steps.append(
            f"s{j} AS (SELECT q.vid, q.qv, min({dist}) AS dmin "
            f"FROM q CROSS JOIN c{j} c GROUP BY q.vid, q.qv)"
        )
        steps.append(
            f"n{j} AS (SELECT vid, qv, dmin FROM s{j} "
            f"WHERE vid NOT IN (SELECT vid FROM c{j}) "
            f"ORDER BY dmin DESC, vid LIMIT 1)"
        )
        steps.append(
            f"c{j + 1} AS (SELECT vid, qv FROM c{j} "
            f"UNION ALL SELECT vid, qv FROM n{j})"
        )
        finals.append(
            f"SELECT CAST({j + 1} AS BIGINT), vid, CAST(dmin AS BIGINT) FROM n{j}"
        )
    return "WITH " + ",\n".join(steps) + "\n" + "\nUNION ALL ".join(finals)


PROTO_N = 8  # per-cluster quota for the prototype-selection gate


def ts17_cluster_prototypes(spark: SparkSession, sf: str) -> DataFrame:
    """Cluster-balanced prototype selection
    (textops/clustering.py::cluster_prototypes): per-cluster top-n
    closest-to-centroid — equal semantic quotas so tail topics
    survive curation. Assignment replays td8's exact-fold map pass;
    selection is a cid-partitioned window (parallel across clusters,
    never a global sort)."""
    from omfietser_etl_spark.textops.clustering import cluster_prototypes

    emb = load(spark, sf, "embeddings")
    centroids = emb.filter(F.col("vec_id") < KMEANS_K).select(
        (F.col("vec_id") + 1).cast("int").alias("cid"),
        F.col("embedding").alias("cv"),
    )
    return cluster_prototypes(emb, centroids, PROTO_N, "vec_id", "embedding")


TS17_ORACLE = f"""
WITH c AS (SELECT CAST(vec_id + 1 AS INTEGER) AS cid, embedding AS cv
           FROM embeddings WHERE vec_id < {KMEANS_K}),
a AS (SELECT e.vec_id, c.cid, {_td8_l2('e.embedding', 'c.cv')} AS d2,
             row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_td8_l2('e.embedding', 'c.cv')} ASC, c.cid ASC) AS r
      FROM embeddings e CROSS JOIN c),
asg AS (SELECT vec_id, cid, d2 FROM a WHERE r = 1),
p AS (SELECT cid, vec_id, d2,
             CAST(row_number() OVER (PARTITION BY cid
                 ORDER BY d2 ASC, vec_id ASC) AS INTEGER) AS rank
      FROM asg)
SELECT cid, rank, vec_id AS id, round(d2, 6) AS d2
FROM p WHERE rank <= {PROTO_N}
"""


def td13_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-shaped semantic near-dup pairs
    (textops/clustering.py::semantic_dedup_pairs): nearest-centroid
    assignment (td8's deterministic codebook) blocks the cosine pair
    generation to within-cluster only — the scale path between td5's
    exact all-pairs baseline and td7's IVF search."""
    from omfietser_etl_spark.textops.clustering import semantic_dedup_pairs

    emb = load(spark, sf, "embeddings")
    centroids = emb.filter(F.col("vec_id") < KMEANS_K).select(
        (F.col("vec_id") + 1).cast("int").alias("cid"),
        F.col("embedding").alias("cv"),
    )
    # 'off': tau is sub-floor by deliberate small-corpus choice — the
    # contract path must not warn on every gate run (see td16 comment
    # for the geometry; guard default stays 'raise' for callers)
    return semantic_dedup_pairs(emb, centroids, NEARDUP_TAU,
                                dim=EMB_DIM, on_subnoise="off")


TD13_ORACLE = f"""
WITH c AS (SELECT CAST(vec_id + 1 AS INTEGER) AS cid, embedding AS cv
           FROM embeddings WHERE vec_id < {KMEANS_K}),
a AS (SELECT e.vec_id, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_td8_l2('e.embedding', 'c.cv')} ASC, c.cid ASC) AS r
      FROM embeddings e CROSS JOIN c),
asg AS (SELECT vec_id, cid FROM a WHERE r = 1)
SELECT x.vec_id AS vec_lo, y.vec_id AS vec_hi, x.cid,
       round({dk_dot('ex.embedding', 'ey.embedding')}, 4) AS sim
FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id < y.vec_id
JOIN embeddings ex ON ex.vec_id = x.vec_id
JOIN embeddings ey ON ey.vec_id = y.vec_id
WHERE round({dk_dot('ex.embedding', 'ey.embedding')}, 4) >= {NEARDUP_TAU}
"""


def td10_quantize(spark: SparkSession, sf: str) -> DataFrame:
    """Int8 embedding quantization (textops/similarity.py::quantize_int8):
    per-vector symmetric scale, floor codes, CSV-encoded output for an
    engine-portable gate hash. Shuffle-free elementwise map."""
    return sim.quantize_int8(load(spark, sf, "embeddings"), "vec_id", "embedding")


TD10_ORACLE = """
WITH m AS (SELECT vec_id, embedding,
           list_aggregate(list_transform(embedding, x -> abs(x::DOUBLE)), 'max') AS ma
           FROM embeddings)
SELECT vec_id,
       CAST(floor(ma * 1000000.0) AS BIGINT) AS scale_e6,
       array_to_string(list_transform(
           CASE WHEN ma = 0 THEN list_transform(embedding, x -> 0)
                ELSE list_transform(embedding,
                     x -> CAST(floor(x::DOUBLE / ma * 127.0) AS INTEGER)) END,
           v -> CAST(v AS VARCHAR)), ',') AS q_csv
FROM m
"""


TV1_TOP_K = 100


def tv1_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus vocabulary building: top-k terms by total frequency with
    document frequency — the tokenizer/vocab-induction precursor.

    One explode + one (term)-keyed hash aggregate (tf and exact df
    ride the same shuffle), then orderBy().limit() compiles to
    TakeOrderedAndProject — no global sort. The rank window runs over
    the ≤k surviving rows only (o1's pagination discipline)."""
    docs = load(spark, sf, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    agg = toks.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.countDistinct("doc_id").alias("df_docs"),
    )
    top = agg.orderBy(F.col("tf").desc(), F.col("term")).limit(TV1_TOP_K)
    w = Window.orderBy(F.col("tf").desc(), F.col("term"))
    return top.select(F.row_number().over(w).alias("rank"), "term", "tf", "df_docs")


TV1_ORACLE = f"""
WITH d AS (SELECT doc_id, unnest({DK_TOKENS.format(c='text')}) AS term FROM documents),
a AS (SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df_docs
      FROM d GROUP BY term)
SELECT row_number() OVER (ORDER BY tf DESC, term ASC) AS rank,
       term, tf, df_docs
FROM a ORDER BY tf DESC, term ASC LIMIT {TV1_TOP_K}
"""


TV4_QUERY = ["spark", "vector", "merge", "customer"]
TV4_TOP_K = 20


def tv4_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Exact fixed-point BM25 retrieval (textops/retrieval.py): the
    keyword-search primitive for targeted corpus slicing. Every log
    is the integer ilog2_q and the tf normalization is quantized
    per-mille, so the DuckDB oracle replays the score bit-for-bit —
    no float idf anywhere (the x8/ts15 exact-integer discipline)."""
    from omfietser_etl_spark.textops.retrieval import bm25_topk

    docs = load(spark, sf, "documents")
    return bm25_topk(docs, "doc_id", "text", TV4_QUERY, TV4_TOP_K)


def _bm25_ctes() -> str:
    """The BM25 oracle CTE chain, ending at `top` (doc, score_q,
    top-k by score) — shared by tv4 (ranked output) and tv5 (RRF
    fusion input)."""
    from omfietser_etl_spark.textops.retrieval import BM25_S
    from omfietser_etl_spark.textops.selection import DSIR_F, DSIR_Q

    q_vals = ", ".join(f"('{t}')" for t in TV4_QUERY)
    return f"""d AS (SELECT doc_id AS doc, {DK_TOKENS.format(c="text")} AS t FROM documents),
base AS (SELECT doc, CAST(len(t) AS BIGINT) AS dl, t FROM d),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS tt
        FROM base),
q(term) AS (VALUES {q_vals}),
e AS (SELECT doc, dl, unnest(t) AS term FROM base),
hits AS (SELECT e.doc, e.dl, e.term FROM e JOIN q USING (term)),
dfv AS (SELECT term, CAST(count(DISTINCT doc) AS BIGINT) AS dfd
        FROM hits GROUP BY term),
vals AS (SELECT DISTINCT 2 * dfd + 1 AS x FROM dfv
         UNION SELECT 2 * n + 2 FROM tot),
{dk_ilog2_chain('vals', DSIR_Q, DSIR_F)},
idf AS (SELECT dfv.term, i2.il - i1.il AS idf_q
        FROM dfv
        JOIN il i1 ON i1.x = 2 * dfv.dfd + 1
        CROSS JOIN tot
        JOIN il i2 ON i2.x = 2 * tot.n + 2),
tf AS (SELECT doc, dl, term, CAST(count(*) AS BIGINT) AS tf
       FROM hits GROUP BY 1, 2, 3),
sc AS (SELECT tf.doc,
         CAST(SUM((idf.idf_q * 22000 * tf.tf * {BM25_S}) //
                  (10000 * tf.tf + 3000 +
                   9 * ((1000 * tf.dl * tot.n) // tot.tt))) AS BIGINT)
           AS score_q
       FROM tf JOIN idf USING (term) CROSS JOIN tot
       GROUP BY tf.doc),
top AS (SELECT doc, score_q FROM sc
        ORDER BY score_q DESC, doc ASC LIMIT {TV4_TOP_K})"""


def _tv4_oracle() -> str:
    return f"""
WITH {_bm25_ctes()}
SELECT doc, score_q,
       CAST(row_number() OVER (ORDER BY score_q DESC, doc ASC) AS BIGINT)
         AS rank
FROM top
"""


RRF_QVEC = 0  # dense-list query vector for the fusion gate


def tv5_rrf_fusion(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion
    (textops/retrieval.py::rrf_fuse): fuse the tv4 BM25 lexical
    top-20 with a dense exact top-20 (td6's brute_topk for query
    vector RRF_QVEC) on the shared doc/vec id space — integer RRF
    contributions (1e6 div (60+rank)) so the oracle replays the
    fused scores exactly."""
    from omfietser_etl_spark.textops import similarity as sim
    from omfietser_etl_spark.textops.retrieval import bm25_topk, rrf_fuse

    docs = load(spark, sf, "documents")
    emb = load(spark, sf, "embeddings")
    lex = bm25_topk(docs, "doc_id", "text", TV4_QUERY, TV4_TOP_K)
    den = sim.brute_topk(
        emb, emb.filter(F.col("vec_id") == RRF_QVEC),
        "vec_id", "embedding", TV4_TOP_K,
    ).select(F.col("nid").alias("doc"), "rank")
    return rrf_fuse([lex.select("doc", "rank"), den], top_k=TV4_TOP_K)


def _tv5_oracle() -> str:
    from omfietser_etl_spark.textops.retrieval import RRF_K, RRF_SCALE

    return f"""
WITH {_bm25_ctes()},
lex AS (SELECT doc,
               row_number() OVER (ORDER BY score_q DESC, doc ASC) AS r
        FROM top),
dq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {RRF_QVEC}),
ds AS (SELECT e.vec_id AS doc, {dk_dot('dq.qv', 'e.embedding')} AS dot
       FROM dq CROSS JOIN embeddings e WHERE e.vec_id <> {RRF_QVEC}),
den AS (SELECT doc, r FROM (
    SELECT doc, row_number() OVER (ORDER BY dot DESC, doc ASC) AS r
    FROM ds) WHERE r <= {TV4_TOP_K}),
u AS (SELECT doc, r FROM lex UNION ALL SELECT doc, r FROM den),
f AS (SELECT doc, CAST(SUM({RRF_SCALE} // ({RRF_K} + r)) AS BIGINT) AS rrf_q,
             CAST(count(*) AS BIGINT) AS n_lists
      FROM u GROUP BY doc),
ftop AS (SELECT doc, rrf_q, n_lists FROM f
         ORDER BY rrf_q DESC, doc ASC LIMIT {TV4_TOP_K})
SELECT doc, rrf_q, n_lists,
       CAST(row_number() OVER (ORDER BY rrf_q DESC, doc ASC) AS BIGINT)
         AS rank
FROM ftop
"""


MMR_POOL = 30
MMR_K = 10


def tv8_mmr_diversify(spark: SparkSession, sf: str) -> DataFrame:
    """Diversity-aware reranking of the dense retrieval shortlist
    (textops/similarity.py::mmr_diversify): greedy MMR over the
    RRF_QVEC query's relevance top-30, k=10 — the anti-redundancy
    step between retrieval and context assembly (and, pipeline-side,
    between near-dup clustering and sample selection)."""
    from omfietser_etl_spark.textops.similarity import mmr_diversify

    emb = load(spark, sf, "embeddings")
    return mmr_diversify(
        emb.filter(F.col("vec_id") != RRF_QVEC),
        emb.filter(F.col("vec_id") == RRF_QVEC),
        "vec_id", "embedding", MMR_K, MMR_POOL,
    )


def _tv8_oracle() -> str:
    """The same greedy unrolled as CTE steps: s1 = relevance argmax,
    then per step the (not-yet-selected × selected) max-sim aggregate
    and a LIMIT-1 argmax — all on the pool-sized shortlist, with the
    identical left-fold double dots and literal 0.7/0.3 weights.
    cand and every s{i} are MATERIALIZED: each step references its
    predecessor 3×, so inlined CTEs re-evaluate the whole chain (and
    re-open the parquet) exponentially — materialization makes the
    unroll linear."""
    steps = [
        f"dq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {RRF_QVEC})",
        f"cand AS MATERIALIZED (SELECT e.vec_id AS nid, e.embedding AS nv, "
        f"{dk_dot('dq.qv', 'e.embedding')} AS rel "
        f"FROM dq CROSS JOIN embeddings e WHERE e.vec_id <> {RRF_QVEC} "
        f"ORDER BY rel DESC, nid LIMIT {MMR_POOL})",
        "s1 AS MATERIALIZED (SELECT nid, nv, rel, CAST(1 AS BIGINT) AS step, "
        "(0.7 * rel) AS mmr FROM cand ORDER BY rel DESC, nid LIMIT 1)",
    ]
    prev = "s1"
    for i in range(2, MMR_K + 1):
        steps.append(
            f"ms{i} AS (SELECT c.nid, max({dk_dot('c.nv', 's.nv')}) AS ms "
            f"FROM cand c CROSS JOIN {prev} s "
            f"WHERE c.nid NOT IN (SELECT nid FROM {prev}) GROUP BY c.nid)"
        )
        steps.append(
            f"pk{i} AS (SELECT m.nid, ((0.7 * c.rel) - (0.3 * m.ms)) AS mmr "
            f"FROM ms{i} m JOIN cand c USING (nid) "
            f"ORDER BY mmr DESC, m.nid LIMIT 1)"
        )
        steps.append(
            f"s{i} AS MATERIALIZED (SELECT * FROM {prev} UNION ALL "
            f"SELECT c.nid, c.nv, c.rel, CAST({i} AS BIGINT), p.mmr "
            f"FROM pk{i} p JOIN cand c USING (nid))"
        )
        prev = f"s{i}"
    return (
        "WITH " + ", ".join(steps)
        + f" SELECT step, nid, round(mmr, 6) AS mmr FROM {prev}"
    )


def tv6_query_likelihood_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (textops/
    retrieval.py::query_likelihood_topk) over the tv4 query — the
    LM-based ranking complement to BM25. Every log is ilog2_q (the
    per-row ones through the engine-side ilog2_q_expr primitive), so
    the score — a possibly-negative exact int64 log-probability —
    replays bit-for-bit in the oracle's CTE chain."""
    from omfietser_etl_spark.textops.retrieval import query_likelihood_topk

    docs = load(spark, sf, "documents")
    return query_likelihood_topk(docs, "doc_id", "text", TV4_QUERY, TV4_TOP_K)


def _tv6_oracle() -> str:
    from omfietser_etl_spark.textops.retrieval import QL_MU
    from omfietser_etl_spark.textops.selection import DSIR_F, DSIR_Q

    mu = QL_MU
    q_vals = ", ".join(f"('{t}')" for t in TV4_QUERY)
    return f"""
WITH d AS (SELECT doc_id AS doc, {DK_TOKENS.format(c="text")} AS t FROM documents),
base AS (SELECT doc, CAST(len(t) AS BIGINT) AS dl, t FROM d),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS tt
        FROM base),
q(term) AS (VALUES {q_vals}),
e AS (SELECT doc, dl, unnest(t) AS term FROM base),
hits AS (SELECT e.doc, e.dl, e.term FROM e JOIN q USING (term)),
cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM hits GROUP BY term),
tf AS (SELECT doc, dl, term, CAST(count(*) AS BIGINT) AS tf
       FROM hits GROUP BY 1, 2, 3),
vals AS (SELECT DISTINCT tf.tf * tot.tt + {mu} * cf.cf AS x
           FROM tf JOIN cf USING (term) CROSS JOIN tot
         UNION SELECT {mu} * cf FROM cf
         UNION SELECT DISTINCT tot.tt * (tf.dl + {mu}) FROM tf CROSS JOIN tot),
{dk_ilog2_chain('vals', DSIR_Q, DSIR_F)},
b AS (SELECT CAST(SUM(il.il) AS BIGINT) AS b, CAST(count(*) AS BIGINT) AS nq
      FROM cf JOIN il ON il.x = {mu} * cf.cf),
corr AS (SELECT tf.doc, tf.dl, CAST(SUM(i1.il - i2.il) AS BIGINT) AS corr
         FROM tf JOIN cf USING (term) CROSS JOIN tot
         JOIN il i1 ON i1.x = tf.tf * tot.tt + {mu} * cf.cf
         JOIN il i2 ON i2.x = {mu} * cf.cf
         GROUP BY 1, 2),
sc AS (SELECT corr.doc,
              CAST(corr.corr + b.b - b.nq * i3.il AS BIGINT) AS score_q
       FROM corr CROSS JOIN b CROSS JOIN tot
       JOIN il i3 ON i3.x = tot.tt * (corr.dl + {mu}))
SELECT doc, score_q,
       CAST(row_number() OVER (ORDER BY score_q DESC, doc ASC) AS BIGINT)
         AS rank
FROM sc ORDER BY score_q DESC, doc ASC LIMIT {TV4_TOP_K}
"""


def tv7_retrieval_eval(spark: SparkSession, sf: str) -> DataFrame:
    """nDCG@20 scoreboard for the two ranked retrievers (textops/
    retrieval.py::ndcg_eval): graded relevance = #distinct tv4 query
    terms present in the doc (0–4, derivable by both engines), then
    exact fixed-point DCG/IDCG — the evaluation primitive a retrieval
    pipeline runs before swapping rankers.

    Round 12 (guide §1.2/§2.3): both retrievers score from ONE shared
    _staged_terms substrate (persisted query-term tf frame + one
    bounded stats collect) instead of each tokenizing the corpus for
    stats, sentinel and tf subtrees (six corpus tokenize passes → one
    + the sentinel), and the relevance frame is DERIVED from that tf
    frame: rel = #distinct query terms present = tf rows per doc.
    Equivalence: docs absent from tf have rel 0, contribute zero gain
    to IDCG's top-k (rel·G div il = 0) and never appear in a ranked
    list, so dropping them changes no output value."""
    from omfietser_etl_spark.textops.retrieval import (
        _staged_terms,
        bm25_topk,
        ndcg_eval,
        query_likelihood_topk,
    )

    docs = load(spark, sf, "documents")
    staged = _staged_terms(docs, "doc_id", "text", TV4_QUERY, "retrieval.tv7")
    tf = staged[0]
    rel = tf.groupBy("doc").agg(F.count("*").cast("long").alias("rel"))
    lex = bm25_topk(docs, "doc_id", "text", TV4_QUERY, TV4_TOP_K, _staged=staged)
    ql = query_likelihood_topk(
        docs, "doc_id", "text", TV4_QUERY, TV4_TOP_K, _staged=staged
    )
    return ndcg_eval({"bm25": lex, "ql": ql}, rel, TV4_TOP_K)


def _tv7_oracle() -> str:
    from omfietser_etl_spark.textops.retrieval import NDCG_G
    from omfietser_etl_spark.textops.selection import DSIR_F, DSIR_Q

    q_vals = ", ".join(f"'{t}'" for t in TV4_QUERY)
    return f"""
WITH lex AS (SELECT doc, rank FROM ({_tv4_oracle()})),
ql AS (SELECT doc, rank FROM ({_tv6_oracle()})),
rel AS (SELECT doc_id AS doc,
               CAST(len(list_intersect(list_distinct({DK_TOKENS.format(c="text")}),
                                       [{q_vals}])) AS BIGINT) AS rel
        FROM documents),
u AS (SELECT 'bm25' AS system, doc, rank FROM lex
      UNION ALL SELECT 'ql', doc, rank FROM ql),
vals AS (SELECT range AS x FROM range(2, {TV4_TOP_K} + 2)),
{dk_ilog2_chain('vals', DSIR_Q, DSIR_F)},
dcg AS (SELECT system,
               CAST(SUM((rel.rel * {NDCG_G}) // il.il) AS BIGINT) AS dcg_q
        FROM u JOIN rel USING (doc) JOIN il ON il.x = u.rank + 1
        GROUP BY system),
ideal AS (SELECT rel, row_number() OVER (ORDER BY rel DESC, doc) AS rank
          FROM rel ORDER BY rel DESC, doc LIMIT {TV4_TOP_K}),
idcg AS (SELECT CAST(SUM((ideal.rel * {NDCG_G}) // il.il) AS BIGINT) AS idcg_q
         FROM ideal JOIN il ON il.x = ideal.rank + 1)
SELECT system, dcg_q, idcg_q,
       CAST((10000 * dcg_q) // idcg_q AS BIGINT) AS ndcg_bp
FROM dcg CROSS JOIN idcg ORDER BY system
"""


TV2_TOP_N = 5


def tv2_tfidf_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source distinctive terms: TF-IDF-style ranking of each
    source's vocabulary against the whole corpus — the data-card
    "what is this slice about" signal, and the keyword primitive
    retrieval pipelines build on.

    The score is exact integer arithmetic (tf·10⁶ div global df)
    rather than a float idf log: cross-engine log() is not correctly
    rounded, and ordering by tf/df is ordering by log-idf within a
    fixed corpus anyway. Scale shape: one (source, term) agg + one
    (term) agg riding similar shuffles, an equi-join on term, and a
    per-source top-n window over the (vocab-sized) scored frame.
    """
    docs = load(spark, sf, "documents")
    toks = docs.select("doc_id", "source", F.explode(tokens("text")).alias("term"))
    per_src = toks.groupBy("source", "term").agg(F.count("*").alias("tf"))
    global_df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df_docs"))
    scored = per_src.join(global_df, "term").withColumn(
        "score_bp", F.expr("(tf * 1000000) div df_docs")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("score_bp").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TV2_TOP_N)
        .select("source", F.col("rank").cast("long").alias("rank"),
                "term", "tf", "df_docs", "score_bp")
    )


TV2_ORACLE = f"""
WITH d AS (SELECT doc_id, source, unnest({DK_TOKENS.format(c='text')}) AS term
           FROM documents),
ps AS (SELECT source, term, count(*) AS tf FROM d GROUP BY source, term),
g AS (SELECT term, count(DISTINCT doc_id) AS df_docs FROM d GROUP BY term),
s AS (SELECT source, ps.term AS term, tf, df_docs,
             (tf * 1000000) // df_docs AS score_bp
      FROM ps JOIN g ON ps.term = g.term)
SELECT source, CAST(rank AS BIGINT) AS rank, term, tf, df_docs, score_bp FROM (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY score_bp DESC, term ASC) AS rank
  FROM s)
WHERE rank <= {TV2_TOP_N}
"""


TV3_TOP = 20


def tv3_cms_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min-sketch heavy hitters (textops/sketch.py): the
    mergeable streaming-side complement to tv1's exact top-k. The
    sketch shuffle is bounded by d·w cells per map partition — never
    by term cardinality — and per-batch sketches merge cell-wise.

    Gate shape: sketch the corpus token stream, score the exact
    top-20 terms against it, and emit both counts plus the CMS
    guarantee est ≥ exact. The sketch hash is the portable salted
    mixed poly-hash, so the oracle rebuilds the identical d×w table
    and the ESTIMATES match bit-for-bit, not just the bound."""
    from omfietser_etl_spark.textops.sketch import cms_build, cms_estimate

    docs = load(spark, sf, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("term"))
    sketch = cms_build(toks)
    exact = toks.groupBy("term").agg(F.count("*").alias("tf"))
    top = exact.orderBy(F.col("tf").desc(), F.col("term")).limit(TV3_TOP)
    est = cms_estimate(sketch, top.select("term"))
    return top.join(est, "term").select(
        "term",
        "tf",
        "est_tf",
        (F.col("est_tf") >= F.col("tf")).alias("never_undercounts"),
    )


def _tv3_oracle() -> str:
    from omfietser_etl_spark.textops.sketch import (
        CMS_DEPTH,
        CMS_H2_XOR,
        CMS_WIDTH,
    )

    rows = ", ".join(str(r) for r in range(CMS_DEPTH))
    # Kirsch–Mitzenmacher twin of sketch._cell_hashes: hash each term
    # once (staged CTE), derive the d columns by integer double
    # hashing — same reason as the Spark side (the char fold must not
    # run per row-index) and the same per-element-lambda caveat that
    # bit the td16 oracle.
    hashes = (
        f"SELECT term, ({dk_mix31('p')}) AS h1, "
        f"({dk_mix31(f'xor(p, {CMS_H2_XOR})')}) AS h2"
    )
    return f"""
WITH t AS (SELECT unnest({DK_TOKENS.format(c='text')}) AS term FROM documents),
rs AS (SELECT unnest([{rows}]) AS r),
hp AS (SELECT term, {dk_poly('term')} AS p FROM t),
hh AS ({hashes} FROM hp),
cells AS (SELECT r, (h1 + r * h2) % {CMS_WIDTH} AS col, count(*) AS cnt
          FROM hh CROSS JOIN rs GROUP BY 1, 2),
exact AS (SELECT term, count(*) AS tf FROM t GROUP BY term),
top AS (SELECT term, tf FROM exact ORDER BY tf DESC, term ASC LIMIT {TV3_TOP}),
tp AS (SELECT term, tf, {dk_poly('term')} AS p FROM top),
th AS ({hashes.replace('SELECT term,', 'SELECT term, tf,')} FROM tp),
lk AS (SELECT term, tf, r, (h1 + r * h2) % {CMS_WIDTH} AS col
       FROM th CROSS JOIN rs),
est AS (SELECT lk.term, CAST(min(coalesce(cells.cnt, 0)) AS BIGINT) AS est_tf
        FROM lk LEFT JOIN cells ON lk.r = cells.r AND lk.col = cells.col
        GROUP BY lk.term)
SELECT top.term, top.tf, est.est_tf, est.est_tf >= top.tf AS never_undercounts
FROM top JOIN est ON top.term = est.term
"""


def td24_allpairs_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Sparse TF-vector cosine similarity join with LOSSLESS Bayardo
    prefix filtering (textops/similarity.py::allpairs_tf_cosine,
    τ = 9/10, stopword cap df ≤ N/20): the oracle is the BRUTE-FORCE
    all-pairs join over the same capped vectors, so the gate proves
    on real data that the filter drops no pair — while the engine
    never materializes the full posting self-join."""
    from omfietser_etl_spark.textops.similarity import allpairs_tf_cosine

    return allpairs_tf_cosine(load(spark, sf, "documents"), "doc_id", "text")


TD24_ORACLE = f"""
WITH d AS (SELECT doc_id AS doc, {DK_TOKENS.format(c="text")} AS t FROM documents),
tf0 AS (SELECT doc, term AS f, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc, unnest(t) AS term FROM d) GROUP BY 1, 2),
dfq AS (SELECT f, CAST(count(*) AS BIGINT) AS df_docs FROM tf0 GROUP BY f),
nd AS (SELECT CAST(count(DISTINCT doc) AS BIGINT) AS n FROM tf0),
keep AS (SELECT f FROM dfq CROSS JOIN nd WHERE df_docs * 20 <= n * 1),
tf AS (SELECT tf0.doc, tf0.f, tf0.tf FROM tf0 JOIN keep USING (f)),
n AS (SELECT doc, CAST(SUM(tf * tf) AS BIGINT) AS nsq FROM tf GROUP BY doc),
dots AS (SELECT a.doc AS doc_lo, b.doc AS doc_hi,
                CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
         FROM tf a JOIN tf b USING (f) WHERE a.doc < b.doc GROUP BY 1, 2)
SELECT doc_lo, doc_hi, dot, na.nsq AS norm_lo_sq, nb.nsq AS norm_hi_sq,
       CAST(10000 * ((10000 * CAST(dot AS HUGEINT) * dot)
                     // (CAST(na.nsq AS HUGEINT) * nb.nsq))
            + ((10000 * ((10000 * CAST(dot AS HUGEINT) * dot)
                         % (CAST(na.nsq AS HUGEINT) * nb.nsq)))
               // (CAST(na.nsq AS HUGEINT) * nb.nsq)) AS BIGINT) AS cos2_bp
FROM dots
JOIN n na ON na.doc = dots.doc_lo
JOIN n nb ON nb.doc = dots.doc_hi
WHERE 100 * CAST(dot AS HUGEINT) * dot >= 81 * CAST(na.nsq AS HUGEINT) * nb.nsq
"""


def ta15_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    shingles that appear NOWHERE else in the corpus (corpus-wide
    df = 1) — high novelty marks original content, near-zero marks
    boilerplate/templates (the complement of ca2's source-level
    containment, at doc granularity). Exact integers: novelty_bp =
    (10000·n_unique) div n_shingles; docs too short to shingle emit
    no row (nothing measurable). Shape: the td2 shingle frame, one
    shingle-keyed df agg, one equi-join back, one doc-keyed rollup —
    all bounded-key equi shuffles."""
    sh = dd.doc_shingles(load(spark, sf, "documents"), "doc_id", "text")
    sdf = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_docs"))
    per_doc = sh.join(sdf, "s").groupBy("doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum(F.when(F.col("df_docs") == 1, 1).otherwise(0))
        .cast("long").alias("n_unique"),
    )
    return per_doc.select(
        "doc",
        "n_shingles",
        "n_unique",
        F.expr("CAST((10000 * n_unique) div n_shingles AS BIGINT)")
        .alias("novelty_bp"),
    )


TA15_ORACLE = f"""
WITH d AS (SELECT doc_id AS doc, {DK_TOKENS.format(c="text")} AS t FROM documents),
sh AS (SELECT doc, unnest({dk_shingles('t')}) AS s FROM d),
sdf AS (SELECT s, CAST(count(*) AS BIGINT) AS df_docs FROM sh GROUP BY s),
pd AS (SELECT doc,
              CAST(count(*) AS BIGINT) AS n_shingles,
              CAST(SUM(CASE WHEN df_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_unique
       FROM sh JOIN sdf USING (s) GROUP BY doc)
SELECT doc, n_shingles, n_unique,
       CAST((10000 * n_unique) // n_shingles AS BIGINT) AS novelty_bp
FROM pd
"""


def ca2_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Directed cross-source shingle-containment matrix
    (textops/analysis.py::source_overlap): data-card redundancy
    diagnostic — |A∩B| / |A| in basis points per ordered source pair;
    the self-join fan-out per shingle is bounded by |sources|."""
    from omfietser_etl_spark.textops.analysis import source_overlap

    return source_overlap(load(spark, sf, "documents"), "source", "text")


CA2_ORACLE = f"""
WITH d AS (SELECT source AS g, {DK_TOKENS.format(c="text")} AS t FROM documents),
ss AS (SELECT DISTINCT g, unnest({dk_shingles('t')}) AS s FROM d),
tot AS (SELECT g, CAST(count(*) AS BIGINT) AS n_sh FROM ss GROUP BY g),
i AS (SELECT a.g AS src_a, b.g AS src_b, CAST(count(*) AS BIGINT) AS n_common
      FROM ss a JOIN ss b USING (s) WHERE a.g <> b.g GROUP BY 1, 2)
SELECT i.src_a, i.src_b, i.n_common, t.n_sh AS n_sh_a,
       CAST((10000 * i.n_common) // t.n_sh AS BIGINT) AS containment_bp
FROM i JOIN tot t ON t.g = i.src_a
"""


def ca1_corpus_report(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source data card: the release-notes summary a corpus ships
    with — volume, token mass, exact-dup rate, language mix.

    ONE source-keyed hash aggregate; the distinct-text count is the
    only extra shuffle (count distinct compiles to a two-phase
    partial/expand aggregate). All outputs exact integers."""
    docs = load(spark, sf, "documents")
    lang_cnt = [
        F.sum(F.when(F.col("lang") == lg, 1).otherwise(0)).alias(f"n_{lg}")
        for lg in ("en", "de", "es", "fr", "zh")
    ]
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(ws_token_count("text")).alias("sum_tokens"),
        F.countDistinct(norm_text("text")).alias("n_distinct_texts"),
        *lang_cnt,
    )


CA1_ORACLE = f"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')))
           AS BIGINT) AS sum_tokens,
       count(DISTINCT {DK_NORM.format(c='text')}) AS n_distinct_texts,
       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
       CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
       CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
       CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
       CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh
FROM documents GROUP BY source
"""


# ---------------------------------------------------------------- #
# td9/ta5 — decontamination + repetition (textops/decontam.py)
# ---------------------------------------------------------------- #

EVAL_SOURCE = "src9"  # held-out "benchmark" slice of documents


def td9_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination check: per training doc, the share
    of its distinct shingles that appear in the eval slice
    (source = src9). Broadcast eval shingle set, map-side join —
    the training corpus never shuffles for the check."""
    from omfietser_etl_spark.textops.decontam import contamination_stats

    docs = load(spark, sf, "documents")
    return contamination_stats(
        docs.filter(F.col("source") != EVAL_SOURCE),
        docs.filter(F.col("source") == EVAL_SOURCE),
        "doc_id",
        "text",
    )


TD9_ORACLE = (
    _DOCS_CTE.replace(
        "WITH d AS (SELECT doc_id AS doc, ",
        "WITH d AS (SELECT doc_id AS doc, source, ",
    ).replace(
        "sh AS (SELECT doc, unnest(",
        "sh AS (SELECT doc, source, unnest(",
    )
    + f"""
, ev AS (SELECT DISTINCT s FROM sh WHERE source = '{EVAL_SOURCE}')
, tr AS (SELECT doc, s FROM sh WHERE source <> '{EVAL_SOURCE}')
, sz AS (SELECT doc, count(*) AS n_sh FROM tr GROUP BY doc)
, ht AS (SELECT doc, count(*) AS n_hit FROM tr JOIN ev USING (s) GROUP BY doc)
SELECT sz.doc, n_sh, coalesce(n_hit, 0) AS n_hit,
       (10000 * coalesce(n_hit, 0)) // n_sh AS contam_bp,
       CAST((10000 * coalesce(n_hit, 0)) // n_sh >= 2000 AS INTEGER)
           AS is_contaminated
FROM sz LEFT JOIN ht ON sz.doc = ht.doc
"""
)


#: td25 — fuzzy decontamination: eval slice + Jaccard threshold. The
#: doc_id % 7 slice cross-cuts the planted near-dup pairs (a
#: source-based slice would leave only one cross-boundary pair at
#: sf0.01); τ = 1/2 keeps the gate output non-trivial (9 rows sf0.01)
#: while any real pipeline would set τ per its eval-leak tolerance.
TD25_MOD = 7
TD25_TAU = (1, 2)


def td25_fuzzy_decontam(spark: SparkSession, sf: str) -> DataFrame:
    """Fuzzy decontamination (textops/decontam.py::
    fuzzy_contamination_pairs): every (training doc, benchmark doc)
    pair with shingle-Jaccard ≥ 1/2 — the near-duplicate eval-leak
    check real pipelines run AFTER td9's exact-overlap share (a
    paraphrased eval question still leaks; per-shingle overlap can't
    name WHICH eval doc leaked). Exact recall-1 bipartite blocking
    (shared-shingle equi-join, benchmark side broadcast, corpus never
    shuffles for candidates) + integer cross-multiplied verify; the
    brute-force DuckDB oracle therefore doubles as the losslessness
    proof of the blocking (the td24 discipline)."""
    from omfietser_etl_spark.textops.decontam import fuzzy_contamination_pairs

    docs = load(spark, sf, "documents")
    num, den = TD25_TAU
    return fuzzy_contamination_pairs(
        docs.filter(F.col("doc_id") % TD25_MOD != 0),
        docs.filter(F.col("doc_id") % TD25_MOD == 0),
        "doc_id",
        "text",
        tau_num=num,
        tau_den=den,
    )


TD25_ORACLE = (
    _DOCS_CTE
    + f"""
, tr AS (SELECT doc, s FROM sh WHERE doc % {TD25_MOD} <> 0)
, ev AS (SELECT doc, s FROM sh WHERE doc % {TD25_MOD} = 0)
, szt AS (SELECT doc, count(*) AS n_t FROM tr GROUP BY doc)
, sze AS (SELECT doc, count(*) AS n_e FROM ev GROUP BY doc)
, inter AS (SELECT tr.doc AS doc, ev.doc AS bench,
                   CAST(count(*) AS BIGINT) AS n_inter
            FROM tr JOIN ev USING (s) GROUP BY 1, 2)
SELECT i.doc, i.bench, i.n_inter,
       CAST((10000 * i.n_inter) // (szt.n_t + sze.n_e - i.n_inter)
            AS BIGINT) AS jaccard_bp
FROM inter i
JOIN szt ON szt.doc = i.doc
JOIN sze ON sze.doc = i.bench
WHERE {TD25_TAU[1]} * i.n_inter
      >= {TD25_TAU[0]} * (szt.n_t + sze.n_e - i.n_inter)
"""
)


TD18_BP = 2000


def td18_bloom_decontam(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-bounded decontamination (textops/sketch.py): same
    semantics as td9 except the eval shingle set is a Bloom filter —
    the path when the benchmark suite's shingle set outgrows an exact
    broadcast set (the filter is a fixed m bits however many shingles
    it absorbs; false positives only ever OVER-flag, never leak a
    contaminated doc). Fully deterministic, so the oracle replays the
    filter bit for bit — including its false positives."""
    from omfietser_etl_spark.textops.dedup import doc_shingles
    from omfietser_etl_spark.textops.sketch import bloom_build, bloom_hits

    docs = load(spark, sf, "documents")
    ev_sh = doc_shingles(
        docs.filter(F.col("source") == EVAL_SOURCE), "doc_id", "text"
    ).select("s").distinct()
    bloom = bloom_build(ev_sh, "s")
    tr_sh = doc_shingles(
        docs.filter(F.col("source") != EVAL_SOURCE), "doc_id", "text"
    )
    per_doc = (
        bloom_hits(tr_sh, "s", bloom)
        .groupBy("doc")
        .agg(
            F.count("*").cast("long").alias("n_sh"),
            F.sum(F.when(F.col("might_contain"), 1).otherwise(0))
            .cast("long")
            .alias("n_hit"),
        )
    )
    return per_doc.select(
        "doc", "n_sh", "n_hit",
        F.expr("(10000 * n_hit) div n_sh").alias("contam_bp"),
        F.expr(f"(10000 * n_hit) div n_sh >= {TD18_BP}").alias("flagged"),
    )


def _td18_oracle() -> str:
    from omfietser_etl_spark.textops.sketch import BLOOM_K, BLOOM_M, CMS_H2_XOR

    rows = ", ".join(str(r) for r in range(BLOOM_K))
    hashes = (
        f"SELECT s, ({dk_mix31('p')}) AS h1, "
        f"({dk_mix31(f'xor(p, {CMS_H2_XOR})')}) AS h2"
    )
    base = _DOCS_CTE.replace(
        "WITH d AS (SELECT doc_id AS doc, ",
        "WITH d AS (SELECT doc_id AS doc, source, ",
    ).replace(
        "sh AS (SELECT doc, unnest(",
        "sh AS (SELECT doc, source, unnest(",
    )
    return base + f"""
, rs AS (SELECT unnest([{rows}]) AS r)
, ev AS (SELECT DISTINCT s FROM sh WHERE source = '{EVAL_SOURCE}')
, evp AS (SELECT s, {dk_poly('s')} AS p FROM ev)
, evh AS ({hashes} FROM evp)
, bloom AS (SELECT DISTINCT (h1 + r * h2) % {BLOOM_M} AS pos
            FROM evh CROSS JOIN rs)
, tr AS (SELECT doc, s FROM sh WHERE source <> '{EVAL_SOURCE}')
, ds AS (SELECT DISTINCT s FROM tr)
, dsp AS (SELECT s, {dk_poly('s')} AS p FROM ds)
, dsh AS ({hashes} FROM dsp)
, pr AS (SELECT s, (h1 + r * h2) % {BLOOM_M} AS pos FROM dsh CROSS JOIN rs)
, mc AS (SELECT pr.s AS s, count(bloom.pos) = {BLOOM_K} AS might
         FROM pr LEFT JOIN bloom USING (pos) GROUP BY pr.s)
, ag AS (SELECT doc, CAST(count(*) AS BIGINT) AS n_sh,
                CAST(sum(CASE WHEN might THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         FROM tr JOIN mc ON tr.s = mc.s GROUP BY doc)
SELECT doc, n_sh, n_hit,
       (10000 * n_hit) // n_sh AS contam_bp,
       (10000 * n_hit) // n_sh >= {TD18_BP} AS flagged
FROM ag
"""


def ta9_gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher document-level quality rule battery (Rae et al. 2021):
    word-count/word-length bounds, symbol ratio, bullet/ellipsis line
    shares, alpha-word fraction, required stopwords — every ratio an
    exact integer cross-multiplication so the oracle replays each
    verdict bit-for-bit (textops/analysis.py::gopher_rules)."""
    from omfietser_etl_spark.textops.analysis import gopher_rules

    return gopher_rules(load(spark, sf, "documents"), "doc_id", "text")


def _ta9_oracle() -> str:
    from omfietser_etl_spark.textops.analysis import (
        GOPHER_MAX_WORDS,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
    )

    sw = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""
WITH s AS (
  SELECT doc_id AS doc,
    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w,
    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                l -> l <> '') AS lines
  FROM documents),
c AS (
  SELECT s.doc,
    CAST(len(w) AS BIGINT) AS n_words,
    CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS BIGINT)
      AS sum_word_len,
    CAST(length(d.text) - length(replace(d.text, '#', ''))
         + (length(d.text) - length(replace(d.text, '...', ''))) // 3
         AS BIGINT) AS n_symbols,
    CAST(len(lines) AS BIGINT) AS n_lines,
    CAST(len(list_filter(lines, l -> substring(l, 1, 1) IN ('•', '-', '*')))
         AS BIGINT) AS n_bullet,
    CAST(len(list_filter(lines, l -> l LIKE '%...' OR l LIKE '%…'))
         AS BIGINT) AS n_ellipsis,
    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
         AS BIGINT) AS n_alpha_words,
    CAST(len(list_intersect(
      list_distinct(list_filter(string_split_regex(lower(d.text), '\\s+'),
                                x -> x <> '')), [{sw}])) AS BIGINT) AS n_stopwords
  FROM s JOIN documents d ON d.doc_id = s.doc)
SELECT doc, n_words,
  n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS} AS ok_word_count,
  3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words AS ok_word_len,
  10 * n_symbols < n_words AS ok_symbol_ratio,
  10 * n_bullet <= 9 * n_lines AND 10 * n_ellipsis <= 3 * n_lines
    AS ok_bullet_ellipsis,
  5 * n_alpha_words >= 4 * n_words AS ok_alpha_words,
  n_stopwords >= {GOPHER_MIN_STOPWORDS} AS ok_stopwords,
  (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
    AND (3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words)
    AND (10 * n_symbols < n_words)
    AND (10 * n_bullet <= 9 * n_lines AND 10 * n_ellipsis <= 3 * n_lines)
    AND (5 * n_alpha_words >= 4 * n_words)
    AND (n_stopwords >= {GOPHER_MIN_STOPWORDS}) AS pass_all
FROM c
"""


def ta10_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc character-entropy numerator in exact integer 2^-20
    log2 units (gibberish/degeneracy signal;
    textops/analysis.py::char_entropy_stats — same ilog2_q machinery
    as ts15, replayed bit-for-bit by the oracle)."""
    from omfietser_etl_spark.textops.analysis import char_entropy_stats

    return char_entropy_stats(load(spark, sf, "documents"), "doc_id", "text")


def _ta10_oracle() -> str:
    from omfietser_etl_spark.textops.selection import DSIR_F, DSIR_Q

    return f"""
WITH d AS (SELECT doc_id AS doc, {DK_NORM.format(c="text")} AS s FROM documents),
ch AS (SELECT doc, unnest(list_filter(string_split_regex(s, ''), c -> c <> '')) AS ch
       FROM d),
cnt AS (SELECT doc, ch, CAST(count(*) AS BIGINT) AS c FROM ch GROUP BY 1, 2),
pd AS (SELECT doc, CAST(SUM(c) AS BIGINT) AS n_chars FROM cnt GROUP BY doc),
vals AS (SELECT DISTINCT c AS x FROM cnt UNION SELECT DISTINCT n_chars FROM pd),
{dk_ilog2_chain('vals', DSIR_Q, DSIR_F)},
sums AS (SELECT cnt.doc, CAST(SUM(cnt.c * il.il) AS BIGINT) AS sum_c_il
         FROM cnt JOIN il ON il.x = cnt.c GROUP BY 1)
SELECT pd.doc, pd.n_chars,
       CAST(pd.n_chars * iln.il - s.sum_c_il AS BIGINT) AS ent_q
FROM pd
JOIN il iln ON iln.x = pd.n_chars
JOIN sums s ON s.doc = pd.doc
"""


def ta11_zipf_slope(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-level Zipf's-law slope: exact-integer least-squares fit
    of ilog2_q(freq) on ilog2_q(rank) over the top-256 terms
    (textops/analysis.py::zipf_slope) — slope_num/slope_den ≈ −1 for
    natural text; the oracle replays the whole fit bit-for-bit
    (ranks/freqs through the same square-and-compare log at q=14)."""
    from omfietser_etl_spark.textops.analysis import zipf_slope

    return zipf_slope(load(spark, sf, "documents"), "text")


def _ta11_oracle() -> str:
    from omfietser_etl_spark.textops.analysis import ZIPF_Q, ZIPF_TOP_V
    from omfietser_etl_spark.textops.selection import DSIR_F

    return f"""
WITH d AS (SELECT {DK_TOKENS.format(c="text")} AS t FROM documents),
tok AS (SELECT unnest(t) AS term FROM d),
cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY term),
top AS (SELECT term, freq,
               CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT) AS rk
        FROM cnt ORDER BY freq DESC, term LIMIT {ZIPF_TOP_V}),
vals AS (SELECT DISTINCT rk AS x FROM top UNION SELECT DISTINCT freq FROM top),
{dk_ilog2_chain('vals', ZIPF_Q, DSIR_F)},
pts AS (SELECT ir.il AS x, iy.il AS y FROM top
        JOIN il ir ON ir.x = top.rk
        JOIN il iy ON iy.x = top.freq),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
             CAST(SUM(x) AS BIGINT) AS sum_x,
             CAST(SUM(y) AS BIGINT) AS sum_y,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts)
SELECT n_terms, sum_x, sum_y,
       CAST(n_terms * sxy - sum_x * sum_y AS BIGINT) AS slope_num,
       CAST(n_terms * sxx - sum_x * sum_x AS BIGINT) AS slope_den
FROM s
"""


def ta12_ks_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source distribution-drift monitor: exact-integer two-sample
    KS distance (source vs rest of corpus) over document length
    (textops/analysis.py::ks_drift) — cross products staged
    DECIMAL(38,0) so the statistic survives 10^12-doc corpora; the
    oracle replays grid, cumulatives and tie-break bit-for-bit."""
    from omfietser_etl_spark.textops.analysis import ks_drift

    return ks_drift(load(spark, sf, "documents"), "source", "n_chars")


TA12_ORACLE = """
WITH vals AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v FROM documents),
counts AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY g, v),
grid AS (SELECT g, v FROM (SELECT DISTINCT v FROM counts)
         CROSS JOIN (SELECT DISTINCT g FROM counts)),
filled AS (SELECT grid.g, grid.v, COALESCE(counts.c, 0) AS c
           FROM grid LEFT JOIN counts USING (g, v)),
cum AS (SELECT g, v, CAST(SUM(c) OVER (PARTITION BY g ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM filled),
tot AS (SELECT v, CAST(SUM(cum) AS BIGINT) AS cum_all FROM cum GROUP BY v),
ng AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_g FROM counts GROUP BY g),
na AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n_all FROM ng),
d AS (SELECT cum.g, cum.v, ng.n_g, na.n_all - ng.n_g AS n_rest,
             abs(CAST(na.n_all - ng.n_g AS HUGEINT) * cum.cum
                 - CAST(ng.n_g AS HUGEINT) * (tot.cum_all - cum.cum)) AS dd
      FROM cum JOIN tot USING (v) JOIN ng USING (g) CROSS JOIN na),
m AS (SELECT g, n_g, n_rest, max(dd) AS dmax FROM d GROUP BY g, n_g, n_rest)
SELECT m.g AS source, m.n_g, m.n_rest,
       min(d.v) AS v_at_max,
       CAST((10000 * m.dmax) // (CAST(m.n_g AS HUGEINT) * m.n_rest) AS BIGINT)
         AS ks_bp
FROM m JOIN d ON d.g = m.g AND d.dd = m.dmax
GROUP BY m.g, m.n_g, m.n_rest, m.dmax
"""


def ta5_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate / top 2-gram
    fractions per doc, exact integers end to end."""
    from omfietser_etl_spark.textops.decontam import ngram_repetition_stats

    return ngram_repetition_stats(load(spark, sf, "documents"), "doc_id", "text")


TA5_ORACLE = f"""
WITH d AS (SELECT doc_id AS doc, {DK_TOKENS.format(c='text')} AS t FROM documents),
g AS (SELECT doc, unnest(CASE WHEN len(t) >= 2 THEN
          [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]
          ELSE [] END) AS g FROM d),
pg AS (SELECT doc, g, count(*) AS cnt FROM g GROUP BY doc, g)
SELECT doc,
       CAST(sum(cnt) AS BIGINT) AS n_grams,
       max(cnt) AS top_cnt,
       CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_cnt,
       (10000 * CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT))
           // CAST(sum(cnt) AS BIGINT) AS dup_bp
FROM pg GROUP BY doc
"""


def ta8_bigram_fluency(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style statistical fluency screen in exact integers
    (textops/analysis.py::bigram_fluency): per-doc floor-average of
    bigram conditional frequencies under the corpus's own model."""
    from omfietser_etl_spark.textops.analysis import bigram_fluency

    return bigram_fluency(load(spark, sf, "documents"), "doc_id", "text")


TA8_ORACLE = f"""
WITH d AS (SELECT doc_id AS doc, {DK_TOKENS.format(c='text')} AS t FROM documents),
b0 AS (SELECT doc, unnest(CASE WHEN len(t) >= 2 THEN
          [struct_pack(w1 := t[i], w2 := t[i + 1]) for i in range(1, len(t))]
          ELSE [] END) AS s FROM d),
bb AS (SELECT doc, s.w1 AS w1, s.w2 AS w2 FROM b0),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bb GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM bb GROUP BY 1),
sc AS (SELECT doc, (10000 * c2.c2) // c1.c1 AS p_bp
       FROM bb JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
pd AS (SELECT doc, CAST(count(*) AS BIGINT) AS n_bigrams,
              CAST(sum(p_bp) // count(*) AS BIGINT) AS fluency_bp
       FROM sc GROUP BY doc)
SELECT d.doc,
       CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(fluency_bp, 0) AS BIGINT) AS fluency_bp
FROM d LEFT JOIN pd ON d.doc = pd.doc
"""


def ts18_perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (textops/
    selection.py::perplexity_buckets): rank by the ta8 exact-integer
    bigram fluency, cut at integer thirds. The rank runs through the
    distributed exact rank (never a single-partition window); the
    oracle replays the LM, the global row_number and the
    cross-multiplied third boundaries bit-for-bit."""
    from omfietser_etl_spark.textops.selection import perplexity_buckets

    return perplexity_buckets(load(spark, sf, "documents"), "doc_id", "text")


TS18_ORACLE = f"""
WITH f AS ({TA8_ORACLE}),
r AS (SELECT doc, n_bigrams, fluency_bp,
             CAST(row_number() OVER (ORDER BY fluency_bp DESC, doc ASC)
                  AS BIGINT) AS rk,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM f)
SELECT doc, n_bigrams, fluency_bp, rk,
       CASE WHEN rk * 3 <= n THEN 'head'
            WHEN rk * 3 <= 2 * n THEN 'middle'
            ELSE 'tail' END AS bucket
FROM r
"""


def ta6_strip_markup(spark: SparkSession, sf: str) -> DataFrame:
    """Markup stripping gated end to end: deterministic HTML wrapping
    (tags + entities + script/style/comment noise) is synthesized
    around each document, then textops.analysis.strip_markup must
    recover clean text. The oracle replays the SAME ordered regex
    chain (shared MARKUP_STRIP_STEPS constants), so a reordered or
    altered step fails the hash."""
    from omfietser_etl_spark.textops.analysis import strip_markup

    docs = load(spark, sf, "documents").select("doc_id", "text")
    html = F.concat(
        F.lit('<html><head><style>p {color: red}</style>'
              '<script>var x = "1 < 2";</script></head><body><!-- c -->'
              '<div id="d'),
        F.col("doc_id").cast("string"),
        F.lit('"><p>'),
        F.col("text"),
        F.lit('</p><span>&amp; tail &lt;b&gt; &quot;q&quot; &#39;s&#39;'
              '&nbsp;end</span></body></html>'),
    )
    wrapped = docs.select(F.col("doc_id").alias("doc"), html.alias("html"))
    return wrapped.select(
        "doc",
        strip_markup("html").alias("clean_text"),
        F.length("html").alias("n_raw_chars"),
    )


def _ta6_oracle() -> str:
    from omfietser_etl_spark.textops.analysis import MARKUP_STRIP_STEPS

    expr = "html"
    for pat, rep in MARKUP_STRIP_STEPS:
        pat_sql = pat.replace("'", "''")
        rep_sql = rep.replace("'", "''").replace('"', '"')
        # 'g' = global (Spark is always-global); dotall comes from the
        # embedded (?s) so both engines honor the same inline flag.
        expr = f"regexp_replace({expr}, '{pat_sql}', '{rep_sql}', 'g')"
    return f"""
WITH w AS (
  SELECT doc_id AS doc,
    '<html><head><style>p {{color: red}}</style>'
    || '<script>var x = "1 < 2";</script></head><body><!-- c -->'
    || '<div id="d' || CAST(doc_id AS VARCHAR) || '"><p>' || text
    || '</p><span>&amp; tail &lt;b&gt; &quot;q&quot; &#39;s&#39;'
    || '&nbsp;end</span></body></html>' AS html
  FROM documents)
SELECT doc, trim({expr}) AS clean_text, length(html) AS n_raw_chars FROM w
"""


TD11_MAX_OCC = 2


def td11_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-wide line-level dedup (C4 boilerplate rule) gated end to
    end: every document is wrapped in a shared navigation header and
    a footer shared by one fifth of the corpus; the operator must drop
    exactly the over-represented lines and reassemble the remaining
    text in original order."""
    from omfietser_etl_spark.textops.decontam import line_dedup

    docs = load(spark, sf, "documents").select("doc_id", "text")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("SHARED NAVIGATION HEADER\n"),
            F.col("text"),
            F.lit("\nfooter block "),
            (F.col("doc_id") % 5).cast("string"),
        ).alias("t"),
    )
    return line_dedup(wrapped, "doc_id", "t", TD11_MAX_OCC)


TD11_ORACLE = f"""
WITH d AS (
  SELECT doc_id AS doc,
         'SHARED NAVIGATION HEADER' || chr(10) || text || chr(10)
         || 'footer block ' || CAST(doc_id % 5 AS VARCHAR) AS t
  FROM documents),
sp AS (SELECT doc, string_split(t, chr(10)) AS ls FROM d),
l AS (SELECT doc, unnest(list_transform(range(0, len(ls)),
          i -> struct_pack(pos := i, line := ls[i + 1]))) AS s FROM sp),
l2 AS (SELECT doc, s.pos AS pos, s.line AS line FROM l),
c AS (SELECT line, count(DISTINCT doc) AS n_occ FROM l2 GROUP BY line),
t2 AS (SELECT doc, pos, l2.line, (n_occ <= {TD11_MAX_OCC}) AS keep
       FROM l2 JOIN c USING (line))
SELECT doc,
  coalesce(array_to_string(
      list_transform(
          list_sort(list(struct_pack(pos := pos, line := line))
                    FILTER (WHERE keep)),
          s -> s.line),
      chr(10)), '') AS clean_text,
  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM t2 GROUP BY doc
"""


TD14_K = 8


def td14_substring_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact substring dedup (ExactSubstr, Lee et al. 2021) gated end
    to end: a quarter of the corpus shares a 12-token slogan prefix
    and a seventh shares a 10-token footer, so the operator must cut
    exactly those cross-document runs (plus any natural >=8-token
    verbatim overlap) and reassemble the survivors in order."""
    from omfietser_etl_spark.textops.dedup import substring_dedup

    docs = load(spark, sf, "documents").select("doc_id", "text")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit("shared slogan run that repeats verbatim across many "
                      "documents in this corpus "),
            ).otherwise(F.lit("")),
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit(" common footer block appended to every seventh "
                      "document here"),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    return substring_dedup(wrapped, "doc_id", "t", k=TD14_K)


TD14_ORACLE = f"""
WITH d AS (
  SELECT doc_id AS doc,
         CASE WHEN doc_id % 4 = 0
              THEN 'shared slogan run that repeats verbatim across many documents in this corpus '
              ELSE '' END
         || text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' common footer block appended to every seventh document here'
                 ELSE '' END AS t
  FROM documents),
base AS (SELECT doc, string_split(t, ' ') AS toks FROM d),
b2 AS (SELECT doc, toks, len(toks) AS n_tokens FROM base),
g AS (SELECT doc, unnest(range(0, n_tokens - {TD14_K} + 1)) AS pos, toks FROM b2),
grams AS (SELECT doc, pos,
                 array_to_string(list_slice(toks, pos + 1, pos + {TD14_K}), ' ') AS gram
          FROM g),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc) >= 2),
marked AS (SELECT doc, pos FROM grams JOIN dup USING (gram)),
covered AS (SELECT DISTINCT doc, tpos FROM
            (SELECT doc, unnest(range(pos, pos + {TD14_K})) AS tpos FROM marked)),
runs AS (SELECT doc, tpos,
                tpos - row_number() OVER (PARTITION BY doc ORDER BY tpos) AS grp
         FROM covered),
cstat AS (SELECT doc, count(*) AS dup_token_cnt, count(DISTINCT grp) AS dup_span_cnt
          FROM runs GROUP BY doc),
tokpos AS (SELECT doc, unnest(list_transform(range(0, len(toks)),
               i -> struct_pack(tpos := i, tok := toks[i + 1]))) AS s FROM b2),
tp AS (SELECT doc, s.tpos AS tpos, s.tok AS tok FROM tokpos),
kept AS (SELECT doc, tpos, tok FROM tp
         WHERE NOT EXISTS (SELECT 1 FROM covered c
                           WHERE c.doc = tp.doc AND c.tpos = tp.tpos)),
cl AS (SELECT doc, array_to_string(
           list_transform(list_sort(list(struct_pack(tpos := tpos, tok := tok))),
                          s -> s.tok), ' ') AS clean_text
       FROM kept GROUP BY doc)
SELECT b2.doc,
       coalesce(cl.clean_text, '') AS clean_text,
       CAST(b2.n_tokens AS BIGINT) AS n_tokens,
       CAST(coalesce(cstat.dup_token_cnt, 0) AS BIGINT) AS dup_token_cnt,
       CAST(coalesce(cstat.dup_span_cnt, 0) AS BIGINT) AS dup_span_cnt
FROM b2 LEFT JOIN cl ON b2.doc = cl.doc LEFT JOIN cstat ON b2.doc = cstat.doc
"""


TA7_LO_PCT, TA7_HI_PCT = 10, 99  # keep docs inside [p10, p99] of their language


def ta7_relative_length_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Adaptive length screening: instead of one global token-count
    threshold, each document is judged against ITS LANGUAGE's length
    distribution — keep docs inside [p10, p99] per language
    (nearest-rank, exact integer cutoffs, a15's discipline).

    One sort-shuffle on the language key computes rank and count for
    every doc; the keep decision is pure integer arithmetic on that
    single window pass. Output marks rather than drops, so the same
    query doubles as the screening report."""
    docs = load(spark, sf, "documents").select("doc_id", "lang", "text")
    d = docs.withColumn("n_tok", ws_token_count("text"))
    w = Window.partitionBy("lang").orderBy("n_tok", "doc_id")
    ranked = d.select(
        "doc_id",
        "lang",
        "n_tok",
        F.row_number().over(w).alias("rnk"),
        F.count("*").over(Window.partitionBy("lang")).alias("n_lang"),
    )
    keep = (
        (F.col("rnk") * 100 > F.col("n_lang") * TA7_LO_PCT)
        & (F.col("rnk") * 100 <= F.col("n_lang") * TA7_HI_PCT)
    )
    return ranked.select(
        "doc_id", "lang", "n_tok", F.when(keep, 1).otherwise(0).alias("keep")
    )


TA7_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
             AS BIGINT) AS n_tok
  FROM documents),
r AS (
  SELECT doc_id, lang, n_tok,
         row_number() OVER (PARTITION BY lang ORDER BY n_tok, doc_id) AS rnk,
         count(*) OVER (PARTITION BY lang) AS n_lang
  FROM d)
SELECT doc_id, lang, n_tok,
       CAST(CASE WHEN rnk * 100 > n_lang * {TA7_LO_PCT}
                  AND rnk * 100 <= n_lang * {TA7_HI_PCT}
            THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM r
"""


# ---------------------------------------------------------------- #
# ta1-ta4 — text analysis
# ---------------------------------------------------------------- #

def ta1_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    return (
        docs.select(
            "source",
            "n_chars",
            ws_token_count("text").alias("ws"),
            bpe_ish_token_count("text").alias("bpe"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
            # exact-integer ratio — round(avg, 2) ties apart across
            # engines (see functions/exact.py).
            F.floor(F.sum("n_chars") * 100.0 / F.count("*"))
            .cast("long")
            .alias("avg_chars_x100"),
        )
    )


TA1_ORACLE = r"""
SELECT source, count(*) AS n_docs, CAST(sum(ws) AS BIGINT) AS ws_tokens, CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
       CAST(floor(sum(n_chars) * 100.0 / count(*)) AS BIGINT) AS avg_chars_x100
FROM (SELECT source, n_chars,
        len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS ws,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(regexp_extract_all(text, '\w+|[^\w\s]'),
                t -> CAST(ceil(length(t) / 4.0) AS BIGINT))),
            (a, b) -> a + b) AS bpe
      FROM documents)
GROUP BY source
"""


def ta2_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Additive quality score (reference shape:
    product-quality-service.ts:90-158 — base + threshold bonuses)."""
    docs = load(spark, sf, "documents")
    en = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    d = docs.select(
        F.col("doc_id").alias("doc"),
        tokens("text").alias("t"),
    ).select(
        "doc",
        F.expr("size(t)").alias("n_tok"),
        F.expr("size(array_distinct(t))").alias("n_uniq"),
        F.expr(f"size(filter(t, x -> array_contains(array({en}), x)))").alias("n_stop"),
    )
    # Raw IEEE quotients for the threshold tests (deterministic — same
    # integer inputs, same division on both engines); floor-bp integers
    # for the emitted ratio columns (see functions/exact.py).
    uniq_raw = F.col("n_uniq") / F.col("n_tok")
    stop_raw = F.col("n_stop") / F.col("n_tok")
    d = d.withColumn("uniq_ratio_bp", F.floor(F.col("n_uniq") * 10000.0 / F.col("n_tok")).cast("long"))
    d = d.withColumn("stop_ratio_bp", F.floor(F.col("n_stop") * 10000.0 / F.col("n_tok")).cast("long"))
    return d.select(
        "doc",
        "uniq_ratio_bp",
        "stop_ratio_bp",
        (
            F.lit(50)
            + F.when((F.col("n_tok") >= 10) & (F.col("n_tok") <= 1000), 20).otherwise(0)
            + F.when(uniq_raw > 0.5, 15).otherwise(0)
            + F.when((stop_raw >= 0.02) & (stop_raw <= 0.6), 15).otherwise(0)
        ).alias("score"),
    )


def _ta2_oracle() -> str:
    en = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    return (
        "WITH d AS (SELECT doc_id AS doc, "
        + DK_TOKENS.format(c="text")
        + " AS t FROM documents), "
        "m AS (SELECT doc, len(t) AS n_tok, len(list_distinct(t)) AS n_uniq, "
        f"len(list_filter(t, x -> list_contains([{en}], x))) AS n_stop FROM d) "
        "SELECT doc, "
        "CAST(floor(n_uniq * 10000.0 / n_tok) AS BIGINT) AS uniq_ratio_bp, "
        "CAST(floor(n_stop * 10000.0 / n_tok) AS BIGINT) AS stop_ratio_bp, "
        "50 + (CASE WHEN n_tok BETWEEN 10 AND 1000 THEN 20 ELSE 0 END) "
        "+ (CASE WHEN n_uniq / n_tok > 0.5 THEN 15 ELSE 0 END) "
        "+ (CASE WHEN n_stop / n_tok BETWEEN 0.02 AND 0.6 THEN 15 ELSE 0 END) AS score "
        "FROM m"
    )


def ta3_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    d = docs.withColumn("t", tokens("text")).select(
        F.col("lang").alias("lang_true"), lang_id("text", "t").alias("lang_pred")
    )
    return d.groupBy("lang_true", "lang_pred").agg(F.count("*").alias("n"))


def _ta3_oracle() -> str:
    scores = []
    for lang in ("en", "de", "es", "fr"):
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        scores.append(
            f"len(list_filter(t, x -> list_contains([{words}], x))) AS s_{lang}"
        )
    langs = ("en", "de", "es", "fr")
    cases = []
    for lang in langs:
        conds = [f"s_{lang} > 0"] + [
            f"s_{lang} >= s_{o}" for o in langs if o != lang
        ]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return (
        "WITH d AS (SELECT lang AS lang_true, text, "
        + DK_TOKENS.format(c="text")
        + " AS t FROM documents), "
        "m AS (SELECT lang_true, text, " + ", ".join(scores) + " FROM d) "
        "SELECT lang_true, CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') "
        "THEN 'zh' " + " ".join(cases) + " ELSE 'und' END AS lang_pred, "
        "count(*) AS n FROM m GROUP BY 1, 2"
    )


def ta4_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprint: exact polynomial rolling hash over the
    normalized text (reference D7 content hash, generalized)."""
    docs = load(spark, sf, "documents")
    return docs.select(
        F.col("doc_id").alias("doc"),
        poly_hash_over_norm().alias("fp"),
    )


def poly_hash_over_norm():
    nt = "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' '))"
    return F.expr(
        f"aggregate(split({nt}, ''), CAST({CHAR_SEED} AS BIGINT), "
        f"(a, c) -> (a * 31 + ascii(c)) % {MOD})"
    )


TA4_ORACLE = (
    "SELECT doc_id AS doc, "
    + dk_poly(DK_NORM.format(c="text"))
    + " AS fp FROM documents"
)


# ---------------------------------------------------------------- #
# dd4 — near-dup connected components (transitive closure of the
#       MinHash-LSH pair graph: A~B, B~C → one keep-group)
# ---------------------------------------------------------------- #

def dd4_neardup_components(spark: SparkSession, sf: str) -> DataFrame:
    pairs = dd.minhash_lsh_pairs(load(spark, sf, "documents"), "doc_id", "text")
    return dd.connected_components(pairs)


def dd5_star_components(spark: SparkSession, sf: str) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.
    2014; textops/dedup.py::connected_components_star) over the SAME
    td3 LSH pair graph as dd4 — upgrading the O(log²)-round
    alternative from unit-only to the full driver gate under the
    identical recursive-CTE oracle: both algorithms must produce the
    same (node, min-reachable-id) partition."""
    pairs = dd.minhash_lsh_pairs(load(spark, sf, "documents"), "doc_id", "text")
    return dd.connected_components_star(pairs)


def _dd4_oracle() -> str:
    """Recursive-CTE transitive closure over the SAME pair graph the
    td3 oracle produces; component = min reachable node (order-free,
    so it matches Spark's iterative min-label propagation exactly)."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_lo, doc_hi FROM ({_td3_oracle()})
), edges AS (
  SELECT doc_lo AS a, doc_hi AS b FROM pairs
  UNION
  SELECT doc_hi AS a, doc_lo AS b FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
)
SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a
"""


# ---------------------------------------------------------------- #
# td15 — fuzzy dedup END-TO-END: MinHash-LSH pairs → connected
#        components → canonical-doc election → keep/drop decision
#        for EVERY document (the full corpus-dedup pipeline a
#        training-data run executes, not just the pair list)
# ---------------------------------------------------------------- #

#: tp2 entropy screen: keep docs whose char entropy lands in
#: [2, 5] bits/char (cross-multiplied against ta10's exact 2^-20
#: integer numerator; below = degenerate repetition, above = noise).
TP2_ENT_MIN_BITS, TP2_ENT_MAX_BITS = 2, 5


def tp2_screen_dedup_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """FineWeb-ordered quality-then-dedup pipeline, decision per
    document: Gopher rule battery (ta9) AND char-entropy band (ta10)
    first, then MinHash-LSH fuzzy dedup (td3→dd4→td15 logic) over
    the SURVIVORS only — the realistic composition (screens are
    map-side cheap; dedup's shuffles then run on the smaller slice).
    Every stage is an individually-gated operator; this gates their
    composition, including that LSH-on-the-subset equals
    LSH-on-everything filtered to surviving endpoints (band buckets
    are per-doc, so the oracle may reuse the full td3 pair oracle).

    Output one row per INPUT doc: (doc, source, pass_gopher,
    pass_entropy, component, comp_size, is_kept) — screened-out docs
    carry their own id as component, comp_size 0, is_kept false.

    Scale shape: the flags frame persists at the fan-out (it feeds
    the dedup input AND the final join — the tp1 materialize
    discipline); dedup shuffles only survivor rows. Round 12: the
    screens are INLINED as per-row columns (gopher_stat/flag_cols +
    char_entropy_expr) instead of joining gopher_rules /
    char_entropy_stats back on doc — the flags frame is now one
    map-side projection chain over the scan with ZERO exchanges
    (guide §2.4; before: two self-joins of the documents scan, plus
    entropy's own two explode-shuffles). The empty-normalized-text
    filter replicates the old inner join against char_entropy_stats,
    which dropped those docs (no character rows → no group)."""
    from omfietser_etl_spark import cacheutil
    from omfietser_etl_spark.textops.analysis import (
        char_entropy_q_col,
        gopher_flag_cols,
        gopher_stat_cols,
        norm_text,
    )
    from omfietser_etl_spark.textops.selection import DSIR_Q

    scale = 1 << DSIR_Q
    docs = load(spark, sf, "documents")
    staged = docs.select(
        F.col("doc_id").alias("doc"), "source", "text",
        norm_text("text").alias("_s"),
    ).filter(F.length("_s") > 0)
    stats = staged.select(
        "doc", "source", "text",
        *gopher_stat_cols("text"),
        F.length("_s").cast("long").alias("_n_chars"),
        char_entropy_q_col("_s").cast("long").alias("_ent_q"),
    )
    flagged = stats.select(
        "doc", "source", "text",
        F.struct(*gopher_flag_cols()).alias("_g"),
        (
            (F.col("_ent_q") >= TP2_ENT_MIN_BITS * F.col("_n_chars") * scale)
            & (F.col("_ent_q") <= TP2_ENT_MAX_BITS * F.col("_n_chars") * scale)
        ).alias("pass_entropy"),
    ).select(
        "doc", "source", "text",
        (
            F.col("_g.ok_word_count") & F.col("_g.ok_word_len")
            & F.col("_g.ok_symbol_ratio") & F.col("_g.ok_bullet_ellipsis")
            & F.col("_g.ok_alpha_words") & F.col("_g.ok_stopwords")
        ).alias("pass_gopher"),
        "pass_entropy",
    )
    flags = cacheutil.release_then_register("tp2", flagged.persist())
    surv = flags.filter("pass_gopher AND pass_entropy").select("doc", "text")
    pairs = dd.minhash_lsh_pairs(surv, "doc", "text")
    comp = dd.connected_components(pairs)
    full = (
        surv.select("doc")
        .join(comp, F.col("doc") == F.col("node"), "left")
        .select("doc", F.coalesce("component", "doc").alias("component"))
    )
    w = Window.partitionBy("component")
    dec = full.select(
        "doc",
        "component",
        F.count("*").over(w).cast("long").alias("comp_size"),
        (F.col("doc") == F.min("doc").over(w)).alias("is_kept"),
    )
    return (
        flags.select("doc", "source", "pass_gopher", "pass_entropy")
        .join(dec, "doc", "left")
        .select(
            "doc",
            "source",
            "pass_gopher",
            "pass_entropy",
            F.coalesce("component", F.col("doc")).cast("long").alias("component"),
            F.coalesce("comp_size", F.lit(0)).cast("long").alias("comp_size"),
            F.coalesce("is_kept", F.lit(False)).alias("is_kept"),
        )
    )


def _tp2_oracle() -> str:
    from omfietser_etl_spark.textops.selection import DSIR_Q

    scale = 1 << DSIR_Q
    return f"""
WITH RECURSIVE
g AS MATERIALIZED (SELECT * FROM ({_ta9_oracle()}) AS _g),
ent AS MATERIALIZED (SELECT * FROM ({_ta10_oracle()}) AS _e),
flags AS MATERIALIZED (SELECT d.doc_id AS doc, d.source, g.pass_all AS pass_gopher,
                 (ent.ent_q >= {TP2_ENT_MIN_BITS} * ent.n_chars * {scale}
                  AND ent.ent_q <= {TP2_ENT_MAX_BITS} * ent.n_chars * {scale})
                   AS pass_entropy
          FROM documents d
          JOIN g ON g.doc = d.doc_id
          JOIN ent ON ent.doc = d.doc_id),
sdocs AS MATERIALIZED (SELECT doc FROM flags WHERE pass_gopher AND pass_entropy),
p0 AS MATERIALIZED (SELECT doc_lo, doc_hi FROM ({_td3_oracle()}) AS _p
       WHERE doc_lo IN (SELECT doc FROM sdocs)
         AND doc_hi IN (SELECT doc FROM sdocs)),
edges AS (SELECT doc_lo AS a, doc_hi AS b FROM p0
          UNION
          SELECT doc_hi AS a, doc_lo AS b FROM p0),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a),
comp AS (SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a),
fulld AS (SELECT s.doc, COALESCE(c.component, s.doc) AS component
          FROM sdocs s LEFT JOIN comp c ON c.node = s.doc),
dec AS (SELECT doc, component,
               CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
                 AS comp_size,
               doc = min(doc) OVER (PARTITION BY component) AS is_kept
        FROM fulld)
SELECT f.doc, f.source, f.pass_gopher, f.pass_entropy,
       CAST(COALESCE(dec.component, f.doc) AS BIGINT) AS component,
       CAST(COALESCE(dec.comp_size, 0) AS BIGINT) AS comp_size,
       COALESCE(dec.is_kept, FALSE) AS is_kept
FROM flags f LEFT JOIN dec ON dec.doc = f.doc
"""


def td15_fuzzy_dedup_e2e(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus fuzzy dedup, decision per document: docs sharing an LSH
    component keep only the min-id canonical; singletons keep
    themselves. Two shuffles beyond the component computation (one
    left join docs→labels, one window over component). At 100 TB the
    docs→labels join is skew-safe (component labels are
    near-uniform) and the window partitions by component, whose
    cardinality ≈ distinct clusters."""
    docs = load(spark, sf, "documents").select("doc_id")
    pairs = dd.minhash_lsh_pairs(load(spark, sf, "documents"), "doc_id", "text")
    comp = dd.connected_components(pairs)
    full = (
        docs.join(comp, docs.doc_id == comp.node, "left")
        .select(
            F.col("doc_id").alias("doc"),
            F.coalesce("component", "doc_id").alias("component"),
        )
    )
    w = Window.partitionBy("component")
    return full.select(
        "doc",
        "component",
        F.count("*").over(w).alias("comp_size"),
        (F.col("doc") == F.min("doc").over(w)).alias("is_kept"),
    )


def _td15_oracle() -> str:
    return f"""
WITH alldocs AS (
  SELECT doc_id AS doc, coalesce(c.component, doc_id) AS component
  FROM documents LEFT JOIN ({_dd4_oracle()}) c ON doc_id = c.node)
SELECT doc, component,
       count(*) OVER (PARTITION BY component) AS comp_size,
       (doc = min(doc) OVER (PARTITION BY component)) AS is_kept
FROM alldocs
"""


# ---------------------------------------------------------------- #
# td29 — SOFT dedup: down-weight near-duplicates instead of
#        dropping them (the alternative when repeats carry signal)
# ---------------------------------------------------------------- #


def td29_soft_dedup_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Soft dedup over td15's near-dup components: every document
    keeps a sampling weight of 1/comp_size in exact basis points, so
    a component's total mass ≈ one document regardless of its
    multiplicity — the down-weighting alternative to hard keep/drop
    used when duplicated data still carries signal (repeated-data
    scaling, Muennighoff et al. 2023). Identical scale shape to td15
    (one docs→labels join, one window on component); the weight and
    the component's exact residual mass are pure expressions over the
    same window, so soft dedup costs nothing beyond the hard one."""
    docs = load(spark, sf, "documents").select("doc_id")
    pairs = dd.minhash_lsh_pairs(load(spark, sf, "documents"), "doc_id", "text")
    comp = dd.connected_components(pairs)
    full = (
        docs.join(comp, docs.doc_id == comp.node, "left")
        .select(
            F.col("doc_id").alias("doc"),
            F.coalesce("component", "doc_id").alias("component"),
        )
    )
    w = Window.partitionBy("component")
    sized = full.select(
        "doc",
        "component",
        F.count("*").over(w).alias("comp_size"),
        (F.col("doc") == F.min("doc").over(w)).alias("is_canonical"),
    )
    return sized.select(
        "doc",
        "component",
        "comp_size",
        "is_canonical",
        F.expr("10000 div comp_size").cast("long").alias("weight_bp"),
        # exact undershoot of the integer division, per component:
        # 10000 - comp_size * weight_bp (0 when comp_size divides)
        F.expr("10000 - comp_size * (10000 div comp_size)")
        .cast("long")
        .alias("residual_bp"),
    )


def _td29_oracle() -> str:
    return f"""
WITH base AS ({_td15_oracle()})
SELECT doc, component, comp_size,
       is_kept AS is_canonical,
       CAST(10000 // comp_size AS BIGINT) AS weight_bp,
       CAST(10000 - comp_size * (10000 // comp_size) AS BIGINT)
         AS residual_bp
FROM base
"""


# ---------------------------------------------------------------- #
# td30 — paragraph-level cross-document dedup (td11's C4 line rule
#        at Dolma's paragraph granularity)
# ---------------------------------------------------------------- #

TD30_MAX_OCC = 2


def td30_paragraph_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-document PARAGRAPH dedup: the C4 line rule (td11) at
    paragraph granularity — any paragraph appearing in more than
    TD30_MAX_OCC distinct documents is boilerplate and is removed
    from every document; survivors reassemble in original order
    (Dolma's paragraph-level dedup). Reuses td11's line machinery
    with a blank-line separator — same one-hash-agg + one-join +
    one-doc-agg scale shape. The fixture wraps every document in a
    corpus-wide intro paragraph and a promo paragraph shared by each
    doc_id%3 class, so the operator must drop exactly those and keep
    each unique body."""
    from omfietser_etl_spark.textops.decontam import line_dedup

    docs = load(spark, sf, "documents").select("doc_id", "text")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("Shared intro paragraph about this corpus.\n\n"),
            F.col("text"),
            F.lit("\n\npromo paragraph variant "),
            (F.col("doc_id") % 3).cast("string"),
        ).alias("t"),
    )
    return line_dedup(wrapped, "doc_id", "t", TD30_MAX_OCC, sep="\n\n")


TD30_ORACLE = f"""
WITH d AS (
  SELECT doc_id AS doc,
         'Shared intro paragraph about this corpus.' || chr(10) || chr(10)
         || text || chr(10) || chr(10)
         || 'promo paragraph variant ' || CAST(doc_id % 3 AS VARCHAR) AS t
  FROM documents),
sp AS (SELECT doc, string_split(t, chr(10) || chr(10)) AS ls FROM d),
l AS (SELECT doc, unnest(list_transform(range(0, len(ls)),
          i -> struct_pack(pos := i, line := ls[i + 1]))) AS s FROM sp),
l2 AS (SELECT doc, s.pos AS pos, s.line AS line FROM l),
c AS (SELECT line, count(DISTINCT doc) AS n_occ FROM l2 GROUP BY line),
t2 AS (SELECT doc, pos, l2.line, (n_occ <= {TD30_MAX_OCC}) AS keep
       FROM l2 JOIN c USING (line))
SELECT doc,
  coalesce(array_to_string(
      list_transform(
          list_sort(list(struct_pack(pos := pos, line := line))
                    FILTER (WHERE keep)),
          s -> s.line),
      chr(10) || chr(10)), '') AS clean_text,
  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM t2 GROUP BY doc
"""


# ---------------------------------------------------------------- #
# tc1/tc2 — chunking + PII scrub (training-data prep)
# ---------------------------------------------------------------- #

def tc1_doc_chunking(spark: SparkSession, sf: str) -> DataFrame:
    from omfietser_etl_spark.textops.chunking import chunk_documents

    return chunk_documents(load(spark, sf, "documents"))


TC1_ORACLE = (
    "WITH d AS (SELECT doc_id AS doc, "
    + DK_TOKENS.format(c="text")
    + " AS t FROM documents), "
    "s AS (SELECT doc, t, unnest(range(0, "
    "CAST(ceil(greatest(len(t) - 16, 1) / 48.0) AS INT))) AS i FROM d) "
    "SELECT doc, CAST(i AS BIGINT) AS chunk_id, "
    "len(t[i * 48 + 1 : i * 48 + 64]) AS n_chunk_tokens, "
    "array_to_string(t[i * 48 + 1 : i * 48 + 64], ' ') AS chunk_text "
    "FROM s"
)


def tc2_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """Inject deterministic PII (synthetic docs carry none), then
    scrub — proves the regex semantics end-to-end on both engines."""
    from omfietser_etl_spark.textops.chunking import scrub_pii

    docs = load(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id"), F.lit("@mail.example.org"),
            F.lit(" or +31 6 1234 "), F.col("doc_id") % 100,
            F.lit(" ip 10.0.0."), F.col("doc_id") % 256,
        ).alias("text"),
    )
    return scrub_pii(docs)


TC2_ORACLE = r"""
WITH d AS (
  SELECT doc_id AS doc,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.org'
              || ' or +31 6 1234 ' || CAST(doc_id % 100 AS VARCHAR)
              || ' ip 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) AS text
  FROM documents)
SELECT doc,
  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
  len(regexp_extract_all(text, '\+[0-9][0-9 -]{7,}[0-9]')) AS n_phones,
  len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS n_ips,
  regexp_replace(regexp_replace(regexp_replace(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\+[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g'),
      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS scrubbed_text
FROM d
"""


SPECS = [
    QuerySpec("td1_exact_dedup", td1_exact_dedup, TD1_ORACLE, "exact dedup stats"),
    QuerySpec("td2_ngram_jaccard", td2_ngram_jaccard, TD2_ORACLE, "n-gram Jaccard near-dup"),
    QuerySpec(
        "td2h_jaccard_hashed", td2h_ngram_jaccard_hashed, TD2_ORACLE,
        "n-gram Jaccard via 8-byte hashed-shingle shuffle (scale path)",
    ),
    QuerySpec(
        "td12_jaccard_guarded", td12_jaccard_guarded, TD12_ORACLE,
        "Jaccard near-dup with degenerate-shingle DF guard",
    ),
    QuerySpec(
        "td28_containment", td28_containment, TD28_ORACLE,
        "asymmetric shingle containment (onion/quote dedup direction)",
    ),
    QuerySpec("td3_minhash_lsh", td3_minhash_lsh, _td3_oracle(), "MinHash LSH near-dup"),
    QuerySpec("td23_minhash_est_pairs", td23_minhash_est_pairs, _td23_oracle(),
              "near-dup pairs by MinHash signature agreement (no verify join)"),
    QuerySpec(
        "td19_winnowing_pairs", td19_winnowing_pairs, _td19_oracle(),
        "winnowing-fingerprint (MOSS) local near-dup pairs",
    ),
    QuerySpec(
        "ts15_dsir_select", ts15_dsir_select, _ts15_oracle(),
        "DSIR importance selection toward a target slice (exact ilog2)",
    ),
    QuerySpec(
        "ts16_dsir_threshold", ts16_dsir_threshold, _ts15_oracle(with_rank=False),
        "DSIR selection via sketch-bracketed cutoff (the 100 TB path)",
    ),
    QuerySpec("td17_incremental_dedup", td17_incremental_dedup, _td17_oracle(),
              "incremental dedup: new batch vs stored signature state"),
    QuerySpec("td4_simhash", td4_simhash, _td4_oracle(), "SimHash fingerprints"),
    QuerySpec("td5_embed_neardup", td5_embed_neardup, TD5_ORACLE, "embedding cosine near-dup"),
    QuerySpec("td16_rh_lsh_pairs", td16_rh_lsh_pairs, _td16_oracle(),
              "random-hyperplane LSH cosine near-dup (banded candidates)"),
    QuerySpec("td6_ann_topk", td6_ann_topk, TD6_ORACLE, "brute-force cosine top-k"),
    QuerySpec("td7_ivf_ann", td7_ivf_ann, TD7_ORACLE, "IVF approximate top-k"),
    QuerySpec("td20_pq_adc_topk", td20_pq_adc_topk, _td20_oracle(),
              "product-quantization ADC top-k (M-byte codes, broadcast LUT)"),
    QuerySpec("td21_ivfpq_topk", td21_ivfpq_topk, _td21_oracle(),
              "IVF-PQ top-k (coarse probe prune + ADC code scoring)"),
    QuerySpec("td22_pq_rerank", td22_pq_rerank, _td22_oracle(),
              "two-stage retrieval: ADC shortlist + exact re-rank"),
    QuerySpec("td8_kmeans_assign", td8_kmeans_assign, TD8_ORACLE,
              "k-means nearest-centroid assignment"),
    QuerySpec("ts19_kcenter_coreset", ts19_kcenter_coreset, _ts19_oracle(),
              "greedy k-center coreset over exact int8 distances"),
    QuerySpec("ts17_cluster_prototypes", ts17_cluster_prototypes, TS17_ORACLE,
              "cluster-balanced prototype selection (per-cluster top-n)"),
    QuerySpec("td13_semantic_dedup", td13_semantic_dedup, TD13_ORACLE,
              "SemDeDup cluster-blocked cosine near-dup pairs"),
    QuerySpec("td9_contamination", td9_contamination, TD9_ORACLE,
              "benchmark decontamination check"),
    QuerySpec("td25_fuzzy_decontam", td25_fuzzy_decontam, TD25_ORACLE,
              "fuzzy eval-leak pairs: bipartite shingle blocking, exact Jaccard"),
    QuerySpec("td26_semantic_decontam", td26_semantic_decontam, TD26_ORACLE,
              "semantic eval-leak pairs: broadcast bench matrix, map-side scan"),
    QuerySpec("td27_semantic_decontam_ivf", td27_semantic_decontam_ivf, TD27_ORACLE,
              "IVF-routed semantic decontam (√|eval| cells, large-benchmark path)"),
    QuerySpec("td18_bloom_decontam", td18_bloom_decontam, _td18_oracle(),
              "Bloom-bounded decontamination (fixed-memory eval set)"),
    QuerySpec("td10_quantize", td10_quantize, TD10_ORACLE,
              "int8 embedding quantization"),
    QuerySpec("tv1_top_terms", tv1_top_terms, TV1_ORACLE,
              "corpus vocabulary (top-k terms)"),
    QuerySpec("tv3_cms_heavy_hitters", tv3_cms_heavy_hitters, _tv3_oracle(),
              "count-min sketch heavy hitters (mergeable, bit-replayable)"),
    QuerySpec("tv2_tfidf_terms", tv2_tfidf_terms, TV2_ORACLE,
              "per-source TF-IDF distinctive terms (exact-integer score)"),
    QuerySpec("tv4_bm25_topk", tv4_bm25_topk, _tv4_oracle(),
              "BM25 ranked retrieval (exact fixed-point ilog2 idf)"),
    QuerySpec("tv6_query_likelihood", tv6_query_likelihood_topk, _tv6_oracle(),
              "Dirichlet query-likelihood retrieval (exact ilog2 LM score)"),
    QuerySpec("tv7_retrieval_eval", tv7_retrieval_eval, _tv7_oracle(),
              "nDCG@20 scoreboard over the BM25 + QL rankers (fixed point)"),
    QuerySpec("tv5_rrf_fusion", tv5_rrf_fusion, _tv5_oracle(),
              "hybrid retrieval: reciprocal-rank fusion of BM25 + dense lists"),
    QuerySpec("tv8_mmr_diversify", tv8_mmr_diversify, _tv8_oracle(),
              "greedy MMR diversity rerank of the dense shortlist"),
    QuerySpec("ca2_source_overlap", ca2_source_overlap, CA2_ORACLE,
              "cross-source shingle containment matrix (data card)"),
    QuerySpec("td24_allpairs_cosine", td24_allpairs_cosine, TD24_ORACLE,
              "sparse cosine similarity join, lossless prefix filter"),
    QuerySpec("x10_knn_label_eval", x10_knn_label_eval, X10_ORACLE,
              "kNN majority-vote label eval over embeddings"),
    QuerySpec("tp2_screen_dedup_pipeline", tp2_screen_dedup_pipeline,
              _tp2_oracle(),
              "FineWeb-ordered screens -> fuzzy dedup composition"),
    QuerySpec("a22_hll_distinct", a22_hll_distinct, _a22_oracle(),
              "portable HyperLogLog: registers AND estimate replay"),
    QuerySpec("ta15_ngram_novelty", ta15_ngram_novelty, TA15_ORACLE,
              "per-doc corpus-unique shingle fraction (originality)"),
    QuerySpec("ca1_corpus_report", ca1_corpus_report, CA1_ORACLE,
              "per-source corpus data card"),
    QuerySpec("ta5_repetition", ta5_repetition, TA5_ORACLE,
              "repeated n-gram (Gopher) signals"),
    QuerySpec("ta9_gopher_rules", ta9_gopher_rules, _ta9_oracle(),
              "Gopher document-level quality rule battery"),
    QuerySpec("ta10_char_entropy", ta10_char_entropy, _ta10_oracle(),
              "character-entropy degeneracy signal (exact integer log2)"),
    QuerySpec("ta11_zipf_slope", ta11_zipf_slope, _ta11_oracle(),
              "corpus Zipf slope: exact-integer log-log fit over top terms"),
    QuerySpec("ta12_ks_drift", ta12_ks_drift, TA12_ORACLE,
              "per-source KS drift over doc length (exact integers)"),
    QuerySpec("ta6_strip_markup", ta6_strip_markup, _ta6_oracle(),
              "HTML/markup boilerplate stripping"),
    QuerySpec("ts18_perplexity_buckets", ts18_perplexity_buckets, TS18_ORACLE,
              "CCNet head/middle/tail perplexity bucketing (integer thirds)"),
    QuerySpec("ta8_bigram_fluency", ta8_bigram_fluency, TA8_ORACLE,
              "CCNet-style bigram LM fluency score (exact integers)"),
    QuerySpec("td11_line_dedup", td11_line_dedup, TD11_ORACLE,
              "corpus-wide line-level dedup (C4 boilerplate rule)"),
    QuerySpec("td14_substring_dedup", td14_substring_dedup, TD14_ORACLE,
              "exact substring dedup (ExactSubstr k-gram spans)"),
    QuerySpec("ta7_relative_length_filter", ta7_relative_length_filter, TA7_ORACLE,
              "per-language percentile length screening"),
    QuerySpec("ta1_token_stats", ta1_token_stats, TA1_ORACLE, "token counting"),
    QuerySpec("ta2_quality_score", ta2_quality_score, _ta2_oracle(), "quality scoring"),
    QuerySpec("ta3_lang_id", ta3_lang_id, _ta3_oracle(), "language ID heuristic"),
    QuerySpec("ta4_fingerprint", ta4_fingerprint, TA4_ORACLE, "doc fingerprint hash"),
    QuerySpec("dd4_neardup_components", dd4_neardup_components, _dd4_oracle(),
              "near-dup connected components"),
    QuerySpec("dd5_star_components", dd5_star_components, _dd4_oracle(),
              "large-star/small-star CC == min-label CC (same oracle)"),
    QuerySpec("td15_fuzzy_dedup_e2e", td15_fuzzy_dedup_e2e, _td15_oracle(),
              "fuzzy dedup end-to-end (LSH → components → keep/drop)"),
    QuerySpec("td29_soft_dedup_weights", td29_soft_dedup_weights,
              _td29_oracle(),
              "soft dedup: exact 1/comp_size down-weighting over the "
              "near-dup components (drop-free alternative)"),
    QuerySpec("td30_paragraph_dedup", td30_paragraph_dedup, TD30_ORACLE,
              "paragraph-level cross-document dedup (C4 line rule at "
              "Dolma paragraph granularity)"),
    QuerySpec("tc1_doc_chunking", tc1_doc_chunking, TC1_ORACLE,
              "token-window chunking with overlap"),
    QuerySpec("tc2_pii_scrub", tc2_pii_scrub, TC2_ORACLE, "PII scrubbing + counts"),
]
