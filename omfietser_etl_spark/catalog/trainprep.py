"""Training-data preparation queries: deterministic sampling, mixture
splits, sequence packing (textops/sampling.py).

These close the sampling/splitting surface of a large-scale training
pipeline: every "random" decision is a salted integer hash of the
stable doc id, so membership is reproducible across runs, engines, and
task retries (Spark's ``rand()`` is NOT retry-stable — see the
sampling module docstring). The DuckDB oracles replay the identical
polynomial hash, so the gate checks bit-exact membership, not just
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omfietser_etl_spark.session import load
from omfietser_etl_spark.textops import sampling as sp

from . import QuerySpec
from .textops import DK_NORM, DK_TOKENS, dk_bucket_expr, dk_shingles

#: sampling rate for ts1 (basis points of 10000).
TS1_RATE_BP = 500
#: packing context length for ts3 (tokens).
TS3_CTX = 128


def _dk_bucket(salt: str, id_expr: str = "doc_id") -> str:
    """DuckDB twin of sampling.hash_bucket (same salted mixed hash)."""
    return dk_bucket_expr(f"'{salt}'", id_expr)


# ---------------------------------------------------------------- #
# ts1 — deterministic hash sampling
# ---------------------------------------------------------------- #

def ts1_hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select(
        F.col("doc_id").alias("doc"), "source"
    )
    return sp.hash_sample(docs, "doc", TS1_RATE_BP).select(
        "doc", "source", F.col("_bucket").alias("bucket")
    )


TS1_ORACLE = f"""
SELECT doc, source, CAST(bucket AS BIGINT) AS bucket FROM (
  SELECT doc_id AS doc, source, {_dk_bucket('sample', 'doc_id')} AS bucket
  FROM documents)
WHERE bucket < {TS1_RATE_BP}
"""


# ---------------------------------------------------------------- #
# ts2 — train/val/test + shard assignment (mixture split)
# ---------------------------------------------------------------- #

def ts2_mixture_split(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select(
        F.col("doc_id").alias("doc"), "source"
    )
    assigned = sp.mixture_split(docs, "doc")
    return assigned.groupBy("source", "split", "shard").agg(
        F.count("*").alias("n_docs")
    )


TS2_ORACLE = f"""
WITH assigned AS (
  SELECT source,
         CASE WHEN {_dk_bucket('split', 'doc_id')} < 9000 THEN 'train'
              WHEN {_dk_bucket('split', 'doc_id')} < 9500 THEN 'val'
              ELSE 'test' END AS split,
         CAST({_dk_bucket('split:shard', 'doc_id')} % 8 AS BIGINT) AS shard
  FROM documents)
SELECT source, split, shard, count(*) AS n_docs
FROM assigned GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------- #
# ts3 — concat-then-chunk sequence packing plan
# ---------------------------------------------------------------- #

def ts3_sequence_pack(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    return sp.pack_sequences(docs, "doc_id", "text", TS3_CTX)


TS3_ORACLE = rf"""
WITH d AS (
  SELECT doc_id AS doc, source AS stream,
         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
              AS BIGINT) AS n_tok
  FROM documents),
s AS (
  SELECT doc, stream, n_tok,
         CAST(COALESCE(sum(n_tok) OVER (PARTITION BY stream ORDER BY doc
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_tok
  FROM d)
SELECT doc, stream, n_tok, start_tok,
       CAST(floor(start_tok / {TS3_CTX}.0) AS BIGINT) AS first_chunk,
       CAST(floor((start_tok + greatest(n_tok, 1) - 1) / {TS3_CTX}.0) AS BIGINT)
         AS last_chunk
FROM s
"""


# ---------------------------------------------------------------- #
# ts4 — stratified (per-group-rate) sampling
# ---------------------------------------------------------------- #

#: per-source keep rates in basis points; sources absent here fall
#: back to TS4_DEFAULT_BP (downsample the over-represented head,
#: keep a trickle of the long tail — corpus rebalancing).
TS4_RATES_BP = {"src0": 9000, "src1": 5000, "src2": 2500}
TS4_DEFAULT_BP = 1000


def ts4_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select(
        F.col("doc_id").alias("doc"), "source"
    )
    kept = sp.stratified_sample(docs, "doc", "source", TS4_RATES_BP, TS4_DEFAULT_BP)
    return kept.select("doc", "source", F.col("_bucket").alias("bucket"))


_TS4_RATE_CASE = "CASE source " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in TS4_RATES_BP.items()
) + f" ELSE {TS4_DEFAULT_BP} END"

TS4_ORACLE = f"""
SELECT doc, source, CAST(bucket AS BIGINT) AS bucket FROM (
  SELECT doc_id AS doc, source, {_dk_bucket('strat', 'doc_id')} AS bucket
  FROM documents)
WHERE bucket < {_TS4_RATE_CASE}
"""


# ---------------------------------------------------------------- #
# ts5 — deterministic global shuffle for export
# ---------------------------------------------------------------- #

TS5_SHARDS = 8


def ts5_shuffle_order(spark: SparkSession, sf: str) -> DataFrame:
    """Every doc gets a (shard, pos) export address from independent
    salted hashes — the reproducible global shuffle a training
    dataloader reads instead of storage order. One shuffle keyed on
    shard + intra-shard sort; no global sort."""
    docs = load(spark, sf, "documents").select(
        F.col("doc_id").alias("doc"), "source"
    )
    return sp.shuffle_order(docs, "doc", TS5_SHARDS).select(
        "doc", "source", "shard", "pos"
    )


TS5_ORACLE = f"""
WITH a AS (
  SELECT doc_id AS doc, source,
         CAST({_dk_bucket('shuffle:shard', 'doc_id')} % {TS5_SHARDS} AS BIGINT) AS shard,
         {_dk_bucket('shuffle:ord', 'doc_id')} AS ord
  FROM documents)
SELECT doc, source, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc) AS BIGINT) AS pos
FROM a
"""


# ---------------------------------------------------------------- #
# ts7 — quality-weighted (curriculum) sampling
# ---------------------------------------------------------------- #

TS7_RATES = {10: 10000, 9: 8000, 8: 6000, 7: 4000, 6: 2000}
TS7_DEFAULT = 1000


def ts7_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Curriculum sampling: keep probability scales with the ta2
    quality score (banded by tens) — high-quality documents are kept
    at 100%, low bands downsampled hard. Deterministic per-group hash
    membership (stratified_sample), so re-runs, retries, and engines
    agree bit-for-bit; still a pure map-side filter over the scored
    frame."""
    from .textops import ta2_quality_score

    q = ta2_quality_score(spark, sf).select("doc", "score")
    banded = q.withColumn("band", F.expr("score div 10"))
    kept = sp.stratified_sample(banded, "doc", "band", TS7_RATES, TS7_DEFAULT)
    return kept.select(
        "doc", "score", "band", F.col("_bucket").alias("bucket")
    )


def _ts7_oracle() -> str:
    from .textops import _ta2_oracle

    rate_case = " ".join(
        f"WHEN {band} THEN {bp}" for band, bp in TS7_RATES.items()
    )
    return f"""
WITH q AS ({_ta2_oracle()}),
b AS (SELECT doc, score, score // 10 AS band,
             {_dk_bucket('strat', 'doc')} AS bucket
      FROM q)
SELECT doc, score, band, CAST(bucket AS BIGINT) AS bucket FROM b
WHERE bucket < CASE band {rate_case} ELSE {TS7_DEFAULT} END
"""


# ---------------------------------------------------------------- #
# ts8 — temperature (α=0.5) multilingual rebalancing
# ---------------------------------------------------------------- #

TS8_BUDGET_BP = 5000  # target corpus budget: 50% of the documents


def ts8_temperature_rebalance(spark: SparkSession, sf: str) -> DataFrame:
    """XLM-R/mT5-style temperature sampling over the skewed language
    mix (en is ~44% of the corpus): per-language keep-rates derived
    from the data as q_l ∝ √p_l for a 50% budget, realized by the
    deterministic hash sampler. All-rate arithmetic is exact BIGINT
    (isqrt fixed-point), so both engines derive identical rates."""
    docs = load(spark, sf, "documents").select(
        F.col("doc_id").alias("doc"), "lang"
    )
    return sp.temperature_rebalance(docs, "doc", "lang", TS8_BUDGET_BP)


def _ts8_oracle() -> str:
    scale = sp.TEMP_W_SCALE
    return f"""
WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
f0 AS (SELECT lang, n_docs, n_docs * {scale} AS x,
              CAST(floor(sqrt(CAST(n_docs * {scale} AS DOUBLE))) AS BIGINT) AS f
       FROM c),
w AS (SELECT lang, n_docs,
             CASE WHEN (f + 1) * (f + 1) <= x THEN f + 1
                  WHEN f * f > x THEN f - 1
                  ELSE f END AS w
      FROM f0),
t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n, CAST(sum(w) AS BIGINT) AS s
      FROM w),
r AS (SELECT lang, n_docs,
             least(10000,
                   (10000 * ((t.n * {TS8_BUDGET_BP}) // 10000) * w)
                   // (n_docs * t.s)) AS rate_bp
      FROM w, t),
k AS (SELECT d.lang, count(*) AS n_kept
      FROM documents d JOIN r ON d.lang = r.lang
      WHERE {_dk_bucket('temp', 'd.doc_id')} < r.rate_bp
      GROUP BY d.lang)
SELECT r.lang, CAST(r.n_docs AS BIGINT) AS n_docs,
       CAST(r.rate_bp AS BIGINT) AS rate_bp,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
FROM r LEFT JOIN k ON r.lang = k.lang
"""


# ---------------------------------------------------------------- #
# ts9 — deterministic fixed-size per-group sample (eval carving)
# ---------------------------------------------------------------- #

TS9_N = 20


def ts9_fixed_size_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Exactly-n-per-language eval carving: rate-based sampling can't
    guarantee per-group counts, the hash-rank reservoir can. Same
    deterministic membership discipline as ts1/ts4 (salted mixed id
    hash), one window shuffle on the group key."""
    docs = load(spark, sf, "documents").select(
        F.col("doc_id").alias("doc"), "lang"
    )
    return sp.fixed_size_sample(docs, "doc", "lang", TS9_N).select(
        "doc", "lang", F.col("pick_rank").cast("long").alias("pick_rank")
    )


TS9_ORACLE = f"""
SELECT doc, lang, CAST(pick_rank AS BIGINT) AS pick_rank FROM (
  SELECT doc_id AS doc, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {_dk_bucket('fixed', 'doc_id')}, doc_id)
           AS pick_rank
  FROM documents)
WHERE pick_rank <= {TS9_N}
"""


# ---------------------------------------------------------------- #
# ts10 — UNIMAX budget allocation (uniform-with-caps water-filling)
# ---------------------------------------------------------------- #

TS10_BUDGET_BP = 8000  # 80% budget so the caps genuinely bind


def ts10_unimax_budget(spark: SparkSession, sf: str) -> DataFrame:
    """UNIMAX allocation over the language mix: at an 80% budget the
    four low-resource languages are fully taken (capped) and the en
    head receives exactly the remaining budget — both regimes of the
    water-filling are exercised. Exact BIGINT arithmetic throughout;
    realize with fixed_size_sample(n_per_group=alloc_docs)."""
    docs = load(spark, sf, "documents").select("lang")
    return sp.unimax_allocation(docs, "lang", TS10_BUDGET_BP)


TS10_ORACLE = f"""
WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
r AS (SELECT lang, n_docs,
        CAST(sum(n_docs) OVER () AS BIGINT) AS n,
        CAST(count(*) OVER () AS BIGINT) AS k,
        CAST(coalesce(sum(n_docs) OVER (ORDER BY n_docs, lang
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS pfx,
        CAST(row_number() OVER (ORDER BY n_docs, lang) - 1 AS BIGINT) AS i
      FROM c),
f AS (SELECT *, (n * {TS10_BUDGET_BP}) // 10000 AS b,
        (pfx + n_docs * (k - i) <= (n * {TS10_BUDGET_BP}) // 10000) AS is_capped
      FROM r),
l AS (SELECT *,
        CAST(sum(CASE WHEN is_capped THEN n_docs ELSE 0 END) OVER () AS BIGINT)
          AS taken,
        CAST(sum(CASE WHEN is_capped THEN 1 ELSE 0 END) OVER () AS BIGINT) AS m
      FROM f),
a AS (SELECT lang, n_docs, is_capped,
        CASE WHEN is_capped THEN n_docs
             ELSE least(n_docs,
                        CASE WHEN m < k THEN (b - taken) // (k - m) ELSE 0 END)
        END AS alloc
      FROM l)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, is_capped,
       CAST(alloc AS BIGINT) AS alloc_docs,
       CAST((alloc * 10000) // n_docs AS BIGINT) AS rate_bp
FROM a
"""


# ---------------------------------------------------------------- #
# ts11 — UNIMAX realization: allocation → concrete membership
# ---------------------------------------------------------------- #


def ts11_unimax_realized(spark: SparkSession, sf: str) -> DataFrame:
    """The ts10 water-filling allocation materialized as an actual
    corpus sample: per-language budgets realized by hash-rank
    membership (allocated_sample). Gates that allocation AND
    realization agree end-to-end — the k-row alloc frame broadcasts,
    the corpus pays one window shuffle on the group key."""
    docs = load(spark, sf, "documents").select(
        F.col("doc_id").alias("doc"), "lang"
    )
    alloc = sp.unimax_allocation(docs, "lang", TS10_BUDGET_BP).select(
        "lang", "alloc_docs"
    )
    return sp.allocated_sample(docs, "doc", "lang", alloc).select(
        "doc", "lang", F.col("pick_rank").cast("long").alias("pick_rank")
    )


TS11_ORACLE = f"""
WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
r AS (SELECT lang, n_docs,
        CAST(sum(n_docs) OVER () AS BIGINT) AS n,
        CAST(count(*) OVER () AS BIGINT) AS k,
        CAST(coalesce(sum(n_docs) OVER (ORDER BY n_docs, lang
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS pfx,
        CAST(row_number() OVER (ORDER BY n_docs, lang) - 1 AS BIGINT) AS i
      FROM c),
f AS (SELECT *, (n * {TS10_BUDGET_BP}) // 10000 AS b,
        (pfx + n_docs * (k - i) <= (n * {TS10_BUDGET_BP}) // 10000) AS is_capped
      FROM r),
l AS (SELECT *,
        CAST(sum(CASE WHEN is_capped THEN n_docs ELSE 0 END) OVER () AS BIGINT)
          AS taken,
        CAST(sum(CASE WHEN is_capped THEN 1 ELSE 0 END) OVER () AS BIGINT) AS m
      FROM f),
a AS (SELECT lang,
        CASE WHEN is_capped THEN n_docs
             ELSE least(n_docs,
                        CASE WHEN m < k THEN (b - taken) // (k - m) ELSE 0 END)
        END AS alloc
      FROM l),
ranked AS (
  SELECT doc_id AS doc, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {_dk_bucket('fixed', 'doc_id')}, doc_id)
           AS pick_rank
  FROM documents)
SELECT doc, ranked.lang, CAST(pick_rank AS BIGINT) AS pick_rank
FROM ranked JOIN a ON ranked.lang = a.lang
WHERE pick_rank <= a.alloc
"""


# ---------------------------------------------------------------- #
# ts12 — token-budget UNIMAX: allocation AND membership in tokens
# ---------------------------------------------------------------- #

TS12_BUDGET_BP = 6000
#: DuckDB twin of analysis.ws_token_count (same split-on-whitespace).
_DK_NTOK = (
    "CAST(len(list_filter(string_split_regex({c}, '\\s+'), x -> x <> ''))"
    " AS BIGINT)"
)


def ts12_token_unimax_realized(spark: SparkSession, sf: str) -> DataFrame:
    """UNIMAX with the budget denominated in TOKENS — the real-world
    shape (training budgets are token counts; a doc-count allocation
    over-serves short-document groups). Water-filling runs on the
    per-language token masses (same exact BIGINT closed form);
    realization keeps each group's hash-ranked docs while the running
    token total stays within its allocation, so the sample never
    exceeds the budget. One window shuffle on the group key; the
    k-row allocation broadcasts."""
    from omfietser_etl_spark.textops.analysis import ws_token_count

    docs = load(spark, sf, "documents").select(
        F.col("doc_id").alias("doc"), "lang", ws_token_count("text").alias("n_tok")
    )
    alloc = sp.unimax_allocation(
        docs, "lang", TS12_BUDGET_BP, weight_col="n_tok"
    ).select("lang", F.col("alloc_docs").alias("alloc_tokens"))
    kept = sp.budget_weighted_sample(docs, "doc", "lang", "n_tok", alloc,
                                     alloc_col="alloc_tokens")
    return kept.select(
        "doc", "lang", F.col("n_tok").cast("long").alias("n_tok"), "cum_weight"
    )


def _ts12_oracle() -> str:
    ntok = _DK_NTOK.format(c="text")
    return f"""
WITH d AS (SELECT doc_id AS doc, lang, {ntok} AS n_tok FROM documents),
c AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS n_docs FROM d GROUP BY lang),
r AS (SELECT lang, n_docs,
        CAST(sum(n_docs) OVER () AS BIGINT) AS n,
        CAST(count(*) OVER () AS BIGINT) AS k,
        CAST(coalesce(sum(n_docs) OVER (ORDER BY n_docs, lang
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS pfx,
        CAST(row_number() OVER (ORDER BY n_docs, lang) - 1 AS BIGINT) AS i
      FROM c),
f AS (SELECT *, (n * {TS12_BUDGET_BP}) // 10000 AS b,
        (pfx + n_docs * (k - i) <= (n * {TS12_BUDGET_BP}) // 10000) AS is_capped
      FROM r),
l AS (SELECT *,
        CAST(sum(CASE WHEN is_capped THEN n_docs ELSE 0 END) OVER () AS BIGINT)
          AS taken,
        CAST(sum(CASE WHEN is_capped THEN 1 ELSE 0 END) OVER () AS BIGINT) AS m
      FROM f),
a AS (SELECT lang,
        CASE WHEN is_capped THEN n_docs
             ELSE least(n_docs,
                        CASE WHEN m < k THEN (b - taken) // (k - m) ELSE 0 END)
        END AS alloc_tokens
      FROM l),
ranked AS (
  SELECT doc, d.lang AS lang, n_tok,
         CAST(sum(n_tok) OVER (PARTITION BY d.lang
               ORDER BY {_dk_bucket('fixed', 'doc')}, doc
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_weight
  FROM d)
SELECT doc, ranked.lang, n_tok, cum_weight
FROM ranked JOIN a ON ranked.lang = a.lang
WHERE cum_weight <= a.alloc_tokens
"""


# ---------------------------------------------------------------- #
# ts13 — token-balanced shard assignment (snake allocation)
# ---------------------------------------------------------------- #

TS13_SHARDS = 8


def ts13_token_balanced_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Dataloader workers step in sync on TOKEN mass, not doc count —
    ts5's count-equal shards leave long-doc shards straggling. Snake
    allocation over the (tokens desc, id) ranking balances token mass
    per shard deterministically; only the 16-byte/doc (id, n_tok)
    projection is ever sorted."""
    from omfietser_etl_spark.textops.analysis import ws_token_count

    docs = load(spark, sf, "documents").select(
        F.col("doc_id").alias("doc"), ws_token_count("text").alias("n_tok")
    )
    return sp.token_balanced_shards(docs, "doc", "n_tok", TS13_SHARDS)


def _ts13_oracle() -> str:
    ntok = _DK_NTOK.format(c="text")
    s = TS13_SHARDS
    return f"""
WITH d AS (SELECT doc_id AS doc, {ntok} AS n_tok FROM documents),
r AS (SELECT doc, n_tok,
        CAST(row_number() OVER (ORDER BY n_tok DESC, doc) AS BIGINT) AS rank
      FROM d)
SELECT doc, n_tok, rank,
       CAST(CASE WHEN ((rank - 1) // {s}) % 2 = 0
                 THEN (rank - 1) % {s}
                 ELSE {s - 1} - ((rank - 1) % {s}) END AS BIGINT) AS shard
FROM r
"""


# ---------------------------------------------------------------- #
# ts20 — per-domain frequency cap (C4/Dolma source-cardinality cap)
# ---------------------------------------------------------------- #

#: cap multiple of the fair share, basis points: 10000 = cap every
#: domain at exactly N/D docs (binds on every above-average domain —
#: non-vacuous at any non-degenerate source distribution).
TS20_CAP_X_FAIR_BP = 10_000


def ts20_domain_cap(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain frequency cap realized as corpus membership
    (textops/sampling.domain_cap_allocation + allocated_sample): the
    C4/Dolma-style source-cardinality cap — no domain contributes
    more than the fair share (TS20_CAP_X_FAIR_BP bp of N/D), head
    domains truncated by deterministic hash-rank, tail domains kept
    whole. Generalizes ts7's rate shape to an EXACT per-group count
    bound; the cap-only complement of ts11's UNIMAX (no budget
    redistribution — freed docs are simply dropped).

    One row per domain: n_docs, the derived cap, n_kept, and the
    kept-id checksum (sum of kept doc ids) so the oracle gates the
    realized MEMBERSHIP, not just counts. The D-row allocation is
    persisted (it feeds both the membership filter and the report
    join; re-deriving it would re-scan the corpus — k-row persist,
    no corpus barrier); the corpus pays one window shuffle on the
    domain key."""
    from ..cacheutil import persist_replannable

    docs = load(spark, sf, "documents").select(
        F.col("doc_id").alias("doc"), "source"
    )
    alloc = persist_replannable(
        "catalog.ts20",
        sp.domain_cap_allocation(docs, "source", TS20_CAP_X_FAIR_BP),
    )
    kept = sp.allocated_sample(docs, "doc", "source", alloc, salt="ts20")
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("doc").cast("long").alias("kept_id_sum"),
        )
        .join(F.broadcast(alloc.select("source", "n_docs", "cap_docs")), "source")
        .select("source", "n_docs", "cap_docs", "n_kept", "kept_id_sum")
    )


TS20_ORACLE = f"""
WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY source),
t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS d FROM c),
a AS (SELECT source, n_docs,
             (n * {TS20_CAP_X_FAIR_BP}) // (10000 * d) AS cap_docs,
             least(n_docs, (n * {TS20_CAP_X_FAIR_BP}) // (10000 * d)) AS alloc
      FROM c, t),
r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY {{bucket}}, doc_id) AS rk
      FROM documents),
k AS (SELECT r.source, r.doc_id FROM r JOIN a USING (source)
      WHERE r.rk <= a.alloc)
SELECT a.source, a.n_docs, CAST(a.cap_docs AS BIGINT) AS cap_docs,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(k.doc_id) AS BIGINT) AS kept_id_sum
FROM k JOIN a USING (source)
GROUP BY 1, 2, 3
""".replace("{bucket}", _dk_bucket("ts20", "doc_id"))


# ---------------------------------------------------------------- #
# ts14 — leakage-free split: near-dup components never straddle
#        train/eval
# ---------------------------------------------------------------- #


def ts14_leakage_free_split(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup-aware corpus split (textops/sampling.component_split):
    LSH near-dup components are assigned to train/val/test ATOMICALLY
    by the hash of the component root, closing the eval-contamination
    channel a per-doc split leaves open. Gates the full composition:
    pair graph → components → atomic assignment."""
    from omfietser_etl_spark.textops import dedup as dd

    docs = load(spark, sf, "documents")
    pairs = dd.minhash_lsh_pairs(docs, "doc_id", "text")
    comp = dd.connected_components(pairs)
    out = sp.component_split(docs.select(F.col("doc_id").alias("doc")), "doc", comp)
    return out.select("doc", "group_key", "split")


def _ts14_oracle() -> str:
    from .textops import _dd4_oracle

    return f"""
WITH comp AS ({_dd4_oracle()}),
d AS (SELECT doc_id AS doc FROM documents),
g AS (SELECT doc, CAST(coalesce(component, doc) AS VARCHAR) AS group_key
      FROM d LEFT JOIN comp ON d.doc = comp.node)
SELECT doc, group_key,
       CASE WHEN {_dk_bucket('split', 'group_key')} < 9000 THEN 'train'
            WHEN {_dk_bucket('split', 'group_key')} < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM g
"""


# ---------------------------------------------------------------- #
# tp3 — the FULL corpus-preparation capstone: every training-data
#        stage the catalog gates individually, composed into one
#        per-document disposition pipeline
# ---------------------------------------------------------------- #

TP3_SHARDS = 8
#: tp3 contamination threshold (bp of shingles Bloom-hitting the
#: benchmark set). Stricter than td18's 2000: a corpus-prep run
#: rejects partial eval overlap too, and the stage must BIND in the
#: composition (td18's own threshold flags only the one full
#: near-copy, which the screens/dedup stages already drop).
TP3_CONTAM_BP = 1200


def _tp3_ckpt(scope: str, df: DataFrame) -> DataFrame:
    """Tracked LAZY localCheckpoint at a tp3 stage boundary. The
    7-stage chain otherwise nests every upstream expression tree
    (Gopher battery, entropy column, shingle/Bloom hashes) into each
    later persist's ANALYZED plan — the plan machinery alone OOMs the
    vanilla 1g driver heap (measured round 12; the SKILL's giant-
    expression-tree class, compounding across stages). Checkpointing
    truncates lineage so every later stage plans against a leaf.

    LAZY, not eager (round 13 — the verdict's tp3 serial-stage item):
    ``localCheckpoint(eager=False)`` roots the plan in a LogicalRDD
    immediately (identical plan-size defense — an eager/lazy A/B on
    the full query read 100 KB formatted either way vs 5 MB with a
    plain persist) but materializes at the FIRST downstream action,
    pipelined, instead of a dedicated barrier job per stage. Blocks
    are scope-registered at creation (the lazy checkpoint RDD
    registers with the block manager up front): the next invocation
    (or the harness's release_all) frees them — same discipline as
    the CC loop's round frames."""
    from omfietser_etl_spark import cacheutil

    cacheutil.release(scope)
    ck, ids = cacheutil.tracked_local_checkpoint(df, eager=False)
    cacheutil.register_rdd_ids(scope, df.sparkSession.sparkContext, ids)
    return ck


def tp3_full_corpus_prep(spark: SparkSession, sf: str) -> DataFrame:
    """The realistic end-to-end training-corpus preparation chain —
    quality screens → fuzzy dedup → benchmark decontamination →
    per-domain frequency cap → UNIMAX mixture realization →
    leakage-free split → token-balanced shards — emitted as ONE row
    per input document carrying its full disposition. Every stage is
    an individually-gated catalog operator (ta9/ta10, td15-logic,
    td18, ts20, ts11, ts14, ts13); this query gates their
    INTERACTIONS: screens change the dedup blocking input, dedup
    changes the decontam population, the cap changes the mixture
    budgets, and the split must ride the dedup components — none of
    which a single-stage oracle can see.

    Stage semantics (all deterministic, engine-portable):
      1. screens  — Gopher rule battery (ta9) AND char-entropy band
         (ta10), map-side over the non-benchmark corpus.
      2. dedup    — MinHash-LSH pairs → connected components over the
         screen SURVIVORS; min-id doc per component kept (td15).
      3. decontam — td18's Bloom-bounded shingle decontamination vs
         the held-out src9 benchmark slice, evaluated on dedup-kept
         docs only (a per-doc property, so the oracle may reuse the
         full td18 oracle and join).
      4. cap      — ts20's C4/Dolma per-domain fair-share cap,
         hash-rank realized (salt tp3cap).
      5. mix      — ts11's UNIMAX water-filling by language over the
         cap survivors, hash-rank realized (salt tp3mix).
      6. split    — ts14's component-atomic train/val/test (near-dups
         never straddle train/eval; components from stage 2).
      7. shards   — ts13's token-balanced snake over the TRAIN split.

    Scale shape: screens are map-side and run FIRST so dedup's
    shuffles see only survivors (FineWeb ordering, tp2); every
    fan-out frame persists via the conf-scoped registry (flags feeds
    dedup + final join; dec feeds decontam population, split keys,
    and final join; s3/s4 each feed an allocation agg + a realization
    window); the allocation frames are group-cardinality-sized and
    broadcast; the only corpus-sized shuffles are the LSH band
    buckets, one window per sampling stage on its group key, and the
    train-only distributed rank (never a SinglePartition window).
    Reference composition: the per-shop pipeline chain
    `projects/processor/src/core/pipeline.ts` generalized to the
    training-data surface."""
    from pyspark.sql import Window

    from omfietser_etl_spark.cacheutil import persist_replannable
    from omfietser_etl_spark.textops import dedup as dd
    from omfietser_etl_spark.textops.analysis import (
        char_entropy_q_col,
        gopher_flag_cols,
        gopher_stat_cols,
        norm_text,
        ws_token_count,
    )
    from omfietser_etl_spark.textops.selection import DSIR_Q
    from omfietser_etl_spark.textops.sketch import bloom_build, bloom_hits

    from .textops import (
        EVAL_SOURCE,
        TP2_ENT_MAX_BITS,
        TP2_ENT_MIN_BITS,
    )

    scale = 1 << DSIR_Q
    docs = load(spark, sf, "documents")
    corpus = docs.filter(F.col("source") != EVAL_SOURCE)

    # 1. screens (ta9 + ta10), INLINED as per-row columns on the slim
    #    corpus projection (round 12, guide §2.4 — was two self-joins
    #    of the scan plus entropy's two explode-shuffles; now one
    #    map-side projection chain with zero exchanges). Persisted —
    #    feeds the dedup input AND the final per-doc assembly (the
    #    tp2 fan-out discipline). The empty-normalized-text filter
    #    replicates the old inner join against char_entropy_stats.
    #    Multilingual Gopher battery: all rules EXCEPT the
    #    (deliberately English-centric) stopword rule — the standard
    #    adaptation for a mixed-language corpus (the rule would
    #    reject every non-English doc; ta9 still gates the full
    #    battery separately).
    staged = corpus.select(
        F.col("doc_id").alias("doc"), "source", "lang", "text",
        ws_token_count("text").alias("n_tok"),
        norm_text("text").alias("_s"),
    ).filter(F.length("_s") > 0)
    stats = staged.select(
        "doc", "source", "lang", "text", "n_tok",
        *gopher_stat_cols("text"),
        F.length("_s").cast("long").alias("_n_chars"),
        char_entropy_q_col("_s").cast("long").alias("_ent_q"),
    )
    flagged = stats.select(
        "doc", "source", "lang", "text", "n_tok",
        F.struct(*gopher_flag_cols()).alias("_g"),
        (
            (F.col("_ent_q") >= TP2_ENT_MIN_BITS * F.col("_n_chars") * scale)
            & (F.col("_ent_q") <= TP2_ENT_MAX_BITS * F.col("_n_chars") * scale)
        ).alias("pass_entropy"),
    ).select(
        "doc", "source", "lang", "text", "n_tok",
        (
            F.col("_g.ok_word_count") & F.col("_g.ok_word_len")
            & F.col("_g.ok_symbol_ratio") & F.col("_g.ok_bullet_ellipsis")
            & F.col("_g.ok_alpha_words")
        ).alias("pass_gopher"),
        "pass_entropy",
    )
    flags = _tp3_ckpt("catalog.tp3.flags", flagged)
    surv1 = flags.filter("pass_gopher AND pass_entropy").select("doc", "text")

    # 2. fuzzy dedup over survivors: LSH pairs → components → min-id
    #    election. dec persists: it feeds the decontam population, the
    #    split group keys, and the final join.
    pairs = dd.minhash_lsh_pairs(surv1, "doc", "text")
    comp = dd.connected_components(pairs)
    labeled = (
        surv1.select("doc")
        .join(comp, F.col("doc") == F.col("node"), "left")
        .select(
            "doc", F.coalesce("component", "doc").cast("long").alias("component")
        )
    )
    # dec/s3 are LAZY checkpoints (see _tp3_ckpt): lineage truncation
    # without the per-stage barrier job. A plain persist was measured
    # and REJECTED here (round 13): without the LogicalRDD root the
    # downstream stages re-inline the whole upstream tree — tp3's
    # formatted plan blew up 100 KB → 5 MB / 3 → 87 printed scans,
    # i.e. the exact plan-weight class the round-12 checkpoints were
    # introduced for.
    wc = Window.partitionBy("component")
    dec = _tp3_ckpt(
        "catalog.tp3.dec",
        labeled.withColumn(
            "is_dedup_kept", F.col("doc") == F.min("doc").over(wc)
        ),
    )

    # 3. Bloom decontamination vs the src9 benchmark slice, evaluated
    #    on dedup-kept docs only (per-doc property — the oracle reuses
    #    td18's full oracle and joins). Persisted: feeds the s3 filter
    #    AND the final is_contaminated column.
    ev_sh = (
        dd.doc_shingles(
            docs.filter(F.col("source") == EVAL_SOURCE), "doc_id", "text"
        )
        .select("s")
        .distinct()
    )
    bloom = bloom_build(ev_sh, "s")
    # Shingles of the KEPT docs = shingles of the SURVIVOR corpus
    # filtered to kept doc ids (kept ⊆ surv1, and doc_shingles is
    # per-doc) — phrased that way the subtree is the EXACT analyzed
    # plan minhash_lsh_pairs cached above, so the cache manager
    # substitutes the materialized shingle frame instead of running a
    # second tokenize+explode pass over the kept texts (round 13,
    # guide §1.2).
    tr_sh = dd.doc_shingles(surv1, "doc", "text").join(
        dec.filter("is_dedup_kept").select("doc"), "doc"
    )
    contam = persist_replannable(
        "catalog.tp3.contam",
        bloom_hits(tr_sh, "s", bloom)
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sh"),
            F.sum(F.when(F.col("might_contain"), 1).otherwise(0))
            .cast("long")
            .alias("n_hit"),
        )
        .select(
            "doc",
            (F.expr("(10000 * n_hit) div n_sh") >= TP3_CONTAM_BP).alias("contam_flag"),
        ),
    )
    s3 = _tp3_ckpt(
        "catalog.tp3.s3",
        dec.filter("is_dedup_kept")
        .join(contam, "doc", "left")
        .filter(~F.coalesce(F.col("contam_flag"), F.lit(False)))
        .select("doc")
        .join(flags.select("doc", "source", "lang", "n_tok"), "doc"),
    )

    # 4. per-domain frequency cap (ts20 machinery, salt tp3cap). s3/s4
    #    persist: each feeds an allocation agg AND a realization window.
    cap_alloc = sp.domain_cap_allocation(s3, "source", TS20_CAP_X_FAIR_BP)
    s4 = persist_replannable(
        "catalog.tp3.s4",
        sp.allocated_sample(s3, "doc", "source", cap_alloc, salt="tp3cap").drop(
            "pick_rank"
        ),
    )

    # 5. UNIMAX mixture by language over cap survivors (salt tp3mix).
    mix_alloc = sp.unimax_allocation(s4, "lang", TS10_BUDGET_BP).select(
        "lang", "alloc_docs"
    )
    s5 = sp.allocated_sample(s4, "doc", "lang", mix_alloc, salt="tp3mix").drop(
        "pick_rank"
    )

    # 6. component-atomic split (ts14): group key = dedup component.
    spl = persist_replannable(
        "catalog.tp3.spl",
        sp.component_split(
            s5.select("doc", "n_tok"),
            "doc",
            dec.select(F.col("doc").alias("node"), "component"),
        ),
    )

    # 7. token-balanced snake shards over the train split only.
    shards = sp.token_balanced_shards(
        spl.filter(F.col("split") == "train").select("doc", "n_tok"),
        "doc",
        "n_tok",
        TP3_SHARDS,
    ).select("doc", "shard")

    out = (
        flags.select(
            "doc", "source", "lang", "n_tok", "pass_gopher", "pass_entropy"
        )
        .join(dec.select("doc", "component", "is_dedup_kept"), "doc", "left")
        .join(contam, "doc", "left")
        .join(s4.select("doc", F.lit(True).alias("_cap")), "doc", "left")
        .join(
            spl.select("doc", F.lit(True).alias("_mix"), "split"), "doc", "left"
        )
        .join(shards, "doc", "left")
        .select(
            "doc",
            "source",
            "lang",
            F.col("n_tok").cast("long").alias("n_tok"),
            "pass_gopher",
            "pass_entropy",
            F.coalesce("component", "doc").cast("long").alias("component"),
            F.coalesce("is_dedup_kept", F.lit(False)).alias("is_dedup_kept"),
            F.coalesce("contam_flag", F.lit(False)).alias("is_contaminated"),
            F.coalesce("_cap", F.lit(False)).alias("pass_domain_cap"),
            F.coalesce("_mix", F.lit(False)).alias("pass_mix"),
            F.coalesce("split", F.lit("none")).alias("split"),
            F.coalesce("shard", F.lit(-1)).cast("long").alias("shard"),
        )
    )
    return out.withColumn(
        "disposition",
        F.when(~(F.col("pass_gopher") & F.col("pass_entropy")), "screened")
        .when(~F.col("is_dedup_kept"), "duplicate")
        .when(F.col("is_contaminated"), "contaminated")
        .when(~F.col("pass_domain_cap"), "domain_capped")
        .when(~F.col("pass_mix"), "mix_unsampled")
        .otherwise("kept"),
    )


def _tp3_oracle() -> str:
    """Staged composition of the existing stage oracles (the tp2/td15
    pattern): every CTE is MATERIALIZED (DuckDB CTE inlining otherwise
    re-derives multi-referenced chains per reference — the round-11
    g5 70 GB lesson)."""
    from omfietser_etl_spark.textops.selection import DSIR_Q

    from .textops import (
        EVAL_SOURCE,
        TP2_ENT_MAX_BITS,
        TP2_ENT_MIN_BITS,
        _ta9_oracle,
        _ta10_oracle,
        _td3_oracle,
        _td18_oracle,
    )

    scale = 1 << DSIR_Q
    ntok = _DK_NTOK.format(c="d.text")
    s = TP3_SHARDS
    return f"""
WITH RECURSIVE
g AS MATERIALIZED (SELECT * FROM ({_ta9_oracle()}) AS _g),
ent AS MATERIALIZED (SELECT * FROM ({_ta10_oracle()}) AS _e),
corpus AS MATERIALIZED (
  SELECT d.doc_id AS doc, d.source, d.lang, {ntok} AS n_tok,
         (g.ok_word_count AND g.ok_word_len AND g.ok_symbol_ratio
          AND g.ok_bullet_ellipsis AND g.ok_alpha_words) AS pass_gopher,
         (ent.ent_q >= {TP2_ENT_MIN_BITS} * ent.n_chars * {scale}
          AND ent.ent_q <= {TP2_ENT_MAX_BITS} * ent.n_chars * {scale})
           AS pass_entropy
  FROM documents d
  JOIN g ON g.doc = d.doc_id
  JOIN ent ON ent.doc = d.doc_id
  WHERE d.source <> '{EVAL_SOURCE}'),
sdocs AS MATERIALIZED (
  SELECT doc FROM corpus WHERE pass_gopher AND pass_entropy),
p0 AS MATERIALIZED (
  SELECT doc_lo, doc_hi FROM ({_td3_oracle()}) AS _p
  WHERE doc_lo IN (SELECT doc FROM sdocs)
    AND doc_hi IN (SELECT doc FROM sdocs)),
edges AS (SELECT doc_lo AS a, doc_hi AS b FROM p0
          UNION
          SELECT doc_hi AS a, doc_lo AS b FROM p0),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a),
comp AS MATERIALIZED (
  SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a),
dec0 AS MATERIALIZED (
  SELECT s.doc, CAST(coalesce(c.component, s.doc) AS BIGINT) AS component
  FROM sdocs s LEFT JOIN comp c ON c.node = s.doc),
dec AS MATERIALIZED (
  SELECT doc, component,
         doc = min(doc) OVER (PARTITION BY component) AS is_kept
  FROM dec0),
ct AS MATERIALIZED (
  SELECT doc, contam_bp >= {TP3_CONTAM_BP} AS flagged
  FROM ({_td18_oracle()}) AS _t),
s3 AS MATERIALIZED (
  SELECT d.doc, c.source, c.lang, c.n_tok
  FROM dec d
  JOIN corpus c ON c.doc = d.doc
  LEFT JOIN ct ON ct.doc = d.doc
  WHERE d.is_kept AND NOT coalesce(ct.flagged, FALSE)),
capc AS MATERIALIZED (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM s3 GROUP BY source),
capt AS MATERIALIZED (
  SELECT CAST(sum(n_docs) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS d
  FROM capc),
capa AS MATERIALIZED (
  SELECT source,
         least(n_docs, (n * {TS20_CAP_X_FAIR_BP}) // (10000 * d)) AS alloc
  FROM capc, capt),
capr AS MATERIALIZED (
  SELECT doc, source, lang, n_tok,
         row_number() OVER (PARTITION BY source
                            ORDER BY {_dk_bucket('tp3cap', 'doc')}, doc) AS rk
  FROM s3),
s4 AS MATERIALIZED (
  SELECT capr.doc, capr.source, capr.lang, capr.n_tok
  FROM capr JOIN capa ON capr.source = capa.source
  WHERE capr.rk <= capa.alloc),
uc AS MATERIALIZED (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM s4 GROUP BY lang),
ur AS MATERIALIZED (
  SELECT lang, n_docs,
         CAST(sum(n_docs) OVER () AS BIGINT) AS n,
         CAST(count(*) OVER () AS BIGINT) AS k,
         CAST(coalesce(sum(n_docs) OVER (ORDER BY n_docs, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS pfx,
         CAST(row_number() OVER (ORDER BY n_docs, lang) - 1 AS BIGINT) AS i
  FROM uc),
uf AS MATERIALIZED (
  SELECT *, (n * {TS10_BUDGET_BP}) // 10000 AS b,
         (pfx + n_docs * (k - i) <= (n * {TS10_BUDGET_BP}) // 10000)
           AS is_capped
  FROM ur),
ul AS MATERIALIZED (
  SELECT *,
         CAST(sum(CASE WHEN is_capped THEN n_docs ELSE 0 END) OVER ()
              AS BIGINT) AS taken,
         CAST(sum(CASE WHEN is_capped THEN 1 ELSE 0 END) OVER () AS BIGINT)
           AS m
  FROM uf),
ua AS MATERIALIZED (
  SELECT lang,
         CASE WHEN is_capped THEN n_docs
              ELSE least(n_docs,
                         CASE WHEN m < k THEN (b - taken) // (k - m)
                              ELSE 0 END)
         END AS alloc
  FROM ul),
mixr AS MATERIALIZED (
  SELECT doc, lang, n_tok,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {_dk_bucket('tp3mix', 'doc')}, doc) AS rk
  FROM s4),
s5 AS MATERIALIZED (
  SELECT mixr.doc, mixr.lang, mixr.n_tok
  FROM mixr JOIN ua ON mixr.lang = ua.lang
  WHERE mixr.rk <= ua.alloc),
spl AS MATERIALIZED (
  SELECT doc, n_tok, group_key,
         CASE WHEN {_dk_bucket('split', 'group_key')} < 9000 THEN 'train'
              WHEN {_dk_bucket('split', 'group_key')} < 9500 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT s5.doc, s5.n_tok,
               CAST(d.component AS VARCHAR) AS group_key
        FROM s5 JOIN dec d ON d.doc = s5.doc) AS _k),
tr AS MATERIALIZED (
  SELECT doc, n_tok,
         CAST(row_number() OVER (ORDER BY n_tok DESC, doc) AS BIGINT) AS rank
  FROM spl WHERE split = 'train'),
shr AS MATERIALIZED (
  SELECT doc,
         CAST(CASE WHEN ((rank - 1) // {s}) % 2 = 0
                   THEN (rank - 1) % {s}
                   ELSE {s - 1} - ((rank - 1) % {s}) END AS BIGINT) AS shard
  FROM tr)
SELECT c.doc, c.source, c.lang, CAST(c.n_tok AS BIGINT) AS n_tok,
       c.pass_gopher, c.pass_entropy,
       CAST(coalesce(d.component, c.doc) AS BIGINT) AS component,
       coalesce(d.is_kept, FALSE) AS is_dedup_kept,
       (coalesce(d.is_kept, FALSE) AND coalesce(ct.flagged, FALSE))
         AS is_contaminated,
       (s4.doc IS NOT NULL) AS pass_domain_cap,
       (s5.doc IS NOT NULL) AS pass_mix,
       coalesce(spl.split, 'none') AS split,
       CAST(coalesce(shr.shard, -1) AS BIGINT) AS shard,
       CASE WHEN NOT (c.pass_gopher AND c.pass_entropy) THEN 'screened'
            WHEN NOT coalesce(d.is_kept, FALSE) THEN 'duplicate'
            WHEN coalesce(ct.flagged, FALSE) THEN 'contaminated'
            WHEN s4.doc IS NULL THEN 'domain_capped'
            WHEN s5.doc IS NULL THEN 'mix_unsampled'
            ELSE 'kept' END AS disposition
FROM corpus c
LEFT JOIN dec d USING (doc)
LEFT JOIN ct ON ct.doc = c.doc
LEFT JOIN s4 ON s4.doc = c.doc
LEFT JOIN s5 ON s5.doc = c.doc
LEFT JOIN spl ON spl.doc = c.doc
LEFT JOIN shr ON shr.doc = c.doc
"""


# ---------------------------------------------------------------- #
# ts6 — tokenization to ids through the induced vocabulary
# ---------------------------------------------------------------- #


def ts6_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """Text→tensor step: every document's token stream mapped to
    integer ids through the tv1-induced vocabulary (rank = id,
    OOV → 0), ids emitted in original order. Broadcast vocab →
    map-side join; one doc-keyed reassembly."""
    from omfietser_etl_spark.textops.chunking import tokenize_to_ids

    from .textops import tv1_top_terms

    docs = load(spark, sf, "documents")
    vocab = tv1_top_terms(spark, sf).select(
        "term", F.col("rank").alias("id")
    )
    return tokenize_to_ids(docs, vocab)


def _ts6_oracle() -> str:
    from .textops import DK_TOKENS, TV1_TOP_K

    dk = DK_TOKENS.format(c="text")
    return f"""
WITH d AS (SELECT doc_id AS doc, {dk} AS t FROM documents),
allt AS (SELECT doc, unnest(t) AS term FROM d),
agg AS (SELECT term, count(*) AS tf FROM allt GROUP BY term),
v AS (SELECT term, row_number() OVER (ORDER BY tf DESC, term ASC) AS id
      FROM agg ORDER BY tf DESC, term ASC LIMIT {TV1_TOP_K}),
l AS (SELECT doc, unnest(list_transform(range(0, len(t)),
          i -> struct_pack(pos := i, term := t[i + 1]))) AS s FROM d),
m AS (SELECT doc, s.pos AS pos, coalesce(v.id, 0) AS tid
      FROM l LEFT JOIN v ON v.term = s.term)
SELECT doc,
  count(*) AS n_tokens,
  CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
  array_to_string(list_transform(
      list_sort(list(struct_pack(pos := pos, tid := tid))),
      s -> CAST(s.tid AS VARCHAR)), ',') AS ids_csv
FROM m GROUP BY doc
"""


# ---------------------------------------------------------------- #
# tp1 — the composed corpus-preparation pipeline
# ---------------------------------------------------------------- #

TP1_EVAL = "src9"
TP1_MIN_TOK, TP1_MAX_TOK = 15, 90
TP1_CONTAM_BP, TP1_DUP_BP = 2000, 1500


def tp1_prepare_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end corpus preparation (textops/pipeline.py): length
    filter → exact dedup → decontamination vs the src9 benchmark
    slice → repetition screen → split → export shuffle. Every stage
    is one of the individually-gated operators; this gates their
    composition."""
    from omfietser_etl_spark.textops.pipeline import prepare_corpus

    docs = load(spark, sf, "documents")
    return prepare_corpus(
        docs.filter(F.col("source") != TP1_EVAL),
        docs.filter(F.col("source") == TP1_EVAL),
        min_tok=TP1_MIN_TOK,
        max_tok=TP1_MAX_TOK,
        contam_threshold_bp=TP1_CONTAM_BP,
        dup_bp_max=TP1_DUP_BP,
    )


TP1_ORACLE = f"""
WITH d0 AS (
  SELECT doc_id AS doc, source, text,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
             AS BIGINT) AS n_tok
  FROM documents WHERE source <> '{TP1_EVAL}'),
d1 AS (SELECT * FROM d0 WHERE n_tok >= {TP1_MIN_TOK} AND n_tok <= {TP1_MAX_TOK}),
d2 AS (SELECT *, row_number() OVER (
           PARTITION BY {DK_NORM.format(c='text')} ORDER BY doc) AS rn FROM d1),
d3 AS (SELECT doc, source, text, n_tok FROM d2 WHERE rn = 1),
tok AS (SELECT doc, {DK_TOKENS.format(c='text')} AS t FROM d3),
sh AS (SELECT doc, unnest({dk_shingles('t')}) AS s FROM tok),
etok AS (SELECT doc_id AS doc, {DK_TOKENS.format(c='text')} AS t
         FROM documents WHERE source = '{TP1_EVAL}'),
esh AS (SELECT DISTINCT unnest({dk_shingles('t')}) AS s FROM etok),
sz AS (SELECT doc, count(*) AS n_sh FROM sh GROUP BY doc),
ht AS (SELECT doc, count(*) AS n_hit FROM sh JOIN esh USING (s) GROUP BY doc),
cm AS (SELECT sz.doc, (10000 * coalesce(n_hit, 0)) // n_sh AS contam_bp
       FROM sz LEFT JOIN ht ON sz.doc = ht.doc),
d4 AS (SELECT d3.* FROM d3 LEFT JOIN cm ON d3.doc = cm.doc
       WHERE coalesce(contam_bp, 0) < {TP1_CONTAM_BP}),
g AS (SELECT doc, unnest(CASE WHEN len(t) >= 2 THEN
          [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]
          ELSE [] END) AS g
      FROM (SELECT doc, {DK_TOKENS.format(c='text')} AS t FROM d4)),
pg AS (SELECT doc, g, count(*) AS cnt FROM g GROUP BY doc, g),
rp AS (SELECT doc, (10000 * sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END))
                   // sum(cnt) AS dup_bp FROM pg GROUP BY doc),
d5 AS (SELECT d4.doc, d4.source, d4.n_tok FROM d4 LEFT JOIN rp ON d4.doc = rp.doc
       WHERE coalesce(dup_bp, 0) <= {TP1_DUP_BP}),
a AS (SELECT doc, source, n_tok,
        CASE WHEN {_dk_bucket('split', 'doc')} < 9000 THEN 'train'
             WHEN {_dk_bucket('split', 'doc')} < 9500 THEN 'val'
             ELSE 'test' END AS split,
        CAST({_dk_bucket('split:shard', 'doc')} % 8 AS BIGINT) AS shard,
        {_dk_bucket('shuffle:ord', 'doc')} AS ord
      FROM d5)
SELECT doc, source, n_tok, split, shard,
       CAST(row_number() OVER (PARTITION BY split, shard ORDER BY ord, doc)
           AS BIGINT) AS pos
FROM a
"""


# ---------------------------------------------------------------- #
# tk1 — distributed BPE encode under the committed merge artifact
# ---------------------------------------------------------------- #

#: 40-merge BPE table trained ONCE at sf0.001 by
#: textops/bpe.py::train_bpe (deterministic: weighted pair argmax,
#: ties by pair) and committed as a model artifact — the x8/x9 NB
#: pattern: the catalog query applies the FIXED artifact, and the
#: fit itself is gated by tests/test_bpe.py::test_artifact_matches_fit
#: re-deriving this exact list from the corpus.
BPE_MERGES = [
    ("e", "r", 0), ("e", "</w>", 1), ("n", "</w>", 2), ("o", "r", 3),
    ("t", "</w>", 4), ("er", "</w>", 5), ("o", "w", 6), ("ow", "</w>", 7),
    ("l", "u", 8), ("i", "n", 9), ("y", "</w>", 10), ("a", "r", 11),
    ("p", "ar", 12), ("g", "</w>", 13), ("a", "s", 14), ("h", "</w>", 15),
    ("a", "</w>", 16), ("s", "t", 17), ("a", "t", 18), ("a", "n</w>", 19),
    ("c", "an</w>", 20), ("s", "can</w>", 21), ("c", "o", 22),
    ("co", "lu", 23), ("colu", "m", 24), ("colum", "n</w>", 25),
    ("d", "ow</w>", 26), ("in", "dow</w>", 27), ("w", "indow</w>", 28),
    ("d", "er</w>", 29), ("or", "der</w>", 30), ("or", "t</w>", 31),
    ("s", "ort</w>", 32), ("p", "</w>", 33), ("par", "t</w>", 34),
    ("u", "p</w>", 35), ("a", "g", 36), ("ag", "g</w>", 37),
    ("a", "lu", 38), ("alu", "e</w>", 39),
]


def tk1_bpe_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Apply the committed BPE merge table to every document
    (textops/bpe.py::bpe_encode): segmentation computed once per
    DISTINCT word as a codegen replace-chain, broadcast-joined back
    to the corpus token stream — the tokenizer-apply step between
    BPE training (unit-gated) and sequence packing (ts3)."""
    from omfietser_etl_spark.textops.bpe import bpe_encode

    return bpe_encode(load(spark, sf, "documents"), BPE_MERGES)


def _tk1_oracle() -> str:
    sep, end = "|", "</w>"
    s = (
        f"concat(regexp_replace(word, '(.)', '{sep}\\1{sep}', 'g'), "
        f"'{sep}{end}{sep}')"
    )
    for a, b, _ in sorted(BPE_MERGES, key=lambda m: m[2]):
        s = f"replace({s}, '{sep}{a}{sep}{sep}{b}{sep}', '{sep}{a}{b}{sep}')"
    seg = (
        f"list_filter(string_split(substring({s}, 2, length({s}) - 2), "
        f"'{sep}{sep}'), x -> x <> '')"
    )
    dk = DK_TOKENS.format(c="text")
    return f"""
WITH d AS (SELECT doc_id AS doc, {dk} AS t FROM documents),
tw AS (SELECT doc, unnest(list_transform(range(0, len(t)),
           i -> struct_pack(pos := i, word := t[i + 1]))) AS s FROM d),
toks AS (SELECT doc, s.pos AS pos, s.word AS word FROM tw),
w AS (SELECT DISTINCT word FROM toks),
seg AS (SELECT word, {seg} AS syms FROM w),
j AS (SELECT t.doc, t.pos, seg.syms FROM toks t JOIN seg ON seg.word = t.word)
SELECT doc, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(len(syms)) AS BIGINT) AS n_subwords,
       array_to_string(flatten(list_transform(
           list_sort(list(struct_pack(pos := pos, syms := syms))),
           s -> s.syms)), ' ') AS subs_csv
FROM j GROUP BY doc
"""


def tk2_bpe_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """BPE decode / roundtrip audit (textops/bpe.py::bpe_decode_expr):
    detokenize tk1's subword stream and compare against the original
    normalized word stream — the lossless-roundtrip invariant every
    tokenizer-apply pipeline asserts before writing training shards.
    Decode is pure map-side string ops on top of tk1's plan; the
    comparison join is doc-keyed (one shuffle)."""
    from omfietser_etl_spark.textops.analysis import tokens
    from omfietser_etl_spark.textops.bpe import bpe_decode_expr, bpe_encode

    docs = load(spark, sf, "documents")
    enc = bpe_encode(docs, BPE_MERGES).withColumn(
        "decoded", F.expr(bpe_decode_expr("subs_csv"))
    )
    orig = docs.select(
        F.col("doc_id").alias("doc"),
        F.array_join(tokens("text"), " ").alias("orig"),
    )
    return (
        enc.join(orig, "doc")
        .select(
            "doc",
            "n_words",
            "n_subwords",
            (F.col("decoded") == F.col("orig")).cast("int").alias("roundtrip_ok"),
        )
    )


def _tk2_oracle() -> str:
    dk = DK_TOKENS.format(c="text")
    dec = (
        "trim(replace(replace(subs_csv, ' ', ''), '</w>', ' '))"
    )
    return f"""
WITH enc AS ({_tk1_oracle()}),
orig AS (SELECT doc_id AS doc, array_to_string({dk}, ' ') AS orig
         FROM documents)
SELECT enc.doc, enc.n_words, enc.n_subwords,
       CAST({dec} = orig AS INT) AS roundtrip_ok
FROM enc JOIN orig ON enc.doc = orig.doc
"""


def tk3_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language tokenizer-fit audit of the committed BPE table:
    fertility (subwords per word, ×100) and the unmerged-word rate
    (words the vocab segments all the way down to characters —
    n_syms = n_chars + 1, i.e. zero merges applied) — the standard
    "does this tokenizer serve every language slice" check run
    before committing a vocab to a training run (high fertility on a
    slice = that slice pays more sequence length per word).

    Exactness: pure integer counts; fertility_x100 =
    (100·n_subwords) div n_words and unmerged_bp =
    (10000·n_unmerged) div n_words. Scale shape: segmentation runs
    once per DISTINCT word (model-sized codegen replace-chain,
    broadcast back — the tk1 contract); the corpus pass is one
    (lang, word) hash agg; the per-lang rollup is k-row."""
    from omfietser_etl_spark.textops.analysis import tokens
    from omfietser_etl_spark.textops.bpe import segment_words_expr

    docs = load(spark, sf, "documents")
    toks = docs.select("lang", F.explode(tokens("text")).alias("word"))
    wc = toks.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("n"))
    seg = (
        wc.select("word").distinct()
        .select("word",
                F.expr(segment_words_expr("word", BPE_MERGES)).alias("syms"))
    )
    j = wc.join(F.broadcast(seg), "word").select(
        "lang",
        "n",
        F.size("syms").cast("long").alias("n_syms"),
        F.length("word").cast("long").alias("n_chars"),
    )
    per_lang = j.groupBy("lang").agg(
        F.sum("n").cast("long").alias("n_words"),
        F.sum(F.col("n") * F.col("n_syms")).cast("long").alias("n_subwords"),
        F.sum(
            F.when(F.col("n_syms") == F.col("n_chars") + 1, F.col("n"))
            .otherwise(F.lit(0))
        ).cast("long").alias("n_unmerged"),
    )
    return per_lang.select(
        "lang",
        "n_words",
        "n_subwords",
        "n_unmerged",
        F.expr("CAST((100 * n_subwords) div n_words AS BIGINT)")
        .alias("fertility_x100"),
        F.expr("CAST((10000 * n_unmerged) div n_words AS BIGINT)")
        .alias("unmerged_bp"),
    )


def _tk3_oracle() -> str:
    sep, end = "|", "</w>"
    s = (
        f"concat(regexp_replace(word, '(.)', '{sep}\\1{sep}', 'g'), "
        f"'{sep}{end}{sep}')"
    )
    for a, b, _ in sorted(BPE_MERGES, key=lambda m: m[2]):
        s = f"replace({s}, '{sep}{a}{sep}{sep}{b}{sep}', '{sep}{a}{b}{sep}')"
    seg = (
        f"list_filter(string_split(substring({s}, 2, length({s}) - 2), "
        f"'{sep}{sep}'), x -> x <> '')"
    )
    dk = DK_TOKENS.format(c="text")
    return f"""
WITH d AS (SELECT lang, unnest({dk}) AS word FROM documents),
wc AS (SELECT lang, word, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1, 2),
w AS (SELECT DISTINCT word FROM wc),
seg AS (SELECT word, len({seg}) AS n_syms, length(word) AS n_chars FROM w),
j AS (SELECT lang, n, n_syms, n_chars FROM wc JOIN seg USING (word)),
pl AS (SELECT lang,
              CAST(SUM(n) AS BIGINT) AS n_words,
              CAST(SUM(n * n_syms) AS BIGINT) AS n_subwords,
              CAST(SUM(CASE WHEN n_syms = n_chars + 1 THEN n ELSE 0 END)
                   AS BIGINT) AS n_unmerged
       FROM j GROUP BY lang)
SELECT lang, n_words, n_subwords, n_unmerged,
       CAST((100 * n_subwords) // n_words AS BIGINT) AS fertility_x100,
       CAST((10000 * n_unmerged) // n_words AS BIGINT) AS unmerged_bp
FROM pl
"""


SPECS = [
    QuerySpec("ts1_hash_sample", ts1_hash_sample, TS1_ORACLE,
              "deterministic hash sampling (retry-stable, monotone)"),
    QuerySpec("ts2_mixture_split", ts2_mixture_split, TS2_ORACLE,
              "train/val/test + shard assignment by salted hash"),
    QuerySpec("ts3_sequence_pack", ts3_sequence_pack, TS3_ORACLE,
              "concat-then-chunk packing plan per stream"),
    QuerySpec("ts4_stratified_sample", ts4_stratified_sample, TS4_ORACLE,
              "per-group-rate deterministic sampling (corpus rebalancing)"),
    QuerySpec("ts5_shuffle_order", ts5_shuffle_order, TS5_ORACLE,
              "deterministic global shuffle (shard + position)"),
    QuerySpec("tp1_prepare_corpus", tp1_prepare_corpus, TP1_ORACLE,
              "composed corpus-preparation pipeline"),
    QuerySpec("tp3_full_corpus_prep", tp3_full_corpus_prep, _tp3_oracle(),
              "capstone per-document disposition: screens -> fuzzy dedup -> "
              "Bloom decontam -> domain cap -> UNIMAX mix -> leakage-free "
              "split -> token-balanced shards"),
    QuerySpec("ts6_tokenize", ts6_tokenize, _ts6_oracle(),
              "tokenization to ids via induced vocabulary"),
    QuerySpec("ts7_weighted_sample", ts7_weighted_sample, _ts7_oracle(),
              "quality-weighted curriculum sampling"),
    QuerySpec("ts8_temperature_rebalance", ts8_temperature_rebalance, _ts8_oracle(),
              "temperature (α=0.5) multilingual rebalancing"),
    QuerySpec("ts9_fixed_size_sample", ts9_fixed_size_sample, TS9_ORACLE,
              "deterministic exactly-n-per-group sample (eval carving)"),
    QuerySpec("ts10_unimax_budget", ts10_unimax_budget, TS10_ORACLE,
              "UNIMAX budget allocation (uniform-with-caps water-filling)"),
    QuerySpec("ts11_unimax_realized", ts11_unimax_realized, TS11_ORACLE,
              "UNIMAX allocation realized as hash-rank corpus membership"),
    QuerySpec("ts12_token_unimax_realized", ts12_token_unimax_realized,
              _ts12_oracle(),
              "token-denominated UNIMAX: allocation + cumulative-sum membership"),
    QuerySpec("ts13_token_balanced_shards", ts13_token_balanced_shards,
              _ts13_oracle(),
              "token-balanced shard assignment (snake over tokens-desc rank)"),
    QuerySpec("ts14_leakage_free_split", ts14_leakage_free_split, _ts14_oracle(),
              "dedup-aware split: near-dup components assigned atomically"),
    QuerySpec("ts20_domain_cap", ts20_domain_cap, TS20_ORACLE,
              "C4/Dolma per-domain frequency cap realized as hash-rank "
              "membership (fair-share bound, kept-id checksum gated)"),
    QuerySpec("tk1_bpe_encode", tk1_bpe_encode, _tk1_oracle(),
              "distributed BPE encode (fixed merge artifact, broadcast "
              "distinct-word segmentation)"),
    QuerySpec("tk2_bpe_roundtrip", tk2_bpe_roundtrip, _tk2_oracle(),
              "BPE decode + lossless-roundtrip audit"),
    QuerySpec("tk3_vocab_coverage", tk3_vocab_coverage, _tk3_oracle(),
              "per-language BPE fertility + unmerged-word rate audit"),
]
