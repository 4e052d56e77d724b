"""Corpus-level QC for training-data preparation: benchmark
decontamination and intra-document repetition signals.

Both are standard LLM-corpus operators (beyond the reference's
surface; the brief's training-data mandate):

- ``contamination_stats`` — the decontamination check every training
  pipeline runs before a data release: for each training document,
  the fraction of its distinct word n-grams that also appear in a
  held-out benchmark/eval set. Scale shape: the eval side is a
  benchmark (thousands of docs, not billions), so its distinct
  shingle set is BROADCAST and the check is a map-side join over the
  corpus — the corpus never shuffles. Swap the raw shingle string for
  ``poly_hash(s)`` to shrink the broadcast at production scale; the
  semantics don't change.
- ``ngram_repetition_stats`` — Gopher-style repetition filters
  (duplicate n-gram fraction, top n-gram fraction). One explode +
  two hash aggregates, both keyed on doc — partial aggregation
  map-side, no joins. All outputs are exact integers (counts and
  floor basis points), so the DuckDB gate hashes them bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import ngrams, tokens
from .constants import SHINGLE_N
from .dedup import doc_shingles

#: default contamination flag threshold: ≥20% shingles hit → contaminated.
CONTAM_THRESHOLD_BP = 2000


def contamination_stats(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = SHINGLE_N,
    threshold_bp: int = CONTAM_THRESHOLD_BP,
) -> DataFrame:
    """Per-corpus-doc benchmark-overlap stats.

    Returns (doc, n_sh, n_hit, contam_bp, is_contaminated): distinct
    shingle count, how many of those appear anywhere in ``eval_df``,
    the floor-basis-point ratio, and the threshold flag (int 0/1 for
    engine-portable hashing). Docs shorter than one shingle are
    excluded (no measurable overlap).
    """
    train_sh = doc_shingles(corpus, id_col, text_col, n)
    eval_sh = doc_shingles(eval_df, id_col, text_col, n).select("s").distinct()
    sizes = train_sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    hits = (
        train_sh.join(F.broadcast(eval_sh), "s")
        .groupBy("doc")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        sizes.join(hits, "doc", "left")
        .withColumn("n_hit", F.coalesce("n_hit", F.lit(0)))
        .withColumn("contam_bp", F.expr("(10000 * n_hit) div n_sh"))
        .withColumn(
            "is_contaminated",
            (F.col("contam_bp") >= threshold_bp).cast("int"),
        )
    )


def fuzzy_contamination_pairs(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = SHINGLE_N,
    tau_num: int = 1,
    tau_den: int = 2,
    hash_shingles: bool = False,
) -> DataFrame:
    """(doc, bench, n_inter, jaccard_bp) — every (training doc,
    benchmark doc) pair whose distinct-shingle Jaccard ≥ τ =
    tau_num/tau_den: FUZZY decontamination, the near-duplicate
    complement of :func:`contamination_stats`'s exact-overlap share
    (the Dolma/FineWeb eval-dedup step — an eval question paraphrased
    or lightly edited into the crawl still leaks the benchmark, and
    per-shingle overlap alone cannot say WHICH eval doc it leaks).

    EXACT, recall 1: candidates come from the BIPARTITE shared-shingle
    equi-join (any pair with J ≥ τ > 0 shares ≥ 1 shingle — lossless,
    the td2 blocking argument), then the integer cross-multiplied test
    tau_den·|∩| ≥ tau_num·|∪| verifies with no float anywhere;
    jaccard_bp = (10000·|∩|) div |∪|.

    Scale shape: eval suites are small (10³-10⁵ docs), so the
    benchmark shingle frame BROADCASTS and the training corpus never
    shuffles for candidate generation — per-shingle fan-out is
    n_train(s)·n_eval(s), bounded by the compact eval side exactly
    where a self-join would explode. One (doc, bench) hash agg and a
    size join verify. ``hash_shingles=True`` is the 8-byte-key path
    (see doc_shingles).
    """
    tr = doc_shingles(corpus, id_col, text_col, n, hash_shingles)
    ev = doc_shingles(eval_df, id_col, text_col, n, hash_shingles)
    szt = tr.groupBy("doc").agg(F.count("*").alias("n_t"))
    sze = ev.groupBy("doc").agg(F.count("*").alias("n_e"))
    inter = (
        tr.join(
            F.broadcast(ev.withColumnRenamed("doc", "bench")), "s"
        )
        .groupBy("doc", "bench")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    return (
        inter.join(szt, "doc")
        .join(F.broadcast(sze.withColumnRenamed("doc", "bench")), "bench")
        .filter(
            F.expr(
                f"{tau_den} * n_inter >= {tau_num} * (n_t + n_e - n_inter)"
            )
        )
        .select(
            "doc",
            "bench",
            "n_inter",
            F.expr("(10000 * n_inter) div (n_t + n_e - n_inter)")
            .cast("long")
            .alias("jaccard_bp"),
        )
    )


def ngram_repetition_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Per-doc repeated n-gram signals (with multiplicity).

    Returns (doc, n_grams, top_cnt, dup_cnt, dup_bp): total n-gram
    occurrences, the most frequent n-gram's count, occurrences of
    n-grams appearing more than once, and the duplicate fraction in
    floor basis points. Docs shorter than one n-gram are excluded.
    """
    toks = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("t"))
    grams = toks.select("doc", F.explode(ngrams("t", n)).alias("g"))
    per_gram = grams.groupBy("doc", "g").agg(F.count("*").alias("cnt"))
    return (
        per_gram.groupBy("doc")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.max("cnt").alias("top_cnt"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
                "dup_cnt"
            ),
        )
        .withColumn("dup_bp", F.expr("(10000 * dup_cnt) div n_grams"))
    )


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_occurrences: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide line-level dedup (the C4 rule: drop any line that
    appears in more than ``max_occurrences`` DISTINCT documents —
    boilerplate headers, cookie banners, navigation). A line repeated
    inside a single document is NOT boilerplate under this rule and
    survives. Documents keep their remaining lines re-joined in
    original order.

    ``sep`` picks the dedup granularity: the default newline is the
    C4 line rule; a blank-line separator ("\\n\\n") gives Dolma-style
    PARAGRAPH dedup with the identical one-agg/one-join scale shape
    (td30). The separator is treated literally on both engines.

    Scale shape: ONE line-keyed hash agg builds the global occurrence
    counts (map-side partial agg collapses repeats early), then one
    shuffle join lines→counts and one doc-keyed agg to reassemble.
    The line count table is data-sized — this is the one corpus op
    that genuinely joins big×big, which is why the join key is the
    line HASH-equality (Spark hashes the string key) and never a
    similarity predicate.

    Returns (doc, clean_text, n_kept, n_dropped).
    """
    # F.split takes a regex; both supported separators ("\n", "\n\n")
    # are regex-literal, so no quoting is needed.
    lines = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    counts = lines.groupBy("line").agg(F.countDistinct("doc").alias("n_occ"))
    tagged = lines.join(counts, "line").withColumn(
        "keep", F.col("n_occ") <= max_occurrences
    )
    return (
        tagged.groupBy("doc")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list("
                    "CASE WHEN keep THEN struct(pos, line) END)), s -> s.line)"
                ),
                sep,
            ).alias("clean_text"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("n_dropped"),
        )
    )
