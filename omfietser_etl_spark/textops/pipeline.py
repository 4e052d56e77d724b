"""The composed training-data preparation pipeline: the end-to-end
flow a corpus release runs, chaining the individually-gated operators
in their scale-correct order.

    length filter → exact dedup → decontamination → repetition
    filter → train/val/test split → deterministic export shuffle

Stage ordering is the cost argument: the cheapest, most selective
filters run first (length — a pure map-side predicate pushed into the
scan), then the one norm-key shuffle (dedup), then the broadcast
decontamination join (corpus never shuffles), then the explode-based
repetition screen (only survivors pay the n-gram agg), and only the
final survivors take the split/shuffle addressing (map-side hashes +
one shard-keyed window). Every "random" decision is a salted integer
hash of the stable doc id — retry-stable, engine-portable,
reproducible (see sampling module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cacheutil import register, release
from .analysis import norm_text, ws_token_count
from .decontam import contamination_stats, ngram_repetition_stats
from .sampling import hash_bucket, mixture_split

_SCOPE = "textops.prepare_corpus"


def release_caches() -> None:
    """Unpersist every frame persisted by earlier prepare_corpus calls
    (see cacheutil — each new call does this automatically)."""
    release(_SCOPE)


def prepare_corpus(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tok: int = 15,
    max_tok: int = 90,
    contam_threshold_bp: int = 2000,
    dup_bp_max: int = 1500,
    n_shards: int = 8,
    materialize: bool = True,
) -> DataFrame:
    """Run the full preparation chain; returns one row per surviving
    document with its export address:
    (doc, source, n_tok, split, shard, pos).

    Documents too short to produce shingles/2-grams pass the contam /
    repetition screens by definition (nothing measurable to match).

    ``materialize`` persists the corpus at the two fan-out points
    (post-dedup and post-decontamination), where the frame feeds both
    a stats computation AND the subsequent join — without it every
    screen re-reads and re-dedups the corpus from the source (8 scans
    observed; 3 with). On a real 100 TB run, swap the persists for
    checkpoints to the lake between stages — same call sites.

    Each call releases the PREVIOUS call's persisted frames (see
    release_caches), so repeated invocations don't accumulate cached
    partitions; call release_caches() directly to free the last run's.
    """
    from pyspark import StorageLevel

    release_caches()
    d = docs.select(
        F.col(id_col).alias("doc"), "source", F.col(text_col).alias("text")
    ).withColumn("n_tok", ws_token_count("text"))
    d = d.filter((F.col("n_tok") >= min_tok) & (F.col("n_tok") <= max_tok))

    # exact dedup: keep the lowest doc id per normalized text
    w_dup = Window.partitionBy(norm_text("text")).orderBy("doc")
    d = (
        d.withColumn("_rn", F.row_number().over(w_dup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if materialize:
        d = register(_SCOPE, d.persist(StorageLevel.MEMORY_AND_DISK))

    # decontamination: drop docs overlapping the benchmark set
    ev = eval_df.select(
        F.col(id_col).alias("doc"), F.col(text_col).alias("text")
    )
    contam = contamination_stats(d, ev, "doc", "text").select(
        "doc", "contam_bp"
    )
    d = d.join(contam, "doc", "left").filter(
        F.coalesce(F.col("contam_bp"), F.lit(0)) < contam_threshold_bp
    ).drop("contam_bp")
    if materialize:
        d = register(_SCOPE, d.persist(StorageLevel.MEMORY_AND_DISK))

    # repetition screen: drop high duplicate-2-gram docs
    rep = ngram_repetition_stats(d, "doc", "text").select("doc", "dup_bp")
    d = d.join(rep, "doc", "left").filter(
        F.coalesce(F.col("dup_bp"), F.lit(0)) <= dup_bp_max
    ).drop("dup_bp")

    # split + deterministic export address
    out = mixture_split(d.drop("text"), "doc", n_shards=n_shards)
    out = out.withColumn("_ord", hash_bucket("doc", "shuffle:ord"))
    w_pos = Window.partitionBy("split", "shard").orderBy("_ord", "doc")
    return out.withColumn("pos", F.row_number().over(w_pos)).select(
        "doc", "source", "n_tok", "split", "shard", "pos"
    )
