"""Distributed BPE tokenizer training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" —
public). Learns a merge table from a corpus; the companion encode
path is `chunking.tokenize_to_ids` over the emitted subword vocab.

Scale design (100 TB posture): BPE training never iterates over the
corpus — it iterates over the DISTINCT-WORD HISTOGRAM. One
corpus-scale aggregation produces (word, count); every merge
iteration then runs on that model-sized table (≤ a few million rows
at web scale after normalization):

- pair counting: map-side explode of adjacent symbol pairs weighted
  by the word count + one hash-agg (map-side combined);
- argmax: a 1-row collect (count desc, pair asc — deterministic
  tie-break);
- merge application: a per-row left fold over the symbol array
  (pure codegen, no shuffle);
- lineage: the histogram persists per round with a tracked
  localCheckpoint every CC_CHECKPOINT_EVERY rounds (same discipline
  as the connected-components loop — bounded plan depth, superseded
  blocks freed).

The merge sequence is EXACTLY the single-machine algorithm's (greedy
left-to-right application, deterministic tie-breaks), pinned by a
pure-Python reference implementation in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cacheutil import (
    register_rdd_ids,
    release,
    release_then_register,
    tracked_local_checkpoint,
    unpersist_rdd_ids,
)
from .analysis import tokens
from .dedup import CC_CHECKPOINT_EVERY

END_MARK = "</w>"


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) — the corpus's distinct-word histogram, the ONLY
    corpus-scale aggregation in BPE training."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _init_symbols(hist: DataFrame) -> DataFrame:
    """(word, cnt, syms) with syms = chars + the end-of-word marker."""
    return hist.select(
        "word",
        "cnt",
        F.expr(
            f"concat(filter(split(word, ''), c -> c <> ''), array('{END_MARK}'))"
        ).alias("syms"),
    )


def _pair_counts(sym: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency."""
    pairs = sym.select(
        "cnt",
        F.explode(
            F.expr(
                "CASE WHEN size(syms) >= 2 THEN "
                "transform(sequence(1, size(syms) - 1), "
                "i -> struct(syms[i - 1] AS a, syms[i] AS b)) "
                "ELSE array() END"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("cnt").alias("n"))


def _apply_merge(sym: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every adjacent (a, b) with the merged symbol, greedy
    left-to-right — one codegen fold, no shuffle. The accumulator
    carries the previous unmerged symbol; a merge consumes it."""
    qa, qb = a.replace("'", "\\'"), b.replace("'", "\\'")
    fold = (
        "aggregate(syms, "
        "struct(CAST(array() AS array<string>) AS out, CAST(NULL AS string) AS carry), "
        "(acc, s) -> CASE "
        f"WHEN acc.carry = '{qa}' AND s = '{qb}' "
        f"THEN struct(concat(acc.out, array('{qa}{qb}')) AS out, CAST(NULL AS string) AS carry) "
        "WHEN acc.carry IS NULL THEN struct(acc.out AS out, s AS carry) "
        "ELSE struct(concat(acc.out, array(acc.carry)) AS out, s AS carry) END, "
        "acc -> CASE WHEN acc.carry IS NULL THEN acc.out "
        "ELSE concat(acc.out, array(acc.carry)) END)"
    )
    return sym.select("word", "cnt", F.expr(fold).alias("syms"))


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges; returns [(a, b, rank)].

    Stops early when no pair reaches ``min_pair_count``. Each round:
    one histogram-scale shuffle + a 1-row collect; symbol rewriting
    is map-side. Ties break (count desc, a asc, b asc) so the merge
    sequence is deterministic and equal to the single-machine
    reference (pinned in tests/test_bpe.py)."""
    from pyspark import StorageLevel

    scope = "bpe.train"
    release(scope)
    sc = docs.sparkSession.sparkContext
    sym = release_then_register(
        scope,
        _init_symbols(word_histogram(docs, text_col)).persist(
            StorageLevel.MEMORY_AND_DISK
        ),
    )
    sym.count()
    merges: list[tuple[str, str, int]] = []
    ck_ids: set[int] = set()
    for rank in range(n_merges):
        best = (
            _pair_counts(sym)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b, rank))
        nxt = _apply_merge(sym, a, b)
        if (rank + 1) % CC_CHECKPOINT_EVERY == 0:
            nxt, new_ck = tracked_local_checkpoint(nxt)
        else:
            nxt = nxt.persist(StorageLevel.MEMORY_AND_DISK)
            new_ck = set()
        nxt.count()  # materialize before freeing the parent round
        sym.unpersist()
        unpersist_rdd_ids(sc, ck_ids)
        sym, ck_ids = nxt, new_ck
    release(scope)
    from ..cacheutil import register

    register(scope, sym)
    register_rdd_ids(scope, sc, ck_ids)
    return merges


def bpe_vocab(
    docs: DataFrame, text_col: str = "text", n_merges: int = 50
) -> DataFrame:
    """(term, id) subword vocabulary induced by the learned merges —
    ids ≥ 1 by frequency rank (ties by term), ready for
    `chunking.tokenize_to_ids`. Recomputes the final symbol table
    from the merge list (merges are cheap map-side folds)."""
    merges = train_bpe(docs, text_col, n_merges)
    sym = _init_symbols(word_histogram(docs, text_col))
    for a, b, _ in merges:
        sym = _apply_merge(sym, a, b)
    terms = (
        sym.select(F.explode("syms").alias("term"), "cnt")
        .groupBy("term")
        .agg(F.sum("cnt").alias("n"))
    )
    w = "(ORDER BY n DESC, term ASC)"
    return terms.select(
        "term", F.expr(f"row_number() OVER {w}").cast("long").alias("id")
    )


def segment_word_reference(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Driver-side reference encoder: apply the merge list in rank
    order to one word (greedy left-to-right per merge) — the exact
    mirror of _apply_merge, used by tests and for spot checks."""
    syms = list(word) + [END_MARK]
    for a, b, _ in merges:
        out: list[str] = []
        carry: str | None = None
        for s in syms:
            if carry == a and s == b:
                out.append(a + b)
                carry = None
            elif carry is None:
                carry = s
            else:
                out.append(carry)
                carry = s
        if carry is not None:
            out.append(carry)
        syms = out
    return syms


# ------------------------------------------------------------------ #
# Distributed ENCODE: apply a learned merge table to a corpus
# ------------------------------------------------------------------ #

SEP = "|"  # never occurs in tokens (alnum-only) or END_MARK


def segment_words_expr(word_col: str, merges: list[tuple[str, str, int]]) -> str:
    """SQL expression segmenting ``word_col`` under a FIXED merge list
    — pure codegen string ops, no fold, no shuffle.

    Wrapped-string trick: render the symbol list as ``|s1||s2||…|``
    (every symbol individually wrapped in separators). Applying merge
    (a, b) is then ONE literal ``replace(s, '|a||b|', '|ab|')``:
    leftmost non-overlapping replacement with resume-after-replacement
    is exactly the greedy left-to-right pass of the reference encoder
    (a merged symbol is consumed — its trailing ``|`` is single, so it
    can never seed a new match for the same rule), and a match can
    only occur at a genuine symbol boundary because ``||`` never
    appears inside a symbol. Chaining the merges in rank order gives
    the full segmentation as one nested expression both engines
    (Spark `replace`, DuckDB `replace`) evaluate identically.
    """
    s = (
        f"concat(regexp_replace({word_col}, '(.)', '{SEP}$1{SEP}'), "
        f"'{SEP}{END_MARK}{SEP}')"
    )
    for a, b, _ in sorted(merges, key=lambda m: m[2]):
        qa, qb = a.replace("'", "\\'"), b.replace("'", "\\'")
        s = f"replace({s}, '{SEP}{qa}{SEP}{SEP}{qb}{SEP}', '{SEP}{qa}{qb}{SEP}')"
    return (
        f"filter(split(substring({s}, 2, length({s}) - 2), '\\\\{SEP}\\\\{SEP}'), "
        "x -> x <> '')"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode every document into its BPE subword stream under a fixed
    trained merge table: (doc, n_words, n_subwords, subs_csv) with the
    subwords in original word order (space-joined for engine-portable
    gate hashing — symbols are alnum + '</w>', never spaces).

    Scale shape (how real tokenizer-apply jobs run): segmentation is
    computed ONCE per DISTINCT word — model-sized work, pure codegen
    string ops — and the corpus pass is a map-side explode + BROADCAST
    join on word + one doc-keyed ordered reassembly (the same
    one-shuffle contract as chunking.tokenize_to_ids; zero shuffles if
    the caller keeps the exploded (doc, pos, subwords) form, which is
    what a training-shard export writes).
    """
    from .analysis import tokens

    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(text_col)).alias("pos", "word"),
    )
    seg = (
        toks.select("word")
        .distinct()
        .select("word", F.expr(segment_words_expr("word", merges)).alias("syms"))
    )
    joined = toks.join(F.broadcast(seg), "word").select("doc", "pos", "syms")
    return joined.groupBy("doc").agg(
        F.count("*").alias("n_words"),
        F.sum(F.size("syms")).cast("long").alias("n_subwords"),
        F.array_join(
            F.flatten(
                F.expr("transform(array_sort(collect_list(struct(pos, syms))), s -> s.syms)")
            ),
            " ",
        ).alias("subs_csv"),
    )


def bpe_decode_expr(col: str) -> str:
    """SQL decoding a space-joined BPE subword stream back to the
    normalized word stream (detokenization): symbols are alnum +
    '</w>' and never contain spaces, so dropping the joins and
    turning each end-of-word marker into a space is EXACTLY the
    greedy encoder's inverse — BPE merges never cross word
    boundaries, so the roundtrip is lossless by construction.
    Engine-portable (replace/trim only), map-side, zero shuffles."""
    return f"trim(replace(replace({col}, ' ', ''), '</w>', ' '))"
