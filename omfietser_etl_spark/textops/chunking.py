"""Training-data text preparation: token-window document chunking
and PII scrubbing — the steps between raw documents and model input
that every large-scale pipeline needs (brief §training-data ops;
beyond the reference's surface).

Both are pure Catalyst expressions (sequence/transform/explode for
chunking, RE2-compatible regexes for scrubbing) — whole-stage
codegen, zero Python in the hot path, shuffle-free (explode is a
map-side Generate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analysis import tokens

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16

# RE2-safe patterns (valid & identical semantics in Java regex and
# DuckDB's RE2): email, international-ish phone runs, IPv4.
EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RX = r"\+[0-9][0-9 -]{7,}[0-9]"
IPV4_RX = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Split each document into overlapping token windows.

    Window starts advance by ``chunk_tokens - overlap``;
    ``n_chunks = ceil(max(n_tok - overlap, 1) / step)`` so every token
    lands in ≥1 chunk, the final partial window is kept, and an
    empty/short doc still yields exactly one chunk. One Generate
    (explode) per row — no shuffle; at 100 TB this runs entirely
    map-side and the chunk fan-out (~n_tok/step per doc) is the
    output's inherent size.
    """
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    t = tokens(text_col)
    starts = (
        f"sequence(0, (CAST(ceil(greatest(size(_t) - {overlap}, 1) / {step}.0) AS INT) - 1) "
        f"* {step}, {step})"
    )
    return (
        docs.select(F.col(id_col).alias("doc"), t.alias("_t"))
        .select("doc", F.expr(f"explode({starts})").alias("chunk_start"), "_t")
        .select(
            "doc",
            (F.col("chunk_start") / step).cast("long").alias("chunk_id"),
            F.expr(f"slice(_t, chunk_start + 1, {chunk_tokens})").alias("_chunk"),
        )
        .select(
            "doc",
            "chunk_id",
            F.size("_chunk").alias("n_chunk_tokens"),
            F.array_join("_chunk", " ").alias("chunk_text"),
        )
    )


def scrub_expr(col: Column | str) -> Column:
    """Redact emails → <EMAIL>, phones → <PHONE>, IPv4 → <IP>."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, EMAIL_RX, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RX, "<PHONE>")
    return F.regexp_replace(out, IPV4_RX, "<IP>")


def scrub_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII-scrub the text column and count what was redacted."""
    c = F.col(text_col)
    # F.lit patterns sidestep SQL string-literal backslash escaping
    return docs.select(
        F.col(id_col).alias("doc"),
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RX), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_RX), 0)).alias("n_phones"),
        F.size(F.regexp_extract_all(c, F.lit(IPV4_RX), 0)).alias("n_ips"),
        scrub_expr(c).alias("scrubbed_text"),
    )


def tokenize_to_ids(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Map each document's token stream to integer ids through a
    vocabulary table — the text→tensor step between chunking and
    sequence packing. ``vocab`` is (term, id) with ids ≥ 1;
    out-of-vocabulary tokens map to 0 (the UNK convention).

    Scale shape: the vocabulary is model-sized (10k-100k rows) →
    BROADCAST; tokenization is then a map-side explode + broadcast
    join + one doc-keyed ordered reassembly. The corpus shuffles once
    (on doc for the reassembly — or zero times if the caller keeps
    the exploded (doc, pos, id) form, which is what a real export
    writes).

    Returns (doc, n_tokens, n_oov, ids_csv) with ids in original
    token order (CSV-encoded for engine-portable gate hashing).
    """
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    )
    mapped = toks.join(F.broadcast(vocab), "term", "left").select(
        "doc", "pos", F.coalesce(F.col("id"), F.lit(0)).alias("tid")
    )
    return mapped.groupBy("doc").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("tid") == 0, 1).otherwise(0)).alias("n_oov"),
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, tid))), "
                "s -> CAST(s.tid AS STRING))"
            ),
            ",",
        ).alias("ids_csv"),
    )
