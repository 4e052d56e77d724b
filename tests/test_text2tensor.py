"""End-to-end text→tensor integration: raw documents → prepared
corpus (tp1) → vocabulary tokenization (ts6) → sharded training
export with manifest (sinks/export.py). Each stage is individually
gated/tested; this proves the composition a training-data user would
actually run, with token accounting consistent across the chain."""

from __future__ import annotations

from pyspark.sql import functions as F

from omfietser_etl_spark.catalog.textops import tv1_top_terms
from omfietser_etl_spark.catalog.trainprep import tp1_prepare_corpus
from omfietser_etl_spark.session import load
from omfietser_etl_spark.sinks.export import read_manifest, write_training_shards
from omfietser_etl_spark.textops.chunking import tokenize_to_ids

from .conftest import SF_SMOKE


def test_documents_to_training_shards(spark, tmp_path):
    survivors = tp1_prepare_corpus(spark, SF_SMOKE).select("doc", "n_tok")
    n_surv = survivors.count()
    assert n_surv > 0

    docs = load(spark, SF_SMOKE, "documents")
    kept = docs.join(survivors, docs.doc_id == survivors.doc).select(
        "doc_id", "text"
    )
    vocab = tv1_top_terms(spark, SF_SMOKE).select("term", F.col("rank").alias("id"))
    toks = tokenize_to_ids(kept, vocab)

    out = str(tmp_path / "shards")
    manifest = write_training_shards(
        toks, out, "doc", n_shards=4, token_count_col="n_tokens"
    )

    assert manifest == read_manifest(out)
    assert manifest["total_rows"] == n_surv
    # token accounting must be consistent end to end: the export
    # manifest's totals equal the tokenizer's, which equal the
    # prepared corpus's own n_tok (same whitespace tokenization)
    assert manifest["total_tokens"] == toks.agg(F.sum("n_tokens")).first()[0]
    assert manifest["total_tokens"] == survivors.agg(F.sum("n_tok")).first()[0]

    # the exported rows are loader-ready: ids in-order, no null payloads
    sample = spark.read.parquet(out).limit(50).collect()
    assert all(r.ids_csv is not None and r.n_tokens > 0 for r in sample)
