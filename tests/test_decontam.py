"""Edge-case units for textops/decontam.py and textops/pipeline.py
(the sf-data parity lives in test_oracle_parity: td9/ta5/tp1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omfietser_etl_spark.textops.decontam import (
    contamination_stats,
    ngram_repetition_stats,
)
from omfietser_etl_spark.textops.pipeline import prepare_corpus
from omfietser_etl_spark.textops.sampling import shuffle_order


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_contamination_disjoint_and_identical(spark):
    corpus = _docs(
        spark,
        [
            (1, "a", "alpha beta gamma delta epsilon zeta"),
            (2, "a", "one two three four five six seven"),
        ],
    )
    ev = _docs(spark, [(9, "e", "alpha beta gamma delta epsilon zeta")])
    out = {
        r.doc: r
        for r in contamination_stats(corpus, ev, "doc_id", "text").collect()
    }
    # doc 1 is the eval text verbatim: every shingle hits
    assert out[1].contam_bp == 10000 and out[1].is_contaminated == 1
    # doc 2 shares nothing
    assert out[2].n_hit == 0 and out[2].contam_bp == 0


def test_contamination_empty_eval_set(spark):
    corpus = _docs(spark, [(1, "a", "alpha beta gamma delta epsilon zeta")])
    ev = _docs(spark, []).filter(F.lit(False))
    out = contamination_stats(corpus, ev, "doc_id", "text").collect()
    assert out[0].n_hit == 0 and out[0].is_contaminated == 0


def test_repetition_extremes(spark):
    docs = _docs(
        spark,
        [
            (1, "a", "spam spam spam spam spam"),  # all 2-grams identical
            (2, "a", "a b c d e f"),  # no repeats
        ],
    )
    out = {r.doc: r for r in ngram_repetition_stats(docs, "doc_id", "text").collect()}
    assert out[1].dup_bp == 10000 and out[1].top_cnt == out[1].n_grams
    assert out[2].dup_bp == 0 and out[2].top_cnt == 1


def test_shuffle_order_is_dense_and_deterministic(spark):
    docs = _docs(
        spark, [(i, "a", "x") for i in range(40)]
    ).select(F.col("doc_id").alias("doc"))
    a = shuffle_order(docs, "doc", n_shards=4)
    b = shuffle_order(docs, "doc", n_shards=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # positions are dense 1..n within every shard
    per = a.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    for r in per.collect():
        assert r.mn == 1 and r.mx == r.n


def test_prepare_corpus_applies_every_screen(spark):
    long_pad = " ".join(f"w{i}" for i in range(20))
    leak = " ".join(f"q{i}" for i in range(20)) + " benchmark leak text body"
    corpus = _docs(
        spark,
        [
            (1, "a", long_pad + " unique body here"),  # survives
            (2, "a", long_pad + " unique body here"),  # exact dup of 1
            (3, "a", "too short"),                     # length screen
            (4, "a", "rep " * 40),                     # repetition screen
            (5, "a", leak),                            # contamination
        ],
    )
    ev = _docs(spark, [(9, "e", leak)])
    out = prepare_corpus(
        corpus, ev, min_tok=10, max_tok=60, contam_threshold_bp=2000, dup_bp_max=1500
    )
    rows = out.collect()
    assert [r.doc for r in rows] == [1]
    assert rows[0].split in ("train", "val", "test") and rows[0].pos == 1


def test_contamination_screen_in_streaming_foreachbatch(spark, tmp_path):
    """The decontamination screen runs unchanged inside a Structured
    Streaming foreachBatch: each micro-batch joins its shingles
    against the (static, broadcast) benchmark set and only clean docs
    reach the sink — the incremental-ingest shape of tp1's screen."""
    import json
    import os

    from pyspark.sql import types as T

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "clean")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing, exist_ok=True)

    leak = " ".join(f"q{i}" for i in range(12)) + " benchmark leak body"
    rows = [
        {"doc_id": 1, "source": "a", "text": "alpha beta gamma delta epsilon zeta eta"},
        {"doc_id": 2, "source": "a", "text": leak},
        {"doc_id": 3, "source": "a", "text": "one two three four five six seven"},
    ]
    with open(os.path.join(landing, "b1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    ev = _docs(spark, [(9, "e", leak)])

    def screen(batch, batch_id):
        stats = contamination_stats(batch, ev, "doc_id", "text")
        clean = (
            batch.join(
                stats.filter(F.col("is_contaminated") == 1).select(
                    F.col("doc").alias("doc_id")
                ),
                "doc_id",
                "left_anti",
            )
        )
        clean.write.mode("append").parquet(out)

    q = (
        spark.readStream.schema(schema)
        .json(landing)
        .writeStream.foreachBatch(screen)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    kept = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept == [1, 3]


def test_line_dedup_drops_boilerplate_keeps_order(spark):
    from omfietser_etl_spark.textops.decontam import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "HEADER\nalpha\nmiddle one\nFOOTER"),
            (2, "HEADER\nbeta\nFOOTER"),
            (3, "HEADER\ngamma\nFOOTER"),
            (4, "delta\nsolo doc"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc: r for r in line_dedup(docs, "doc_id", "text", 2).collect()}
    # HEADER/FOOTER appear 3x > 2 → dropped; unique lines keep order
    assert out[1].clean_text == "alpha\nmiddle one"
    assert out[1].n_kept == 2 and out[1].n_dropped == 2
    assert out[2].clean_text == "beta"
    assert out[4].clean_text == "delta\nsolo doc" and out[4].n_dropped == 0
    # a doc that is ALL boilerplate survives with empty text
    docs2 = docs.union(
        spark.createDataFrame([(5, "HEADER\nFOOTER")], "doc_id long, text string")
    )
    out2 = {r.doc: r for r in line_dedup(docs2, "doc_id", "text", 2).collect()}
    assert out2[5].clean_text == "" and out2[5].n_kept == 0


def test_fuzzy_contamination_pairs_exact_jaccard(spark):
    """Hand-checked bipartite Jaccard: an identical doc across the
    corpus/benchmark boundary scores 10000 bp; a half-overlapping one
    passes τ=1/2 with the exact floor-bp value; disjoint docs emit no
    row. Blocking is lossless (every emitted pair shares a shingle)."""
    from omfietser_etl_spark.textops.decontam import fuzzy_contamination_pairs

    text_a = "alpha beta gamma delta epsilon zeta"       # 4 shingles (n=3)
    # shares shingles 'alpha beta gamma'/'beta gamma delta' with text_a
    text_b = "alpha beta gamma delta other words here"
    corpus = spark.createDataFrame(
        [(1, text_a), (2, text_b), (3, "totally different content entirely now")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, text_a)], ["doc_id", "text"])

    out = {
        (r.doc, r.bench): (r.n_inter, r.jaccard_bp)
        for r in fuzzy_contamination_pairs(
            corpus, bench, "doc_id", "text", tau_num=1, tau_den=3
        ).collect()
    }
    # doc 1 ≡ bench 100: inter=4, union=4 → 10000 bp
    assert out[(1, 100)] == (4, 10000)
    # doc 2: 5 shingles, shares 2 with bench's 4 → J = 2/7 < 1/3? NO:
    # 3*2 >= 1*7 fails... compute: union = 5+4-2 = 7; τ=1/3 → 3*2=6 < 7
    assert (2, 100) not in out
    assert (3, 100) not in out

    # lower τ to 1/4: doc 2 passes with floor(20000/7) = 2857 bp
    out2 = {
        (r.doc, r.bench): r.jaccard_bp
        for r in fuzzy_contamination_pairs(
            corpus, bench, "doc_id", "text", tau_num=1, tau_den=4
        ).collect()
    }
    assert out2[(2, 100)] == 2857
    # hashed-key path produces the identical output
    out3 = {
        (r.doc, r.bench): r.jaccard_bp
        for r in fuzzy_contamination_pairs(
            corpus, bench, "doc_id", "text",
            tau_num=1, tau_den=4, hash_shingles=True,
        ).collect()
    }
    assert out3 == out2
