"""Distributed BPE training vs a pure-Python single-machine
reference: the merge sequences must be EXACTLY equal (same counts,
same deterministic tie-breaks)."""

from __future__ import annotations

import re
from collections import Counter

from omfietser_etl_spark.textops.bpe import (
    END_MARK,
    bpe_vocab,
    segment_word_reference,
    train_bpe,
)

CORPUS = [
    "low lower lowest low low",
    "new newer newest new new newer",
    "wide wider widest wide",
    "low new wide low new",
]


def _norm_words(texts: list[str]) -> Counter:
    words: Counter = Counter()
    for t in texts:
        for w in re.sub(r"[^a-z0-9 ]", " ", t.lower()).split():
            words[w] += 1
    return words


def _reference_bpe(texts: list[str], n_merges: int, min_count: int = 2):
    """Classic single-machine BPE (Sennrich et al. 2016) with the
    engine's tie-break: count desc, then (a, b) ascending."""
    hist = {w: (list(w) + [END_MARK], c) for w, c in _norm_words(texts).items()}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in hist.values():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        a, b = best[0]
        merges.append((a, b, rank))
        for w, (syms, c) in hist.items():
            out, carry = [], None
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
            hist[w] = (out, c)
    return merges


def test_train_bpe_matches_reference_exactly(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    got = train_bpe(docs, "text", n_merges=12)
    want = _reference_bpe(CORPUS, 12)
    assert got == want
    assert len(got) >= 5  # the toy corpus supports a real merge chain


def test_bpe_vocab_segments_consistently(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = train_bpe(docs, "text", n_merges=10)
    vocab = {r.term: r.id for r in bpe_vocab(docs, "text", n_merges=10).collect()}
    assert len(vocab) == len(set(vocab.values()))  # ids unique
    assert min(vocab.values()) == 1
    # every segment of every corpus word is in the induced vocab
    for w in _norm_words(CORPUS):
        for seg in segment_word_reference(w, merges):
            assert seg in vocab, (w, seg)
    # frequent stems actually merged into multi-char units
    assert any(len(t.replace(END_MARK, "")) >= 3 for t in vocab)


def test_artifact_matches_fit(spark):
    """The committed BPE_MERGES artifact (catalog/trainprep.py) must
    be EXACTLY what train_bpe derives from the sf0.001 corpus — the
    x9 pattern: the catalog query applies a fixed artifact, this test
    gates the fit."""
    from omfietser_etl_spark.catalog.trainprep import BPE_MERGES

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert train_bpe(docs, "text", n_merges=len(BPE_MERGES)) == BPE_MERGES


def test_segment_expr_matches_reference(spark):
    """The codegen replace-chain segmentation must equal the
    single-machine greedy encoder word-for-word — including the
    adversarial shapes (self-merges, cascading merges, merge-output
    prefixes of other merges)."""
    from pyspark.sql import functions as F

    from omfietser_etl_spark.catalog.trainprep import BPE_MERGES
    from omfietser_etl_spark.textops.bpe import segment_words_expr

    words = [
        "window", "order", "sort", "column", "scan", "aggregate",
        "value", "partition", "aaa", "aaaa", "er", "e", "x",
        "windowing", "parterre", "lulu", "colucolumn", "scans",
        "sscan", "partpart",
    ]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r.word: list(r.syms)
        for r in df.select(
            "word", F.expr(segment_words_expr("word", BPE_MERGES)).alias("syms")
        ).collect()
    }
    for w in words:
        assert got[w] == segment_word_reference(w, BPE_MERGES), w
        # lossless: concatenating the subwords reconstructs the word
        assert "".join(got[w]).replace(END_MARK, "") == w


def test_bpe_encode_stream_order_and_counts(spark):
    """bpe_encode's per-doc stream must concatenate the word
    segmentations in original word order, and the counters must be
    consistent with the csv."""
    from omfietser_etl_spark.catalog.trainprep import BPE_MERGES
    from omfietser_etl_spark.textops.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, "window sort window"), (2, "Sort, WINDOW!"), (3, "")],
        "doc_id long, text string",
    )
    out = {r.doc: r for r in bpe_encode(docs, BPE_MERGES).collect()}
    seg = lambda w: segment_word_reference(w, BPE_MERGES)  # noqa: E731
    want1 = seg("window") + seg("sort") + seg("window")
    assert out[1].subs_csv.split(" ") == want1
    assert out[1].n_words == 3 and out[1].n_subwords == len(want1)
    # normalization folds case/punct; empty doc yields no row
    assert out[2].subs_csv.split(" ") == seg("sort") + seg("window")
    assert 3 not in out


def test_decode_roundtrips_every_doc(spark):
    """bpe_decode_expr must losslessly invert bpe_encode for the whole
    smoke corpus (merges never cross word boundaries), and the tk2
    audit column must certify it."""
    from omfietser_etl_spark.catalog.trainprep import tk2_bpe_roundtrip

    out = tk2_bpe_roundtrip(spark, "/root/testdata/sf0.001").collect()
    assert out and all(r.roundtrip_ok == 1 for r in out)
