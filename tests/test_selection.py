"""DSIR importance selection: exact integer-log2 equivalence and
selection semantics."""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from omfietser_etl_spark.textops.selection import (
    DSIR_F,
    DSIR_Q,
    dsir_scores,
    dsir_select,
    ilog2_q,
)


def test_ilog2_matches_float_log2_within_quantum():
    for x in [1, 2, 3, 10, 999983, 2**40 + 7, 10**12]:
        approx = ilog2_q(x) / 2**DSIR_Q
        assert abs(approx - math.log2(x)) < 2e-6 + 1e-12 * x


def test_ilog2_python_duckdb_equivalence_property():
    """The oracle's unrolled SQL chain must equal the Python fold on
    arbitrary positive ints (the whole ts15 parity rests on this)."""
    from omfietser_etl_spark.catalog.textops import dk_ilog2_chain

    rng = random.Random(7)
    vals = sorted({1, 2, 3, 2**40, 10**13, *(rng.randint(1, 10**12) for _ in range(60))})
    lit = ", ".join(f"({v})" for v in vals)
    sql = (
        f"WITH vals(x) AS (VALUES {lit}), "
        + dk_ilog2_chain("vals", DSIR_Q, DSIR_F)
        + " SELECT x, il FROM il"
    )
    got = dict(duckdb.connect().execute(sql).fetchall())
    assert got == {v: ilog2_q(v) for v in vals}


def test_dsir_selects_target_like_docs(spark):
    """Docs sharing the target slice's vocabulary must outscore docs
    from a disjoint vocabulary, and the top-fraction flag is exact."""
    target_texts = [f"alpha beta gamma delta {i}" for i in range(5)]
    like_target = ["alpha beta gamma epsilon", "beta gamma delta zeta"]
    unlike = ["xylophone quokka zephyr", "quasar nebula pulsar meteor"]
    rows = (
        [(i, t, True) for i, t in enumerate(target_texts)]
        + [(100 + i, t, False) for i, t in enumerate(like_target)]
        + [(200 + i, t, False) for i, t in enumerate(unlike)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = {r.doc: r for r in dsir_select(docs, "doc_id", "text", "is_t").collect()}
    assert len(out) == 9
    # every target-vocabulary doc outscores every disjoint-vocab doc
    like_scores = [out[d].score_q for d in (100, 101)]
    unlike_scores = [out[d].score_q for d in (200, 201)]
    assert min(like_scores) > max(unlike_scores)
    # ceil(9/4) = 3 selected, ranks are a permutation
    assert sum(r.selected for r in out.values()) == 3
    assert sorted(r.rk for r in out.values()) == list(range(1, 10))


def _pool(spark, n=60):
    """A pool with heavy score ties (3 vocab classes) plus unique
    suffixes — exercises tie-handling across the cutoff."""
    rows = [
        (i,
         ["alpha beta gamma", "alpha zeta", "quokka zephyr xylo"][i % 3]
         + f" tail{i % 7}",
         i % 4 == 0)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")


def test_dsir_threshold_equals_exact_selection(spark):
    """The sketch-threshold path must select EXACTLY the same set as
    the exact-rank path (the boundary band is ranked exactly, so
    equality is by construction — this pins it), at several keep
    fractions including tie-heavy cutoffs."""
    from omfietser_etl_spark.textops.selection import dsir_select_threshold

    docs = _pool(spark)
    for num, den in [(1, 4), (1, 2), (2, 3), (1, 60)]:
        exact = dsir_select(docs, "doc_id", "text", "is_t", num, den)
        want = {r.doc for r in exact.collect() if r.selected}
        got_rows = dsir_select_threshold(
            docs, "doc_id", "text", "is_t", num, den
        ).collect()
        got = {r.doc for r in got_rows if r.selected}
        assert got == want, (num, den)
        assert len(got_rows) == 60  # every pool row classified
        assert sorted(r.doc for r in got_rows) == list(range(60))


def test_dsir_threshold_shortcuts_and_fallback(spark, monkeypatch):
    """frac >= 1 selects everything with no sketch job; frac 0 selects
    nothing; and deliberately-wrong brackets (sketch guarantee
    'violated') must trigger the exact-rank fallback, not a wrong
    answer."""
    from omfietser_etl_spark.textops import selection as sel

    docs = _pool(spark, 24)
    all_in = sel.dsir_select_threshold(docs, "doc_id", "text", "is_t", 1, 1)
    assert all(r.selected for r in all_in.collect())
    none_in = sel.dsir_select_threshold(docs, "doc_id", "text", "is_t", 0, 4)
    assert not any(r.selected for r in none_in.collect())

    exact = {r.doc for r in
             sel.dsir_select(docs, "doc_id", "text", "is_t").collect()
             if r.selected}
    # brackets above every score: a=0, band empty -> a+b < k -> fallback
    monkeypatch.setattr(
        sel, "_score_brackets", lambda *a, **k: (2**62, 2**62 + 1)
    )
    got = {r.doc for r in
           sel.dsir_select_threshold(docs, "doc_id", "text", "is_t").collect()
           if r.selected}
    assert got == exact


def test_distributed_rank_equals_global_window(spark):
    """distributed_rank == the naive single-partition row_number on
    arbitrary tie-heavy data, across partition counts (including
    n_parts > n_rows, which leaves some range partitions empty)."""
    from pyspark.sql import Window

    from omfietser_etl_spark.operators.rank import distributed_rank

    rows = [(i, (i * 7) % 5) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v long")
    order = [F.col("v").desc(), F.col("id").asc()]
    want = {
        r.id: r.rk
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    for n_parts in (1, 7, 32, 400):
        got = {
            r.id: r.rank
            for r in distributed_rank(
                df, order, n_parts=n_parts, scope=f"test.rank{n_parts}"
            ).collect()
        }
        assert got == want, n_parts


def test_dsir_scores_are_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"token{i % 3} shared words here", i % 2 == 0) for i in range(12)],
        "doc_id long, text string, is_t boolean",
    )
    a = sorted(map(tuple, dsir_scores(docs, "doc_id", "text", "is_t").collect()))
    b = sorted(map(tuple, dsir_scores(docs, "doc_id", "text", "is_t").collect()))
    assert a == b


def test_char_entropy_orders_degenerate_vs_natural(spark):
    """Entropy signal sanity: repeated-char docs score near zero,
    uniform-alphabet docs score near log2(alphabet), natural text in
    between; ent_q/(n*2^Q) is bits/char."""
    from omfietser_etl_spark.textops.analysis import char_entropy_stats

    docs = spark.createDataFrame(
        [
            (1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),              # degenerate
            (2, "the quick brown fox jumps over the lazy dog"),   # natural
            (3, "abcdefghijklmnopqrstuvwxyz012345"),              # uniform 32
        ],
        "doc_id long, text string",
    )
    out = {r.doc: r for r in char_entropy_stats(docs).collect()}
    bits = {d: out[d].ent_q / (out[d].n_chars * 2**DSIR_Q) for d in out}
    assert bits[1] == 0.0
    assert abs(bits[3] - 5.0) < 1e-4          # log2(32) exactly 5 bits
    assert 2.0 < bits[2] < 4.5                # natural English text
    assert bits[1] < bits[2] < bits[3]


def test_char_entropy_udf_matches_python_ilog2(spark):
    """The round-13 vectorized Arrow/numpy ent_q column must replay
    the exact-integer formula bit-for-bit: ent_q = n·ilog2_q(n) −
    Σ c·ilog2_q(c) over the normalized-text character histogram,
    with ilog2_q the Python reference twin (the DuckDB oracle's
    contract). Covers long runs (big c), full alphabet spread and
    1-char strings — the numpy kernel's edge shapes."""
    from collections import Counter

    from omfietser_etl_spark.textops.analysis import char_entropy_stats

    texts = [
        "a" * 5000,
        ("abcdefghijklmnopqrstuvwxyz0123456789 " * 97),
        "z",
        "a1 b2 c3 " * 321 + "qqqq",
        "the quick brown fox jumps over the lazy dog " * 13,
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc: (r.n_chars, r.ent_q) for r in char_entropy_stats(docs).collect()}

    def norm(t: str) -> str:
        import re

        return re.sub(" +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()

    for i, t in enumerate(texts):
        s = norm(t)
        n = len(s)
        want = n * ilog2_q(n) - sum(c * ilog2_q(c) for c in Counter(s).values())
        assert got[i] == (n, want), (i, got[i], (n, want))


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.integers(min_value=1, max_value=2**62 - 1))
    @settings(max_examples=200, deadline=None)
    def test_ilog2_monotone_and_bounded(x):
        """floor(2^Q log2 x) properties: monotone, exact on powers of
        two, within one quantum of the float log."""
        v = ilog2_q(x)
        assert ilog2_q(x + 1) >= v
        p = x.bit_length() - 1
        assert (p << DSIR_Q) <= v < ((p + 1) << DSIR_Q)
        if x & (x - 1) == 0:  # exact power of two
            assert v == p << DSIR_Q

    @given(st.lists(st.integers(min_value=1, max_value=10**14),
                    min_size=1, max_size=30, unique=True))
    @settings(max_examples=30, deadline=None)
    def test_ilog2_duckdb_equivalence_hypothesis(vals):
        from omfietser_etl_spark.catalog.textops import dk_ilog2_chain

        lit = ", ".join(f"({v})" for v in vals)
        sql = (f"WITH vals(x) AS (VALUES {lit}), "
               + dk_ilog2_chain("vals", DSIR_Q, DSIR_F)
               + " SELECT x, il FROM il")
        got = dict(duckdb.connect().execute(sql).fetchall())
        assert got == {v: ilog2_q(v) for v in vals}
except ImportError:  # pragma: no cover — hypothesis is baked in
    pass


def test_ilog2_spark_expr_equals_python(spark):
    """The engine-side ilog2_q_expr (HOF aggregate square-and-compare)
    must equal the Python fold on arbitrary positive ints — the per-row
    log primitive tv6's score rests on."""
    from omfietser_etl_spark.textops.selection import ilog2_q_expr

    rng = random.Random(11)
    vals = sorted(
        {1, 2, 3, 2**30 - 1, 2**30, 2**31, 2**40 + 7, 2**62 - 1,
         *(rng.randint(1, 2**62 - 1) for _ in range(120))}
    )
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {
        r.x: r.il
        for r in df.select("x", F.expr(ilog2_q_expr("x")).alias("il")).collect()
    }
    for v in vals:
        assert got[v] == ilog2_q(v), v


def test_perplexity_buckets_thirds_and_order(spark):
    """head gets the most fluent docs; bucket boundaries are exact
    integer thirds of the ranked order."""
    from omfietser_etl_spark.textops.selection import perplexity_buckets

    rows = []
    for i in range(6):  # fluent: repeated common prose bigrams
        rows.append((i, "the cat sat on the mat and the cat sat on the mat"))
    for i in range(6, 12):  # unique word salad: every bigram count 1
        rows.append((i, f"zq{i} xv{i} wk{i} jm{i} qb{i} tt{i} rr{i}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_buckets(df, "doc_id", "text").collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert {len(v) for v in by_bucket.values()} == {4}
    assert max(r.rk for r in by_bucket["head"]) == 4
    assert min(r.rk for r in by_bucket["tail"]) == 9
    # every head doc is at least as fluent as every tail doc
    assert min(r.fluency_bp for r in by_bucket["head"]) >= max(
        r.fluency_bp for r in by_bucket["tail"]
    )
