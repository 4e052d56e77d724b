"""Count-min sketch properties: never-undercount, mergeability,
bounded cell count (textops/sketch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omfietser_etl_spark.session import load
from omfietser_etl_spark.textops.analysis import tokens
from omfietser_etl_spark.textops.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_build,
    cms_estimate,
    cms_merge,
)

from .conftest import SF_SMOKE


def _terms(spark):
    docs = load(spark, SF_SMOKE, "documents")
    return docs.select("doc_id", F.explode(tokens("text")).alias("term"))


def test_cms_never_undercounts_any_term(spark):
    terms = _terms(spark).select("term")
    sketch = cms_build(terms)
    exact = terms.groupBy("term").agg(F.count("*").alias("tf"))
    est = cms_estimate(sketch, exact.select("term"))
    joined = exact.join(est, "term")
    assert joined.filter(F.col("est_tf") < F.col("tf")).count() == 0
    # sketch is genuinely bounded: at most d*w cells
    assert sketch.count() <= CMS_DEPTH * CMS_WIDTH
    # total mass per row equals the stream length
    n = terms.count()
    per_row = sketch.groupBy("row").agg(F.sum("cnt").alias("mass")).collect()
    assert {r.row for r in per_row} == set(range(CMS_DEPTH))
    assert all(r.mass == n for r in per_row)


def test_cms_merge_of_halves_equals_full_build(spark):
    """Cell-wise merge is exact: sketch(A) + sketch(B) == sketch(A∪B)
    — the property that makes per-batch sketches roll up in a
    streaming state store."""
    terms = _terms(spark)
    a = terms.filter(F.col("doc_id") % 2 == 0).select("term")
    b = terms.filter(F.col("doc_id") % 2 == 1).select("term")
    merged = cms_merge(cms_build(a), cms_build(b))
    full = cms_build(terms.select("term"))
    diff = merged.join(full, ["row", "col"], "full").filter(
        (merged["cnt"].isNull())
        | (full["cnt"].isNull())
        | (merged["cnt"] != full["cnt"])
    )
    assert diff.count() == 0


def test_cms_estimate_of_absent_term_is_nonnegative_noise(spark):
    terms = _terms(spark).select("term")
    sketch = cms_build(terms)
    probe = spark.createDataFrame([("zzqqxyzzy_not_in_corpus",)], ["term"])
    est = cms_estimate(sketch, probe).collect()
    assert len(est) == 1 and est[0].est_tf >= 0


def test_cms_streaming_merge_matches_batch(spark, tmp_path):
    """The sketch as a streaming-state citizen: documents arrive in
    micro-batches (maxFilesPerTrigger=1), each batch's sketch merges
    into the persisted state via foreachBatch, and the final state is
    cell-identical to sketching the whole corpus in one batch — the
    property that lets a 100 TB stream keep heavy-hitter counts
    without ever re-shuffling history."""
    import os

    from pyspark.sql import functions as F

    from omfietser_etl_spark.session import load
    from omfietser_etl_spark.textops.analysis import tokens

    from .conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs")
    docs.repartition(4).write.parquet(src)

    state_dir = str(tmp_path / "sketch_state")

    def handle(batch, epoch_id):
        terms = batch.select(F.explode(tokens("text")).alias("term"))
        sk = cms_build(terms)
        if os.path.exists(state_dir):
            sk = cms_merge(spark.read.parquet(state_dir), sk)
        # the sketch is ≤ d·w rows by construction — pin it in memory
        # before overwriting the path it was read from
        rows = sk.collect()
        spark.createDataFrame(rows, sk.schema).write.mode("overwrite").parquet(state_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    merged = {(r.row, r.col): r.cnt for r in spark.read.parquet(state_dir).collect()}
    full = {
        (r.row, r.col): r.cnt
        for r in cms_build(
            docs.select(F.explode(tokens("text")).alias("term"))
        ).collect()
    }
    assert merged == full


def test_bloom_no_false_negatives_and_merge_is_or(spark):
    """Every inserted key must test present (false negatives are
    impossible by construction); merging two filters equals building
    one over the union; probing is deterministic."""
    from omfietser_etl_spark.textops.sketch import (
        bloom_build,
        bloom_hits,
        bloom_merge,
    )

    terms = _terms(spark).select("term").distinct()
    a = terms.filter(F.length("term") % 2 == 0)
    b = terms.filter(F.length("term") % 2 == 1)
    bloom_a = bloom_build(a, "term")

    probed = bloom_hits(terms, "term", bloom_a)
    # no false negatives: every a-key present
    assert probed.join(a, "term", "semi").filter(~F.col("might_contain")).count() == 0

    merged = {r.pos for r in bloom_merge(bloom_a, bloom_build(b, "term")).collect()}
    full = {r.pos for r in bloom_build(terms, "term").collect()}
    assert merged == full


def test_bloom_decontam_superset_of_exact(spark):
    """The bloom path may over-flag (false positives) but never
    under-flags: per doc, td18's hit count ≥ td9's exact hit count,
    and every exactly-contaminated doc stays flagged."""
    from omfietser_etl_spark.catalog.textops import (
        td18_bloom_decontam,
        td9_contamination,
    )

    from .conftest import SF_SMOKE

    exact = {r.doc: r for r in td9_contamination(spark, SF_SMOKE).collect()}
    bloom = {r.doc: r for r in td18_bloom_decontam(spark, SF_SMOKE).collect()}
    assert set(exact) == set(bloom)
    for doc, e in exact.items():
        assert bloom[doc].n_hit >= e.n_hit
        if e.is_contaminated:
            assert bloom[doc].flagged


def test_bloom_hits_keeps_null_keys_as_false(spark):
    """NULL keys must not vanish from bloom_hits output: they carry
    might_contain=false (NULL sets no bits, so it is definitionally
    absent) — round-4 advisor finding."""
    from omfietser_etl_spark.textops.sketch import bloom_build, bloom_hits

    keys = spark.createDataFrame([("a",), ("b",)], "k string")
    bloom = bloom_build(keys, "k")
    probe = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "zz")], "id long, k string"
    )
    rows = {r.id: r.might_contain for r in bloom_hits(probe, "k", bloom).collect()}
    assert rows[1] is True          # member: always a hit
    assert rows[2] is False         # NULL key kept, reported absent
    assert 3 in rows                # non-member kept (hit or FP-noise)
    assert len(rows) == 3


def test_bloom_m_sizing_helper():
    """bloom_m_for sizes m = n·k/ln2 rounded up to a power of two (the
    ~(1/2)^k FPR operating point), and the committed gate literal is
    the helper's output at its certified key budget — the
    ivf_centroid_mod_for discipline applied to the Bloom geometry
    (round-8 constant sweep)."""
    import math

    from omfietser_etl_spark.textops.sketch import BLOOM_K, BLOOM_M, bloom_m_for

    assert bloom_m_for(22_700) == BLOOM_M  # gate literal certified
    for n in (1, 100, 10_000, 1_000_000):
        m = bloom_m_for(n)
        assert m & (m - 1) == 0  # power of two
        assert m >= n * BLOOM_K / math.log(2.0)  # at or past the operating point
        assert m < 2 * math.ceil(max(1, n * BLOOM_K / math.log(2.0)))  # tight
    assert bloom_m_for(10_000, k=8) == 2 * bloom_m_for(10_000, k=4)


def test_hll_branches_and_mergeability(spark):
    """hll_distinct exercises BOTH estimate branches (linear counting
    for small groups, raw harmonic mean for large) within the 3-sigma
    bound, and the register frame is mergeable: max-merging the
    registers of two disjoint halves equals the registers of the
    union (the CMS/bloom merge contract)."""
    from pyspark.sql import functions as F

    from omfietser_etl_spark.textops.sketch import (
        HLL_M,
        hll_distinct,
        hll_rows,
    )

    rows = [("small", i % 60) for i in range(600)] + [
        ("big", i) for i in range(20000)
    ]
    df = spark.createDataFrame(rows, ["g", "k"])
    out = {r.g: r for r in hll_distinct(df, "g", "k").collect()}
    assert out["small"].within_3sigma and out["big"].within_3sigma
    # small must have empty registers (LC branch), big must not
    n_reg = {
        r.g: r.n for r in
        hll_rows(df, "g", "k").groupBy("g", "bkt").count()
        .groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert n_reg["small"] < HLL_M and n_reg["big"] == HLL_M

    # mergeability: registers(half1) max-merge registers(half2)
    # == registers(union)
    h1 = spark.createDataFrame(rows[::2], ["g", "k"])
    h2 = spark.createDataFrame(rows[1::2], ["g", "k"])

    def regs(d):
        return {
            (r.g, r.bkt): r.mj
            for r in hll_rows(d, "g", "k")
            .groupBy("g", "bkt").agg(F.max("rho").alias("mj")).collect()
        }

    r1, r2, ru = regs(h1), regs(h2), regs(df)
    merged = dict(r1)
    for k, v in r2.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == ru
