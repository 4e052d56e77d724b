"""BM25 retrieval (textops/retrieval.py): ranking semantics the
oracle's replay can't check by itself."""

from __future__ import annotations

import math

from omfietser_etl_spark.textops.retrieval import bm25_topk
from omfietser_etl_spark.textops.selection import DSIR_Q


def _score_map(df):
    return {r.doc: r for r in df.collect()}


def test_bm25_ranking_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark filler filler filler"),       # tf=3
            (2, "spark filler filler filler filler filler"),     # tf=1
            (3, "filler filler filler filler filler filler"),    # no hit
            (4, "spark spark filler filler filler filler"),      # tf=2
            (5, "vector filler filler filler filler filler"),    # rarer term
        ],
        "doc_id long, text string",
    )
    out = _score_map(bm25_topk(docs, "doc_id", "text", ["spark", "vector"]))
    # docs with no query term never appear
    assert 3 not in out
    # same dl: score monotone in tf
    assert out[1].score_q > out[4].score_q > out[2].score_q
    # rarer term (df=1 vs df=3) gets higher idf: tf=1 'vector' beats
    # tf=1 'spark' at identical dl
    assert out[5].score_q > out[2].score_q
    # ranks are 1..n, aligned with (score desc, doc asc)
    ranked = sorted(out.values(), key=lambda r: r.rank)
    assert [r.rank for r in ranked] == list(range(1, len(out) + 1))
    assert all(
        (a.score_q, -a.doc) >= (b.score_q, -b.doc)
        for a, b in zip(ranked, ranked[1:])
    )


def test_bm25_fixed_point_tracks_float_formula(spark):
    """The integer fixed-point score must approximate the float Lucene
    BM25 (k1=1.2, b=0.75) within quantization error — the exactness
    trick changes the arithmetic, not the function."""
    rows = [(i, ("spark " * (1 + i % 4)) + ("filler " * (3 + i % 5)))
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = _score_map(bm25_topk(docs, "doc_id", "text", ["spark"], top_k=30))

    texts = dict(rows)
    toks = {d: texts[d].split() for d in texts}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfd = sum(1 for t in toks.values() if "spark" in t)
    idf = math.log(1 + (n - dfd + 0.5) / (dfd + 0.5))
    for d, r in out.items():
        tf = toks[d].count("spark")
        dl = len(toks[d])
        want = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        got = (r.score_q / 1024) * math.log(2) / 2**DSIR_Q
        assert abs(got - want) / want < 0.01, (d, got, want)


def test_bm25_no_hits_returns_empty(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    out = bm25_topk(docs, "doc_id", "text", ["nonexistent"]).collect()
    assert out == []


def test_rrf_fusion_semantics(spark):
    """Hand-replay of the RRF formula on two tiny ranked lists:
    fused score = Σ floor(1e6/(60+rank)); docs in BOTH lists carry
    two contributions; ties break by doc id."""
    from omfietser_etl_spark.textops.retrieval import RRF_K, RRF_SCALE, rrf_fuse

    a = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc long, rank long")
    b = spark.createDataFrame(
        [(12, 1), (10, 2), (13, 3)], "doc long, rank long")
    out = {r.doc: (r.rrf_q, r.n_lists, r.rank)
           for r in rrf_fuse([a, b], top_k=10).collect()}

    def c(r):
        return RRF_SCALE // (RRF_K + r)

    expect = {10: c(1) + c(2), 11: c(2), 12: c(3) + c(1), 13: c(3)}
    assert {d: v[0] for d, v in out.items()} == expect
    assert out[10][1] == 2 and out[11][1] == 1
    # ranking: 10 (two strong ranks) > 12 > 11 == 13? no — 11 has
    # c(2)=16129 > 13's c(3)=15873; assert the full order
    order = [d for d, _ in sorted(expect.items(),
                                  key=lambda kv: (-kv[1], kv[0]))]
    got = [d for d, v in sorted(out.items(), key=lambda kv: kv[1][2])]
    assert got == order


def test_rrf_fusion_single_list_is_identity_order(spark):
    """Fusing one list must preserve its ranking exactly."""
    from omfietser_etl_spark.textops.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(5, 1), (9, 2), (2, 3), (7, 4)], "doc long, rank long")
    got = [r.doc for r in sorted(rrf_fuse([a], top_k=4).collect(),
                                 key=lambda r: r.rank)]
    assert got == [5, 9, 2, 7]


def test_query_likelihood_ranking_semantics(spark):
    """A doc dense in the query term outranks a diluted one; docs
    without any query term never rank; OOV query terms are dropped."""
    from omfietser_etl_spark.textops.retrieval import query_likelihood_topk

    df = spark.createDataFrame(
        [
            (1, "spark spark spark engine"),
            (2, "spark engine engine engine engine engine engine engine"),
            (3, "postgres tuning guide"),
        ],
        "doc_id long, text string",
    )
    out = query_likelihood_topk(
        df, "doc_id", "text", ["spark", "zzz_not_in_corpus"], top_k=10
    ).collect()
    assert [r.doc for r in out] == [1, 2]  # 3 matches nothing
    assert out[0].rank == 1 and out[1].rank == 2
    assert out[0].score_q > out[1].score_q


def test_query_likelihood_all_oov_returns_empty(spark):
    from omfietser_etl_spark.textops.retrieval import query_likelihood_topk

    df = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    out = query_likelihood_topk(df, "doc_id", "text", ["zzzz"], top_k=5)
    assert out.count() == 0
    assert out.columns == ["doc", "score_q", "rank"]


def test_ndcg_perfect_ranking_scores_10000_bp(spark):
    """A system that ranks exactly by relevance hits nDCG = 1 (10000
    bp); a worse ordering scores strictly less; grades outside the
    list contribute only to IDCG."""
    from omfietser_etl_spark.textops.retrieval import ndcg_eval

    rel = spark.createDataFrame(
        [(1, 3), (2, 2), (3, 1), (4, 0)], "doc long, rel long"
    )
    perfect = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc long, rank long"
    )
    reverse = spark.createDataFrame(
        [(3, 1), (2, 2), (1, 3)], "doc long, rank long"
    )
    out = {
        r.system: r
        for r in ndcg_eval(
            {"perfect": perfect, "reverse": reverse}, rel, top_k=3
        ).collect()
    }
    assert out["perfect"].ndcg_bp == 10000
    assert out["perfect"].dcg_q == out["perfect"].idcg_q
    assert out["reverse"].ndcg_bp < 10000


def test_mmr_diversity_beats_relevance(spark):
    """Query [1,.5,0]: v1=[1,0,0] (rel 1.0) is picked first; at step 2
    the near-duplicate v2=[.8,0,0] (rel .8 but sim .8 to v1 → mmr
    .56−.24=.32) LOSES to the orthogonal v3=[0,1,0] (rel .5, sim 0 →
    mmr .35) — the pure-relevance top-2 would be (v1, v2). Steps are
    1-based, k caps at the pool size."""
    from omfietser_etl_spark.textops.similarity import mmr_diversify

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.8, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(99, [1.0, 0.5, 0.0])], "vec_id long, embedding array<float>"
    )
    out = mmr_diversify(emb, q, "vec_id", "embedding", k=2, pool=10)
    rows = [(r.step, r.nid, r.mmr) for r in out.collect()]
    assert rows == [(1, 1, 0.7), (2, 3, 0.35)]

    full = mmr_diversify(emb, q, "vec_id", "embedding", k=10, pool=10)
    assert [r.nid for r in full.collect()] == [1, 3, 2]
