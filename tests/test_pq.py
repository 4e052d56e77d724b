"""Product-quantization ADC search (textops/pq.py): properties the
oracle's bit-replay can't check by itself — code validity, the
LUT/score decomposition against a numpy recomputation, and that the
approximation actually ranks near neighbors first."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from omfietser_etl_spark.textops.pq import (
    PQ_SCALE,
    pq_adc_topk,
    pq_codebook,
    pq_encode,
    pq_lut,
)

SF = "/root/testdata/sf0.001"
DIM, M, KSUB, K, QB = 64, 4, 16, 5, 10


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _mat(df):
    rows = df.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def test_codes_shape_and_range(spark):
    emb = _emb(spark)
    cb = pq_codebook(emb, "vec_id", "embedding", DIM, M, KSUB)
    assert cb.count() == M * KSUB
    codes = pq_encode(emb, cb, "vec_id", "embedding", DIM, M).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r.codes) == M
        assert all(0 <= c < KSUB for c in r.codes)


def test_encode_and_score_match_numpy(spark):
    """Codes = per-subspace argmin vs the 16 lowest-id vectors' slices;
    ADC score = Σ floor(1e6·d²(q_slice, centroid[code]_slice)) — both
    recomputed independently in numpy (float64, matching the fold)."""
    emb = _emb(spark)
    ids, mat = _mat(emb)
    cent = mat[ids < KSUB]  # lowest-id rows, already id-sorted
    sub = DIM // M

    def np_codes(v):
        return [
            int(np.argmin([((v[m * sub:(m + 1) * sub] - c[m * sub:(m + 1) * sub]) ** 2).sum()
                           for c in cent]))
            for m in range(M)
        ]

    cb = pq_codebook(emb, "vec_id", "embedding", DIM, M, KSUB)
    got = {r.vid: list(r.codes)
           for r in pq_encode(emb, cb, "vec_id", "embedding", DIM, M).collect()}
    for i, vid in enumerate(ids):
        assert got[vid] == np_codes(mat[i]), vid

    out = pq_adc_topk(emb, emb.filter(F.col("vec_id") < QB),
                      "vec_id", "embedding", K, DIM, M, KSUB).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)
    for qid, rows in by_q.items():
        q = mat[ids == qid][0]
        lut = np.array(
            [[math.floor(((q[m * sub:(m + 1) * sub] - c[m * sub:(m + 1) * sub]) ** 2).sum()
                         * PQ_SCALE) for c in cent] for m in range(M)],
            dtype=np.int64,
        )
        scores = {
            int(v): int(sum(lut[m][c] for m, c in enumerate(np_codes(mat[i]))))
            for i, v in enumerate(ids) if v != qid
        }
        expect = sorted(scores.items(), key=lambda kv: (kv[1], kv[0]))[:K]
        assert [(r.nid, r.d2adc_q) for r in sorted(rows, key=lambda r: r.rank)] \
            == expect, qid


def test_adc_ranks_near_neighbors_first(spark):
    """ADC is approximate (an untrained 4×16 codebook is deliberately
    coarse), but it must rank REAL neighbors, not noise: its top-K
    overlap with the exact top-K must sit far above the chance level
    (K/N ≈ 0.01 here), and the true cosine of its picks must beat the
    corpus-average pair similarity by a wide margin."""
    from omfietser_etl_spark.textops.similarity import brute_topk

    emb = _emb(spark)
    n = emb.count()
    ids, mat = _mat(emb)
    q = emb.filter(F.col("vec_id") < QB)
    exact = brute_topk(emb, q, "vec_id", "embedding", K).collect()
    adc = pq_adc_topk(emb, q, "vec_id", "embedding", K, DIM, M, KSUB).collect()
    ex, ap = {}, {}
    for r in exact:
        ex.setdefault(r.qid, set()).add(r.nid)
    for r in adc:
        ap.setdefault(r.qid, set()).add(r.nid)
    hits = sum(len(ex[q_] & ap[q_]) for q_ in ex)
    recall = hits / (len(ex) * K)
    chance = K / (n - 1)
    assert recall >= max(0.15, 10 * chance), \
        f"ADC recall@{K} at chance level: {recall:.2f}"

    # true-similarity lift: mean cosine of ADC picks vs corpus mean
    idx = {int(v): i for i, v in enumerate(ids)}
    picks = [float(mat[idx[r.qid]] @ mat[idx[r.nid]]) for r in adc]
    rng = np.random.default_rng(0)
    rand = [float(mat[i] @ mat[j])
            for i, j in rng.integers(0, n, size=(500, 2)) if i != j]
    assert np.mean(picks) > np.mean(rand) + 2 * np.std(rand) / math.sqrt(len(rand))


def test_deterministic(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < QB)
    a = sorted(map(tuple, pq_adc_topk(emb, q, "vec_id", "embedding",
                                      K, DIM, M, KSUB).collect()))
    b = sorted(map(tuple, pq_adc_topk(emb, q, "vec_id", "embedding",
                                      K, DIM, M, KSUB).collect()))
    assert a == b


def test_ivfpq_equals_adc_restricted_to_probes(spark):
    """td21 must be EXACTLY td20's ADC scoring restricted to the
    IVF-probed clusters: recompute coarse assignment (argmax dot,
    ties by cid), the top-P probe set per query, and the ADC scores
    in numpy, and require the full (nid, score) ranking to match."""
    from omfietser_etl_spark.textops.pq import ivfpq_topk

    P = 2
    MOD = 25  # gate centroid rule: vec_id % 25 == 0
    emb = _emb(spark)
    ids, mat = _mat(emb)
    sub = DIM // M
    cent = mat[ids < KSUB]
    coarse_ids = ids[ids % MOD == 0]
    coarse = mat[ids % MOD == 0]

    def np_codes(v):
        return [
            int(np.argmin([((v[m * sub:(m + 1) * sub] - c[m * sub:(m + 1) * sub]) ** 2).sum()
                           for c in cent]))
            for m in range(M)
        ]

    # coarse assignment: argmax dot, ties by centroid id ascending
    dots = mat @ coarse.T
    asg = {int(v): int(coarse_ids[np.lexsort((coarse_ids, -dots[i]))[0]])
           for i, v in enumerate(ids)}

    out = ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") % MOD == 0),
        emb.filter(F.col("vec_id") < QB),
        "vec_id", "embedding", K, DIM, M, KSUB, P,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)

    for qid in range(QB):
        q = mat[ids == qid][0]
        qd = coarse @ q
        probe_set = set(int(c) for c in
                        coarse_ids[np.lexsort((coarse_ids, -qd))[:P]])
        lut = np.array(
            [[math.floor(((q[m * sub:(m + 1) * sub] - c[m * sub:(m + 1) * sub]) ** 2).sum()
                         * PQ_SCALE) for c in cent] for m in range(M)],
            dtype=np.int64,
        )
        scores = {
            int(v): int(sum(lut[m][c] for m, c in enumerate(np_codes(mat[i]))))
            for i, v in enumerate(ids)
            if v != qid and asg[int(v)] in probe_set
        }
        expect = sorted(scores.items(), key=lambda kv: (kv[1], kv[0]))[:K]
        got = [(r.nid, r.d2adc_q) for r in sorted(by_q.get(qid, []),
                                                  key=lambda r: r.rank)]
        assert got == expect, qid


def test_rerank_equals_exact_dot_over_adc_shortlist(spark):
    """td22 must be EXACTLY: take the ADC top-R shortlist (ties by
    (score, nid) — td20's order), score those candidates with the
    same left-fold float64 dot product td6 uses, re-rank. Recompute
    both stages in plain Python/numpy and require the full
    (nid, sim) ranking to match."""
    from omfietser_etl_spark.textops.pq import pq_rerank_topk

    R = 3 * K
    emb = _emb(spark)
    ids, mat = _mat(emb)
    cent = mat[ids < KSUB]
    sub = DIM // M

    def np_codes(v):
        return [
            int(np.argmin([((v[m * sub:(m + 1) * sub] - c[m * sub:(m + 1) * sub]) ** 2).sum()
                           for c in cent]))
            for m in range(M)
        ]

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    out = pq_rerank_topk(
        emb, emb.filter(F.col("vec_id") < QB),
        "vec_id", "embedding", K, R, DIM, M, KSUB,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)

    all_codes = [np_codes(mat[i]) for i in range(len(ids))]
    for qid in range(QB):
        q = mat[ids == qid][0]
        lut = np.array(
            [[math.floor(((q[m * sub:(m + 1) * sub] - c[m * sub:(m + 1) * sub]) ** 2).sum()
                         * PQ_SCALE) for c in cent] for m in range(M)],
            dtype=np.int64,
        )
        adc = {
            int(v): int(sum(lut[m][c] for m, c in enumerate(all_codes[i])))
            for i, v in enumerate(ids) if v != qid
        }
        shortlist = [nid for nid, _ in
                     sorted(adc.items(), key=lambda kv: (kv[1], kv[0]))[:R]]
        rer = sorted(
            ((nid, fold_dot(q, mat[ids == nid][0])) for nid in shortlist),
            key=lambda kv: (-kv[1], kv[0]),
        )[:K]
        expect = [(nid, round(dot, 6)) for nid, dot in rer]
        got = [(r.nid, r.sim) for r in sorted(by_q.get(qid, []),
                                              key=lambda r: r.rank)]
        assert got == expect, qid
