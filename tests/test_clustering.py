"""Lloyd k-means (textops/clustering.py) — the iterative half that the
td8 gate query can't check (centroid means are accumulation-order
dependent; any fixed point is a valid solution)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omfietser_etl_spark.session import load
from omfietser_etl_spark.textops.clustering import assign_clusters, lloyd_kmeans

from .conftest import SF_SMOKE

K = 4


def test_lloyd_inertia_monotone(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    assigned, inertia = lloyd_kmeans(emb, k=K, n_iter=4)
    # Lloyd never increases inertia: both the assignment step and the
    # mean-update step are coordinate descents on the same objective.
    assert len(inertia) == 4
    for prev, cur in zip(inertia, inertia[1:]):
        assert cur <= prev + 1e-9
    # Every vector assigned to exactly one of the k clusters.
    n = emb.count()
    assert assigned.count() == n
    cids = [r.cid for r in assigned.select("cid").distinct().collect()]
    assert set(cids) <= set(range(1, K + 1))
    assert assigned.groupBy("vec_id").count().filter(F.col("count") > 1).count() == 0


def test_assign_clusters_deterministic_tiebreak(spark):
    # Two identical centroids → every vector ties; the lower cid wins.
    emb = load(spark, SF_SMOKE, "embeddings").limit(50)
    one = emb.limit(1).select(F.col("embedding").alias("cv"))
    centroids = one.select(F.lit(1).alias("cid"), "cv").unionByName(
        one.select(F.lit(2).alias("cid"), "cv")
    )
    out = assign_clusters(emb, centroids, "vec_id", "embedding", "cid", "cv")
    assert out.select("cid").distinct().collect() == [
        __import__("pyspark").sql.Row(cid=1)
    ]


def test_semantic_dedup_is_subset_of_exact_pairs(spark):
    """SemDeDup recall property: every cluster-blocked pair is a true
    near-dup (precision 1 vs the exact all-pairs baseline at the same
    tau) — the blocking only ever LOSES cross-cluster pairs, never
    invents one."""
    from omfietser_etl_spark.textops.clustering import semantic_dedup_pairs
    from omfietser_etl_spark.textops.similarity import cosine_neardup_pairs

    tau = 0.45
    emb = load(spark, SF_SMOKE, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        (F.col("vec_id") + 1).cast("int").alias("cid"),
        F.col("embedding").alias("cv"),
    )
    blocked = {
        (r.vec_lo, r.vec_hi)
        for r in semantic_dedup_pairs(emb, centroids, tau).collect()
    }
    exact = {
        (r.id_lo, r.id_hi)
        for r in cosine_neardup_pairs(emb, "vec_id", "embedding", tau).collect()
    }
    assert blocked <= exact
    assert len(blocked) > 0

    # Multi-probe recovers cross-cluster pairs: recall is monotone in
    # probes, still never inventing a pair (precision stays 1).
    probed = {
        (r.vec_lo, r.vec_hi)
        for r in semantic_dedup_pairs(emb, centroids, tau, probes=3).collect()
    }
    assert blocked <= probed <= exact


def test_rh_lsh_pairs_subset_of_exact_with_reasonable_recall(spark):
    """Random-hyperplane LSH emits a SUBSET of the exact cosine pairs
    (verification kills every false positive); banding must keep
    recall non-trivial at the gate threshold, and near-identical
    vectors (sim ≥ 0.9) must always collide."""
    from omfietser_etl_spark.session import load
    from omfietser_etl_spark.textops.similarity import (
        cosine_neardup_pairs,
        rh_neardup_pairs,
    )

    from .conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings")
    tau = 0.45
    exact = {(r.id_lo, r.id_hi): r.sim
             for r in cosine_neardup_pairs(emb, "vec_id", "embedding", tau).collect()}
    # τ=0.45 sits below the noise floor for this dim BY DESIGN (the
    # recall assertion needs a pair-rich regime); assert the sub-noise
    # guard fires on the opt-down path rather than letting its
    # UserWarning leak into every full pytest run (round-10 verdict #5
    # — `pytest -W error::UserWarning` must stay viable).
    import pytest as _pytest

    with _pytest.warns(UserWarning, match="below the random-cosine noise floor"):
        lsh = {(r.id_lo, r.id_hi): r.sim
               for r in rh_neardup_pairs(emb, "vec_id", "embedding", tau, 64,
                                         on_subnoise="warn").collect()}
    assert set(lsh) <= set(exact)
    assert all(lsh[k] == exact[k] for k in lsh)  # same verified sims
    if exact:
        assert len(lsh) / len(exact) > 0.2
    high = {k for k, s in exact.items() if s >= 0.9}
    assert high <= set(lsh)


def test_noise_floor_guard_and_sizing_helpers(spark):
    """Round-5 stress findings, pinned as API: (a) sub-noise-floor
    thresholds raise by default (the output-goes-quadratic footgun),
    warn on explicit opt-down, pass above the floor; (b) rh_params_for
    reproduces the stress-proven 4×16 geometry at the 50k corpus and
    scales rows with log₂N; (c) semdedup_k_for scales k ∝ N and
    reproduces the gate codebook (k=8 at 500 vectors)."""
    import warnings

    import pytest

    from omfietser_etl_spark.session import load
    from omfietser_etl_spark.textops.clustering import (
        semantic_dedup_pairs,
        semdedup_k_for,
    )
    from omfietser_etl_spark.textops.similarity import (
        cosine_noise_floor,
        rh_neardup_pairs,
        rh_params_for,
    )

    from .conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings")
    floor = cosine_noise_floor(64)
    assert abs(floor - 0.75) < 1e-9

    with pytest.raises(ValueError, match="noise floor"):
        rh_neardup_pairs(emb, "vec_id", "embedding", 0.45, 64)
    centroids = emb.limit(1).select(
        F.lit(1).alias("cid"), F.col("embedding").alias("cv"))
    with pytest.raises(ValueError, match="noise floor"):
        semantic_dedup_pairs(emb, centroids, 0.45, dim=64)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rh_neardup_pairs(emb, "vec_id", "embedding", 0.45, 64,
                         on_subnoise="warn")
        assert any("noise floor" in str(x.message) for x in w)
    # above the floor: no warning, no raise (plan construction only)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rh_neardup_pairs(emb, "vec_id", "embedding", 0.80, 64)
        assert not w

    assert rh_params_for(50_000) == (4, 16)   # the stress-table geometry
    assert rh_params_for(500) == (4, 9)
    assert rh_params_for(10) == (4, 4)        # never below the gate floor
    assert rh_params_for(10**9) == (4, 30)    # rows tracks log2(N)

    assert semdedup_k_for(500) == 8           # the gate codebook (KMEANS_K)
    assert semdedup_k_for(5_000) == 79
    assert semdedup_k_for(50_000) == 782      # ceil(N/64): k grows ∝ N
    assert semdedup_k_for(6_400_000) == 100_000

    # round-6: IVF centroid sizing — C = N/mod ≈ √N (faiss nlist rule;
    # a fixed mod makes coarse assignment quadratic, measured 12.3×
    # time at 10× data in SCALING.md round-6)
    from omfietser_etl_spark.textops.similarity import ivf_centroid_mod_for

    assert ivf_centroid_mod_for(500) == 22    # C ≈ 23 at gate scale
    assert ivf_centroid_mod_for(50_000) == 223
    assert ivf_centroid_mod_for(10**9) == 31_622
    assert ivf_centroid_mod_for(0) == 1       # degenerate corpus safe


def test_cluster_prototypes_match_numpy(spark):
    """Prototype selection = per-cluster top-n by distance to the
    assigned centroid (assignment ties by cid, selection ties by id)
    — recomputed independently in numpy."""
    import numpy as np

    from omfietser_etl_spark.textops.clustering import cluster_prototypes

    K, N = 8, 3
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    cent = mat[ids < K]

    d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    asg = d2.argmin(axis=1)  # ties: argmin → lowest index ≡ lowest cid
    expect = {}
    for cid in range(K):
        members = [(float(d2[i, cid]), int(ids[i]))
                   for i in range(len(ids)) if asg[i] == cid]
        expect[cid + 1] = [v for _, v in sorted(members)[:N]]

    centroids = emb.filter(F.col("vec_id") < K).select(
        (F.col("vec_id") + 1).cast("int").alias("cid"),
        F.col("embedding").alias("cv"),
    )
    out = cluster_prototypes(emb, centroids, N, "vec_id", "embedding").collect()
    got = {}
    for r in sorted(out, key=lambda r: (r.cid, r.rank)):
        got.setdefault(r.cid, []).append(r.id)
    assert got == {c: v for c, v in expect.items() if v}


def test_kcenter_coreset_greedy_semantics(spark):
    """Farthest-point traversal on a hand-checked 1-D geometry: seed
    is min id; each pick maximizes distance to the chosen set; the
    radius sequence (dmin_q) is non-increasing."""
    from omfietser_etl_spark.textops.similarity import kcenter_coreset

    # positions on a line encoded as 2-dim vectors [x, 0]; scale is
    # per-vector so use x in {1.0 ...} with matched magnitudes:
    # quantized code = floor(x/|x| * 127) = 127 for all -> use a
    # second coordinate to differentiate instead.
    rows = [
        (1, [1.0, 0.0]),     # seed (min id), code [127, 0]
        (2, [1.0, 0.02]),    # near seed, code [127, 2]
        (3, [0.0, 1.0]),     # orthogonal, code [0, 127]
        (4, [-1.0, 0.0]),    # opposite, code [-127, 0]
    ]
    out = kcenter_coreset(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        "vec_id", "embedding", 4,
    ).collect()
    picks = [(r.ord, r.vec_id, r.dmin_q) for r in sorted(out, key=lambda r: r.ord)]
    # farthest from [127,0] is [-127,0] (d2=254^2=64516); then [0,127]
    # (min dist to {1,4} = 127^2+127^2=32258); near-dup 2 comes last
    assert [p[1] for p in picks] == [1, 4, 3, 2]
    assert picks[0][2] == 0
    assert picks[1][2] == 254 * 254
    assert picks[2][2] == 127 * 127 + 127 * 127
    dmins = [p[2] for p in picks[1:]]
    assert dmins == sorted(dmins, reverse=True)
