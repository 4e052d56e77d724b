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
    lsh = {(r.id_lo, r.id_hi): r.sim
           for r in rh_neardup_pairs(emb, "vec_id", "embedding", tau, 64).collect()}
    assert set(lsh) <= set(exact)
    assert all(lsh[k] == exact[k] for k in lsh)  # same verified sims
    if exact:
        assert len(lsh) / len(exact) > 0.2
    high = {k for k, s in exact.items() if s >= 0.9}
    assert high <= set(lsh)
