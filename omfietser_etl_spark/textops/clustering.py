"""K-means clustering on DataFrames (no MLlib dependency).

Pairs with `textops/similarity.py`'s IVF search: the codebook there
is any centroid set; this module LEARNS one with Lloyd iterations —
the standard corpus-organization / IVF-training step of an embedding
pipeline. Like `dedup.connected_components`, it shows the iterative-
algorithm shape on Spark: per-iteration work is ONE broadcast-joined
map pass (assignment) plus ONE shuffle (centroid means); only the
k×dim codebook — dimension-sized by construction — ever reaches the
driver, exactly like IVF's broadcast codebook.

Distances are exact left-fold double L2 (`zip_with` + `aggregate`),
bit-identical to the DuckDB oracle's indexed fold, so assignment
parity is gate-checkable (td8). Centroid MEANS are float sums whose
value depends on accumulation order — fine inside the iteration
(any fixed point is a valid k-means solution), which is why the
oracle checks the deterministic assignment step, not the means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import dot_expr  # noqa: F401  (re-export for callers)


def l2_expr(a: str, b: str) -> str:
    """SQL for an exact left-fold squared-L2 distance of two float
    arrays (same fold shape as dot_expr — engine-portable)."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def assign_clusters(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
    cvec_col: str = "cv",
    keep_vec: bool = True,
) -> DataFrame:
    """Nearest-centroid assignment by squared L2, deterministic
    tiebreak on centroid id. Broadcast codebook → map-side pass; the
    argmin is a groupBy min over a (d2, cid, …) struct — lexicographic
    struct ordering ≡ ORDER BY d2 ASC, cid ASC, and partial (map-side)
    aggregation collapses each vector's C candidate rows BEFORE the
    exchange, so the only shuffle is N one-row groups. (The previous
    row_number window shuffled and sorted the full N×C joined frame —
    at corpus scale that exchange dwarfs the assignment itself.)

    ``keep_vec=False`` returns only (id, cid, _d2): callers that
    discard the vector (td8/ts17 — assignment IS the output) should
    pass it so the min struct carries no array field — the exchange
    sheds ~98% of its bytes and the aggregate hash-buffers instead of
    sort-aggregating. NULL vectors are dropped up front (a NULL d2
    would otherwise win every struct-min); NaN components are out of
    contract corpus-wide (they poison every cosine/L2 fold the same
    way — td5/td6 included)."""
    e = emb.filter(F.col(vec_col).isNotNull())
    c = centroids.filter(F.col(cvec_col).isNotNull())
    others = [x for x in emb.columns if x not in (id_col, vec_col)]
    payload = (
        [F.col(vec_col).alias("_v")]
        + [F.col(x).alias(f"_o_{x}") for x in others]
        if keep_vec
        else []
    )
    best = F.min(F.struct(F.col("_d2"), F.col(cid_col), *payload)).alias("_best")
    picked = (
        e.crossJoin(F.broadcast(c))
        .withColumn("_d2", F.expr(l2_expr(vec_col, cvec_col)))
        .groupBy(id_col)
        .agg(best)
    )
    out_payload = (
        [F.col("_best._v").alias(vec_col)]
        + [F.col(f"_best._o_{x}").alias(x) for x in others]
        if keep_vec
        else []
    )
    return picked.select(
        id_col,
        *out_payload,
        F.col(f"_best.{cid_col}").alias(cid_col),
        F.col("_best._d2").alias("_d2"),
    )


def assign_clusters_multiprobe(
    emb: DataFrame,
    centroids: DataFrame,
    probes: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
    cvec_col: str = "cv",
) -> DataFrame:
    """Top-``probes`` nearest-centroid assignment (one row per
    (vector, probe)): the multi-probe generalization of
    assign_clusters — same broadcast codebook map pass, the window
    keeps ranks 1..p instead of 1.

    SCALE CAVEAT: exact top-p has no partial-aggregation form in
    declarative Spark (a bounded top-k merge buffer isn't expressible
    without a custom JVM aggregate), so this window exchanges the
    full N×C joined frame — the shape assign_clusters (p=1) was
    measured 17× faster without (SCALING.md round-6). Not on any
    certified catalog path; at corpus scale prefer probes=1, or run
    the argmin pass per centroid shard if multi-probe recall is
    required."""
    w = Window.partitionBy(id_col).orderBy("_d2", cid_col)
    return (
        emb.crossJoin(F.broadcast(centroids))
        .withColumn("_d2", F.expr(l2_expr(vec_col, cvec_col)))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= probes)
        .drop("_r", cvec_col)
    )


#: default per-cluster size target for :func:`semdedup_k_for` — the
#: gate corpus (500 vectors, k=8) certifies this regime; within-cluster
#: pair cost stays ~target²/2 per cluster at any corpus size.
SEMDEDUP_TARGET_CLUSTER = 64


def semdedup_k_for(
    n_hint: int, target_cluster_size: int = SEMDEDUP_TARGET_CLUSTER
) -> int:
    """Codebook size for a corpus of ~``n_hint`` vectors: within-
    cluster pair cost is Σcᵢ² ≈ N²/k, so k MUST grow ∝ N to hold
    per-cluster cost constant (the SemDeDup paper's regime; the
    round-5 10× stress measured 75×–102× wall growth with a fixed
    codebook). k = ceil(n / target_cluster_size)."""
    return max(1, -(-max(1, int(n_hint)) // int(target_cluster_size)))


def semantic_dedup_pairs(
    emb: DataFrame,
    centroids: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 1,
    dim: int | None = None,
    on_subnoise: str = "raise",
) -> DataFrame:
    """SemDeDup-shaped semantic near-duplicate pairs (Abbas et al.
    2023, "SemDeDup: Data-efficient learning at web-scale through
    semantic deduplication" — public): assign every embedding to its
    nearest centroid (broadcast codebook, map-side pass), then emit
    cosine-≥-tau pairs ONLY within a cluster.

    Scale shape: the cluster id is the blocking key — the one shuffle
    is cid-keyed, and the quadratic term is bounded by the largest
    cluster, never the corpus (vs td5's exact all-pairs baseline).
    SIZE k TO THE CORPUS: within-cluster pair cost is Σ cᵢ² ≈ N²/k,
    so k must grow ∝ N to hold per-cluster size (and cost-per-vector)
    constant — the 10× stress run with a FIXED codebook measured 75×
    wall growth (SCALING.md round-5). The SemDeDup paper's regime is
    exactly this: k chosen for a target cluster size, not a constant.
    Also keep ``tau`` above the random-cosine noise floor (≳6/√dim),
    or the OUTPUT itself grows quadratically regardless of k.
    Cross-cluster near-dups are the accepted recall loss; tighten it
    by raising k (smaller clusters) or ``probes`` > 1 (each vector
    joins its top-p clusters — near-boundary pairs meet in a shared
    probe cluster; duplicate meetings collapse via min-cid + distinct
    before the dot product, so each surviving pair is scored once).
    Embeddings are pre-normalized → cosine is the exact dot fold,
    bit-identical to the DuckDB oracle.
    """
    if dim is not None:
        from .similarity import check_noise_floor

        check_noise_floor(tau, dim, on_subnoise, "semantic_dedup_pairs")
    if probes <= 1:
        asg = assign_clusters(emb, centroids, id_col, vec_col)
    else:
        asg = assign_clusters_multiprobe(emb, centroids, probes, id_col, vec_col)
    a = asg.select(F.col(id_col).alias("vec_lo"), "cid")
    b = asg.select(F.col(id_col).alias("vec_hi"), "cid")
    met = (
        a.join(b, "cid")
        .filter(F.col("vec_lo") < F.col("vec_hi"))
        .groupBy("vec_lo", "vec_hi")
        .agg(F.min("cid").alias("cid"))
    )
    va = emb.select(F.col(id_col).alias("vec_lo"), F.col(vec_col).alias("_va"))
    vb = emb.select(F.col(id_col).alias("vec_hi"), F.col(vec_col).alias("_vb"))
    return (
        met.join(va, "vec_lo")
        .join(vb, "vec_hi")
        .withColumn("sim", F.round(F.expr(dot_expr("_va", "_vb")), 4))
        .filter(F.col("sim") >= tau)
        .select("vec_lo", "vec_hi", "cid", "sim")
    )


def lloyd_kmeans(
    emb: DataFrame,
    k: int,
    n_iter: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[float]]:
    """Lloyd's algorithm: returns (assignments, per-iteration inertia).

    Init is deterministic (the k lowest-id vectors — swap in k-means++
    sampling at will; determinism beats seed-quality for reproducible
    pipelines). Each iteration: broadcast-assign, then recompute
    centroid means via posexplode → (cid, pos) average → rebuilt
    arrays. The (k × dim)-sized codebook is collected per iteration —
    the same dimension-sized driver traffic the IVF broadcast already
    implies; fact vectors never leave executors.
    """
    spark = emb.sparkSession
    emb = emb.select(id_col, vec_col).persist()
    centroids = (
        emb.orderBy(id_col)
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("cid"),
            F.col(vec_col).alias("cv"),
        )
    )
    inertia: list[float] = []
    assigned = None
    for _ in range(n_iter):
        assigned = assign_clusters(emb, centroids, id_col, vec_col, "cid", "cv")
        it = assigned.agg(F.sum("_d2")).first()[0]
        inertia.append(float(it))
        means = (
            assigned.select("cid", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "cid",
                F.expr("transform(pm, s -> CAST(s.m AS FLOAT))").alias("cv"),
            )
        )
        centroids = F.broadcast(spark.createDataFrame(means.collect(), means.schema))
    return assigned.drop("_d2"), inertia


def cluster_prototypes(
    emb: DataFrame,
    centroids: DataFrame,
    n_per_cluster: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
    cvec_col: str = "cv",
) -> DataFrame:
    """Cluster-balanced prototype selection: the ``n_per_cluster``
    vectors CLOSEST to their assigned centroid, per cluster — the
    diversity-preserving curation counterpart of SemDeDup's
    within-cluster pruning. An equal per-semantic-cluster quota keeps
    tail topics represented where a corpus-wide global top-n would be
    dominated by the head cluster (the standard coreset/
    prototype-sampling move in embedding-space data curation).

    Output: (cid, rank, id, d2) — rank 1 = the cluster's medoid-most
    member; d2 rounded to 6dp (ranking uses the raw double fold, ties
    by id — td8's exact-fold discipline, bit-replayable by DuckDB).

    Plan shape: assignment is the td8 map-side broadcast pass (corpus
    never shuffles to find its centroid); selection is ONE window
    PARTITIONED BY cid — parallel across the k clusters, never a
    global sort; output is ≤ k·n rows.
    """
    a = assign_clusters(
        emb, centroids, id_col, vec_col, cid_col, cvec_col, keep_vec=False
    )
    w = Window.partitionBy(cid_col).orderBy("_d2", id_col)
    return (
        a.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= n_per_cluster)
        .select(
            cid_col,
            "rank",
            F.col(id_col).alias("id"),
            F.round("_d2", 6).alias("d2"),
        )
    )
