"""Embedding similarity search: brute-force cosine top-k baseline and
an IVF-partitioned approximate path.

The embedding column is ``array<float>``; dot products are computed
as an exact left fold over doubles (``zip_with`` + ``aggregate``),
which is bit-identical to the DuckDB oracle's ``list_reduce`` fold —
so ranking never straddles a rounding boundary between engines.

Scale design:
- Brute force is a broadcast nested-loop of |queries| × |corpus| —
  correct baseline, only viable for small query sets. The query side
  is broadcast; the corpus never shuffles.
- IVF: a small centroid codebook is broadcast; every vector gets a
  cluster id in one map-side pass. Queries probe their top-P nearest
  clusters, so the search join is an equi-join on cluster id —
  shuffle on cluster, not a cross product. At 100 TB, write the
  corpus bucketed by cluster id so probes are partition-pruned scans.

Extends the reference's fuzzy best-match search
(`utils/categorization.ts:16-40`) to vector space per the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dot_expr(a: str, b: str) -> str:
    """SQL for an exact left-fold double dot product of two float arrays."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def cosine_neardup_pairs(emb: DataFrame, id_col: str, vec_col: str, threshold: float) -> DataFrame:
    """All pairs with cosine ≥ threshold (embeddings pre-normalized →
    cosine = dot). Brute-force; the LSH/IVF variants are the scale
    path — this is the exactness baseline the brief asks for.
    """
    a = emb.select(F.col(id_col).alias("id_lo"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_hi"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_lo") < F.col("id_hi"))
        .withColumn("sim", F.round(F.expr(dot_expr("va", "vb")), 4))
        .filter(F.col("sim") >= threshold)
        .select("id_lo", "id_hi", "sim")
    )


def brute_topk(
    emb: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (self excluded).

    ``queries`` is small → broadcast; ranking uses the raw double dot
    (bit-stable) with id tiebreak, output sim rounded to 6dp.
    """
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    c = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("qid") != F.col("nid"))
        .withColumn("dot", F.expr(dot_expr("qv", "nv")))
    )
    w = "(PARTITION BY qid ORDER BY dot DESC, nid ASC)"
    return (
        scored.withColumn("rank", F.expr(f"row_number() OVER {w}"))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", F.round("dot", 6).alias("sim"))
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Assign every vector to its nearest centroid (argmax dot).

    Centroid codebook is broadcast; assignment is map-side only —
    zero shuffle over the corpus.
    """
    c = centroids.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    scored = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v")).join(
        F.broadcast(c)
    ).withColumn("cdot", F.expr(dot_expr("v", "cv")))
    w = "(PARTITION BY vid ORDER BY cdot DESC, cid ASC)"
    return (
        scored.withColumn("r", F.expr(f"row_number() OVER {w}"))
        .filter(F.col("r") == 1)
        .select("vid", "v", "cid")
    )


def ivf_topk(
    emb: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_probe: int = 2,
) -> DataFrame:
    """IVF approximate top-k: probe the n_probe nearest clusters per
    query, brute-force only within probed clusters.

    The search join is (query_probe ⨝ assignment) on cluster id — an
    equi-join, broadcastable on the query side. Recall < 1 by design;
    the oracle replicates the same probe set, so parity is exact.
    """
    assign = ivf_assign(emb, centroids, id_col, vec_col)
    c = centroids.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    probes = (
        F.broadcast(q)
        .join(F.broadcast(c))
        .withColumn("cdot", F.expr(dot_expr("qv", "cv")))
        .withColumn(
            "pr", F.expr("row_number() OVER (PARTITION BY qid ORDER BY cdot DESC, cid ASC)")
        )
        .filter(F.col("pr") <= n_probe)
        .select("qid", "qv", "cid")
    )
    scored = (
        probes.join(assign, "cid")
        .filter(F.col("qid") != F.col("vid"))
        .withColumn("dot", F.expr(dot_expr("qv", "v")))
    )
    w = "(PARTITION BY qid ORDER BY dot DESC, vid ASC)"
    return (
        scored.withColumn("rank", F.expr(f"row_number() OVER {w}"))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", F.col("vid").alias("nid"), F.round("dot", 6).alias("sim"))
    )
