"""Product-quantization ANN: PQ encoding + asymmetric-distance (ADC)
top-k search — the memory-bound 100 TB retrieval path.

Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011): split the d-dim space into M orthogonal
subspaces, quantize each slice against a per-subspace codebook of
``ksub`` centroids, and represent every corpus vector by M small
integer codes (here 4 codes ≈ 4 bytes vs 64 floats = 256 bytes, a
64× memory cut). Search never touches the original vectors: per
query, a LUT of M×ksub partial squared distances is precomputed once
(query slice vs every centroid slice), and a vector's approximate
distance is the sum of M LUT lookups selected by its codes.

Scale shape (the reason PQ is THE billion-vector path — IVF-PQ in
faiss):
- the codebook is M×ksub rows — broadcast everywhere, trained once;
- encoding is one pass over the corpus: broadcast-join the codebook,
  map-side partial-min per (vector, subspace), ONE shuffle of N
  rows of M-byte codes (the full-precision vectors are dropped
  before any exchange);
- search is a broadcast of |Q| flat LUT arrays (|Q|·M·ksub int64s)
  cross-joined map-side against the code table — the corpus codes
  NEVER shuffle; per-query top-k is the same rank-window shape as
  td6/td7. Distances are int64 micro-units (floor(d²·1e6)), so the
  M-way sum is order-free — exactly replayable by the DuckDB oracle
  (the same engine-portable left-fold double d² both engines compute
  bit-identically, quantized BEFORE any reordering sum).

Complements td6 (exact brute force, O(N·d) per query) and td7 (IVF,
prunes candidates but scans full vectors): ADC scans ALL N codes per
query but reads M bytes instead of d floats. At 100 TB the corpus is
stored as the code table (parquet, N×(id + M bytes)); the
full-precision table is only consulted for an optional exact re-rank
of the top candidates.

Extends the reference's similarity search surface
(`utils/categorization.ts:16-40`) per the brief; no reference
equivalent of PQ exists (its fuzzy search is string-space).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import l2_expr

#: Fixed-point scale for LUT partial distances. floor() not round():
#: floor semantics are identical in Spark and DuckDB (round differs
#: in half-way tie direction between engines in general).
PQ_SCALE = 1_000_000


def pq_codebook(
    emb: DataFrame, id_col: str, vec_col: str, dim: int, m_sub: int, ksub: int
) -> DataFrame:
    """Deterministic per-subspace codebook: the ``ksub`` lowest-id
    vectors' slices (Lloyd init, exactly td8's convention — a real
    deployment would refine with per-subspace k-means, which changes
    the codebook values but not one line of the encode/search plans).

    Output: (m, cid, cs) — m ∈ [0, m_sub), cid ∈ [0, ksub),
    cs = array<float> of length dim/m_sub. m_sub×ksub rows (bounded
    by construction — same contract as the k-means codebook).
    """
    sub = dim // m_sub
    ms = F.explode(F.sequence(F.lit(0), F.lit(m_sub - 1))).alias("m")
    return (
        emb.filter(F.col(id_col) < ksub)
        .select(F.col(id_col).cast("int").alias("cid"), F.col(vec_col).alias("_v"))
        .select("cid", ms, F.col("_v"))
        .select("m", "cid", F.expr(f"slice(_v, m * {sub} + 1, {sub})").alias("cs"))
    )


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m_sub: int,
) -> DataFrame:
    """Encode every vector as M codes: (vid, codes array<int>).

    Broadcast codebook × corpus → per-(vector, subspace) argmin of the
    exact left-fold slice d² (ties broken by centroid id, the struct
    min ≡ the oracle's ORDER BY d2, cid). The min is conditional per
    subspace so partial aggregation collapses each vector to ONE row
    before the only shuffle — N rows × M ints; the float vectors are
    projected away before the exchange.
    """
    sub = dim // m_sub
    e = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("_v"))
    j = (
        e.join(F.broadcast(codebook))
        .withColumn("_es", F.expr(f"slice(_v, m * {sub} + 1, {sub})"))
        .withColumn("_d2", F.expr(l2_expr("_es", "cs")))
        .select("vid", "m", "cid", "_d2")
    )
    mins = [
        F.min(F.when(F.col("m") == m, F.struct("_d2", "cid"))).alias(f"_s{m}")
        for m in range(m_sub)
    ]
    codes = F.array(*[F.col(f"_s{m}.cid") for m in range(m_sub)])
    return j.groupBy("vid").agg(*mins).select("vid", codes.alias("codes"))


def pq_lut(
    queries: DataFrame,
    codebook: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m_sub: int,
    ksub: int,
) -> DataFrame:
    """Per-query flat ADC lookup table: (qid, lut array<long>) with
    lut[m·ksub + c] = floor(d²(query slice m, centroid c of m)·1e6).

    |Q|×m_sub×ksub partial distances, assembled into one array per
    query so the scoring scan does pure element_at arithmetic.
    """
    sub = dim // m_sub
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("_qv"))
    flat = (
        q.join(F.broadcast(codebook))
        .withColumn("_qs", F.expr(f"slice(_qv, m * {sub} + 1, {sub})"))
        .withColumn(
            "pd2_q",
            F.floor(F.expr(l2_expr("_qs", "cs")) * PQ_SCALE).cast("long"),
        )
        .select("qid", (F.col("m") * ksub + F.col("cid")).alias("i"), "pd2_q")
    )
    return (
        flat.groupBy("qid")
        .agg(F.array_sort(F.collect_list(F.struct("i", "pd2_q"))).alias("_xs"))
        .select("qid", F.expr("transform(_xs, x -> x.pd2_q)").alias("lut"))
    )


def pq_adc_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    dim: int,
    m_sub: int = 4,
    ksub: int = 16,
) -> DataFrame:
    """ADC top-k: (qid, rank, nid, d2adc_q) — the k nearest corpus
    vectors per query under the PQ-approximated squared distance
    (int64 micro-units; self excluded; ties broken by neighbor id).

    Plan: codes (one N-row shuffle, computed once) × broadcast LUT
    cross join, score = Σₘ lut[m·ksub + codeₘ] as a fixed chain of
    integer element_at adds — map-side over the code table; the only
    per-query shuffle is the same qid rank window td6/td7 use.
    """
    codebook = pq_codebook(emb, id_col, vec_col, dim, m_sub, ksub)
    codes = pq_encode(emb, codebook, id_col, vec_col, dim, m_sub)
    lut = pq_lut(queries, codebook, id_col, vec_col, dim, m_sub, ksub)
    score = None
    for m in range(m_sub):
        term = F.element_at(
            F.col("lut"), F.element_at(F.col("codes"), m + 1) + m * ksub + 1
        )
        score = term if score is None else score + term
    scored = (
        codes.join(F.broadcast(lut), F.col("vid") != F.col("qid"))
        .withColumn("d2adc_q", score.cast("long"))
        .select("qid", F.col("vid").alias("nid"), "d2adc_q")
    )
    w = "(PARTITION BY qid ORDER BY d2adc_q ASC, nid ASC)"
    return (
        scored.withColumn("rank", F.expr(f"row_number() OVER {w}").cast("int"))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "d2adc_q")
    )


def pq_rerank_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    rerank: int,
    dim: int,
    m_sub: int = 4,
    ksub: int = 16,
) -> DataFrame:
    """Two-stage retrieval: ADC shortlist of ``rerank`` candidates
    per query (td20's M-byte-code path), then EXACT full-precision
    re-rank of the shortlist by dot product — faiss's
    ``IndexRefineFlat`` composition, the standard billion-scale
    serving shape: the compressed index prunes N → |Q|·rerank, and
    only those rows' full vectors are consulted.

    Output: (qid, rank, nid, sim) — td6's exact schema, so recall
    against the brute-force baseline is directly measurable.

    Plan: shortlist = :func:`pq_adc_topk` (corpus codes never
    shuffle); fetch = the bounded |Q|·rerank shortlist BROADCAST
    against the full-precision table — a map-side semi-join over the
    corpus scan, zero corpus exchange (at 100 TB this is the "read
    ~k·|Q| rows from cold storage by id" step; Spark expresses it as
    a broadcast join the scan's row-group pruning can exploit) —
    then the same per-qid rank window as td6, over |Q|·rerank rows.
    """
    from .similarity import dot_expr

    shortlist = pq_adc_topk(
        emb, queries, id_col, vec_col, rerank, dim, m_sub, ksub
    ).select("qid", "nid")
    v = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    scored = (
        v.join(F.broadcast(shortlist), "nid")
        .join(F.broadcast(q), "qid")
        .withColumn("dot", F.expr(dot_expr("qv", "nv")))
    )
    w = "(PARTITION BY qid ORDER BY dot DESC, nid ASC)"
    return (
        scored.withColumn("rank", F.expr(f"row_number() OVER {w}").cast("int"))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", F.round("dot", 6).alias("sim"))
    )


def ivfpq_index(
    emb: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m_sub: int,
) -> DataFrame:
    """The IVF-PQ index table: (vid, cid, codes) — every vector's
    coarse cluster id AND its PQ codes, built in ONE pass / ONE
    shuffle: the coarse assignment (map-side broadcast argmax over
    the centroid codebook, `similarity.ivf_assign`) rides the
    encode's groupBy as a min aggregate, since every joined row of a
    vector carries the same cid.

    This is the parquet layout a 100 TB deployment stores, BUCKETED
    BY cid: N×(id + int + M bytes); the full-precision vectors stay
    in cold storage for optional exact re-rank. Codes are quantized
    against the GLOBAL subspace codebook (faiss IndexIVFPQ with
    by_residual=false — the residual variant changes the codebook
    training target, not one line of these plans).
    """
    from .similarity import ivf_assign

    sub = dim // m_sub
    cb = codebook.select("m", F.col("cid").alias("pqc"), "cs")
    a = ivf_assign(emb, centroids, id_col, vec_col)  # (vid, v, cid) map-side
    j = (
        a.join(F.broadcast(cb))
        .withColumn("_es", F.expr(f"slice(v, m * {sub} + 1, {sub})"))
        .withColumn("_d2", F.expr(l2_expr("_es", "cs")))
        .select("vid", "cid", "m", "pqc", "_d2")
    )
    mins = [
        F.min(F.when(F.col("m") == m, F.struct("_d2", "pqc"))).alias(f"_s{m}")
        for m in range(m_sub)
    ]
    codes = F.array(*[F.col(f"_s{m}.pqc") for m in range(m_sub)])
    return (
        j.groupBy("vid")
        .agg(F.min("cid").alias("cid"), *mins)
        .select("vid", "cid", codes.alias("codes"))
    )


def ivfpq_topk(
    emb: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    dim: int,
    m_sub: int = 4,
    ksub: int = 16,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-PQ top-k: (qid, rank, nid, d2adc_q) — faiss's deployment
    shape, composing the two gated paths: the IVF probe prunes the
    scan to the n_probe nearest coarse clusters per query (td7's
    argmax-dot probe, broadcast both sides), and within probed
    clusters scoring reads M-byte PQ codes through the query's LUT
    instead of full vectors (td20's order-free int64 ADC sum).

    Plan: index build = one corpus shuffle (codes, see ivfpq_index);
    search = probes (bounded |Q|·n_probe rows, broadcast) ⨝ index on
    cid — an equi-join that at scale becomes a partition-pruned scan
    of the cid-bucketed code table — then the same qid rank window as
    td6/td7/td20. No corpus-side exchange beyond the index build.
    """
    from .similarity import dot_expr

    codebook = pq_codebook(emb, id_col, vec_col, dim, m_sub, ksub)
    index = ivfpq_index(emb, centroids, codebook, id_col, vec_col, dim, m_sub)
    lut = pq_lut(queries, codebook, id_col, vec_col, dim, m_sub, ksub)

    c = centroids.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    probes = (
        F.broadcast(q)
        .join(F.broadcast(c))
        .withColumn("cdot", F.expr(dot_expr("qv", "cv")))
        .withColumn(
            "pr",
            F.expr("row_number() OVER (PARTITION BY qid ORDER BY cdot DESC, cid ASC)"),
        )
        .filter(F.col("pr") <= n_probe)
        .select("qid", "cid")
    )

    score = None
    for m in range(m_sub):
        term = F.element_at(
            F.col("lut"), F.element_at(F.col("codes"), m + 1) + m * ksub + 1
        )
        score = term if score is None else score + term
    scored = (
        index.join(F.broadcast(probes), "cid")
        .filter(F.col("vid") != F.col("qid"))
        .join(F.broadcast(lut), "qid")
        .withColumn("d2adc_q", score.cast("long"))
        .select("qid", F.col("vid").alias("nid"), "d2adc_q")
    )
    w = "(PARTITION BY qid ORDER BY d2adc_q ASC, nid ASC)"
    return (
        scored.withColumn("rank", F.expr(f"row_number() OVER {w}").cast("int"))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "d2adc_q")
    )
