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

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dot_expr(a: str, b: str) -> str:
    """SQL for an exact left-fold double dot product of two float arrays."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def cosine_neardup_pairs_sql(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """All pairs with cosine ≥ threshold via pure SQL lambdas — the
    semantic reference for :func:`cosine_neardup_pairs` (identical
    output, ~50× slower: interpreted per-element higher-order
    functions over |N|²/2 pairs)."""
    a = emb.select(F.col(id_col).alias("id_lo"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_hi"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_lo") < F.col("id_hi"))
        .withColumn("sim", F.round(F.expr(dot_expr("va", "vb")), 4))
        .filter(F.col("sim") >= threshold)
        .select("id_lo", "id_hi", "sim")
    )


def cosine_neardup_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    block_rows: int = 4096,
    n_hint: int | None = None,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embeddings pre-normalized →
    cosine = dot). Exact baseline; LSH/IVF are the recall<1 scale path.

    Execution — fully executor-side block-pair join (no vector ever
    transits the driver): each vector gets a block id (``id mod B``)
    and is shuffled to every block-pair group (p, q) it participates
    in, tagged with the side it plays; ``applyInPandas`` over the
    B(B+1)/2 groups computes one ≤block×block sim matrix per task.
    Replication factor is B ≈ N/block_rows — the shuffle is O(N·B)
    rows while the compute is O(N²·d) flops, so the shuffle is never
    the bottleneck of an exact all-pairs pass. B is floored for
    parallelism so small corpora still fan out across the cluster.

    Bit-parity with the SQL/DuckDB fold: the dot is accumulated with a
    dimension-major loop (``acc += A[:,k]*B[:,k]``), which performs the
    same double additions in the same order as the sequential left fold
    — numpy's pairwise/BLAS summation would not. The 4dp rounding and
    the threshold compare stay Spark-side on the raw double.

    ``n_hint`` is the (approximate) corpus row count used to size the
    blocking so no task's sim matrix exceeds block_rows². Pass it when
    known (a count the caller already has, table stats); when omitted
    the block count falls back to the parallelism floor alone — no
    extra count() job, i.e. no full extra pass over the embedding
    table — which fans out correctly but lets per-task matrices grow
    past block_rows on corpora much larger than ~block_rows·√(4·par)
    rows. Output pairs are identical for ANY block count; only task
    granularity changes.
    """
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    src = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    par = spark.sparkContext.defaultParallelism
    # B(B+1)/2 tasks ≥ ~2×cores, and (given n) blocks never exceed
    # block_rows (bounds both the replication factor and each task's
    # sim matrix).
    b_par = max(1, int((4 * par) ** 0.5))
    n_blocks = max(1, b_par) if n_hint is None else max(
        1, -(-n_hint // block_rows), b_par
    )
    # Pre-round guard: keep any raw dot that could still round up past
    # the threshold (round-half-up at 4dp moves a value < 5.0001e-5).
    guard = threshold - 1e-4

    tagged = src.withColumn("blk", F.pmod(F.col("_id"), F.lit(n_blocks)).cast("int"))
    # Row with block i plays side 'a' in pairs (i, j≥i) and side 'b'
    # in pairs (j<i, i); the diagonal pair is emitted once (side 'a').
    pairs = F.expr(
        f"transform(sequence(0, {n_blocks - 1}), j -> CASE WHEN j >= blk "
        "THEN struct(blk AS pl, CAST(j AS INT) AS ph, 'a' AS side) "
        "ELSE struct(CAST(j AS INT) AS pl, blk AS ph, 'b' AS side) END)"
    )
    exploded = (
        tagged.select("_id", "_v", F.explode(pairs).alias("p"))
        .select("_id", "_v", F.col("p.pl").alias("pl"), F.col("p.ph").alias("ph"),
                F.col("p.side").alias("side"))
    )

    def pair_block(key, pdf):
        if pdf.empty:
            return pd.DataFrame(
                {
                    "id_lo": pd.Series([], dtype="int64"),
                    "id_hi": pd.Series([], dtype="int64"),
                    "dot": pd.Series([], dtype="float64"),
                }
            )
        diagonal = key[0] == key[1]
        a = pdf[pdf["side"] == "a"]
        b = a if diagonal else pdf[pdf["side"] == "b"]
        if a.empty or b.empty:
            return pd.DataFrame(
                {
                    "id_lo": pd.Series([], dtype="int64"),
                    "id_hi": pd.Series([], dtype="int64"),
                    "dot": pd.Series([], dtype="float64"),
                }
            )
        ids_b = b["_id"].to_numpy(np.int64)
        mat_b = np.stack(b["_v"].to_numpy()).astype(np.float64)
        dim = mat_b.shape[1]
        out_lo, out_hi, out_dot = [], [], []
        ids_all = a["_id"].to_numpy(np.int64)
        mat_all = np.stack(a["_v"].to_numpy()).astype(np.float64)
        for lo in range(0, len(ids_all), 1024):
            a_ids = ids_all[lo : lo + 1024]
            a_mat = mat_all[lo : lo + 1024]
            sims = np.zeros((len(a_ids), len(ids_b)))
            for k in range(dim):  # fold-order accumulation
                sims += np.outer(a_mat[:, k], mat_b[:, k])
            keep = sims >= guard
            if diagonal:
                keep &= a_ids[:, None] < ids_b[None, :]
            ii, jj = np.nonzero(keep)
            if len(ii):
                # off-diagonal blocks are disjoint, but a-side ids are
                # not globally below b-side ids — order per pair.
                out_lo.append(np.minimum(a_ids[ii], ids_b[jj]))
                out_hi.append(np.maximum(a_ids[ii], ids_b[jj]))
                out_dot.append(sims[ii, jj])
        if not out_lo:
            return pd.DataFrame(
                {
                    "id_lo": pd.Series([], dtype="int64"),
                    "id_hi": pd.Series([], dtype="int64"),
                    "dot": pd.Series([], dtype="float64"),
                }
            )
        return pd.DataFrame(
            {
                "id_lo": np.concatenate(out_lo),
                "id_hi": np.concatenate(out_hi),
                "dot": np.concatenate(out_dot),
            }
        )

    out = exploded.groupBy("pl", "ph").applyInPandas(
        pair_block, "id_lo long, id_hi long, dot double"
    )
    return (
        out.withColumn("sim", F.round("dot", 4))
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
    """Assign every vector to its nearest centroid (argmax dot,
    ties → lowest centroid id).

    Round 13 (guide §4.2): the old shape joined the broadcast
    codebook and evaluated the interpreted left-fold ``dot_expr`` per
    (vector, centroid) pair — N·C·dim interpreted lambda steps (td21's
    profile: 1.76 s of its 2.9 s at sf0.1 was this assignment). Now
    the bounded centroid matrix (the ivf_centroid_mod_for √N-sizing
    contract — the k-means-codebook collect precedent) ships BY VALUE
    in a ``mapInPandas`` closure (workers need no repo imports) and
    each Arrow batch scores via dimension-major accumulation —
    ``sims += outer(A[:,k], C[:,k])`` from zeros, the SAME
    double-addition order as the sequential SQL left fold (the
    bipartite_cosine_pairs discipline), so every dot is bit-identical
    to ``dot_expr`` and the argmax (numpy first-max == lowest cid on
    ties, centroids ordered cid-ascending) replays the oracle's
    ORDER BY cdot DESC, cid ASC exactly. Still map-side only — zero
    shuffle over the corpus; the float32 vectors round-trip Arrow
    losslessly.
    """
    import numpy as np
    import pandas as pd

    src = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    )
    id_dt = emb.schema[id_col].dataType.simpleString()
    vec_dt = emb.schema[vec_col].dataType.simpleString()
    rows = (
        centroids.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .collect()
    )
    if not rows:
        return src.limit(0).withColumn("cid", F.lit(None).cast(id_dt))
    rows.sort(key=lambda r: r.cid)
    ids_c = np.array([r.cid for r in rows], dtype=np.int64)
    mat_c = np.array([list(r.cv) for r in rows], dtype=np.float64)

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            a = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            sims = np.zeros((len(a), len(ids_c)))
            for k in range(mat_c.shape[1]):  # fold-order accumulation
                sims += np.outer(a[:, k], mat_c[:, k])
            best = sims.argmax(axis=1)  # first max == lowest cid on ties
            yield pd.DataFrame(
                {"vid": pdf["vid"], "v": pdf["v"], "cid": ids_c[best]}
            )

    return src.mapInPandas(kernel, f"vid {id_dt}, v {vec_dt}, cid {id_dt}")


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


def quantize_int8(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage-prep step
    for ANN at corpus scale (4× smaller vectors, SIMD-friendly int
    dot products; the IVF path above reads either representation).

    Per vector: scale = max|x|, q_i = floor(x_i / scale * 127),
    clipped by construction to [-127, 127]. Pure elementwise IEEE
    double arithmetic in codegen — no shuffle at all, and floor() of
    identically-computed doubles is deterministic across engines
    (unlike round-half of sums, there is no accumulation-order
    hazard). The scale is emitted as floor(scale·1e6) and the vector
    as a CSV string, keeping the gate hash engine-portable (pandas
    renders array cells differently per engine).

    All-zero vectors get scale 0 and an all-zero code.
    """
    v = vec_col
    maxabs = f"array_max(transform({v}, x -> abs(CAST(x AS DOUBLE))))"
    q = (
        f"CASE WHEN {maxabs} = 0.0D THEN transform({v}, x -> 0) "
        f"ELSE transform({v}, x -> CAST(floor(CAST(x AS DOUBLE) / {maxabs} * 127.0D) AS INT)) END"
    )
    return emb.select(
        F.col(id_col),
        F.expr(f"CAST(floor({maxabs} * 1000000.0D) AS BIGINT)").alias("scale_e6"),
        F.expr(f"concat_ws(',', transform({q}, x -> CAST(x AS STRING)))").alias("q_csv"),
    )


# -------------------------------------------------------------- #
# Random-hyperplane LSH (Charikar 2002 SimHash for vectors): the
# sub-quadratic candidate-generation path for cosine near-dup.
# -------------------------------------------------------------- #

#: signature geometry: 16 planes in 4 bands of 4 — two vectors with
#: cosine θ collide in ≥1 band with prob 1-(1-( 1-θ_angle/π )^4)^4.
#: This is the GATE-SCALE geometry (≤ ~10⁴ vectors); size production
#: runs with :func:`rh_params_for` — the round-5 10× stress measured
#: ~100× candidate growth when this fixed key space saturates.
RH_PLANES = 16
RH_BANDS = 4
RH_ROWS = 4


def cosine_noise_floor(dim: int) -> float:
    """The smallest scale-stable near-dup threshold for ``dim``:
    the null cosine of independent vectors is ~N(0, 1/dim), so a
    threshold below ~6σ = 6/√dim is crossed by RANDOM pairs often
    enough that matched-pair OUTPUT grows quadratically with corpus
    size no matter how good the candidate index is (measured 129×
    output at 10× data in SCALING.md round-5). Statistics, not plan
    shape."""
    import math

    return 6.0 / math.sqrt(dim)


def rh_params_for(n_hint: int, bands: int = RH_BANDS) -> tuple[int, int]:
    """(bands, rows) sized so the per-band key space tracks the
    corpus: junk candidates grow ~bands·N²/2^(rows+1), so ``rows``
    must be ≥ log₂N to hold junk ~O(N·bands/2). Floor at the
    gate-scale RH_ROWS; recall is recovered with more ``bands``, not
    shorter keys. Verified against the round-5 stress geometry
    (4×16 at the 50k-vector corpus cut candidates 1,880×)."""
    rows = max(RH_ROWS, (max(2, int(n_hint)) - 1).bit_length())
    return bands, rows


def ivf_centroid_mod_for(n_hint: int) -> int:
    """Modulus for the deterministic IVF centroid rule
    (``vec_id % mod == 0``) sizing the coarse codebook to ≈√N
    centroids — the faiss nlist heuristic. Assignment costs N·C·d
    and the probed scan costs ~|Q|·n_probe·(N/C)·d, balanced at
    C ≈ √N; holding the mod FIXED as the corpus grows makes C ∝ N
    and assignment quadratic (measured: td21 12.3× time at 10× data,
    SCALING.md round-6; re-sized to √N geometry it returns to
    linear). mod ≈ √N gives C = N/mod ≈ √N."""
    return max(1, math.isqrt(max(1, int(n_hint))))


def check_noise_floor(
    tau: float, dim: int, on_subnoise: str, op: str
) -> None:
    """Guard an operator's similarity threshold against the noise
    floor: ``on_subnoise`` is 'raise' (default for callers — the
    at-scale footgun should not pass silently), 'warn' (gate-scale /
    exploratory use), or 'off'."""
    if on_subnoise == "off" or tau >= cosine_noise_floor(dim):
        return
    msg = (
        f"{op}: tau={tau} is below the random-cosine noise floor "
        f"{cosine_noise_floor(dim):.3f} for dim={dim} (≈6/√dim): at "
        "corpus scale the matched-pair OUTPUT grows quadratically "
        "regardless of index geometry (SCALING.md round-5 measured "
        "129× output at 10× data). Raise tau, or pass "
        "on_subnoise='warn'/'off' for small-corpus use."
    )
    if on_subnoise == "warn":
        import warnings

        warnings.warn(msg, stacklevel=3)
    else:
        raise ValueError(msg)


def rh_coefficients(dim: int, planes: int = RH_PLANES) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix (planes × dim), derived
    from md5 of the (plane, k) index — a fixed public constant both
    the Spark build and the DuckDB oracle inline as literals, so
    signatures replay bit-for-bit. Rademacher ±1 entries give the
    same collision-probability guarantee as Gaussian planes (Achlioptas
    2001 database-friendly projections) and keep every product exact
    in IEEE doubles."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"rh:{p}:{k}".encode()).digest()[0] & 1 else -1.0
            for k in range(dim)
        ]
        for p in range(planes)
    ]


def rh_signature_bits(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    bands: int = RH_BANDS,
    rows: int = RH_ROWS,
) -> DataFrame:
    """Per-vector LSH band keys: (id, band, key) rows.

    One map-side pass — each plane's projection is a left-fold dot
    against a LITERAL ±1 array (constant-folded into codegen, exact
    double arithmetic, fold order identical to the oracle's
    list_reduce); bit p = (proj ≥ 0); band key packs ``rows`` bits
    into an integer. No shuffle here; the downstream candidate join
    shuffles (band, key) — 8+8 bytes per vector per band.

    SIZE THE KEY SPACE TO THE CORPUS: a band has 2^rows buckets, and
    random (cos≈0) pairs collide in a band with probability ~2^-rows,
    so the junk-candidate volume is ~bands · N²/2^(rows+1). The
    gate-scale default (4×4: 16 buckets) saturates beyond ~10⁴
    vectors — the 10× stress run measured ~100× candidate growth —
    so at production N choose rows ≳ log2(N) (e.g. rows=20+ at 10⁹
    vectors) and recover recall with more bands. Planes used =
    bands · rows.
    """
    # Round 13 (guide §4.2): the per-plane projections were bands·rows
    # interpreted left folds PER VECTOR (the HOF aggregate is
    # CodegenFallback — N·planes·dim lambda steps). The ±1 coefficient
    # matrix now ships BY VALUE in a mapInPandas closure (workers need
    # no repo imports) and projections accumulate DIMENSION-MAJOR
    # (proj += outer(A[:,k], C[:,k]) from zeros) — the same double-
    # addition order as the sequential fold / the oracle's
    # list_reduce, so every projection (and therefore every sign bit
    # and band key) is bit-identical. Still one map-side pass, no
    # shuffle. NULL vectors are dropped up front — their stacked keys
    # were NULL and a NULL key never equi-joins, so candidates are
    # unchanged.
    import numpy as np
    import pandas as pd

    planes = bands * rows
    coeffs = rh_coefficients(dim, planes)
    mat_c = np.array(
        [[float(f"{c:.1f}") for c in row] for row in coeffs], dtype=np.float64
    )
    id_dt = emb.schema[id_col].dataType.simpleString()
    src = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("_v")
    )
    n_bands, n_rows = bands, rows

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            a = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            proj = np.zeros((len(a), planes))
            for k in range(a.shape[1]):  # fold-order accumulation
                proj += np.outer(a[:, k], mat_c[:, k])
            bits = (proj >= 0.0).astype(np.int64)
            keys = np.zeros((len(a), n_bands), dtype=np.int64)
            for b in range(n_bands):
                for r in range(n_rows):
                    keys[:, b] += bits[:, b * n_rows + r] << r
            yield pd.DataFrame(
                {
                    "vid": np.repeat(pdf["vid"].to_numpy(), n_bands),
                    "band": np.tile(
                        np.arange(n_bands, dtype=np.int64), len(a)
                    ),
                    "key": keys.reshape(-1),
                }
            )

    return src.mapInPandas(kernel, f"vid {id_dt}, band int, key long")


def rh_neardup_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    dim: int,
    bands: int = RH_BANDS,
    rows: int = RH_ROWS,
    on_subnoise: str = "raise",
) -> DataFrame:
    """Cosine near-dup pairs via random-hyperplane LSH banding +
    exact verification — the recall<1 scale complement to the exact
    block-pair `cosine_neardup_pairs` (same output columns; emits the
    SUBSET of pairs that collide in ≥1 band).

    Scale shape: signatures are map-side; candidates come from an
    equi-join on (band, key) — the shuffle key is 16 bytes/vector/band
    regardless of dim, vs shipping 4·dim-byte vectors to block pairs.
    Verification joins the (candidate-bounded) pair list back to the
    vectors and checks the exact fold dot ≥ threshold, so no false
    positives survive; recall is the banding collision probability.
    """
    check_noise_floor(threshold, dim, on_subnoise, "rh_neardup_pairs")
    sig = rh_signature_bits(emb, id_col, vec_col, dim, bands=bands, rows=rows)
    cand = (
        sig.alias("a")
        .join(
            sig.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("id_lo"), F.col("b.vid").alias("id_hi"))
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_lo"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_hi"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_lo")
        .join(vb, "id_hi")
        .withColumn("sim", F.round(F.expr(dot_expr("va", "vb")), 4))
        .filter(F.col("sim") >= threshold)
        .select("id_lo", "id_hi", "sim")
    )


def kcenter_coreset(
    emb: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal; Sener & Savarese 2018 use exactly this for training-
    data subset selection): pick the min-id vector, then k−1 times
    the vector FARTHEST from the chosen set — a 2-approximation of
    the optimal k-center cover, the classic "maximally diverse
    subset" primitive for data pruning.

    EXACTNESS: distances run over the td10 int8 quantization
    (symmetric per-vector scale, floor codes — deterministic across
    engines), so every pairwise distance is an exact integer squared
    L2 and the argmax (ties by id ASC) replays bit-for-bit in DuckDB.

    Output: (ord, vec_id, dmin_q) — selection order, chosen id, and
    the exact squared distance to the previously-chosen set at pick
    time (dmin_q = 0 for the seed; the sequence is non-increasing —
    the standard coreset radius curve).

    Scale shape: greedy k-center is INHERENTLY sequential (center
    i+1 depends on i) — the loop is k−1 driver rounds, each a pure
    MAP over the cached quantized corpus: the classic incremental
    form carries a running ``dmin`` column and folds in ONLY the
    newest center (as a literal int array — no join, no broadcast,
    no per-round groupBy shuffle), so total distance evals are
    O(N·k), not the O(N·k²) of re-scoring the whole chosen set each
    round (round-8 rewrite: the join+groupBy form spent ~1.2 s/round
    in shuffle+agg overhead at sf0.1 — 5.0 s → 3.3 s warm measured at
    k=5, identical output; k=20 runs in 8 s where the joined form
    would re-score 190 center-pairs). Every 8 rounds the map stack is
    truncated with a tracked
    localCheckpoint (the connected-components discipline) so the
    recompute-per-action and codegen depth stay bounded at large k;
    k bounds the rounds (the BPE-trainer collect discipline — tiny
    argmax rows to the driver, never data).
    """
    from pyspark import StorageLevel

    from ..cacheutil import (
        register_rdd_ids,
        release_then_register,
        tracked_local_checkpoint,
        unpersist_rdd_ids,
    )

    spark = emb.sparkSession
    v = vec_col
    maxabs = f"array_max(transform({v}, x -> abs(CAST(x AS DOUBLE))))"
    qexpr = (
        f"CASE WHEN {maxabs} = 0.0D THEN transform({v}, x -> 0) "
        f"ELSE transform({v}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) / {maxabs} * 127.0D) AS INT)) END"
    )
    q = release_then_register(
        "similarity.kcenter",
        emb.select(F.col(id_col).alias("vid"), F.expr(qexpr).alias("qv"))
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    seed = q.orderBy("vid").limit(1).collect()
    if not seed:
        return spark.createDataFrame([], "ord long, vec_id long, dmin_q long")
    chosen = [(1, int(seed[0].vid), 0)]
    cur_qv = [int(x) for x in seed[0].qv]
    # running min distance to the chosen set; the first fold replaces
    # the +inf sentinel (any real d2 ≤ 64·254² ≪ 2^62).
    state = q.select("vid", "qv", F.lit(1 << 62).cast("long").alias("dmin"))
    prev_ck: set[int] = set()
    for step in range(2, k + 1):
        lit = "array(" + ", ".join(str(x) for x in cur_qv) + ")"
        d2_new = (
            f"aggregate(zip_with(qv, {lit}, (a, b) -> "
            "CAST(a - b AS BIGINT) * CAST(a - b AS BIGINT)), "
            "0L, (acc, x) -> acc + x)"
        )
        state = state.select(
            "vid", "qv", F.expr(f"least(dmin, {d2_new})").alias("dmin")
        )
        if (step - 1) % 8 == 0:
            state, ck_ids = tracked_local_checkpoint(state)
            # localCheckpoint is eager, so the superseded snapshot's
            # blocks are free-able the moment the new one exists — the
            # CC loop discipline (dedup.py); only the LIVE checkpoint
            # stays registered for the next invocation's release.
            unpersist_rdd_ids(spark.sparkContext, prev_ck)
            prev_ck = ck_ids
        nxt = (
            state.filter(~F.col("vid").isin([c[1] for c in chosen]))
            .orderBy(F.col("dmin").desc(), F.col("vid"))
            .limit(1)
            .collect()
        )
        if not nxt:
            break
        r = nxt[0]
        chosen.append((step, int(r.vid), int(r.dmin)))
        cur_qv = [int(x) for x in r.qv]
    register_rdd_ids("similarity.kcenter", spark.sparkContext, prev_ck)
    return spark.createDataFrame(chosen, "ord long, vec_id long, dmin_q long")


# ---------------------------------------------------------------------------
# Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998) —
# diversity-aware shortlist re-ranking.
# ---------------------------------------------------------------------------

#: MMR trade-off weights. BOTH are spelled as literals (0.3 is NOT
#: computed as 1 - 0.7, which is 0.30000000000000004 in binary64) so
#: the Python greedy and the DuckDB oracle multiply bit-identical
#: constants.
MMR_LAM = 0.7
MMR_ONE_MINUS_LAM = 0.3


def _fold_dot(a, b) -> float:
    """Left-fold double dot product — the exact IEEE evaluation order
    of dot_expr / the oracle's list_reduce (init 0.0, then
    ((0+t1)+t2)+…), so driver-side scores are bit-identical to both
    engines'."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (float(x) * float(y))
    return acc


def mmr_diversify(
    emb: DataFrame,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    pool: int = 30,
) -> DataFrame:
    """(step, nid, mmr) — greedy Maximal Marginal Relevance selection
    of ``k`` items: each step takes argmax of

        0.7·rel(c)  −  0.3·max_{s ∈ selected} dot(c, s)

    over the relevance top-``pool`` shortlist (ties → lower id; step 1
    has no selected set, so its score is 0.7·rel). ``query`` is a
    one-row frame; ``mmr`` is the selection-time score rounded to 6dp.

    Scale shape: the ONLY corpus-scale work is the relevance pass —
    broadcast query + map-side fold dot + TakeOrderedAndProject
    top-``pool`` (per-partition heaps, no global sort). The greedy
    O(pool²·k) refinement then runs driver-side on the model-sized
    shortlist — the standard deployment shape for rerankers (a
    shortlist bounded by the ``pool`` argument, NOT by the corpus;
    same bounded-collect contract as the BPE argmax). Float hazard:
    every score is a left-fold double identical in Spark, Python, and
    DuckDB, and the 0.7/0.3 weights are literal in all three — the
    oracle replays selection bit-for-bit.
    """
    q = query.select(F.col(vec_col).alias("qv")).limit(1)
    cand = (
        emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
        .join(F.broadcast(q))
        .withColumn("rel", F.expr(dot_expr("qv", "nv")))
        .orderBy(F.col("rel").desc(), "nid")
        .limit(pool)
        .select("nid", "nv", "rel")
    )
    rows = cand.collect()  # bounded by `pool`
    remaining = {r.nid: (list(r.nv), r.rel) for r in rows}
    picked: list[tuple[int, int, float]] = []  # (step, nid, mmr)
    sel_vecs: list[list[float]] = []
    for step in range(1, min(k, len(rows)) + 1):
        best = None
        for nid in sorted(remaining):
            v, rel = remaining[nid]
            if step == 1:
                mmr = MMR_LAM * rel
            else:
                ms = max(_fold_dot(v, s) for s in sel_vecs)
                mmr = (MMR_LAM * rel) - (MMR_ONE_MINUS_LAM * ms)
            if best is None or mmr > best[1]:
                best = (nid, mmr)
        nid, mmr = best
        picked.append((step, nid, mmr))
        sel_vecs.append(remaining.pop(nid)[0])
    spark = emb.sparkSession
    out = spark.createDataFrame(picked, "step long, nid long, mmr double")
    # Spark's HALF_UP round == DuckDB's round-away-from-zero; Python's
    # round() is banker's — so rounding happens HERE, not in the loop.
    return out.select("step", "nid", F.round("mmr", 6).alias("mmr"))


def bipartite_tau_floor(dim: int, n_eval: int) -> float:
    """Smallest meaningful semantic-decontam threshold for a
    ``dim``-dimensional space and an ``n_eval``-doc benchmark: the
    expected MAX of n_eval independent null cosines (~N(0, 1/dim)) is
    ≈ √(2·ln n_eval)/√dim, so a per-doc best-match below this flags
    essentially every training doc once the eval suite is large (the
    round-7 10× stress measured 63× flagged docs at 10× data with a
    sub-floor τ — noise maxima, not leaks). Unlike
    :func:`cosine_noise_floor` (which guards quadratic PAIR growth in
    N×N mining), this floor grows with the BENCHMARK size — re-derive
    it whenever the eval suite changes."""
    import math

    return math.sqrt(2.0 * math.log(max(2, int(n_eval)))) / math.sqrt(dim)


def _bipartite_floor_check(
    threshold: float, dim: int, n_eval: int, on_subnoise: str, op: str
) -> None:
    """Shared sub-noise τ guard for the bipartite decontam family
    (dense and IVF paths — one copy of the message/formula, the
    check_noise_floor pattern)."""
    floor = bipartite_tau_floor(dim, n_eval)
    if on_subnoise == "off" or threshold >= floor:
        return
    msg = (
        f"{op}: threshold={threshold} is below the expected max null "
        f"cosine {floor:.3f} for dim={dim}, n_eval={n_eval} "
        "(≈√(2·ln n)/√d): per-doc best matches at this τ are noise "
        "maxima, not leaks (63× flagged docs at 10× data measured, "
        "SCALING.md round 7). Raise τ, or pass on_subnoise='warn'/'off' "
        "for small-benchmark use."
    )
    if on_subnoise == "warn":
        import warnings

        warnings.warn(msg, stacklevel=3)
    else:
        raise ValueError(msg)


def _empty_pairs(spark) -> DataFrame:
    """Empty (doc, bench, sim) frame with the decontam contract schema."""
    return spark.createDataFrame([], "doc long, bench long, dot double").select(
        "doc", "bench", F.col("dot").alias("sim")
    )


def bipartite_cosine_pairs(
    emb: DataFrame,
    bench: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    on_subnoise: str = "raise",
) -> DataFrame:
    """(doc, bench, sim) — every (corpus row, benchmark row) pair with
    cosine ≥ threshold (vectors pre-normalized → cosine = dot): the
    EMBEDDING-space eval-leak check (semantic decontamination), the
    dense complement of the shingle-Jaccard fuzzy decontam — a
    paraphrase that shares few shingles still lands next to its eval
    source in embedding space.

    Scale shape: the benchmark matrix is COLLECTED once (bounded by
    contract — eval suites are 10³–10⁵ rows, the td9 broadcast-set
    argument) and shipped BY VALUE inside the mapInPandas closure
    (plain ndarrays; workers need no repo imports), so the training
    side streams through in Arrow batches with ZERO shuffle — a pure
    map-side scan however large the corpus. Exactness: the dot
    accumulates dimension-major (acc += A[:,k]·b[:,k]), the same
    double-addition order as the sequential SQL/DuckDB left fold, so
    the oracle replays bit-for-bit (the cosine_neardup_pairs
    discipline); 4dp rounding and the threshold compare stay
    Spark-side on the raw double, with the kernel keeping a pre-round
    guard band of 1e-4.
    """
    import numpy as np
    import pandas as pd

    rows = bench.select(
        F.col(id_col).alias("i"), F.col(vec_col).alias("v")
    ).collect()
    out_schema = "doc long, bench long, dot double"
    if not rows:
        return _empty_pairs(emb.sparkSession)
    ids_b = np.array([r.i for r in rows], dtype=np.int64)
    mat_b = np.array([list(r.v) for r in rows], dtype=np.float64)
    _bipartite_floor_check(
        threshold, mat_b.shape[1], len(ids_b), on_subnoise,
        "bipartite_cosine_pairs",
    )
    guard = threshold - 1e-4
    src = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids_a = pdf["_id"].to_numpy(np.int64)
            mat_a = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            sims = np.zeros((len(ids_a), len(ids_b)))
            for k in range(mat_b.shape[1]):  # fold-order accumulation
                sims += np.outer(mat_a[:, k], mat_b[:, k])
            ii, jj = np.nonzero(sims >= guard)
            if len(ii):
                yield pd.DataFrame(
                    {"doc": ids_a[ii], "bench": ids_b[jj], "dot": sims[ii, jj]}
                )

    out = src.mapInPandas(kernel, out_schema)
    return (
        out.withColumn("sim", F.round(F.col("dot"), 4))
        .filter(F.col("sim") >= threshold)
        .select("doc", "bench", "sim")
    )


def bipartite_cosine_pairs_ivf(
    emb: DataFrame,
    bench: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_probe: int = 2,
    on_subnoise: str = "raise",
) -> DataFrame:
    """(doc, bench, sim) — IVF-routed semantic decontamination: the
    LARGE-eval-suite fallback for :func:`bipartite_cosine_pairs`,
    whose dense scan costs |corpus|·|eval|·d flops by construction.
    Benchmark vectors are assigned to their nearest centroid (argmax
    dot, smallest-cid tiebreak — the td7 assignment rule); each corpus
    doc probes its ``n_probe`` nearest centroids and computes exact
    dots ONLY against benchmark vectors in those cells, cutting
    per-doc flops from |eval|·d to (C + n_probe·|eval|/C)·d — minimized
    at C ≈ √|eval| (size ``centroids`` with
    :func:`ivf_centroid_mod_for` over the BENCHMARK count). Recall < 1
    by design (a leak whose eval source lands outside the probed cells
    is missed); the oracle replays the identical probe set, so gate
    parity is exact, and ``n_probe ≥ C`` degenerates to the dense
    output bit-for-bit.

    Scale shape: the benchmark matrix, centroid codebook, and per-cell
    ROW INDICES are collected once (bounded: eval suites are 10³–10⁵
    rows) and shipped BY VALUE in the mapInPandas closure — the
    training corpus streams through in Arrow batches with ZERO
    shuffle, exactly the dense path's plan, just fewer flops per row.
    Closure-size ceiling: the pickled command carries ONE |eval|×d
    float64 matrix (cell views are rebuilt worker-side from the index
    arrays, never duplicated in the closure) — ~80 MB at the 10⁵×100
    documented upper bound; PySpark auto-broadcasts commands over
    1 MB, so it ships once per executor, not per task, but executor
    memory must still hold one copy per running Python worker.
    Exactness: every dot (probe and verify) accumulates
    dimension-major, the sequential left-fold order DuckDB replays;
    probe ranking uses a stable argsort over cid-ascending columns ≡
    ORDER BY dot DESC, cid ASC.
    """
    import numpy as np
    import pandas as pd

    out_schema = "doc long, bench long, dot double"
    b_rows = bench.select(
        F.col(id_col).alias("i"), F.col(vec_col).alias("v")
    ).collect()
    if not b_rows:
        return _empty_pairs(emb.sparkSession)
    c_rows = centroids.select(
        F.col(id_col).alias("i"), F.col(vec_col).alias("v")
    ).collect()
    if not c_rows:
        raise ValueError(
            "bipartite_cosine_pairs_ivf: empty centroid codebook — size it "
            "over the benchmark with ivf_centroid_mod_for(n_eval)"
        )
    # cid-ascending column order makes a STABLE argsort of -dots break
    # ties to the smallest cid, matching the oracle's ORDER BY.
    c_rows.sort(key=lambda r: r.i)
    ids_c = np.array([r.i for r in c_rows], dtype=np.int64)
    mat_c = np.array([list(r.v) for r in c_rows], dtype=np.float64)
    ids_b = np.array([r.i for r in b_rows], dtype=np.int64)
    mat_b = np.array([list(r.v) for r in b_rows], dtype=np.float64)
    dim = mat_b.shape[1]

    _bipartite_floor_check(
        threshold, dim, len(ids_b), on_subnoise, "bipartite_cosine_pairs_ivf"
    )

    # Benchmark→cell assignment, driver-side (eval-sized work): fold-
    # order dots against the codebook, stable argmax = first column.
    bc = np.zeros((len(ids_b), len(ids_c)))
    for k in range(dim):
        bc += np.outer(mat_b[:, k], mat_c[:, k])
    assign = np.argsort(-bc, axis=1, kind="stable")[:, 0]
    # Ship ROW INDICES per cell, not per-cell matrix copies: the
    # closure then carries exactly one benchmark matrix (+ tiny index
    # arrays) instead of a second, cell-sliced copy of it (round-8
    # ADVICE); workers rebuild the cell views once per task.
    cell_idx = {int(j): np.nonzero(assign == j)[0] for j in np.unique(assign)}
    n_probe_eff = min(int(n_probe), len(ids_c))
    guard = threshold - 1e-4
    src = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))

    def kernel(batches):
        cells = {
            j: (ids_b[idx], mat_b[idx]) for j, idx in cell_idx.items()
        }  # once per task; np.nonzero order == the old boolean-mask order
        for pdf in batches:
            if pdf.empty:
                continue
            ids_a = pdf["_id"].to_numpy(np.int64)
            mat_a = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            qc = np.zeros((len(ids_a), len(ids_c)))
            for k in range(dim):  # fold-order probe dots
                qc += np.outer(mat_a[:, k], mat_c[:, k])
            probed = np.argsort(-qc, axis=1, kind="stable")[:, :n_probe_eff]
            for j, (cids, cmat) in cells.items():
                rows = np.nonzero((probed == j).any(axis=1))[0]
                if not len(rows):
                    continue
                sims = np.zeros((len(rows), len(cids)))
                for k in range(dim):  # fold-order verify dots
                    sims += np.outer(mat_a[rows, k], cmat[:, k])
                ii, jj = np.nonzero(sims >= guard)
                if len(ii):
                    yield pd.DataFrame(
                        {
                            "doc": ids_a[rows[ii]],
                            "bench": cids[jj],
                            "dot": sims[ii, jj],
                        }
                    )

    out = src.mapInPandas(kernel, out_schema)
    return (
        out.withColumn("sim", F.round(F.col("dot"), 4))
        .filter(F.col("sim") >= threshold)
        .select("doc", "bench", "sim")
    )


#: decontam_semantic's dense-scan ceiling on the EVAL side. Below it
#: the dense kernel is exact (recall 1) and its |corpus|·|eval|·d flop
#: bill is fine; above it the IVF route cuts per-doc flops to
#: (C + n_probe·|eval|/C)·d — measured 40× wall at 0.998 recall on an
#: 18k benchmark (SCALING.md round 8; the dense leg took 137 s against
#: a 20k corpus there and grows linearly in BOTH sides). 10⁴ is the
#: documented boundary of the dense contract ("eval suites are
#: 10³–10⁴; the wall at 10⁵+").
DENSE_EVAL_MAX = 10_000


def decontam_semantic(
    emb: DataFrame,
    bench: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    dense_eval_max: int = DENSE_EVAL_MAX,
    n_probe: int = 2,
    on_subnoise: str = "raise",
) -> DataFrame:
    """(doc, bench, sim) — semantic decontamination with AUTOMATIC
    routing on benchmark size (the composition td26's docstring
    promises): ≤ ``dense_eval_max`` eval rows dense-scan via
    :func:`bipartite_cosine_pairs` (exact, recall 1); larger suites
    route through :func:`bipartite_cosine_pairs_ivf` with the
    ``ivf_centroid_mod_for`` geometry applied to the BENCHMARK count
    (C ≈ √|eval| cells, centroids = bench rows with id ≡ 0 mod
    ⌈√|eval|⌉ — callers whose ids are non-uniform in residue space
    should call the IVF kernel directly with their own codebook).
    Recall/speed trade at the switch is measured, not guessed:
    SCALING.md round 9 carries the n_probe ∈ {1, 2, 4, C} curve.

    The routing decision costs ONE bounded count() on the eval side —
    both kernels collect the benchmark anyway, so the action adds no
    asymptotic cost. The corpus side stays a zero-shuffle Arrow scan
    on either route."""
    n_eval = bench.count()
    if n_eval <= int(dense_eval_max):
        return bipartite_cosine_pairs(
            emb, bench, id_col, vec_col, threshold, on_subnoise=on_subnoise
        )
    mod = ivf_centroid_mod_for(n_eval)
    cents = bench.filter(F.pmod(F.col(id_col), F.lit(mod)) == 0)
    return bipartite_cosine_pairs_ivf(
        emb, bench, cents, id_col, vec_col, threshold,
        n_probe=n_probe, on_subnoise=on_subnoise,
    )


def cos2_bp_expr(
    dot: str = "dot",
    norm_lo_sq: str = "norm_lo_sq",
    norm_hi_sq: str = "norm_hi_sq",
) -> str:
    """SQL for cos2_bp = floor(10^8·dot² / (‖a‖²‖b‖²)) as the
    two-stage exact division 10^4·q + (10^4·r) div D, where q/r are
    the quotient/remainder of (10^4·dot²) by D = norm_lo_sq·norm_hi_sq.
    Every intermediate stays ≤ 10^36 at the documented envelope
    (dot ≤ 10^16, so r < D ≤ 10^32) — the naive 10^8·dot² form
    reaches 10^40 > DECIMAL(38,0), where Spark's non-ANSI decimal
    overflow yields NULL silently while the oracle's HUGEINT errors
    loudly. Exactness: q ≤ 10^4 by Cauchy–Schwarz (dot² ≤ D), and
    10^8·dot² = 10^4·q·D + 10^4·r, so flooring the second term gives
    the same value as the one-shot division."""
    dec = "decimal(38,0)"
    t4 = f"(CAST(10000 AS {dec}) * {dot} * {dot})"
    d = f"(CAST({norm_lo_sq} AS {dec}) * {norm_hi_sq})"
    return (
        f"CAST(10000 * ({t4} div {d}) + "
        f"((10000 * ({t4} % {d})) div {d}) AS BIGINT)"
    )


def allpairs_tf_cosine(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tau_num: int = 9,
    tau_den: int = 10,
    max_df_num: int | None = 1,
    max_df_den: int = 20,
) -> DataFrame:
    """All document pairs with term-frequency cosine ≥ τ = tau_num /
    tau_den — the SPARSE-vector similarity join (Bayardo, Ma &
    Srikant, WWW 2007 "Scaling Up All Pairs Similarity Search"),
    complementing the dense-embedding family (td5/td16) and the set
    family (td2 Jaccard): exact cosine over (term, tf) vectors with
    LOSSLESS prefix filtering instead of an index over every posting.
    τ defaults to 0.9: raw TF vectors share stopword mass, so the
    pairwise-cosine noise floor on ordinary corpora sits near 0.7–0.8
    (measured: 57% of ALL sf0.01 pairs clear 0.6) — τ below the floor
    makes the OUTPUT quadratic regardless of the filter, the same
    statistics wall as td16's tau guard.

    Prefix filter (exact, no recall loss): per doc, order features
    common-first (global df desc, term asc) and leave in the
    UNINDEXED SUFFIX the largest initial run whose inclusive mass
    satisfies den·Σtf² < num·‖d‖² (strict). For any pair missed by
    the candidate join, every shared feature lies in BOTH suffixes,
    so dot ≤ ‖suf_a‖·‖suf_b‖ < τ·‖a‖·‖b‖ (Cauchy–Schwarz + the strict
    per-doc rule) — every surviving pair with cos ≥ τ is generated.
    Candidates come from FULL(a) ⋈ INDEXED(b) on the feature (both
    orientations via lo/hi normalization), so a shared feature
    indexed by EITHER side is enough.

    EXACTNESS: the cosine test is the cross-multiplied square
    den²·dot² ≥ num²·‖a‖²·‖b‖² — dot and the squared norms are exact
    BIGINTs, the products stage through DECIMAL(38,0) (dot ≤ 10^16
    for 10^4-term docs; den²·dot² ≤ 10^34), and the DuckDB oracle is
    the BRUTE-FORCE all-pairs join — the gate therefore also proves
    the prefix filter lossless on real data. cos2_bp =
    floor(10^8·dot²/(‖a‖²‖b‖²)) (basis points of cos², monotone in
    cosine), computed as the two-stage division 10^4·q + (10^4·r) div
    D with q/r the quotient/remainder of (10^4·dot²) by D = ‖a‖²‖b‖²
    so no intermediate exceeds 10^36 at the envelope (the naive
    10^8·dot² reaches 10^40 > DECIMAL(38,0), a silent-NULL overflow).

    Scale shape: per-doc quantities never grow with the corpus (doc
    length bounds them); the candidate join's per-feature fan-out is
    n_full(f)·n_idx(f), and hot features land in almost every doc's
    suffix, so n_idx collapses exactly where n_full explodes — the
    classic AllPairs win over a full posting join. One (doc, term)
    agg, one df agg, one doc-partitioned cumsum window, the candidate
    equi-join, and a td2-style verify join; no driver actions.
    """
    dec = "decimal(38,0)"
    num, den = tau_num, tau_den
    from pyspark.sql import Window

    from .analysis import tokens

    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("f")
    )
    tf0 = toks.groupBy("doc", "f").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf0.groupBy("f").agg(F.count(F.lit(1)).alias("df_docs"))
    if max_df_num is not None:
        # stopword-level features (df > max_df_num/max_df_den of the
        # corpus) are dropped from the VECTORS before anything else —
        # standard similarity preprocessing, and the guard that keeps
        # the filter effective on small-vocabulary corpora (see the
        # selectivity note above). Broadcast one-row N, no action.
        ndocs = tf0.agg(F.countDistinct("doc").alias("_n"))
        dfreq = (
            dfreq.crossJoin(F.broadcast(ndocs))
            .filter(F.col("df_docs") * max_df_den <= F.col("_n") * max_df_num)
            .drop("_n")
        )
    tf = tf0.join(dfreq.select("f"), "f")
    vec = tf.join(dfreq, "f")
    norm = tf.groupBy("doc").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("nsq")
    )
    w = (
        Window.partitionBy("doc")
        .orderBy(F.col("df_docs").desc(), F.col("f"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = (
        vec.withColumn("cum", F.sum(F.col("tf") * F.col("tf")).over(w))
        .join(norm, "doc")
        .withColumn("indexed", F.expr(f"{den} * cum >= {num} * nsq"))
    )
    full = flagged.select("f", F.col("doc").alias("da"))
    probe = flagged.filter("indexed").select("f", F.col("doc").alias("db"))
    cand = (
        full.join(probe, "f")
        .filter(F.col("da") != F.col("db"))
        .select(
            F.least("da", "db").alias("lo"), F.greatest("da", "db").alias("hi")
        )
        .distinct()
    )
    # Verify via per-doc vector MAPS: two doc-keyed joins put both
    # sparse vectors on the candidate row, then the dot is a codegen
    # map_zip_with fold — |cand| rows with ~doc-length maps, versus
    # the posting-join shape (cand x features(lo), then an (hi, f)
    # equi-join) whose intermediate reaches |cand| x |terms| rows
    # (286M at sf0.1; measured 25.8 s -> map path ~4 s).
    vmap = tf.groupBy("doc").agg(
        F.map_from_entries(F.collect_list(F.struct("f", "tf"))).alias("m")
    )
    dots = (
        cand.join(
            vmap.select(F.col("doc").alias("lo"), F.col("m").alias("ma")), "lo"
        )
        .join(
            vmap.select(F.col("doc").alias("hi"), F.col("m").alias("mb")), "hi"
        )
        .select(
            "lo",
            "hi",
            F.expr(
                "aggregate(map_values(map_zip_with(ma, mb, "
                "(k, x, y) -> coalesce(x, 0L) * coalesce(y, 0L))), "
                "0L, (a, b) -> a + b)"
            ).cast("long").alias("dot"),
        )
        .filter(F.col("dot") > 0)
    )
    na = norm.select(F.col("doc").alias("lo"), F.col("nsq").alias("norm_lo_sq"))
    nb = norm.select(F.col("doc").alias("hi"), F.col("nsq").alias("norm_hi_sq"))
    return (
        dots.join(na, "lo")
        .join(nb, "hi")
        .filter(
            F.expr(
                f"CAST({den * den} AS {dec}) * dot * dot >= "
                f"CAST({num * num} AS {dec}) * norm_lo_sq * norm_hi_sq"
            )
        )
        .select(
            F.col("lo").alias("doc_lo"),
            F.col("hi").alias("doc_hi"),
            "dot",
            "norm_lo_sq",
            "norm_hi_sq",
            F.expr(cos2_bp_expr()).alias("cos2_bp"),
        )
    )
