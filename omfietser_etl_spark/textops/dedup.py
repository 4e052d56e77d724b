"""Document deduplication operators: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design (100 TB posture):
- Exact dedup is one hash-aggregate on a normalized key — a single
  shuffle with map-side partial aggregation.
- Jaccard/MinHash never compare all pairs. Candidates come from a
  *blocking* equi-join (shared shingle, or shared LSH band bucket),
  so the shuffle key is the shingle/bucket, and only co-bucketed docs
  ever meet. Verification joins run on the candidate set only.
- All hashing is exact 64-bit integer arithmetic inside codegen; no
  Python UDFs anywhere.

Generalizes the reference's key dedupe (`src/utils/dedupe.ts:23-52`)
and normalized-title near-dup grouping (`dedupe.ts:100-124`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cacheutil import persist_replannable, release_then_register
from .analysis import norm_text, poly_hash_q_col, shingles, tokens
from .constants import (
    BANDS,
    JACCARD_THRESHOLD,
    MINHASH_A,
    MINHASH_B,
    MOD,
    ROWS,
    SHINGLE_N,
    SIMHASH_A,
    SIMHASH_B,
    SIMHASH_BITS,
    SIMHASH_SPACE,
)


def exact_dedup_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-key exact-duplicate stats on the normalized text.

    One shuffle: groupBy(norm_key). Spark's hash aggregate does the
    map-side combine; at 100 TB the key cardinality ≈ distinct docs,
    so enable AQE to coalesce post-shuffle partitions.
    """
    keyed = df.select(
        F.col(id_col).alias("doc"), norm_text(text_col).alias("norm_key")
    )
    return keyed.groupBy("norm_key").agg(
        F.count("*").alias("n_docs"),
        F.min("doc").alias("keep_doc"),
    )


def doc_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = SHINGLE_N,
    hash_shingles: bool = False,
) -> DataFrame:
    """(doc, shingle) pairs — distinct word n-grams per document.

    ``hash_shingles=True`` is the 100 TB path: the shingle key becomes
    ``xxhash64(shingle)`` — 8 bytes instead of an n-token string
    (~30-80 bytes), cutting every downstream shuffle (df counts,
    blocking self-join, verification join) ~5-10× in bytes. A 64-bit
    collision needs ~2³² distinct shingles in one corpus (birthday
    bound) and at worst merges two shingle identities — one spurious
    intersection count. The gate builds keep the raw string so the
    DuckDB oracle replays bit-for-bit (same discipline as
    ``substring_dedup(hash_grams=...)``).
    """
    toks = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("t"))
    out = toks.select("doc", F.explode(shingles("t", n)).alias("s"))
    if hash_shingles:
        out = out.select("doc", F.xxhash64("s").alias("s"))
    return out


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = JACCARD_THRESHOLD,
    n: int = SHINGLE_N,
    max_df_frac: float | None = None,
    min_df_cap: int = 3,
    hash_shingles: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard ≥ threshold.

    Blocking join on the shingle: a pair is only generated if it
    shares ≥1 shingle, then |A∩B| comes from the join group count and
    |A∪B| = |A|+|B|−|A∩B|.

    ``max_df_frac`` is the degenerate-shingle guard that keeps the
    blocking join sub-quadratic on stopword-heavy corpora: shingles
    whose document frequency exceeds ceil(max_df_frac · n_docs) are
    dropped BEFORE the self-join (a shingle shared by k docs emits
    O(k²) candidate rows — one near-universal shingle degenerates the
    block join to all-pairs). The hot-shingle set is tiny by
    construction, so it broadcasts and the drop is a map-side
    anti-join; sizes and intersections are both computed over the
    filtered shingle space, so Jaccard stays internally consistent
    (boilerplate shingles simply stop counting as evidence).
    ``min_df_cap`` floors the cutoff so tiny corpora don't drop
    ordinary shared shingles. ``hash_shingles`` swaps the shuffled
    shingle key for its 8-byte xxhash64 (see :func:`doc_shingles`) —
    identical output modulo 64-bit collisions, ~5-10× less shuffle.
    """
    sh = doc_shingles(df, id_col, text_col, n, hash_shingles=hash_shingles)
    if max_df_frac is not None:
        # Round 12 (guide §1.2): cache the RAW shingle frame first —
        # the guard's n_docs and hot-shingle subtrees plus the
        # filtered-frame cache fill otherwise each re-run the
        # tokenize+explode (three full passes before the old cache
        # ever filled).
        sh = release_then_register("dedup.jaccard_sh0", sh.cache())
        n_docs = sh.select(F.countDistinct("doc").alias("n_docs"))
        cap = F.greatest(
            F.lit(min_df_cap).cast("long"),
            F.ceil(F.lit(max_df_frac) * F.col("n_docs")),
        )
        hot = (
            sh.groupBy("s")
            .agg(F.count("*").alias("df_cnt"))
            .crossJoin(F.broadcast(n_docs))
            .filter(F.col("df_cnt") > cap)
            .select("s")
        )
        sh = sh.join(F.broadcast(hot), "s", "left_anti")
    # fan-out intermediate: registered so the NEXT invocation releases
    # it (back-to-back catalog runs must not accumulate cache)
    sh = release_then_register("dedup.jaccard_pairs", sh.cache())
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_lo"), F.col("b.doc").alias("doc_hi"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc": "doc_lo", "n_sh": "n_lo"}), "doc_lo")
        .join(sizes.withColumnsRenamed({"doc": "doc_hi", "n_sh": "n_hi"}), "doc_hi")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("n_lo") + F.col("n_hi") - F.col("inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_lo", "doc_hi", "jaccard")
    )


def minhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc MinHash signature: N_HASHES min-of-affine-map columns.

    One explode + one groupBy; the N min() aggregates all ride the
    same shuffle. Hashes are (a_i*h + b_i) % MOD over the exact
    polynomial shingle hash h — engine-portable, no xxhash64 needed
    for the oracle (swap in ``F.xxhash64`` for production speed; the
    semantics don't change).
    """
    # Round 13 (guide §4.2): the char-fold hash runs once per shingle;
    # the vectorized Arrow twin is bit-identical and ~0.4 s faster per
    # signature pass at sf0.1 (probe numbers in its docstring).
    sh = doc_shingles(df, id_col, text_col).withColumn("h", poly_hash_q_col("s"))
    aggs = [
        F.min(F.expr(f"({MINHASH_A[i]}L * h + {MINHASH_B[i]}L) % {MOD}")).alias(f"mh{i}")
        for i in range(len(MINHASH_A))
    ]
    return sh.groupBy("doc").agg(*aggs)


def lsh_candidate_pairs(sig: DataFrame) -> DataFrame:
    """Candidate pairs from LSH banding over MinHash signatures.

    Bands become (doc, band_id, key) rows via ``stack``; the
    candidate join shuffles on (band_id, key) — the bucket — never on
    doc. Distinct de-dups pairs that collide in multiple bands.
    """
    band_exprs = []
    for b in range(BANDS):
        cols = ", ".join(f"mh{b * ROWS + r}" for r in range(ROWS))
        band_exprs.append(f"{b}, concat_ws('_', {cols})")
    stacked = sig.select(
        "doc", F.expr(f"stack({BANDS}, {', '.join(band_exprs)}) AS (band_id, key)")
    )
    return (
        stacked.alias("a")
        .join(
            stacked.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_lo"), F.col("b.doc").alias("doc_hi"))
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = JACCARD_THRESHOLD,
    hash_shingles: bool = False,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified by exact Jaccard.

    The scale path: signatures (1 shuffle) → band buckets (1 shuffle)
    → candidate verification joins restricted to the candidate set.
    ``hash_shingles`` applies only to the verification join (the
    signature shuffle already carries map-side-combined mins, not
    strings): its equi-join key becomes the 8-byte shingle hash, the
    dominant shuffle-byte cut of the verify stage.
    """
    sh = release_then_register(
        "dedup.minhash_lsh_pairs",
        doc_shingles(df, id_col, text_col, hash_shingles=hash_shingles).cache(),
    )
    sig = minhash_signatures(df, id_col, text_col)
    cand = lsh_candidate_pairs(sig)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(sh.alias("x"), cand.doc_lo == F.col("x.doc"))
        .join(
            sh.alias("y"),
            (cand.doc_hi == F.col("y.doc")) & (F.col("x.s") == F.col("y.s")),
        )
        .groupBy("doc_lo", "doc_hi")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc": "doc_lo", "n_sh": "n_lo"}), "doc_lo")
        .join(sizes.withColumnsRenamed({"doc": "doc_hi", "n_sh": "n_hi"}), "doc_hi")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("n_lo") + F.col("n_hi") - F.col("inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_lo", "doc_hi", "jaccard")
    )


def minhash_estimate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_agree: int | None = None,
) -> DataFrame:
    """MinHash near-dup pairs scored by SIGNATURE AGREEMENT — the
    estimation-only twin of :func:`minhash_lsh_pairs` (Broder 1997:
    P[min-hashes agree] = Jaccard, so ``agree / N_HASHES`` is an
    unbiased Jaccard estimate). Output (doc_lo, doc_hi, agree) for
    LSH candidates with ``agree >= min_agree`` (default: half the
    signature, i.e. estimated J >= 0.5); ``agree`` is the exact
    integer #{i : mh_i(lo) == mh_i(hi)} — no float enters the gate.

    THE POINT AT 100 TB: td3's verify stage joins candidates back to
    the full shingle sets — a shuffle carrying O(doc length) bytes
    per doc. Here verification reads only the signature frame
    (N_HASHES·8 bytes per doc, constant regardless of document size),
    so the candidate-scoring joins shuffle ~|doc|/128 of the bytes.
    The trade is exactness: agreement is a 1/N_HASHES-granular
    estimate with binomial error, the standard large-corpus operating
    point (exact-verify only the survivors if downstream needs true
    Jaccard).
    """
    if min_agree is None:
        min_agree = len(MINHASH_A) // 2
    sig = release_then_register(
        "dedup.minhash_estimate_pairs",
        minhash_signatures(df, id_col, text_col).cache(),
    )
    cand = lsh_candidate_pairs(sig)
    lo = sig.withColumnsRenamed(
        {"doc": "doc_lo", **{f"mh{i}": f"lo{i}" for i in range(len(MINHASH_A))}}
    )
    hi = sig.withColumnsRenamed(
        {"doc": "doc_hi", **{f"mh{i}": f"hi{i}" for i in range(len(MINHASH_A))}}
    )
    agree = None
    for i in range(len(MINHASH_A)):
        term = (F.col(f"lo{i}") == F.col(f"hi{i}")).cast("int")
        agree = term if agree is None else agree + term
    return (
        cand.join(lo, "doc_lo")
        .join(hi, "doc_hi")
        .select("doc_lo", "doc_hi", agree.cast("long").alias("agree"))
        .filter(F.col("agree") >= min_agree)
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc 32-bit SimHash over distinct-token hashes.

    Explode tokens → one groupBy carrying SIMHASH_BITS majority-vote
    sums → recombine bits. All exact integer arithmetic.
    """
    tok = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("t"))
    tok = tok.select("doc", F.explode(F.array_distinct("t")).alias("tk"))
    tok = tok.withColumn("h", poly_hash_q_col("tk")).withColumn(
        "h32", F.expr(f"({SIMHASH_A}L * h + {SIMHASH_B}L) % {SIMHASH_SPACE}")
    )
    votes = [
        F.sum(F.expr(f"CASE WHEN (h32 >> {j}) & 1 = 1 THEN 1 ELSE -1 END")).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc").agg(*votes)
    recombine = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0L END)"
        for j in range(SIMHASH_BITS)
    )
    return agg.select("doc", F.expr(recombine).alias("simhash"))


def drop_incomplete(df, required=("unified_id", "shop_type", "title")):
    """F5 incomplete-row filter: keep rows whose identity strings are
    truthy and whose current_price is defined (ref:
    src/utils/dedupe.ts:83-93 — JS truthiness for the strings,
    `!== undefined` for the price, so 0.0 passes)."""
    from pyspark.sql import functions as F

    cond = F.col("current_price").isNotNull()
    for c in required:
        cond = cond & F.col(c).isNotNull() & (F.col(c).cast("string") != "")
    return df.filter(cond)


#: truncate iterative-loop lineage every N rounds: short loops (the
#: common dedup case) never pay the checkpoint, long ones keep the
#: logical plan bounded at N rounds deep instead of chaining all of
#: them into one driver-heap-exploding tree.
CC_CHECKPOINT_EVERY = 8

#: scale-adaptive partition sizing for the CC loops (round 12, guide
#: §2.2/§2.5): the loop frames are EDGE-LIST-sized (candidate pairs,
#: orders of magnitude below the corpus), yet the loop shuffles were
#: pinned at spark.sql.shuffle.partitions — at the bench's local[32]
#: that is 32 near-empty tasks per round stage over a ~500-row graph
#: (and 200 under the vanilla driver session), pure scheduling
#: overhead. The loop partition count is now derived from the
#: MEASURED distinct-edge count (one bounded count on the persisted
#: edge frame), capped at the session conf: ceil(n_edges /
#: CC_ROWS_PER_PARTITION) — a 100 TB pair graph still gets the full
#: conf-sized layout, a small one gets single-task rounds. Measured
#: (dd4 core, sf0.1/local[32]): pairs+CC 3.76 -> 2.83 s median with
#: bit-identical components.
CC_ROWS_PER_PARTITION = 200_000


def _cc_loop_partitions(n_edges: int, n_conf: int) -> int:
    """ceil(n_edges / CC_ROWS_PER_PARTITION), clamped to [1, n_conf]."""
    return max(1, min(n_conf, -(-n_edges // CC_ROWS_PER_PARTITION)))


def connected_components(
    pairs: DataFrame,
    lo_col: str = "doc_lo",
    hi_col: str = "doc_hi",
    max_iter: int = 25,
) -> DataFrame:
    """Transitive closure of near-dup pairs → (node, component) with
    component = min node id reachable.

    This is the canonical dedup-clustering step after any pair
    producer (MinHash/LSH, Jaccard, SimHash, cosine): A~B and B~C must
    collapse to one keep-group even though A and C never met in a
    bucket.

    Iterative min-label propagation: each round, every node takes the
    min of its own label and its neighbors' labels. Rounds needed =
    graph diameter (near-dup clusters are short chains; GraphX/
    GraphFrames use the same loop with large-star/small-star to cut
    worst cases). At 100 TB the edge list is candidate pairs, orders
    of magnitude smaller than the corpus. Labels persist per round
    and the previous round unpersists; convergence is detected with a
    changed-row count (driver-coordinated loop, data never leaves
    executors).

    Each round is exactly TWO shuffles — the edges⋈labels hash join
    and one groupBy(node) — because the old label rides the round as
    a tagged union row instead of a second join back onto the labels
    frame: min over (neighbor labels ∪ own label) is the new label,
    and the own-label row doubles as the change detector.

    Rounds persist as usual, but every CC_CHECKPOINT_EVERY rounds the
    labels frame ``localCheckpoint``s to truncate lineage — a
    cache-only iterative loop chains EVERY previous round into one
    logical plan and eventually blows the driver heap on Catalyst
    planning/tree rendering. Typical near-dup graphs converge before
    the first checkpoint, so the common path pays nothing; long
    chains get a plan bounded at CC_CHECKPOINT_EVERY rounds deep
    (see connected_components_star for the reliable-checkpoint
    escape hatch). Checkpoint blocks are explicitly freed when their
    round is superseded (DataFrame.unpersist() is a no-op for a
    localCheckpointed plan) — safe because the successor round is
    already materialized to its own MEMORY_AND_DISK storage before
    the parent's blocks go, so no recompute path crosses the freed
    checkpoint; the final round's blocks are scope-registered and
    freed by the next invocation.
    """
    from pyspark import StorageLevel

    from ..cacheutil import (
        register,
        register_rdd_ids,
        release,
        tracked_loop_checkpoint,
        unpersist_rdd_ids,
    )

    release("dedup.connected_components")  # previous invocation's labels
    spark = pairs.sparkSession
    sc = spark.sparkContext
    n_conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # The symmetrized-distinct edge frame persists FIRST so its
    # measured row count can size the loop layout (see
    # CC_ROWS_PER_PARTITION); the count doubles as the loop's edge
    # materialization (one pass over the pair producer either way —
    # the old single-plan distinct+repartition chained the same two
    # shuffles, just without the bounded count between them).
    dist = (
        pairs.select(F.col(lo_col).alias("a"), F.col(hi_col).alias("b"))
        .unionByName(
            pairs.select(F.col(hi_col).alias("a"), F.col(lo_col).alias("b"))
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_parts = _cc_loop_partitions(dist.count(), n_conf)
    # Every loop shuffle (labels aggs, round joins) runs at the
    # derived count for the loop's duration — the hits() save/restore
    # conf discipline; restored in `finally` so later queries keep the
    # session layout. SINGLE-THREADED-SESSION REQUIREMENT (round-12
    # ADVICE): spark.sql.shuffle.partitions is session-GLOBAL, so any
    # concurrent driver thread submitting work on the same session
    # during the loop would run at the clamped count, and interleaved
    # save/restore is last-writer-wins. The whole catalog/bench/gate
    # surface is single-threaded by construction; a future concurrent
    # harness must either serialize CC invocations or switch the loop
    # to explicit repartition counts. The restore (including on
    # mid-loop exceptions) is pinned by
    # tests/test_textops.py::test_cc_restores_shuffle_conf.
    prev_conf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    dist_live = True
    try:
        # Pre-partition the (static) edge list on the JOIN key b with an
        # explicit partition count: the cached frame then reports
        # hashpartitioning(b, n_parts), so EnsureRequirements drops the
        # edges-side exchange from EVERY round's join (distinct() alone
        # leaves hashpartitioning(a, b), which never satisfies the b-only
        # requirement — the big side re-shuffled once per round).
        # localCheckpoint, not persist (round 12): a persisted edges
        # frame keeps the WHOLE pair-producer lineage (the LSH
        # pipeline) in its logical plan, and every round — plus every
        # downstream consumer of the returned labels — re-plans over
        # that tree (td15's formatted plan carried 243 inlined scans /
        # 442 exchange nodes of pure print+planning weight). The
        # checkpoint truncates the loop's root to a leaf RDD while
        # preserving the hashpartitioning(b) physical layout
        # (Dataset.localCheckpoint keeps outputPartitioning), so the
        # exchange-free round join survives. Blocks are scope-
        # registered: freed by the NEXT invocation, exactly like the
        # final round's cache.
        # Storage contract (round-12 ADVICE): these checkpoint blocks
        # (2x the candidate-pair rows) are scope-registered, so they
        # live until the NEXT connected_components invocation — or a
        # harness release_all() — not until loop end. Freeing them at
        # loop end would be unsafe only if the final round's cache
        # were lost and recomputed; between catalog queries the
        # release_all() discipline bounds the lingering storage.
        edges, edges_ck = tracked_loop_checkpoint(
            dist.repartition(n_parts, F.col("b"))
        )
        register_rdd_ids("dedup.connected_components", sc, edges_ck)
        # Initial labels = least(node, min neighbor): exactly what round 1
        # would produce from the identity labeling, for ONE groupBy over
        # the edge list instead of a full join+union+agg round — the loop
        # starts one propagation step ahead.
        labels = (
            edges.groupBy(F.col("a").alias("node"))
            .agg(F.min("b").alias("_mb"))
            .select("node", F.least(F.col("node"), F.col("_mb")).alias("label"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # stored = the frame whose plan is ACTUALLY in the cache manager.
        # DataFrame.unpersist() only matches its own plan — calling it on a
        # derived frame (e.g. agg.drop(...)) is a silent no-op and leaked
        # one persisted round per iteration for the session lifetime.
        stored = labels
        # Eager scope registration (round-12 ADVICE): every round's
        # cache/checkpoint is registered the moment it exists, so a
        # mid-loop exception leaves nothing untracked — the next
        # release() frees it (release's unpersist is idempotent, so
        # the in-loop explicit frees below stay the fast path).
        register("dedup.connected_components", stored)
        ck_ids: set[int] = set()  # blocks backing the CURRENT labels round
        for i in range(max_iter):
            contrib = (
                edges.join(labels, edges["b"] == labels["node"])
                .select(edges["a"].alias("node"), "label", F.lit(False).alias("own"))
                .unionByName(labels.withColumn("own", F.lit(True)))
            )
            agg = contrib.groupBy("node").agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("own"), F.col("label"))).alias("_old"),
            )
            if (i + 1) % CC_CHECKPOINT_EVERY == 0:
                agg, new_ck_ids = tracked_loop_checkpoint(agg)
            else:
                agg = agg.persist(StorageLevel.MEMORY_AND_DISK)
                new_ck_ids = set()
            register("dedup.connected_components", agg)
            register_rdd_ids("dedup.connected_components", sc, new_ck_ids)
            changed = agg.filter(F.col("label") < F.col("_old")).count()
            if dist_live:
                # edges + round 1 are materialized now — the sizing
                # frame's blocks are dead weight from here on
                dist.unpersist()
                dist_live = False
            # agg is now materialized to its own storage → the previous
            # round's blocks (cache or checkpoint) are safe to free
            stored.unpersist()
            unpersist_rdd_ids(sc, ck_ids)
            stored, ck_ids = agg, new_ck_ids
            labels = agg.drop("_old")
            if changed == 0:
                break
        # edges is checkpoint-backed: DataFrame.unpersist() is a no-op
        # for it; its blocks are scope-registered above and freed by
        # the next invocation (the returned labels never recompute
        # through it — the final round is materialized to its own
        # storage).
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_conf)
        # the sizing frame's blocks are normally freed inside the loop
        # after round 1 materializes; on a pre-loop/first-round failure
        # (or max_iter <= 0) this is the only free (round-12 ADVICE —
        # unpersist is idempotent, so the common path pays nothing).
        if dist_live:
            dist.unpersist()
    # the final round backs the returned lazy result — its storage
    # (cache + any checkpoint blocks, registered eagerly above) stays
    # until the next invocation releases the scope
    return labels.select("node", F.col("label").alias("component"))


def connected_components_star(
    pairs: DataFrame,
    lo_col: str = "doc_lo",
    hi_col: str = "doc_hi",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — same (node, component=min reachable id) contract as
    :func:`connected_components`, but with edge REWRITING instead of
    label propagation: each round contracts paths toward the minimum,
    so convergence is O(log²) rounds in the worst case vs. the plain
    loop's O(diameter). Use when candidate-pair graphs can contain
    long chains (transitive near-dup bridges across a corpus — e.g.
    boilerplate gradients); for the typical short-diameter dedup
    cluster the simple loop does fewer shuffles per round.

    large-star: every node u sends its strictly-larger neighbors to
    m = min(N(u) ∪ {u}); small-star: edges orient large→small, every
    node u re-parents its smaller neighbors (and itself) onto their
    min. Both are ONE window shuffle (partitionBy node, min over the
    group rides the same exchange) + a distinct; the edge set only
    shrinks toward the star form, and a (count, hash-xor) checksum —
    two scalars to the driver, overflow-free in ANSI mode — detects
    the fixed point. Final graph is a union of stars rooted at each
    component's min id.

    Rounds persist, with a lineage-truncating ``localCheckpoint``
    every few alternations (star rounds stack two windows + distinct
    + union each, so the plan tree deepens fast — a cache-only loop
    blew the driver heap on Catalyst tree rendering in testing). The
    checkpoint is executor-local by default; setting
    ``SPARK_GRAFT_RELIABLE_CKPT_DIR`` switches every loop checkpoint
    to a reliable ``checkpoint()`` for multi-hour production runs
    where executor loss must be survivable (round-13; see
    cacheutil.tracked_loop_checkpoint — parity pinned by
    tests/test_textops.py::test_cc_reliable_checkpoint_parity).
    """
    from pyspark.sql import Window

    from ..cacheutil import (
        register,
        register_rdd_ids,
        release,
        tracked_loop_checkpoint,
        unpersist_rdd_ids,
    )

    release("dedup.connected_components_star")
    spark = pairs.sparkSession
    sc = spark.sparkContext
    # localCheckpoint, not persist, roots the loop (round 12): the
    # star rounds re-plan over the edge frame's WHOLE logical plan
    # every alternation, and with a persisted root that plan is the
    # full pair-producer pipeline (dd5's formatted plan carried 1537
    # inlined scan / 2862 exchange nodes of pure planning+print
    # weight). The checkpoint truncates the root to a leaf RDD; the
    # eager materialization replaces the persist's first-action fill
    # (same single pass over the pair producer).
    edges, ck_ids = tracked_loop_checkpoint(
        pairs.select(
            F.least(F.col(lo_col), F.col(hi_col)).alias("a"),
            F.greatest(F.col(lo_col), F.col(hi_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    register_rdd_ids("dedup.connected_components_star", sc, ck_ids)
    # Scale-adaptive loop layout (round 12; see connected_components):
    # every star round runs two windows + a distinct over an
    # edge-list-sized frame — at the pinned session conf that is 32
    # (bench) / 200 (vanilla) near-empty tasks per stage on small
    # graphs. The count below reads the checkpoint storage; conf
    # restored in `finally`.
    n_parts = _cc_loop_partitions(
        edges.count(), int(spark.conf.get("spark.sql.shuffle.partitions"))
    )
    # SINGLE-THREADED-SESSION REQUIREMENT: see connected_components —
    # the conf is session-global; restore (incl. on exceptions) pinned
    # by tests/test_textops.py::test_cc_restores_shuffle_conf.
    prev_conf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))

    def _checksum(e: DataFrame) -> tuple:
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(a, b))"), F.lit(0)).alias("h"),
        ).first()
        return (row["n"], row["h"])

    def _large_star(e: DataFrame) -> DataFrame:
        # symmetrized neighborhoods; (u, v) rows carry m = min(N ∪ u)
        sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        w = Window.partitionBy("u")
        with_m = sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        return (
            with_m.filter(F.col("v") > F.col("u"))
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # edges already orient a < b; group by the larger endpoint
        w = Window.partitionBy("b")
        with_m = e.withColumn("m", F.min("a").over(w))
        re_parented = with_m.select(F.col("m").alias("a"), F.col("b").alias("b"))
        siblings = with_m.select(F.col("m").alias("a"), F.col("a").alias("b"))
        return (
            re_parented.unionByName(siblings)
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    try:
        prev_sum = _checksum(edges)
        # EVERY round localCheckpoints (round 12; was persist with a
        # checkpoint every star_every rounds): a persisted round keeps
        # its two-window+distinct+union subtree chained onto all prior
        # rounds' plans, so Catalyst re-planned a growing tree each
        # alternation. Per-round truncation keeps every round's plan a
        # constant two-window tree over a leaf; the storage cost is
        # identical (localCheckpoint persists MEMORY_AND_DISK) and the
        # superseded round's blocks are freed exactly as before.
        # Measured (dd5 shape, sf0.1/local[32]): 8.2-8.7 s -> 3.7-5.6 s
        # median on calm windows, identical components.
        for i in range(max_iter):
            nxt, new_ck_ids = tracked_loop_checkpoint(
                _small_star(_large_star(edges))
            )
            # eager scope registration (round-12 ADVICE): a mid-loop
            # exception must leave no untracked blocks; the explicit
            # free below stays the fast path (release is idempotent)
            register_rdd_ids("dedup.connected_components_star", sc, new_ck_ids)
            cur_sum = _checksum(nxt)  # materializes nxt to its own storage
            unpersist_rdd_ids(sc, ck_ids)  # superseded round's blocks
            ck_ids = new_ck_ids
            edges = nxt
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_conf)

    register("dedup.connected_components_star", edges)
    register_rdd_ids("dedup.connected_components_star", sc, ck_ids)
    return (
        edges.select(F.col("b").alias("node"), F.col("a").alias("component"))
        .unionByName(
            edges.select(F.col("a").alias("node"), F.col("a").alias("component"))
        )
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def substring_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_docs: int = 2,
    hash_grams: bool = False,
) -> DataFrame:
    """Exact substring dedup: remove every run of >= ``k`` whitespace
    tokens that appears verbatim in >= ``min_docs`` distinct documents
    (the ExactSubstr rule of "Deduplicating Training Data Makes
    Language Models Better", Lee et al. 2021 — suffix-array semantics
    re-expressed as a distributed k-gram join; extends the
    reference's normalized-title dedupe `src/utils/dedupe.ts:100-124`
    from whole-field to intra-document spans).

    Scale shape (no suffix array, no all-pairs):
    1. one explode to (doc, pos, k-gram) — map-side only;
    2. one hash-agg on the gram for global document frequency
       (map-side combine collapses within-partition repeats);
    3. an equi-join of grams against the (small) duplicated-gram set —
       ``hash_grams=True`` is the 100 TB path: the shuffle/agg key is
       ``xxhash64(gram)`` (8 bytes) instead of the k-token string
       (~50-100 bytes), cutting shuffle volume ~10×; a 64-bit
       collision would need ~2³² distinct grams in one corpus
       (birthday bound) and at worst over-masks one span. The gate
       build joins the raw string so the DuckDB oracle replays
       bit-for-bit;
    4. covered token positions union via explode+distinct, runs via
       the pos - row_number() islands trick — both doc-keyed, so
       AQE-coalesced doc-hash shuffles;
    5. surviving tokens reassemble in order with a doc-keyed agg.

    Returns (doc, clean_text, n_tokens, dup_token_cnt, dup_span_cnt).
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc"), F.split(F.col(text_col), " ").alias("toks")
    ).withColumn("n_tokens", F.size("toks"))

    # sequence(0, n-k) DESCENDS when n < k — guard to an empty array.
    starts = F.when(
        F.col("n_tokens") >= k, F.sequence(F.lit(0), F.col("n_tokens") - k)
    ).otherwise(F.expr("array()").cast("array<int>"))
    gram_str = F.array_join(F.slice("toks", F.col("pos") + 1, k), " ")
    gram_key = F.xxhash64(gram_str) if hash_grams else gram_str
    grams = toks.select(
        "doc", F.explode(starts).alias("pos"), "toks"
    ).select("doc", "pos", gram_key.alias("gram"))

    dup = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    marked = grams.join(dup, "gram").select("doc", "pos")
    covered = marked.select(
        "doc", F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("tpos")
    ).distinct()

    w = Window.partitionBy("doc").orderBy("tpos")
    runs = covered.withColumn("grp", F.col("tpos") - F.row_number().over(w))
    cov_stats = runs.groupBy("doc").agg(
        F.count("*").alias("dup_token_cnt"),
        F.countDistinct("grp").alias("dup_span_cnt"),
    )

    tokpos = toks.select("doc", F.posexplode("toks").alias("tpos", "tok"))
    kept = tokpos.join(covered, ["doc", "tpos"], "left_anti")
    clean = kept.groupBy("doc").agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(tpos, tok))), s -> s.tok)"),
            " ",
        ).alias("clean_text")
    )

    base = toks.select("doc", F.col("n_tokens").cast("long").alias("n_tokens"))
    return (
        base.join(clean, "doc", "left")
        .join(cov_stats, "doc", "left")
        .select(
            "doc",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_tokens",
            F.coalesce("dup_token_cnt", F.lit(0)).cast("long").alias("dup_token_cnt"),
            F.coalesce("dup_span_cnt", F.lit(0)).cast("long").alias("dup_span_cnt"),
        )
    )


def minhash_estimate_bp(n_hashes: int = len(MINHASH_A)) -> "F.Column":
    """Signature-agreement Jaccard estimate in basis points: the
    fraction of matching MinHash components is an unbiased estimator
    of the true Jaccard (the classic MinHash property) — exact
    integer arithmetic over already-joined a/b signature columns."""
    matches = " + ".join(
        f"(CASE WHEN a_mh{i} = b_mh{i} THEN 1 ELSE 0 END)" for i in range(n_hashes)
    )
    return F.expr(f"(10000 * ({matches})) div {n_hashes}")


def incremental_lsh_pairs(
    new_df: DataFrame,
    state_sigs: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Dedup a NEW batch against an existing corpus WITHOUT touching
    the old raw text: the corpus state is its MinHash signature table
    (built once per batch by :func:`minhash_signatures` and
    appended). Candidates come from LSH banding over new∪state
    signatures with old×old pairs excluded — those were found when
    their batches arrived and are never recomputed — and every pair
    carries the signature-agreement Jaccard estimate (exact integer
    bp, no raw-text verification join needed at candidate time).

    This is the production shape of corpus-scale dedup: per-batch
    cost is O(batch signatures + collisions), not O(corpus). Scale:
    the candidate join shuffles 16-byte band keys; store the state
    signature table bucketed by band key and the new side's bands
    partition-prune it.

    Returns (doc_lo, doc_hi, pair_origin ∈ {'new-new', 'new-old'},
    est_bp).
    """
    n_hashes = len(MINHASH_A)
    new_sigs = minhash_signatures(new_df, id_col, text_col).withColumn(
        "_src", F.lit("new")
    )
    sigs = new_sigs.unionByName(state_sigs.withColumn("_src", F.lit("old")))

    band_exprs = []
    for b in range(BANDS):
        cols = ", ".join(f"mh{b * ROWS + r}" for r in range(ROWS))
        band_exprs.append(f"{b}, concat_ws('_', {cols})")
    stacked = sigs.select(
        "doc", "_src",
        F.expr(f"stack({BANDS}, {', '.join(band_exprs)}) AS (band_id, key)"),
    )
    cand = (
        stacked.alias("a")
        .join(
            stacked.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc") < F.col("b.doc"))
            & ~((F.col("a._src") == "old") & (F.col("b._src") == "old")),
        )
        .select(
            F.col("a.doc").alias("doc_lo"),
            F.col("b.doc").alias("doc_hi"),
            F.when(
                (F.col("a._src") == "new") & (F.col("b._src") == "new"), "new-new"
            ).otherwise("new-old").alias("pair_origin"),
        )
        .distinct()
    )
    a_side = sigs.select(
        F.col("doc").alias("doc_lo"),
        *[F.col(f"mh{i}").alias(f"a_mh{i}") for i in range(n_hashes)],
    )
    b_side = sigs.select(
        F.col("doc").alias("doc_hi"),
        *[F.col(f"mh{i}").alias(f"b_mh{i}") for i in range(n_hashes)],
    )
    return (
        cand.join(a_side, "doc_lo")
        .join(b_side, "doc_hi")
        .select("doc_lo", "doc_hi", "pair_origin",
                minhash_estimate_bp(n_hashes).cast("long").alias("est_bp"))
    )


# ---------------------------------------------------------------- #
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
# Local Algorithms for Document Fingerprinting", SIGMOD 2003; the
# MOSS algorithm). Position-robust LOCAL fingerprinting: any shared
# token run of >= w + k - 1 tokens is GUARANTEED to share at least
# one fingerprint, while only ~2/(w+1) of gram hashes are kept.
# Complements the other dedup primitives: shingle-Jaccard measures
# whole-document overlap, ExactSubstr finds verbatim runs, winnowing
# detects partial/local overlap (quote insertion, section reuse)
# with a detection guarantee and a bounded fingerprint density.
# ---------------------------------------------------------------- #

WINNOW_K = 4  # token-gram length
WINNOW_W = 4  # winnowing window over consecutive gram hashes

from .constants import CHAR_SEED  # noqa: E402  (shared with poly_hash)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """(doc, fp) — distinct winnowing fingerprints per document.

    Pure codegen, map-side only: token k-grams IN ORDER (not the
    distinct shingle set — winnowing is positional), exact polynomial
    hash per gram, then fp_j = min(h_j..h_{j+w-1}) for every window;
    array_distinct before the explode. Docs shorter than k tokens emit
    nothing; docs with 1..w-1 gram hashes emit their single min (every
    short doc stays representable).

    The gram hash is TOKEN-level (same construction as
    selection.dsir_gram_counts): each token is char-folded ONCE, and
    a k-gram's hash folds the k token hashes — O(k) int ops instead
    of re-folding ~k·token_len chars per gram (every char was being
    hashed k times). Engine-portable exact int64; the oracle replays
    the identical two-level fold.
    """
    toks = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("t"))
    th = (
        f"transform(t, x -> aggregate(split(x, ''), CAST({CHAR_SEED} AS BIGINT), "
        f"(a, c) -> (a * 31 + ascii(c)) % {MOD}))"
    )
    hashes = (
        f"CASE WHEN size(th) >= {k} THEN "
        f"transform(sequence(1, size(th) - {k - 1}), "
        f"i -> aggregate(slice(th, i, {k}), CAST({CHAR_SEED} AS BIGINT), "
        f"(a, h) -> (a * 31 + h) % {MOD})) "
        f"ELSE array() END"
    )
    fps = (
        f"CASE WHEN size(hs) >= {w} THEN "
        f"array_distinct(transform(sequence(1, size(hs) - {w - 1}), "
        f"j -> array_min(slice(hs, j, {w})))) "
        f"WHEN size(hs) >= 1 THEN array(array_min(hs)) "
        f"ELSE array() END"
    )
    return (
        toks.select("doc", F.expr(th).alias("th"))
        .select("doc", F.expr(hashes).alias("hs"))
        .select("doc", F.explode(F.expr(fps)).alias("fp"))
    )


def winnowing_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Near-dup pairs by Jaccard over winnowing-fingerprint sets.

    Same scale shape as :func:`jaccard_pairs` — the blocking equi-join
    key is the fingerprint (already an 8-byte integer), candidates
    exist only for pairs sharing >=1 fingerprint, |A∩B| rides the join
    group count — but the key density is ~2/(w+1) of the shingle
    count, so the shuffle is ~(w+1)/2 x smaller for the same corpus,
    and matches are LOCAL (a shared >= w+k-1-token run suffices, no
    whole-document similarity needed).
    """
    fp = release_then_register(
        "dedup.winnowing_pairs",
        winnow_fingerprints(df, id_col, text_col, k, w).cache(),
    )
    sizes = fp.groupBy("doc").agg(F.count("*").alias("n_fp"))
    inter = (
        fp.alias("a")
        .join(
            fp.alias("b"),
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_lo"), F.col("b.doc").alias("doc_hi"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc": "doc_lo", "n_fp": "n_lo"}), "doc_lo")
        .join(sizes.withColumnsRenamed({"doc": "doc_hi", "n_fp": "n_hi"}), "doc_hi")
        .withColumn(
            "sim",
            F.round(
                F.col("inter") / (F.col("n_lo") + F.col("n_hi") - F.col("inter")), 4
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select("doc_lo", "doc_hi", "sim")
    )


CONTAINMENT_THRESHOLD = 0.5


def containment_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = CONTAINMENT_THRESHOLD,
    n: int = SHINGLE_N,
    hash_shingles: bool = False,
) -> DataFrame:
    """(doc, contained_in, containment) — documents whose shingle set
    is mostly inside some OTHER document's: containment
    C(a→b) = |shingles(a) ∩ shingles(b)| / |shingles(a)| ≥ threshold,
    reporting each contained doc's best container (the onion/quote
    case Jaccard structurally misses: a snippet quoted inside a long
    page has tiny Jaccard — the union is dominated by the page — but
    containment ≈ 1, and it is the SNIPPET that a dedup pass should
    drop; ref dedupe.ts:100-124 handles only the symmetric key case).

    Same blocking discipline as :func:`jaccard_pairs` — a pair exists
    only if it shares ≥1 shingle (candidate equi-join on the shingle
    key, never all-pairs). The metric is asymmetric but the
    INTERSECTION is not: the self-join keeps only a.doc < b.doc (half
    the post-join rows through the heavy first aggregate) and both
    directions are recovered afterwards by unioning the swapped
    per-pair counts — measured ~2× less agg input than joining on
    a.doc != b.doc for the identical result. The per-doc argmax
    compares the raw integer intersection count, NOT the ratio: the
    denominator |shingles(a)| is constant within the group, so
    (inter DESC, container ASC) is the exact containment order with
    no float comparison anywhere — the division happens once, after
    the election (the a4/o4 exact-argmax discipline).

    ``hash_shingles=True`` is the 100 TB path (8-byte xxhash64
    shuffle keys, see :func:`doc_shingles`); output is
    representation-agnostic, so the string-shingle oracle replays it
    bit-for-bit modulo 64-bit collisions (the td2h/td12 contract).
    """
    sh = doc_shingles(df, id_col, text_col, n, hash_shingles=hash_shingles)
    sh = release_then_register("dedup.containment", sh.cache())
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    pair = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("lo"), F.col("b.doc").alias("hi"))
        .agg(F.count("*").alias("inter"))
    )
    # The swapped union references this subtree twice, and under AQE
    # the duplicated agg stages do NOT canonicalize into one reused
    # exchange (measured: 0 ReusedExchange, join+agg executed twice —
    # 11.5 s cold / 4.5 s warm at sf0.1). Persisting the tiny per-pair
    # count frame makes single-execution structural: 4.3 s cold /
    # 3.3 s warm, same output. Registered replannable (cacheutil.
    # persist_replannable): a pinned pre-AQE layout would cost the
    # vanilla gate session 400 near-empty tasks per read — measured
    # 10.3 s vs ~4 s at sf0.01. The pair frame carries no deliberate
    # partitioning, so coalesced reads are safe.
    pair = persist_replannable("dedup.containment.pairs", pair)
    inter = pair.select(
        F.col("lo").alias("doc"), F.col("hi").alias("other"), "inter"
    ).unionByName(
        pair.select(F.col("hi").alias("doc"), F.col("lo").alias("other"), "inter")
    )
    # Argmax via min(struct(-inter, other)): negating INTER (always a
    # BIGINT count) keeps the struct ordering = (inter DESC, other
    # ASC) for ANY orderable id type — negating `other` instead would
    # implicitly cast a string doc id to double and silently null the
    # election (round-9 advisor finding).
    best = inter.groupBy("doc").agg(
        F.min(
            F.struct((-F.col("inter")).alias("ni"), F.col("other"))
        ).alias("m")
    )
    return (
        best.join(sizes, "doc")
        .withColumn("containment", F.round(-F.col("m.ni") / F.col("n_sh"), 4))
        .filter(F.col("containment") >= threshold)
        .select(
            "doc",
            F.col("m.other").alias("contained_in"),
            "containment",
        )
    )
