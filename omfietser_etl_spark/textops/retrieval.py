"""BM25 ranked retrieval over the corpus — the keyword-search
primitive a training-data pipeline uses for targeted slicing (pull
documents about X), eval-set curation, and retrieval-augmented
filtering. Robertson/Spärck Jones BM25 in the Lucene formulation
(public: Robertson et al. TREC-3; Lucene's BM25Similarity docs):

    score(D, Q) = Σ_{t∈Q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5))        [always > 0]

EXACTNESS (the oracle story, same discipline as x8/ts15): floats
from ln() are the cross-engine parity hazard, so the whole score is
fixed-point integer:

- idf_q(t) = ilog2_q(2N+2) − ilog2_q(2df+1)  — exact integer log2
  (selection.ilog2_q square-and-compare; note
  1 + (N−df+½)/(df+½) = (2N+2)/(2df+1), both positive ints), and the
  Lucene 1+ keeps idf_q ≥ 0, so integer division below never sees a
  negative numerator (Spark `div` truncates toward zero, DuckDB `//`
  floors — they only agree on non-negatives).
- dl/avgdl is quantized per-mille: r = (1000·dl·N) div T with
  T = total corpus tokens. With k1 = 6/5, b = 3/4 the term
  contribution becomes the exact integer
      (idf_q · 22000 · tf · S) div (10000·tf + 3000 + 9·r),  S = 2^10
  and the doc score is the exact int64 sum over query terms.
  Magnitudes: idf_q < 64·2^20, tf ≤ dl, so the numerator stays well
  inside int64 for any realistic tf.

Scale shape (100 TB posture):
- one corpus agg for (N, T) rides the SAME bounded collect as the
  per-query-term document frequencies (|Q|+1 rows — the ts15 λ-fit
  sentinel pattern, no extra job);
- idf table is computed driver-side from those |Q| integers and
  broadcast back (KBs);
- tf is a map-side explode FILTERED to the query terms before any
  shuffle (a |Q|-term IN-list prunes the token stream to ~|Q|/vocab
  of its volume), then one (doc, term) agg;
- top-k is orderBy+limit (TakeOrdered — never a global sort
  materialization); the rank column is a window over the k-row
  result only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .analysis import tokens
from .selection import ilog2_q

BM25_S = 1024  # fixed-point scale of the per-term contribution


def _staged_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    scope: str,
):
    """The shared scoring substrate of :func:`bm25_topk` and
    :func:`query_likelihood_topk` (round 12, guide §1.2/§2.3): ONE
    pass that tokenizes the corpus, prunes the token stream to the
    query terms map-side, and persists the (doc, dl, term, tf) frame;
    per-term document frequency (= tf rows per term, since dl is a
    function of doc) and corpus frequency (= Σtf) then ride one
    bounded collect with the corpus (N, T) sentinel row. Before, each
    retriever tokenized the corpus once for its stats subtree, once
    for the (N, T) sentinel subtree and once again for its tf pass;
    tv7 ran both retrievers = six tokenize passes of the corpus.
    Returns (tf, n_docs, t_tokens, df_by_term, cf_by_term)."""
    from ..cacheutil import persist_replannable

    toks = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("t"))
    base = toks.select("doc", F.size("t").cast("long").alias("dl"), "t")
    hits = base.select(
        "doc", "dl", F.explode("t").alias("term")
    ).filter(F.col("term").isin(list(query_terms)))
    tf = persist_replannable(
        scope, hits.groupBy("doc", "dl", "term").agg(F.count("*").alias("tf"))
    )
    stats = tf.groupBy("term").agg(
        F.count("*").alias("dfd"), F.sum("tf").alias("cf")
    )
    sentinel = base.agg(
        F.count("*").alias("dfd"), F.sum("dl").alias("cf")
    ).select(F.lit(None).cast("string").alias("term"), "dfd", "cf")
    rows = stats.unionByName(sentinel).collect()
    n_docs = t_tokens = 0
    df_by_term: dict[str, int] = {}
    cf_by_term: dict[str, int] = {}
    for r in rows:
        if r.term is None:
            n_docs, t_tokens = int(r.dfd or 0), int(r.cf or 0)
        else:
            df_by_term[r.term] = int(r.dfd)
            cf_by_term[r.term] = int(r.cf)
    return tf, n_docs, t_tokens, df_by_term, cf_by_term


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    top_k: int = 20,
    _staged=None,
) -> DataFrame:
    """(doc, score_q, rank): the ``top_k`` documents by exact
    fixed-point BM25 against ``query_terms`` (docs matching no query
    term never rank). Deterministic tie-break by doc id.
    ``_staged`` lets a caller that runs several retrievers over the
    same corpus (tv7) share one :func:`_staged_terms` substrate."""
    tf, n_docs, t_tokens, df_by_term, _cf = _staged or _staged_terms(
        df, id_col, text_col, query_terms, "retrieval.bm25"
    )
    if n_docs == 0 or t_tokens == 0 or not df_by_term:
        spark = df.sparkSession
        return spark.createDataFrame([], "doc long, score_q long, rank long")

    base_il = ilog2_q(2 * n_docs + 2)
    idf = [(t, base_il - ilog2_q(2 * d + 1)) for t, d in df_by_term.items()]
    idf_df = F.broadcast(
        df.sparkSession.createDataFrame(idf, "term string, idf_q long")
    )

    scored = (
        tf.join(idf_df, "term")
        .withColumn("r", F.expr(f"(1000 * dl * {n_docs}) div {t_tokens}"))
        .withColumn(
            "contrib",
            F.expr(
                f"(idf_q * 22000 * tf * {BM25_S}) div "
                "(10000 * tf + 3000 + 9 * r)"
            ),
        )
        .groupBy("doc")
        .agg(F.sum("contrib").cast("long").alias("score_q"))
        .orderBy(F.col("score_q").desc(), F.col("doc"))
        .limit(top_k)
    )
    # rank over the k-row result only (bounded single-partition window
    # — the o7 top-k convention, never the corpus)
    w = Window.orderBy(F.col("score_q").desc(), F.col("doc"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long"))


#: RRF constants. k=60 is the canonical damping constant from the RRF
#: paper; the fixed-point scale makes every contribution an exact
#: integer (1e6 div (60+rank)) so fused scores are engine-portable —
#: float 1/(k+r) sums would re-order under different summation orders.
RRF_K = 60
RRF_SCALE = 1_000_000


def rrf_fuse(
    lists: list[DataFrame],
    id_col: str = "doc",
    rank_col: str = "rank",
    k_rrf: int = RRF_K,
    top_k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked retrieval lists (Cormack,
    Clarke & Buettcher, SIGIR 2009): the standard hybrid-retrieval
    combiner — fuse a lexical (BM25) and a dense (embedding) list
    without score calibration, since only RANKS enter the formula:

        rrf(d) = Σ_lists floor(SCALE / (k + rank_list(d)))

    Output: (doc, rrf_q, n_lists, rank) — top_k by fused score,
    ties by doc id; n_lists = how many input lists ranked the doc.

    Scale shape: each input list is already a bounded top-k frame
    (the expensive corpus work happened upstream); fusion is a
    union + one groupBy over Σ|lists| ≤ L·k rows, then the o7
    TakeOrdered top-k. Per-query fusion at scale is the same plan
    with the query id prepended to every key.
    """
    if not lists:
        raise ValueError("rrf_fuse: at least one ranked list is required")
    u = None
    for df in lists:
        part = df.select(
            F.col(id_col).alias("doc"),
            F.col(rank_col).cast("long").alias("r"),
        )
        u = part if u is None else u.unionByName(part)
    top = (
        u.withColumn("c", F.expr(f"{RRF_SCALE} div ({k_rrf} + r)"))
        .groupBy("doc")
        .agg(
            F.sum("c").cast("long").alias("rrf_q"),
            F.count("*").cast("long").alias("n_lists"),
        )
        .orderBy(F.col("rrf_q").desc(), F.col("doc"))
        .limit(top_k)
    )
    w = Window.orderBy(F.col("rrf_q").desc(), F.col("doc"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "doc", "rrf_q", "n_lists", "rank"
    )


#: Dirichlet pseudo-count for query-likelihood smoothing (μ). 200 is
#: inside the 100–2000 range Zhai & Lafferty found robust; an integer
#: so every smoothed count stays integral under the fixed-point logs.
QL_MU = 200


def query_likelihood_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    top_k: int = 20,
    mu: int = QL_MU,
    _staged=None,
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    2001, "A Study of Smoothing Methods for Language Models Applied
    to Ad Hoc Information Retrieval" — public) — the language-model
    complement to BM25 (:func:`bm25_topk`):

        score(D, Q) = Σ_{t∈Q} log[ (tf(t,D) + μ·cf(t)/T) / (dl + μ) ]

    with cf(t) the corpus frequency and T total corpus tokens.
    Multiplying through by T makes every log argument a positive
    integer, and the whole score decomposes as

        score_q(D) = Σ_{t∈Q∩D} [il(tf·T + μ·cf_t) − il(μ·cf_t)]
                   + Σ_{t∈Q} il(μ·cf_t)  −  |Q|·il(T·(dl+μ))

    where il = ilog2_q — so the score is an exact int64 (possibly
    negative: it is a log-probability), bit-identical across engines.
    Query terms absent from the corpus (cf = 0) would contribute
    log 0 to EVERY document equally and are dropped, the standard QL
    convention; only documents matching ≥ 1 surviving term rank.

    Scale shape (the bm25_topk discipline):
    - the token stream is pruned to query terms map-side BEFORE any
      shuffle; one (doc, term) agg for tf (shared with bm25 via
      :func:`_staged_terms` when the caller passes ``_staged``);
    - cf + corpus (N, T) ride ONE bounded collect (|Q|+1 rows,
      sentinel row — no separate count job); the |Q| background logs
      il(μ·cf_t) are computed driver-side and broadcast;
    - the per-row logs il(tf·T + μ·cf) and il(T·(dl+μ)) run through
      :func:`ilog2_q_expr` — the engine-side integer-log primitive —
      so scoring needs NO distinct-value collect at any corpus size;
    - top-k is orderBy+limit (TakeOrdered), rank over the k rows only.
    """
    from .selection import ilog2_q, ilog2_q_expr

    spark = df.sparkSession
    tf, _n_docs, t_tokens, _dfd, cf_by_term = _staged or _staged_terms(
        df, id_col, text_col, query_terms, "retrieval.ql"
    )
    if t_tokens == 0 or not cf_by_term:
        return spark.createDataFrame([], "doc long, score_q long, rank long")

    b_const = sum(ilog2_q(mu * c) for c in cf_by_term.values())
    n_q = len(cf_by_term)
    cf_df = F.broadcast(
        spark.createDataFrame(
            [(t, c, ilog2_q(mu * c)) for t, c in cf_by_term.items()],
            "term string, cf long, il_mu_cf long",
        )
    )

    corr = (
        tf.join(cf_df, "term")
        .withColumn("il_num", F.expr(ilog2_q_expr(f"tf * {t_tokens} + {mu} * cf")))
        .groupBy("doc", "dl")
        .agg(F.sum(F.col("il_num") - F.col("il_mu_cf")).alias("corr"))
    )
    scored = (
        corr.withColumn("il_den", F.expr(ilog2_q_expr(f"{t_tokens} * (dl + {mu})")))
        .select(
            "doc",
            (F.col("corr") + F.lit(b_const) - F.lit(n_q) * F.col("il_den"))
            .cast("long")
            .alias("score_q"),
        )
        .orderBy(F.col("score_q").desc(), F.col("doc"))
        .limit(top_k)
    )
    w = Window.orderBy(F.col("score_q").desc(), F.col("doc"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long"))


#: nDCG fixed-point gain scale: contributions are
#: (rel · NDCG_G) div ilog2_q(rank+1) ≈ rel · 1e6 / log2(rank+1).
NDCG_G = 1_000_000 << 20  # SCALE · 2^DSIR_Q (cancels ilog2_q's 2^Q)


def ndcg_eval(
    ranked_lists: dict[str, DataFrame],
    rel: DataFrame,
    top_k: int = 20,
) -> DataFrame:
    """Exact fixed-point nDCG@k over named ranked lists (Järvelin &
    Kekäläinen 2002) — the retrieval-evaluation primitive that closes
    the loop on tv4/tv6: given graded relevance per doc, score each
    system by

        DCG@k  = Σ_{r≤k} rel_r · G div ilog2_q(r+1)
        IDCG@k = the same sum over the corpus-wide top-k relevance
        nDCG   = (10000 · DCG) div IDCG      [basis points]

    — every term integer (G cancels ilog2_q's 2^Q scale), so both
    engines replay the scores bit-for-bit; no float logs. Output one
    row per system: (system, dcg_q, idcg_q, ndcg_bp), system-ordered.

    Scale shape: ranked lists are already bounded k-row frames; the
    only corpus-sized work is the relevance scan feeding IDCG's
    top-k (TakeOrdered — never a global sort; the DCG sum is
    invariant to tie order among equal relevance values, so the
    orderBy tiebreak only pins WHICH boundary doc enters, not the
    score). The per-rank log runs through ilog2_q_expr engine-side.

    ``rel`` must be a (doc, rel) frame with non-negative integer
    grades.
    """
    from .selection import ilog2_q_expr

    gain = f"(rel * {NDCG_G}) div ({ilog2_q_expr('rank + 1')})"
    u = None
    for sys_name, df in sorted(ranked_lists.items()):
        part = df.select(
            F.lit(sys_name).alias("system"), F.col("doc"),
            F.col("rank").cast("long").alias("rank"),
        )
        u = part if u is None else u.unionByName(part)
    dcg = (
        u.join(rel, "doc")
        .select("system", F.expr(gain).alias("g"))
        .groupBy("system")
        .agg(F.sum("g").cast("long").alias("dcg_q"))
    )
    ideal = (
        rel.orderBy(F.col("rel").desc(), F.col("doc"))
        .limit(top_k)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("rel").desc(), F.col("doc"))),
        )
    )
    idcg = ideal.agg(
        F.sum(F.expr(gain)).cast("long").alias("idcg_q")
    )
    return (
        dcg.crossJoin(idcg)
        .select(
            "system", "dcg_q", "idcg_q",
            F.expr("(10000 * dcg_q) div idcg_q").cast("long").alias("ndcg_bp"),
        )
        .orderBy("system")
    )
