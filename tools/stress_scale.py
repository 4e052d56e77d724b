"""10× scale stress for the quadratic-risk dedup/ANN family.

The sf0.1 bench cannot distinguish O(N·k) from O(N²) candidate
growth, so this tool builds a deterministic 10× corpus (sf1-
equivalent: ~50k docs / ~20k vectors) from the sf0.1 tables and
measures, for each family query, wall time and output rows at 1× and
10×, plus the BLOCKING-CANDIDATE volume (Σ over buckets of C(n,2) —
the number of pairs the blocking equi-join will emit) for each
candidate generator. Sub-quadratic blocking shows ~10-20× candidate
growth at 10× data; a degenerate blocker shows ~100×.

Corpus construction (documents): 10 copies of the sf0.1 documents;
copy 0 verbatim, copy k>0 appends an alphanumeric token suffix "qk"
to every word. The suffix survives `norm_text` (alnum-only), so
within-copy duplicate/near-dup structure is EXACTLY preserved (both
docs of a pair get the same rewrite) while cross-copy shingle overlap
is destroyed — dup-rate stays constant as N grows, which is how an
organic corpus scales (new crawl slices bring their own dups, not
near-dups of every earlier slice).

Corpus construction (embeddings): 10 copies; copy k permutes the
vector dimensions with numpy.default_rng(k). A permutation preserves
every within-copy cosine exactly and scrambles cross-copy cosines to
background level.

Run:  python tools/stress_scale.py  [base_sf_dir (default sf0.1)]
                                    [query_name ...]
Query names (scoped mode) are only read AFTER the base dir argument;
unknown names abort with the known list ("td21_sized" selects the
√N-geometry IVF-PQ run). Writes nothing to the repo — paste the
printed markdown into SCALING.md. Stress corpus is cached under
/tmp/spark_graft_stress.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
STRESS = "/tmp/spark_graft_stress/x10"
COPIES = 10
OFFSET = 10_000_000


def _write_sql_copies(
    table: str,
    per_copy_select: "callable",
    wrap: str = "{union}",
) -> None:
    """ONE parameterized generator for every SQL-built stress table
    (round-7 verdict item 6 — the per-table UNION ALL rewrites had
    accumulated as copies over rounds 5-7). ``per_copy_select(k)``
    returns copy k's SELECT body against the ``base`` view; the
    per-family scaling axes — which keys are OFFSET (scaled: disjoint
    copies, constant local density) and which are HELD FIXED (the
    hub/skew axis: the same key gets 10× hotter) — live entirely in
    that callable. ``wrap`` post-processes the stacked union
    (``{union}`` placeholder)."""
    import duckdb

    out = os.path.join(STRESS, f"{table}.parquet")
    if os.path.exists(out):
        return
    con = duckdb.connect()
    union = " UNION ALL ".join(per_copy_select(k) for k in range(COPIES))
    con.execute(
        f"CREATE VIEW base AS SELECT * FROM read_parquet('{BASE}/{table}.parquet');"
    )
    con.execute(f"COPY ({wrap.format(union=union)}) TO '{out}' (FORMAT parquet);")
    con.close()


def build_corpus() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(STRESS, exist_ok=True)

    # documents: copy 0 verbatim; copy k>0 suffixes every word with
    # "qk" (survives norm_text) — within-copy dup structure preserved
    # exactly, cross-copy shingle overlap destroyed (scaled axis:
    # doc_id + text identity; nothing held fixed).
    def docs_copy(k: int) -> str:
        text = (
            "text" if k == 0
            else f"regexp_replace(text, '([^ ]+)', '\\1q{k}', 'g')"
        )
        return (
            f"SELECT doc_id + {k * OFFSET} AS doc_id, {text} AS text, "
            "lang, source FROM base"
        )

    _write_sql_copies(
        "documents",
        docs_copy,
        wrap="SELECT doc_id, text, lang, source, "
             "CAST(length(text) AS BIGINT) AS n_chars FROM ({union})",
    )

    # Graph-family corpus (g1-g7): o_orderkey/l_orderkey/o_custkey/
    # l_partkey are OFFSET per copy (10x rows, 10x customers/parts) but
    # l_suppkey is deliberately HELD FIXED: the supplier side of the
    # g1/g6 purchase graph keeps its 1x node set, so every supplier's
    # in-degree grows 10x — the hub/skew axis a plain disjoint-copies
    # corpus would never exercise (the degree-ordered triangle
    # orientation and the per-node aggs must absorb 10x-HOT keys, not
    # just 10x-more keys). The part co-occurrence graph (parts offset)
    # scales as 10 disjoint copies — constant local density, the
    # linear-time claim.
    _write_sql_copies(
        "orders",
        lambda k: f"SELECT * REPLACE (o_orderkey + {k * OFFSET} AS o_orderkey, "
                  f"o_custkey + {k * OFFSET} AS o_custkey) FROM base",
    )
    _write_sql_copies(
        "lineitem",
        lambda k: f"SELECT * REPLACE (l_orderkey + {k * OFFSET} AS l_orderkey, "
                  f"l_partkey + {k * OFFSET} AS l_partkey) FROM base",
    )

    # Remaining tables (round-10 verdict #2: the FULL catalog must
    # sweep at a 10x-equivalent scale, so every table the 181 queries
    # touch needs a deterministic 10x story):
    # - region/nation: verbatim — TPC-H dimensions do not scale; the
    #   fixed nation set means each nation gets 10x customers, the
    #   same held-fixed hub axis as l_suppkey.
    # - supplier: verbatim — matches lineitem's deliberately-fixed
    #   l_suppkey (every supplier 10x hotter, not 10x more suppliers).
    # - customer: c_custkey offset per copy (joins orders' offset
    #   o_custkey 1:1 per copy); c_nationkey held fixed.
    # - part: p_partkey offset per copy (joins lineitem's offset
    #   l_partkey).
    # - events: event_id/user_id offset per copy, ts HELD FIXED — the
    #   time axis does not stretch when volume grows, so every
    #   window/session/funnel absorbs 10x density, the load shape a
    #   10x-busier product actually produces.
    for dim in ("region", "nation", "supplier"):
        _write_sql_copies(dim, lambda k: "SELECT * FROM base WHERE 1 = "
                          + ("1" if k == 0 else "0"))
    _write_sql_copies(
        "customer",
        lambda k: f"SELECT * REPLACE (c_custkey + {k * OFFSET} AS c_custkey) "
                  "FROM base",
    )
    _write_sql_copies(
        "part",
        lambda k: f"SELECT * REPLACE (p_partkey + {k * OFFSET} AS p_partkey) "
                  "FROM base",
    )
    _write_sql_copies(
        "events",
        lambda k: f"SELECT * REPLACE (event_id + {k * OFFSET} AS event_id, "
                  f"user_id + {k * OFFSET} AS user_id) FROM base",
    )

    # embeddings: copy k>0 permutes vector dimensions with rng(k) —
    # within-copy cosines preserved exactly, cross-copy cosines
    # scrambled to background (scaled axis: vec_id; the permutation is
    # the arrow-side analogue of the docs suffix rewrite).
    emb_out = os.path.join(STRESS, "embeddings.parquet")
    if not os.path.exists(emb_out):
        t = pq.read_table(os.path.join(BASE, "embeddings.parquet"))
        vec = np.array(t["embedding"].to_pylist(), dtype=np.float32)
        ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
        labels = np.array(t["label"].to_pylist(), dtype=np.int32)
        parts = []
        for k in range(COPIES):
            perm = np.random.default_rng(k).permutation(vec.shape[1]) if k else None
            v = vec[:, perm] if k else vec
            parts.append(
                pa.table(
                    {
                        "vec_id": pa.array(ids + k * OFFSET, pa.int64()),
                        "embedding": pa.array(v.tolist(), pa.list_(pa.float32())),
                        "label": pa.array(labels, pa.int32()),
                    }
                )
            )
        pq.write_table(pa.concat_tables(parts), emb_out)


def main() -> None:
    if not os.path.isdir(BASE):
        raise SystemExit(
            f"base_sf_dir '{BASE}' is not a directory — the dir comes "
            "FIRST, query-name filters after it"
        )
    build_corpus()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("omfietser-etl-spark-stress")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.codegen.maxFields", "25")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from omfietser_etl_spark.catalog import all_specs
    from omfietser_etl_spark.session import load
    from omfietser_etl_spark.textops import dedup as dd
    from omfietser_etl_spark.textops import similarity as sim
    from omfietser_etl_spark.textops.dedup import BANDS, ROWS

    FAMILY = [
        "td2_ngram_jaccard",
        "td2h_jaccard_hashed",
        "td12_jaccard_guarded",
        "td3_minhash_lsh",
        "td14_substring_dedup",
        "td19_winnowing_pairs",
        "td15_fuzzy_dedup_e2e",
        "td16_rh_lsh_pairs",
        "td13_semantic_dedup",
        "td17_incremental_dedup",
        "dd4_neardup_components",
        # round-6 additions: the de-single-partitioned rank family and
        # BM25 — ts15 (full distributed rank) vs ts16 (sketch cutoff,
        # band-only rank) is the measured claim that the threshold
        # path wins as N grows
        "ts13_token_balanced_shards",
        "ts15_dsir_select",
        "ts16_dsir_threshold",
        "tv4_bm25_topk",
        # round-6 operators: PQ-ADC (linear code scan by construction)
        # and BPE encode (distinct-word segmentation + broadcast join)
        "td20_pq_adc_topk",
        "tk1_bpe_encode",
        # round-6 late additions: composed ANN deployment shapes and
        # the cluster-quota selection (outputs constant by contract —
        # the measured claim is that TIME stays linear in corpus size)
        "td21_ivfpq_topk",
        "td22_pq_rerank",
        "tv5_rrf_fusion",
        "ts17_cluster_prototypes",
        # round-8: incremental k-center (O(N·k) distance folds, map-
        # only rounds) — the measured claim is ~linear time at 10×
        # vectors since each round is one cached-corpus map + top-1
        "ts19_kcenter_coreset",
        # perceptual near-dup (image dHash / audio fingerprint): pair
        # output should scale ~linearly (per-doc planted twins + the
        # within-copy text-dup cliques, both ∝ N)
        "mm7_phash_neardup",
        "mm8_audio_fp_neardup",
        # round-6 second wave: td23 shares td3's candidate generator
        # but scores by signature agreement — the measured claim is
        # the verify-join cost (td3 minus td23 wall) and both linear;
        # ts18 = LM + distributed rank; tv6 = pruned-stream QL.
        "td23_minhash_est_pairs",
        "ts18_perplexity_buckets",
        "tv6_query_likelihood",
        # round-6 third wave: the sparse AllPairs join (df-capped
        # prefix filter — the measured claim is candidates stay
        # sub-quadratic after the cap), per-doc novelty and the
        # source-containment matrix (both bounded-key equi shuffles),
        # and the screens→dedup composition (expected ≈ td15 plus a
        # map-side screen pass)
        "td24_allpairs_cosine",
        "ta15_ngram_novelty",
        "ca2_source_overlap",
        "tp2_screen_dedup_pipeline",
        # round-7: the graph family. g1/g6 run on the purchase graph
        # whose supplier hubs get 10x HOTTER (suppliers unoffset in
        # the stress corpus); g2-g5/g7 run on 10 disjoint copies of
        # the part co-occurrence graph (10x nodes+edges, constant
        # density). Claims under test: degree-ordered orientation's
        # O(m sqrt m) wedge bound (g2), linear per-round joins for the
        # fixed-K loops (g1/g4/g5/g6), and the wedge-stage hub bound
        # after support pruning (g3).
        "g1_pagerank",
        "g2_triangle_count",
        "g3_adamic_adar",
        "g4_kcore",
        "g5_label_propagation",
        "g6_hits",
        "g7_modularity",
        # round-7: fuzzy decontamination — bipartite shingle blocking
        # against the (1/7-of-corpus) eval slice; the measured claim
        # is candidates ∝ N·|eval-overlap|, linear when the corpus
        # grows with its own fresh near-dup structure
        "td25_fuzzy_decontam",
        # td26: zero-shuffle map-side scan vs the broadcast bench
        # matrix — time should be ~linear in corpus rows
        "td26_semantic_decontam",
    ]
    only = {a for a in sys.argv[2:]}
    known = set(FAMILY) | {"td21_sized", "td25_evalaxis", "td27_bench10k"}
    unknown = only - known
    if unknown:
        raise SystemExit(
            f"unknown stress queries {sorted(unknown)}; known: {sorted(known)}"
        )
    if only:
        FAMILY = [n for n in FAMILY if n in only]

    def run_ivfpq_sized(sf_dir: str) -> tuple[float, int]:
        # td21 with the √N centroid rule (similarity.ivf_centroid_mod_for):
        # the gate's fixed mod makes the codebook grow ∝ N and coarse
        # assignment quadratic (N·C·d); sizing C ≈ √N restores linearity.
        from omfietser_etl_spark.catalog.textops import (
            ANN_K, ANN_QUERY_BOUND, EMB_DIM, PQ_KSUB, PQ_M, IVF_PROBES,
        )
        from omfietser_etl_spark.textops.pq import ivfpq_topk

        emb = load(spark, sf_dir, "embeddings")
        mod = sim.ivf_centroid_mod_for(emb.count())
        t0 = time.perf_counter()
        rows = ivfpq_topk(
            emb,
            emb.filter(F.col("vec_id") % mod == 0),
            emb.filter(F.col("vec_id") < ANN_QUERY_BOUND),
            "vec_id", "embedding", ANN_K, EMB_DIM, PQ_M, PQ_KSUB, IVF_PROBES,
        ).count()
        return time.perf_counter() - t0, rows
    specs = {s.name: s for s in all_specs()}

    def run(name: str, sf_dir: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        rows = specs[name].build(spark, sf_dir).count()
        return time.perf_counter() - t0, rows

    def pair_volume(bucketed, key_cols) -> int:
        return (
            bucketed.groupBy(*key_cols)
            .agg(F.count("*").alias("n"))
            .agg(F.sum(F.expr("n * (n - 1) / 2")).cast("long").alias("p"))
            .first()["p"]
            or 0
        )

    def cand_counts(sf_dir: str) -> dict[str, int]:
        docs = load(spark, sf_dir, "documents")
        emb = load(spark, sf_dir, "embeddings")
        out: dict[str, int] = {}
        sh = dd.doc_shingles(docs, "doc_id", "text")
        out["shingle-block (td2)"] = pair_volume(sh, ["s"])
        n_docs = docs.count()
        cap = max(3, -(-n_docs // 100))  # ceil(1% of docs), floor 3
        dfc = sh.groupBy("s").agg(F.count("*").alias("df_cnt"))
        kept = sh.join(dfc.filter(F.col("df_cnt") > cap), "s", "left_anti")
        out["shingle-block guarded (td12)"] = pair_volume(kept, ["s"])
        sig = dd.minhash_signatures(docs, "doc_id", "text")
        band_exprs = []
        for b in range(BANDS):
            cols = ", ".join(f"mh{b * ROWS + r}" for r in range(ROWS))
            band_exprs.append(f"{b}, concat_ws('_', {cols})")
        stacked = sig.select(
            "doc",
            F.expr(f"stack({BANDS}, {', '.join(band_exprs)}) AS (band_id, key)"),
        )
        out["minhash-band (td3/td15/dd4)"] = pair_volume(stacked, ["band_id", "key"])
        grams8 = docs.select(dd.tokens("text").alias("t")).select(
            F.explode(dd.shingles("t", 8)).alias("g")
        )
        out["8-gram-df (td14 proxy)"] = pair_volume(grams8, ["g"])
        wfp = dd.winnow_fingerprints(docs, "doc_id", "text")
        out["winnow-fp (td19)"] = pair_volume(wfp, ["fp"])
        rh = sim.rh_signature_bits(emb, "vec_id", "embedding", 64)
        out["rh-band 4x4 (td16 gate geometry)"] = pair_volume(rh, ["band", "key"])
        rh16 = sim.rh_signature_bits(emb, "vec_id", "embedding", 64, bands=4, rows=16)
        out["rh-band 4x16 (scaled geometry)"] = pair_volume(rh16, ["band", "key"])
        return out

    def run_decontam_eval_axis() -> None:
        """td25's OTHER scaling axis (round-8): corpus HELD at 1x, the
        BENCHMARK grown 10x two ways — 'disjoint' (the stress corpus's
        eval cross-section: fresh suffixed docs, shingles mostly novel)
        and 'hot' (the 1x eval slice replicated verbatim 10x: every
        eval shingle's df grows 10x). The claim under measurement: the
        bipartite candidate volume is Σ_s n_train(s)·n_eval(s) —
        bounded by eval-side df where shingles actually collide, NOT
        by |eval| (disjoint growth ≈ flat candidates; hot growth ≈
        10x candidates, both linear in the colliding df)."""
        from omfietser_etl_spark.textops.decontam import fuzzy_contamination_pairs

        docs1 = load(spark, BASE, "documents")
        corpus = docs1.filter(F.col("doc_id") % 7 != 0)
        ev1 = docs1.filter(F.col("doc_id") % 7 == 0)
        ev_disjoint = load(spark, STRESS, "documents").filter(
            F.col("doc_id") % 7 == 0
        )
        hot_copies = [
            ev1.select(
                (F.col("doc_id") + F.lit(k * OFFSET)).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
            for k in range(COPIES)
        ]
        ev_hot = hot_copies[0]
        for c in hot_copies[1:]:
            ev_hot = ev_hot.unionByName(c)

        # the corpus side is identical across all three eval variants —
        # build its per-shingle counts once (round-8 review item)
        tr = (
            dd.doc_shingles(corpus, "doc_id", "text")
            .groupBy("s").agg(F.count("*").alias("nt"))
            .persist()
        )

        def bipartite_candidates(ev) -> int:
            es = (
                dd.doc_shingles(ev, "doc_id", "text")
                .groupBy("s").agg(F.count("*").alias("ne"))
            )
            return (
                tr.join(es, "s")
                .agg(F.sum(F.col("nt") * F.col("ne")).cast("long").alias("c"))
                .first()["c"] or 0
            )

        print("\n| td25 eval-axis (corpus 1x) | t (s) | rows | bipartite candidates |")
        print("|---|---|---|---|")
        for tag, ev in (("eval 1x", ev1), ("eval 10x disjoint", ev_disjoint),
                        ("eval 10x hot", ev_hot)):
            t0 = time.perf_counter()
            rows = fuzzy_contamination_pairs(
                corpus, ev, "doc_id", "text"
            ).count()
            t = time.perf_counter() - t0
            print(f"| {tag} | {t:.1f} | {rows} | {bipartite_candidates(ev)} |")
        tr.unpersist()

    def run_semantic_bench10k() -> None:
        """td26/td27 at a 10⁴-row BENCHMARK (round-8): corpus = the 10x
        embeddings (20k vectors), benchmark = the 18k copy≥1 vectors
        (disjoint ids; includes the corpus's own copies, so sim=1.0
        self-matches give the recall measurement a real denominator).
        τ = 0.6 clears bipartite_tau_floor(64, 18k) ≈ 0.55. The claim:
        the dense scan is |corpus|·|eval|·d flops by construction; the
        IVF route (C ≈ √|eval| cells, n_probe=2) cuts per-doc flops
        ~(C + 2·|eval|/C)/|eval| ≈ 45x while recall on true (self/
        planted) matches stays high — the documented large-eval-suite
        fallback demonstrated, not claimed."""
        emb10 = load(spark, STRESS, "embeddings")
        bench = emb10.filter(F.col("vec_id") >= OFFSET)
        n_eval = bench.count()
        tau = 0.6
        mod = sim.ivf_centroid_mod_for(n_eval)
        cents = bench.filter(F.col("vec_id") % mod == 0)
        t0 = time.perf_counter()
        dense = sim.bipartite_cosine_pairs(
            emb10, bench, "vec_id", "embedding", tau
        )
        dense_rows = {(r.doc, r.bench) for r in dense.collect()}
        t_dense = time.perf_counter() - t0
        n_cells = cents.count()
        print(f"\n| td26/td27 bench={n_eval} (corpus 20k) | t (s) | pairs | recall |")
        print("|---|---|---|---|")
        print(f"| dense (td26 path) | {t_dense:.1f} | {len(dense_rows)} | 1.000 |")
        # recall-vs-n_probe curve (round-9): users trade recall for
        # wall via decontam_semantic's n_probe; n_probe=C must hit
        # recall 1.000 (≡ dense, the unit-pinned degenerate case).
        for np_ in (1, 2, 4, n_cells):
            t0 = time.perf_counter()
            ivf = sim.bipartite_cosine_pairs_ivf(
                emb10, bench, cents, "vec_id", "embedding", tau, n_probe=np_
            )
            ivf_rows = {(r.doc, r.bench) for r in ivf.collect()}
            t_ivf = time.perf_counter() - t0
            assert ivf_rows <= dense_rows, "IVF emitted a pair dense did not"
            if np_ >= n_cells:
                assert ivf_rows == dense_rows, "n_probe=C must equal dense"
            recall = len(ivf_rows) / max(1, len(dense_rows))
            label = f"n_probe={np_}" + (" (=C)" if np_ >= n_cells else "")
            print(
                f"| IVF C={n_cells} {label} "
                f"| {t_ivf:.1f} | {len(ivf_rows)} | {recall:.3f} |"
            )

    def run_rh_scaled(sf_dir: str) -> tuple[float, int]:
        # td16 with corpus-sized geometry: 16-bit band keys (65536
        # buckets). At tau=0.45 RH recall collapses with long keys
        # (p_bit(63°)=0.65 → 0.65^16 per band), so this measures the
        # CANDIDATE/time scaling of the sized key space; the moderate-
        # tau recall path at scale is td13's centroid blocking.
        emb = load(spark, sf_dir, "embeddings")
        t0 = time.perf_counter()
        rows = sim.rh_neardup_pairs(
            emb, "vec_id", "embedding", 0.45, 64,
            bands=4, rows=16, on_subnoise="warn",
        ).count()
        return time.perf_counter() - t0, rows

    # one discarded warm-up lap (first selected query at 1x): the very
    # first action pays JVM/codegen/parquet-footer warm-up that would
    # otherwise inflate t_1x of the first row and deflate its ratio.
    if FAMILY:
        run(FAMILY[0], BASE)

    print(f"# stress: {BASE} (1x) vs {STRESS} (10x)\n")
    print("| query | t_1x (s) | t_10x (s) | t ratio | rows_1x | rows_10x | rows ratio |")
    print("|---|---|---|---|---|---|---|")
    for name in FAMILY:
        t1, r1 = run(name, BASE)
        t10, r10 = run(name, STRESS)
        print(
            f"| {name} | {t1:.1f} | {t10:.1f} | {t10 / t1:.1f}x "
            f"| {r1} | {r10} | {r10 / max(1, r1):.1f}x |"
        )
    if not only or "td21_sized" in only:
        t1, r1 = run_ivfpq_sized(BASE)
        t10, r10 = run_ivfpq_sized(STRESS)
        print(
            f"| td21 sized (mod=√N) | {t1:.1f} | {t10:.1f} | {t10 / t1:.1f}x "
            f"| {r1} | {r10} | {r10 / max(1, r1):.1f}x |"
        )
    if not only or "td25_evalaxis" in only:
        run_decontam_eval_axis()
    if not only or "td27_bench10k" in only:
        run_semantic_bench10k()

    if not only:
        t1, r1 = run_rh_scaled(BASE)
        t10, r10 = run_rh_scaled(STRESS)
        print(
            f"| td16 scaled (rows=16, tau=.7) | {t1:.1f} | {t10:.1f} | {t10 / t1:.1f}x "
            f"| {r1} | {r10} | {r10 / max(1, r1):.1f}x |"
        )

        c1 = cand_counts(BASE)
        c10 = cand_counts(STRESS)
        print("\n| blocking candidates (Σ C(bucket,2)) | 1x | 10x | ratio |")
        print("|---|---|---|---|")
        for k in c1:
            print(f"| {k} | {c1[k]} | {c10[k]} | {c10[k] / max(1, c1[k]):.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
