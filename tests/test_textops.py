"""Semantics tests for the training-data text operators, on tiny
inline frames (the sf* parity tests cover the full pipelines)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omfietser_etl_spark.session import load
from omfietser_etl_spark.textops import dedup as dd
from omfietser_etl_spark.textops import similarity as sim
from omfietser_etl_spark.textops.analysis import lang_id, poly_hash, tokens
from omfietser_etl_spark.textops.constants import CHAR_SEED, MOD

from .conftest import SF_SMOKE


def test_poly_hash_matches_python(spark):
    df = spark.createDataFrame([("abc",), ("hello world",)], ["s"])
    got = {r.s: r.h for r in df.select("s", poly_hash("s").alias("h")).collect()}

    def ref(s: str) -> int:
        a = CHAR_SEED
        for c in s:
            a = (a * 31 + ord(c)) % MOD
        return a

    assert got == {"abc": ref("abc"), "hello world": ref("hello world")}


def test_exact_dedup_keeps_first(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello world"), (3, "other text")],
        ["doc_id", "text"],
    )
    out = {
        r.norm_key: (r.n_docs, r.keep_doc)
        for r in dd.exact_dedup_stats(df, "doc_id", "text").collect()
    }
    assert out == {"hello world": (2, 1), "other text": (1, 3)}


def test_jaccard_pairs_identical_docs(spark):
    text = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "completely different words here entirely now")],
        ["doc_id", "text"],
    )
    rows = dd.jaccard_pairs(df, "doc_id", "text", threshold=0.8).collect()
    assert [(r.doc_lo, r.doc_hi, r.jaccard) for r in rows] == [(1, 2, 1.0)]


def test_jaccard_df_guard_bounds_candidates(spark):
    """Stopword-heavy corpus: every doc shares one boilerplate shingle
    ('click here to subscribe ...' banner), so the unguarded blocking
    join degenerates to all-pairs O(N²). With the DF guard the hot
    shingles drop before the self-join and only the genuinely similar
    pair survives."""
    banner = "click here to subscribe now"
    docs = [(i, f"{banner} unique payload number {i} entirely") for i in range(20)]
    # one real near-dup pair sharing distinctive content
    docs.append((100, "rare marmot sighting in alpine meadow today"))
    docs.append((101, "rare marmot sighting in alpine meadow today"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    # Unguarded: the banner shingles block every doc with every other
    # doc — candidate blow-up (the pre-threshold join is ~all-pairs).
    sh = dd.doc_shingles(df, "doc_id", "text")
    unguarded_cands = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .select("a.doc", "b.doc")
        .distinct()
        .count()
    )
    assert unguarded_cands == 191  # all 20*19/2 banner pairs + the real one

    # Guarded: banner shingles exceed max(3, ceil(20% of 22 docs)) = 5
    # docs and are dropped; candidates collapse to the real pair.
    guarded = dd.jaccard_pairs(
        df, "doc_id", "text", threshold=0.8, max_df_frac=0.2, min_df_cap=3
    )
    rows = guarded.collect()
    assert [(r.doc_lo, r.doc_hi, r.jaccard) for r in rows] == [(100, 101, 1.0)]


def test_repeated_dedup_runs_do_not_accumulate_cache(spark):
    """Regression for the persisted-intermediate leak: back-to-back
    pair-producer invocations (the catalog gate's shape) must not
    stack cached shingle tables — each call releases the previous
    one's frames via the cacheutil registry."""
    df = spark.createDataFrame(
        [(i, f"some shared words plus unique token {i} here") for i in range(12)],
        ["doc_id", "text"],
    )
    baseline = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    for _ in range(4):
        dd.jaccard_pairs(df, "doc_id", "text").count()
        dd.minhash_lsh_pairs(df, "doc_id", "text").count()
    live = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    # at most the LAST invocation of each producer may still hold its
    # cache; 4 rounds x 2 producers would leave 8+ without the fix.
    # Delta vs baseline: other tests in the shared session may hold
    # their own registered caches — those are not this test's leak.
    assert len(live) - baseline <= 2, [str(x) for x in live]


def test_substring_dedup_cuts_cross_doc_runs(spark):
    shared = "a b c d e f g h"  # exactly k=8 tokens
    df = spark.createDataFrame(
        [
            (1, f"intro one {shared} tail one"),
            (2, f"other words {shared} differing end"),
            (3, "totally unique content with no duplicated run at all"),
            (4, "tiny doc"),  # shorter than k — no grams, must survive
        ],
        ["doc_id", "text"],
    )
    out = {r.doc: r for r in dd.substring_dedup(df, "doc_id", "text", k=8).collect()}
    assert out[1].clean_text == "intro one tail one"
    assert (out[1].dup_token_cnt, out[1].dup_span_cnt) == (8, 1)
    assert out[2].clean_text == "other words differing end"
    assert out[3].clean_text == "totally unique content with no duplicated run at all"
    assert out[3].dup_token_cnt == 0 and out[3].dup_span_cnt == 0
    assert out[4].clean_text == "tiny doc" and out[4].n_tokens == 2


def test_substring_dedup_hashed_gram_path_is_equivalent(spark):
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    plain = dd.substring_dedup(docs, "doc_id", "text", k=5).collect()
    hashed = dd.substring_dedup(docs, "doc_id", "text", k=5, hash_grams=True).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, hashed))


def test_minhash_lsh_finds_identical_docs(spark):
    text = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    rows = dd.minhash_lsh_pairs(df, "doc_id", "text").collect()
    assert [(r.doc_lo, r.doc_hi, r.jaccard) for r in rows] == [(1, 2, 1.0)]


def test_simhash_identical_docs_equal(spark):
    df = spark.createDataFrame(
        [(1, "spark scale shuffle"), (2, "spark scale shuffle"), (3, "zzz yyy xxx")],
        ["doc_id", "text"],
    )
    out = {r.doc: r.simhash for r in dd.simhash(df, "doc_id", "text").collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert 0 <= out[1] < (1 << 32)


def test_brute_topk_orders_by_cosine(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [0.7, 0.7]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = sim.brute_topk(df, df.filter(F.col("vec_id") == 0), "vec_id", "embedding", 3).collect()
    assert [r.nid for r in sorted(out, key=lambda r: r.rank)] == [1, 3, 2]


def test_lang_id_stopword_heuristic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog in a house"),
            (2, "der hund und die katze ist nicht da"),
            (3, "qwerty zxcvb asdfgh"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.pred
        for r in df.withColumn("t", tokens("text"))
        .select("doc_id", lang_id("text", "t").alias("pred"))
        .collect()
    }
    assert out == {1: "en", 2: "de", 3: "und"}


def test_drop_incomplete_f5(spark):
    rows = [
        ("a", "AH", "Cola", 1.0),     # complete
        ("", "AH", "Cola", 1.0),      # empty id -> drop
        ("b", "AH", None, 1.0),       # null title -> drop
        ("c", "AH", "Thee", None),    # undefined price -> drop
        ("d", "AH", "Sap", 0.0),      # 0.0 price is defined -> keep
    ]
    df = spark.createDataFrame(
        rows, "unified_id string, shop_type string, title string, current_price double"
    )
    kept = sorted(r.unified_id for r in dd.drop_incomplete(df).collect())
    assert kept == ["a", "d"]


def test_rename_columns_p8(spark):
    from omfietser_etl_spark.functions.text import (
        camel_to_snake,
        rename_columns,
        snake_to_camel,
    )

    df = spark.createDataFrame([(1, "x")], ["priceBeforeBonus", "mainCategory"])
    out = rename_columns(df, camel_to_snake)
    assert out.columns == ["price_before_bonus", "main_category"]
    back = rename_columns(out, snake_to_camel)
    assert back.columns == ["priceBeforeBonus", "mainCategory"]


def test_chunk_documents_windows_and_overlap(spark):
    from omfietser_etl_spark.textops.chunking import chunk_documents

    text_65 = " ".join(f"w{i}" for i in range(65))
    df = spark.createDataFrame(
        [(1, text_65), (2, "short doc"), (3, "")], ["doc_id", "text"]
    )
    out = {(r.doc, r.chunk_id): (r.n_chunk_tokens, r.chunk_text)
           for r in chunk_documents(df).collect()}
    # 65 tokens, window 64, step 48 → chunks at 0 (64 tokens) and 48 (17)
    assert out[(1, 0)][0] == 64 and out[(1, 0)][1].startswith("w0 ")
    assert out[(1, 1)][0] == 17 and out[(1, 1)][1].startswith("w48 ")
    # overlap: tokens 48..63 are in both chunks
    assert "w50" in out[(1, 0)][1] and "w50" in out[(1, 1)][1]
    assert out[(2, 0)] == (2, "short doc")
    assert out[(3, 0)] == (0, "")  # empty doc → one empty chunk
    assert len(out) == 4


def test_scrub_pii_redacts_and_counts(spark):
    from omfietser_etl_spark.textops.chunking import scrub_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-y.example.com, call +31 6 1234 5678, host 192.168.1.1"),
         (2, "nothing here")],
        ["doc_id", "text"],
    )
    rows = {r.doc: r for r in scrub_pii(df).collect()}
    assert (rows[1].n_emails, rows[1].n_phones, rows[1].n_ips) == (1, 1, 1)
    s = rows[1].scrubbed_text
    assert "<EMAIL>" in s and "<PHONE>" in s and "<IP>" in s
    assert "example.com" not in s and "192.168" not in s
    assert rows[2].scrubbed_text == "nothing here"


def test_connected_components_transitive(spark):
    from omfietser_etl_spark.textops.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (4, 3)], ["doc_lo", "doc_hi"]
    )
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    # {1,2,3,4} collapse via chains; {7,9} separate
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 9: 7}


def test_jaccard_hashed_shingle_path_is_equivalent(spark):
    """hash_shingles=True shuffles 8-byte xxhash64 keys instead of
    n-token strings; output pairs must be identical (collisions need
    ~2^32 distinct shingles)."""
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    plain = dd.jaccard_pairs(docs, "doc_id", "text", threshold=0.2).collect()
    hashed = dd.jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, hash_shingles=True
    ).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, hashed))
    # the guard path hashes the same keys it counts/drops
    g_plain = dd.jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, max_df_frac=0.3
    ).collect()
    g_hashed = dd.jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, max_df_frac=0.3, hash_shingles=True
    ).collect()
    assert sorted(map(tuple, g_plain)) == sorted(map(tuple, g_hashed))


def test_minhash_lsh_hashed_shingle_path_is_equivalent(spark):
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    plain = dd.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.2).collect()
    hashed = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.2, hash_shingles=True
    ).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, hashed))


def test_connected_components_star_long_chain_and_equivalence(spark):
    """The star variant's raison d'etre: a diameter-200 path graph
    collapses to one component in O(log) alternations (plain label
    propagation needs 200 rounds — past its default max_iter). On
    ordinary multi-component graphs both algorithms agree exactly."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], ["doc_lo", "doc_hi"]
    )
    star = dd.connected_components_star(chain).collect()
    assert len(star) == 201
    assert {r.component for r in star} == {0}

    # mixed graph: two chains, a triangle, an isolated pair
    edges = (
        [(i, i + 1) for i in range(10, 15)]
        + [(i, i + 1) for i in range(30, 33)]
        + [(50, 51), (51, 52), (50, 52)]
        + [(70, 71)]
    )
    pairs = spark.createDataFrame(edges, ["doc_lo", "doc_hi"])
    a = sorted(map(tuple, dd.connected_components(pairs).collect()))
    b = sorted(map(tuple, dd.connected_components_star(pairs).collect()))
    assert a == b


def test_bigram_fluency_ranks_predictable_text_above_gibberish(spark):
    """The corpus-model fluency screen: a document made of the
    corpus's dominant pattern scores near 10000 bp; one gluing the
    same tokens in never-repeated orders scores low; short docs score
    (0, 0)."""
    from omfietser_etl_spark.textops.analysis import bigram_fluency

    common = "the cat sat on the mat"
    df = spark.createDataFrame(
        [(i, common) for i in range(8)]
        + [(100, "mat the on sat cat on mat sat")]  # same vocab, rare bigrams
        + [(200, "word")],  # single token → no bigrams
        ["doc_id", "text"],
    )
    out = {r.doc: r for r in bigram_fluency(df, "doc_id", "text").collect()}
    assert out[0].fluency_bp == out[7].fluency_bp  # deterministic
    assert out[0].fluency_bp > out[100].fluency_bp
    assert out[0].fluency_bp > 5000
    assert (out[200].n_bigrams, out[200].fluency_bp) == (0, 0)


def test_incremental_lsh_pairs_excludes_old_old_and_estimates(spark):
    """Batch-vs-state dedup: identical text across the boundary is a
    'new-old' pair at est 10000 bp; identical docs inside the batch
    are 'new-new'; identical docs wholly inside the STATE never
    surface (their batches already found them)."""
    text_a = "one two three four five six seven eight nine ten"
    text_b = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    state = spark.createDataFrame(
        [(10, text_a), (20, text_b), (21, text_b)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [(1, text_a), (2, text_a), (3, "unrelated words only here present")],
        ["doc_id", "text"],
    )
    state_sigs = dd.minhash_signatures(state, "doc_id", "text")
    pairs = {
        (r.doc_lo, r.doc_hi): (r.pair_origin, r.est_bp)
        for r in dd.incremental_lsh_pairs(batch, state_sigs, "doc_id", "text").collect()
    }
    assert pairs[(1, 2)] == ("new-new", 10000)
    assert pairs[(1, 10)] == ("new-old", 10000)
    assert pairs[(2, 10)] == ("new-old", 10000)
    assert (20, 21) not in pairs  # old×old excluded by construction
    assert not any(3 in p for p in pairs)  # dissimilar doc pairs with nothing


def test_cc_checkpoint_blocks_released(spark):
    """Superseded localCheckpoint rounds must not retain blocks: a
    long chain forces >=2 checkpoints (CC_CHECKPOINT_EVERY=8), and
    after the next invocation releases the scope, the persistent-RDD
    census returns to its baseline (round-4 advisor finding:
    DataFrame.unpersist() is a no-op for localCheckpointed plans)."""
    from omfietser_etl_spark import cacheutil
    from omfietser_etl_spark.textops import dedup as dd

    sc = spark.sparkContext
    baseline = cacheutil.persistent_rdd_ids(sc)

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40, 60)], "doc_lo long, doc_hi long"
    )
    got = {r.node: r.component for r in dd.connected_components(chain).collect()}
    assert set(got.values()) == {40}  # one component rooted at the min
    # a fresh tiny invocation releases the previous scope's frames
    tiny = spark.createDataFrame([(1, 2)], "doc_lo long, doc_hi long")
    dd.connected_components(tiny).collect()
    cacheutil.release("dedup.connected_components")
    leftover = cacheutil.persistent_rdd_ids(sc) - baseline
    assert leftover == set(), f"leaked persisted RDDs: {leftover}"

    # same story for the star variant
    baseline = cacheutil.persistent_rdd_ids(sc)
    dd.connected_components_star(chain).collect()
    dd.connected_components_star(tiny).collect()
    cacheutil.release("dedup.connected_components_star")
    leftover = cacheutil.persistent_rdd_ids(sc) - baseline
    assert leftover == set(), f"leaked persisted RDDs: {leftover}"


def test_cc_restores_shuffle_conf(spark, monkeypatch):
    """Both CC loops clamp session-global spark.sql.shuffle.partitions
    for the loop's duration (scale-adaptive layout, round 12) — the
    round-12 ADVICE requires the restore pinned, INCLUDING when the
    loop body raises mid-flight, and the sizing frame must not leak
    its persisted blocks on that path (unpersist-in-finally)."""
    import pytest

    from omfietser_etl_spark import cacheutil

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "doc_lo long, doc_hi long"
    )
    dd.connected_components(pairs).collect()
    assert spark.conf.get(key) == prev
    dd.connected_components_star(pairs).collect()
    assert spark.conf.get(key) == prev

    # failure path: the in-try checkpoint raises → conf restored, the
    # sizing frame's blocks freed (plus eager scope registration: the
    # next release() leaves no persisted-RDD residue).
    cacheutil.release("dedup.connected_components")
    baseline = cacheutil.persistent_rdd_ids(spark.sparkContext)

    def boom(df):
        raise RuntimeError("boom")

    monkeypatch.setattr(cacheutil, "tracked_loop_checkpoint", boom)
    with pytest.raises(RuntimeError, match="boom"):
        dd.connected_components(pairs)
    assert spark.conf.get(key) == prev
    cacheutil.release("dedup.connected_components")
    leftover = cacheutil.persistent_rdd_ids(spark.sparkContext) - baseline
    assert leftover == set(), f"leaked persisted RDDs: {leftover}"


def test_cc_reliable_checkpoint_parity(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_RELIABLE_CKPT_DIR switches every loop checkpoint to
    a reliable ``checkpoint()`` (cluster posture: executor loss must
    be survivable — round-12 verdict item 4). Components must be
    bit-identical in both modes, on a chain long enough that the
    plain loop's in-loop round checkpoints fire too."""
    edges = (
        [(i, i + 1) for i in range(40, 60)]  # diameter 20 → round ckpts
        + [(1, 2), (2, 3), (99, 100)]
    )
    pairs = spark.createDataFrame(edges, "doc_lo long, doc_hi long")
    base_plain = sorted(map(tuple, dd.connected_components(pairs).collect()))
    base_star = sorted(map(tuple, dd.connected_components_star(pairs).collect()))

    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CKPT_DIR", str(tmp_path / "ck"))
    rel_plain = sorted(map(tuple, dd.connected_components(pairs).collect()))
    rel_star = sorted(map(tuple, dd.connected_components_star(pairs).collect()))
    assert rel_plain == base_plain
    assert rel_star == base_star


def test_winnowing_guarantee_and_density(spark):
    """Winnowing contract (Schleimer et al. 2003): two documents
    sharing a token run of >= w+k-1 tokens share >= 1 fingerprint, and
    fingerprint density is well below the gram count (~2/(w+1))."""
    from omfietser_etl_spark.textops.dedup import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
        winnowing_pairs,
    )

    run = "alpha bravo charlie delta echo foxtrot golf"  # w+k-1 = 7 tokens
    docs = spark.createDataFrame(
        [
            (1, f"unrelated prefix one two {run} suffix here now"),
            (2, f"{run} completely different tail words appear afterwards"),
            (3, "nothing in common with the others at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, "doc_id", "text")
    by_doc = {
        r.doc: set(r.fps)
        for r in fp.groupBy("doc").agg(F.collect_set("fp").alias("fps")).collect()
    }
    assert by_doc[1] & by_doc[2], "shared >=w+k-1 run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    # density: fingerprints strictly fewer than gram hashes
    n_tokens = 10
    n_grams = n_tokens - WINNOW_K + 1
    assert all(len(v) < n_grams for v in by_doc.values())

    pairs = winnowing_pairs(docs, "doc_id", "text", threshold=0.01).collect()
    assert {(r.doc_lo, r.doc_hi) for r in pairs} == {(1, 2)}
    assert all(0 < r.sim <= 1 for r in pairs)


def test_winnowing_short_doc_still_fingerprinted(spark):
    """Docs with >=k tokens but fewer than w gram hashes emit their
    single min-hash fingerprint; docs under k tokens emit nothing."""
    from omfietser_etl_spark.textops.dedup import winnow_fingerprints

    docs = spark.createDataFrame(
        [(1, "just four tokens here"), (2, "two words")],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(docs, "doc_id", "text").collect()
    assert {r.doc for r in rows} == {1}
    assert len(rows) == 1


def test_gopher_rules_each_rule_fires(spark):
    """Each Gopher rule flips on its designed violation and the good
    doc passes everything (Rae et al. 2021 filter battery)."""
    from omfietser_etl_spark.textops.analysis import gopher_rules

    good = ("the quick brown fox jumps over that lazy dog and then they "
            "have wandered off with plenty of perfectly ordinary words "
            "to spare making this document long enough for the filter "
            "battery to accept it as a real piece of prose easily "
            "surpassing the fifty word minimum required by the rules")
    rows = [
        (1, good),
        (2, "too few words here with the and that"),            # word count
        (3, " ".join(["a"] * 60) + " the of"),                   # mean word len < 3
        (4, " ".join(["####word"] * 60) + " the of and"),        # symbol ratio
        (5, "\n".join(["- bullet line the of"] * 10)
            + "\n" + " ".join(["word"] * 60)),                   # bullets > 90%? (11 lines, 10 bullets)
        (6, " ".join(["12345"] * 60) + " the of and that"),      # alpha words < 80%
        (7, " ".join(["zorp"] * 60)),                            # no stopwords
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc: r for r in gopher_rules(docs).collect()}
    assert out[1].pass_all, out[1]
    assert not out[2].ok_word_count
    assert not out[3].ok_word_len
    assert not out[4].ok_symbol_ratio
    assert not out[5].ok_bullet_ellipsis
    assert not out[6].ok_alpha_words
    assert not out[7].ok_stopwords
    assert all(not out[d].pass_all for d in (2, 3, 4, 5, 6, 7))


def test_minhash_estimate_agreement_bounds(spark):
    """Identical docs agree on the full signature; the estimate path
    emits the same candidate universe as the LSH banding (agree >= ROWS
    by construction for any banded candidate)."""
    from omfietser_etl_spark.textops.constants import N_HASHES, ROWS
    from omfietser_etl_spark.textops.dedup import minhash_estimate_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, base + " with a small tail change"),
         (4, "completely different text about database query planning")],
        "doc_id long, text string",
    )
    out = {(r.doc_lo, r.doc_hi): r.agree
           for r in minhash_estimate_pairs(df, "doc_id", "text", 1).collect()}
    assert out[(1, 2)] == N_HASHES            # identical: all hashes agree
    assert all(a >= ROWS for a in out.values())  # banded candidates share a band
    assert (1, 4) not in out and (2, 4) not in out


def test_zipf_slope_matches_python_fit(spark):
    """zipf_slope's exact-integer normal equations equal a plain
    Python replay (same ilog2_q) on an engineered corpus whose term
    frequencies follow a known power law — and the fitted ratio lands
    near the slope the frequencies were generated with."""
    from omfietser_etl_spark.textops.analysis import ZIPF_Q, zipf_slope
    from omfietser_etl_spark.textops.selection import ilog2_q

    # freq(term_r) = floor(4096 / r): slope -1 by construction.
    words = []
    for r in range(1, 41):
        words.extend([f"w{r:03d}"] * (4096 // r))
    docs = spark.createDataFrame(
        [(i, " ".join(words[i::7])) for i in range(7)], ["doc_id", "text"]
    )
    row = zipf_slope(docs, "text", top_v=40).collect()[0]
    assert row.n_terms == 40

    # independent Python replay of the fit
    from collections import Counter

    c = Counter(words)
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:40]
    xs = [ilog2_q(r, ZIPF_Q) for r in range(1, 41)]
    ys = [ilog2_q(f, ZIPF_Q) for _, f in top]
    n = len(xs)
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = n * sum(x * x for x in xs) - sum(xs) ** 2
    assert (row.slope_num, row.slope_den) == (num, den)
    assert (row.sum_x, row.sum_y) == (sum(xs), sum(ys))
    # the fitted slope is the generating -1 (floor() bends the tail a hair)
    assert -1.1 < num / den < -0.9


def test_zipf_slope_plan_is_bounded(spark):
    """The rank window must run on the post-limit ≤top_v-row frame
    (TakeOrderedAndProject feeding Window with NO exchange between
    them) — never a global sort or a full-vocabulary window."""
    import re

    from omfietser_etl_spark.textops.analysis import zipf_slope
    from tests.test_plans import _plan, _single_partition_offenders

    docs = spark.createDataFrame([(1, "a b c a")], ["doc_id", "text"])
    plan = _plan(zipf_slope(docs, "text"))
    nodes = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
    assert "TakeOrderedAndProject" in nodes
    i_top = nodes.index("TakeOrderedAndProject")
    i_win = nodes.index("Window")
    assert "Exchange" not in nodes[i_top + 1 : i_win + 1] and i_win > i_top
    assert not _single_partition_offenders(plan)
    assert "Sort" not in nodes  # top-V never globally sorts


def test_ks_drift_matches_python_and_ties(spark):
    """ks_drift equals a plain-Python two-sample KS replay on an
    engineered two-group corpus, including the smallest-value-at-max
    tie-break, and its plan has no full-data single-partition funnel."""
    from omfietser_etl_spark.textops.analysis import ks_drift
    from tests.test_plans import _plan, _single_partition_offenders

    # group A: lengths 1..8 uniform; group B: 5..12 uniform — the KS
    # max gap is attained on a plateau (ties for several v).
    rows = [("A", v) for v in range(1, 9) for _ in range(3)] + [
        ("B", v) for v in range(5, 13) for _ in range(3)
    ]
    df = spark.createDataFrame(rows, ["source", "n_chars"])
    out = {r.source: r for r in ks_drift(df, "source", "n_chars").collect()}

    def py_ks(a, b):
        grid = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        best, v_at = -1, None
        for v in grid:
            ca = sum(1 for x in a if x <= v)
            cb = sum(1 for x in b if x <= v)
            d = abs(nb * ca - na * cb)
            if d > best:
                best, v_at = d, v
        return best, v_at, na, nb

    a = [v for g, v in rows if g == "A"]
    b = [v for g, v in rows if g == "B"]
    best, v_at, na, nb = py_ks(a, b)
    assert out["A"].n_g == na and out["A"].n_rest == nb
    assert out["A"].v_at_max == v_at
    assert out["A"].ks_bp == (10000 * best) // (na * nb)
    # symmetric statistic: B vs rest(=A) gives the same distance
    assert out["B"].ks_bp == out["A"].ks_bp

    assert not _single_partition_offenders(_plan(ks_drift(df)))


def test_source_overlap_containment_semantics(spark):
    """Directed containment on an engineered corpus: B contains all
    of A's shingles (A⊂B → containment(A→B) = 10000), the reverse is
    partial, a disjoint source emits no rows, and the hashed-key path
    returns identical numbers (no 64-bit collisions at this size)."""
    from omfietser_etl_spark.textops.analysis import source_overlap

    docs = spark.createDataFrame(
        [
            ("A", "one two three four five six"),
            ("B", "one two three four five six seven eight nine ten"),
            ("C", "alpha beta gamma delta epsilon zeta eta"),
        ],
        ["source", "text"],
    )
    out = {
        (r.src_a, r.src_b): r
        for r in source_overlap(docs, "source", "text").collect()
    }
    # A's shingle set is a subset of B's
    assert out[("A", "B")].containment_bp == 10000
    ab = out[("A", "B")]
    ba = out[("B", "A")]
    assert ab.n_common == ba.n_common == ab.n_sh_a  # |A∩B| = |A|
    assert ba.containment_bp == (10000 * ba.n_common) // ba.n_sh_a < 10000
    assert not any("C" in k for k in out)  # disjoint source: no rows

    hashed = {
        (r.src_a, r.src_b): r
        for r in source_overlap(docs, "source", "text", hash_keys=True).collect()
    }
    assert {k: (v.n_common, v.n_sh_a, v.containment_bp) for k, v in out.items()} == {
        k: (v.n_common, v.n_sh_a, v.containment_bp) for k, v in hashed.items()
    }


def test_allpairs_cosine_exact_and_lossless(spark):
    """allpairs_tf_cosine equals the brute-force all-pairs cosine on
    a mixed corpus (losslessness of the prefix filter), the emitted
    dot/norms are hand-checkable, and the filter genuinely prunes
    (indexed postings < full postings)."""
    from collections import Counter

    from omfietser_etl_spark.textops.similarity import allpairs_tf_cosine

    rows = [
        (1, "alpha beta gamma delta alpha beta"),
        (2, "alpha beta gamma delta alpha beta epsilon"),   # near-dup of 1
        (3, "alpha beta gamma delta alpha beta"),           # exact dup of 1
        (4, "zeta eta theta iota kappa"),                   # unrelated
        (5, "the the the the quick brown fox"),
        (6, "the the the the quick brown cat"),             # near-dup of 5
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r.doc_lo, r.doc_hi): r
        for r in allpairs_tf_cosine(
            docs, "doc_id", "text", 9, 10, max_df_num=None
        ).collect()
    }

    # brute force in Python (same tokenization: lowercase alnum words)
    vecs = {i: Counter(t.split()) for i, t in rows}
    expect = {}
    ids = sorted(vecs)
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            dot = sum(vecs[i][k] * vecs[j][k] for k in vecs[i])
            na = sum(v * v for v in vecs[i].values())
            nb = sum(v * v for v in vecs[j].values())
            if 100 * dot * dot >= 81 * na * nb:
                expect[(i, j)] = (dot, na, nb, (10**8 * dot * dot) // (na * nb))
    assert {
        k: (v.dot, v.norm_lo_sq, v.norm_hi_sq, v.cos2_bp) for k, v in out.items()
    } == expect
    assert (1, 3) in out and out[(1, 3)].cos2_bp == 10**8  # exact dup
    assert (1, 2) in out and (5, 6) in out
    assert not any(4 in k for k in out)

    # the stopword cap (df ≤ N/2 here: N=6 docs → df ≤ 3) keeps the
    # exact-dup pair 1-3 intact (its words have df = 3) — and capping
    # can only shrink shared support, never add pairs beyond the
    # uncapped set's structure
    capped = {
        (r.doc_lo, r.doc_hi): r.cos2_bp
        for r in allpairs_tf_cosine(
            docs, "doc_id", "text", 9, 10, max_df_num=1, max_df_den=2
        ).collect()
    }
    assert capped[(1, 3)] == 10**8

    # the filter must index strictly fewer postings than it probes
    full = docs.selectExpr(
        "explode(filter(split(trim(regexp_replace(regexp_replace(lower(text),"
        " '[^a-z0-9 ]', ' '), ' +', ' ')), ' '), x -> x <> '')) AS f"
    ).count()
    # count indexed rows by replaying the suffix rule in Python
    df_docs = Counter()
    for i in ids:
        for k in vecs[i]:
            df_docs[k] += 1
    indexed = 0
    for i in ids:
        nsq = sum(v * v for v in vecs[i].values())
        order = sorted(vecs[i], key=lambda k: (-df_docs[k], k))
        cum = 0
        for k in order:
            cum += vecs[i][k] ** 2
            if 10 * cum >= 9 * nsq:
                indexed += 1
    assert 0 < indexed < full


def test_cos2_bp_expr_exact_and_overflow_safe(spark):
    """ADVICE r06: the one-shot 10^8·dot² staging overflowed
    DECIMAL(38,0) at the documented envelope (dot = 10^16 →
    10^40), silently NULLing in Spark while the HUGEINT oracle
    errored. The two-stage division must (a) return the exact
    floor(10^8·dot²/D) on arbitrary in-envelope values and (b)
    survive the envelope's worst case, where the naive form NULLs."""
    from pyspark.sql import functions as F

    from omfietser_etl_spark.textops.similarity import cos2_bp_expr

    import random

    rng = random.Random(7)
    rows = [(10**16, 10**16, 10**16)]  # envelope worst case: cos² = 1
    for _ in range(50):
        nlo = rng.randint(1, 10**16)
        nhi = rng.randint(1, 10**16)
        # Cauchy–Schwarz: dot² ≤ nlo·nhi
        dot = rng.randint(1, int((nlo * nhi) ** 0.5))
        rows.append((dot, nlo, nhi))
    df = spark.createDataFrame(
        rows, "dot long, norm_lo_sq long, norm_hi_sq long"
    )
    got = [
        r.bp
        for r in df.select(F.expr(cos2_bp_expr()).alias("bp")).collect()
    ]
    want = [(10**8 * d * d) // (a * b) for d, a, b in rows]
    assert got == want
    assert got[0] == 10**8  # the case the naive form turned into NULL

    # the naive single-stage form overflows DECIMAL(38,0) at the
    # envelope — silent NULL under non-ANSI, ArithmeticException
    # under ANSI (the Spark 4 default). Pin that it fails either way;
    # the staged expression above is what avoids both.
    dec = "decimal(38,0)"
    try:
        naive = df.limit(1).select(
            F.expr(
                f"CAST((CAST(100000000 AS {dec}) * dot * dot) div "
                f"(CAST(norm_lo_sq AS {dec}) * norm_hi_sq) AS BIGINT)"
            ).alias("bp")
        ).collect()[0].bp
        assert naive is None
    except Exception as exc:  # noqa: BLE001 — ANSI overflow path
        assert "Decimal" in str(exc) or "NUMERIC_VALUE_OUT_OF_RANGE" in str(exc)


def test_release_all_frees_every_scope(spark):
    """cacheutil.release_all() must return the persistent-RDD census to
    baseline across MULTIPLE operator scopes at once — the sequential-
    harness hygiene hook (the round-7 sf0.1 sweep OOM'd the vanilla 1g
    heap from one-shot scopes lingering to the end of the catalog)."""
    from omfietser_etl_spark import cacheutil
    from omfietser_etl_spark.operators.graph import hits, kcore
    from omfietser_etl_spark.textops import dedup as dd

    sc = spark.sparkContext
    cacheutil.release_all()
    baseline = cacheutil.persistent_rdd_ids(sc)

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "u long, v long"
    )
    kcore(edges, "u", "v", k=2, rounds=2).collect()
    hits(edges, "u", "v", iters=1).collect()
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_lo long, doc_hi long")
    dd.connected_components(pairs).collect()
    assert cacheutil.persistent_rdd_ids(sc) - baseline  # something cached

    cacheutil.release_all()
    leftover = cacheutil.persistent_rdd_ids(sc) - baseline
    assert leftover == set(), f"leaked persisted RDDs: {leftover}"


def test_bipartite_cosine_pairs_semantics(spark):
    """Hand-checked semantic decontam: the identical vector scores
    sim = 1.0, an orthogonal one emits no row, empty benchmark yields
    an empty frame with the contract schema."""
    from omfietser_etl_spark.textops.similarity import bipartite_cosine_pairs

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.8, 0.6])],
        ["vec_id", "embedding"],
    )
    bench = spark.createDataFrame([(100, [1.0, 0.0])], ["vec_id", "embedding"])
    out = {
        (r.doc, r.bench): r.sim
        for r in bipartite_cosine_pairs(
            corpus, bench, "vec_id", "embedding", 0.5, on_subnoise="off"
        ).collect()
    }
    assert out == {(1, 100): 1.0, (3, 100): 0.8}

    empty = bipartite_cosine_pairs(
        corpus, bench.filter("vec_id < 0"), "vec_id", "embedding", 0.5
    )
    assert empty.columns == ["doc", "bench", "sim"]
    assert empty.count() == 0

    # sub-floor τ raises by default: dim=2, n_eval=1 → floor ≈ 0.83,
    # so τ=0.5 on this toy geometry is a noise-maxima footgun
    import pytest

    from omfietser_etl_spark.textops.similarity import bipartite_tau_floor

    assert bipartite_tau_floor(2, 1) > 0.5
    with pytest.raises(ValueError, match="null cosine"):
        bipartite_cosine_pairs(corpus, bench, "vec_id", "embedding", 0.5)
    # the td26 gate geometry sits above its floor
    assert bipartite_tau_floor(64, 71) < 0.40


def test_bipartite_cosine_pairs_ivf(spark):
    """The IVF-routed large-eval-suite path (round-7 verdict item 3):
    probing ALL cells degenerates to the dense output bit-for-bit;
    fewer probes yield a strict SUBSET (recall < 1 by design); routing
    is verifiable on a hand-built geometry; empty codebook raises."""
    import pytest

    from omfietser_etl_spark.session import load
    from omfietser_etl_spark.textops.similarity import (
        bipartite_cosine_pairs,
        bipartite_cosine_pairs_ivf,
    )

    # real embeddings: td26's gate slices at the test scale
    from pyspark.sql import functions as F

    from .conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 7 != 0)
    bench = emb.filter(F.col("vec_id") % 7 == 0)
    cents = bench.filter(F.col("vec_id") % 21 == 0)  # ~1/3 of bench
    n_cells = cents.count()
    assert n_cells >= 2

    dense = {
        (r.doc, r.bench): r.sim
        for r in bipartite_cosine_pairs(
            corpus, bench, "vec_id", "embedding", 0.40, on_subnoise="off"
        ).collect()
    }
    full_probe = {
        (r.doc, r.bench): r.sim
        for r in bipartite_cosine_pairs_ivf(
            corpus, bench, cents, "vec_id", "embedding", 0.40,
            n_probe=n_cells, on_subnoise="off",
        ).collect()
    }
    assert full_probe == dense  # n_probe = C ≡ dense, values included

    narrow = {
        (r.doc, r.bench): r.sim
        for r in bipartite_cosine_pairs_ivf(
            corpus, bench, cents, "vec_id", "embedding", 0.40,
            n_probe=1, on_subnoise="off",
        ).collect()
    }
    assert set(narrow) <= set(dense)
    assert all(narrow[k] == dense[k] for k in narrow)  # exact where probed

    # hand-built routing check: two orthogonal cells; with n_probe=1 a
    # corpus vector between them only sees its NEAREST cell's bench doc
    c2 = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    b2 = spark.createDataFrame(
        [(10, [1.0, 0.0]), (20, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    q2 = spark.createDataFrame([(5, [0.8, 0.6])], ["vec_id", "embedding"])
    got = {
        (r.doc, r.bench): r.sim
        for r in bipartite_cosine_pairs_ivf(
            q2, b2, c2, "vec_id", "embedding", 0.5, n_probe=1,
            on_subnoise="off",
        ).collect()
    }
    assert got == {(5, 10): 0.8}  # 0.6-sim bench doc 20 unprobed, dropped

    with pytest.raises(ValueError, match="empty centroid codebook"):
        bipartite_cosine_pairs_ivf(
            q2, b2, c2.filter("vec_id < 0"), "vec_id", "embedding", 0.5,
            on_subnoise="off",
        )
    with pytest.raises(ValueError, match="null cosine"):
        bipartite_cosine_pairs_ivf(q2, b2, c2, "vec_id", "embedding", 0.1)


def test_bipartite_ivf_random_geometry_invariants(spark):
    """Randomized-geometry property check for the IVF decontam route:
    across seeded random corpora/benchmarks/codebooks and every
    n_probe, (1) the IVF output is a SUBSET of the dense pairs, (2)
    sims agree exactly where probed, (3) n_probe = C reproduces the
    dense output in full. Deterministic seeds, three distinct
    geometries (clustered, uniform, degenerate duplicate vectors)."""
    import numpy as np

    from omfietser_etl_spark.textops.similarity import (
        bipartite_cosine_pairs,
        bipartite_cosine_pairs_ivf,
    )

    for seed, shape in ((0, "uniform"), (1, "clustered"), (2, "dupes")):
        rng = np.random.default_rng(seed)
        dim = 8
        if shape == "clustered":
            centers = rng.normal(size=(3, dim))
            raw = np.vstack([
                c + 0.1 * rng.normal(size=(20, dim)) for c in centers
            ])
        elif shape == "dupes":
            base = rng.normal(size=(6, dim))
            raw = np.vstack([base] * 10)  # heavy exact duplicates
        else:
            raw = rng.normal(size=(60, dim))
        vecs = raw / np.linalg.norm(raw, axis=1, keepdims=True)
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        corpus = df.filter("vec_id % 3 != 0")
        bench = df.filter("vec_id % 3 = 0")
        cents = df.filter("vec_id % 9 = 0")
        n_cells = cents.count()
        tau = 0.5
        dense = {
            (r.doc, r.bench): r.sim
            for r in bipartite_cosine_pairs(
                corpus, bench, "vec_id", "embedding", tau, on_subnoise="off"
            ).collect()
        }
        for n_probe in (1, 2, n_cells):
            got = {
                (r.doc, r.bench): r.sim
                for r in bipartite_cosine_pairs_ivf(
                    corpus, bench, cents, "vec_id", "embedding", tau,
                    n_probe=n_probe, on_subnoise="off",
                ).collect()
            }
            assert set(got) <= set(dense), (seed, shape, n_probe)
            assert all(got[k] == dense[k] for k in got), (seed, shape, n_probe)
            if n_probe >= n_cells:
                assert got == dense, (seed, shape)


def test_decontam_semantic_routes_on_eval_size(spark, monkeypatch):
    """decontam_semantic (round-8 verdict item 6): |eval| <= the dense
    ceiling runs the exact dense kernel; above it the IVF kernel with
    the ivf_centroid_mod_for geometry over the BENCHMARK count. The
    switch point is pinned exactly at dense_eval_max vs +1."""
    from pyspark.sql import functions as F

    import omfietser_etl_spark.textops.similarity as sim
    from omfietser_etl_spark.session import load

    from .conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 7 != 0)
    bench = emb.filter(F.col("vec_id") % 7 == 0)
    n_eval = bench.count()

    routes = []
    orig_dense, orig_ivf = sim.bipartite_cosine_pairs, sim.bipartite_cosine_pairs_ivf

    def spy_dense(*a, **k):
        routes.append("dense")
        return orig_dense(*a, **k)

    def spy_ivf(emb_, bench_, cents, *a, **k):
        routes.append(("ivf", cents))
        return orig_ivf(emb_, bench_, cents, *a, **k)

    monkeypatch.setattr(sim, "bipartite_cosine_pairs", spy_dense)
    monkeypatch.setattr(sim, "bipartite_cosine_pairs_ivf", spy_ivf)

    # exactly at the ceiling -> dense (exact output ≡ direct kernel)
    out = sim.decontam_semantic(
        corpus, bench, "vec_id", "embedding", 0.40,
        dense_eval_max=n_eval, on_subnoise="off",
    )
    assert routes == ["dense"]
    dense_pairs = {(r.doc, r.bench, r.sim) for r in out.collect()}
    assert dense_pairs == {
        (r.doc, r.bench, r.sim)
        for r in orig_dense(
            corpus, bench, "vec_id", "embedding", 0.40, on_subnoise="off"
        ).collect()
    }

    # one past the ceiling -> IVF, codebook = bench ids ≡ 0 mod
    # ivf_centroid_mod_for(|eval|), output ⊆ dense with exact values
    routes.clear()
    out = sim.decontam_semantic(
        corpus, bench, "vec_id", "embedding", 0.40,
        dense_eval_max=n_eval - 1, on_subnoise="off",
    )
    ivf_pairs = {(r.doc, r.bench, r.sim) for r in out.collect()}
    assert len(routes) == 1 and routes[0][0] == "ivf"
    mod = sim.ivf_centroid_mod_for(n_eval)
    cent_ids = {r.vec_id for r in routes[0][1].select("vec_id").collect()}
    assert cent_ids == {
        r.vec_id for r in bench.filter(F.col("vec_id") % mod == 0).collect()
    }
    assert ivf_pairs <= dense_pairs


def test_containment_flags_snippet_in_page(spark):
    """A snippet quoted verbatim inside a longer page: Jaccard is
    small (union dominated by the page) but containment(snippet→page)
    is 1.0 — the asymmetric direction is the whole point. The page
    itself stays below threshold, as does the unrelated doc."""
    snippet = "alpha beta gamma delta epsilon zeta"
    page = snippet + " " + " ".join(f"filler{w} word{w} extra{w}" for w in range(8))
    df = spark.createDataFrame(
        [(1, snippet), (2, page), (3, "totally unrelated content lives here now")],
        ["doc_id", "text"],
    )
    rows = dd.containment_flags(df, "doc_id", "text").collect()
    assert [(r.doc, r.contained_in, r.containment) for r in rows] == [(1, 2, 1.0)]


def test_containment_flags_tie_breaks_smallest_container(spark):
    """Two containers with the SAME intersection count: the argmax
    compares (inter, -other), so the smaller container id wins."""
    snippet = "one two three four five"
    pad_a = snippet + " " + " ".join(f"pada{w} qa{w}" for w in range(6))
    pad_b = snippet + " " + " ".join(f"padb{w} qb{w}" for w in range(6))
    df = spark.createDataFrame(
        [(5, snippet), (9, pad_a), (7, pad_b)], ["doc_id", "text"]
    )
    out = {r.doc: (r.contained_in, r.containment)
           for r in dd.containment_flags(df, "doc_id", "text").collect()}
    assert out[5] == (7, 1.0)


def test_containment_flags_string_ids(spark):
    """STRING doc ids: the argmax tie-break must not negate the id
    column (unary minus on a string casts to double → null election —
    round-9 advisor finding). Same geometry as the tie test: equal
    intersection counts, lexicographically smaller container wins."""
    snippet = "one two three four five"
    pad_a = snippet + " " + " ".join(f"pada{w} qa{w}" for w in range(6))
    pad_b = snippet + " " + " ".join(f"padb{w} qb{w}" for w in range(6))
    df = spark.createDataFrame(
        [("s", snippet), ("zz", pad_a), ("aa", pad_b)], ["doc_id", "text"]
    )
    out = {r.doc: (r.contained_in, r.containment)
           for r in dd.containment_flags(df, "doc_id", "text").collect()}
    assert out["s"] == ("aa", 1.0)


def test_containment_hashed_matches_string_path(spark):
    docs = [(i, f"shared prefix words here padding{i} tail{i} more{i}")
            for i in range(12)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    plain = sorted(map(tuple, dd.containment_flags(
        df, "doc_id", "text", threshold=0.2).collect()))
    hashed = sorted(map(tuple, dd.containment_flags(
        df, "doc_id", "text", threshold=0.2, hash_shingles=True).collect()))
    assert plain == hashed and plain
