"""Deterministic sampling / split / packing / sessionization /
interval-join operator properties (beyond the oracle-parity gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omfietser_etl_spark.operators.history import scd2_intervals
from omfietser_etl_spark.operators.joins import interval_join
from omfietser_etl_spark.operators.sessions import session_stats, sessionize
from omfietser_etl_spark.session import load
from omfietser_etl_spark.textops.sampling import (
    allocated_sample,
    fixed_size_sample,
    hash_sample,
    isqrt_col,
    mixture_split,
    pack_sequences,
    stratified_sample,
    temperature_rebalance,
    unimax_allocation,
)

from .conftest import SF_SMOKE


def _docs(spark):
    return load(spark, SF_SMOKE, "documents").select(
        F.col("doc_id").alias("doc"), "source", "text"
    )


def test_isqrt_col_exact_on_boundaries(spark):
    vals = [0, 1, 2, 3, 4, 99, 100, 101, (1 << 40) - 1, 1 << 40, (10**6) ** 2]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    out = {r.x: r.r for r in df.select("x", isqrt_col(F.col("x")).alias("r")).collect()}
    import math

    for v in vals:
        assert out[v] == math.isqrt(v), v


def test_temperature_rebalance_downsamples_the_head(spark):
    docs = load(spark, SF_SMOKE, "documents").select(
        F.col("doc_id").alias("doc"), "lang"
    )
    rows = temperature_rebalance(docs, "doc", "lang", 5000).collect()
    by_rate = sorted(rows, key=lambda r: r.n_docs)
    # α=0.5 sampling: bigger groups get strictly lower keep-rates
    rates = [r.rate_bp for r in by_rate]
    assert rates == sorted(rates, reverse=True)
    assert all(0 < r.rate_bp <= 10000 for r in rows)
    # realized total ≈ the 50% budget (hash sampling is unbiased)
    n, kept = sum(r.n_docs for r in rows), sum(r.n_kept for r in rows)
    assert abs(kept / n - 0.5) < 0.1
    # deterministic: same inputs, same decisions
    again = temperature_rebalance(docs, "doc", "lang", 5000).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def _unimax(spark, sizes, bp):
    rows = [(g,) for g, n in sizes.items() for _ in range(n)]
    df = spark.createDataFrame(rows, ["grp"])
    return {r.grp: r for r in unimax_allocation(df, "grp", bp).collect()}


def test_unimax_water_filling_invariants(spark):
    sizes = {"a": 5, "b": 20, "c": 100, "d": 7}
    total = sum(sizes.values())  # 132
    for bp in (1000, 5000, 8000, 9999):
        out = _unimax(spark, sizes, bp)
        budget = total * bp // 10000
        allocs = {g: out[g].alloc_docs for g in sizes}
        # never over-asks a group, never exceeds the budget, and the
        # div remainder loses strictly fewer docs than #groups
        assert all(0 <= allocs[g] <= sizes[g] for g in sizes)
        assert budget - len(sizes) < sum(allocs.values()) <= budget
        # capped groups are fully taken; uncapped share one water level
        levels = {allocs[g] for g in sizes if not out[g].is_capped}
        assert all(allocs[g] == sizes[g] for g in sizes if out[g].is_capped)
        assert len(levels) <= 1
    # full budget: everything capped at its own size
    out = _unimax(spark, sizes, 10000)
    assert {g: out[g].alloc_docs for g in sizes} == sizes


def test_fixed_size_sample_exact_counts_and_nesting(spark):
    docs = load(spark, SF_SMOKE, "documents").select(
        F.col("doc_id").alias("doc"), "lang"
    )
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    s10 = fixed_size_sample(docs, "doc", "lang", 10)
    got = {r.lang: r.n for r in s10.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == {lg: min(10, n) for lg, n in sizes.items()}
    # nested: the n=10 sample is contained in the n=15 sample
    s15 = {(r.doc, r.lang) for r in fixed_size_sample(docs, "doc", "lang", 15).collect()}
    assert {(r.doc, r.lang) for r in s10.collect()} <= s15


def test_hash_sample_is_monotone_and_deterministic(spark):
    docs = _docs(spark)
    small = {r.doc for r in hash_sample(docs, "doc", 200).collect()}
    big = {r.doc for r in hash_sample(docs, "doc", 500).collect()}
    again = {r.doc for r in hash_sample(docs, "doc", 500).collect()}
    assert small <= big  # lowering the rate only removes rows
    assert big == again  # retry/re-run stable
    n = docs.count()
    # rate is approximate per-row Bernoulli-like; loose envelope
    assert 0 < len(big) < n


def test_hash_sample_salt_decorrelates(spark):
    docs = _docs(spark)
    a = {r.doc for r in hash_sample(docs, "doc", 500, salt="a").collect()}
    b = {r.doc for r in hash_sample(docs, "doc", 500, salt="b").collect()}
    assert a != b  # different salts -> different (independent) samples


def test_mixture_split_partitions_every_row(spark):
    docs = _docs(spark)
    m = mixture_split(docs, "doc", n_shards=4)
    n = docs.count()
    assert m.count() == n
    assert m.filter(F.col("split").isNull()).count() == 0
    bad_shard = m.filter((F.col("shard") < 0) | (F.col("shard") >= 4)).count()
    assert bad_shard == 0
    # each id maps to exactly one (split, shard) — no dup, no loss
    assert m.select("doc").distinct().count() == n
    # weights must sum to the bucket space
    with pytest.raises(ValueError):
        mixture_split(docs, "doc", splits=(("train", 1),))


def test_pack_sequences_is_contiguous_per_stream(spark):
    packed = pack_sequences(_docs(spark), "doc", "text", 64).collect()
    by_stream: dict = {}
    for r in packed:
        by_stream.setdefault(r.stream, []).append(r)
    for rows in by_stream.values():
        rows.sort(key=lambda r: r.doc)
        offset = 0
        for r in rows:
            assert r.start_tok == offset  # concat order, no gaps/overlap
            assert r.first_chunk == r.start_tok // 64
            assert r.first_chunk <= r.last_chunk
            offset += r.n_tok


def test_stratified_sample_rates_and_monotonicity(spark):
    docs = _docs(spark)
    rates = {"src0": 10_000, "src1": 5_000}
    kept = stratified_sample(docs, "doc", "source", rates, default_bp=0)
    per_src = {
        r.source: r.cnt
        for r in kept.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    # rate 10000 keeps every row; rate 0 (default) keeps none
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert per_src.get("src0") == n_src0
    assert set(per_src) <= {"src0", "src1"}
    # per-group membership is the hash_sample set at the same salt/rate
    via_global = {
        r.doc
        for r in hash_sample(docs, "doc", 5_000, salt="strat")
        .filter(F.col("source") == "src1")
        .collect()
    }
    via_strat = {r.doc for r in kept.filter(F.col("source") == "src1").collect()}
    assert via_strat == via_global


def test_scd2_intervals_runs_and_chaining(spark):
    rows = [
        # key 1: A,A,B,A — three runs; ties on ts broken by seq
        (1, 10, 1, "A"),
        (1, 20, 2, "A"),
        (1, 30, 3, "B"),
        (1, 40, 4, "A"),
        # key 2: null -> null is NOT a change; null -> X is
        (2, 10, 1, None),
        (2, 20, 2, None),
        (2, 30, 3, "X"),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "seq", "state"])
    out = scd2_intervals(df, "k", "ts", ["state"], order_col="seq").collect()
    k1 = sorted([r for r in out if r.k == 1], key=lambda r: r.valid_from)
    assert [(r.state, r.valid_from, r.valid_to, r.n_rows, r.is_current) for r in k1] == [
        ("A", 10, 30, 2, False),
        ("B", 30, 40, 1, False),
        ("A", 40, None, 1, True),
    ]
    k2 = sorted([r for r in out if r.k == 2], key=lambda r: r.valid_from)
    assert [(r.state, r.valid_from, r.valid_to, r.n_rows, r.is_current) for r in k2] == [
        (None, 10, 30, 2, False),
        ("X", 30, None, 1, True),
    ]
    # intervals chain: every non-final valid_to equals the next valid_from
    for runs in (k1, k2):
        for a, b in zip(runs, runs[1:]):
            assert a.valid_to == b.valid_from


def test_sessionize_boundaries(spark):
    # gap=100 units
    rows = [
        # user 1: events at t=0, 50, 120 (gaps 50, 70 <= 100 -> one session)
        (1, 1, 0, 1.0),
        (1, 2, 50, 1.0),
        (1, 3, 120, 1.0),
        # user 1: t=500 (gap 380 > 100 -> new session)
        (1, 4, 500, 1.0),
        # user 2: single event
        (2, 5, 10, 2.0),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])
    s = sessionize(ev, gap=100)
    got = {(r.event_id): r.session_idx for r in s.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}

    stats = session_stats(ev, gap=100).collect()
    by_key = {(r.user_id, r.session_idx): r for r in stats}
    assert by_key[(1, 1)].n_events == 3
    assert by_key[(1, 1)].duration == 120
    assert by_key[(1, 2)].n_events == 1
    assert by_key[(2, 1)].sum_value_cents == 200


def test_interval_join_matches_theta_join(spark):
    ev = load(spark, SF_SMOKE, "events").withColumn(
        "tus", F.expr("ts div 1000")
    ).select("event_id", "tus")
    lo, hi = ev.agg(F.min("tus"), F.max("tus")).first()
    step = (hi - lo) // 32
    ranges = load(spark, SF_SMOKE, "nation").select(
        "n_nationkey",
        (F.lit(lo) + F.col("n_nationkey") * step).alias("s"),
        (F.lit(lo) + (F.col("n_nationkey") + 3) * step).alias("e"),
    )
    binned = interval_join(ev, ranges, "tus", "s", "e", 86_400_000_000).select(
        "event_id", "n_nationkey"
    )
    theta = ev.join(
        F.broadcast(ranges),
        (ev["tus"] >= ranges["s"]) & (ev["tus"] < ranges["e"]),
    ).select("event_id", "n_nationkey")
    assert sorted(map(tuple, binned.collect())) == sorted(map(tuple, theta.collect()))
    # the blocked path must be an equi join, never a nested loop
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_allocated_sample_realizes_exact_budgets_and_is_monotone(spark):
    """allocated_sample takes exactly min(alloc, |group|) per group,
    agrees with fixed_size_sample on a constant allocation, and a
    raised budget only ADDS members (re-allocation never churns the
    selected prefix). The alloc side must broadcast."""
    docs = _docs(spark).select("doc", "source")
    alloc = spark.createDataFrame(
        [("src0", 5), ("src1", 0), ("src2", 10**9)],
        "source string, alloc_docs long",
    )
    out = allocated_sample(docs, "doc", "source", alloc)
    sizes = {r.source: r.n for r in
             docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    got = {r.source: r.n for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got.get("src0", 0) == min(5, sizes["src0"])
    assert "src1" not in got
    assert got.get("src2", 0) == sizes["src2"]

    # constant allocation == fixed_size_sample membership
    const = spark.createDataFrame(
        [(s, 7) for s in sizes], "source string, alloc_docs long"
    )
    a = {(r.doc, r.pick_rank) for r in
         allocated_sample(docs, "doc", "source", const).collect()}
    f = {(r.doc, r.pick_rank) for r in
         fixed_size_sample(docs, "doc", "source", 7).collect()}
    assert a == f

    # monotone: alloc 5 sample ⊂ alloc 9 sample per group
    small = {r.doc for r in allocated_sample(
        docs, "doc", "source",
        spark.createDataFrame([(s, 5) for s in sizes],
                              "source string, alloc_docs long")).collect()}
    big = {r.doc for r in allocated_sample(
        docs, "doc", "source",
        spark.createDataFrame([(s, 9) for s in sizes],
                              "source string, alloc_docs long")).collect()}
    assert small <= big

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_budget_weighted_sample_respects_and_fills_budget(spark):
    """Token-budget realization: per group the kept running total
    never exceeds the allocation, the unused remainder is smaller
    than one more document (the budget is FILLED, not just bounded),
    and a raised budget only adds members."""
    from omfietser_etl_spark.textops.sampling import budget_weighted_sample

    docs = _docs(spark).select(
        "doc", "source",
        F.size(F.split("text", r"\s+")).cast("long").alias("n_tok"),
    )
    sizes = {r.source: r.total for r in
             docs.groupBy("source").agg(F.sum("n_tok").alias("total")).collect()}
    alloc = spark.createDataFrame(
        [(s, int(t * 0.4)) for s, t in sizes.items()],
        "source string, alloc_weight long",
    )
    kept = budget_weighted_sample(docs, "doc", "source", "n_tok", alloc)
    stats = {r.source: r for r in kept.groupBy("source").agg(
        F.max("cum_weight").alias("used"), F.count("*").alias("n")
    ).collect()}
    # next unkept doc per group (rank = n+1 in hash order) would overflow
    from omfietser_etl_spark.textops.sampling import hash_bucket
    from pyspark.sql import Window
    w = Window.partitionBy("source").orderBy(hash_bucket("doc", "fixed"), F.col("doc"))
    ranked = docs.withColumn("rk", F.row_number().over(w)).collect()
    by_src: dict = {}
    for r in sorted(ranked, key=lambda r: (r.source, r.rk)):
        by_src.setdefault(r.source, []).append(r.n_tok)
    for s, budget in ((s, int(t * 0.4)) for s, t in sizes.items()):
        used = stats[s].used if s in stats else 0
        n = stats[s].n if s in stats else 0
        assert used <= budget
        if n < len(by_src[s]):  # a doc was left out → it must not fit
            assert used + by_src[s][n] > budget

    bigger = spark.createDataFrame(
        [(s, int(t * 0.7)) for s, t in sizes.items()],
        "source string, alloc_weight long",
    )
    small_set = {r.doc for r in kept.collect()}
    big_set = {r.doc for r in budget_weighted_sample(
        docs, "doc", "source", "n_tok", bigger).collect()}
    assert small_set <= big_set


def test_token_balanced_shards_balance_and_covering(spark):
    """Snake allocation: every doc gets exactly one shard, shard doc
    counts differ by ≤1, and token masses are far tighter than the
    count-equal shuffle_order baseline (within one max-doc of the
    mean by the LPT-style bound)."""
    from omfietser_etl_spark.textops.sampling import token_balanced_shards

    docs = _docs(spark).select(
        "doc", F.size(F.split("text", r"\s+")).cast("long").alias("n_tok")
    )
    s = 8
    out = token_balanced_shards(docs, "doc", "n_tok", s)
    assert out.count() == docs.count()
    per = {r.shard: (r.n, r.mass) for r in out.groupBy("shard").agg(
        F.count("*").alias("n"), F.sum("n_tok").alias("mass")).collect()}
    assert set(per) == set(range(s))
    counts = [v[0] for v in per.values()]
    assert max(counts) - min(counts) <= 1
    masses = [v[1] for v in per.values()]
    max_doc = docs.agg(F.max("n_tok")).first()[0]
    assert max(masses) - min(masses) <= 2 * max_doc
    # deterministic
    again = {(r.doc, r.shard) for r in token_balanced_shards(
        docs, "doc", "n_tok", s).collect()}
    assert {(r.doc, r.shard) for r in out.collect()} == again


def test_component_split_never_straddles_and_matches_mixture_for_singletons(spark):
    """The leakage guard: every member of a near-dup component lands
    in the SAME split; docs with no near-dup behave exactly like
    mixture_split (same salt, same thresholds)."""
    from omfietser_etl_spark.textops.sampling import component_split

    docs = spark.createDataFrame([(i,) for i in range(100)], ["doc"])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (50, 99)], ["doc_lo", "doc_hi"]
    )
    from omfietser_etl_spark.textops.dedup import connected_components

    comp = connected_components(pairs)
    out = {r.doc: (r.group_key, r.split) for r in
           component_split(docs, "doc", comp).collect()}
    assert out[1][1] == out[2][1] == out[3][1]  # one chain, one split
    assert out[10][1] == out[11][1]
    assert out[50][1] == out[99][1]
    assert out[1][0] == "1" and out[50][0] == "50"  # min-id roots

    clustered = {1, 2, 3, 10, 11, 50, 99}
    base = {r.doc: r.split for r in
            mixture_split(docs, "doc").select("doc", "split").collect()}
    for d, (_, s) in out.items():
        if d not in clustered:
            assert s == base[d]  # singleton behavior == mixture_split


def test_activity_gini_hand_checked(spark):
    """Gini closed form on hand data: perfect equality → 0; a single
    active user among idlers approaches (n−1)/n; Python replay of the
    exact formula matches (including the tie-permutation invariance
    of Σi·x over equal counts)."""
    from omfietser_etl_spark.catalog.streaming import ev8_activity_gini  # noqa: F401
    from omfietser_etl_spark.operators.rank import distributed_rank
    from pyspark.sql import functions as F

    def gini(counts):
        dec = "decimal(38,0)"
        df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(counts)], "user_id long, cnt long"
        )
        ranked = distributed_rank(
            df, [F.col("cnt"), F.col("user_id")], rank_col="_rk",
            scope="test.gini",
        )
        row = ranked.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cnt").cast("long").alias("t"),
            F.sum(F.expr(f"CAST(_rk AS {dec}) * cnt")).alias("six"),
        ).selectExpr(
            f"CAST((CAST(1000000 AS {dec}) * (2 * six - (n + 1) * "
            f"CAST(t AS {dec}))) div (CAST(n AS {dec}) * t) AS BIGINT) AS g"
        ).collect()[0]
        return row.g

    assert gini([5, 5, 5, 5]) == 0                      # perfect equality
    assert gini([0 + 1, 1, 1, 1, 96]) > 700_000          # one power user
    # Python replay with a different (but valid) tie order
    counts = [3, 1, 4, 1, 5, 9, 2, 6]
    n, t = len(counts), sum(counts)
    xs = sorted(counts)
    six = sum((i + 1) * x for i, x in enumerate(xs))
    expect = (1_000_000 * (2 * six - (n + 1) * t)) // (n * t)
    assert gini(counts) == expect


def test_domain_cap_allocation_fair_share_semantics(spark):
    """domain_cap_allocation (C4/Dolma source-cardinality cap): the
    cap is the exact integer fair share (N·bp) div (10000·D); every
    above-cap domain is allocated exactly the cap, every below-cap
    domain keeps everything; the realized sample (allocated_sample)
    never exceeds the cap and is monotone in the cap multiple."""
    from omfietser_etl_spark.textops.sampling import (
        allocated_sample,
        domain_cap_allocation,
    )

    docs = _docs(spark).select("doc", "source")
    sizes = {r.source: r.n for r in
             docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    n, d = sum(sizes.values()), len(sizes)

    alloc = {r.source: r for r in
             domain_cap_allocation(docs, "source").collect()}
    cap = n // d
    assert set(alloc) == set(sizes)
    for s, row in alloc.items():
        assert row.n_docs == sizes[s]
        assert row.cap_docs == cap
        assert row.alloc_docs == min(sizes[s], cap)

    kept = allocated_sample(
        docs, "doc", "source",
        domain_cap_allocation(docs, "source"), salt="ts20",
    )
    got = {r.source: r.n for r in
           kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for s in sizes:
        assert got.get(s, 0) == min(sizes[s], cap)

    # monotone in the cap multiple: 1.0x fair-share members ⊂ 1.5x
    small = {r.doc for r in allocated_sample(
        docs, "doc", "source",
        domain_cap_allocation(docs, "source", 10_000), salt="ts20").collect()}
    big = {r.doc for r in allocated_sample(
        docs, "doc", "source",
        domain_cap_allocation(docs, "source", 15_000), salt="ts20").collect()}
    assert small <= big
