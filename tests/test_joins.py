"""Salted-join skew utility: result parity with a plain join and
actual scatter of the hot key across salts."""

from __future__ import annotations

from pyspark.sql import functions as F

from omfietser_etl_spark.operators.joins import salted_join


def _frames(spark):
    # one hot key (90%), two cold keys
    big = spark.createDataFrame(
        [(("hot" if i % 10 != 0 else f"cold{i % 3}"), i) for i in range(200)],
        ["k", "v"],
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("cold0", "C0"), ("cold1", "C1")], ["k", "tag"]
    )
    return big, small


def test_salted_join_matches_plain_join(spark):
    big, small = _frames(spark)
    plain = big.join(small, ["k"]).select("k", "v", "tag")
    salted = salted_join(big, small, ["k"], n_salts=8).select("k", "v", "tag")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    left_plain = big.join(small, ["k"], "left").select("k", "v", "tag")
    left_salted = salted_join(big, small, ["k"], n_salts=8, how="left").select(
        "k", "v", "tag"
    )
    assert sorted(map(tuple, left_plain.collect()), key=str) == sorted(
        map(tuple, left_salted.collect()), key=str
    )


def test_salted_join_scatters_hot_key(spark):
    big, small = _frames(spark)
    salted = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col("v")), F.lit(8)),
    )
    n_salts_hit = (
        salted.filter(F.col("k") == "hot").select("_salt").distinct().count()
    )
    assert n_salts_hit >= 6  # 180 rows over 8 salts — all/most salts hit


def test_pagerank_exact_semantics(spark):
    """Hand-checked 1-iteration update on a 3-node chain, plus the
    structural invariants: dangling nodes keep the base rank; more
    in-links => more rank; Python replay of the exact integer updates
    matches the engine for all 5 iterations."""
    from omfietser_etl_spark.operators.graph import PR_SCALE, pagerank

    # a -> b, a -> c, b -> c   (c dangling)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    out = {r.node: r.rank_q for r in pagerank(edges, "src", "dst", iters=5).collect()}

    # exact Python replay
    e = [(1, 2), (1, 3), (2, 3)]
    deg = {1: 2, 2: 1}
    r = {n: PR_SCALE for n in (1, 2, 3)}
    for _ in range(5):
        s = {}
        for u, v in e:
            s[v] = s.get(v, 0) + r[u] // deg[u]
        r = {n: 150000 + (85 * s.get(n, 0)) // 100 for n in (1, 2, 3)}
    assert out == r
    assert out[1] == 150000          # no in-links: base only
    assert out[3] > out[2] > out[1]  # rank follows in-link mass


def test_triangle_counts_exact(spark):
    """K4 + pendant: every K4 node sits in exactly 3 of the 4
    triangles, the pendant in none; dup/reversed/self-loop edges
    normalize away; a star has zero triangles (the orientation's
    worst-case input produces an empty wedge set, not a hub blowup)."""
    from omfietser_etl_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = spark.createDataFrame(
        k4 + [(1, 5), (5, 1), (2, 1), (3, 3)], "u long, v long"
    )
    out = {r.node: r.n_tri for r in triangle_counts(edges, "u", "v").collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}

    star = spark.createDataFrame([(0, i) for i in range(1, 21)], "u long, v long")
    assert triangle_counts(star, "u", "v").count() == 0


def test_adamic_adar_exact_fixed_point(spark):
    """Path 1-2-3 gives the textbook single-wedge score
    (scale<<Q) // ilog2_q(2) = scale exactly; K4 minus one edge gives
    the two-common-neighbor score via ilog2_q(3); adjacent pairs are
    excluded; ordering is (aa_q desc, u, v)."""
    from omfietser_etl_spark.operators.graph import AA_SCALE, adamic_adar
    from omfietser_etl_spark.textops.selection import DSIR_Q, ilog2_q

    path = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    rows = adamic_adar(path, "u", "v").collect()
    assert [(r.u, r.v, r.aa_q) for r in rows] == [(1, 3, AA_SCALE)]

    # K4 minus edge (1,4): candidates (1,4) via {2,3}
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "u long, v long"
    )
    rows = adamic_adar(edges, "u", "v").collect()
    want = 2 * ((AA_SCALE << DSIR_Q) // ilog2_q(3))
    assert [(r.u, r.v, r.aa_q) for r in rows] == [(1, 4, want)]


def test_kcore_peeling_cascade(spark):
    """Chain 1-2-3-4-5 under k=2 peels endpoint-inward over 3 rounds
    to empty; a 4-clique with a pendant keeps exactly the clique at
    degree 3 (pendant removal cannot drag clique degrees below k);
    dup/reversed/self-loop edges normalize away."""
    from omfietser_etl_spark.operators.graph import kcore

    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "u long, v long"
    )
    assert kcore(chain, "u", "v", k=2).count() == 0

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = spark.createDataFrame(
        k4 + [(4, 9), (9, 4), (1, 1)], "u long, v long"
    )
    out = {r.node: r.deg for r in kcore(edges, "u", "v", k=3).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_fixed_rounds_semantics(spark):
    """The contract is ROUNDS synchronous updates, not convergence: a
    6-chain under k=2 needs 3 rounds to empty, so rounds=2 still
    reports the not-yet-peeled middle — and the surviving-set degree
    is computed within the survivors."""
    from omfietser_etl_spark.operators.graph import kcore

    chain6 = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "u long, v long"
    )
    out = {r.node: r.deg for r in kcore(chain6, "u", "v", k=2, rounds=2).collect()}
    assert out == {3: 1, 4: 1}
    assert kcore(chain6, "u", "v", k=2, rounds=3).count() == 0


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: every node must take
    its clique's minimum id as label (the bridge is outvoted 3-to-1
    on each side), and the two communities must stay separate."""
    from omfietser_etl_spark.operators.graph import label_propagation

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)]
    df = spark.createDataFrame(edges, "u long, v long")
    out = {r.node: r.label for r in label_propagation(df, "u", "v").collect()}
    assert {out[n] for n in (1, 2, 3, 4)} == {1}
    assert {out[n] for n in (10, 11, 12, 13)} == {10}


def test_label_propagation_tie_breaks_min_label(spark):
    """A node with an evenly split neighborhood (one neighbor labeled
    5, one labeled 9, after round 1 both keep those labels as isolated
    mutual pairs... engineered simpler: path 5—7—9) must take the
    SMALLEST most-frequent neighbor label: 7 sees {5, 9} at count 1
    each → label 5."""
    from omfietser_etl_spark.operators.graph import label_propagation

    df = spark.createDataFrame([(5, 7), (7, 9)], "u long, v long")
    out = {r.node: r.label
           for r in label_propagation(df, "u", "v", rounds=1).collect()}
    assert out[7] == 5
    # endpoints see only the center: both take 7
    assert out[5] == 7 and out[9] == 7


def test_hits_exact_semantics(spark):
    """Exact Python replay of the integer HITS rounds on a small
    bipartite graph, plus the structural invariants: the hub pointing
    at more/better authorities scores higher, pure sinks have hub 0,
    pure sources auth 0, and each score vector L1-sums to ≤ mass
    (truncating div loses < n units)."""
    from omfietser_etl_spark.operators.graph import HITS_MASS, hits

    # hubs 1,2 -> authorities 10,11; 1 points at both, 2 only at 10,
    # so 10 out-scores 11 and 1 out-scores 2 (a symmetric edge set
    # would tie both sides exactly — mass/2 each).
    e = [(1, 10), (1, 11), (2, 10)]
    edges = spark.createDataFrame(e, "src long, dst long")
    out = {r.node: (r.hub_q, r.auth_q) for r in hits(edges, "src", "dst").collect()}

    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    h = {n: 1_000_000 for n in nodes}
    a = {}
    for _ in range(3):
        raw = {}
        for u, v in e:
            raw[v] = raw.get(v, 0) + h[u]
        tot = max(sum(raw.values()), 1)
        a = {n: (raw.get(n, 0) * HITS_MASS) // tot for n in nodes}
        raw = {}
        for u, v in e:
            raw[u] = raw.get(u, 0) + a[v]
        tot = max(sum(raw.values()), 1)
        h = {n: (raw.get(n, 0) * HITS_MASS) // tot for n in nodes}
    assert out == {n: (h[n], a[n]) for n in nodes}

    assert out[10][0] == 0 and out[11][0] == 0      # sinks: hub 0
    assert out[1][1] == 0 and out[2][1] == 0        # sources: auth 0
    assert out[1][0] > out[2][0] > 0                # 1 is the best hub
    assert out[10][1] > out[11][1] > 0              # 10 the top authority
    for idx in (0, 1):
        s = sum(v[idx] for v in out.values())
        assert HITS_MASS - len(nodes) < s <= HITS_MASS


def test_modularity_two_triangles(spark):
    """Hand-checked modularity: two triangles joined by one bridge
    edge, perfect community labels → Q = 70/196 (x1e6 = 357142);
    the all-one-community labeling scores 0 by construction
    (e_c = m, d_c = 2m → 4m·m − 4m² = 0)."""
    from omfietser_etl_spark.operators.graph import modularity

    e = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    edges = spark.createDataFrame(e, "u long, v long")
    lab = spark.createDataFrame(
        [(n, 1) for n in (1, 2, 3)] + [(n, 2) for n in (4, 5, 6)],
        "node long, label long",
    )
    row = modularity(edges, lab, "u", "v").collect()[0]
    assert (row.n_communities, row.m_edges) == (2, 7)
    assert row.modularity_x1e6 == (1_000_000 * 70) // 196  # 357142

    one = spark.createDataFrame([(n, 1) for n in range(1, 7)],
                                "node long, label long")
    assert modularity(edges, one, "u", "v").collect()[0].modularity_x1e6 == 0


def test_hits_restores_aqe_cached_plan_conf(spark):
    """hits() must leave no session-conf residue: it enables AQE
    cached-plan re-planning only for its own loop (SCALING.md round 6
    — session-wide the conf breaks the CC loop's exchange-free cached
    edges), so the value observed after the call must equal the value
    before, for both settings."""
    from omfietser_etl_spark.operators.graph import hits

    key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    for prev in ("false", "true"):
        spark.conf.set(key, prev)
        hits(edges, "src", "dst", iters=1).collect()
        assert spark.conf.get(key) == prev
    spark.conf.set(key, "false")


def test_hits_rejects_zero_iters(spark):
    """ADVICE r06: iters=0 used to leave the auth frame undefined and
    crash at the final join AFTER flipping the session AQE conf —
    now it raises up front, before touching any session state."""
    import pytest

    from omfietser_etl_spark.operators.graph import hits

    key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    spark.conf.set(key, "false")
    with pytest.raises(ValueError, match="iters >= 1"):
        hits(edges, "src", "dst", iters=0)
    assert spark.conf.get(key) == "false"


def test_modularity_empty_graph_matches_oracle(spark):
    """ADVICE r06: an empty undirected edge set made the denominator
    4·m² = 0 — Spark emitted a NULL row while DuckDB raised. Both
    engines now agree on the degenerate (0 communities, 0 edges,
    NULL modularity) row via greatest(m_edges, 1)."""
    import duckdb

    from omfietser_etl_spark.operators.graph import (
        modularity,
        modularity_oracle_sql,
    )

    edges = spark.createDataFrame([(1, 1)], "u long, v long")  # self-loop only
    lab = spark.createDataFrame([(1, 1)], "node long, label long")
    row = modularity(edges, lab, "u", "v").collect()[0]
    assert (row.n_communities, row.m_edges, row.modularity_x1e6) == (0, 0, None)

    sql = modularity_oracle_sql(
        "SELECT 1 AS u, 1 AS v", "SELECT 1 AS node, 1 AS label"
    )
    orc = duckdb.sql(sql).fetchall()[0]
    assert orc == (0, 0, None)


def test_register_loop_static_restores_conf_and_caches(spark):
    """_register_loop_static must (a) leave the session AQE cached-plan
    conf exactly as found for both prior values, (b) actually register
    the cache so the loop reads one materialization, and (c) release
    on the operator's next invocation (scope discipline)."""
    from omfietser_etl_spark.cacheutil import _AQE_CACHED_KEY
    from omfietser_etl_spark.operators.graph import (
        kcore,
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    for prev in ("false", "true"):
        spark.conf.set(_AQE_CACHED_KEY, prev)
        out = kcore(edges, "src", "dst", k=2, rounds=2)
        assert spark.conf.get(_AQE_CACHED_KEY) == prev  # restored pre-action
        out.collect()
        assert spark.conf.get(_AQE_CACHED_KEY) == prev
    # LPA on the undirected view — same contract
    spark.conf.set(_AQE_CACHED_KEY, "false")
    label_propagation(edges, "src", "dst", rounds=2).collect()
    assert spark.conf.get(_AQE_CACHED_KEY) == "false"


def test_bfs_hops_path_and_shortcut(spark):
    """Path 0-1-2-3-4 seeded at node 0 (0 % 97 == 0): hop = position.
    Adding shortcut edge 0-4 must re-elect node 4 to hop 1 and node 3
    to hop 2 (min over frontier levels, not first-touch). Reversed /
    duplicate / self-loop edges normalize away."""
    from omfietser_etl_spark.operators.graph import bfs_hops

    path = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (1, 0), (2, 2)], ["u", "v"]
    )
    out = {r.node: r.hop for r in bfs_hops(path, "u", "v").collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}

    short = path.unionByName(spark.createDataFrame([(4, 0)], ["u", "v"]))
    out = {r.node: r.hop for r in bfs_hops(short, "u", "v").collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 2, 4: 1}


def test_bfs_hops_bounded_rounds_and_no_seed(spark):
    """rounds=1 reaches only direct neighbors; a component with no
    seed node stays entirely unlabeled (absent, not hop-null)."""
    from omfietser_etl_spark.operators.graph import bfs_hops

    df = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], ["u", "v"]
    )
    out = {r.node: r.hop for r in bfs_hops(df, "u", "v", rounds=1).collect()}
    assert out == {0: 0, 1: 1}
