"""Fixed-point integer PageRank — link-graph importance over an edge
frame (Page et al. 1999; the simplified no-dangling-redistribution
variant most batch pipelines run). Training-data pipelines use it to
weight crawl documents by host/link importance before sampling; here
it is the repo's canonical *fixed-iteration* iterative operator: the
loop body is pure DataFrame algebra with ZERO driver actions — the
whole K-iteration computation is ONE lazy plan, so the DuckDB oracle
replays it as K unrolled CTE steps bit-for-bit.

EXACTNESS: ranks are int64 micro-units (SCALE = 1e6 per node at
init). One update is

    r'(v) = SCALE·(den−num) div den  +  (num · Σ_{u→v} (r(u) div d(u))) div den

with num/den the damping fraction (85/100). Every operation is
integer (`div` truncates; all values non-negative, so Spark's
truncate-toward-zero and DuckDB's floor agree) — no float mass
anywhere. Dangling nodes (no out-edges) keep receiving the base term
but redistribute nothing; their leaked mass is NOT re-injected (the
classic simplification — both engines replay it identically).

Scale shape (100 TB posture):
- the whole K-iteration computation is ONE action, so the static
  edges+degree subtree appears K times in the plan and Spark's
  ReuseExchange materializes its shuffles ONCE — pagerank's static
  subtrees (distinct, groupBy) each END in an exchange, which is what
  makes them reusable; no persist() needed (round-7 A/B: caching them
  was 1.5x SLOWER). Loops whose per-round probe side has NO exchange
  (kcore/LPA join broadcast-small frames directly over the doubled
  edge union) get the opposite treatment — _register_loop_static;
  see that helper's docstring and SCALING.md round 7;
- one iteration = the edges⋈ranks hash join + one groupBy(dst) + a
  node-keyed left join: shuffles of rank-sized frames, all parallel,
  partition counts AQE-sized;
- K is fixed (default 5): no convergence count action, no driver
  round-trips — the scheduler pipelines all K stages. A caller that
  runs MANY actions over the result should persist the returned
  frame (each action replays the loop otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000
PR_NUM = 85      # damping numerator
PR_DEN = 100     # damping denominator

def _register_loop_static(df: DataFrame, scope: str) -> DataFrame:
    """Persist a loop-static frame under ``scope`` with AQE allowed to
    re-plan reads of the cached partitions (cacheutil.
    persist_replannable — the shared save/set/restore discipline).

    Why (round-7 A/B at sf0.1, kcore): the per-round joins broadcast
    the small rank/alive/label side, so WITHOUT a cache the whole
    edge-build subtree (e.g. the lineitem self-join) re-executes every
    round — ReuseExchange never fires because the probe side has no
    exchange (~6.5 s). A plain .persist() fixes the recompute but PINS
    the cached plan's 200/400-partition layout, and every round then
    schedules hundreds of near-empty tasks (~12 s — WORSE). Persisting
    replannable gets both: one materialization AND AQE-coalesced
    reads (~3.9 s). The cache is freed by the NEXT invocation of the
    same operator (cacheutil.release at entry) — the hits()/CC-loop
    discipline for repeated catalog runs."""
    from omfietser_etl_spark import cacheutil

    return cacheutil.persist_replannable(scope, df)


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iters: int = 5,
    scale: int = PR_SCALE,
    damp_num: int = PR_NUM,
    damp_den: int = PR_DEN,
) -> DataFrame:
    """(node, rank_q) after ``iters`` exact integer PageRank updates
    over the DISTINCT directed edge set. Nodes = sources ∪ sinks.

    Deliberately NOT cached (unlike kcore/LPA): pagerank's loop-static
    subtrees (e.distinct(), deg, nodes) all end in their own shuffle
    exchanges, which ReuseExchange DOES dedupe across rounds here —
    the round-7 A/B measured the _register_loop_static treatment at
    8.7 s vs 5.6 s lazy at sf0.1 (the caches add materialization
    passes without removing any recompute). The kcore/LPA shape is
    different: their per-round probe side has no exchange (broadcast
    join directly over the doubled-edge union), so nothing is
    reusable without a cache."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ewd = e.join(deg, "src")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )

    base_q = (scale * (damp_den - damp_num)) // damp_den
    ranks = nodes.withColumn("rank_q", F.lit(scale).cast("long"))
    for _ in range(iters):
        sums = (
            ewd.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("rank_q div deg").alias("c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(base_q)
                + F.expr(f"({damp_num} * coalesce(s, 0L)) div {damp_den}")
            ).cast("long").alias("rank_q"),
        )
    return ranks


def pagerank_oracle_sql(
    edges_cte: str,
    iters: int = 5,
    scale: int = PR_SCALE,
    damp_num: int = PR_NUM,
    damp_den: int = PR_DEN,
) -> str:
    """DuckDB twin: ``edges_cte`` must define a CTE body producing
    (src, dst) DISTINCT rows; returns a full query ending in
    (node, rank_q) — the same K updates unrolled as CTE steps."""
    base_q = (scale * (damp_den - damp_num)) // damp_den
    steps = [
        f"e AS ({edges_cte})",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM nodes)",
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        steps.append(
            f"s{i} AS (SELECT e.dst AS node, "
            f"CAST(SUM({prev}.r // deg.deg) AS BIGINT) AS s "
            f"FROM e JOIN deg USING (src) "
            f"JOIN {prev} ON {prev}.node = e.src GROUP BY e.dst)"
        )
        steps.append(
            f"r{i} AS (SELECT n.node, CAST({base_q} + "
            f"({damp_num} * coalesce(s{i}.s, 0)) // {damp_den} AS BIGINT) AS r "
            f"FROM nodes n LEFT JOIN s{i} ON s{i}.node = n.node)"
        )
        prev = f"r{i}"
    return (
        "WITH " + ", ".join(steps)
        + f" SELECT node, r AS rank_q FROM {prev}"
    )


# ---------------------------------------------------------------------------
# Triangle counting — degree-ordered orientation (Suri & Vassilvitskii,
# WWW 2011 "Counting triangles and the curse of the last reducer").
# ---------------------------------------------------------------------------

def triangle_counts(edges: DataFrame, u_col: str, v_col: str) -> DataFrame:
    """(node, n_tri) — EXACT per-node triangle counts over the
    undirected simple graph induced by ``edges`` (self-loops dropped,
    direction and duplicates collapsed).

    Scale shape (the whole point of the operator): the naive wedge
    join explodes on hubs — a degree-d node generates C(d,2) wedges,
    so one hot key serializes the reducer (the paper's "last
    reducer"). Degree-ordered orientation fixes it: orient every edge
    from the (degree, id)-smaller endpoint to the larger, so every
    triangle {a<b<c in rank} is generated exactly once, at its
    LOWEST-rank vertex, and the max out-degree is O(√m) for ANY
    graph (a node keeps only neighbors of higher rank; more than
    ~√2m of those would force Σdeg > 2m). Wedges therefore total
    O(m^{3/2}) worst-case instead of Σ C(deg,2): a star graph goes
    from C(n,2) wedges to zero. Measured on the part co-occurrence
    graph: raw max degree 206→out-degree 90 (sf0.01), 222→97
    (sf0.1) — the √m cap in action while raw wedges stay 3.5× above
    oriented ones.

    Plan: the oriented edge frame ``w`` feeds THREE consumers (both
    wedge sides + the closing join). ``repartition(src)`` roots it in
    an explicit exchange so single-materialization is STRUCTURAL: all
    three consumers reference one identical exchange node, which
    ReuseExchange collapses by construction — and ``src`` is the
    wedge self-join key, so both wedge sides read the reused exchange
    already co-partitioned (no extra wedge-side shuffles). Round-9
    autopsy of the round-8 "recomputes its subtree" verdict: counting
    nodes in the FINAL-plan tree only (everything before
    ``== Initial Plan ==`` — the formatted explain's node-details
    section covers BOTH trees and inflates counts), the executed
    adaptive plan holds exactly ONE parquet scan and 13
    ReusedExchanges with or without this root exchange; AQE's
    canonical-form stage reuse already recovered the duplication at
    runtime, and total exchange count (9 + 18 ShuffleQueryStages) and
    wall time (~6 s warm at sf0.1/local[32]) are identical both ways.
    The explicit root is kept because it does not rely on consumer
    exchanges happening to canonicalize identically. Persisting
    ``und``+``w`` eagerly instead was measured SLOWER (8.5 s vs
    6.5 s warm: two count() barriers serialize what the scheduler
    pipelines) — the module docstring's round-7 A/B holds here too.
    Everything stays zero-driver-action, one lazy plan,
    ``tests/test_plans.py::test_g2_final_plan_scans_once`` pins the
    scan-once shape.
    """
    a, b = F.col(u_col), F.col(v_col)
    und = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .distinct()
    )
    both = und.select("u", "v").unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = both.groupBy(F.col("u").alias("n")).agg(F.count("*").alias("d"))
    # orient: src = (deg, id)-smaller endpoint; carry the dst rank key
    w = (
        both.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(
            deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v"
        )
        .filter((F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"),
                F.col("dv").alias("ddst"))
        .repartition("src")  # exchange root: ReuseExchange shares it 3x
    )
    e1 = w.select(F.col("src"), F.col("dst").alias("lo"), F.col("ddst").alias("dlo"))
    e2 = w.select(F.col("src"), F.col("dst").alias("hi"), F.col("ddst").alias("dhi"))
    wedges = (
        e1.join(e2, "src")
        .filter((F.col("dlo") < F.col("dhi"))
                | ((F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))))
        .select("src", "lo", "hi")
    )
    closing = w.select(F.col("src").alias("lo"), F.col("dst").alias("hi"))
    # Closing join strategy (round 12, guide §3.1): the wedge side is
    # O(m^{3/2}) rows (41M at sf0.1) and ~20x larger than the closing
    # edge side (1.2M); the default SortMergeJoin SORTS the wedge
    # stream, and that 41M-row sort both dominated the stage and made
    # it spill-prone (g2 swung 5.3-21.2 s across same-code bench
    # windows — the sort's spill luck). SHUFFLE_HASH builds the hash
    # table from the EDGE side per partition (edges/shuffle-partitions
    # rows each — scale-safe: no broadcast, no driver collect) and
    # streams the wedges through unsorted. A/B at sf0.1/local[32],
    # median of 3 x2 interleaved rounds: SMJ 9.1/12.0 s vs
    # SHUFFLE_HASH 3.8/5.9 s, and the run-to-run spread collapsed
    # ([3.66..3.99] vs [7.6..14.4]). Broadcast(closing) was also
    # measured (6.0/8.1 s) and rejected: slower here and the edge set
    # scales with the corpus, so a broadcast would OOM at 100 TB.
    tri = wedges.join(closing.hint("shuffle_hash"), ["lo", "hi"])
    return (
        tri.select(
            F.explode(F.array(F.col("src"), F.col("lo"), F.col("hi"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_tri"))
    )


def triangle_counts_oracle_sql(edges_cte: str) -> str:
    """DuckDB twin of :func:`triangle_counts`: ``edges_cte`` is a CTE
    body producing (u, v) rows (any direction / dups / self-loops —
    normalized here identically to the engine side)."""
    return f"""
WITH raw AS ({edges_cte}),
und AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
        FROM raw WHERE u <> v),
both_ AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
deg AS (SELECT u AS n, CAST(count(*) AS BIGINT) AS d FROM both_ GROUP BY u),
o AS (SELECT b.u AS src, b.v AS dst, dv.d AS ddst
      FROM both_ b JOIN deg du ON du.n = b.u JOIN deg dv ON dv.n = b.v
      WHERE (du.d < dv.d) OR (du.d = dv.d AND b.u < b.v)),
wedges AS (SELECT e1.src, e1.dst AS lo, e2.dst AS hi
           FROM o e1 JOIN o e2 ON e1.src = e2.src
           WHERE (e1.ddst < e2.ddst)
              OR (e1.ddst = e2.ddst AND e1.dst < e2.dst)),
tri AS (SELECT w.src, w.lo, w.hi
        FROM wedges w JOIN o ON o.src = w.lo AND o.dst = w.hi),
nodes AS (SELECT src AS node FROM tri
          UNION ALL SELECT lo FROM tri
          UNION ALL SELECT hi FROM tri)
SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM nodes GROUP BY node
"""


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction (Adamic & Adar 2003, "Friends and
# neighbors on the Web") — exact fixed-point scoring via the repo's
# integer-log2 primitive (textops/selection.ilog2_q_expr).
# ---------------------------------------------------------------------------

AA_SCALE = 1_000_000


def adamic_adar(
    edges: DataFrame,
    u_col: str,
    v_col: str,
    k: int = 50,
    scale: int = AA_SCALE,
) -> DataFrame:
    """Top-``k`` non-adjacent pairs (u, v, aa_q) by Adamic-Adar score
    over the undirected simple graph from ``edges``. The score is the
    classic Σ_{z ∈ N(u)∩N(v)} 1/log₂ deg(z), held EXACT in integer
    fixed point: per-center term_q = (scale·2^Q) div ilog2_q(deg z)
    (every common neighbor has deg ≥ 2, so the divisor is ≥ 2^Q > 0),
    summed per pair — bit-identical in Spark and the DuckDB oracle.

    Scale shape: wedge generation is the cost — Σ C(deg z, 2) pairs
    through each center — and 1/log deg makes hub centers BOTH the
    quadratic blow-up and the least informative signal, so production
    AA runs on a support-pruned graph (the catalog feeds co-occurrence
    edges with support ≥ 2) and/or drops hub centers; the per-center
    term is computed once on the degree frame (node-keyed) and
    broadcast-joined into the wedge stream, never recomputed per pair.
    The final top-k is orderBy+limit → TakeOrderedAndProject
    (per-partition heap + driver merge of k rows, no global sort).
    Plan: degree groupBy, center self-join, pair groupBy, edge
    anti-join — all equi-keyed, zero driver actions.
    """
    from omfietser_etl_spark.textops.selection import DSIR_Q, ilog2_q_expr

    a, b = F.col(u_col), F.col(v_col)
    und = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .distinct()
    )
    both = und.select("u", "v").unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = both.groupBy(F.col("u").alias("n")).agg(F.count("*").alias("d"))
    term = deg.filter(F.col("d") >= 2).select(
        F.col("n").alias("z"),
        F.expr(f"({scale}L * {1 << DSIR_Q}L) div ({ilog2_q_expr('d')})")
        .cast("long")
        .alias("term_q"),
    )
    n1 = both.select(F.col("u").alias("z"), F.col("v").alias("pu"))
    n2 = both.select(F.col("u").alias("z"), F.col("v").alias("pv"))
    pairs = (
        n1.join(n2, "z")
        .filter(F.col("pu") < F.col("pv"))
        .join(term, "z")
        .groupBy(F.col("pu").alias("u"), F.col("pv").alias("v"))
        .agg(F.sum("term_q").cast("long").alias("aa_q"))
    )
    nonadj = pairs.join(und, ["u", "v"], "left_anti")
    return nonadj.orderBy(F.col("aa_q").desc(), "u", "v").limit(k)


def adamic_adar_oracle_sql(
    edges_cte: str,
    ilog2_chain: "Callable[[str], str]",
    k: int = 50,
    scale: int = AA_SCALE,
) -> str:
    """DuckDB twin of :func:`adamic_adar`. ``ilog2_chain`` is the
    catalog's dk_ilog2_chain partially applied to (src) — passed in to
    keep the operator layer free of catalog imports."""
    from omfietser_etl_spark.textops.selection import DSIR_Q

    return f"""
WITH raw AS ({edges_cte}),
und AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
        FROM raw WHERE u <> v),
both_ AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
deg AS (SELECT u AS n, CAST(count(*) AS BIGINT) AS d FROM both_ GROUP BY u),
vals AS (SELECT DISTINCT d AS x FROM deg WHERE d >= 2),
{ilog2_chain('vals')},
term AS (SELECT deg.n AS z,
                CAST((CAST({scale} AS BIGINT) * CAST({1 << DSIR_Q} AS BIGINT)) // il.il AS BIGINT) AS term_q
         FROM deg JOIN il ON il.x = deg.d WHERE deg.d >= 2),
pairs AS (SELECT n1.v AS u, n2.v AS v,
                 CAST(SUM(term.term_q) AS BIGINT) AS aa_q
          FROM both_ n1 JOIN both_ n2 ON n1.u = n2.u AND n1.v < n2.v
          JOIN term ON term.z = n1.u
          GROUP BY 1, 2),
nonadj AS (SELECT p.* FROM pairs p ANTI JOIN und
           ON und.u = p.u AND und.v = p.v)
SELECT u, v, aa_q FROM nonadj ORDER BY aa_q DESC, u, v LIMIT {k}
"""


# ---------------------------------------------------------------------------
# k-core decomposition — unrolled synchronous peeling (Matula & Beck
# 1983; the batch "remove all degree<k nodes each round" variant).
# ---------------------------------------------------------------------------

def kcore(
    edges: DataFrame,
    u_col: str,
    v_col: str,
    k: int = 3,
    rounds: int = 5,
) -> DataFrame:
    """(node, deg) — nodes surviving ``rounds`` synchronous peel
    rounds of the k-core reduction over the undirected simple graph
    from ``edges`` (self-loops dropped, duplicates/direction
    collapsed), with ``deg`` their degree WITHIN the surviving set.
    Equals the true k-core whenever peeling converges within
    ``rounds`` (each round removes every node whose current degree is
    below ``k`` simultaneously); the fixed-round semantics is what
    both engines replay bit-for-bit — exactly the g1_pagerank
    contract.

    The recurrence is deliberately SINGLE-REFERENCE: dead nodes can
    never resurrect (the alive set only shrinks, so a node that
    dropped below k sees only fewer alive neighbors later), hence

        alive_{i+1} = { v : #{ u in alive_i : (u,v) edge } >= k }

    needs no "v in alive_i" conjunct — each round references alive_i
    ONCE, so the unrolled lazy plan grows linearly in ``rounds`` (a
    naive edge-subgraph recurrence references its predecessor 5x per
    round and explodes the logical tree exponentially). Zero driver
    actions: one plan, K chained (join on u, groupBy v) stages over
    the static doubled-edge frame, persisted for the loop's lifetime
    via _register_loop_static (the per-round join broadcasts the
    small alive side, so ReuseExchange has no edge-side exchange to
    dedupe — see the pagerank module docstring).
    """
    from omfietser_etl_spark import cacheutil

    cacheutil.release("kcore")
    a, b = F.col(u_col), F.col(v_col)
    und = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .distinct()
    )
    both = _register_loop_static(
        und.unionByName(
            und.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ),
        "kcore",
    )
    alive = both.select(F.col("u").alias("node")).distinct()
    for _ in range(rounds):
        alive = (
            both.join(alive.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= k)
            .select("node")
        )
    return (
        both.join(alive.withColumnRenamed("node", "u"), "u")
        .join(alive.withColumnRenamed("node", "v"), "v")
        .groupBy(F.col("v").alias("node"))
        .agg(F.count("*").cast("long").alias("deg"))
    )


def kcore_oracle_sql(
    edges_cte: str, k: int = 3, rounds: int = 5
) -> str:
    """DuckDB twin of :func:`kcore`: the same ``rounds`` peel updates
    unrolled as CTE steps over (u, v) rows from ``edges_cte``."""
    steps = [
        f"raw AS ({edges_cte})",
        "und AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v"
        " FROM raw WHERE u <> v)",
        "both_ AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und)",
        "a0 AS (SELECT DISTINCT u AS node FROM both_)",
    ]
    prev = "a0"
    for i in range(1, rounds + 1):
        steps.append(
            f"a{i} AS (SELECT b.v AS node FROM both_ b "
            f"JOIN {prev} p ON p.node = b.u "
            f"GROUP BY b.v HAVING count(*) >= {k})"
        )
        prev = f"a{i}"
    return (
        "WITH " + ", ".join(steps)
        + f" SELECT b.v AS node, CAST(count(*) AS BIGINT) AS deg "
        f"FROM both_ b JOIN {prev} x ON x.node = b.u "
        f"JOIN {prev} y ON y.node = b.v GROUP BY b.v"
    )


def label_propagation(
    edges: DataFrame,
    u_col: str,
    v_col: str,
    rounds: int = 3,
) -> DataFrame:
    """(node, label) after ``rounds`` SYNCHRONOUS label-propagation
    updates (Raghavan et al. 2007) over the undirected simple graph
    from ``edges`` — the near-linear community detector crawl/corpus
    pipelines run to group documents by link or co-occurrence
    structure before per-community sampling caps.

    Every node starts labeled with its own id; each round relabels
    every node with the most frequent label among its neighbors,
    ties broken by the SMALLEST label — both choices exact integer,
    so the fixed-round result replays bit-for-bit in the oracle (the
    g1/g4 contract; classic async LPA with random tie-breaks is
    deliberately NOT replayable). Synchronous LPA can oscillate on
    bipartite structure instead of converging — fixed rounds make
    that a defined, replayed outcome rather than a hang.

    The argmax is ONE aggregate — max of the (count, −label) struct,
    whose lexicographic order encodes count-desc-then-label-asc — so
    each round references its predecessor exactly once: the unrolled
    lazy plan grows linearly in ``rounds`` (kcore's single-reference
    recurrence note), zero driver actions, and the static doubled-edge
    frame persists for the loop's lifetime via _register_loop_static
    (broadcast per-round joins leave ReuseExchange nothing to dedupe —
    see the pagerank module docstring).

    Scale shape per round: one hash join (labels onto edge sources,
    both label-frame-sized and edge-frame-sized shuffles on node
    keys) + one (v, label) hash agg + one v agg. Hub nodes make hot
    (v, label) keys; the two-level agg (partial map-side combine)
    absorbs them exactly as in triangle counting.
    """
    from omfietser_etl_spark import cacheutil

    cacheutil.release("lpa")
    a, b = F.col(u_col), F.col(v_col)
    und = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .distinct()
    )
    both = _register_loop_static(
        und.unionByName(
            und.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ),
        "lpa",
    )
    labels = both.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(rounds):
        labels = (
            both.join(labels.withColumnRenamed("node", "u"), "u")
            .groupBy("v", "label")
            .agg(F.count("*").alias("c"))
            .groupBy(F.col("v").alias("node"))
            .agg(
                F.max(
                    F.struct(
                        F.col("c"), (-F.col("label")).alias("nl")
                    )
                ).alias("m")
            )
            .select("node", (-F.col("m.nl")).alias("label"))
        )
    return labels


def label_propagation_oracle_sql(edges_cte: str, rounds: int = 3) -> str:
    """DuckDB twin of :func:`label_propagation`: the same synchronous
    updates unrolled as CTE steps; the struct-argmax is replayed as
    max-count-then-min-label two-step grouping (provably the same
    choice as the (count, −label) struct max)."""
    steps = [
        f"raw AS ({edges_cte})",
        "und AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v"
        " FROM raw WHERE u <> v)",
        "both_ AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und)",
        "l0 AS (SELECT DISTINCT u AS node, u AS label FROM both_)",
    ]
    prev = "l0"
    for i in range(1, rounds + 1):
        steps.append(
            f"v{i} AS (SELECT b.v, p.label, count(*) AS c "
            f"FROM both_ b JOIN {prev} p ON p.node = b.u "
            f"GROUP BY b.v, p.label)"
        )
        steps.append(
            f"m{i} AS (SELECT v, max(c) AS mc FROM v{i} GROUP BY v)"
        )
        steps.append(
            f"l{i} AS (SELECT t.v AS node, min(t.label) AS label "
            f"FROM v{i} t JOIN m{i} m ON t.v = m.v AND t.c = m.mc "
            f"GROUP BY t.v)"
        )
        prev = f"l{i}"
    return (
        "WITH " + ", ".join(steps)
        + f" SELECT CAST(node AS BIGINT) AS node,"
        f" CAST(label AS BIGINT) AS label FROM {prev}"
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg 1999, JACM 46(5)) — the classic
# complement to PageRank on bipartite-ish link data: hubs point at
# good authorities, authorities are pointed at by good hubs.
# ---------------------------------------------------------------------------

#: fixed L1 mass each score vector is renormalized to per round —
#: integer HITS normalizes to Σ = MASS instead of the float L2 norm,
#: which keeps every update exact (truncating div; both engines agree
#: on non-negatives) and every stored score ≤ MASS in int64.
HITS_MASS = 1_000_000_000_000

#: scale-adaptive sizing for the HITS loop shuffles. Deliberately
#: SMALLER than the CC loops' 200k rows/partition: a CC round shuffles
#: label-sized frames, but every HITS half-round joins the FULL edge
#: set against the score vector, so the loop wants join parallelism.
#: Interleaved A/B on g6 (587k edges, sf0.1/local[32], medians of 3):
#: n_parts 3 → 5.39 s, 8 → 4.53 s, 16 → 4.35 s, 32 → 4.41 s; 40k
#: rows/partition lands at 15 here, within noise of the best, while a
#: ~200-edge graph still collapses to single-task rounds under the
#: vanilla 200-partition session.
HITS_ROWS_PER_PARTITION = 40_000


def hits(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iters: int = 3,
    mass: int = HITS_MASS,
) -> DataFrame:
    """(node, hub_q, auth_q) after ``iters`` synchronous exact-integer
    HITS rounds over the DISTINCT directed edge set: a ← Σ_in h then
    L1-renormalize to ``mass``, h ← Σ_out a then renormalize. Pure
    source-only nodes carry auth_q = 0 and sink-only nodes hub_q = 0
    (natural on bipartite graphs like customer→supplier).

    EXACTNESS: scores are int64 (≤ mass); the per-node raw sums and
    the rescale product are staged DECIMAL(38,0) — raw ≤ tot and
    raw·mass ≤ E·mass², inside decimal38 up to E ≈ 10^14 edges — and
    DuckDB replays them in HUGEINT. Zero total mass (no edges) guards
    to an all-zero vector via greatest(tot, 1).

    Scale shape: each half-round is one edges⋈scores hash join + a
    node-keyed sum, and each L1 total is a global agg whose
    SinglePartition exchange carries partial rows only, broadcast
    back as a LITERAL via a bounded one-row collect per half-round
    (2K driver round-trips for fixed K — the DSIR lambda-fit
    precedent). UNLIKE pagerank's zero-action loop, a lazy
    broadcast-total would reference each raw frame twice and square
    the subtree every half-round (measured 37 s at gate scale for
    K=3, ~8 s with literals); raw frames persist under the "hits"
    cache scope (node-sized, freed on the next invocation; the
    CC-loop precedent in textops/dedup.py).
    """
    from omfietser_etl_spark import cacheutil

    if iters < 1:
        # iters=0 would leave the auth frame undefined at the final
        # h⋈a join (and flip the session conf for nothing) — there is
        # no meaningful zero-round HITS, so fail before touching any
        # session state.
        raise ValueError(f"hits() requires iters >= 1, got {iters}")
    cacheutil.release("hits")
    # Let AQE re-plan the cached/checkpointed materializations for
    # the DURATION OF THE LOOP (38.8 s -> ~7 s at gate scale under
    # the vanilla 200-partition driver session: near-empty task
    # scheduling dominates otherwise), then restore: the conf is
    # session-global, and leaking it would let AQE disturb
    # deliberately pre-partitioned cached frames in LATER queries
    # (the CC loop's exchange-free edges join depends on its cached
    # hashpartitioning surviving). MUST be set before e/nodes
    # persist below — a cached plan's output partitioning is fixed
    # when the plan is first registered with the cache manager, not
    # when it materializes.
    conf_key = cacheutil._AQE_CACHED_KEY
    spark = edges.sparkSession
    try:
        prev = spark.conf.get(conf_key)
    except Exception:  # noqa: BLE001 — unset and no default
        prev = None
    spark.conf.set(conf_key, "true")
    dec = "decimal(38,0)"
    # e and nodes feed every one of the 2K half-round actions (the
    # literal-total collects defeat single-plan ReuseExchange), so
    # both persist for the loop's lifetime in the same scope.
    e = cacheutil.register(
        "hits",
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).distinct().persist(),
    )
    # Scale-adaptive loop layout (round 13 — the CC-loop treatment,
    # guide §2.2): every half-round shuffle (the e⋈score join, the
    # node-keyed sums, the nodes left join) otherwise runs at the
    # session conf on iteration-sized frames — 32 (bench) / 200
    # (vanilla) near-empty tasks per stage across 6 half-rounds × 2
    # actions each. The count reads the persisted edge frame (doubles
    # as its materialization, replacing the first half-round's cache
    # fill); a 100 TB edge set still gets the full conf layout.
    # SINGLE-THREADED-SESSION REQUIREMENT as in the CC loops
    # (textops/dedup.py): the conf is session-global; restored in the
    # same finally as the AQE conf below.
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        n_parts = max(
            1,
            min(
                int(prev_shuffle),
                -(-e.count() // HITS_ROWS_PER_PARTITION),
            ),
        )
    except Exception:
        # the count can fail on bad input — don't leak the AQE conf
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
        raise
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    nodes = cacheutil.register(
        "hits",
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct().persist(),
    )

    def _norm(raw_df, out_col):
        # Bounded one-row collect (the DSIR lambda-fit precedent):
        # embedding the L1 total as a literal keeps the recurrence
        # single-reference — a broadcast-total crossJoin would
        # reference raw_df twice and square the lazy subtree every
        # half-round (measured 25 s Spark-side at gate scale; ~4 s
        # with the literal). raw_df is persisted so the collect and
        # the downstream projection share one materialization.
        #
        # SPARSE scores (round 13): nodes absent from raw_df have raw
        # sum 0 → rescaled score 0 → contribute NOTHING to the next
        # half-round's sums and nothing to any L1 total, so the
        # per-half-round nodes-LEFT-join that densified every score
        # vector was pure overhead (6 extra shuffled joins + their
        # checkpoint weight per run). Scores stay sparse through the
        # loop; density (explicit 0 rows) is restored ONCE in the
        # final assembly below — bit-identical output.
        raw_df = cacheutil.register("hits", raw_df.persist())
        tot = raw_df.agg(F.sum("raw")).collect()[0][0]
        tot = max(int(tot or 0), 1)
        out = raw_df.select(
            "node",
            F.expr(
                f"CAST((raw * {mass}) div CAST('{tot}' AS {dec}) AS BIGINT)"
            ).alias(out_col),
        )
        # localCheckpoint (tracked, freed with the scope) truncates
        # lineage per half-round: without it the nested
        # InMemoryRelation plan strings grow enough to OOM the
        # vanilla 1g driver heap at K=3, and every action replays
        # the join chain through 2K shuffle stages.
        ck, ids = cacheutil.tracked_local_checkpoint(out)
        cacheutil.register_rdd_ids("hits", out.sparkSession.sparkContext, ids)
        return ck

    h = nodes.withColumn("h", F.lit(1_000_000).cast("long"))
    a = None
    try:
        for _ in range(iters):
            a_raw = (
                e.join(h.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("h").cast(dec)).alias("raw"))
            )
            a = _norm(a_raw, "a")
            h_raw = (
                e.join(a.withColumnRenamed("node", "dst"), "dst")
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum(F.col("a").cast(dec)).alias("raw"))
            )
            h = _norm(h_raw, "h")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    # densify once: pure source-only nodes never appear in an auth
    # frame (auth_q = 0) and sink-only nodes never in a hub frame —
    # the old per-half-round left joins materialized those zeros
    # every round; one terminal left join per vector is enough.
    return (
        nodes.join(h, "node", "left")
        .join(a, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hub_q"),
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("auth_q"),
        )
    )


def hits_oracle_sql(edges_cte: str, iters: int = 3, mass: int = HITS_MASS) -> str:
    """DuckDB twin of :func:`hits`: same K rounds unrolled as CTE
    steps, raw sums and rescales in HUGEINT (SUM(BIGINT) widens
    automatically), truncating // on non-negatives ≡ Spark's div."""
    # MATERIALIZED: e and nodes are referenced in every unrolled step
    # and DuckDB would otherwise inline-recompute them per reference
    # (measured 7.9 s -> 0.6 s at gate scale).
    steps = [
        f"e AS MATERIALIZED ({edges_cte})",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h FROM nodes)",
    ]
    for i in range(1, iters + 1):
        p = f"h{i - 1}"
        steps.append(
            f"ar{i} AS (SELECT e.dst AS node, SUM({p}.h) AS raw "
            f"FROM e JOIN {p} ON {p}.node = e.src GROUP BY e.dst)"
        )
        steps.append(f"at{i} AS (SELECT SUM(raw) AS tot FROM ar{i})")
        steps.append(
            f"a{i} AS (SELECT n.node, CAST((COALESCE(ar.raw, 0) * {mass}) // "
            f"greatest(at.tot, 1) AS BIGINT) AS a "
            f"FROM nodes n LEFT JOIN ar{i} ar ON ar.node = n.node CROSS JOIN at{i} at)"
        )
        steps.append(
            f"hr{i} AS (SELECT e.src AS node, SUM(a{i}.a) AS raw "
            f"FROM e JOIN a{i} ON a{i}.node = e.dst GROUP BY e.src)"
        )
        steps.append(f"ht{i} AS (SELECT SUM(raw) AS tot FROM hr{i})")
        steps.append(
            f"h{i} AS (SELECT n.node, CAST((COALESCE(hr.raw, 0) * {mass}) // "
            f"greatest(ht.tot, 1) AS BIGINT) AS h "
            f"FROM nodes n LEFT JOIN hr{i} hr ON hr.node = n.node CROSS JOIN ht{i} ht)"
        )
    return (
        "WITH " + ", ".join(steps)
        + f" SELECT h{iters}.node, h{iters}.h AS hub_q, a{iters}.a AS auth_q "
        f"FROM h{iters} JOIN a{iters} USING (node)"
    )


# ---------------------------------------------------------------------------
# Modularity (Newman & Girvan 2004) — partition quality of a community
# labeling; the standard acceptance check on LPA output before using
# communities for per-group sampling caps.
# ---------------------------------------------------------------------------

def modularity(
    edges: DataFrame,
    labels: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
) -> DataFrame:
    """ONE row (n_communities, m_edges, modularity_x1e6) scoring a
    (node, label) partition over the undirected simple graph of
    ``edges``: Q = Σ_c [e_c/m − (d_c/2m)²].

    EXACTNESS: Q·4m² = Σ_c (4·m·e_c − d_c²) is a pure integer —
    staged DECIMAL(38,0) (d_c ≤ 2m, so terms reach 4m² ≈ 4·10^24 at
    10^12 edges) and emitted as the bounded millionths ratio
    sign(q)·((10^6·|q|) div 4m²): the sign is split out because Q can
    be negative and Spark's `div` truncates toward zero while other
    engines floor — on |q| both agree.

    Scale shape: two label joins onto the edge list (node-keyed),
    one degree agg, two label-keyed rollups, and a one-row global agg
    — no windows, no driver actions beyond the caller's.
    """
    dec = "decimal(38,0)"
    und = (
        edges.select(
            F.least(u_col, v_col).alias("u"), F.greatest(u_col, v_col).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # labels is referenced THREE times below (the lu/lv sides of the
    # within-community edge count and the degree rollup); when the
    # caller passes an expensive lazy frame (g7 passes the whole LPA
    # loop) each reference re-executes it. Persist under the loop-
    # static discipline: round-7 A/B at sf0.1 measured 9.3 s -> 3.7 s.
    from omfietser_etl_spark import cacheutil

    cacheutil.release("modularity")
    lab = _register_loop_static(
        labels.select(F.col("node"), F.col("label")), "modularity"
    )
    ec = (
        und.join(lab.withColumnRenamed("node", "u")
                 .withColumnRenamed("label", "lu"), "u")
        .join(lab.withColumnRenamed("node", "v")
              .withColumnRenamed("label", "lv"), "v")
        .filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_c"))
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    dc = (
        deg.join(lab, "node")
        .groupBy("label")
        .agg(F.sum("d").cast("long").alias("d_c"))
    )
    m = und.agg(F.count(F.lit(1)).cast("long").alias("m_edges"))
    percom = dc.join(ec, "label", "left").select(
        "label", F.coalesce("e_c", F.lit(0)).alias("e_c"), "d_c"
    )
    q = percom.crossJoin(F.broadcast(m)).agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.max("m_edges").alias("m_edges"),
        F.sum(
            F.expr(f"4 * CAST(m_edges AS {dec}) * e_c - CAST(d_c AS {dec}) * d_c")
        ).alias("q_num"),
    )
    # Empty-graph guard: m_edges = 0 makes the denominator 0 — Spark
    # (non-ANSI) would emit a NULL row while DuckDB raises, a silent
    # engine divergence on degenerate input. Q is 0/undefined on an
    # empty edge set anyway, so greatest(m_edges, 1) keeps both
    # engines on the same (NULL-modularity, 0-edge) row; m_edges
    # itself coalesces to 0 because Spark's max() over the empty
    # per-community frame is NULL where the oracle's count(*) is 0.
    return q.select(
        "n_communities",
        F.coalesce(F.col("m_edges"), F.lit(0).cast("long")).alias("m_edges"),
        F.expr(
            f"CAST(CASE WHEN q_num < 0 THEN -1 ELSE 1 END * "
            f"((CAST(1000000 AS {dec}) * abs(q_num)) div "
            f"(4 * CAST(greatest(m_edges, 1) AS {dec}) * greatest(m_edges, 1)))"
            f" AS BIGINT)"
        ).alias("modularity_x1e6"),
    )


def modularity_oracle_sql(edges_cte: str, labels_sql: str) -> str:
    """DuckDB twin of :func:`modularity`; ``labels_sql`` is a full
    query yielding (node, label) — typically a label-propagation
    oracle — embedded as a materialized derived table."""
    # CTE names are q7_-prefixed: the embedded labels_sql defines its
    # own raw/und/both_ steps, and DuckDB resolves colliding nested
    # CTE names against the OUTER binding — with MATERIALIZED hints
    # that manifests as a spurious "recursive CTE scan" internal
    # error.
    return f"""
WITH q7_raw AS ({edges_cte}),
q7_und AS MATERIALIZED (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
       FROM q7_raw WHERE u <> v),
q7_lab AS MATERIALIZED (SELECT * FROM ({labels_sql}) AS _l),
q7_m AS (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM q7_und),
q7_ec AS (SELECT la.label AS label, CAST(count(*) AS BIGINT) AS e_c
       FROM q7_und JOIN q7_lab la ON la.node = q7_und.u
                   JOIN q7_lab lb ON lb.node = q7_und.v
       WHERE la.label = lb.label GROUP BY 1),
q7_deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM q7_und UNION ALL SELECT v FROM q7_und)
        GROUP BY node),
q7_dc AS (SELECT q7_lab.label, CAST(SUM(q7_deg.d) AS BIGINT) AS d_c
       FROM q7_deg JOIN q7_lab ON q7_lab.node = q7_deg.node GROUP BY 1),
q7_pc AS (SELECT q7_dc.label, COALESCE(q7_ec.e_c, 0) AS e_c, q7_dc.d_c
           FROM q7_dc LEFT JOIN q7_ec USING (label)),
q7_q AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
             SUM(4 * CAST(q7_m.m_edges AS HUGEINT) * e_c
                 - CAST(d_c AS HUGEINT) * d_c) AS q_num
      FROM q7_pc CROSS JOIN q7_m)
SELECT q7_q.n_communities, q7_m.m_edges,
       CAST((CASE WHEN q7_q.q_num < 0 THEN -1 ELSE 1 END)
            * ((1000000 * abs(q7_q.q_num))
               // (4 * CAST(greatest(q7_m.m_edges, 1) AS HUGEINT)
                   * greatest(q7_m.m_edges, 1))) AS BIGINT)
         AS modularity_x1e6
FROM q7_q CROSS JOIN q7_m
"""


# ---------------------------------------------------------------------------
# Multi-source BFS — frontier expansion with min-hop election.
# ---------------------------------------------------------------------------

BFS_ROUNDS = 4
BFS_SEED_MOD = 97


def bfs_hops(
    edges: DataFrame,
    u_col: str,
    v_col: str,
    rounds: int = BFS_ROUNDS,
    seed_mod: int = BFS_SEED_MOD,
) -> DataFrame:
    """(node, hop) — minimum hop distance from ANY seed node within
    ``rounds`` synchronous frontier expansions over the undirected
    simple graph from ``edges``; unreached nodes are absent. Seeds are
    the graph nodes with ``node % seed_mod == 0`` (a deterministic
    ~1/seed_mod sample — standing in for the labeled/trusted set a
    crawl pipeline expands from, e.g. seed-domain distance as a
    quality prior in Common-Crawl curation).

    Algorithm (the Pregel/GraphX BFS shape, without the framework):
    frontier_0 = seeds; frontier_{r+1} = distinct neighbors of
    frontier_r. Each frontier references ONLY its predecessor, so the
    unrolled lazy plan grows linearly like kcore's peel recurrence;
    hop labels are elected at the END as min(r) over the K+1 frontier
    levels (one union + one hash agg) instead of maintaining a
    visited set inside the loop — a visited-set loop references the
    accumulated state twice per round (join + union), doubling the
    plan subtree each round (2^K growth), while this formulation
    re-visits some settled nodes (bounded by |V| per round, the
    frontier is distinct) and its terminal union re-references each
    frontier once more — O(K²) printed-tree size, each frontier
    subtree ending in a distinct's exchange — keeping the whole
    computation ONE action with zero driver round-trips.

    Scale shape per round: one hash join of the persisted doubled
    edge frame (loop-static, _register_loop_static — the per-round
    frontier side is small and broadcasts, so without the cache the
    edge-build subtree would re-execute every round) + one distinct
    exchange on the node key. Hot hub nodes fan out to many
    neighbors; the distinct's partial map-side combine absorbs the
    duplicate neighbor emissions exactly as in LPA's (v, label) agg.
    At true 100 TB scale an UNBOUNDED BFS would checkpoint each
    frontier and stop on an empty-frontier count; fixed K keeps the
    gate contract replayable (the g1/g4/g5 discipline).
    """
    from omfietser_etl_spark import cacheutil

    cacheutil.release("bfs")
    a, b = F.col(u_col), F.col(v_col)
    und = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .distinct()
    )
    both = _register_loop_static(
        und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v"))),
        "bfs",
    )
    frontier = (
        both.select(F.col("u").alias("node"))
        .distinct()
        .filter(F.pmod(F.col("node"), F.lit(seed_mod)) == 0)
    )
    levels = frontier.select("node", F.lit(0).alias("hop"))
    for r in range(1, rounds + 1):
        frontier = (
            both.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
        )
        levels = levels.unionByName(
            frontier.select("node", F.lit(r).alias("hop"))
        )
    return levels.groupBy("node").agg(F.min("hop").cast("long").alias("hop"))


def bfs_hops_oracle_sql(
    edges_cte: str, rounds: int = BFS_ROUNDS, seed_mod: int = BFS_SEED_MOD
) -> str:
    """DuckDB twin of :func:`bfs_hops`: the same ``rounds`` frontier
    expansions unrolled as CTE steps (a recursive UNION ALL CTE would
    enumerate paths, not frontiers — exponential on cyclic graphs)."""
    steps = [
        f"raw AS ({edges_cte})",
        "und AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v"
        " FROM raw WHERE u <> v)",
        "both_ AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und)",
        f"f0 AS (SELECT DISTINCT u AS node FROM both_ WHERE u % {seed_mod} = 0)",
    ]
    for i in range(1, rounds + 1):
        steps.append(
            f"f{i} AS (SELECT DISTINCT b.v AS node FROM both_ b "
            f"JOIN f{i - 1} p ON p.node = b.u)"
        )
    union = " UNION ALL ".join(
        f"SELECT node, {i} AS hop FROM f{i}" for i in range(rounds + 1)
    )
    return (
        "WITH " + ", ".join(steps)
        + f", lv AS ({union}) "
        "SELECT node, CAST(min(hop) AS BIGINT) AS hop FROM lv GROUP BY node"
    )
