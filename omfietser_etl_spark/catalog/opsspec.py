"""Operational queries: incremental rollup state and skew diagnostics
(operators/aggstate.py, operators/diagnostics.py).

Both are 100 TB operability surface: the rollup-state query proves
merge(batch states) ≡ direct recompute under the oracle gate (the
property that lets running totals skip history rescans), and the skew
report is the measurement step before salting/AQE-tuning a hot-key
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omfietser_etl_spark.operators.aggstate import (
    agg_state,
    merge_agg_state,
    state_report,
)
from omfietser_etl_spark.operators.diagnostics import skew_report
from omfietser_etl_spark.session import load

from . import QuerySpec


def a17_incremental_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Running per-status totals maintained as mergeable state: the
    orders table is split into three synthetic 'batches' (key mod 3 —
    standing in for daily loads), each reduced to agg_state, folded
    with merge_agg_state, then reported. The oracle aggregates the
    full table directly — passing the gate IS the merge-equivalence
    proof (ref: postgres-adapter.ts:936-972 incremented job stats)."""
    o = load(spark, sf, "orders")
    keys, nums = ["o_orderstatus"], ["o_totalprice"]
    state = None
    for i in range(3):
        batch = agg_state(o.filter(F.col("o_orderkey") % 3 == i), keys, nums)
        state = batch if state is None else merge_agg_state(state, batch, keys, nums)
    return state_report(state, nums)


A17_ORACLE = """
WITH c AS (
  SELECT o_orderstatus,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders)
SELECT o_orderstatus,
       count(*) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS sum_o_totalprice_cents,
       min(cents) AS min_o_totalprice_cents,
       max(cents) AS max_o_totalprice_cents,
       CAST(floor(CAST(sum(cents) AS BIGINT) * 1.0 / count(*)) AS BIGINT)
         AS avg_o_totalprice_cents
FROM c GROUP BY o_orderstatus
"""


def x7_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    """Key-distribution diagnosis over lineitem's supplier key — the
    join key a real workload would salt if hot."""
    li = load(spark, sf, "lineitem")
    return skew_report(li, ["l_suppkey"], top_k=10)


X7_ORACLE = """
WITH counts AS (
  SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey),
t AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total, max(cnt) AS max_cnt,
         count(*) AS n_keys
  FROM counts),
top AS (
  SELECT l_suppkey, cnt,
         row_number() OVER (ORDER BY cnt DESC, l_suppkey) AS rank
  FROM counts ORDER BY cnt DESC, l_suppkey LIMIT 10)
SELECT l_suppkey, cnt,
       CAST(floor(cnt * 10000.0 / total) AS BIGINT) AS share_bp,
       rank,
       CAST(floor(max_cnt * 100.0 * n_keys / total) AS BIGINT) AS skew_ratio_x100
FROM top, t
"""


def g1_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Exact integer PageRank (operators/graph.py) over the
    customer→supplier purchase graph (distinct edges from
    orders⋈lineitem; node ids disambiguated as 2·custkey / 2·suppkey+1
    so the two key spaces never collide). Five fixed updates; the
    whole loop is one lazy plan with zero driver actions, and the
    oracle replays the five updates as unrolled CTE steps."""
    from omfietser_etl_spark.operators.graph import pagerank

    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    edges = orders.join(
        li, orders.o_orderkey == li.l_orderkey
    ).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    return pagerank(edges, "src", "dst")


def _g1_oracle() -> str:
    from omfietser_etl_spark.operators.graph import pagerank_oracle_sql

    edges_cte = (
        "SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey"
    )
    return pagerank_oracle_sql(edges_cte)


def _cooc_edges(spark: SparkSession, sf: str, min_support: int = 1) -> DataFrame:
    """Part co-occurrence edges: (u, v) for every pair of distinct
    parts appearing in the same order, u < v, optionally kept only
    when the pair co-occurs in ≥ min_support orders (market-basket
    support pruning — the standard densification guard before graph
    analytics on co-occurrence data)."""
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    # merge hint: both join sides are the SAME fact projection, so a
    # shuffle join hashes ONE exchange that ReuseExchange shares for
    # both sides, while the planner's default (the 2-column projection
    # squeaks under the broadcast threshold at gate scales) broadcasts
    # a full fact-table copy PER REFERENCE of this frame — g2's plan
    # carried 4+ simultaneous 600k-row HashedRelations, which OOM'd
    # the vanilla 1g sweep session at sf0.1 (round 7) and is never the
    # plan at 100 TB, where lineitem would exceed any threshold anyway.
    pairs = (
        a.join(b.hint("merge"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
    )
    if min_support <= 1:
        return pairs
    return (
        pairs.groupBy("u", "v").agg(F.count("*").alias("supp"))
        .filter(F.col("supp") >= min_support)
        .select("u", "v")
    )


_COOC_CTE = (
    "SELECT a.l_partkey AS u, b.l_partkey AS v "
    "FROM lineitem a JOIN lineitem b "
    "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
)

_COOC_SUPP2_CTE = (
    "SELECT u, v FROM (SELECT a.l_partkey AS u, b.l_partkey AS v, "
    "count(*) AS supp FROM lineitem a JOIN lineitem b "
    "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
    "GROUP BY 1, 2) WHERE supp >= 2"
)


def g2_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Exact per-node triangle counts (operators/graph.py::
    triangle_counts) over the full part co-occurrence graph — the
    degree-ordered-orientation pattern measured against its raw-wedge
    alternative in SCALING.md (max out-degree 90 vs raw max degree
    206 at sf0.01: the O(√m) cap in action)."""
    from omfietser_etl_spark.operators.graph import triangle_counts

    return triangle_counts(_cooc_edges(spark, sf), "u", "v")


def _g2_oracle() -> str:
    from omfietser_etl_spark.operators.graph import triangle_counts_oracle_sql

    return triangle_counts_oracle_sql(_COOC_CTE)


def g3_adamic_adar(spark: SparkSession, sf: str) -> DataFrame:
    """Top-50 predicted links by exact fixed-point Adamic-Adar score
    (operators/graph.py::adamic_adar) over the support-≥2
    co-occurrence graph (support pruning keeps the wedge stage
    bounded — the operator docstring's hub analysis)."""
    from omfietser_etl_spark.operators.graph import adamic_adar

    return adamic_adar(_cooc_edges(spark, sf, min_support=2), "u", "v")


def _g3_oracle() -> str:
    from omfietser_etl_spark.catalog.textops import dk_ilog2_chain
    from omfietser_etl_spark.operators.graph import adamic_adar_oracle_sql
    from omfietser_etl_spark.textops.selection import DSIR_F, DSIR_Q

    return adamic_adar_oracle_sql(
        _COOC_SUPP2_CTE, lambda src: dk_ilog2_chain(src, DSIR_Q, DSIR_F)
    )


def g4_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """3-core of the support-≥2 part co-occurrence graph after 5
    synchronous peel rounds (operators/graph.py::kcore) — the standard
    densest-region extraction before community/motif analytics; the
    single-reference recurrence keeps the unrolled lazy plan linear
    in rounds (see the operator docstring)."""
    from omfietser_etl_spark.operators.graph import kcore

    return kcore(_cooc_edges(spark, sf, min_support=2), "u", "v")


def _g4_oracle() -> str:
    from omfietser_etl_spark.operators.graph import kcore_oracle_sql

    return kcore_oracle_sql(_COOC_SUPP2_CTE)


def g5_label_propagation(spark: SparkSession, sf: str) -> DataFrame:
    """Community labels after 3 synchronous LPA rounds
    (operators/graph.py::label_propagation) over the support-≥2 part
    co-occurrence graph — deterministic min-label tie-breaks make the
    fixed-round result bit-replayable; the struct-argmax keeps each
    round a single-reference recurrence (linear unrolled plan)."""
    from omfietser_etl_spark.operators.graph import label_propagation

    return label_propagation(_cooc_edges(spark, sf, min_support=2), "u", "v")


def _g5_oracle() -> str:
    from omfietser_etl_spark.operators.graph import label_propagation_oracle_sql

    return label_propagation_oracle_sql(_COOC_SUPP2_CTE)


def g6_hits(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-integer HITS hubs/authorities (operators/graph.py::hits)
    over the customer→supplier purchase graph (same disambiguated
    edge set as g1): customers score as hubs, suppliers as
    authorities. Three synchronous rounds, L1-renormalized to a fixed
    integer mass each half-round; one lazy plan, zero driver actions;
    the oracle unrolls the rounds in HUGEINT."""
    from omfietser_etl_spark.operators.graph import hits

    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    edges = orders.join(
        li, orders.o_orderkey == li.l_orderkey
    ).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    return hits(edges, "src", "dst")


def _g6_oracle() -> str:
    from omfietser_etl_spark.operators.graph import hits_oracle_sql

    edges_cte = (
        "SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey"
    )
    return hits_oracle_sql(edges_cte)


def g7_modularity(spark: SparkSession, sf: str) -> DataFrame:
    """Modularity score of g5's LPA communities over the support-≥2
    co-occurrence graph (operators/graph.py::modularity): Q·4m² is a
    pure integer (DECIMAL-staged), emitted as sign-split millionths —
    the acceptance check on community structure before per-community
    sampling caps. Gates the LPA labels AND the scoring in one
    composition."""
    from omfietser_etl_spark.operators.graph import label_propagation, modularity

    edges = _cooc_edges(spark, sf, min_support=2)
    return modularity(edges, label_propagation(edges, "u", "v"), "u", "v")


def _g7_oracle() -> str:
    from omfietser_etl_spark.operators.graph import (
        label_propagation_oracle_sql,
        modularity_oracle_sql,
    )

    return modularity_oracle_sql(
        _COOC_SUPP2_CTE, label_propagation_oracle_sql(_COOC_SUPP2_CTE)
    )


def g8_bfs_hops(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-source BFS min-hop labels (operators/graph.py::bfs_hops)
    over the support-≥2 part co-occurrence graph, seeded at the
    ~1/97 deterministic node sample — seed-distance as a quality
    prior (the crawl-pipeline pattern: hops from a trusted seed set
    weight documents before sampling). Four synchronous frontier
    expansions, min-hop elected in one terminal agg; one lazy plan,
    zero driver actions; the oracle unrolls the frontiers."""
    from omfietser_etl_spark.operators.graph import bfs_hops

    return bfs_hops(_cooc_edges(spark, sf, min_support=2), "u", "v")


def _g8_oracle() -> str:
    from omfietser_etl_spark.operators.graph import bfs_hops_oracle_sql

    return bfs_hops_oracle_sql(_COOC_SUPP2_CTE)


SPECS = [
    QuerySpec("a17_incremental_rollup", a17_incremental_rollup, A17_ORACLE,
              "mergeable agg state: merge(batches) ≡ direct recompute"),
    QuerySpec("x7_skew_report", x7_skew_report, X7_ORACLE,
              "top-k heavy keys + skew ratio (pre-salting diagnosis)"),
    QuerySpec("g1_pagerank", g1_pagerank, _g1_oracle(),
              "fixed-point integer PageRank, 5 unrolled exact updates"),
    QuerySpec("g2_triangle_count", g2_triangle_count, _g2_oracle(),
              "exact triangle counts, degree-ordered orientation"),
    QuerySpec("g3_adamic_adar", g3_adamic_adar, _g3_oracle(),
              "Adamic-Adar link prediction, exact ilog2 fixed point"),
    QuerySpec("g4_kcore", g4_kcore, _g4_oracle(),
              "k-core peeling, 5 unrolled synchronous rounds"),
    QuerySpec("g5_label_propagation", g5_label_propagation, _g5_oracle(),
              "synchronous LPA community detection, min-label ties"),
    QuerySpec("g6_hits", g6_hits, _g6_oracle(),
              "HITS hubs/authorities, exact-integer L1-normalized rounds"),
    QuerySpec("g7_modularity", g7_modularity, _g7_oracle(),
              "Newman modularity of the LPA partition, exact millionths"),
    QuerySpec("g8_bfs_hops", g8_bfs_hops, _g8_oracle(),
              "multi-source BFS min-hop labels, 4 unrolled frontiers"),
]
