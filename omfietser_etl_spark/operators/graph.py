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
  ReuseExchange materializes its shuffle ONCE — no persist() and no
  pinned repartition needed (a pinned partition count would also
  defeat AQE's small-input coalescing: K × hundreds of near-empty
  tasks is pure scheduler overhead at gate scale);
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
    over the DISTINCT directed edge set. Nodes = sources ∪ sinks."""
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
