"""Bounded 10x value-hash checks for the 12 timeout-oracle queries
(round-10 verdict ask #3).

At the sf1-equivalent corpus (`tools/stress_scale.py`) twelve catalog
queries record oracle TIMEOUTs: their DuckDB oracles are DELIBERATE
brute-force baselines (all-candidate similarity verifies, per-round
graph replays) whose cost at 10x is the very O(N^2)/O(rounds*E) work
the engine's blocking avoids. Rows-only verification cannot catch
value divergence there — mm9's NULL-vs-'' bug (found at 10x, round
10) is exactly that class. This tool gives each of the 12 a NAMED
bounded check that verifies the full rows+schema+value-hash contract
at 10x at bounded oracle cost:

**staged-replay** (g2/g4/g5/g6/g7): the gate oracles are single WITH
chains whose stages re-derive their whole upstream chain once per
reference under DuckDB's CTE inlining — at 10x that re-execution
spilled 70 GB (g5, round 10; 41 GB still on g2 with only the raw
edges staged). The bounded check materializes the edge set ONCE as a
temp table AND forces every intermediate CTE to single
materialization (`AS MATERIALIZED`, `_materialize_ctes`), rebuilding
the oracle with the SAME `*_oracle_sql` builders (operators/graph.py)
— zero duplicated oracle logic, the identical round-unrolled SQL,
linear cost in rounds. FULL-corpus value hash, not a sample.

**endpoint-slice** (td2/td2h/td5/td16, mm7/mm8): pair outputs are
intrinsic to their two endpoints (Jaccard/cosine/hamming of the two
docs' own shingles/vectors/hashes; no corpus-global state — td16's
noise-floor check is a threshold-vs-dim guard, not data blocking;
mm7/mm8's banded join is exact-recall by pigeonhole). So: run the
ENGINE at the FULL 10x corpus (the scale exercise), filter its
output to pairs whose endpoints both fall in a deterministic salted
slice, and replay the UNCHANGED gate oracle over the corpus filtered
to the same slice — both sides shrink together on the quadratic
axis, and every surviving value is hash-compared. Slice membership:
(id * 2654435761) % 97 < K (Knuth multiplicative salt — plain
doc_id % k would correlate with stress_scale's per-copy id offsets).

**df-guard hybrid** (td12): the hot-shingle guard thresholds on
corpus-wide document frequency (max_df_frac * N docs), so a sliced
corpus changes the guard — slicing the VIEW is NOT semantics-
preserving. The hybrid keeps every linear stage (shingles, N-docs,
hot set, filtered sizes) on the FULL corpus and restricts only the
quadratic candidate join to in-slice pairs; the engine output is
filtered to the same pairs. The guard is exercised at true 10x DF.

Usage:
    python tools/bounded_sf1.py [sf_dir] [query ...]

Defaults to /tmp/spark_graft_stress/x10 and all 12. Uses the bench
session (8g) — this is a scale sweep, never gate certification.
Equivalence of each bounded check against the gate oracle at gate
scales is pinned by tests/test_tools.py (slice fraction is a
parameter so small corpora use a wide slice).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Knuth multiplicative hash salt for slice membership. doc_id at the
#: 10x corpus is <= ~6e5, vec_id likewise; the product stays far under
#: 2^63 so BOTH engines compute it exactly in BIGINT.
SALT = 2654435761
MOD = 97


def slice_sql(col: str, k: int) -> str:
    """DuckDB-side slice predicate (identical arithmetic to Spark)."""
    return f"(({col} * {SALT}) % {MOD}) < {k}"


def slice_col(col, k: int):
    """Spark-side slice predicate (identical arithmetic to DuckDB)."""
    from pyspark.sql import functions as F

    base = F.col(col) if isinstance(col, str) else col
    return F.pmod(base.cast("long") * SALT, F.lit(MOD)) < k


# ---------------------------------------------------------------- #
# check builders — each returns (engine_df, oracle_sql, con, label)
# ---------------------------------------------------------------- #


def _materialize_ctes(sql: str) -> str:
    """Force every CTE in a builder-generated oracle to materialize
    exactly once (DuckDB ``AS MATERIALIZED``). Without it DuckDB
    inlines multi-referenced CTEs — each round of an unrolled graph
    replay re-derives its whole upstream chain per reference, which
    is the 70 GB-spill blowup the staged check exists to avoid (the
    first staging attempt materialized only the raw edge table and
    still spilled 41 GB on g2's und->both_->deg->o chain). Safe by
    construction for the graph builders: every ``<word> AS (`` in
    their output is a CTE head (asserted in tests)."""
    import re

    return re.sub(r"\b(\w+ AS) \(", r"\1 MATERIALIZED (", sql)


def staged_sql(con, name: str) -> str:
    """Materialize the shared edge set once on ``con``; rebuild the
    gate oracle with the same operators/graph.py builders against it,
    with every intermediate CTE forced to single materialization.
    Pure DuckDB — testable against the gate oracle without Spark."""
    from omfietser_etl_spark.catalog import opsspec as ops
    from omfietser_etl_spark.operators import graph as G

    if name == "g6_hits":
        con.execute(
            "CREATE OR REPLACE TEMP TABLE bnd_edges AS "
            "SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst "
            "FROM orders JOIN lineitem ON o_orderkey = l_orderkey"
        )
        return _materialize_ctes(G.hits_oracle_sql("SELECT src, dst FROM bnd_edges"))
    cte = ops._COOC_CTE if name == "g2_triangle_count" else ops._COOC_SUPP2_CTE
    con.execute(f"CREATE OR REPLACE TEMP TABLE bnd_edges AS {cte}")
    edges = "SELECT u, v FROM bnd_edges"
    if name == "g2_triangle_count":
        return _materialize_ctes(G.triangle_counts_oracle_sql(edges))
    if name == "g4_kcore":
        return _materialize_ctes(G.kcore_oracle_sql(edges))
    if name == "g5_label_propagation":
        return _materialize_ctes(G.label_propagation_oracle_sql(edges))
    if name == "g7_modularity":
        # stage the LPA labels too: modularity references the label
        # frame multiple times (per-community degree mass), and the
        # labels themselves are the full 3-round replay.
        con.execute(
            "CREATE OR REPLACE TEMP TABLE bnd_labels AS "
            + _materialize_ctes(G.label_propagation_oracle_sql(edges))
        )
        return _materialize_ctes(
            G.modularity_oracle_sql(edges, "SELECT node, label FROM bnd_labels")
        )
    raise KeyError(name)


def _staged_graph(spark, sf, con, name):
    sql = staged_sql(con, name)
    build = {s.name: s.build for s in _all_specs()}[name]
    return build(spark, sf), sql, "staged-replay (edges materialized)"


def _all_specs():
    from omfietser_etl_spark.catalog import all_specs

    return all_specs()


def _sliced_pairs(spark, sf, con, name, k):
    """Endpoint-slice check: engine at FULL corpus, output filtered to
    in-slice endpoint pairs; unchanged gate oracle over the sliced
    table view."""
    specs = {s.name: s for s in _all_specs()}
    spec = specs[name]
    table, idc = (
        ("embeddings", "vec_id")
        if name in ("td5_embed_neardup", "td16_rh_lsh_pairs")
        else ("documents", "doc_id")
    )
    con.execute(
        f"CREATE OR REPLACE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{sf}/{table}.parquet') WHERE {slice_sql(idc, k)}"
    )
    df = spec.build(spark, sf)
    lo, hi = ("doc_lo", "doc_hi") if table == "documents" else ("id_lo", "id_hi")
    if name in ("mm7_phash_neardup", "mm8_audio_fp_neardup"):
        # media_id -> parent doc: twins are encoded as -doc_id - 1
        from pyspark.sql import functions as F

        lo_doc = F.when(F.col("id_lo") >= 0, F.col("id_lo")).otherwise(
            -F.col("id_lo") - 1
        )
        hi_doc = F.when(F.col("id_hi") >= 0, F.col("id_hi")).otherwise(
            -F.col("id_hi") - 1
        )
        df = df.filter(slice_col(lo_doc, k) & slice_col(hi_doc, k))
        lo = hi = None
    else:
        df = df.filter(slice_col(lo, k) & slice_col(hi, k))
    return df, spec.oracle, f"endpoint-slice k={k}/{MOD}"


def _td12_hybrid(spark, sf, con, k):
    """Full-corpus DF guard, in-slice candidate pairs (see module
    docstring). Rebuilds TD12_ORACLE with the slice predicate inside
    the candidate join only — every linear stage stays full-corpus."""
    from omfietser_etl_spark.catalog import textops as T

    marker = "JOIN sh b ON a.s = b.s AND a.doc < b.doc GROUP BY 1, 2)"
    assert T.TD12_ORACLE.count(marker) == 1, "td12 oracle shape changed"
    sliced = T.TD12_ORACLE.replace(
        marker,
        "JOIN sh b ON a.s = b.s AND a.doc < b.doc "
        f"WHERE {slice_sql('a.doc', k)} AND {slice_sql('b.doc', k)} "
        "GROUP BY 1, 2)",
    )
    df = T.td12_jaccard_guarded(spark, sf).filter(
        slice_col("doc_lo", k) & slice_col("doc_hi", k)
    )
    return df, sliced, f"df-guard hybrid: full-corpus DF, in-slice pairs k={k}/{MOD}"


#: name -> (kind, default slice K). K is tuned so the oracle-side
#: quadratic volume at 10x lands near what the SAME oracle already
#: runs green at sf0.1 (10/97 ~ 10.3%: pair volume scales by
#: (10 * 10.3%)^2 ~ 1.06x of sf0.1; mm7/mm8's literal all-pairs uses
#: 4/97 ~ 4.1% — k=2 measured 5 s at 10x, k=4 is ~8x that volume).
CHECKS = {
    "g2_triangle_count": ("staged", None),
    "g4_kcore": ("staged", None),
    "g5_label_propagation": ("staged", None),
    "g6_hits": ("staged", None),
    "g7_modularity": ("staged", None),
    "td2_ngram_jaccard": ("slice", 10),
    "td2h_jaccard_hashed": ("slice", 10),
    "td5_embed_neardup": ("slice", 10),
    "td16_rh_lsh_pairs": ("slice", 10),
    "mm7_phash_neardup": ("slice", 4),
    "mm8_audio_fp_neardup": ("slice", 4),
    "td12_jaccard_guarded": ("hybrid", 10),
}


def run_check(spark, sf, name, k_override=None):
    """Build and execute one bounded check; returns (ParityResult,
    label, seconds)."""
    from omfietser_etl_spark.parity import compare, duck_connect

    kind, k = CHECKS[name]
    k = k_override if k_override is not None else k
    con = duck_connect(sf)
    try:
        t0 = time.time()
        if kind == "staged":
            df, sql, label = _staged_graph(spark, sf, con, name)
        elif kind == "hybrid":
            df, sql, label = _td12_hybrid(spark, sf, con, k)
        else:
            df, sql, label = _sliced_pairs(spark, sf, con, name, k)
        r = compare(name, df, sql, con)
        return r, label, time.time() - t0
    finally:
        con.close()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_stress/x10"
    if not os.path.isdir(sf):
        print(f"not a data directory: {sf!r}", file=sys.stderr)
        return 2
    only = set(sys.argv[2:])
    unknown = only - set(CHECKS)
    if unknown:
        print(f"no bounded check for: {sorted(unknown)}", file=sys.stderr)
        return 2
    names = [n for n in CHECKS if not only or n in only]

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.codegen.maxFields", "25")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from omfietser_etl_spark import cacheutil

    failures = []
    for name in names:
        try:
            r, label, secs = run_check(spark, sf, name)
            ok, detail, n = r.ok, r.detail, r.rows_spark
        except Exception as ex:  # noqa: BLE001 — report, not die
            ok, detail, n, label, secs = False, str(ex)[:200], -1, "?", 0.0
        finally:
            cacheutil.release_all()
            try:
                spark.sparkContext._jvm.System.gc()  # noqa: SLF001
            except Exception:  # noqa: BLE001 — diagnostics only
                pass
        status = "ok" if ok else f"FAIL {detail}"
        print(f"{name} [{label}]: {status} ({n} rows, {secs:.1f}s)", flush=True)
        if not ok:
            failures.append(name)
    print(f"done: {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
