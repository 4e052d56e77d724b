"""Catalog-wide EXECUTED-final-plan scan audit (round-10 verdict #1).

For every catalog query: run it (collect — the gate's own action) and
profile the executed adaptive plan via
omfietser_etl_spark.planwalk.executed_scan_profile — a JVM plan-tree
walk that follows finalPhysicalPlan/query stages and STOPS at cache
and reused-exchange boundaries, so the counts are per-execution truth
(string-counting `explain formatted` double-books both the Initial
Plan section and every inlined InMemoryRelation build plan — the
round-8 "37 FileScans" and round-10 "dd4 scans 12x" artifacts).

The td28 disease (a duplicated join+agg subtree AQE does not
canonicalize under a swapped union) shows up as a table in `main`
scanned more times than its distinct logical roles, with no
ReusedExchange covering the duplicate.

Usage:
    python tools/scan_audit.py [sf_dir] [query ...]   # default: all
Prints one JSON line per query:
    {"q": name, "main": {t: n}, "cached": {t: n},
     "reused_exchange": n, "cache_reads": n, "wall_s": s}
and a final summary of queries whose max per-table MAIN scan count
exceeds 1 (review candidates, not automatically wrong — self-joins
with DIFFERENT pushed filters/projections legitimately scan twice
and are often cheaper than scan-once + exchange).

Not part of the shipped engine.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:]

    from omfietser_etl_spark.session import get_spark

    spark = get_spark("scan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    from omfietser_etl_spark import cacheutil
    from omfietser_etl_spark.planwalk import executed_scan_profile

    qs = entry_mod.queries()
    todo = names or list(qs)
    unknown = [n for n in todo if n not in qs]
    if unknown:
        print(f"unknown query name(s): {unknown}", file=sys.stderr)
        return 2

    flagged = []
    for name in todo:
        try:
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.collect()  # finalize df's OWN adaptive plan
            wall = time.perf_counter() - t0
            prof = executed_scan_profile(df)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            print(json.dumps({"q": name, "error": str(exc)[:200]}), flush=True)
            flagged.append((name, "ERROR"))
            continue
        finally:
            cacheutil.release_all()
        print(json.dumps({
            "q": name,
            "main": prof["main"],
            "cached": prof["cached"],
            "reused_exchange": prof["reused_exchanges"],
            "cache_reads": prof["cache_reads"],
            "wall_s": round(wall, 2),
        }), flush=True)
        if max(prof["main"].values(), default=0) > 1:
            flagged.append((name, prof["main"]))
    print("\n== review candidates (some legitimately scan twice) ==")
    for name, t in flagged:
        print(f"  {name}: {t}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
