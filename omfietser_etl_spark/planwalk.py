"""Executed-plan inspection: per-table scan counts of the FINAL
adaptive tree, with cache boundaries respected.

Why this exists (round-9/10 lesson, twice burned): string-counting
`Scan parquet` over `explain formatted` of an executed AQE query is a
plan-reading artifact factory — the output appends an `== Initial
Plan ==` section (round-8's "37 FileScans" verdict was that) AND
inlines every InMemoryRelation's build plan at EVERY reference (round-10:
dd4 "12 scans" were one cached subtree printed repeatedly). The truth
lives in the JVM plan tree: walk `executedPlan`, follow
`finalPhysicalPlan` through AdaptiveSparkPlanExec and `.plan()`
through query stages, and STOP at InMemoryTableScanExec /
ReusedExchangeExec — a cached relation materializes once no matter
how many times it is referenced, and a reused exchange executes in
its original stage only.

The profile distinguishes:
- ``main``: parquet scans the returned query executes itself — the
  numbers a per-query scan budget gates (td28 disease = a table here
  scanned more often than its role count with no ReusedExchange
  covering the duplicate);
- ``cached``: scans inside DISTINCT cached relations' build plans —
  executed once at materialization, amortized across references.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_SCAN_RE = re.compile(r"[/\\](\w+)\.parquet")


def _scan_table(node) -> str:
    """Source-table name of a FileSourceScanExec (path-based reads)."""
    try:
        meta = node.metadata()
        loc = meta.apply("Location")
    except Exception:  # noqa: BLE001 — metadata shape varies
        loc = node.simpleString(200)
    m = _SCAN_RE.search(str(loc))
    return m.group(1) if m else "?"


def _bump(d: dict, k: str) -> None:
    d[k] = d.get(k, 0) + 1


def _walk(node, prof: dict, cached_rels: dict) -> None:
    cls = node.getClass().getSimpleName()
    if cls == "FileSourceScanExec":
        _bump(prof["main"], _scan_table(node))
        return
    if cls == "InMemoryTableScanExec":
        prof["cache_reads"] += 1
        try:
            rel = node.relation()
            cached_rels[rel.cacheBuilder().hashCode()] = rel
        except Exception:  # noqa: BLE001 — keep the walk robust
            pass
        return
    if cls == "ReusedExchangeExec":
        prof["reused_exchanges"] += 1
        return
    if cls == "AdaptiveSparkPlanExec":
        _walk(node.finalPhysicalPlan(), prof, cached_rels)
        return
    if cls.endswith("QueryStageExec"):
        _walk(node.plan(), prof, cached_rels)
        return
    kids = node.children()
    for i in range(kids.size()):
        _walk(kids.apply(i), prof, cached_rels)
    try:  # scalar/IN subqueries execute too
        subs = node.subqueries()
        for i in range(subs.size()):
            _walk(subs.apply(i), prof, cached_rels)
    except Exception:  # noqa: BLE001
        pass


def executed_scan_profile(df: DataFrame) -> dict:
    """Profile of an ALREADY-EXECUTED DataFrame's final plan (run an
    action on ``df`` itself first — e.g. ``df.collect()`` — so its
    own QueryExecution's adaptive plan is finalized).

    Returns ``{"main": {table: n}, "cached": {table: n},
    "reused_exchanges": n, "cache_reads": n}``.
    """
    prof = {
        "main": {},
        "cached": {},
        "reused_exchanges": 0,
        "cache_reads": 0,
    }
    cached_rels: dict = {}
    _walk(df._jdf.queryExecution().executedPlan(), prof, cached_rels)
    # each DISTINCT cached relation's build plan executes exactly once
    seen: set = set()
    frontier = list(cached_rels.items())
    while frontier:
        key, rel = frontier.pop()
        if key in seen:
            continue
        seen.add(key)
        sub = {"main": {}, "cached": {}, "reused_exchanges": 0, "cache_reads": 0}
        inner: dict = {}
        try:
            _walk(rel.cacheBuilder().cachedPlan(), sub, inner)
        except Exception:  # noqa: BLE001 — unmaterialized relation
            continue
        for t, n in sub["main"].items():
            prof["cached"][t] = prof["cached"].get(t, 0) + n
        frontier.extend(inner.items())
    return prof
