"""Scoped cache registry: persisted intermediates that outlive their
builder function (they back a returned lazy DataFrame) but must not
outlive the NEXT invocation.

Operators that persist fan-out intermediates (dedup pair producers,
the corpus-prep pipeline) register them under a scope; each new call
releases the previous call's frames first. Repeated catalog runs —
the 106-query gate executes many of these back to back — otherwise
accumulate cached partitions in the executors (the pressure that
once forced the bench driver heap to 8g).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPES: dict[str, list[DataFrame]] = {}
#: localCheckpoint block registry: DataFrame.unpersist() is a NO-OP for
#: a localCheckpointed plan (the checkpoint RDD's blocks live outside
#: the cache manager), so scopes track the underlying RDD ids and
#: release() frees them explicitly. Values: (SparkContext, set[rdd_id]).
_RDD_SCOPES: dict[str, list[tuple[object, set[int]]]] = {}


def register(scope: str, df: DataFrame) -> DataFrame:
    """Track a persisted frame under ``scope``; returns it unchanged."""
    _SCOPES.setdefault(scope, []).append(df)
    return df


def persistent_rdd_ids(sc) -> set[int]:
    """Ids of every currently-persisted RDD (includes localCheckpoint
    block holders, which the DataFrame cache manager does not show)."""
    ids: set[int] = set()
    it = sc._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def unpersist_rdd_ids(sc, ids: set[int]) -> None:
    """Free the blocks of the given persisted-RDD ids (non-blocking).
    CAUTION for localCheckpointed RDDs: their lineage is truncated, so
    only release ids whose every downstream consumer is already
    materialized to its own storage — recompute through a freed local
    checkpoint fails by design."""
    if not ids:
        return
    try:
        it = sc._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() in ids:
                kv._2().unpersist(False)
    except Exception:  # noqa: BLE001 — session may already be gone
        pass


def tracked_local_checkpoint(df: DataFrame) -> tuple[DataFrame, set[int]]:
    """``df.localCheckpoint()`` plus the ids of the RDDs it persisted,
    so the caller can free the blocks when the round is superseded
    (iterative loops otherwise retain one copy per checkpoint until
    session end — round-4 advisor finding)."""
    sc = df.sparkSession.sparkContext
    before = persistent_rdd_ids(sc)
    ck = df.localCheckpoint()
    return ck, persistent_rdd_ids(sc) - before


def register_rdd_ids(scope: str, sc, ids: set[int]) -> None:
    """Track checkpoint-backing RDD ids under ``scope`` so the next
    invocation's release() frees their blocks."""
    if ids:
        _RDD_SCOPES.setdefault(scope, []).append((sc, ids))


def release(scope: str) -> None:
    """Unpersist every frame registered under ``scope``. Safe to call
    any time — later actions on previously returned frames recompute
    (checkpoint-backed frames excepted; by then nothing references
    them)."""
    for df in _SCOPES.pop(scope, []):
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    for sc, ids in _RDD_SCOPES.pop(scope, []):
        unpersist_rdd_ids(sc, ids)


def release_all() -> None:
    """Release EVERY scope. For sequential per-query harnesses
    (driver_sim, bench-like loops): a scope's frames normally live
    until the SAME operator's next invocation, so over a 173-query
    catalog run dozens of one-shot scopes linger to the end — at
    sf0.1 under the vanilla 1g heap that accumulated pressure OOM'd
    the g2 wedge join (round-7 sweep) even though g2 alone runs fine.
    Call between queries once the previous query's result is fully
    consumed. Later actions on previously returned PLAIN-persisted
    frames recompute; localCheckpoint-backed frames (the _RDD_SCOPES
    entries) have truncated lineage, so reusing one after release
    fails with a block-fetch error BY DESIGN (see unpersist_rdd_ids) —
    a harness keeping frames across queries must re-build them."""
    for scope in list(_SCOPES) + list(_RDD_SCOPES):
        release(scope)


def release_then_register(scope: str, df: DataFrame) -> DataFrame:
    """Release the scope's PREVIOUS frames, then register ``df`` —
    the self-cleaning pattern for once-per-invocation persists."""
    release(scope)
    return register(scope, df)
