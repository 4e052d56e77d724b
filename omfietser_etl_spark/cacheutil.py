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


def tracked_local_checkpoint(
    df: DataFrame, eager: bool = True
) -> tuple[DataFrame, set[int]]:
    """``df.localCheckpoint(eager)`` plus the ids of the RDDs it
    persisted, so the caller can free the blocks when the round is
    superseded (iterative loops otherwise retain one copy per
    checkpoint until session end — round-4 advisor finding).

    ``eager=False`` (round 13) truncates lineage WITHOUT the barrier
    action: the returned frame's plan is a LogicalRDD immediately (so
    downstream plan building/rendering stays leaf-rooted), and the
    checkpoint RDD registers with the block manager AT CREATION — the
    id diff below tracks it the same way — while materialization
    happens at the first downstream action, pipelined with whatever
    else that action computes. Loop callers that free a superseded
    round's blocks must stay eager (the free is only safe once the
    successor is materialized)."""
    sc = df.sparkSession.sparkContext
    before = persistent_rdd_ids(sc)
    ck = df.localCheckpoint(eager=eager)
    return ck, persistent_rdd_ids(sc) - before


def tracked_loop_checkpoint(df: DataFrame) -> tuple[DataFrame, set[int]]:
    """Checkpoint an iterative-loop frame: :func:`tracked_local_checkpoint`
    by default, or a RELIABLE ``df.checkpoint()`` when
    ``SPARK_GRAFT_RELIABLE_CKPT_DIR`` names a checkpoint directory.

    Why the switch exists (round-12 verdict item 4): ``localCheckpoint``
    stores the truncated lineage's blocks on the executors themselves,
    so on a real cluster a lost executor kills the job mid-loop — the
    blocks have no recompute path BY DESIGN. A multi-hour 100 TB run
    sets the env var to a reliable dir (HDFS/object store); the loop
    then pays one write+read of the frame per checkpoint in exchange
    for executor-loss survival. Locally the default (executor == the
    one JVM) is strictly faster and loses nothing.

    Both paths preserve the frame's physical layout (Dataset
    checkpointing keeps outputPartitioning on the leaf RDD), so the
    CC loop's exchange-free cached-edges join survives either way —
    pinned by tests/test_textops.py::test_cc_reliable_checkpoint_parity.
    Reliable-checkpoint files are managed by Spark (enable
    ``spark.cleaner.referenceTracking.cleanCheckpoints`` to GC them);
    the returned id set is empty in that mode — there are no executor
    blocks for release() to free."""
    import os

    ckpt_dir = os.environ.get("SPARK_GRAFT_RELIABLE_CKPT_DIR")
    if ckpt_dir:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint(), set()
    return tracked_local_checkpoint(df)


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
    the self-cleaning pattern for once-per-invocation persists.

    SAME-PLAN GUARD (round 11): callers evaluate ``df.persist()`` /
    ``.cache()`` BEFORE this function runs (argument evaluation), and
    Spark's cache manager treats persisting a plan identical to an
    already-cached one as a no-op that SHARES the existing entry — so
    when the same operator is built twice in one session (bench reps,
    the plan-audit tests, any interactive re-run), unpersisting the
    scope's previous frame here would destroy the shared entry out
    from under the frame we are about to register. Measured: ts20's
    "persisted" D-row allocation silently lost its cache and inlined
    its corpus-agg subtree into BOTH consumers (documents scanned 3x
    instead of 2x) whenever an earlier plan-build of the same query
    existed. Previous frames whose analyzed plan is the same as
    ``df``'s are therefore dropped from tracking WITHOUT unpersist —
    the cache entry lives on, now owned by ``df``."""
    new_plan = None
    for old in _SCOPES.pop(scope, []):
        try:
            if new_plan is None:
                new_plan = df._jdf.queryExecution().analyzed()  # noqa: SLF001
            same = old._jdf.queryExecution().analyzed().sameResult(new_plan)  # noqa: SLF001
        except Exception:  # noqa: BLE001 — plan compare is best-effort
            same = False
        if same:
            continue  # shared cache entry — now owned by df
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    for sc, ids in _RDD_SCOPES.pop(scope, []):
        unpersist_rdd_ids(sc, ids)
    return register(scope, df)


#: AQE cached-plan re-planning — decided PER CACHED PLAN at persist
#: registration time, not at execution, so the save/restore window
#: only needs to span the .persist() call (unit-pinned in
#: tests/test_plans.py).
_AQE_CACHED_KEY = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"


def persist_replannable(scope: str, df: DataFrame) -> DataFrame:
    """``df.persist()`` registered under ``scope`` (self-cleaning, see
    :func:`release_then_register`) with AQE allowed to re-plan reads of
    the cached partitions; the session conf is captured and restored
    around the ``.persist()`` call.

    Why: a plain ``.persist()`` PINS the cached plan's pre-AQE shuffle
    layout, and a vanilla session (200 default partitions) then
    schedules hundreds of near-empty tasks per cached read — measured
    ~12 s vs 3.9 s (kcore loop-static edges, round-7 A/B at sf0.1) and
    10.3 s vs ~4 s (td28 pair frame at sf0.01, round 9). Persisting
    under this conf keeps the single materialization AND AQE-coalesced
    reads. Restore-before-return matters: queries later in the session
    whose cached frames carry a DELIBERATE partitioning (the CC loop's
    pre-partitioned edges — SCALING.md round 6) must not persist under
    it.

    A/B instrumentation (round-10 verdict #4): scopes listed in
    ``SPARK_GRAFT_DISABLE_PERSIST_SCOPES`` (comma-separated) skip the
    persist and return ``df`` unchanged — the duplicated-execution
    plan the persist exists to prevent. Measurement-only: it lets the
    10x sweep time each audit persist (ta12/ev1/mm7/mm8) against its
    duplicated-scan alternative without a code branch per query.
    Never set in production or under the gate."""
    import os

    disabled = os.environ.get("SPARK_GRAFT_DISABLE_PERSIST_SCOPES", "")
    if scope in {s.strip() for s in disabled.split(",") if s.strip()}:
        return df
    spark = df.sparkSession
    try:
        prev = spark.conf.get(_AQE_CACHED_KEY)
    except Exception:  # noqa: BLE001 — unset and no default
        prev = None
    spark.conf.set(_AQE_CACHED_KEY, "true")
    try:
        return release_then_register(scope, df.persist())
    finally:
        if prev is None:
            spark.conf.unset(_AQE_CACHED_KEY)
        else:
            spark.conf.set(_AQE_CACHED_KEY, prev)
