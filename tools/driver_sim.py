"""Driver-gate simulation: run every catalog query against its DuckDB
oracle under a VANILLA SparkSession (no engine confs), exactly like
the round driver does.

Usage:
    python tools/driver_sim.py [--chunks N] [sf_dir] [query ...]

Defaults to /root/testdata/sf0.01 and all queries. Exits non-zero on
any failure. This is the runtime surface — `pytest tests/` mirrors it
at sf0.001 with the engine session, but THIS is what the gate runs.

Scale-sweep knobs (round 10; NEVER for gate certification):
    --session bench                 8g / CPU-count-partition session
    SPARK_GRAFT_ORACLE_TIMEOUT=300  per-query watchdog: interrupt
                                    DuckDB + cancel Spark jobs, record
                                    TIMEOUT (a loud skip), move on
    SPARK_GRAFT_ROWS_ONLY=1         engine-only sweep (run + count)

--chunks N splits the catalog across N sequential FRESH-JVM
subprocesses. Use --chunks 8 for full-catalog sweeps at sf0.1: the
vanilla session's 1g heap survives any 50-query driver window at
sf0.01 (the actual gate contract) but a long sf0.1 run accumulates
JVM residue (ContextCleaner lag, codegen caches) that can OOM a heavy
query near the chunk's end even with per-query cache release + GC
nudges — and 44-query chunks proved MARGIN-FLAKY (round 8: g2 failed
in a sweep, then the identical 44-query chunk passed on re-run;
22-query chunks are reliably green). Per-query correctness is what
the sweep certifies, not N-in-one-heap endurance.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chunk_assignment(names: list[str], n_chunks: int) -> list[list[str]]:
    """Striped split (names[k::N]) — every name in exactly one chunk,
    heavy/light mixed (see module docstring). Pure so the coverage
    invariant is unit-testable."""
    return [names[k :: max(1, n_chunks)] for k in range(max(1, n_chunks))]


def _run_chunked(n_chunks: int, argv: list[str]) -> int:
    import subprocess

    from omfietser_etl_spark.catalog import all_specs

    sf = argv[0] if argv else "/root/testdata/sf0.01"
    if argv and not os.path.isdir(sf):
        # a lone query name ('--chunks 2 td1_exact_dedup') must not be
        # consumed as the sf_dir — every chunk would then run the FULL
        # catalog against a nonexistent dir, a noisy failure instead of
        # the clear unknown-name error below (round-8 ADVICE).
        print(USAGE, file=sys.stderr)
        print(f"not a data directory: {sf!r} (pass sf_dir before query "
              "names)", file=sys.stderr)
        return 2
    names = [s.name for s in all_specs()]
    if len(argv) > 1:
        wanted = set(argv[1:])
        unknown = wanted - set(names)
        if unknown:
            # a typo'd name must not yield a vacuous green sweep
            # (round-7 ADVICE) — mirror the lookup failure a
            # single-process run would surface.
            print(f"unknown query name(s): {sorted(unknown)}", file=sys.stderr)
            return 2
        names = [n for n in names if n in wanted]
    # STRIPED assignment (names[k::N]), not contiguous slices: the
    # rotation orders by certification age, which correlates heavy
    # families together — round 8's contiguous chunk 2 packed tp1 +
    # dd5 + the rank family + g1–g3 and OOM'd the 1g heap at 44
    # queries, while a striped chunk gets an even heavy/light mix.
    # Per-query correctness is chunk-order-independent.
    rc = 0
    for k, chunk in enumerate(chunk_assignment(names, n_chunks)):
        if not chunk:
            continue
        print(f"--- chunk {k + 1}: {len(chunk)} queries ---", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf, *chunk]
        ).returncode
        rc = rc or r
    return rc


USAGE = ("usage: python tools/driver_sim.py [--session bench] [--chunks N] "
         "[sf_dir] [query ...]")


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--session":
        # --session bench: run the SAME oracle comparison under the
        # bench-sized session (8g heap, CPU-count shuffle partitions)
        # instead of the vanilla gate session. FOR SCALE SWEEPS ONLY
        # (round-10: the sf1-equivalent 10x corpus — the vanilla 1g
        # heap is the GATE's contract at sf<=0.01, not a constraint
        # the engine must honor at 10x the gate's data; a 1g sweep
        # there measures spill thrash, not correctness). The default
        # gate simulation stays vanilla — never pass this flag when
        # certifying the driver contract.
        if len(args) < 2 or args[1] != "bench":
            print(USAGE, file=sys.stderr)
            print("--session takes exactly 'bench'", file=sys.stderr)
            return 2
        os.environ["SPARK_GRAFT_SIM_SESSION"] = "bench"
        sys.argv = [sys.argv[0], *args[2:]]
        args = args[2:]
    if args and args[0] == "--chunks":
        # validate argv up front (round-7 ADVICE): a missing or
        # non-numeric N must print usage, not die with a traceback.
        if len(args) < 2 or not args[1].isdigit() or int(args[1]) < 1:
            print(USAGE, file=sys.stderr)
            print("--chunks requires a positive integer N", file=sys.stderr)
            return 2
        return _run_chunked(int(args[1]), args[2:])
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if len(sys.argv) > 1 and not os.path.isdir(sf):
        print(USAGE, file=sys.stderr)
        print(f"not a data directory: {sf!r} (pass sf_dir before query "
              "names)", file=sys.stderr)
        return 2
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    if os.environ.get("SPARK_GRAFT_SIM_SESSION") == "bench":
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
    else:
        spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from omfietser_etl_spark.parity import compare, duck_connect

    t0 = time.time()
    rows = len(e.entry(spark).collect())
    print(f"entry: {rows} rows ({time.time() - t0:.1f}s)")

    con = duck_connect(sf)
    qs, oracles = e.queries(), e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        return 2
    n_requested = len(only) if only else len(qs)
    try:
        sf_val = float(os.path.basename(sf.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf_val = 0.0
    if n_requested > 60 and sf_val >= 0.1:
        # The r07 sf0.1 sweep OOM'd the vanilla 1g heap near the end of
        # a single-JVM 175-query run (JVM residue: ContextCleaner lag,
        # codegen caches — SCALING.md round-7 autopsy). Chunked mode is
        # the documented default above the 50-query gate window.
        print(
            f"WARNING: {n_requested} queries at sf{sf_val} in ONE JVM — "
            "use --chunks 8 (<=22 queries per JVM) for full-catalog sweeps "
            "at sf>=0.1 (SCALING.md round-7 OOM autopsy; round-8 found "
            "44-query chunks margin-flaky)",
            file=sys.stderr,
        )
    # SPARK_GRAFT_ORACLE_TIMEOUT=<seconds>: per-query watchdog for
    # SCALE sweeps (round 10). Some DuckDB oracles are DELIBERATE
    # brute-force baselines (all-pairs cosine, per-round LPA replays)
    # whose cost at the 10x corpus is the very O(N^2)/O(rounds*E)
    # work the engine's blocking avoids — g5's oracle alone ran >20
    # min at sf1-eq. On timeout the watchdog interrupts DuckDB and
    # cancels Spark jobs, the query is recorded as TIMEOUT (a skip
    # with a loud marker, not a pass), and the sweep moves on. Never
    # set this for gate certification — the gate has no timeout.
    timeout_s = float(os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "0") or 0)
    rows_only = os.environ.get("SPARK_GRAFT_ROWS_ONLY") == "1"
    failures = []
    timeouts = []
    for name, build in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        timer = None
        timed_out = []
        if timeout_s > 0:
            import threading

            def _kill(con=con, spark=spark, timed_out=timed_out):
                timed_out.append(True)
                try:
                    con.interrupt()
                except Exception:  # noqa: BLE001
                    pass
                try:
                    spark.sparkContext.cancelAllJobs()
                except Exception:  # noqa: BLE001
                    pass

            timer = threading.Timer(timeout_s, _kill)
            timer.start()
        raised = False
        try:
            if name in oracles and not rows_only:
                r = compare(name, build(spark, sf), oracles[name], con)
                ok, detail, n = r.ok, r.detail, r.rows_spark
            else:
                n = build(spark, sf).count()
                ok, detail = n >= 0, "rows-only"
        except Exception as ex:  # noqa: BLE001 — gate must report, not die
            raised = True
            ok, detail, n = False, str(ex)[:200], -1
        finally:
            if timer is not None:
                timer.cancel()
            # The query is fully consumed (or dead) by here — free
            # every cacheutil scope so one-shot operator caches can't
            # accumulate across the 181-query run (the sf0.1 sweep
            # OOM'd the vanilla 1g heap from exactly that buildup; see
            # cacheutil.release_all), and nudge the driver GC: Spark's
            # ContextCleaner reclaims stale broadcast/shuffle state
            # only when the JVM collects the corresponding driver
            # references, so 140+ queries of lag exhausts a 1g heap
            # before any single query would. Lives in `finally` so the
            # TIMEOUT path releases too — timed-out queries are the
            # HEAVIEST ones in a scale sweep, and skipping their
            # release reintroduced the exact accumulation mode this
            # block exists to prevent (round-10 ADVICE).
            from omfietser_etl_spark import cacheutil

            cacheutil.release_all()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:  # noqa: BLE001 — diagnostics only
                pass
        # Honor the watchdog only when the query actually RAISED: the
        # timer can fire in the race window between query completion
        # and timer.cancel(), and recording a completed query (pass OR
        # genuine fail) as TIMEOUT would silently downgrade a real
        # result to a skip. `raised` (not `ok`) is the discriminator —
        # compare() can return ok=False WITHOUT raising (a genuine
        # value mismatch that completed just as the timer fired), and
        # that must stay a FAIL (round-11 ADVICE).
        if timed_out and raised:
            print(f"{name}: TIMEOUT after {timeout_s:.0f}s (oracle "
                  "skipped at this scale)", flush=True)
            timeouts.append(name)
            continue
        status = "ok" if ok else f"FAIL {detail}"
        print(f"{name}: {status} ({n} rows, {time.time() - t0:.1f}s)")
        if not ok:
            failures.append(name)
    if timeouts:
        print(f"oracle timeouts (NOT passes): {timeouts}")
    print(f"done: {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
