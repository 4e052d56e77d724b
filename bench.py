"""Benchmark runner: times every declared catalog query at one scale factor.

Each query runs SPARK_GRAFT_REPS times (default 3) and reports the
per-query MEDIAN — single-run numbers showed >=2x noise on a loaded
host (d2 went 4.2s -> 9.0s between runs with no code change), which
made regressions indistinguishable from load spikes.

Env:
    SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[] core count (default 32)
    SPARK_GRAFT_REPS    runs per query, median reported (default 3)

Host-noise calibration: BENCH_HISTORY proved whole-run 2x wobble on
this host (the same 115-query catalog ran 66.8s and 136.0s hours
apart, zero code changes), so a fixed sentinel query runs at the
start AND end of every bench. Its median vs SENTINEL_REF (the
best-window median committed with the calibration change) yields
host_factor; the JSON carries both the raw total and
value_normalized = total / host_factor, and cross-round comparisons
should use the normalized number (or best-window raw totals).

Prints ONE compact JSON line (the driver captures only the last ~2KB
of stdout, so the official artifact must fit):
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "sf": ..., "reps": N, "sentinel": {...}, "host_factor": F,
     "value_normalized": sec, "families": {...}, "n_queries": N,
     "slowest": {20 slowest queries}, "detail": "BENCH_HISTORY.jsonl"}
Full per-query timings are appended to BENCH_HISTORY.jsonl.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: calibration queries with best-window END-of-run reference medians
#: (sf0.1, local[32], measured round 4). Two axes because shared-host
#: contention is not uniform: an IO-bound scan can read near-reference
#: while CPU-heavy queries run 2x slow (observed round 4 — an
#: interleaved A/B of r3-vs-r4 code showed identical timings while
#: the same queries ran 2x faster in an r3-era window). s1 = parquet
#: scan + pushed filter (IO axis); ta4 = codegen polynomial
#: fingerprint over documents (CPU axis). host_factor = mean of the
#: per-sentinel end/ref ratios; END only, because every run reaches
#: it through the identical full-catalog workload (the fresh-session
#: START sentinel runs ~1.5-2x slower — JIT warm-up — and is
#: recorded for diagnostics only).
SENTINELS = {"s1_scan_pushdown": 0.19, "ta4_fingerprint": 0.50}
SENTINEL_REPS = 5


def _time_query(build, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _sentinel_median(build, spark, sf_dir) -> float:
    return round(
        statistics.median(_time_query(build, spark, sf_dir) for _ in range(SENTINEL_REPS)),
        3,
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("omfietser-etl-spark-bench")
        # The builder launches the JVM, so driver memory set here takes
        # effect. The default 1g heap OOMs once the catalog's memoized/
        # persisted frames accumulate across the full catalog at sf0.1.
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.codegen.maxFields", "25")  # see session.load() note
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # plan, not session startup.
    next(iter(qs.values()))(spark, sf_dir).write.format("noop").mode("overwrite").save()

    sentinel_start = {
        name: _sentinel_median(qs[name], spark, sf_dir) for name in SENTINELS
    }

    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    timings: dict[str, float] = {}
    for name, build in qs.items():
        runs = [_time_query(build, spark, sf_dir) for _ in range(reps)]
        timings[name] = round(statistics.median(runs), 3)

    sentinel_end = {
        name: _sentinel_median(qs[name], spark, sf_dir) for name in SENTINELS
    }
    host_factor = round(
        max(
            0.25,
            statistics.mean(sentinel_end[n] / ref for n, ref in SENTINELS.items()),
        ),
        3,
    )

    # family rollups (prefix-keyed) so cross-round artifact diffs read
    # at a glance; "other" catches anything unprefixed.
    fams = ("p", "d", "td", "ta", "ts", "tv", "tc", "tp", "mm", "st", "ev",
            "h", "a", "j", "o", "u", "s", "x", "q", "dd", "ca", "f")
    families: dict[str, float] = {}
    for name, sec in timings.items():
        pref = next(
            (f for f in sorted(fams, key=len, reverse=True)
             if name.startswith(f) and name[len(f):][:1].isdigit()),
            "other",
        )
        families[pref] = round(families.get(pref, 0.0) + sec, 3)

    total = round(sum(timings.values()), 3)
    line = {
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "reps": reps,
        "sentinel": {
            "refs": SENTINELS,
            "start": sentinel_start,
            "end": sentinel_end,
        },
        "host_factor": host_factor,
        "value_normalized": round(total / host_factor, 3),
        "families": dict(sorted(families.items(), key=lambda kv: -kv[1])),
    }
    # Round-over-round history (BENCH_HISTORY.jsonl is committed) keeps
    # the FULL per-query detail so regressions stay diffable.
    try:
        hist = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_HISTORY.jsonl")
        with open(hist, "a") as f:
            f.write(json.dumps({"ts": int(time.time()), **line}) + "\n")
    except OSError:
        pass
    # The driver records only the LAST ~2000 chars of stdout, so the
    # official BENCH_rN.json must be compact to parse (r03/r04 were
    # truncated mid-JSON). Print a summary line: totals, calibration,
    # family rollups, and the 20 slowest queries; full detail lives in
    # BENCH_HISTORY.jsonl.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:20])
    compact = {k: v for k, v in line.items() if k != "queries"}
    compact["n_queries"] = len(timings)
    compact["slowest"] = slowest
    compact["detail"] = "BENCH_HISTORY.jsonl"
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
