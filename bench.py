"""Benchmark runner: times every declared catalog query at one scale factor.

Each query runs SPARK_GRAFT_REPS times (default 3) and reports the
per-query MEDIAN — single-run numbers showed >=2x noise on a loaded
host (d2 went 4.2s -> 9.0s between runs with no code change), which
made regressions indistinguishable from load spikes.

Env:
    SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[] core count (default 32)
    SPARK_GRAFT_REPS    runs per query, median reported (default 3)

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ..., "reps": N}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


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

    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    timings: dict[str, float] = {}
    for name, build in qs.items():
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)

    total = round(sum(timings.values()), 3)
    line = {
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "reps": reps,
    }
    print(json.dumps(line))
    # Round-over-round history (BENCH_HISTORY.jsonl is committed) so
    # per-query regressions are diffable across rounds.
    try:
        hist = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_HISTORY.jsonl")
        with open(hist, "a") as f:
            f.write(json.dumps({"ts": int(time.time()), **line}) + "\n")
    except OSError:
        pass
    spark.stop()


if __name__ == "__main__":
    main()
