"""Time individual catalog queries with the bench methodology.

Usage:
    python tools/time_queries.py [-r REPS] query [query ...]
    python tools/time_queries.py -r 3 tp3_full_corpus_prep tp2_screen_dedup_pipeline

Builds the SAME session shape as bench.py (local[$SPARK_GRAFT_CPUS],
shuffle=cpus, AQE, 8g driver), warms every table scan plus one lap of
each requested query, then reports per-query median-of-reps to the
noop sink. For optimization iteration only — official numbers come
from bench.py's full windows (sentinel-calibrated).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-r":
        reps = int(args[1])
        args = args[2:]
    if not args:
        print(__doc__, file=sys.stderr)
        return 2

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("time-queries")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.codegen.maxFields", "25")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    unknown = [a for a in args if a not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    from omfietser_etl_spark.session import TABLES

    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.format("noop").mode(
            "overwrite"
        ).save()

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in args:  # one warm lap (codegen/JIT), unrecorded
        spark.sparkContext.setJobDescription(f"warm:{name}")
        run_once(name)
    out = {}
    for name in args:
        spark.sparkContext.setJobDescription(f"time:{name}")
        runs = [run_once(name) for _ in range(reps)]
        out[name] = (round(statistics.median(runs), 3), [round(r, 3) for r in runs])
    for name, (med, runs) in out.items():
        print(f"{name:38s} median={med:7.3f}  runs={runs}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
