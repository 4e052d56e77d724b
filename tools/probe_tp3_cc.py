"""Sub-stage timers for the CC loop as invoked INSIDE tp3: time the
LSH pair producer's materialization (dist.count), the edges
checkpoint, and each loop round, in the exact tp3 context.
Usage: python tools/probe_tp3_cc.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-tp3-cc")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.codegen.maxFields", "25")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import omfietser_etl_spark.catalog.trainprep as tp
    from omfietser_etl_spark import cacheutil
    from omfietser_etl_spark.session import TABLES
    from omfietser_etl_spark.textops import dedup as dd

    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.format("noop").mode(
            "overwrite"
        ).save()

    marks = []
    t_ref = [0.0]

    orig_parts = dd._cc_loop_partitions
    orig_ckpt = cacheutil.tracked_loop_checkpoint
    orig_cc = dd.connected_components

    def timed_parts(n_edges, n_conf):
        marks.append((f"dist.count -> {n_edges} edges", time.perf_counter() - t_ref[0]))
        t_ref[0] = time.perf_counter()
        return orig_parts(n_edges, n_conf)

    def timed_ckpt(df):
        t0 = time.perf_counter()
        out = orig_ckpt(df)
        marks.append(("loop ckpt", time.perf_counter() - t0))
        t_ref[0] = time.perf_counter()
        return out

    def timed_cc(pairs, *a, **k):
        t_ref[0] = time.perf_counter()
        t0 = time.perf_counter()
        out = orig_cc(pairs, *a, **k)
        marks.append(("cc TOTAL", time.perf_counter() - t0))
        return out

    dd._cc_loop_partitions = timed_parts
    cacheutil.tracked_loop_checkpoint = timed_ckpt
    dd.connected_components = timed_cc

    for rep in range(reps):
        marks.clear()
        t0 = time.perf_counter()
        df = tp.tp3_full_corpus_prep(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        total = time.perf_counter() - t0
        sys.stdout.write(f"=== rep {rep}: total={total:.2f}\n")
        for name, sec in marks:
            sys.stdout.write(f"    {name:34s} {sec:6.2f}\n")
        sys.stdout.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
