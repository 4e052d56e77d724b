"""Per-action timers inside g6_hits: edge count, each half-round's
collect and checkpoint, final assembly. Usage: python tools/probe_g6.py [reps]
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
        .appName("probe-g6")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.codegen.maxFields", "25")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from omfietser_etl_spark import cacheutil
    from omfietser_etl_spark.catalog.opsspec import g6_hits
    from omfietser_etl_spark.session import TABLES

    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.format("noop").mode(
            "overwrite"
        ).save()

    marks = []
    orig_ckpt = cacheutil.tracked_local_checkpoint

    def timed_ckpt(df):
        t0 = time.perf_counter()
        out = orig_ckpt(df)
        marks.append(("ckpt", time.perf_counter() - t0))
        return out

    cacheutil.tracked_local_checkpoint = timed_ckpt

    import omfietser_etl_spark.operators.graph as g

    orig_parts = None
    from omfietser_etl_spark.textops import dedup as dd

    orig_parts = dd._cc_loop_partitions
    t_last = [0.0]

    def timed_parts(n_edges, n_conf):
        marks.append((f"e.count -> {n_edges}", time.perf_counter() - t_last[0]))
        return orig_parts(n_edges, n_conf)

    dd._cc_loop_partitions = timed_parts

    # wrap DataFrame.collect to time the half-round total collects
    from pyspark.sql import DataFrame

    orig_collect = DataFrame.collect

    def timed_collect(self):
        t0 = time.perf_counter()
        out = orig_collect(self)
        marks.append(("collect", time.perf_counter() - t0))
        return out

    DataFrame.collect = timed_collect

    for rep in range(reps):
        marks.clear()
        t_last[0] = time.perf_counter()
        t0 = time.perf_counter()
        df = g6_hits(spark, sf_dir)
        t_build = time.perf_counter() - t0
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_final = time.perf_counter() - t1
        sys.stdout.write(
            f"=== rep {rep}: total={time.perf_counter()-t0:.2f} "
            f"build={t_build:.2f} final={t_final:.2f}\n"
        )
        for name, sec in marks:
            sys.stdout.write(f"    {name:22s} {sec:6.2f}\n")
        sys.stdout.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
