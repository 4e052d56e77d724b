"""Stage-boundary timers for tp3_full_corpus_prep (round-12/13
instrumentation): monkeypatch the eager barriers (_tp3_ckpt, the CC
loop, the LSH pair producer) with timers, then time the final
assembly action. Usage: python tools/probe_tp3_stages.py [reps]
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
        .appName("probe-tp3")
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
    from omfietser_etl_spark.session import TABLES
    from omfietser_etl_spark.textops import dedup as dd

    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.format("noop").mode(
            "overwrite"
        ).save()

    marks = []
    orig_ckpt = tp._tp3_ckpt
    orig_cc = dd.connected_components
    orig_pairs = dd.minhash_lsh_pairs

    def timed_ckpt(scope, df):
        t0 = time.perf_counter()
        out = orig_ckpt(scope, df)
        marks.append((f"ckpt {scope}", time.perf_counter() - t0))
        return out

    def timed_cc(pairs, *a, **k):
        t0 = time.perf_counter()
        out = orig_cc(pairs, *a, **k)
        marks.append(("cc loop", time.perf_counter() - t0))
        return out

    def timed_pairs(*a, **k):
        t0 = time.perf_counter()
        out = orig_pairs(*a, **k)
        marks.append(("lsh build (lazy)", time.perf_counter() - t0))
        return out

    tp._tp3_ckpt = timed_ckpt
    dd.connected_components = timed_cc
    dd.minhash_lsh_pairs = timed_pairs
    # trainprep imported dd as a module attr — patch through the module

    for rep in range(reps):
        marks.clear()
        t0 = time.perf_counter()
        df = tp.tp3_full_corpus_prep(spark, sf_dir)
        t_build = time.perf_counter() - t0
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_final = time.perf_counter() - t1
        total = time.perf_counter() - t0
        print(f"--- rep {rep}: total={total:.2f} build={t_build:.2f} final_action={t_final:.2f}")
        for name, sec in marks:
            print(f"    {name:28s} {sec:6.2f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
