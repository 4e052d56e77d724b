"""Cumulative-noop stage decomposition of minhash_lsh_pairs at sf0.1:
shingles cache fill, signatures, banding candidates, verify joins.
Usage: python tools/probe_lsh_stages.py [reps]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-lsh")
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
    from omfietser_etl_spark.textops import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.write.format("noop").mode("overwrite").save()

    def t(build):
        outs = []
        for _ in range(reps):
            cacheutil.release_all()
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            outs.append(time.perf_counter() - t0)
        return statistics.median(outs), [round(x, 2) for x in outs]

    stages = {
        "shingles_only": lambda: dd.doc_shingles(docs, "doc_id", "text"),
        "signatures": lambda: dd.minhash_signatures(docs, "doc_id", "text"),
        "cand_pairs": lambda: dd.lsh_candidate_pairs(
            dd.minhash_signatures(docs, "doc_id", "text")
        ),
        "full_lsh_pairs": lambda: dd.minhash_lsh_pairs(docs, "doc_id", "text"),
    }
    # warm lap
    for b in stages.values():
        cacheutil.release_all()
        b().write.format("noop").mode("overwrite").save()
    for name, b in stages.items():
        med, runs = t(b)
        sys.stdout.write(f"{name:18s} median={med:6.3f} runs={runs}\n")
        sys.stdout.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
