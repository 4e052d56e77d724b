"""A/B: interpreted-HOF poly_hash fold vs vectorized numpy closed-form
(h = (seed*31^L + sum c_i 31^(L-1-i)) mod MOD) on the minhash
signature shape. Verifies bit-identity on the full sf0.1 shingle set
first. Usage: python tools/probe_polyhash_ab.py [reps]
"""

import os
import statistics
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-polyhash")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.codegen.maxFields", "25")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from omfietser_etl_spark.textops import dedup as dd
    from omfietser_etl_spark.textops.analysis import poly_hash
    from omfietser_etl_spark.textops.constants import (
        CHAR_SEED,
        MINHASH_A,
        MINHASH_B,
        MOD,
    )

    @F.pandas_udf("long")
    def poly_udf(s: pd.Series) -> pd.Series:
        mask = s.notna().to_numpy()
        vals = s[mask]
        out = np.zeros(len(s), dtype=np.int64)
        if len(vals):
            lens = vals.str.len().to_numpy(np.int64)
            arr = np.frombuffer(
                "".join(vals.tolist()).encode("ascii"), dtype=np.uint8
            ).astype(np.int64)
            maxlen = int(lens.max()) if len(lens) else 0
            pw = np.ones(maxlen + 1, dtype=np.int64)
            for k in range(1, maxlen + 1):
                pw[k] = (pw[k - 1] * 31) % MOD
            starts = np.zeros(len(vals) + 1, dtype=np.int64)
            np.cumsum(lens, out=starts[1:])
            pos = np.arange(len(arr), dtype=np.int64) - np.repeat(starts[:-1], lens)
            expo = np.repeat(lens, lens) - 1 - pos
            terms = (arr * pw[expo]) % MOD
            nz = lens > 0
            seg = np.zeros(len(vals), dtype=np.int64)
            if nz.any():
                # reduceat over nonzero segments only
                idx = starts[:-1][nz]
                seg_nz = np.add.reduceat(terms, idx) if len(terms) else np.zeros(0, np.int64)
                seg[nz] = seg_nz % MOD
            h = (CHAR_SEED % MOD) * pw[lens] % MOD
            h = (h + seg) % MOD
            out[mask] = h
        res = pd.Series(out)
        res[~mask] = None
        return res

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    docs.write.format("noop").mode("overwrite").save()
    sh = dd.doc_shingles(docs, "doc_id", "text")

    a = sh.select("doc", "s", poly_hash("s").alias("h"))
    b = sh.select("doc", "s", poly_udf("s").alias("h"))
    mism = (
        a.alias("x")
        .join(b.alias("y"), ["doc", "s"])
        .filter(F.col("x.h") != F.col("y.h"))
        .count()
    )
    na, nb = a.count(), b.count()
    print(f"exactness: mismatches={mism}, rows={na}/{nb}")
    assert mism == 0 and na == nb

    def mk_sig(hash_col_fn):
        shh = sh.withColumn("h", hash_col_fn("s"))
        aggs = [
            F.min(F.expr(f"({MINHASH_A[i]}L * h + {MINHASH_B[i]}L) % {MOD}")).alias(f"mh{i}")
            for i in range(len(MINHASH_A))
        ]
        return shh.groupBy("doc").agg(*aggs)

    def t(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    sig_a = mk_sig(poly_hash)
    sig_b = mk_sig(poly_udf)
    t(sig_a), t(sig_b)
    ra, rb = [], []
    for _ in range(reps):
        ra.append(t(sig_a))
        rb.append(t(sig_b))
    print(f"sig jvm fold : median={statistics.median(ra):.3f} runs={[round(x,3) for x in ra]}")
    print(f"sig numpy udf: median={statistics.median(rb):.3f} runs={[round(x,3) for x in rb]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
