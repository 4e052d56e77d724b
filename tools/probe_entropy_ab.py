"""Interleaved A/B probe: JVM HOF char-entropy fold vs a vectorized
Arrow/numpy pandas UDF computing the identical exact-integer ent_q.

Usage: python tools/probe_entropy_ab.py [reps]

Verifies bit-identical output first (full corpus at sf0.1), then
times both variants interleaved (noop sink, median of reps) on the
ta10 shape. For optimization iteration only.
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
        .appName("probe-entropy-ab")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.codegen.maxFields", "25")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from omfietser_etl_spark.textops.analysis import char_entropy_expr, norm_text
    from omfietser_etl_spark.textops.selection import ilog2_q

    DSIR_Q, DSIR_F = 20, 30

    def ilog2_q_vec(x: np.ndarray) -> np.ndarray:
        x = x.astype(np.int64)
        _, e = np.frexp(x.astype(np.float64))
        p = (e - 1).astype(np.int64)
        sh_r = np.maximum(p - DSIR_F, 0)
        sh_l = np.maximum(DSIR_F - p, 0)
        y = np.where(p >= DSIR_F, x >> sh_r, x << sh_l)
        r = np.zeros_like(x)
        two_f1 = np.int64(1) << np.int64(DSIR_F + 1)
        for _ in range(DSIR_Q):
            y = (y * y) >> np.int64(DSIR_F)
            hi = y >= two_f1
            r = (r << 1) + hi
            y = np.where(hi, y >> 1, y)
        return (p << DSIR_Q) + r

    # property check vs the Python twin
    xs = np.array(
        list(range(1, 3000)) + [2**k for k in range(1, 52)] + [2**k - 1 for k in range(2, 52)],
        dtype=np.int64,
    )
    got = ilog2_q_vec(xs)
    for xv, gv in zip(xs.tolist(), got.tolist()):
        assert gv == ilog2_q(xv), (xv, gv, ilog2_q(xv))
    print("ilog2_q_vec property check OK over", len(xs), "values")

    @F.pandas_udf("long")
    def ent_q_udf(s: pd.Series) -> pd.Series:
        mask = s.notna()
        vals = s[mask]
        if len(vals) == 0:
            return pd.Series([None] * len(s), dtype="object")
        lens = vals.str.len().to_numpy(np.int64)
        arr = np.frombuffer("".join(vals.tolist()).encode("ascii"), dtype=np.uint8)
        n = len(vals)
        row_ids = np.repeat(np.arange(n, dtype=np.int64), lens)
        counts = np.bincount(row_ids * 128 + arr, minlength=n * 128).reshape(n, 128)
        rows, cols = np.nonzero(counts)
        c = counts[rows, cols].astype(np.int64)
        contrib = c * ilog2_q_vec(c)
        s_c = np.zeros(n, dtype=np.int64)
        np.add.at(s_c, rows, contrib)
        ent = lens * ilog2_q_vec(lens) - s_c
        out = np.zeros(len(s), dtype=np.int64)
        out[mask.to_numpy()] = ent
        res = pd.Series(out)
        res[~mask.to_numpy()] = None
        return res

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    staged = docs.select(
        F.col("doc_id").alias("doc"), norm_text("text").alias("_s")
    ).filter(F.length("_s") > 0)

    jvm = staged.select(
        "doc",
        F.length("_s").cast("long").alias("n_chars"),
        F.expr(char_entropy_expr("_s")).cast("long").alias("ent_q"),
    )
    py = staged.select(
        "doc",
        F.length("_s").cast("long").alias("n_chars"),
        ent_q_udf("_s").alias("ent_q"),
    )

    # exactness: full corpus compare
    mism = (
        jvm.alias("a")
        .join(py.alias("b"), "doc")
        .filter(
            (F.col("a.ent_q") != F.col("b.ent_q"))
            | (F.col("a.n_chars") != F.col("b.n_chars"))
        )
        .count()
    )
    cnt_a, cnt_b = jvm.count(), py.count()
    print(f"exactness: mismatches={mism}, rows jvm={cnt_a} py={cnt_b}")
    assert mism == 0 and cnt_a == cnt_b

    def t(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm both
    t(jvm), t(py)
    ja, pb = [], []
    for _ in range(reps):
        ja.append(t(jvm))
        pb.append(t(py))
    print(f"jvm fold : median={statistics.median(ja):.3f} runs={[round(x,3) for x in ja]}")
    print(f"numpy udf: median={statistics.median(pb):.3f} runs={[round(x,3) for x in pb]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
